"""Sequential-beam oracle: the batched on-device beam decoder vs a
NumPy replication of the reference's per-hypothesis algorithm.

The reference decodes one utterance at a time, expanding each live
hypothesis with its top-K continuations by snapshot/restore of the
decoder LSTM states, carrying frozen-EOS hypotheses unchanged through
the candidate pool, and keeping the N best of the pool by raw summed
log-prob (reference: nn.py:235-322 init_hyp/decode_beam_step/
decode_beam; beam.py:30-42 applies the ``score/(len-2)^W`` length norm
only at final reranking).  ast_tpu's ``ops.beam`` re-designs this as a
batched frontier with ``lax.top_k`` and beam-gathered states — the most
re-architected component in the tree — so this file pins its hypothesis
sets, scores, AND the reranking against the sequential semantics on
tiny shapes.

Known tie-break deltas (documented, not observed at these shapes): the
reference's stable Python sort vs ``lax.top_k``'s lowest-index-first
can order EXACTLY-equal scores differently; with random continuous
weights exact ties do not occur.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ast_tpu.models import seq2seq
from ast_tpu.ops import beam as beam_ops
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG
from tests.reference_oracle import ReferenceOracle

V = 12
N = K = 3
STOP = 12


def _log_softmax(x):
    m = x.max()
    e = x - m
    return e - np.log(np.exp(e).sum())


def sequential_beam(oracle, X, stop_limit, n_best_size, beam_width):
    """The reference's decode_beam, verbatim semantics (nn.py:299-322)."""
    oracle.encode(X, train=False, rev_quirk=False)
    oracle.init_decoder_state()
    a_units = oracle.rnn_cfg["attn_units"]

    def snapshot():
        return [(l.c.copy(), l.h.copy()) for l in oracle.rnn_dec]

    def restore(st):
        for l, (c, h) in zip(oracle.rnn_dec, st):
            l.set_state(c, h)

    n_best = [{"hyp": [SYMBOLS.GO_ID], "score": 0.0,
               "state": snapshot(), "ht": np.zeros((1, a_units))}]
    for _ in range(stop_limit):
        if all(e["hyp"][-1] == SYMBOLS.EOS_ID for e in n_best):
            break
        curr = []
        for e in n_best:
            if e["hyp"][-1] == SYMBOLS.EOS_ID:
                curr.append(e)  # frozen hyp re-enters the pool unchanged
                continue
            restore(e["state"])
            logits, ht, _ = oracle.decode_step(
                np.asarray([e["hyp"][-1]]), e["ht"])
            logp = _log_softmax(logits[0])
            top = np.argsort(logp)[-beam_width:][::-1]
            st = snapshot()
            for t in top:
                curr.append({"hyp": e["hyp"] + [int(t)],
                             "score": e["score"] + float(logp[t]),
                             "state": st, "ht": ht})
        n_best = sorted(curr, reverse=True,
                        key=lambda t: t["score"])[:n_best_size]
    return [(e["hyp"], e["score"]) for e in n_best]


@pytest.fixture(scope="module")
def model():
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=V)
    mcfg["dropout"] = {"embed": 0.0, "rnn": 0.0, "out": 0}
    params, state = seq2seq.init_model(jax.random.PRNGKey(42), mcfg)
    # bias EOS up so hypotheses freeze at staggered steps — exercises
    # the frozen-hyp carry, not just the all-live frontier
    params["dec"]["out_b"] = params["dec"]["out_b"].at[
        SYMBOLS.EOS_ID].add(2.5)
    X = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 13)) * 0.5
    return mcfg, params, state, X


def test_batched_beam_matches_sequential_reference(model):
    mcfg, params, state, X = model
    decode = beam_ops.make_beam_decoder(mcfg, N=N, K=K, stop_limit=STOP)
    hyps, scores, lengths = (np.asarray(a)
                             for a in decode(params, state, X))

    oracle = ReferenceOracle(params, state, mcfg)
    for b in range(X.shape[0]):
        ref = sequential_beam(oracle, np.asarray(X[b:b + 1]), STOP, N, K)
        assert len(ref) == N
        for n in range(N):
            got = hyps[b, n, :lengths[b, n]].tolist()
            want, want_score = ref[n]
            assert got == want, (
                f"utt {b} hyp {n}: batched {got} != sequential {want}")
            np.testing.assert_allclose(scores[b, n], want_score,
                                       rtol=1e-4, atol=1e-4)


def test_reranking_matches_reference_formula(model):
    """End-to-end: batched beams reranked by score/(len-2)^W pick the
    same best hypothesis the sequentially-built pool does."""
    mcfg, params, state, X = model
    W = 0.6
    decode = beam_ops.make_beam_decoder(mcfg, N=N, K=K, stop_limit=STOP)
    hyps, scores, lengths = (np.asarray(a)
                             for a in decode(params, state, X))

    oracle = ReferenceOracle(params, state, mcfg)
    for b in range(X.shape[0]):
        ref = sequential_beam(oracle, np.asarray(X[b:b + 1]), STOP, N, K)
        ref_best = beam_ops.rerank_hypothesis(
            [(tuple(h), s) for h, s in ref], W)[0][0]
        got_entries = [(tuple(hyps[b, n, :lengths[b, n]].tolist()),
                        float(scores[b, n])) for n in range(N)]
        got_best = beam_ops.rerank_hypothesis(got_entries, W)[0][0]
        assert tuple(got_best) == tuple(ref_best)


def test_sequential_oracle_self_consistency(model):
    """The oracle itself behaves like the reference: N=1, K=1 equals
    greedy decoding (same argmax chain)."""
    mcfg, params, state, X = model
    oracle = ReferenceOracle(params, state, mcfg)
    for b in range(X.shape[0]):
        Xb = np.asarray(X[b:b + 1])
        ref = sequential_beam(oracle, Xb, STOP, 1, 1)
        greedy = oracle.predict(Xb, SYMBOLS.GO_ID, SYMBOLS.EOS_ID, STOP)
        hyp = ref[0][0][1:]  # strip GO
        assert hyp[:len(greedy[0])] == greedy[0].tolist()


# ---------------------------------------------------------------------------
# wide beams: the oracle at N=K in {8, 16} (BASELINE config 4 names
# beam widths 5-16; everything above 5 was previously unexercised)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wide_model():
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=24)
    mcfg["dropout"] = {"embed": 0.0, "rnn": 0.0, "out": 0}
    params, state = seq2seq.init_model(jax.random.PRNGKey(43), mcfg)
    params["dec"]["out_b"] = params["dec"]["out_b"].at[
        SYMBOLS.EOS_ID].add(2.0)
    X = jax.random.normal(jax.random.PRNGKey(2), (2, 40, 13)) * 0.5
    return mcfg, params, state, X


@pytest.mark.slow
@pytest.mark.parametrize("Nw,Kw", [(8, 8), (16, 16)])
def test_batched_beam_matches_sequential_wide(wide_model, Nw, Kw):
    """Hypothesis sets AND scores at widths 8/16 equal the reference's
    sequential per-hypothesis algorithm."""
    mcfg, params, state, X = wide_model
    decode = beam_ops.make_beam_decoder(mcfg, N=Nw, K=Kw,
                                        stop_limit=STOP)
    hyps, scores, lengths = (np.asarray(a)
                             for a in decode(params, state, X))
    oracle = ReferenceOracle(params, state, mcfg)
    for b in range(X.shape[0]):
        ref = sequential_beam(oracle, np.asarray(X[b:b + 1]), STOP,
                              Nw, Kw)
        assert len(ref) == Nw
        for n in range(Nw):
            got = hyps[b, n, :lengths[b, n]].tolist()
            want, want_score = ref[n]
            assert got == want, (
                f"utt {b} hyp {n}: batched {got} != sequential {want}")
            np.testing.assert_allclose(scores[b, n], want_score,
                                       rtol=1e-4, atol=1e-4)
