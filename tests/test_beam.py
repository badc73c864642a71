"""Batched beam search: greedy equivalence at N=K=1, monotone scores,
frozen-EOS semantics, reranking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ast_tpu.models import seq2seq
from ast_tpu.ops import beam as beam_ops
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG

V = 12


@pytest.fixture(scope="module")
def model():
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=V)
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    return mcfg, params, state


def test_beam1_equals_greedy(model):
    mcfg, params, state = model
    X = jax.random.normal(jax.random.PRNGKey(1), (3, 80, 13))
    stop = 10
    greedy, _ = seq2seq.predict_greedy(params, state, mcfg, X, stop)
    decode = beam_ops.make_beam_decoder(mcfg, N=1, K=1, stop_limit=stop)
    hyps, scores, lengths = decode(params, state, X)
    greedy = np.asarray(greedy)
    hyps = np.asarray(hyps)
    for b in range(3):
        L = int(lengths[b, 0])
        beam_seq = hyps[b, 0, 1:L]  # strip GO
        g = greedy[b]
        # greedy row may continue past this sentence's EOS (other rows
        # unfinished); compare up to & including first EOS
        eos = np.where(g == SYMBOLS.EOS_ID)[0]
        g_cut = g[: eos[0] + 1] if len(eos) else g
        np.testing.assert_array_equal(beam_seq, g_cut)


def test_beam_scores_sorted_and_finite(model):
    mcfg, params, state = model
    X = jax.random.normal(jax.random.PRNGKey(2), (2, 80, 13))
    decode = beam_ops.make_beam_decoder(mcfg, N=4, K=4, stop_limit=8)
    hyps, scores, lengths = decode(params, state, X)
    scores = np.asarray(scores)
    assert np.isfinite(scores).all()
    assert (np.diff(scores, axis=1) <= 1e-5).all()  # descending
    assert (scores <= 0).all()  # summed log-probs


def test_beam_hyps_start_with_go(model):
    mcfg, params, state = model
    X = jax.random.normal(jax.random.PRNGKey(3), (2, 80, 13))
    decode = beam_ops.make_beam_decoder(mcfg, N=3, K=3, stop_limit=8)
    hyps, scores, lengths = decode(params, state, X)
    hyps, lengths = np.asarray(hyps), np.asarray(lengths)
    assert (hyps[:, :, 0] == SYMBOLS.GO_ID).all()
    assert (lengths >= 1).all() and (lengths <= 9).all()


def test_rerank():
    beams = [([1, 4, 5, 2], -1.0), ([1, 4, 2], -0.8)]
    ranked = beam_ops.rerank_hypothesis(beams, weight=1.0)
    # -1.0/2 = -0.5 beats -0.8/1 = -0.8
    assert ranked[0][0] == [1, 4, 5, 2]
    best = beam_ops.get_best_hyps({"u": beams}, W=1.0)
    assert best["u"] == [1, 4, 5, 2]


def test_rerank_weight_zero_keeps_raw_order():
    beams = [([1, 4, 5, 2], -1.0), ([1, 4, 2], -0.8)]
    best = beam_ops.get_best_hyps({"u": beams}, W=0.0)
    assert best["u"] == [1, 4, 2]


def test_beam_attention_history(model):
    """return_attn carries per-token alphas gathered through reranking
    (reference beam entries are (hyp, score, attn_history), beam.py:121):
    rows 1..L-1 are softmax distributions over encoder time; row 0 (GO)
    and rows past L are zero."""
    mcfg, params, state = model
    X = jax.random.normal(jax.random.PRNGKey(4), (2, 80, 13))
    stop = 8
    decode = beam_ops.make_beam_decoder(mcfg, N=3, K=3, stop_limit=stop,
                                        return_attn=True)
    hyps, scores, lengths, attn = decode(params, state, X)
    hyps, lengths, attn = (np.asarray(a) for a in (hyps, lengths, attn))
    T_enc = attn.shape[-1]
    assert attn.shape[:3] == (2, 3, stop + 1)
    for b in range(2):
        for n in range(3):
            L = int(lengths[b, n])
            np.testing.assert_allclose(attn[b, n, 0], 0.0)
            sums = attn[b, n, 1:L].sum(axis=-1)
            np.testing.assert_allclose(sums, 1.0, rtol=1e-4)
            assert (attn[b, n, 1:L] >= 0).all()
            if L <= stop:
                np.testing.assert_allclose(attn[b, n, L:], 0.0)


def test_beam_attn_matches_greedy_alphas(model):
    """At N=K=1 the beam's stored alphas are exactly the decode_step
    alphas along the greedy path."""
    mcfg, params, state = model
    X = jax.random.normal(jax.random.PRNGKey(5), (1, 80, 13))
    stop = 6
    decode = beam_ops.make_beam_decoder(mcfg, N=1, K=1, stop_limit=stop,
                                        return_attn=True)
    hyps, scores, lengths, attn = decode(params, state, X)
    hyps, attn = np.asarray(hyps), np.asarray(attn)
    L = int(np.asarray(lengths)[0, 0])

    # replay manually with decode_step
    enc_states, h0, c0, _ = seq2seq.encode(
        params, state, mcfg, X, jax.random.PRNGKey(0), False)
    carry = seq2seq.init_decoder_carry(mcfg, h0, c0)
    word = jnp.full((1,), SYMBOLS.GO_ID, jnp.int32)
    for t in range(1, L):
        logits, carry, alphas = seq2seq.decode_step(
            params, mcfg, enc_states, carry, word, jax.random.PRNGKey(0),
            False)
        np.testing.assert_allclose(attn[0, 0, t], np.asarray(alphas)[0],
                                   rtol=2e-4, atol=1e-6)
        word = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(int(word[0]), hyps[0, 0, t])


def test_beam_width_beyond_vocab_rejected():
    """K > vocab can't produce K continuations per step: clear error
    instead of an XLA top_k shape failure."""
    import pytest as _pytest

    from ast_tpu.ops import beam as beam_ops
    from tests.conftest import TINY_MODEL_CFG
    import jax

    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=12)
    with _pytest.raises(ValueError, match="vocabulary"):
        beam_ops.make_beam_decoder(mcfg, N=16, K=16, stop_limit=8)
    with _pytest.raises(ValueError, match=">= 1"):
        beam_ops.make_beam_decoder(mcfg, N=0, K=1, stop_limit=8)
