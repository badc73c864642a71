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
