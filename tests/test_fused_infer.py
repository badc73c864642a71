"""Fused inference kernels (interpret mode) vs the lax.while_loop paths.

The fused greedy/beam decoders must produce the exact token streams the
XLA loop decoders produce — same argmax chain, same EOS bookkeeping,
same post-EOS content (kept, reference parity: dataloader get_hyps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ast_tpu.models import seq2seq
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG

V = 12
STOP = 14


def _mcfg(fused):
    m = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    m["rnn_config"] = dict(m["rnn_config"], dec_vocab_size=V,
                           fused_decoder=fused, fused_interpret=fused)
    m["dropout"] = {"embed": 0.0, "rnn": 0.0, "out": 0}
    return m


@pytest.fixture(scope="module")
def model():
    params, state = seq2seq.init_model(jax.random.PRNGKey(3), _mcfg(False))
    # EOS bias staggers sentence-finish steps
    params["dec"]["out_b"] = params["dec"]["out_b"].at[
        SYMBOLS.EOS_ID].add(2.0)
    X = jax.random.normal(jax.random.PRNGKey(4), (4, 44, 13)) * 0.5
    return params, state, X


def test_fused_greedy_matches_while_loop(model):
    params, state, X = model
    ref, n_ref = seq2seq.predict_greedy(params, state, _mcfg(False), X,
                                        STOP)
    got, n_got = seq2seq.predict_greedy(params, state, _mcfg(True), X,
                                        STOP)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # same return contract: n_steps = steps until every row's first EOS
    assert int(n_ref) == int(n_got)


@pytest.mark.parametrize("N,K", [(3, 3), (4, 2)])
def test_fused_beam_matches_while_loop(model, N, K):
    """In-kernel frontier loop == the XLA batched beam (which is itself
    pinned against the sequential reference in test_beam_oracle).

    The N > K case pins the distinct-lane selection guarantee: with
    fewer live candidates than beam slots, the kernel's NEG_INF-reset
    tie-break used to re-select an already-taken lane where lax.top_k
    returns distinct indices."""
    from ast_tpu.ops import beam as beam_ops

    params, state, X = model
    ref_dec = beam_ops.make_beam_decoder(_mcfg(False), N=N, K=K,
                                         stop_limit=STOP)
    got_dec = beam_ops.make_beam_decoder(_mcfg(True), N=N, K=K,
                                         stop_limit=STOP)
    r_hyps, r_scores, r_lens = (np.asarray(a)
                                for a in ref_dec(params, state, X))
    g_hyps, g_scores, g_lens = (np.asarray(a)
                                for a in got_dec(params, state, X))

    np.testing.assert_array_equal(r_lens, g_lens)
    np.testing.assert_allclose(r_scores, g_scores, rtol=1e-5, atol=1e-5)
    for b in range(r_hyps.shape[0]):
        for n in range(N):
            L = r_lens[b, n]
            np.testing.assert_array_equal(
                r_hyps[b, n, :L], g_hyps[b, n, :L],
                err_msg=f"hyp mismatch at utt {b} slot {n}")


def test_fused_greedy_eos_padding(model):
    """Steps after the whole batch has finished are PAD in both paths."""
    params, state, X = model
    got, _ = seq2seq.predict_greedy(params, state, _mcfg(True), X, 40)
    arr = np.asarray(got)
    # every row must contain an EOS with this bias; find the global
    # finish step and check all later columns are PAD
    eos_steps = [np.nonzero(arr[b] == SYMBOLS.EOS_ID)[0] for b in
                 range(arr.shape[0])]
    assert all(len(e) for e in eos_steps)
    done = max(int(e[0]) for e in eos_steps)
    assert (arr[:, done + 1:] == SYMBOLS.PAD_ID).all()


def test_gather_1hot_split_reconstructs_f32_exactly():
    """The 3-pass bf16 split behind fused_infer._gather_1hot is only
    exact if p0 + p1 + p2 == X bit-for-bit (each part bf16-representable
    so the demoted TPU dot is lossless).  Pin that split property on
    adversarial f32 values: full 24-bit mantissas, tiny/huge exponents,
    negatives, exact bf16 values, and rounding-edge patterns.

    Known limit (documented in _gather_1hot): residual parts that fall
    into bf16's subnormal range (|X| below ~1e-33) round in their last
    bits — an absolute error bounded by bf16's smallest subnormal step
    (~1e-40), unreachable by LSTM states/log-probs; the normal-range
    sweep here must be bit-exact."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.standard_normal(4096).astype(np.float32),
        rng.standard_normal(1024).astype(np.float32) * 1e-25,
        rng.standard_normal(1024).astype(np.float32) * 1e30,
        # all-ones mantissa patterns (worst case for carry propagation)
        np.float32(np.ldexp(0x00FFFFFF, -23)) * rng.choice(
            [-1.0, 1.0], 1024).astype(np.float32),
        np.float32([0.0, -0.0, 1.0, -1.0, 2.0 ** -126, 3.0, 1.5,
                    np.float32(1) + np.float32(2) ** -23]),
    ])
    X = jnp.asarray(vals)
    p0 = X.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = X - p0
    p1 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    p2 = r1 - p1
    # each part must be bf16-representable (lossless under demotion)
    for p in (p0, p1, p2):
        np.testing.assert_array_equal(
            np.asarray(p), np.asarray(p.astype(jnp.bfloat16)
                                      .astype(jnp.float32)))
    # and the (ordered) sum must reconstruct X bit-for-bit
    recon = np.asarray((p0 + p1) + p2)
    np.testing.assert_array_equal(recon, np.asarray(X))


# ---------------------------------------------------------------------------
# wide beams (BASELINE config 4 names widths 5-16)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wide_model():
    """Bigger vocab so K=16 has candidates to rank (V >= N*? no: V >= K)."""
    m = _mcfg(False)
    m["rnn_config"]["dec_vocab_size"] = 24
    params, state = seq2seq.init_model(jax.random.PRNGKey(5), m)
    params["dec"]["out_b"] = params["dec"]["out_b"].at[
        SYMBOLS.EOS_ID].add(1.5)
    X = jax.random.normal(jax.random.PRNGKey(6), (2, 44, 13)) * 0.5
    return params, state, X


def _wide_mcfg(fused):
    m = _mcfg(fused)
    m["rnn_config"]["dec_vocab_size"] = 24
    return m


@pytest.mark.slow
@pytest.mark.parametrize("N,K", [(8, 8), (16, 8), (16, 16)])
def test_fused_beam_matches_while_loop_wide(wide_model, N, K):
    """The in-kernel frontier at widths 8-16: the iterative masked-
    argmax top-K (K sequential passes), the (R, R) one-hot gathers at
    R = B*N = 32, and the candidate maps must still reproduce the XLA
    beam token-exactly (interpret mode)."""
    from ast_tpu.ops import beam as beam_ops

    params, state, X = wide_model
    ref_dec = beam_ops.make_beam_decoder(_wide_mcfg(False), N=N, K=K,
                                         stop_limit=STOP)
    got_dec = beam_ops.make_beam_decoder(_wide_mcfg(True), N=N, K=K,
                                         stop_limit=STOP)
    r_hyps, r_scores, r_lens = (np.asarray(a)
                                for a in ref_dec(params, state, X))
    g_hyps, g_scores, g_lens = (np.asarray(a)
                                for a in got_dec(params, state, X))
    np.testing.assert_array_equal(r_lens, g_lens)
    np.testing.assert_allclose(r_scores, g_scores, rtol=1e-5, atol=1e-5)
    for b in range(r_hyps.shape[0]):
        for n in range(N):
            L = r_lens[b, n]
            np.testing.assert_array_equal(
                r_hyps[b, n, :L], g_hyps[b, n, :L],
                err_msg=f"hyp mismatch at utt {b} slot {n}")


def test_fused_beam_chunk_gates_wide_widths():
    """The VMEM model at flagship dims: whatever chunk fused_beam_chunk
    picks at N in {5, 8, 16} must itself satisfy fused_beam_fits, be an
    aligned divisor, and shrink (weakly) as N grows; impossible
    geometries gate to 0 (clean XLA fallback) rather than a kernel that
    would not fit."""
    from ast_tpu.ops.fused_infer import (fused_beam_chunk,
                                         fused_beam_fits)

    L, H, E, A, T, Vp = 3, 512, 128, 512, 640, 8192
    B = 128
    chunks = {}
    for N in (5, 8, 16):
        c = fused_beam_chunk(L, B, N, H, E, A, T, Vp, weight_bytes=2)
        chunks[N] = c
        if c:
            assert B % c == 0 and c % 8 == 0
            assert fused_beam_fits(L, c, N, H, E, A, T, Vp, 2)
            # the next aligned divisor up must NOT fit (c is maximal)
            from ast_tpu.ops.fused_infer import aligned_divisors
            bigger = [d for d in aligned_divisors(B) if d > c]
            assert all(not fused_beam_fits(L, d, N, H, E, A, T, Vp, 2)
                       for d in bigger)
    assert sorted(chunks.values(), reverse=True) == [
        chunks[5], chunks[8], chunks[16]]
    # a geometry nothing fits (absurd T): clean 0
    assert fused_beam_chunk(L, B, 16, H, E, A, 200_000, Vp, 2) == 0
