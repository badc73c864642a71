"""Batch-chunked fused kernels: B=128 runs as independent chunk calls.

The fused encoder/decoder kernels are VMEM-bounded in B; past the budget
the model now splits the batch into the largest fitting chunk instead of
falling back to the scan path.  Chunking is semantics-preserving because
neither recurrence couples batch rows (BatchNorm runs outside, in the
conv front-end) — these tests pin that equivalence in interpret mode and
the chunk-size selection at flagship shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ast_tpu.ops.fused_decoder import (
    fused_decoder_apply, fused_decoder_chunk, round_up,
)
from ast_tpu.ops.fused_lstm import fused_chunk_size, fused_fits


def test_flagship_chunk_sizes():
    """es_en_20h shapes: B=32 fits whole; B=128 selects the measured
    optimum (decoder chunk 64, encoder single kernel — see BASELINE.md
    round-2 scoped-vmem calibration)."""
    # decoder: L=3, H=A=512, E=128, T'=160 (640 frames / 4), Vp=1152
    args = (3, 512, 128, 512, 160, round_up(1098, 128), 2)
    L, H, E, A, T, Vp, wb = args
    assert fused_decoder_chunk(L, 32, H, E, A, T, Vp, wb) == 32
    assert fused_decoder_chunk(L, 128, H, E, A, T, Vp, wb) == 64

    # encoder: 3 layers x 2 dirs, 256 units/dir
    assert fused_chunk_size(3, 2, 32, 256, 2) == 32
    assert fused_chunk_size(3, 2, 128, 256, 2) == 128
    # consistency: the chunk it returns actually fits
    assert fused_fits(3, 2, 128, 256, 2)


def test_chunk_search_covers_all_aligned_divisors():
    """The search must consider every 8-aligned divisor, not just the
    halving chain: tail-shrink batches can be 24 rows, whose divisor
    chain is 24 -> 8 (12 is not 8-aligned; halving 24 -> 12 -> 6 would
    miss 8 and fall back to the scan path)."""
    from ast_tpu.ops.fused_lstm import aligned_divisors
    assert aligned_divisors(24) == [24, 8]
    assert aligned_divisors(128) == [128, 64, 32, 16, 8]
    assert aligned_divisors(96) == [96, 48, 32, 24, 16, 8]
    assert aligned_divisors(4) == []
    # monkeypatch-free functional check: a fits predicate that accepts
    # only chunk 8 must still be found from B=24
    from ast_tpu.ops import fused_lstm

    orig = fused_lstm.fused_fits
    try:
        fused_lstm.fused_fits = lambda L, D2, c, H, wb=4: c == 8
        assert fused_lstm.fused_chunk_size(3, 2, 24, 256, 2) == 8
    finally:
        fused_lstm.fused_fits = orig


def test_fused_eligible_across_all_recipe_buckets():
    """The recipe buckets 20 durations x 80 frames (max_sp 1680 frames
    -> T' up to 420 post-CNN).  Both kernels must stay fused-eligible
    (chunk > 0) for EVERY bucket at the recipe batch and the throughput
    batch — a policy regression here silently falls back to the scan
    path and halves throughput on long utterances."""
    Vp = round_up(1098, 128)
    for b in range(20):
        frames = 21 * 80 if b == 19 else (b + 1) * 80
        Tp = frames // 4
        for B in (32, 128):
            dc = fused_decoder_chunk(3, B, 512, 128, 512, Tp, Vp, 2)
            assert dc > 0, f"decoder scan fallback at bucket {b} B={B}"
            assert B % dc == 0
        # encoder VMEM is T-independent (streamed per-step blocks)
        assert fused_chunk_size(3, 2, 32, 256, 2) > 0
        assert fused_chunk_size(3, 2, 128, 256, 2) > 0


def _tiny_decoder_inputs(B, T=6, H=16, E=8, A=16, L=2, Vp=128, steps=5):
    rng = np.random.RandomState(0)
    f32 = np.float32
    enc = jnp.asarray(rng.randn(B, T, H), f32)
    h0 = jnp.asarray(rng.randn(L, B, H), f32)
    c0 = jnp.asarray(rng.randn(L, B, H), f32)
    w = {
        "wx0": jnp.asarray(rng.randn(E + A, 4 * H) * 0.2, f32),
        "wx_rest": jnp.asarray(rng.randn(L - 1, H, 4 * H) * 0.2, f32),
        "wh": jnp.asarray(rng.randn(L, H, 4 * H) * 0.2, f32),
        "b": jnp.asarray(rng.randn(L, 4 * H) * 0.1, f32),
        "wa": jnp.asarray(rng.randn(H, H) * 0.2, f32),
        "wa_b": jnp.asarray(rng.randn(H) * 0.1, f32),
        "ctx_w": jnp.asarray(rng.randn(2 * H, A) * 0.2, f32),
        "ctx_b": jnp.asarray(rng.randn(A) * 0.1, f32),
        "out_w": jnp.asarray(rng.randn(A, Vp) * 0.2, f32),
        "out_b": jnp.asarray(rng.randn(Vp) * 0.1, f32),
        "embed": jnp.asarray(rng.randn(Vp, E) * 0.2, f32),
    }
    y = rng.randint(4, 20, (steps, B))
    y_oh = jax.nn.one_hot(y, Vp, dtype=jnp.float32)
    coins = jnp.asarray([1, 0, 1, 0, 1], jnp.int32)
    return enc, h0, c0, w, y_oh, coins


def _apply(enc, h0, c0, w, y_oh, coins, seed=3):
    return fused_decoder_apply(
        enc, h0, c0, w["wx0"], w["wx_rest"], w["wh"], w["b"], w["wa"],
        w["wa_b"], w["ctx_w"], w["ctx_b"], w["out_w"], w["out_b"],
        w["embed"], y_oh, coins, jnp.int32(seed),
        0.0, 0.0, True, True)  # dropout 0: chunk seeds don't matter


def test_decoder_chunk_equivalence_interpret():
    """Full-batch kernel == concat of per-chunk kernels (dropout off)."""
    B = 8
    enc, h0, c0, w, y_oh, coins = _tiny_decoder_inputs(B)
    full = _apply(enc, h0, c0, w, y_oh, coins)
    halves = jnp.concatenate([
        _apply(enc[:4], h0[:, :4], c0[:, :4], w, y_oh[:, :4], coins),
        _apply(enc[4:], h0[:, 4:], c0[:, 4:], w, y_oh[:, 4:], coins),
    ], axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(halves),
                               rtol=1e-5, atol=1e-5)


def test_decoder_chunk_gradient_equivalence_interpret():
    B = 8
    enc, h0, c0, w, y_oh, coins = _tiny_decoder_inputs(B)

    def loss_full(embed):
        w2 = dict(w, embed=embed)
        return jnp.sum(_apply(enc, h0, c0, w2, y_oh, coins) ** 2)

    def loss_chunked(embed):
        w2 = dict(w, embed=embed)
        parts = [
            _apply(enc[b0:b0 + 4], h0[:, b0:b0 + 4], c0[:, b0:b0 + 4],
                   w2, y_oh[:, b0:b0 + 4], coins)
            for b0 in (0, 4)
        ]
        return jnp.sum(jnp.concatenate(parts, axis=1) ** 2)

    g1 = jax.grad(loss_full)(w["embed"])
    g2 = jax.grad(loss_chunked)(w["embed"])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_encoder_chunk_equivalence_interpret():
    from ast_tpu.ops.fused_lstm import fused_stacked_lstm

    rng = np.random.RandomState(1)
    T, D2, B, H, L = 5, 2, 8, 16, 2
    x0 = jnp.asarray(rng.randn(T, D2, B, 4 * H) * 0.3, jnp.float32)
    wx = jnp.asarray(rng.randn(L - 1, D2, H, 4 * H) * 0.2, jnp.float32)
    wh = jnp.asarray(rng.randn(L, D2, H, 4 * H) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(L, D2, 4 * H) * 0.1, jnp.float32)

    full = fused_stacked_lstm(x0, wx, wh, b, jnp.int32(0), False, 0.0,
                              True)
    parts = [fused_stacked_lstm(x0[:, :, b0:b0 + 4], wx, wh, b,
                                jnp.int32(0), False, 0.0, True)
             for b0 in (0, 4)]
    for i in range(3):  # outs, h_fin, c_fin
        merged = jnp.concatenate([p[i] for p in parts], axis=2)
        np.testing.assert_allclose(np.asarray(full[i]), np.asarray(merged),
                                   rtol=1e-5, atol=1e-5)
