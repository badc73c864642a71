"""Pallas fused LSTM kernel vs. the lax.scan reference path (interpret
mode on CPU; the real Mosaic compile is exercised on TPU by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ast_tpu.models import seq2seq
from ast_tpu.ops.fused_lstm import fused_stacked_lstm
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG

V = 12


def _mcfg(fused, dropout=0.0):
    m = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    m["rnn_config"] = dict(m["rnn_config"], dec_vocab_size=V,
                           fused_encoder=fused, fused_interpret=True)
    m["dropout"] = {"embed": 0.0, "rnn": dropout, "out": 0}
    return m


@pytest.fixture(scope="module")
def setup():
    mcfg = _mcfg(False)
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    X = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 13))
    y = jax.random.randint(jax.random.PRNGKey(2), (3, 8), 4, V)
    y = y.astype(jnp.int32).at[:, 0].set(SYMBOLS.GO_ID)
    y = y.at[:, -1].set(SYMBOLS.EOS_ID)
    return params, state, X, y


def test_forward_matches_scan(setup):
    params, state, X, y = setup
    key = jax.random.PRNGKey(3)
    enc_s, h_s, c_s, _ = seq2seq.encode(
        params, state, _mcfg(False), X, key, train=False)
    enc_f, h_f, c_f, _ = seq2seq.encode(
        params, state, _mcfg(True), X, key, train=False)
    np.testing.assert_allclose(np.asarray(enc_s), np.asarray(enc_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_s), np.asarray(c_f),
                               rtol=1e-5, atol=1e-5)


def test_loss_and_grads_match_scan(setup):
    params, state, X, y = setup
    key = jax.random.PRNGKey(4)

    def loss_with(mcfg):
        def f(p):
            return seq2seq.forward_loss(p, state, mcfg, X, y, key,
                                        train=False)[0]
        return f

    l_s, g_s = jax.value_and_grad(loss_with(_mcfg(False)))(params)
    l_f, g_f = jax.value_and_grad(loss_with(_mcfg(True)))(params)
    assert abs(float(l_s) - float(l_f)) < 1e-4
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_s),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch at {pa}")


def test_kernel_grads_vs_autodiff_direct():
    """Check the custom VJP against scan autodiff on the raw kernel API."""
    L, D2, B, H, T = 2, 2, 3, 4, 6
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(T, D2, B, 4 * H), jnp.float32)
    wx = jnp.asarray(rng.randn(L - 1, D2, H, 4 * H) * 0.3, jnp.float32)
    wh = jnp.asarray(rng.randn(L, D2, H, 4 * H) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(L, D2, 4 * H) * 0.1, jnp.float32)

    def scan_ref(x0, wx, wh, b):
        from ast_tpu.ops.lstm import lstm_gates

        def step(carry, xt):
            h, c = carry
            new_h, new_c = [], []
            x = None
            for l in range(L):
                if l == 0:
                    z = xt
                else:
                    z = jnp.einsum("dbi,dih->dbh", x, wx[l - 1])
                z = z + jnp.einsum("dbi,dih->dbh", h[l], wh[l]) \
                    + b[l][:, None, :]
                hn, cn = lstm_gates(z, c[l], H)
                new_h.append(hn)
                new_c.append(cn)
                x = hn
            return (jnp.stack(new_h), jnp.stack(new_c)), x

        h0 = jnp.zeros((L, D2, B, H))
        (hf, cf), outs = jax.lax.scan(step, (h0, h0), x0)
        return outs, hf, cf

    def loss_scan(args):
        outs, hf, cf = scan_ref(*args)
        return jnp.sum(outs * 0.7) + jnp.sum(hf) + 0.5 * jnp.sum(cf)

    def loss_fused(args):
        outs, hf, cf = fused_stacked_lstm(
            *args, 0, False, 0.0, True)
        return jnp.sum(outs * 0.7) + jnp.sum(hf) + 0.5 * jnp.sum(cf)

    args = (x0, wx, wh, b)
    v1, g1 = jax.value_and_grad(loss_scan)(args)
    v2, g2 = jax.value_and_grad(loss_fused)(args)
    assert abs(float(v1) - float(v2)) < 1e-4
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_kernel_bf16_residuals_grads_close():
    """bf16 weights => bf16 residual streams; gradients must stay close
    to the f32 kernel path (bf16-level tolerance)."""
    L, D2, B, H, T = 2, 2, 3, 4, 6
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(T, D2, B, 4 * H), jnp.float32)
    wx = jnp.asarray(rng.randn(L - 1, D2, H, 4 * H) * 0.3, jnp.float32)
    wh = jnp.asarray(rng.randn(L, D2, H, 4 * H) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(L, D2, 4 * H) * 0.1, jnp.float32)

    def loss(args, dtype):
        x0, wx, wh, b = args
        outs, hf, cf = fused_stacked_lstm(
            x0, wx.astype(dtype), wh.astype(dtype), b, 0, False, 0.0, True)
        return jnp.sum(outs * 0.7) + jnp.sum(hf) + 0.5 * jnp.sum(cf)

    args = (x0, wx, wh, b)
    v32, g32 = jax.value_and_grad(lambda a: loss(a, jnp.float32))(args)
    v16, g16 = jax.value_and_grad(lambda a: loss(a, jnp.bfloat16))(args)
    assert abs(float(v32) - float(v16)) / max(1.0, abs(float(v32))) < 2e-2
    for a, b_ in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        a, b_ = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        denom = np.maximum(np.abs(a), 1.0)
        assert np.max(np.abs(a - b_) / denom) < 5e-2


def test_dropout_path_finite(setup):
    params, state, X, y = setup
    mcfg = _mcfg(True, dropout=0.3)
    key = jax.random.PRNGKey(5)

    def f(p):
        return seq2seq.forward_loss(p, state, mcfg, X, y, key,
                                    train=True, teach_ratio=1.0)[0]

    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
