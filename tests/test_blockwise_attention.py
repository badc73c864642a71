"""Blockwise (online-softmax) attention == dense attention."""

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.ops.attention import init_attention_params, luong_attention


def _setup(B=3, T=50, H=16):
    key = jax.random.PRNGKey(0)
    params = init_attention_params(key, H, H)
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, T, H))
    h = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    return params, enc, h


def test_blockwise_matches_dense():
    params, enc, h = _setup()
    ht_d, a_d = luong_attention(params, enc, h)
    ht_b, a_b = luong_attention(params, enc, h, block_size=16)
    np.testing.assert_allclose(np.asarray(ht_d), np.asarray(ht_b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_d), np.asarray(a_b),
                               rtol=1e-5, atol=1e-5)


def test_blockwise_with_mask():
    params, enc, h = _setup()
    mask = jnp.arange(50)[None, :] < jnp.array([50, 30, 7])[:, None]
    ht_d, a_d = luong_attention(params, enc, h, enc_mask=mask)
    ht_b, a_b = luong_attention(params, enc, h, enc_mask=mask,
                                block_size=16)
    np.testing.assert_allclose(np.asarray(ht_d), np.asarray(ht_b),
                               rtol=1e-5, atol=1e-5)
    # masked positions get zero attention
    assert float(np.asarray(a_b)[2, 7:].sum()) < 1e-6


def test_blockwise_gradients_match():
    params, enc, h = _setup(T=40)

    def loss(p, block):
        ht, _ = luong_attention(p, enc, h, block_size=block)
        return jnp.sum(ht ** 2)

    g_d = jax.grad(loss)(params, 0)
    g_b = jax.grad(loss)(params, 16)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
