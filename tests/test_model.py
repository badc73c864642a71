"""Model core: shapes, loss, determinism, decode, masking, overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ast_tpu.models import seq2seq
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG


V = 12


@pytest.fixture(scope="module")
def model():
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)  # deep copy
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=V)
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    return mcfg, params, state


def _batch(key, B=4, T=100, U=10):
    kx, ky = jax.random.split(key)
    X = jax.random.normal(kx, (B, T, 13))
    y = jax.random.randint(ky, (B, U), 4, V).astype(jnp.int32)
    y = y.at[:, 0].set(SYMBOLS.GO_ID).at[:, -1].set(SYMBOLS.EOS_ID)
    return X, y


def test_encode_shapes(model):
    mcfg, params, state = model
    X, _ = _batch(jax.random.PRNGKey(1))
    enc, h0, c0, new_state = seq2seq.encode(
        params, state, mcfg, X, jax.random.PRNGKey(2), True)
    assert enc.shape == (4, 25, 16)  # T=100 -> /4
    assert h0.shape == (2, 4, 16) and c0.shape == (2, 4, 16)
    # BN state updated in train mode
    changed = jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        state["cnn_bn"], new_state["cnn_bn"])
    assert any(jax.tree.leaves(changed))


def test_loss_finite_and_deterministic(model):
    mcfg, params, state = model
    X, y = _batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(3)
    l1, _ = seq2seq.forward_loss(params, state, mcfg, X, y, key, train=True,
                                 teach_ratio=0.8, add_noise=0.25)
    l2, _ = seq2seq.forward_loss(params, state, mcfg, X, y, key, train=True,
                                 teach_ratio=0.8, add_noise=0.25)
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)


def test_pad_rows_no_loss(model):
    """Dummy all-PAD rows must contribute exactly zero loss."""
    mcfg, params, state = model
    X, y = _batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(4)
    base, _ = seq2seq.forward_loss(params, state, mcfg, X, y, key,
                                   train=False, n_real=4)
    X_pad = jnp.concatenate([X, jnp.zeros_like(X[:2])], axis=0)
    y_pad = jnp.concatenate(
        [y, jnp.full_like(y[:2], SYMBOLS.PAD_ID)], axis=0)
    padded, _ = seq2seq.forward_loss(params, state, mcfg, X_pad, y_pad, key,
                                     train=False, n_real=4)
    assert abs(float(base) - float(padded)) < 1e-3


def test_greedy_decode(model):
    mcfg, params, state = model
    X, _ = _batch(jax.random.PRNGKey(5))
    preds, n = seq2seq.predict_greedy(params, state, mcfg, X, 12)
    assert preds.shape == (4, 12)
    assert preds.dtype == jnp.int32


def test_enc_mask(model):
    mcfg, params, state = model
    x_len = jnp.array([100, 50, 25, 10])
    mask = seq2seq.make_enc_mask(mcfg, x_len, 25)
    assert mask.shape == (4, 25)
    assert bool(mask[0].all())
    assert int(mask[3].sum()) < 25


def test_enc_mask_counts_max_pool(model):
    """The mask must apply EVERY time-reducing stage, including the
    legacy per-layer max-pool — the valid length is conv_out_len's, not
    the conv arithmetic alone."""
    from ast_tpu.ops.cnn import conv_out_len

    mcfg, _, _ = model
    pooled = jax.tree.map(lambda x: x, mcfg)
    pooled["cnn_config"] = {
        "cnn_layers": [dict(l, max_pool=[2, 2])
                       for l in mcfg["cnn_config"]["cnn_layers"]]}
    x_len = jnp.array([100, 50, 25, 10])
    mask = seq2seq.make_enc_mask(pooled, x_len, 25)
    want = np.asarray(conv_out_len(pooled["cnn_config"], x_len))
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)),
                                  np.minimum(want, 25))


def test_gradients_flow_everywhere(model):
    mcfg, params, state = model
    X, y = _batch(jax.random.PRNGKey(6))

    def loss_fn(p):
        return seq2seq.forward_loss(p, state, mcfg, X, y,
                                    jax.random.PRNGKey(0), train=True)[0]

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    for path, leaf in flat:
        arr = np.asarray(leaf)
        assert np.isfinite(arr).all()
        # every parameter tensor receives some gradient
        assert np.any(arr != 0), f"zero grad at {path}"


def test_weight_noise(model):
    mcfg, params, state = model
    noised = seq2seq.add_weight_noise(params, jax.random.PRNGKey(0),
                                      0.0, 0.1)
    a = np.asarray(params["dec"]["embed"])
    b = np.asarray(noised["dec"]["embed"])
    assert np.any(a != b)
    # cnn/attn untouched
    assert np.array_equal(np.asarray(params["cnn"][0]["w"]),
                          np.asarray(noised["cnn"][0]["w"]))


def test_tiny_overfit():
    """Loss must drop sharply when overfitting one batch."""
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=V)
    mcfg["dropout"] = {"embed": 0, "rnn": 0, "out": 0}
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    X, y = _batch(jax.random.PRNGKey(7), B=2, T=40, U=6)

    import optax
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def loss_fn(p):
            return seq2seq.forward_loss(
                p, state, mcfg, X, y, jax.random.PRNGKey(0), train=True)

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_state, \
            opt_state, loss

    first = None
    for i in range(60):
        params, state, opt_state, loss = step(params, state, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first
