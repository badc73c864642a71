"""Multi-device data parallelism on the 8-device virtual CPU mesh:
sharded-grad == single-device-grad, mesh construction, batch sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ast_tpu.models import seq2seq
from ast_tpu.parallel.mesh import make_mesh, param_spec, replicate, shard_batch
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG

V = 12


def _model():
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=V)
    mcfg["dropout"] = {"embed": 0, "rnn": 0, "out": 0}
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    return mcfg, params, state


def test_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh({"data_axis": 0, "model_axis": 1})
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh({"data_axis": 4, "model_axis": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data_axis": 16, "model_axis": 1})


def test_dp_grads_match_single_device():
    """The core DP correctness oracle: gradients computed on an 8-way
    sharded batch must equal single-device gradients (SURVEY §4)."""
    mcfg, params, state = _model()
    B = 16
    X = np.array(jax.random.normal(jax.random.PRNGKey(1), (B, 80, 13)))
    y = np.array(jax.random.randint(
        jax.random.PRNGKey(2), (B, 10), 4, V), dtype=np.int32)
    y[:, 0] = SYMBOLS.GO_ID
    y[:, -1] = SYMBOLS.EOS_ID

    def loss_fn(p, X, y):
        # train=False: avoids RNG-placement differences; grads still flow
        return seq2seq.forward_loss(p, state, mcfg, jnp.asarray(X),
                                    jnp.asarray(y), jax.random.PRNGKey(0),
                                    train=False, n_real=B)[0]

    g_single = jax.jit(jax.grad(loss_fn))(params, X, y)

    mesh = make_mesh({"data_axis": 8, "model_axis": 1})
    p_repl = replicate(params, mesh)
    batch = shard_batch({"X": X.astype(np.float32), "y": y}, mesh)
    g_sharded = jax.jit(jax.grad(loss_fn))(p_repl, batch["X"], batch["y"])

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_model_parallel_loss_matches():
    """Vocab-sharded (tensor-parallel) loss == replicated loss."""
    mcfg, params, state = _model()
    B = 8
    X = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (B, 40, 13)),
                   dtype=np.float32)
    y = np.array(jax.random.randint(
        jax.random.PRNGKey(2), (B, 8), 4, V), dtype=np.int32)
    y[:, 0] = SYMBOLS.GO_ID

    def loss_fn(p, X, y):
        return seq2seq.forward_loss(p, state, mcfg, X, y,
                                    jax.random.PRNGKey(0), train=False,
                                    n_real=B)[0]

    base = float(jax.jit(loss_fn)(params, jnp.asarray(X), jnp.asarray(y)))

    mesh = make_mesh({"data_axis": 2, "model_axis": 4})
    p_sharded = replicate(params, mesh)
    # vocab-dim matrices really are sharded over 'model'
    spec = param_spec(params, mesh)
    out_w_spec = spec["dec"]["out_w"].spec
    assert out_w_spec == jax.sharding.PartitionSpec(None, "model")
    batch = shard_batch({"X": X, "y": y}, mesh)
    got = float(jax.jit(loss_fn)(p_sharded, batch["X"], batch["y"]))
    assert abs(base - got) < 1e-3
