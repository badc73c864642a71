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
    """The core DP correctness oracle: TRAIN-mode gradients (dropout,
    speech noise, scheduled sampling all on — jax.random is
    partitionable threefry, so sharding cannot change the stream)
    computed on an 8-way sharded batch must equal single-device
    gradients (SURVEY §4)."""
    mcfg, params, state = _model()
    mcfg = dict(mcfg, dropout={"embed": 0.1, "rnn": 0.1, "out": 0})
    B = 16
    X = np.array(jax.random.normal(jax.random.PRNGKey(1), (B, 80, 13)))
    y = np.array(jax.random.randint(
        jax.random.PRNGKey(2), (B, 10), 4, V), dtype=np.int32)
    y[:, 0] = SYMBOLS.GO_ID
    y[:, -1] = SYMBOLS.EOS_ID

    def loss_fn(p, X, y):
        return seq2seq.forward_loss(p, state, mcfg, jnp.asarray(X),
                                    jnp.asarray(y), jax.random.PRNGKey(0),
                                    train=True, n_real=B,
                                    teach_ratio=0.8, add_noise=0.25)[0]

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


@pytest.mark.slow
def test_dp_full_train_step_matches_single_device():
    """The hard case the grad oracle above sidesteps: a FULL train-mode
    step — dropout, speech noise, scheduled sampling, Adam update — on a
    4x2 (dp x tp) mesh must produce the same params as one device.
    jax.random is partitionable threefry, so the same key yields the
    same random values regardless of sharding."""
    from ast_tpu.train.optimizer import build_optimizer

    mcfg, params, state = _model()
    mcfg = dict(mcfg, dropout={"embed": 0.1, "rnn": 0.1, "out": 0})
    B = 16
    X = np.array(jax.random.normal(jax.random.PRNGKey(1), (B, 80, 13)),
                 dtype=np.float32)
    y = np.array(jax.random.randint(
        jax.random.PRNGKey(2), (B, 10), 4, V), dtype=np.int32)
    y[:, 0] = SYMBOLS.GO_ID
    y[:, -1] = SYMBOLS.EOS_ID
    opt_cfg = {"type": 0, "lr": 1e-2, "l2": 1e-4, "grad_clip": 2,
               "grad_noise_eta": 0, "freeze": []}
    opt, opt_state = build_optimizer(opt_cfg, params)
    key = jax.random.PRNGKey(7)

    def step(p, o, X, y):
        def loss_fn(p):
            return seq2seq.forward_loss(
                p, state, mcfg, X, y, key, train=True, n_real=B,
                teach_ratio=0.8, random_out=0.1, add_noise=0.25)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, o = opt.update(grads, o, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, o, loss

    p1, _, loss1 = jax.jit(step)(params, opt_state, X, y)

    mesh = make_mesh({"data_axis": 4, "model_axis": 2})
    p_repl = replicate(params, mesh)
    o_repl = replicate(opt_state, mesh)
    batch = shard_batch({"X": X, "y": y}, mesh)
    p2, _, loss2 = jax.jit(step)(p_repl, o_repl, batch["X"], batch["y"])

    assert abs(float(loss1) - float(loss2)) < 1e-4 * max(1, abs(float(loss1)))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
