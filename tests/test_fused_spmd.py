"""The flagship fused-kernel configuration under a multi-device mesh.

The recommended throughput config (fused Pallas encoder + decoder) must
compile and execute under SPMD, not just single-chip: GSPMD cannot
partition an opaque Mosaic custom call, so the model runs the kernels
under ``shard_map`` over the mesh's 'data' axis (each device computes
only its local batch rows).  Dropout masks hash GLOBAL row indices, so
the sharded run is bit-identical to the fused single-device run — these
tests pin that equivalence end-to-end through the real train step
(interpret-mode Pallas on the virtual CPU mesh, same mechanism the
driver dry-run validates).
"""

import pytest

pytestmark = pytest.mark.slow

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.parallel.mesh import replicate
from ast_tpu.train.trainer import NN
from tests.conftest import make_tiny_experiment


def _pin(exp, data_axis, model_axis=1):
    path = os.path.join(exp, "train_cfg.json")
    with open(path) as f:
        cfg = json.load(f)
    cfg["parallel"] = {"data_axis": data_axis, "model_axis": model_axis}
    with open(path, "w") as f:
        json.dump(cfg, f)
    mpath = os.path.join(exp, "model_cfg.json")
    with open(mpath) as f:
        mcfg = json.load(f)
    mcfg["rnn_config"].update(fused_encoder=True, fused_decoder=True,
                              fused_interpret=True)
    with open(mpath, "w") as f:
        json.dump(mcfg, f)


def _one_step(nn, batch, epoch_key):
    def copy(t):
        return jax.tree.map(jnp.array, t)

    params = copy(nn.params)
    state = copy(nn.state)
    opt_state = copy(nn.opt_state)
    if nn.mesh is not None:
        params = replicate(params, nn.mesh)
        state = replicate(state, nn.mesh)
        opt_state = replicate(opt_state, nn.mesh)
    return nn._train_step(params, state, opt_state, batch["X"],
                          batch["y"], batch["n_real"], epoch_key, 0)


def _fused_pair(tmp_path, model_axis):
    exp1 = make_tiny_experiment(str(tmp_path / "single"), n_train=16,
                                n_dev=4, batch_size=8)
    exp2 = make_tiny_experiment(str(tmp_path / "mesh"), n_train=16,
                                n_dev=4, batch_size=8)
    _pin(exp1, 1)
    _pin(exp2, 8 // model_axis, model_axis)
    nn1 = NN(exp1)
    nn2 = NN(exp2)
    assert nn1.mesh is None
    assert nn2.mesh is not None
    assert nn2.mesh.shape["data"] == 8 // model_axis
    return nn1, nn2


def test_fused_train_step_mesh_matches_single_device(tmp_path):
    """Full fused train step (dropout on, scheduled sampling, speech
    noise) on an 8-way data mesh == fused single device."""
    nn1, nn2 = _fused_pair(tmp_path, model_axis=1)

    # the fused decoder really is eligible for this config
    from ast_tpu.models.seq2seq import _use_fused_decoder
    assert _use_fused_decoder(nn1.mcfg, nn1.params,
                              jnp.zeros((8, 10, 16)), jnp.zeros((8, 6)),
                              jnp.float32, None)

    gen = nn1.data_loader.get_batch(8, "tiny_train", train=True,
                                    labels=True, epoch=0)
    batch = nn1._device_batch(next(iter(gen)))
    gen2 = nn2.data_loader.get_batch(8, "tiny_train", train=True,
                                     labels=True, epoch=0)
    batch2 = nn2._device_batch(next(iter(gen2)))

    epoch_key = jax.random.PRNGKey(5)
    p1, s1, o1, l1 = _one_step(nn1, batch, epoch_key)
    p2, s2, o2, l2 = _one_step(nn2, batch2, epoch_key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=f"fused mesh-vs-single param mismatch at {pa}")


def test_fused_train_step_dp_tp_mesh(tmp_path):
    """Same equivalence on a 4x2 dp x tp mesh (vocab-dim matrices
    sharded over 'model' around the shard_mapped kernels)."""
    nn1, nn2 = _fused_pair(tmp_path, model_axis=2)

    gen = nn1.data_loader.get_batch(8, "tiny_train", train=True,
                                    labels=True, epoch=0)
    batch = nn1._device_batch(next(iter(gen)))
    gen2 = nn2.data_loader.get_batch(8, "tiny_train", train=True,
                                     labels=True, epoch=0)
    batch2 = nn2._device_batch(next(iter(gen2)))

    epoch_key = jax.random.PRNGKey(7)
    p1, _, _, l1 = _one_step(nn1, batch, epoch_key)
    p2, _, _, l2 = _one_step(nn2, batch2, epoch_key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=f"fused dpxtp-vs-single param mismatch at {pa}")


def test_fused_greedy_mesh_matches_single_device(tmp_path):
    """Fused greedy inference under the mesh (shard_map over 'data')
    returns the same tokens as fused single-device — the dev-decode
    path every training epoch runs."""
    nn1, nn2 = _fused_pair(tmp_path, model_axis=1)

    gen = nn1.data_loader.get_batch(8, "tiny_dev", train=False,
                                    labels=False)
    batch = nn1._device_batch(next(iter(gen)), labels=False)
    gen2 = nn2.data_loader.get_batch(8, "tiny_dev", train=False,
                                     labels=False)
    batch2 = nn2._device_batch(next(iter(gen2)), labels=False)

    from ast_tpu.parallel.mesh import replicate
    p1 = nn1._predict_step(nn1.params, nn1.state, batch["X"])
    p2 = nn2._predict_step(replicate(
        jax.tree.map(jnp.array, nn1.params), nn2.mesh),
        replicate(jax.tree.map(jnp.array, nn1.state), nn2.mesh),
        batch2["X"])
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_fused_beam_mesh_matches_single_device(tmp_path):
    """Fused beam search under the mesh (the shard_map branch of
    ops/beam.py's decode) returns the same hyps/scores/lengths as fused
    single-device — the multi-host offline decode workflow."""
    from ast_tpu.ops.beam import make_beam_decoder

    nn1, nn2 = _fused_pair(tmp_path, model_axis=1)

    gen = nn1.data_loader.get_batch(8, "tiny_dev", train=False,
                                    labels=False)
    batch = nn1._device_batch(next(iter(gen)), labels=False)
    gen2 = nn2.data_loader.get_batch(8, "tiny_dev", train=False,
                                     labels=False)
    batch2 = nn2._device_batch(next(iter(gen2)), labels=False)

    dec1 = make_beam_decoder(nn1.mcfg, N=3, K=3, stop_limit=8)
    dec2 = make_beam_decoder(nn2.mcfg, N=3, K=3, stop_limit=8,
                             mesh=nn2.mesh)
    h1, s1, l1 = dec1(nn1.params, nn1.state, batch["X"])
    h2, s2, l2 = dec2(replicate(
        jax.tree.map(jnp.array, nn1.params), nn2.mesh),
        replicate(jax.tree.map(jnp.array, nn1.state), nn2.mesh),
        batch2["X"])
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_encoder_chunk_dropout_bit_invariant():
    """Row-offset dropout hashing: chunked fused encoder == full-batch
    fused encoder BIT-exactly even with dropout on (the masks hash
    global row ids, so the split point cannot change the stream)."""
    from ast_tpu.ops.fused_lstm import fused_stacked_lstm

    rng = np.random.RandomState(2)
    T, D2, B, H, L = 5, 2, 8, 16, 2
    x0 = jnp.asarray(rng.randn(T, D2, B, 4 * H) * 0.3, jnp.float32)
    wx = jnp.asarray(rng.randn(L - 1, D2, H, 4 * H) * 0.2, jnp.float32)
    wh = jnp.asarray(rng.randn(L, D2, H, 4 * H) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(L, D2, 4 * H) * 0.1, jnp.float32)

    full = fused_stacked_lstm(x0, wx, wh, b, jnp.int32(3), True, 0.3,
                              True, 0, B)
    parts = [fused_stacked_lstm(x0[:, :, b0:b0 + 4], wx, wh, b,
                                jnp.int32(3), True, 0.3, True, b0, B)
             for b0 in (0, 4)]
    for i in range(3):
        merged = jnp.concatenate([p[i] for p in parts], axis=2)
        np.testing.assert_array_equal(np.asarray(full[i]),
                                      np.asarray(merged))


def test_decoder_chunk_dropout_bit_invariant():
    """Same bit-invariance for the fused decoder's emb/rnn dropout."""
    from ast_tpu.ops.fused_decoder import fused_decoder_apply

    rng = np.random.RandomState(3)
    L, B, H, E, A, T, Vp, U = 2, 8, 16, 8, 16, 6, 128, 5
    f32 = np.float32
    enc = jnp.asarray(rng.randn(B, T, H), f32)
    h0 = jnp.asarray(rng.randn(L, B, H) * 0.5, f32)
    c0 = jnp.asarray(rng.randn(L, B, H) * 0.5, f32)
    w = [jnp.asarray(a, f32) for a in [
        rng.randn(E + A, 4 * H) * 0.2, rng.randn(L - 1, H, 4 * H) * 0.2,
        rng.randn(L, H, 4 * H) * 0.2, rng.randn(L, 4 * H) * 0.1,
        rng.randn(H, H) * 0.2, rng.randn(H) * 0.1,
        rng.randn(2 * H, A) * 0.2, rng.randn(A) * 0.1,
        rng.randn(A, Vp) * 0.2, rng.randn(Vp) * 0.1,
        rng.randn(Vp, E) * 0.2]]
    y_oh = jax.nn.one_hot(rng.randint(4, 20, (U, B)), Vp,
                          dtype=jnp.float32)
    coins = jnp.asarray([1, 0, 1, 0, 1], jnp.int32)

    def call(enc_, h0_, c0_, yoh_, off):
        return fused_decoder_apply(
            enc_, h0_, c0_, *w, yoh_, coins, jnp.int32(11),
            0.25, 0.3, True, True, off)

    full = call(enc, h0, c0, y_oh, 0)
    halves = jnp.concatenate([
        call(enc[:4], h0[:, :4], c0[:, :4], y_oh[:, :4], 0),
        call(enc[4:], h0[:, 4:], c0[:, 4:], y_oh[:, 4:], 4),
    ], axis=1)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(halves))
