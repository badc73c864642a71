"""Optimizer chain: hooks order, freeze masking, noise schedule."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.train.optimizer import build_optimizer, freeze_mask


def _params():
    return {
        "cnn": [{"w": jnp.ones((3, 3))}],
        "enc": {"lstm": [{"wx": jnp.ones((2, 4))}]},
        "dec": {"embed": jnp.ones((5, 2)), "out_w": jnp.ones((2, 5))},
    }


def test_adam_updates(tmp_path):
    params = _params()
    cfg = {"type": 0, "lr": 0.01, "l2": 0.0001, "grad_clip": 2,
           "grad_noise_eta": 0, "freeze": []}
    tx, opt_state = build_optimizer(cfg, params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    assert float(new["dec"]["embed"][0, 0]) < 1.0  # moved downhill


def test_grad_clip_applied():
    params = {"w": jnp.zeros((4,))}
    cfg = {"type": 1, "lr": 1.0, "l2": 0, "grad_clip": 1.0,
           "grad_noise_eta": 0, "freeze": []}
    tx, opt_state = build_optimizer(cfg, params)
    grads = {"w": jnp.full((4,), 100.0)}
    updates, _ = tx.update(grads, opt_state, params)
    norm = float(jnp.linalg.norm(updates["w"]))
    assert abs(norm - 1.0) < 1e-5  # clipped to unit global norm * lr 1


def test_freeze_mask_paths():
    params = _params()
    mask = freeze_mask(params, ["cnn", "dec.embed"])
    assert mask["cnn"][0]["w"] is False
    assert mask["dec"]["embed"] is False
    assert mask["dec"]["out_w"] is True
    assert mask["enc"]["lstm"][0]["wx"] is True


def test_frozen_leaves_not_updated():
    params = _params()
    cfg = {"type": 0, "lr": 0.1, "l2": 0.001, "grad_clip": 2,
           "grad_noise_eta": 0, "freeze": ["dec"]}
    tx, opt_state = build_optimizer(cfg, params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert np.all(np.asarray(updates["dec"]["embed"]) == 0)
    assert np.all(np.asarray(updates["dec"]["out_w"]) == 0)
    assert np.any(np.asarray(updates["cnn"][0]["w"]) != 0)


def test_grad_noise():
    params = {"w": jnp.zeros((1000,))}
    cfg = {"type": 1, "lr": 1.0, "l2": 0, "grad_clip": 0,
           "grad_noise_eta": 0.01, "freeze": []}
    tx, opt_state = build_optimizer(cfg, params)
    grads = {"w": jnp.zeros((1000,))}
    updates, opt_state = tx.update(grads, opt_state, params)
    std = float(jnp.std(updates["w"]))
    assert 0.05 < std < 0.2  # sqrt(0.01/(1+0)^0.55) = 0.1


def test_bf16_moments_dtype():
    """optimizer.moments_dtype="bfloat16": the first-moment accumulator
    is stored bf16 (half the HBM footprint/traffic), second moment and
    amsgrad max stay f32, and the update direction matches the f32
    optimizer closely."""
    params = _params()
    base = {"type": 0, "lr": 0.01, "l2": 0, "grad_clip": 0,
            "grad_noise_eta": 0, "freeze": []}
    tx32, st32 = build_optimizer(dict(base), params)
    txbf, stbf = build_optimizer(dict(base, moments_dtype="bfloat16"),
                                 params)

    adam_states = [s for s in jax.tree.leaves(
        stbf, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(s, "mu")]
    assert adam_states
    for s in adam_states:
        assert {str(l.dtype) for l in jax.tree.leaves(s.mu)} \
            == {"bfloat16"}
        assert {str(l.dtype) for l in jax.tree.leaves(s.nu)} \
            == {"float32"}
        assert {str(l.dtype) for l in jax.tree.leaves(s.nu_max)} \
            == {"float32"}

    grads = jax.tree.map(lambda p: 0.1 * jnp.ones_like(p), params)
    for _ in range(3):
        u32, st32 = tx32.update(grads, st32, params)
        ubf, stbf = txbf.update(grads, stbf, params)
    for a, b in zip(jax.tree.leaves(u32), jax.tree.leaves(ubf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-6)


def test_bf16_moments_checkpoint_roundtrip(tmp_path):
    """A bf16 first moment must survive the NPZ snapshot: ml_dtypes
    bfloat16 would serialize as raw |V2 void bytes and lose its type on
    load, so save_checkpoint upcasts it to f32 (optax re-casts to
    moments_dtype on the next update)."""
    from ast_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params = _params()
    cfg = {"type": 0, "lr": 0.01, "l2": 0, "grad_clip": 0,
           "grad_noise_eta": 0, "freeze": [],
           "moments_dtype": "bfloat16"}
    tx, st = build_optimizer(cfg, params)
    grads = jax.tree.map(lambda p: 0.1 * jnp.ones_like(p), params)
    _, st = tx.update(grads, st, params)

    path = str(tmp_path / "seq2seq_1.model.npz")
    save_checkpoint(path, params, {}, opt_state=st)
    snap = load_checkpoint(path)

    loaded_dtypes = {np.asarray(x).dtype.kind
                     for x in jax.tree.leaves(snap["opt"])}
    assert "V" not in loaded_dtypes  # every leaf is a real numpy dtype

    orig_mu = [s.mu for s in jax.tree.leaves(
        st, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(s, "mu")][0]
    # value check: find a loaded f32 leaf equal to the bf16 mu upcast
    want = np.asarray(jnp.asarray(orig_mu["dec"]["embed"]), np.float32)
    hits = [x for x in jax.tree.leaves(snap["opt"])
            if np.asarray(x).shape == want.shape
            and np.array_equal(np.asarray(x, np.float32), want)]
    assert hits, "upcast mu values not found in the loaded snapshot"


def test_bf16_moments_resume_keeps_template_dtype(tmp_path):
    """Resuming a bf16-mu run must restore moments in the TEMPLATE's
    dtype: checkpoints store f32 (the NPZ upcast above), and handing f32
    buffers to the donated bf16-mu train step would force a full retrace
    plus doubled moment HBM on every resume (trainer._load_snapshot)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from conftest import make_tiny_experiment

    from ast_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from ast_tpu.train.trainer import NN

    exp = make_tiny_experiment(
        str(tmp_path),
        optimizer={"type": 0, "lr": 0.01, "l2": 0, "grad_clip": 0,
                   "grad_noise_eta": 0, "freeze": [],
                   "moments_dtype": "bfloat16"})
    nn = NN(exp)
    mu_dtypes = {s.mu and jax.tree.leaves(s.mu)[0].dtype
                 for s in jax.tree.leaves(
                     nn.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
                 if hasattr(s, "mu")}
    assert mu_dtypes == {jnp.dtype(jnp.bfloat16)}

    path = str(tmp_path / "snap.npz")
    save_checkpoint(path, nn.params, nn.state, opt_state=nn.opt_state)
    nn._load_snapshot(load_checkpoint(path))
    mu_after = [jax.tree.leaves(s.mu)[0].dtype
                for s in jax.tree.leaves(
                    nn.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
                if hasattr(s, "mu")]
    assert set(mu_after) == {jnp.dtype(jnp.bfloat16)}
