"""Optimizer chain: hooks order, freeze masking, noise schedule."""

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
