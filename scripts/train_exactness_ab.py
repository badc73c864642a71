#!/usr/bin/env python
"""Hardware A/B for the fused TRAIN step: Pallas kernels vs lax.scan.

The decode-side harness (decode_exactness_ab.py) caught Mosaic's
ambient bf16 demotion of f32 dots (``xla_allow_excess_precision``) —
a hazard interpret-mode CPU tests structurally cannot see.  The train
kernels do not carry token ids through value dots (the scheduled-
sampling one-hot is built by integer compare, fused_decoder.py:222-225),
so the corruption class from the beam kernel cannot occur here; what
CAN differ on hardware is dot rounding: in f32 weight mode Mosaic may
run f32 dots at reduced precision, so fused-f32 training is not
bit-equal to scan-f32 the way interpret mode is.

This script measures that drift end to end on the real chip: N full
train steps (fwd + bwd + Adam) through both paths under identical,
deterministic conditions (dropout 0, teach_ratio 1, no speech noise —
the fused and scan paths draw dropout/coin RNG from different streams
by design, so stochastic runs are not comparable), then reports
per-step loss deltas and final param drift for f32 and bf16 compute.

Run on TPU hardware; takes ~4 compiles.  Results are recorded in
docs/PARITY.md ("Hardware exactness A/B", train-side).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from ast_tpu.models import seq2seq
from ast_tpu.train.optimizer import build_optimizer


def run_path(fused, compute_dtype, n_steps, B, T, U):
    mcfg, params, state = bench._flagship(fused=fused)
    mcfg["dropout"] = {"embed": 0.0, "rnn": 0.0, "out": 0.0}
    opt_cfg = {"type": 0, "lr": 1e-3, "l2": 1e-4, "grad_clip": 2,
               "grad_noise_eta": 0, "freeze": []}
    opt, opt_state = build_optimizer(opt_cfg, params)
    X, y = bench._batch(B, T, U)

    @jax.jit
    def step(params, state, opt_state, i):
        def loss_fn(p):
            return seq2seq.forward_loss(
                p, state, mcfg, X, y, jax.random.fold_in(
                    jax.random.PRNGKey(7), i),
                train=True, teach_ratio=1.0, add_noise=0.0,
                compute_dtype=compute_dtype)

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_state, opt_state, loss

    losses = []
    for i in range(n_steps):
        params, state, opt_state, loss = step(params, state, opt_state, i)
        losses.append(float(jax.device_get(loss)))
    return np.array(losses), jax.device_get(params)


def drift(pa, pb):
    """max over leaves of ||a-b||_inf / (||a||_inf + eps)."""
    worst, where = 0.0, None
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(pa),
            jax.tree_util.tree_leaves_with_path(pb)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        d = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        if d > worst:
            worst, where = d, jax.tree_util.keystr(path)
    return worst, where


def main(n_steps=20, B=32, T=320, U=32):
    for dt_name, dt in (("float32", jnp.float32),
                        ("bfloat16", jnp.bfloat16)):
        lf, pf = run_path(True, dt, n_steps, B, T, U)
        ls, ps = run_path(False, dt, n_steps, B, T, U)
        rel = np.abs(lf - ls) / np.abs(ls)
        d, where = drift(pf, ps)
        print(f"[{dt_name}] loss rel diff: first={rel[0]:.2e} "
              f"max={rel.max():.2e} last={rel[-1]:.2e}; "
              f"param drift after {n_steps} steps: {d:.2e} at {where}")
        print(f"[{dt_name}] fused losses  {np.round(lf[:5], 4)} ... "
              f"{np.round(lf[-2:], 4)}")
        print(f"[{dt_name}] scan  losses  {np.round(ls[:5], 4)} ... "
              f"{np.round(ls[-2:], 4)}")
        # both dtypes must optimize in lockstep at the loss level; the
        # f32 bound is loose because Mosaic's ambient excess-precision
        # setting may run f32 dots below full precision
        assert rel.max() < (5e-2 if dt == jnp.float32 else 1e-1), rel
        assert np.all(np.diff(lf) < 0) == np.all(np.diff(ls) < 0)
    print("OK")


if __name__ == "__main__":
    main()
