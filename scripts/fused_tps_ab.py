#!/usr/bin/env python
"""Hardware timing A/B: fused train decoder at 1 vs 2 tokens per grid
step (rnn_config.fused_tokens_per_step; VERDICT r4 #7 experiment).

Bit-identical math (pinned by tests/test_fused_decoder.py); this
measures whether halving the Mosaic grid (2 tokens per kernel
invocation -> half the block DMA/bookkeeping overhead) buys real step
time.  Interleaved rounds, best-of + median per arm.

Usage: python scripts/fused_tps_ab.py [--rounds 6] [--steps 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from ast_tpu.models import seq2seq
from ast_tpu.train.optimizer import build_optimizer


def make_runner(B, T, U, tps):
    mcfg, params, state = bench._flagship(fused=True)
    mcfg["rnn_config"]["fused_tokens_per_step"] = tps
    opt_cfg = {"type": 0, "lr": 1e-3, "l2": 1e-4, "grad_clip": 2,
               "grad_noise_eta": 0, "freeze": []}
    opt, opt_state0 = build_optimizer(opt_cfg, params)
    X, y = bench._batch(B, T, U)

    @jax.jit
    def step(p, s, o, i):
        def loss_fn(pp):
            return seq2seq.forward_loss(
                pp, s, mcfg, X, y,
                jax.random.fold_in(jax.random.PRNGKey(3), i),
                train=True, teach_ratio=0.8, add_noise=0.25,
                compute_dtype=jnp.bfloat16)

        (loss, ns), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        updates, o = opt.update(grads, o, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        return p, ns, o, loss

    def run(n_steps):
        p, s, o = params, state, opt_state0
        loss = None
        for i in range(n_steps):
            p, s, o, loss = step(p, s, o, i)
        np.asarray(loss)  # sync
        return n_steps * B

    run(2)  # compile + warm
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    configs = [("B32", 32, 640, 48), ("B128", 128, 640, 48)]
    for name, B, T, U in configs:
        runners = {}
        for tps in (1, 2):
            try:
                runners[tps] = make_runner(B, T, U, tps)
            except Exception as e:
                print(f"{name} S={tps}: compile failed: {e}",
                      flush=True)
        if len(runners) < 2:
            continue
        rates = {1: [], 2: []}
        for r in range(args.rounds):
            for tps, run in runners.items():
                t0 = time.perf_counter()
                n = run(args.steps)
                rates[tps].append(n / (time.perf_counter() - t0))
        for tps in (1, 2):
            v = rates[tps]
            print(f"{name} S={tps}: best {max(v):8.1f}  "
                  f"median {np.median(v):8.1f} utts/s  "
                  + " ".join(f"{x:.0f}" for x in v), flush=True)
        pairs = [b / a for a, b in zip(rates[1], rates[2])]
        print(f"{name} paired S2/S1 ratios: "
              + " ".join(f"{r:.3f}" for r in pairs)
              + f"  median {np.median(pairs):.3f}", flush=True)


if __name__ == "__main__":
    main()
