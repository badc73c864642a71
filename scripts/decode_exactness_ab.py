#!/usr/bin/env python
"""Flagship-vocab (1098) beam A/B on the real chip: fused kernel vs
XLA while-loop — token ids must match EXACTLY.

This is the harness that caught the Mosaic bf16-demotion hazard: with
``xla_allow_excess_precision`` a plain f32 dot runs as one bf16 pass,
corrupting token ids >= 256 routed through the beam kernel's iota-mask
scatter matmuls and quantizing scores/states to a 2^-8 grid (beam was
0/60 identical on a trained checkpoint before the fix; greedy, which
has no value-carrying dots, was 60/60).  ops/fused_infer.py now uses
Precision.HIGHEST for the frontier scatters and an exact 3-pass bf16
split for the parent-state gathers; this script must report 24/24
token-exact hyps with ids >= 256 exercised.  Run on TPU hardware —
interpret mode uses true f32 dots and cannot reproduce the demotion.

Reference semantics being pinned: /root/reference/nn.py:245-322.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from ast_tpu.ops import beam as beam_ops


def main(B=8, T=320, N=3, K=3, stop=24):
    mcfg, params, state = bench._flagship(fused=True)
    X, _ = bench._batch(B, T, 16)
    # bias EOS so hyps finish; random weights otherwise
    params["dec"]["out_b"] = params["dec"]["out_b"].at[2].add(4.0)

    dec_f = beam_ops.make_beam_decoder(mcfg, N=N, K=K, stop_limit=stop,
                                       compute_dtype=jnp.bfloat16)
    m2 = jax.tree.map(lambda x: x, mcfg)
    m2["rnn_config"] = dict(m2["rnn_config"], fused_infer=False)
    dec_l = beam_ops.make_beam_decoder(m2, N=N, K=K, stop_limit=stop,
                                       compute_dtype=jnp.bfloat16)

    hf, sf, lf = (np.asarray(a) for a in dec_f(params, state, X))
    hl, sl, ll = (np.asarray(a) for a in dec_l(params, state, X))

    tok_same = 0
    hi_tokens = 0
    for b in range(B):
        for n in range(N):
            a = hf[b, n, :lf[b, n]].tolist()
            c = hl[b, n, :ll[b, n]].tolist()
            hi_tokens += sum(1 for t in a if t >= 256)
            if a == c:
                tok_same += 1
            else:
                print("DIFF", b, n, "fused", a[:12], "loop", c[:12])
    print(f"token-exact hyps: {tok_same}/{B * N}; "
          f"ids>=256 seen: {hi_tokens}")
    print("max |score diff|:", float(np.max(np.abs(sf - sl))))
    assert tok_same == B * N and hi_tokens > 0


if __name__ == "__main__":
    main()
