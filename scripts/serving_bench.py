"""Serving-artifact decode throughput on the real chip: f32 vs int8.

Exports the flagship greedy decode twice (weights f32 vs --quantize
int8 semantics) for the TPU platform, then interleaves timed rounds of
both artifacts on-device.  Validates the deployment-path claim that
the in-artifact dequant is loop-hoisted by XLA (so int8 costs ~one
dequant pass per call, not per decode step) and records what the
portable StableHLO path gives up vs the in-process fused decoder.
Usage: ``python scripts/serving_bench.py [n_rounds] [B] [T] [stop]``.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    stop = int(sys.argv[4]) if len(sys.argv) > 4 else 175

    from __graft_entry__ import FLAGSHIP_MCFG
    from ast_tpu import serving
    from ast_tpu.models import seq2seq

    with open("experiments/es_en_20h/model_cfg.json") as f:
        mcfg = json.load(f)
    mcfg["rnn_config"]["dec_vocab_size"] = \
        FLAGSHIP_MCFG["rnn_config"]["dec_vocab_size"]
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    X = np.random.RandomState(0).randn(B, T, 13).astype(np.float32)

    arts = {}
    for name, quant in (("f32", False), ("int8", True)):
        t0 = time.time()
        import jax.numpy as jnp
        exp = serving.export_greedy(params, state, mcfg, B, T, stop,
                                    compute_dtype=jnp.bfloat16,
                                    platforms=("tpu",), quantize=quant)
        blob = exp.serialize()
        from jax import export as jax_export
        arts[name] = (jax_export.deserialize(bytearray(blob)), len(blob))
        print(f"{name}: exported {len(blob):,} bytes "
              f"in {time.time() - t0:.0f}s", flush=True)

    # warm (first .call compiles on-device)
    timings = {k: [] for k in arts}
    for name, (art, _) in arts.items():
        t0 = time.time()
        preds, _ = art.call(X)
        np.asarray(preds)
        print(f"{name}: first call {time.time() - t0:.0f}s", flush=True)

    for r in range(n_rounds):
        for name, (art, _) in arts.items():
            t0 = time.perf_counter()
            preds, _ = art.call(X)
            np.asarray(preds)  # sync
            dt = time.perf_counter() - t0
            timings[name].append(B / dt)
            print(f"round {r} {name}: {B / dt:,.0f} utts/sec", flush=True)

    print()
    for name, v in timings.items():
        print(f"{name}: best {max(v):,.0f}  median {np.median(v):,.0f}  "
              f"bytes {arts[name][1]:,}")
    print("int8/f32 median throughput: "
          f"{np.median(timings['int8']) / np.median(timings['f32']):.3f}")


if __name__ == "__main__":
    main()
