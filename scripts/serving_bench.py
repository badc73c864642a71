"""Serving-artifact decode throughput on the real chip: f32 vs int8
vs --native-kernels.

Exports the flagship greedy decode as (a) portable StableHLO with f32
weights, (b) portable with --quantize int8 semantics, (c) native
(fused Mosaic kernels baked in, TPU-only), (d) native + int8, then
interleaves timed rounds of all artifacts on-device.  Validates that
the in-artifact dequant is loop-hoisted by XLA and measures how much
of the in-process fused decode rate the native artifact retains.
Usage: ``python scripts/serving_bench.py [n_rounds] [B] [T] [stop]
[pipe_depth]``.
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
    for name, quant, native in (("f32", False, False),
                                ("int8", True, False),
                                ("native", False, True),
                                ("native_q8", True, True)):
        t0 = time.time()
        import jax.numpy as jnp
        exp = serving.export_greedy(params, state, mcfg, B, T, stop,
                                    compute_dtype=jnp.bfloat16,
                                    platforms=("tpu",), quantize=quant,
                                    native=native)
        blob = exp.serialize()
        from jax import export as jax_export
        # jit the deserialized call ONCE: a bare Exported.call re-traces
        # and re-lowers the whole (weights-baked-in) module every
        # invocation — ~127 ms of host work per call on this host, which
        # capped every artifact variant at the same ~1k utts/sec
        art = jax_export.deserialize(bytearray(blob))
        arts[name] = (jax.jit(art.call), len(blob))
        print(f"{name}: exported {len(blob):,} bytes "
              f"in {time.time() - t0:.0f}s", flush=True)

    # warm (first .call compiles on-device)
    timings = {k: [] for k in arts}
    outs = {}
    for name, (call, _) in arts.items():
        t0 = time.time()
        preds, _ = call(X)
        outs[name] = np.asarray(preds)
        print(f"{name}: first call {time.time() - t0:.0f}s", flush=True)
    # timed rounds run on a device-resident input: this bench reaches
    # the chip through a network tunnel, and shipping the (B, T, 13)
    # f32 input (4.25 MB at the flagship shape) per call swamps the
    # device time.  A production serving host feeds the chip over
    # PCIe; the host->device row below documents the tunnel cost.
    t0 = time.perf_counter()
    Xd = jax.device_put(X)
    jax.block_until_ready(Xd)
    print(f"host->device input transfer: "
          f"{time.perf_counter() - t0:.3f}s", flush=True)
    same = (outs["native"] == outs["f32"]).mean()
    print(f"native vs f32 token agreement: {same:.4f} "
          "(bf16 op-order differences only)", flush=True)

    # two timing disciplines per round:
    #  - sync:  one call, block — includes a full tunnel round-trip per
    #    call, the worst case for a latency-bound client
    #  - pipe4: 4 calls in flight, one sync — how a serving host
    #    actually drives the chip (and how bench.py measures the
    #    in-process fused decoder, 10 deep), so this is the
    #    apples-to-apples number for "how much of the fused rate does
    #    the artifact retain"
    DEPTH = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    piped = {k: [] for k in arts}
    for r in range(n_rounds):
        for name, (call, _) in arts.items():
            t0 = time.perf_counter()
            preds, _ = call(Xd)
            np.asarray(preds)  # sync
            dt = time.perf_counter() - t0
            timings[name].append(B / dt)
            t0 = time.perf_counter()
            for _ in range(DEPTH):
                preds, _ = call(Xd)
            np.asarray(preds)  # one sync for the whole chain
            dt = time.perf_counter() - t0
            piped[name].append(DEPTH * B / dt)
            print(f"round {r} {name}: {timings[name][-1]:,.0f} sync  "
                  f"{piped[name][-1]:,.0f} pipe{DEPTH} utts/sec",
                  flush=True)

    print()
    for name in arts:
        print(f"{name}: sync best {max(timings[name]):,.0f} "
              f"median {np.median(timings[name]):,.0f}  |  "
              f"pipe{DEPTH} best {max(piped[name]):,.0f} "
              f"median {np.median(piped[name]):,.0f}  "
              f"bytes {arts[name][1]:,}")
    for metric, t in (("sync", timings), (f"pipe{DEPTH}", piped)):
        print(f"int8/f32 {metric} median: "
              f"{np.median(t['int8']) / np.median(t['f32']):.3f}   "
              f"native/f32 {metric} median: "
              f"{np.median(t['native']) / np.median(t['f32']):.3f}")


if __name__ == "__main__":
    main()
