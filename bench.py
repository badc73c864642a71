#!/usr/bin/env python
"""Benchmark: training throughput (utterances/sec/chip) on the flagship
es_en_20h model shape, real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Round-5 headline: the SHIPPED harness.  ``NN.train_epoch`` runs the
full 20-bucket es_en_20h-shaped epoch (17,306 utts) with the HBM
feature cache (B=32, G=4, fused+bf16); the recorded value is the
median warm epoch.  The step models below run first and serve as the
watchdog's fallback payload (headline_source says which path produced
the number).

Two baselines are measured and reported (BASELINE.md caveats):

- ``vs_jitted_scan`` (== ``vs_baseline``, the headline): the same train
  step with the Pallas kernels disabled and f32 compute — a fully-jitted
  lax.scan program, i.e. the strongest honest competitor on this chip.
  This is the conservative ratio: everything it beats comes from the
  fused kernels + bf16 policy, not from jit-vs-eager framing.
- ``vs_dispatch_standin``: per-timestep op dispatch without jit over the
  loops, reproducing the reference's execution model (Chainer/CuPy
  launches one CUDA kernel per op per step — reference: seq2seq.py:205-242
  Python time loop).  Forward-only, favoring the baseline; but on this
  machine each dispatch crosses a remote-TPU tunnel, so treat it as an
  upper bound.
"""

import functools
import json
import os
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp


def _flagship(fused=True):
    from __graft_entry__ import FLAGSHIP_MCFG
    from ast_tpu.models import seq2seq

    on_tpu = jax.default_backend() == "tpu"
    mcfg = jax.tree.map(lambda x: x, FLAGSHIP_MCFG)
    mcfg["rnn_config"] = dict(
        mcfg["rnn_config"],
        fused_encoder=fused and on_tpu,
        fused_decoder=fused and on_tpu)
    key = jax.random.PRNGKey(0)
    params, state = seq2seq.init_model(key, mcfg)
    return mcfg, params, state


def _batch(B, T, U, V=1098, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(B, T, 13).astype(np.float32)
    y = rng.randint(4, V, (B, U)).astype(np.int32)
    y[:, 0] = 1
    y[:, -1] = 2
    return jnp.asarray(X), jnp.asarray(y)


def make_train_runner(B=32, T=640, U=48, compute_dtype=jnp.bfloat16,
                      fused=True, steps_per_dispatch=1,
                      moments_dtype=None):
    """Compile + warm a full train step (fwd+bwd+adam); return a
    ``run(n_steps) -> utts/sec`` closure.

    Shapes mirror the es_en_20h recipe (batch 32, bucket 8 of 20 at 80
    frames/bucket); bf16 matmul compute with f32 accumulation is the
    recommended TPU configuration (2.6x over f32 on v5e).  ``fused=False``
    compiles the lax.scan path (the jitted-scan baseline).

    ``steps_per_dispatch=G>1`` scans G stacked batches inside one jitted
    call — the trainer's ``extras.steps_per_dispatch`` configuration
    (bit-equivalent to G sequential steps, tests/test_multi_dispatch.py),
    which amortizes the per-dispatch host overhead."""
    from ast_tpu.models import seq2seq
    from ast_tpu.train.optimizer import build_optimizer

    mcfg, params, state = _flagship(fused=fused)
    opt_cfg = {"type": 0, "lr": 1e-3, "l2": 1e-4, "grad_clip": 2,
               "grad_noise_eta": 0, "freeze": []}
    if moments_dtype:
        opt_cfg["moments_dtype"] = moments_dtype
    opt, opt_state = build_optimizer(opt_cfg, params)
    X, y = _batch(B, T, U)
    key = jax.random.PRNGKey(0)
    G = steps_per_dispatch

    def step(params, state, opt_state, X, y, rng):
        def loss_fn(p):
            return seq2seq.forward_loss(
                p, state, mcfg, X, y, rng, train=True,
                teach_ratio=0.8, add_noise=0.25,
                compute_dtype=compute_dtype)

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, new_state, opt_state, loss

    # RNG keys are derived in-graph from the call index (host-side
    # fold_in would add one device dispatch per call — the overhead the
    # multi-step path exists to amortize; the trainer does the same)
    if G > 1:
        Xs = jnp.broadcast_to(X, (G,) + X.shape)
        ys = jnp.broadcast_to(y, (G,) + y.shape)

        def multi(params, state, opt_state, i):
            keys = jax.random.split(jax.random.fold_in(key, i), G)

            def body(carry, inp):
                p, s, o = carry
                Xi, yi, ki = inp
                p, s, o, loss = step(p, s, o, Xi, yi, ki)
                return (p, s, o), loss

            (params, state, opt_state), losses = jax.lax.scan(
                body, (params, state, opt_state), (Xs, ys, keys))
            return params, state, opt_state, losses[-1]

        # donate like the trainer does (trainer.py donate=(0,1,2)): XLA
        # aliases params/opt-state updates in place instead of writing
        # fresh ~400 MB of param+moment buffers per call
        call = jax.jit(multi, donate_argnums=(0, 1, 2))
    else:
        def single(params, state, opt_state, i):
            return step(params, state, opt_state, X, y,
                        jax.random.fold_in(key, i))

        call = jax.jit(single, donate_argnums=(0, 1, 2))

    # compile + warm-up.  NOTE: on this TPU runtime block_until_ready()
    # does not reliably wait for remote compute — every timed region must
    # end with a value transfer (device_get) to be a true sync point.
    carry = {"v": (params, state, opt_state)}
    p, s, o = carry["v"]
    p, s, o, loss = call(p, s, o, 0)
    float(jax.device_get(loss))
    for i in range(max(1, 10 // G)):
        p, s, o, loss = call(p, s, o, 1000 + i)
    float(jax.device_get(loss))
    carry["v"] = (p, s, o)

    def reset():
        # a failed call may have donated (deleted) any of the carried
        # buffers; rebuild them on device so later rounds still run
        _, p0, s0 = _flagship(fused=fused)
        carry["v"] = (p0, s0, opt.init(p0))

    def run(n_steps):
        n_calls = max(1, n_steps // G)
        p, s, o = carry["v"]
        try:
            t0 = time.perf_counter()
            for i in range(n_calls):
                p, s, o, loss = call(p, s, o, i)
            float(jax.device_get(loss))
            dt = time.perf_counter() - t0
        except BaseException:
            reset()
            raise
        carry["v"] = (p, s, o)
        return (n_calls * G * B) / dt

    return run


def bench_train_step(n_steps=30, B=32, T=640, U=48,
                     compute_dtype=jnp.bfloat16, fused=True, n_rounds=4):
    run = make_train_runner(B, T, U, compute_dtype, fused)
    return max(run(n_steps) for _ in range(n_rounds))


def bench_reference_style(n_steps=2, B=32, T=640, U=48):
    """Reference-execution-model stand-in: per-timestep op dispatch, no
    jit over the loops — the Chainer/CuPy pattern on this chip."""
    from ast_tpu.ops.lstm import lstm_gates

    mcfg, params, state = _flagship(fused=False)
    rnn = mcfg["rnn_config"]
    enc_units = rnn["hidden_units"] // 2
    X, y = _batch(B, T, U)

    from ast_tpu.ops.cnn import conv_frontend

    def run_once():
        h, _ = conv_frontend(params["cnn"], state["cnn_bn"],
                             mcfg["cnn_config"], X, False)
        Tp = h.shape[1]
        seq = jnp.transpose(h, (1, 0, 2))
        # per-timestep eager encoder (fwd + rev), like the reference loop
        hs = [jnp.zeros((2, B, enc_units))] * 3
        cs = [jnp.zeros((2, B, enc_units))] * 3
        outs = []
        for t in range(Tp):
            x = jnp.stack([seq[t], seq[Tp - 1 - t]])
            for l, lp in enumerate(params["enc"]["lstm"]):
                z = jnp.einsum("dbi,dih->dbh", x, lp["wx"]) + \
                    jnp.einsum("dbh,dhk->dbk", hs[l], lp["wh"]) + \
                    lp["b"][:, None, :]
                hn, cn = lstm_gates(z, cs[l], enc_units)
                hs[l], cs[l] = hn, cn
                x = hn
            outs.append(x)
        enc = jnp.concatenate(
            [jnp.stack([o[0] for o in outs]),
             jnp.flip(jnp.stack([o[1] for o in outs]), 0)], axis=-1)
        enc = jnp.transpose(enc, (1, 0, 2))
        # per-token eager decoder
        dh = [jnp.concatenate([hs[l][0], hs[l][1]], -1) for l in range(3)]
        dc = [jnp.concatenate([cs[l][0], cs[l][1]], -1) for l in range(3)]
        ht = jnp.zeros((B, rnn["attn_units"]))
        loss = 0.0
        for i in range(U - 1):
            emb = params["dec"]["embed"][y[:, i]]
            xd = jnp.concatenate([emb, ht], -1)
            for l, lp in enumerate(params["dec"]["lstm"]):
                z = xd @ lp["wx"] + dh[l] @ lp["wh"] + lp["b"]
                hn, cn = lstm_gates(z, dc[l], rnn["hidden_units"])
                dh[l], dc[l] = hn, cn
                xd = hn
            q = xd @ params["attn"]["wa"][0]["w"] + params["attn"]["wa"][0]["b"]
            scores = jnp.einsum("bth,bh->bt", enc, q)
            alphas = jax.nn.softmax(scores, -1)
            cv = jnp.einsum("bt,bth->bh", alphas, enc)
            htn = jnp.tanh(
                jnp.concatenate([cv, xd], -1) @ params["attn"]["context"]["w"]
                + params["attn"]["context"]["b"])
            logits = htn @ params["dec"]["out_w"] + params["dec"]["out_b"]
            logp = jax.nn.log_softmax(logits, -1)
            tgt = y[:, i + 1]
            nll = -jnp.take_along_axis(logp, tgt[:, None], -1)[:, 0]
            loss = loss + jnp.sum(nll * (tgt != 0)) / B
            ht = htn
        return loss

    # forward-only timing (the reference also runs backward; forward-only
    # makes this a conservative, favorable-to-baseline comparison)
    loss = run_once()
    float(jax.device_get(loss))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        loss = run_once()
    float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    return (n_steps * B) / dt


# Real es_en_20h train-split composition — (bucket, n_utts, frames, U) —
# derived from the reference's fisher_20h.info (17,306 utterances;
# counts per 80-frame duration bucket; U = estimated max BPE target
# length per bucket, words x1.4 + GO/EOS, rounded up to 16).  Used by
# --epoch to measure throughput over the REAL duration mix rather than
# one bucket.
EPOCH_BUCKETS = [
    (0, 1025, 80, 16), (1, 3516, 160, 16), (2, 2543, 240, 32),
    (3, 1939, 320, 32), (4, 1486, 400, 48), (5, 1188, 480, 48),
    (6, 932, 560, 64), (7, 736, 640, 80), (8, 674, 720, 64),
    (9, 603, 800, 64), (10, 550, 880, 64), (11, 505, 960, 64),
    (12, 420, 1040, 80), (13, 342, 1120, 80), (14, 277, 1200, 80),
    (15, 189, 1280, 96), (16, 138, 1360, 96), (17, 86, 1440, 80),
    (18, 63, 1520, 80), (19, 94, 1680, 96),
]


def bench_epoch(B=32, G=4, compute_dtype=jnp.bfloat16, result_box=None):
    """Train-throughput over a full es_en_20h-shaped epoch: every
    duration bucket at its real utterance count (EPOCH_BUCKETS), fused
    kernels + multi-step dispatch, bucket-major order (the grouped
    stream the trainer produces).  Returns (epoch_seconds,
    utts_per_sec) best-of-2 epochs after a warm epoch."""
    from ast_tpu.models import seq2seq
    from ast_tpu.train.optimizer import build_optimizer

    mcfg, params, state = _flagship(fused=True)
    opt_cfg = {"type": 0, "lr": 1e-3, "l2": 1e-4, "grad_clip": 2,
               "grad_noise_eta": 0, "freeze": []}
    opt, opt_state = build_optimizer(opt_cfg, params)
    base = jax.random.PRNGKey(0)

    def make_step(T, U, rows=None, g=None):
        rows = B if rows is None else rows
        g = G if g is None else g
        X, y = _batch(rows, T, U)
        Xs = jnp.broadcast_to(X, (g,) + X.shape)
        ys = jnp.broadcast_to(y, (g,) + y.shape)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def multi(params, state, opt_state, i):
            keys = jax.random.split(jax.random.fold_in(base, i), g)

            def body(carry, inp):
                p, s, o = carry
                Xi, yi, ki = inp

                def loss_fn(pp):
                    return seq2seq.forward_loss(
                        pp, s, mcfg, Xi, yi, ki, train=True,
                        teach_ratio=0.8, add_noise=0.25,
                        compute_dtype=compute_dtype)

                (loss, ns), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                upd, o2 = opt.update(grads, o, p)
                p = jax.tree.map(lambda a, u: a + u, p, upd)
                return (p, ns, o2), loss

            carry, losses = jax.lax.scan(
                body, (params, state, opt_state), (Xs, ys, keys))
            return carry + (losses[-1],)

        return multi

    # model the trainer's ACTUAL dispatch plan per bucket: full batches
    # ride G-step multi dispatches, the remainder run as singles, and the
    # last partial batch pads only to dataloader.tail_rows (the
    # shrink_tail_batches policy) instead of the full B
    from ast_tpu.data.dataloader import FisherDataLoader
    plan = []  # (step_fn, n_dispatches) per bucket piece
    total_utts = 0
    total_slots = 0
    for b, n, T, U in EPOCH_BUCKETS:
        n_full, n_tail = divmod(n, B)
        pieces = []  # (rows, g, n_disp)
        if n_full // G:
            pieces.append((B, G, n_full // G))
        if n_full % G:
            pieces.append((B, 1, n_full % G))
        if n_tail:
            pieces.append((FisherDataLoader.tail_rows(n_tail, B, 8), 1, 1))
        for rows, g, n_disp in pieces:
            plan.append((make_step(T, U, rows, g), n_disp))
            total_slots += n_disp * g * rows
        # headline counts REAL utterances (the trainer's accounting:
        # sizes = len(batch['utts'])); the device executes the padded
        # slot count, reported separately
        total_utts += n

    def one_epoch(p, s, o):
        t0 = time.perf_counter()
        loss = None
        for i, (step, n_disp) in enumerate(plan):
            for j in range(n_disp):
                p, s, o, loss = step(p, s, o, i * 1000 + j)
        float(jax.device_get(loss))
        return p, s, o, time.perf_counter() - t0

    p, s, o = params, state, opt_state
    p, s, o, _ = one_epoch(p, s, o)   # warm/compile epoch
    best = 1e9
    for _ in range(2):
        p, s, o, dt = one_epoch(p, s, o)
        best = min(best, dt)
        if result_box is not None:
            # watchdog-visible partial: a wedged later epoch still
            # reports the best completed one
            result_box[0] = (best, total_utts / best, total_slots / best)
    return best, total_utts / best, total_slots / best


# A single tunnel call can block forever when the remote-TPU link drops
# (observed: a trivial matmul hanging >2 min mid-bench).  The driver
# contract is ONE JSON line no matter what, so emission is funneled
# through emit_once() and a watchdog thread prints the best-so-far
# partial results and force-exits if the deadline passes while the main
# thread is wedged inside a blocked device call.
_emitted = threading.Event()
_emit_lock = threading.Lock()


def emit_once(payload):
    with _emit_lock:
        if _emitted.is_set():
            return
        _emitted.set()
        print(json.dumps(payload), flush=True)


def _start_watchdog(t0, deadline_s, payload_fn):
    def watch():
        while not _emitted.wait(15):
            if time.time() - t0 > deadline_s:
                payload = payload_fn()
                payload["aborted"] = (
                    f"deadline {deadline_s:.0f}s: device call wedged "
                    "(remote-TPU tunnel); partial results")
                emit_once(payload)
                os._exit(0)

    threading.Thread(target=watch, daemon=True).start()


def _decile_spread(v):
    """(p90 - p10) / median — the artifact's comparability signal.

    The full max-min range can only GROW as more tunnel windows are
    sampled (one slow minute fixes the min forever), so a range-based
    stop could never converge by sampling longer; the decile spread
    shrinks as the stable neighborhood accumulates samples, which is
    what round-over-round comparisons actually need."""
    if len(v) < 2:
        return 0.0
    p10, p90 = np.percentile(v, [10, 90])
    return round(float(p90 - p10) / max(1e-9, float(np.median(v))), 3)


def _bench_real_trainer(deadline_end, warm_target=4):
    """Drive the SHIPPED ``NN.train_epoch`` (hbm_cache, B=32 G=4,
    fused+bf16) over the es_en_20h-shaped epoch corpus; returns a list
    of warm epoch utts/sec (possibly empty on deadline/compile
    failure).  This is the round-5 headline: the artifact number is
    produced by the real harness, not a step model (VERDICT r4 #8)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    try:
        from trainer_epoch_bench import build_corpus, write_configs
        from ast_tpu.train.trainer import NN
    except Exception:
        return [], 0
    try:
        root = os.environ.get("BENCH_TRAINER_ROOT",
                              "/tmp/trainer_epoch_bench")
        n_utts = build_corpus(root, log=lambda *a, **k: None)
        exp = write_configs(root, 32, 4, hbm_cache=True)
        nn = NN(exp)
        rates = []
        for e in range(1, warm_target + 2):
            if rates and time.time() > deadline_end:
                break
            t0 = time.perf_counter()
            nn.train_epoch("syn_train", epoch=e)
            dt = time.perf_counter() - t0
            if e > 1:          # epoch 1 = compiles + cache upload
                rates.append(n_utts / dt)
        return rates, n_utts
    except Exception:
        return [], 0


def _train_payload(specs, fused_rounds, scan_best, standin,
                   round_times=None, deadline_hit=None,
                   trainer_rates=None, trainer_n=17306):
    """Build the result JSON from whatever has been measured so far."""
    done = {k: v for k, v in fused_rounds.items() if v}
    if not done and not trainer_rates:
        return {
            "metric": "fisher_es_en_20h_train_utts_per_sec_per_chip",
            "value": 0.0, "unit": "utts/sec/chip",
            "vs_baseline": None, "config": "no measurement completed",
        }
    if not done:
        # step models produced nothing but the real harness did: the
        # headline measurement must not be discarded
        tr = sorted(trainer_rates)
        med = float(np.median(tr))
        return {
            "metric": "fisher_es_en_20h_train_utts_per_sec_per_chip",
            "value": round(med, 2), "unit": "utts/sec/chip",
            "headline_source": "real_trainer",
            "config": (f"REAL NN.train_epoch: full 20-bucket es_en_20h"
                       f" epoch ({trainer_n} utts), B=32 G=4, fused "
                       "Pallas + bf16 + hbm_cache; median of warm "
                       "epochs (step models produced no rounds)"),
            "trainer_epochs_utts_per_sec": [round(v, 1) for v in tr],
            "trainer_epoch_seconds": round(trainer_n / med, 2),
            "trainer_spread": _decile_spread(tr),
            "vs_baseline": None,
        }
    fused_best = {k: max(v) for k, v in done.items()}
    fused_median = {k: float(np.median(v)) for k, v in done.items()}
    fused_spread = {k: _decile_spread(v) for k, v in done.items()}
    fused_range = {
        k: round((max(v) - min(v)) / max(1e-9, float(np.median(v))), 3)
        for k, v in done.items()}
    best_cfg = max(fused_best, key=fused_best.get)
    value = fused_best[best_cfg]
    B, G = specs[best_cfg]
    # headline: the REAL harness when it produced warm epochs; the
    # step model is the fallback (and always reported alongside)
    trainer = sorted(trainer_rates or [])
    if trainer:
        value = float(np.median(trainer))
        config = (f"REAL NN.train_epoch: full 20-bucket es_en_20h "
                  f"epoch ({trainer_n} utts), B=32 G=4, fused Pallas "
                  "+ bf16 + hbm_cache; median of warm epochs")
        scan_same = scan_best.get("B32_G4", 0.0)
    else:
        config = (f"step model: fused Pallas + bf16, B={B}"
                  + (f", {G} steps/dispatch" if G > 1 else ""))
        scan_same = scan_best.get(best_cfg, 0.0)
    vs_scan = (value / scan_same) if scan_same else None
    vs_standin = (value / standin) if standin else None
    return {
        "metric": "fisher_es_en_20h_train_utts_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "utts/sec/chip",
        "config": config,
        "headline_source": "real_trainer" if trainer
                           else "step_model_fallback",
        **({"trainer_epochs_utts_per_sec":
            [round(v, 1) for v in trainer],
            "trainer_epoch_seconds":
            round(trainer_n / float(np.median(trainer)), 2),
            "trainer_spread": _decile_spread(trainer)}
           if trainer else {}),
        # headline ratio = the defensible one: vs our own fully-jitted
        # f32 lax.scan step at the same batch size AND same dispatch
        # grouping on the same chip
        "vs_baseline": round(vs_scan, 2) if vs_scan else None,
        "vs_jitted_scan": round(vs_scan, 2) if vs_scan else None,
        "vs_dispatch_standin": round(vs_standin, 2) if vs_standin else None,
        "median": round(fused_median[best_cfg], 2),
        "spread": fused_spread[best_cfg],
        "spread_def": "(p90-p10)/median over rounds",
        "spread_full_range": fused_range[best_cfg],
        "rounds": len(done[best_cfg]),
        # per-round [seconds-since-start, utts/sec] for the headline
        # config: a window-straddled artifact is diagnosable post hoc
        "round_samples": [
            [round(t, 1), round(v, 1)]
            for t, v in (round_times or {}).get(best_cfg, [])],
        **({} if deadline_hit is None else {"deadline_hit": deadline_hit}),
        "fused_utts_per_sec": {
            k: round(v, 2) for k, v in fused_best.items()},
        "fused_median_utts_per_sec": {
            k: round(v, 2) for k, v in fused_median.items()},
        "fused_spread": fused_spread,
        "baseline_utts_per_sec": {
            **{f"jitted_scan_f32_{k}": round(v, 2)
               for k, v in scan_best.items() if v},
            "dispatch_standin": round(standin, 2) if standin else None,
        },
    }


def main():
    import sys
    t0 = time.time()
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "2700"))
    # Fast-fail on a dead device backend: probing in a SUBPROCESS (a
    # wedged in-process backend init cannot be recovered from, see
    # __graft_entry__._default_backend_alive) keeps the one-line JSON
    # contract within ~90 s of a dead tunnel instead of waiting out the
    # full watchdog deadline.
    from __graft_entry__ import _default_backend_alive
    if not _default_backend_alive():
        emit_once({
            "metric": ("fisher_es_en_20h_full_epoch_train"
                       if "--epoch" in sys.argv
                       else "fisher_es_en_20h_train_utts_per_sec_per_chip"),
            "value": 0.0, "unit": "utts/sec/chip",
            "config": "device backend unreachable (remote-TPU tunnel "
                      "down); no measurement",
        })
        return
    if "--epoch" in sys.argv:
        def epoch_payload(dt, ups, sps):
            return {
                "metric": "fisher_es_en_20h_full_epoch_train",
                "value": round(ups, 2),
                "unit": "utts/sec/chip",
                "padded_slots_per_sec": round(sps, 2),
                "epoch_seconds": round(dt, 2),
                "config": "real 20-bucket duration mix, B=32, G=4, "
                          "fused + bf16",
            }

        box = [None]
        _start_watchdog(t0, deadline, lambda: (
            epoch_payload(*box[0]) if box[0] else {
                "metric": "fisher_es_en_20h_full_epoch_train",
                "value": 0.0, "unit": "utts/sec/chip",
                "config": "no measurement completed",
            }))
        dt, ups, sps = bench_epoch(result_box=box)
        emit_once(epoch_payload(dt, ups, sps))
        return
    # Round-5 structure: the step models run FIRST (quick, and the
    # watchdog's fallback payload), then the REAL harness produces the
    # headline — NN.train_epoch with the HBM cache over the full
    # es_en_20h-shaped epoch (VERDICT r4 #8).  The step-model spec set
    # is trimmed to two configs to leave compile budget for the
    # trainer's 20-bucket program set: B32_G4 (the recipe shape the
    # trainer runs — its f32 scan twin is the headline's vs_baseline)
    # and B256_G4 (the best single-shape config, round-4 continuity).
    specs = {"B32_G4": (32, 4), "B256_G4": (256, 4)}
    fused_rounds = {}
    round_times = {}
    scan_best = {}
    standin_box = [None]
    trainer_box = [[], 17306]
    _start_watchdog(t0, deadline, lambda: _train_payload(
        specs, fused_rounds, scan_best, standin_box[0], round_times,
        trainer_rates=trainer_box[0], trainer_n=trainer_box[1]))
    runners, scans = {}, {}
    for name, (B, G) in specs.items():
        try:
            runners[name] = make_train_runner(B=B, steps_per_dispatch=G)
        except Exception:
            continue
        try:
            # the scan baseline gets the SAME dispatch amortization so
            # the ratio isolates kernels+bf16, not host overhead
            scans[name] = make_train_runner(
                B=B, compute_dtype=jnp.float32, fused=False,
                steps_per_dispatch=G)
        except Exception:
            pass
    fused_rounds.update({k: [] for k in runners})
    round_times.update({k: [] for k in runners})
    scan_best.update({k: 0.0 for k in scans})
    if not runners:
        # tunnel down at compile time: still honor the one-JSON contract
        emit_once(_train_payload(specs, fused_rounds, scan_best, None))
        return

    def one_round():
        # a transient tunnel error loses this round's sample, not the
        # whole bench (hangs are handled by the watchdog instead)
        for k, run in runners.items():
            B = specs[k][0]
            try:
                ups = run(max(8, 1024 // B))
                fused_rounds[k].append(ups)
                round_times[k].append((time.time() - t0, ups))
            except Exception:
                pass
        for k, run in scans.items():
            B = specs[k][0]
            try:
                scan_best[k] = max(scan_best[k], run(max(4, 256 // B)))
            except Exception:
                pass

    for _ in range(4):
        one_round()
    # The 4 base rounds run back-to-back, i.e. inside ONE tunnel speed
    # window — a slow minute depresses them all together.  Stretch a
    # few extra rounds across windows (20 s gaps), but keep this stage
    # short: the trainer headline below needs the bulk of the budget,
    # and the HBM-cache trainer is tunnel-insensitive anyway (the cache
    # removed the per-batch wire, BASELINE round 5).
    stale = 0
    stretch_t0 = time.time()
    extras_end = min(t0 + 0.25 * deadline, stretch_t0 + 360)

    def cur_best():
        return max((max(v) for v in fused_rounds.values() if v),
                   default=0.0)

    def headline_spread():
        done = {k: v for k, v in fused_rounds.items() if v}
        if not done:
            return 0.0
        best_cfg = max(done, key=lambda k: max(done[k]))
        return _decile_spread(done[best_cfg])

    for _ in range(40):
        if (stale >= 3 and headline_spread() <= 0.10
                and time.time() - stretch_t0 > 120) \
                or time.time() > extras_end:
            break
        time.sleep(20)
        prev_best = cur_best()
        one_round()
        stale = 0 if cur_best() > prev_best * 1.005 else stale + 1
    # the eager stand-in costs minutes of tunnel round-trips; one quick
    # attempt before the trainer stage
    if time.time() - t0 < 0.35 * deadline:
        try:
            standin_box[0] = bench_reference_style()
        except Exception:
            standin_box[0] = None

    # ---- the headline: the REAL harness (epoch 1 is the 20-bucket
    # compile set + the one-time cache upload; warm epochs are the
    # measurement).  The watchdog payload already carries whatever has
    # been measured if this stage overruns the deadline.
    trainer_box[0], n = _bench_real_trainer(t0 + 0.92 * deadline)
    if n:
        trainer_box[1] = n
    deadline_hit = (headline_spread() > 0.10
                    if not trainer_box[0]
                    else _decile_spread(trainer_box[0]) > 0.10)

    emit_once(_train_payload(specs, fused_rounds, scan_best,
                             standin_box[0], round_times,
                             deadline_hit=deadline_hit,
                             trainer_rates=trainer_box[0],
                             trainer_n=trainer_box[1]))


if __name__ == "__main__":
    main()
