"""Pallas TPU kernel: fused attention-LSTM decoder training recurrence.

One Mosaic kernel advances the whole decoder step — scheduled-sampling
input selection, embedding, the LSTM stack, Luong attention over
VMEM-resident encoder states, the attentional hidden state, and the
argmax feed — per grid step, with all weights resident in VMEM
(reference equivalent: the per-token Python loop at seq2seq.py:399-473).

Design choices that keep the kernel lean:
- The vocabulary projection for the LOSS is hoisted OUT of the kernel:
  the kernel streams the attentional hidden states ``ht``; loss logits
  are one big (U*B, A) @ (A, V) matmul outside.  In-kernel the
  projection runs only to argmax-feed the next step.
- Scheduled-sampling coins are precomputed outside (one per step,
  first/last forced — reference: seq2seq.py:423-436); teacher tokens are
  streamed as one-hot rows.
- The selected input (teacher or argmax) is streamed out as a one-hot
  (``sel``) so the embedding gradient outside is a single einsum.
- Backward: a mirrored reverse-time kernel produces per-step gradients
  of all matmul *inputs* (dz for LSTMs, d_scores/d_cv/d_q for attention,
  d_ctx for the context layer); weight gradients and d_enc_states then
  become large time-batched einsums outside on the MXU.

The vocab axis is padded to a multiple of 128 lanes (padded out_b rows
are -1e9 so argmax never selects them).  Dropout masks use the same
counter-hash scheme as the fused encoder.  bf16 weights are assumed for
VMEM fit at flagship size; callers fall back to the lax.scan path when
``fused_decoder_fits`` is False.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ast_tpu.ops.fused_lstm import _apply_gates, _drop_mask, aligned_divisors

# Calibrated against observed Mosaic compiles with the raised scoped-vmem
# cap below: chunk 64 at flagship shapes (naive sum ~31 MB) compiles and
# is the measured optimum for B=128 programs (7,730 utts/sec/chip vs
# 6,771 at chunk 16 in the same window); chunk 128 (~46 MB) compiles but
# runs slower.  Budget set between those points so the chunk search
# lands on 64.
VMEM_BUDGET = 40 * 1024 * 1024

# Mosaic's default scoped-vmem ceiling (16 MB) rejects kernels the chip
# schedules fine (v5e VMEM is far larger): B=128-program decoder chunks
# of 32 used to fail at "17.6M/16M scoped vmem".  Raise the cap and let
# the real VMEM allocator be the judge.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def round_up(x, m):
    return ((x + m - 1) // m) * m


def fused_decoder_fits(L, B, H, E, A, T, Vp, weight_bytes=2):
    """VMEM feasibility for the decoder kernels.

    T is deliberately NOT alignment-gated: Mosaic handles unaligned
    encoder lengths (the recipe's odd buckets give T' = 20, 60, ...,
    420), and measured fwd+bwd at those shapes compiles and beats the
    scan fallback by up to 2.6x on the longest bucket (BASELINE.md)."""
    if H % 128 or A % 128 or E % 128 or B % 8 or Vp % 128:
        return False
    wb = weight_bytes
    lstm_w = ((E + A) * 4 * H + (L - 1) * H * 4 * H + L * H * 4 * H) * wb
    attn_w = (H * H + (2 * H) * A) * wb
    vocab_w = (A * Vp + Vp * E) * wb
    enc = B * T * H * wb
    streams = B * (L * 4 * H + 2 * L * H + T + 3 * H + 2 * Vp + E) * wb * 2
    scratch = (2 * L * B * H + B * A + B * Vp) * 4
    est = lstm_w + attn_w + vocab_w + enc + streams + scratch
    return est < VMEM_BUDGET


def fused_decoder_chunk(L, B, H, E, A, T, Vp, weight_bytes=2):
    """Largest batch chunk (divisor of B, multiple of 8) that fits; 0 if
    none.  The decoder recurrence has no cross-batch coupling, so large
    batches run as independent chunk calls instead of falling back to the
    scan path.  (An earlier extra halving worked around Mosaic's default
    16 MB scoped-vmem ceiling; the raised ``vmem_limit_bytes`` compiler
    param made it unnecessary — flagship B=128 now runs decoder chunks
    of 64.)"""
    for c in aligned_divisors(B):
        if fused_decoder_fits(L, c, H, E, A, T, Vp, weight_bytes):
            return c
    return 0


def _dot(a, w):
    return jax.lax.dot_general(
        a.astype(w.dtype), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_t(a, w):
    """a @ w^T (contract over w's last axis)."""
    return jax.lax.dot_general(
        a.astype(w.dtype), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _eye3(B, T):
    """(B, T, B) mask: m[b, t, b'] = (b == b').  Lane dim stays B."""
    row = jax.lax.broadcasted_iota(jnp.int32, (B, T, B), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, T, B), 2)
    return row == lane


def _diag_rows(all_pairs, B, T):
    """(B*T, B) all-pairs -> (B, T): out[b, t] = all_pairs[b*T + t, b].
    Only outer/sublane reshapes — the lane dim stays B."""
    x = all_pairs.reshape(B, T, B)
    return jnp.sum(jnp.where(_eye3(B, T), x, 0.0), axis=2)


def _diag_expand(vals, B, T):
    """(B, T) -> (B*T, B): out[b*T + t, b] = vals[b, t] (block diag)."""
    x = jnp.where(_eye3(B, T), vals[:, :, None], 0.0)
    return x.reshape(B * T, B)


def _dot_c0(a, b):
    """Contract dim 0 of both: (N, M) x (N, K) -> (M, K) on the MXU."""
    return jax.lax.dot_general(
        a.astype(b.dtype), b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(L, B, H, E, A, T, Vp, emb_drop, rnn_drop, train, S, U,
                seed_ref, off_ref, coin_ref, yoh_ref, enc_ref,
                wx0_ref, wxr_ref, wh_ref, b_ref, wa_ref, wab_ref,
                ctxw_ref, ctxb_ref, outw_ref, outb_ref, embed_ref,
                h0_ref, c0_ref,
                ht_out_ref, sel_ref, acts_ref, call_ref, hall_ref,
                alpha_ref, q_ref, cv_ref, emb_ref,
                h_s, c_s, ht_s, oh_s):
    gs = pl.program_id(0)

    @pl.when(gs == 0)
    def _():
        h_s[...] = h0_ref[...]
        c_s[...] = c0_ref[...]
        ht_s[...] = jnp.zeros_like(ht_s)
        oh_s[...] = jnp.zeros_like(oh_s)

    # S decoder tokens advance per grid step (S=2 halves the grid;
    # VERDICT r4 #7 experiment).  The dropout-hash seeds and coin
    # indexing use the ABSOLUTE step t, so any S produces bit-identical
    # streams; scheduled-sampling semantics are unchanged (the in-kernel
    # argmax feed below runs whenever the next absolute step samples,
    # whether that step lives in this grid step or the next).
    for s in range(S):
        t = gs * S + s

        # ---- input selection: teacher one-hot vs previous argmax
        use_true = coin_ref[t] > 0
        sel = jnp.where(use_true, yoh_ref[s].astype(jnp.float32),
                        oh_s[...])
        sel_ref[s] = sel.astype(sel_ref.dtype)

        emb = _dot(sel, embed_ref[...])                 # (B, E)
        if train and emb_drop > 0:
            keep = _drop_mask((B, E), emb_drop, seed_ref[0] + 2 * t,
                              row_axis=0, row_offset=off_ref[0])
            emb = jnp.where(keep, emb / (1.0 - emb_drop), 0.0)
        emb_ref[s] = emb.astype(emb_ref.dtype)

        x = jnp.concatenate([emb, ht_s[...]], axis=-1)  # (B, E+A)

        # ---- LSTM stack
        for l in range(L):
            z = _dot(x, wx0_ref[...]) if l == 0 \
                else _dot(x, wxr_ref[l - 1])
            z = z + _dot(h_s[l], wh_ref[l]) + b_ref[l]
            i, f, g, o, c_new, h_new = _apply_gates(z, c_s[l], H)
            acts_ref[s, l] = jnp.concatenate(
                [i, f, g, o], axis=-1).astype(acts_ref.dtype)
            call_ref[s, l] = c_new.astype(call_ref.dtype)
            hall_ref[s, l] = h_new.astype(hall_ref.dtype)
            h_s[l] = h_new
            c_s[l] = c_new
            x = h_new
            if train and rnn_drop > 0:
                keep = _drop_mask((B, H), rnn_drop,
                                  seed_ref[0] + 2 * (t * L + l) + 1,
                                  row_axis=0, row_offset=off_ref[0])
                x = jnp.where(keep, x / (1.0 - rnn_drop), 0.0)

        h_top = x                                        # (B, H), dropped

        # ---- Luong attention over resident encoder states
        q = _dot(h_top, wa_ref[...]) + wab_ref[...]      # (B, H)
        q_ref[s] = q.astype(q_ref.dtype)
        # Batched contractions on the MXU (Mosaic's dot has no batch
        # dims): all-pairs products against enc flattened to (B*T, H),
        # diagonal selected with a cheap mask; only outer/sublane
        # reshapes occur.
        enc2 = enc_ref[...]                              # (B*T, H) wdt
        scores = _diag_rows(_dot_t(enc2, q), B, T)       # (B, T)
        alphas = jax.nn.softmax(scores, axis=-1)
        alpha_ref[s] = alphas.astype(alpha_ref.dtype)
        cv = _dot_c0(_diag_expand(alphas, B, T), enc2)   # (B, H)
        cv_ref[s] = cv.astype(cv_ref.dtype)

        ctx_in = jnp.concatenate([cv, h_top], axis=-1)   # (B, 2H)
        ht = jnp.tanh(_dot(ctx_in, ctxw_ref[...]) + ctxb_ref[...])
        ht_s[...] = ht
        ht_out_ref[s] = ht.astype(ht_out_ref.dtype)

        # ---- argmax feed (loss logits computed outside); only needed
        # when the NEXT step samples.  Exact argmax (ties -> first
        # index), same as the scan path's jnp.argmax.
        next_samples = jnp.where(
            t + 1 < U, coin_ref[jnp.minimum(t + 1, U - 1)] == 0, False)

        @pl.when(next_samples)
        def _():
            logits = _dot(ht, outw_ref[...]) + outb_ref[...]  # (B, Vp)
            idx = jnp.argmax(logits, axis=-1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
            oh_s[...] = (lane == idx[:, None]).astype(jnp.float32)


def decoder_forward(enc_states, dec_h0, dec_c0, w, y_oh, coins,
                    seed, drop_emb, drop_rnn, train, interpret=False,
                    row_offset=0, tokens_per_step=1):
    """Run the fused decoder over all steps.

    enc_states (B,T,H) [weight dtype]; dec_h0/c0 (L,B,H) f32;
    y_oh (U,B,Vp) teacher one-hots [weight dtype]; coins (U,) int32
    (1 = teacher-forced).  ``w``: dict with wx0 (E+A,4H),
    wx_rest (L-1,H,4H), wh (L,H,4H), b (L,4H), wa (H,H), wa_b (H,),
    ctx_w (2H,A), ctx_b (A,), out_w (A,Vp), out_b (Vp,), embed (Vp,E).
    ``tokens_per_step`` (S): decoder tokens advanced per grid step —
    must divide U; bit-identical outputs at any S (absolute-step
    seeds/coins).  Returns (ht_seq (U,B,A) f32, residuals dict).
    """
    U, B, Vp = y_oh.shape
    L, _, H = dec_h0.shape
    T = enc_states.shape[1]
    A = w["ctx_w"].shape[1]
    E = w["embed"].shape[1]
    rdt = w["wh"].dtype
    S = int(tokens_per_step)
    assert U % S == 0, (U, S)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    off_arr = jnp.asarray(row_offset, jnp.int32).reshape(1)

    kern = functools.partial(_fwd_kernel, L, B, H, E, A, T, Vp,
                             float(drop_emb), float(drop_rnn),
                             bool(train), S, U)

    def tblk(*dims):
        return pl.BlockSpec((S,) + dims,
                            lambda t: (t,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((U, B, A), jnp.float32),    # ht_seq
        jax.ShapeDtypeStruct((U, B, Vp), rdt),           # sel
        jax.ShapeDtypeStruct((U, L, B, 4 * H), rdt),     # acts
        jax.ShapeDtypeStruct((U, L, B, H), rdt),         # c_all
        jax.ShapeDtypeStruct((U, L, B, H), rdt),         # h_all
        jax.ShapeDtypeStruct((U, B, T), rdt),            # alphas
        jax.ShapeDtypeStruct((U, B, H), rdt),            # q
        jax.ShapeDtypeStruct((U, B, H), rdt),            # cv
        jax.ShapeDtypeStruct((U, B, E), rdt),            # emb (dropped)
    ]
    out_specs = [tblk(B, A), tblk(B, Vp), tblk(L, B, 4 * H),
                 tblk(L, B, H), tblk(L, B, H), tblk(B, T),
                 tblk(B, H), tblk(B, H), tblk(B, E)]

    out = pl.pallas_call(
        kern,
        grid=(U // S,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # row offset
            pl.BlockSpec(memory_space=pltpu.SMEM),      # coins (full)
            tblk(B, Vp),                                # y_oh[t]
            full(),                                     # enc
            full(), full(), full(), full(),             # wx0, wxr, wh, b
            full(), full(),                             # wa, wa_b
            full(), full(),                             # ctx_w, ctx_b
            full(), full(),                             # out_w, out_b
            full(),                                     # embed
            full(), full(),                             # h0, c0
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, B, H), jnp.float32),          # h
            pltpu.VMEM((L, B, H), jnp.float32),          # c
            pltpu.VMEM((B, A), jnp.float32),             # ht
            pltpu.VMEM((B, Vp), jnp.float32),            # argmax one-hot
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(seed_arr, off_arr, coins, y_oh,
      enc_states.reshape(-1, enc_states.shape[-1]),
      w["wx0"], w["wx_rest"], w["wh"], w["b"],
      w["wa"], w["wa_b"], w["ctx_w"], w["ctx_b"],
      w["out_w"], w["out_b"], w["embed"],
      dec_h0, dec_c0)

    names = ["ht", "sel", "acts", "c_all", "h_all", "alphas", "q", "cv",
             "emb"]
    return out[0], dict(zip(names, out))


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(L, B, H, E, A, T, Vp, emb_drop, rnn_drop, train, S, U,
                seed_ref, off_ref, acts_ref, call_ref, cprev_ref,
                alpha_ref, ht_ref, dhtext_ref,
                enc_ref, wx0_ref, wxr_ref, wh_ref, wa_ref, ctxw_ref,
                dz_ref, dpre_ref, dscore_ref, dcv_ref, dq_ref, demb_ref,
                dh0_ref, dc0_ref,
                dh_s, dc_s, dht_s):
    """Reverse-time pass: per-step gradients of every matmul input.

    Grid step k processes the S absolute steps of reverse block
    U//S-1-k (sub-steps walked high-to-low); weight/enc gradients are
    computed outside from the streamed outputs."""
    k = pl.program_id(0)
    gs = U // S - 1 - k

    @pl.when(k == 0)
    def _():
        dh_s[...] = jnp.zeros_like(dh_s)
        dc_s[...] = jnp.zeros_like(dc_s)
        dht_s[...] = jnp.zeros_like(dht_s)

    inv_keep_r = 1.0 / (1.0 - rnn_drop) if rnn_drop > 0 else 1.0
    inv_keep_e = 1.0 / (1.0 - emb_drop) if emb_drop > 0 else 1.0

    for s in reversed(range(S)):
        t = gs * S + s

        # ---- attentional hidden state / tanh / context layer
        ht = ht_ref[s].astype(jnp.float32)               # (B, A)
        d_ht = dhtext_ref[s].astype(jnp.float32) + dht_s[...]
        d_pre = d_ht * (1.0 - ht * ht)
        dpre_ref[s] = d_pre.astype(dpre_ref.dtype)
        d_ctx_in = _dot_t(d_pre, ctxw_ref[...])          # (B, 2H)
        d_cv = d_ctx_in[:, :H]
        d_htop = d_ctx_in[:, H:]
        dcv_ref[s] = d_cv.astype(dcv_ref.dtype)

        # ---- attention backward
        alphas = alpha_ref[s].astype(jnp.float32)        # (B, T)
        enc2 = enc_ref[...]                              # (B*T, H) wdt
        d_alphas = _diag_rows(_dot_t(enc2, d_cv), B, T)  # (B, T)
        inner = jnp.sum(d_alphas * alphas, axis=-1, keepdims=True)
        d_scores = alphas * (d_alphas - inner)
        dscore_ref[s] = d_scores.astype(dscore_ref.dtype)
        d_q = _dot_c0(_diag_expand(d_scores, B, T), enc2)  # (B, H)
        dq_ref[s] = d_q.astype(dq_ref.dtype)
        d_htop = d_htop + _dot_t(d_q, wa_ref[...])

        # top-layer dropout between h_{L-1} and its consumers
        if train and rnn_drop > 0:
            keep = _drop_mask((B, H), rnn_drop,
                              seed_ref[0] + 2 * (t * L + (L - 1)) + 1,
                              row_axis=0, row_offset=off_ref[0])
            d_htop = jnp.where(keep, d_htop * inv_keep_r, 0.0)

        # ---- LSTM stack backward
        dx_above = None
        for l in reversed(range(L)):
            if l == L - 1:
                cons = d_htop
            else:
                cons = dx_above
                if train and rnn_drop > 0:
                    keep = _drop_mask((B, H), rnn_drop,
                                      seed_ref[0] + 2 * (t * L + l) + 1,
                                      row_axis=0, row_offset=off_ref[0])
                    cons = jnp.where(keep, cons * inv_keep_r, 0.0)
            dh = dh_s[l] + cons

            acts = acts_ref[s, l].astype(jnp.float32)
            i = acts[..., :H]
            f = acts[..., H:2 * H]
            g = acts[..., 2 * H:3 * H]
            o = acts[..., 3 * H:]
            c_new = call_ref[s, l].astype(jnp.float32)
            c_prev = cprev_ref[s, l].astype(jnp.float32)

            tanh_c = jnp.tanh(c_new)
            do = dh * tanh_c
            dc = dc_s[l] + dh * o * (1.0 - tanh_c * tanh_c)
            di = dc * g
            df = dc * c_prev
            dg = dc * i
            dc_s[l] = dc * f

            dz = jnp.concatenate([
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ], axis=-1)
            dz_ref[s, l] = dz.astype(dz_ref.dtype)

            dh_s[l] = _dot_t(dz, wh_ref[l])
            if l > 0:
                dx_above = _dot_t(dz, wxr_ref[l - 1])
            else:
                dx0 = _dot_t(dz, wx0_ref[...])           # (B, E+A)
                d_emb = dx0[:, :E]
                if train and emb_drop > 0:
                    keep = _drop_mask((B, E), emb_drop,
                                      seed_ref[0] + 2 * t,
                                      row_axis=0, row_offset=off_ref[0])
                    d_emb = jnp.where(keep, d_emb * inv_keep_e, 0.0)
                demb_ref[s] = d_emb.astype(demb_ref.dtype)
                dht_s[...] = dx0[:, E:]                  # to step t-1

    @pl.when(k == U // S - 1)
    def _():
        dh0_ref[...] = dh_s[...]
        dc0_ref[...] = dc_s[...]


def decoder_backward(res, enc_states, dec_c0, w, d_ht_ext, seed,
                     drop_emb, drop_rnn, train, interpret=False,
                     row_offset=0, tokens_per_step=1):
    """Run the reverse kernel; returns the per-step gradient streams plus
    (dh0, dc0)."""
    U, B, A = d_ht_ext.shape
    L = res["acts"].shape[1]
    H = res["c_all"].shape[-1]
    T = enc_states.shape[1]
    E = res["emb"].shape[-1]
    rdt = w["wh"].dtype
    S = int(tokens_per_step)
    assert U % S == 0, (U, S)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    off_arr = jnp.asarray(row_offset, jnp.int32).reshape(1)

    c_prev = jnp.concatenate(
        [dec_c0[None].astype(res["c_all"].dtype), res["c_all"][:-1]],
        axis=0)

    kern = functools.partial(_bwd_kernel, L, B, H, E, A, T, 0,
                             float(drop_emb), float(drop_rnn),
                             bool(train), S, U)

    def rblk(*dims):
        return pl.BlockSpec((S,) + dims,
                            lambda k: (U // S - 1 - k,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((U, L, B, 4 * H), rdt),     # dz
        jax.ShapeDtypeStruct((U, B, A), rdt),            # d_pre
        jax.ShapeDtypeStruct((U, B, T), rdt),            # d_scores
        jax.ShapeDtypeStruct((U, B, H), rdt),            # d_cv
        jax.ShapeDtypeStruct((U, B, H), rdt),            # d_q
        jax.ShapeDtypeStruct((U, B, E), rdt),            # d_emb
        jax.ShapeDtypeStruct((L, B, H), jnp.float32),    # dh0
        jax.ShapeDtypeStruct((L, B, H), jnp.float32),    # dc0
    ]
    out_specs = [rblk(L, B, 4 * H), rblk(B, A), rblk(B, T),
                 rblk(B, H), rblk(B, H), rblk(B, E), full(), full()]

    out = pl.pallas_call(
        kern,
        grid=(U // S,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),      # row offset
            rblk(L, B, 4 * H),                          # acts
            rblk(L, B, H),                              # c_all
            rblk(L, B, H),                              # c_prev
            rblk(B, T),                                 # alphas
            rblk(B, A),                                 # ht
            rblk(B, A),                                 # d_ht_ext
            full(),                                     # enc
            full(), full(), full(),                     # wx0, wxr, wh
            full(), full(),                             # wa, ctx_w
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, B, H), jnp.float32),
            pltpu.VMEM((L, B, H), jnp.float32),
            pltpu.VMEM((B, A), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(seed_arr, off_arr, res["acts"], res["c_all"], c_prev,
      res["alphas"], res["ht"], d_ht_ext,
      enc_states.reshape(-1, enc_states.shape[-1]),
      w["wx0"], w["wx_rest"], w["wh"], w["wa"], w["ctx_w"])

    names = ["dz", "d_pre", "d_scores", "d_cv", "d_q", "d_emb",
             "dh0", "dc0"]
    return dict(zip(names, out))


# ---------------------------------------------------------------------------
# custom VJP
# ---------------------------------------------------------------------------

_W_NAMES = ["wx0", "wx_rest", "wh", "b", "wa", "wa_b", "ctx_w", "ctx_b",
            "out_w", "out_b", "embed"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20, 22))
def fused_decoder_apply(enc_states, dec_h0, dec_c0,
                        wx0, wx_rest, wh, b, wa, wa_b, ctx_w, ctx_b,
                        out_w, out_b, embed, y_oh, coins, seed,
                        drop_emb, drop_rnn, train, interpret,
                        row_offset=0, tokens_per_step=1):
    """Differentiable fused decoder: returns ht_seq (U, B, A) f32.

    ``row_offset``: global index of this call's first batch row — the
    dropout hashes use global row ids, so chunked/data-sharded calls are
    bit-identical to one full-batch kernel.  ``tokens_per_step``:
    decoder tokens advanced per Mosaic grid step (must divide U);
    bit-identical outputs at any value."""
    w = dict(zip(_W_NAMES, [wx0, wx_rest, wh, b, wa, wa_b, ctx_w, ctx_b,
                            out_w, out_b, embed]))
    ht, _ = decoder_forward(enc_states, dec_h0, dec_c0, w, y_oh, coins,
                            seed, drop_emb, drop_rnn, train, interpret,
                            row_offset, tokens_per_step)
    return ht


def _fd_fwd(enc_states, dec_h0, dec_c0, wx0, wx_rest, wh, b, wa, wa_b,
            ctx_w, ctx_b, out_w, out_b, embed, y_oh, coins, seed,
            drop_emb, drop_rnn, train, interpret, row_offset=0,
            tokens_per_step=1):
    w = dict(zip(_W_NAMES, [wx0, wx_rest, wh, b, wa, wa_b, ctx_w, ctx_b,
                            out_w, out_b, embed]))
    ht, res = decoder_forward(enc_states, dec_h0, dec_c0, w, y_oh, coins,
                              seed, drop_emb, drop_rnn, train, interpret,
                              row_offset, tokens_per_step)
    res["ht"] = ht
    keep = (enc_states, dec_h0, dec_c0, w, res, seed, row_offset)
    return ht, keep


def _regen_masks(U, shape, rate, seed, offset, stride, row_offset=0):
    """Per-step dropout keep-masks, identical to the in-kernel hashes."""
    return jnp.stack([
        _drop_mask(shape, rate, seed + t * stride + offset,
                   row_axis=0, row_offset=row_offset)
        for t in range(U)
    ])


def _fd_bwd(drop_emb, drop_rnn, train, interpret, tokens_per_step,
            keep, d_ht_ext):
    enc_states, dec_h0, dec_c0, w, res, seed, row_offset = keep
    U, B, A = d_ht_ext.shape
    L = res["acts"].shape[1]
    H = res["c_all"].shape[-1]
    E = res["emb"].shape[-1]

    g = decoder_backward(res, enc_states, dec_c0, w, d_ht_ext, seed,
                         drop_emb, drop_rnn, train, interpret,
                         row_offset, tokens_per_step)

    f32 = jnp.float32
    dz = g["dz"].astype(f32)                             # (U, L, B, 4H)
    d_pre = g["d_pre"].astype(f32)                       # (U, B, A)
    d_scores = g["d_scores"].astype(f32)                 # (U, B, T)
    d_cv = g["d_cv"].astype(f32)                         # (U, B, H)
    d_q = g["d_q"].astype(f32)                           # (U, B, H)
    d_emb = g["d_emb"].astype(f32)                       # (U, B, E)

    h_all = res["h_all"].astype(f32)                     # (U, L, B, H)
    alphas = res["alphas"].astype(f32)
    q = res["q"].astype(f32)
    cv = res["cv"].astype(f32)
    sel = res["sel"].astype(f32)
    emb = res["emb"].astype(f32)
    ht = res["ht"].astype(f32)

    # regenerate the post-dropout layer outputs used as matmul inputs
    if train and drop_rnn > 0:
        inv = 1.0 / (1.0 - drop_rnn)
        x_drop = []
        for l in range(L):
            masks = _regen_masks(U, (B, H), drop_rnn,
                                 jnp.asarray(seed, jnp.int32),
                                 2 * l + 1, 2 * L, row_offset)
            x_drop.append(jnp.where(masks, h_all[:, l] * inv, 0.0))
        x_drop = jnp.stack(x_drop, axis=1)               # (U, L, B, H)
    else:
        x_drop = h_all
    h_top = x_drop[:, L - 1]                             # (U, B, H)

    # encoder-state gradient: two batched einsums
    d_enc = (jnp.einsum("ubt,ubh->bth", alphas, d_cv,
                        preferred_element_type=f32)
             + jnp.einsum("ubt,ubh->bth", d_scores, q,
                          preferred_element_type=f32))

    # attention / context weights
    d_wa = jnp.einsum("ubh,ubk->hk", h_top, d_q, preferred_element_type=f32)
    d_wa_b = jnp.sum(d_q, axis=(0, 1))
    ctx_in = jnp.concatenate([cv, h_top], axis=-1)       # (U, B, 2H)
    d_ctx_w = jnp.einsum("ubc,uba->ca", ctx_in, d_pre,
                         preferred_element_type=f32)
    d_ctx_b = jnp.sum(d_pre, axis=(0, 1))

    # LSTM weights
    h_prev = jnp.concatenate(
        [dec_h0[None].astype(f32), h_all[:-1]], axis=0)  # (U, L, B, H)
    d_wh = jnp.einsum("ulbh,ulbk->lhk", h_prev, dz,
                      preferred_element_type=f32)
    d_b = jnp.sum(dz, axis=(0, 2))
    ht_prev = jnp.concatenate(
        [jnp.zeros_like(ht[:1]), ht[:-1]], axis=0)       # (U, B, A)
    x0 = jnp.concatenate([emb, ht_prev], axis=-1)        # (U, B, E+A)
    d_wx0 = jnp.einsum("ubi,ubk->ik", x0, dz[:, 0],
                       preferred_element_type=f32)
    if L > 1:
        d_wxr = jnp.einsum("ulbh,ulbk->lhk", x_drop[:, :-1], dz[:, 1:],
                           preferred_element_type=f32)
    else:
        d_wxr = jnp.zeros_like(w["wx_rest"], dtype=f32)

    d_embed = jnp.einsum("ubv,ube->ve", sel, d_emb,
                         preferred_element_type=f32)

    def cast(x, like):
        return x.astype(like.dtype)

    return (cast(d_enc, enc_states), g["dh0"], g["dc0"],
            cast(d_wx0, w["wx0"]), cast(d_wxr, w["wx_rest"]),
            cast(d_wh, w["wh"]), cast(d_b, w["b"]),
            cast(d_wa, w["wa"]), cast(d_wa_b, w["wa_b"]),
            cast(d_ctx_w, w["ctx_w"]), cast(d_ctx_b, w["ctx_b"]),
            jnp.zeros_like(w["out_w"]), jnp.zeros_like(w["out_b"]),
            cast(d_embed, w["embed"]),
            None, None, None, None)


fused_decoder_apply.defvjp(_fd_fwd, _fd_bwd)
