"""Pallas TPU kernel: fused stacked-(bi)directional LSTM encoder.

Replaces the XLA ``lax.scan`` encoder recurrence with ONE Mosaic kernel
that advances all layers and both directions per grid step, with weights
and the (h, c) state resident in VMEM for the whole sequence.  The XLA
scan spends most of each iteration on loop control and carry DMA (the
per-step matmuls are only ~16 MXU tiles each); keeping the recurrence
inside a single kernel removes that overhead — the cost structure that
made the reference's per-timestep Chainer loop dominant
(reference: seq2seq.py:205-242).

Layout (D2 = number of directions, H = per-direction hidden):
  x0_proj: (T, D2, B, 4H)   layer-0 input projections (hoisted matmul)
  wx:      (L-1, D2, H, 4H) input weights for layers 1..L-1
  wh:      (L, D2, H, 4H)   recurrent weights
  b:       (L, D2, 4H)      biases
Outputs:
  outs:  (T, D2, B, H) top-layer post-dropout outputs (encoder states)
  h_fin / c_fin: (L, D2, B, H) final states (decoder init)
Training residuals (for the custom VJP):
  acts:  (T, L, D2, B, 4H) gate activations [i|f|g|o]
  c_all: (T, L, D2, B, H)  cell states
  h_pre: (T, L, D2, B, H)  pre-dropout outputs (for dWh)
  x_drop:(T, L, D2, B, H)  post-dropout outputs (for dWx)

The backward pass is a mirrored kernel walking t in reverse producing
``dz`` for every (t, l, d); weight gradients are then large time-batched
einsums OUTSIDE the kernel — (T*B, H)^T @ (T*B, 4H) shapes that map
perfectly onto the MXU.  Layer-0 input-weight gradients flow through the
hoisted x0_proj einsum's own autodiff via the returned dx0.

Dropout masks are regenerated deterministically in-kernel from
(seed, t, l) with a counter-based integer hash (pure jnp — works both
compiled and in CPU interpret mode), so forward and backward agree
without storing masks.  Gate order matches ast_tpu.ops.lstm:
[i, f, g, o].
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_gates(z, c_prev, H):
    i = jax.nn.sigmoid(z[..., :H])
    f = jax.nn.sigmoid(z[..., H:2 * H])
    g = jnp.tanh(z[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(z[..., 3 * H:])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    return i, f, g, o, c_new, h_new


def _drop_mask(shape, rate, seed_val, row_axis=None, row_offset=0,
               global_rows=None):
    """Deterministic keep-mask from a counter-based integer hash.

    Pure jnp (no TPU-only PRNG primitives) so the identical mask is
    regenerated in the backward kernel and in CPU interpret mode.  A
    murmur-style avalanche over (element index, seed) is plenty for
    dropout; it is not a cryptographic stream.

    ``row_axis``/``row_offset``/``global_rows``: hash GLOBAL batch-row
    indices — the local block covers rows [row_offset, row_offset +
    shape[row_axis]) of a logical batch of ``global_rows`` rows.  Masks
    are then invariant to how the batch is split across kernel chunks or
    data-parallel shards (fused-mesh == fused-single-device bit-exact).
    With the defaults the hash reduces to the local flat index."""
    flat = jnp.uint32(0)
    stride = 1
    for axis in reversed(range(len(shape))):
        ids = jax.lax.broadcasted_iota(jnp.uint32, shape, axis)
        if row_axis is not None and axis == row_axis:
            ids = ids + jnp.uint32(row_offset)
            dim = global_rows if global_rows is not None else shape[axis]
        else:
            dim = shape[axis]
        flat = flat + ids * jnp.uint32(stride)
        stride *= dim
    x = flat + jnp.uint32(seed_val).astype(jnp.uint32) * jnp.uint32(2654435761)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(int(rate * (2**32)))
    return x >= threshold


def _fwd_kernel(L, D2, B, H, Bg, train, drop_rate, *refs):
    if train:
        (seed_ref, off_ref, x0_ref, wx_ref, wh_ref, b_ref,
         outs_ref, hfin_ref, cfin_ref,
         acts_ref, call_ref, hpre_ref, xdrop_ref,
         h_s, c_s) = refs
    else:
        (seed_ref, off_ref, x0_ref, wx_ref, wh_ref, b_ref,
         outs_ref, hfin_ref, cfin_ref,
         h_s, c_s) = refs

    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        h_s[...] = jnp.zeros_like(h_s)
        c_s[...] = jnp.zeros_like(c_s)

    inv_keep = 1.0 / (1.0 - drop_rate) if drop_rate > 0 else 1.0

    x = None
    for l in range(L):
        z_dirs = []
        for d in range(D2):
            if l == 0:
                z = x0_ref[0, d]                        # (B, 4H)
            else:
                z = jax.lax.dot_general(
                    x[d].astype(wx_ref.dtype), wx_ref[l - 1, d],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            z = z + jax.lax.dot_general(
                h_s[l, d].astype(wh_ref.dtype), wh_ref[l, d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z = z + b_ref[l, d]
            z_dirs.append(z)
        z = jnp.stack(z_dirs)                           # (D2, B, 4H)

        i, f, g, o, c_new, h_new = _apply_gates(z, c_s[l], H)

        if train:
            acts_ref[0, l] = jnp.concatenate(
                [i, f, g, o], axis=-1).astype(acts_ref.dtype)
            call_ref[0, l] = c_new.astype(call_ref.dtype)
            hpre_ref[0, l] = h_new.astype(hpre_ref.dtype)

        if train and drop_rate > 0:
            keep = _drop_mask((D2, B, H), drop_rate,
                              seed_ref[0] + t * L + l,
                              row_axis=1, row_offset=off_ref[0],
                              global_rows=Bg)
            x_out = jnp.where(keep, h_new * inv_keep, 0.0)
        else:
            x_out = h_new

        if train:
            xdrop_ref[0, l] = x_out.astype(xdrop_ref.dtype)

        h_s[l] = h_new
        c_s[l] = c_new
        x = x_out

    outs_ref[0] = x

    @pl.when(t == T - 1)
    def _():
        hfin_ref[...] = h_s[...]
        cfin_ref[...] = c_s[...]


def _bwd_kernel(L, D2, B, H, Bg, drop_rate,
                seed_ref, off_ref, acts_ref, call_ref, cprev_ref,
                wx_ref, wh_ref, douts_ref, dhfin_ref, dcfin_ref,
                dz_ref, dh_s, dc_s):
    """Reverse-time pass producing dz for every (t, l, d).  Grid step k
    processes t = T-1-k (index maps feed reversed blocks)."""
    k = pl.program_id(0)
    T = pl.num_programs(0)
    t = T - 1 - k

    @pl.when(k == 0)
    def _():
        dh_s[...] = dhfin_ref[...]
        dc_s[...] = dcfin_ref[...]

    inv_keep = 1.0 / (1.0 - drop_rate) if drop_rate > 0 else 1.0

    dx_above = None
    for l in reversed(range(L)):
        cons = douts_ref[0] if l == L - 1 else dx_above

        if drop_rate > 0:
            keep = _drop_mask((D2, B, H), drop_rate,
                              seed_ref[0] + t * L + l,
                              row_axis=1, row_offset=off_ref[0],
                              global_rows=Bg)
            cons = jnp.where(keep, cons * inv_keep, 0.0)

        dh = dh_s[l] + cons                              # (D2, B, H)

        acts = acts_ref[0, l].astype(jnp.float32)        # (D2, B, 4H)
        i = acts[..., :H]
        f = acts[..., H:2 * H]
        g = acts[..., 2 * H:3 * H]
        o = acts[..., 3 * H:]
        c_new = call_ref[0, l].astype(jnp.float32)
        c_prev = cprev_ref[0, l].astype(jnp.float32)

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
        ], axis=-1)                                      # (D2, B, 4H)
        dz_ref[0, l] = dz.astype(dz_ref.dtype)

        dh_prev_dirs = []
        dx_dirs = []
        for d in range(D2):
            dh_prev_dirs.append(jax.lax.dot_general(
                dz[d].astype(wh_ref.dtype), wh_ref[l, d],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            if l > 0:
                dx_dirs.append(jax.lax.dot_general(
                    dz[d].astype(wx_ref.dtype), wx_ref[l - 1, d],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
        dh_s[l] = jnp.stack(dh_prev_dirs)
        if l > 0:
            dx_above = jnp.stack(dx_dirs)


def _forward(x0_proj, wx, wh, b, seed, train, drop_rate, interpret,
             row_offset=0, global_rows=None):
    T, D2, B, H4 = x0_proj.shape
    H = H4 // 4
    L = wh.shape[0]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    off_arr = jnp.asarray(row_offset, jnp.int32).reshape(1)
    Bg = int(global_rows) if global_rows is not None else B
    # residual streams inherit the weight dtype: bf16 weights => bf16
    # activations in HBM, halving backward-pass memory traffic
    res_dtype = wh.dtype

    kern = functools.partial(_fwd_kernel, L, D2, B, H, Bg, train,
                             drop_rate)

    def t_block(*dims):
        return pl.BlockSpec((1,) + dims,
                            lambda t: (t,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((T, D2, B, H), jnp.float32),       # outs
        jax.ShapeDtypeStruct((L, D2, B, H), jnp.float32),       # h_fin
        jax.ShapeDtypeStruct((L, D2, B, H), jnp.float32),       # c_fin
    ]
    out_specs = [t_block(D2, B, H), full(), full()]
    if train:
        out_shapes += [
            jax.ShapeDtypeStruct((T, L, D2, B, 4 * H), res_dtype),
            jax.ShapeDtypeStruct((T, L, D2, B, H), res_dtype),
            jax.ShapeDtypeStruct((T, L, D2, B, H), res_dtype),
            jax.ShapeDtypeStruct((T, L, D2, B, H), res_dtype),
        ]
        out_specs += [t_block(L, D2, B, 4 * H), t_block(L, D2, B, H),
                      t_block(L, D2, B, H), t_block(L, D2, B, H)]

    out = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),     # row offset
            t_block(D2, B, 4 * H),                     # x0_proj
            full(), full(), full(),                    # wx, wh, b
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, D2, B, H), jnp.float32),
            pltpu.VMEM((L, D2, B, H), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(seed_arr, off_arr, x0_proj, wx, wh, b)
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 9))
def fused_stacked_lstm(x0_proj, wx, wh, b, seed, train, drop_rate,
                       interpret=False, row_offset=0, global_rows=None):
    """Fused encoder recurrence.  Returns (outs, h_fin, c_fin).

    ``row_offset``/``global_rows``: this call covers batch rows
    [row_offset, row_offset+B) of a logical batch of ``global_rows``
    rows — dropout masks hash global row ids, so chunked and
    data-sharded runs are bit-identical to one full-batch kernel."""
    out = _forward(x0_proj, wx, wh, b, seed, train, drop_rate, interpret,
                   row_offset, global_rows)
    return out[0], out[1], out[2]


def _fwd_rule(x0_proj, wx, wh, b, seed, train, drop_rate, interpret,
              row_offset=0, global_rows=None):
    if not train:
        # still need residuals to differentiate; run the storing variant
        out = _forward(x0_proj, wx, wh, b, seed, True, 0.0, interpret,
                       row_offset, global_rows)
    else:
        out = _forward(x0_proj, wx, wh, b, seed, train, drop_rate,
                       interpret, row_offset, global_rows)
    outs, h_fin, c_fin, acts, c_all, h_pre, x_drop = out
    residuals = (wx, wh, acts, c_all, h_pre, x_drop, seed, row_offset)
    return (outs, h_fin, c_fin), residuals


def _bwd_rule(train, drop_rate, interpret, global_rows, residuals,
              cotangents):
    wx, wh, acts, c_all, h_pre, x_drop, seed, row_offset = residuals
    douts, dh_fin, dc_fin = cotangents
    T, L, D2, B, H4 = acts.shape
    H = H4 // 4
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    off_arr = jnp.asarray(row_offset, jnp.int32).reshape(1)
    Bg = int(global_rows) if global_rows is not None else B

    c_prev = jnp.concatenate(
        [jnp.zeros_like(c_all[:1]), c_all[:-1]], axis=0)

    rate = drop_rate if train else 0.0
    kern = functools.partial(_bwd_kernel, L, D2, B, H, Bg, rate)

    def rev_t(*dims):
        return pl.BlockSpec((1,) + dims,
                            lambda k: (T - 1 - k,) + (0,) * len(dims),
                            memory_space=pltpu.VMEM)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    dz = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),    # row offset
            rev_t(L, D2, B, 4 * H),                   # acts
            rev_t(L, D2, B, H),                       # c_all
            rev_t(L, D2, B, H),                       # c_prev
            full(), full(),                           # wx, wh
            rev_t(D2, B, H),                          # douts
            full(), full(),                           # dh_fin, dc_fin
        ],
        out_specs=[rev_t(L, D2, B, 4 * H)],
        out_shape=[jax.ShapeDtypeStruct((T, L, D2, B, 4 * H),
                                        acts.dtype)],
        scratch_shapes=[
            pltpu.VMEM((L, D2, B, H), jnp.float32),
            pltpu.VMEM((L, D2, B, H), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(seed_arr, off_arr, acts, c_all, c_prev, wx, wh, douts, dh_fin,
      dc_fin)[0]

    # weight gradients as large time-batched einsums (MXU-friendly)
    h_prev = jnp.concatenate(
        [jnp.zeros_like(h_pre[:1]), h_pre[:-1]], axis=0)
    dwh = jnp.einsum("tldbh,tldbk->ldhk", h_prev, dz,
                     preferred_element_type=jnp.float32)
    dwx = jnp.einsum("tldbh,tldbk->ldhk", x_drop[:, :-1], dz[:, 1:],
                     preferred_element_type=jnp.float32)
    db = jnp.sum(dz.astype(jnp.float32), axis=(0, 3))
    dx0 = dz[:, 0].astype(jnp.float32)                 # (T, D2, B, 4H)
    return dx0, dwx, dwh, db, None, None


fused_stacked_lstm.defvjp(_fwd_rule, _bwd_rule)


# Raised with the scoped-vmem cap below (same calibration story as
# fused_decoder): flagship B=128 runs as ONE kernel (naive est ~20 MB),
# measured fastest of the chunkings (7,805 vs 7,683 at chunk 64,
# same-window B=128 full-step A/B).
VMEM_BUDGET = 24 * 1024 * 1024

# Mosaic's default 16 MB scoped-vmem ceiling is below what the chip
# schedules fine; raise it so the budget above is the real gate.
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)


def fused_fits(L, D2, B, H, weight_bytes=4):
    """Conservative VMEM feasibility check for the fwd+bwd kernels.

    The backward pass is the peak: weights + double-buffered act/dz
    blocks + state scratch.  Past the budget the caller falls back to
    the lax.scan path."""
    # Mosaic wants MXU/VPU-aligned operands: last dim (lanes) a multiple
    # of 128 and batch (sublanes) a multiple of 8 — small test models
    # fall back to the scan path
    if H % 128 != 0 or B % 8 != 0:
        return False
    weights = (2 * L - 1) * D2 * H * 4 * H * weight_bytes
    # backward-pass VMEM: double-buffered input streams (acts 4H +
    # c_all/c_prev H each, in the weight dtype; douts H in f32), the dz
    # output block, dh/dc scratch and the dh_fin/dc_fin inputs.
    # Calibrated against observed Mosaic behavior: f32 B=32 and bf16
    # B<=64 compile on v5e, bf16 B=128 exceeds scoped VMEM.
    in_stream = (L * D2 * B * H * 6 * weight_bytes + D2 * B * H * 4)
    out_stream = L * D2 * B * 4 * H * weight_bytes
    state = 4 * L * D2 * B * H * 4              # dh/dc scratch + fins
    est = (weights + 2 * in_stream + out_stream + state
           + 2 * L * D2 * B * H * 4 * 3)
    return est < VMEM_BUDGET


def aligned_divisors(B):
    """All divisors of ``B`` that are multiples of 8, descending.

    The chunk searches below must consider every such divisor, not just
    the halving chain B, B/2, B/4, ... — e.g. the dataloader's
    tail-shrink batches can be 24 rows, whose only fitting chunk under a
    tight VMEM budget is 8 (24 -> 12 -> 6 skips it)."""
    return [c for c in range(B - B % 8, 7, -8) if B % c == 0]


def fused_chunk_size(L, D2, B, H, weight_bytes=4):
    """Largest batch chunk (a divisor of B, multiple of 8) whose kernel
    fits in VMEM; 0 when none does.  Large batches (B=128) run the fused
    recurrence as a few independent chunk calls — batch rows don't
    interact inside the LSTM stack, so chunking is semantics-preserving
    (BatchNorm runs outside, in the conv front-end)."""
    for c in aligned_divisors(B):
        if fused_fits(L, D2, c, H, weight_bytes):
            return c
    return 0


def pack_encoder_weights(enc_layers):
    """Direction-stacked per-layer dicts -> stacked kernel arrays.

    ``enc_layers``: list of {wx (D2,in,4H), wh (D2,H,4H), b (D2,4H)}.
    Returns (wx_rest (L-1,D2,H,4H), wh (L,D2,H,4H), b (L,D2,4H)).
    The stacking is ordinary XLA, so parameter gradients flow back to
    the dict leaves through its autodiff.
    """
    wh = jnp.stack([l["wh"] for l in enc_layers])
    b = jnp.stack([l["b"] for l in enc_layers])
    if len(enc_layers) > 1:
        wx_rest = jnp.stack([l["wx"] for l in enc_layers[1:]])
    else:
        wx_rest = jnp.zeros((0,) + wh.shape[1:], wh.dtype)
    return wx_rest, wh, b
