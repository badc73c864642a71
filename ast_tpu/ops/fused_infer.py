"""Pallas TPU kernels: fused inference decoding (greedy + beam).

The training-side fused decoder (ops/fused_decoder.py) keeps the whole
decoder — embedding, LSTM stack, Luong attention, attentional hidden
state — resident in VMEM across all target steps.  Inference decode
previously stepped ``seq2seq.decode_step`` one token at a time inside a
``lax.while_loop`` (ops/beam.py, seq2seq.predict_greedy): every step
re-reads ~all decoder weights from HBM, which bounds offline decoding
~9x below training throughput per utterance (BASELINE.md round 2).

These kernels are the forward-only variant: no residual streams, no
scheduled sampling — the previous step's argmax (greedy) or the pruned
beam frontier (beam) feeds the next step, entirely in VMEM.

Greedy (reference: seq2seq.py:475-527): one grid step per output token;
a finished-mask scratch lets the kernel skip the matmuls once every row
has produced EOS (the in-kernel analogue of the XLA loop's early exit),
writing PAD rows exactly like the loop's unvisited steps.

Beam (reference: nn.py:235-322 semantics, re-architected): the WHOLE
frontier loop runs in-kernel — top-K per live hypothesis via iterative
masked argmax, frozen-EOS hypotheses carried with unchanged score,
N-of-N*K selection per utterance, and parent-state gather as a
block-diagonal one-hot matmul.  The kernel streams out per-step chosen
tokens + parent indices + scores; hypothesis sequences are reconstructed
by a cheap backtracking scan outside (XLA), exactly like the while-loop
decoder's bookkeeping but without per-step HBM weight traffic.

Eligibility mirrors fused_decoder: aligned H/A/E/Vp, batch chunked to
the VMEM budget; callers fall back to the lax.while_loop path otherwise.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ast_tpu.ops.fused_decoder import (
    _COMPILER_PARAMS, _diag_expand, _diag_rows, _dot, _dot_c0, _dot_t,
    round_up,
)
from ast_tpu.ops.fused_lstm import _apply_gates, aligned_divisors
from ast_tpu.symbols import SYMBOLS

VMEM_BUDGET = 40 * 1024 * 1024


def _dot_x(a, w):
    """VALUE-EXACT f32 contraction (dim 1 of a with dim 0 of w).

    The beam kernel routes exact integers (token ids up to Vp) and
    scores through matmuls (iota-mask gathers/scatters).  A plain f32
    Mosaic dot may be demoted to a single bf16 pass on TPU
    (xla_allow_excess_precision), which quantizes token ids >= 256 and
    puts scores on a 2^-8 grid — Precision.HIGHEST forces the full
    multi-pass f32 product."""
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _dot_c0_x(a, b):
    """Value-exact contraction over dim 0 of both: (N,M)x(N,K)->(M,K)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _gather_1hot(G, X):
    """Value-exact one-hot gather ``G @ X`` for f32 X in 3 MXU passes.

    G rows are exact 0/1 one-hots and X splits as p0+p1+p2 with every
    part bf16-representable, so each demoted-to-bf16 dot is exact
    (0/1 x bf16 part, f32 accumulation over a single nonzero) and the
    sum reconstructs the gathered f32 rows — same result as
    Precision.HIGHEST at half its 6-pass cost.  Used for the (R, R)
    parent-state gathers, the kernel's largest exact contractions.

    Exactness limit: residual parts falling into bf16's SUBNORMAL
    range (|X| below ~1e-33) round in their last bits — an absolute
    error bounded by bf16's smallest subnormal step (~1e-40), not
    reachable by LSTM states or log-probs
    (tests/test_fused_infer.py::test_gather_1hot_split...)."""
    p0 = X.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = X - p0
    p1 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    p2 = r1 - p1
    return (_dot(G, p0) + _dot(G, p1)) + _dot(G, p2)


def fused_infer_fits(L, B, H, E, A, T, Vp, weight_bytes=2):
    """VMEM feasibility for the inference kernels (weights + encoder
    states + small per-step streams; no residuals)."""
    if H % 128 or A % 128 or E % 128 or B % 8 or Vp % 128:
        return False
    wb = weight_bytes
    lstm_w = ((E + A) * 4 * H + (L - 1) * H * 4 * H + L * H * 4 * H) * wb
    attn_w = (H * H + (2 * H) * A) * wb
    vocab_w = (A * Vp + Vp * E) * wb
    enc = B * T * H * wb
    scratch = (2 * L * B * H + B * A + B * Vp + 4 * B) * 4
    streams = 4 * B * 4 * 2  # double-buffered int/f32 step rows
    est = lstm_w + attn_w + vocab_w + enc + scratch + streams
    return est < VMEM_BUDGET


def infer_variant_ok(mcfg, enc_mask=None):
    """Variant gates shared by the greedy and beam fused-inference
    dispatchers (seq2seq._fused_infer_chunk, beam.make_beam_decoder).

    One predicate, one place: a model flag these kernels can't express
    (extra attention heads, no input feeding, LayerNorm, blockwise or
    masked attention) must push BOTH decode paths to the XLA loop —
    gating them separately risks one path silently running the kernel
    with wrong semantics while the other correctly falls back."""
    rnn = mcfg["rnn_config"]
    if not rnn.get("fused_decoder", False) or enc_mask is not None:
        return False
    if not rnn.get("fused_infer", True):
        return False  # explicit off-switch for the inference kernels
    if (rnn.get("n_attn", 1) != 1 or not rnn.get("feed_attn", True)
            or rnn.get("ln", False) or rnn.get("rnn_relu", False)
            or rnn.get("attn_block_size", 0)):
        return False
    return True


def fused_infer_chunk(L, B, H, E, A, T, Vp, weight_bytes=2):
    """Largest batch chunk (divisor of B, multiple of 8) that fits."""
    for c in aligned_divisors(B):
        if fused_infer_fits(L, c, H, E, A, T, Vp, weight_bytes):
            return c
    return 0


def _lstm_stack(L, H, wx0_ref, wxr_ref, wh_ref, b_ref, embed_ref,
                oh, ht_prev, h_s, c_s):
    """Embedding + input feeding + the L-layer decoder LSTM stack,
    shared verbatim by the greedy and beam kernels (only the attention
    section differs between them).  Mutates h_s/c_s in place; returns
    the top layer's hidden output (rows, H)."""
    emb = _dot(oh, embed_ref[...])                       # (rows, E)
    x = jnp.concatenate([emb, ht_prev], axis=-1)         # (rows, E+A)
    for l in range(L):
        z = _dot(x, wx0_ref[...]) if l == 0 else _dot(x, wxr_ref[l - 1])
        z = z + _dot(h_s[l], wh_ref[l]) + b_ref[l]
        # the one copy of the gate math (unused gate outputs are dead
        # values the compiler drops)
        *_, c_new, h_new = _apply_gates(z, c_s[l], H)
        h_s[l] = h_new
        c_s[l] = c_new
        x = h_new
    return x


def _context_out(x, cv, ctxw_ref, ctxb_ref, outw_ref, outb_ref):
    """Attentional hidden state + output projection, shared by the
    greedy and beam kernels: ht = tanh(ctx([cv; x])), logits = out(ht)."""
    ctx_in = jnp.concatenate([cv, x], axis=-1)
    ht = jnp.tanh(_dot(ctx_in, ctxw_ref[...]) + ctxb_ref[...])
    logits = _dot(ht, outw_ref[...]) + outb_ref[...]     # (rows, Vp) f32
    return logits, ht


def _step_core(L, B, H, E, A, T, Vp, refs, oh, ht_prev, h_s, c_s):
    """Shared per-step decoder math: one-hot input -> (logits, ht).

    Mutates h_s/c_s in place; returns (logits (B, Vp) f32, ht (B, A))."""
    (enc_ref, wx0_ref, wxr_ref, wh_ref, b_ref, wa_ref, wab_ref,
     ctxw_ref, ctxb_ref, outw_ref, outb_ref, embed_ref) = refs

    x = _lstm_stack(L, H, wx0_ref, wxr_ref, wh_ref, b_ref, embed_ref,
                    oh, ht_prev, h_s, c_s)

    q = _dot(x, wa_ref[...]) + wab_ref[...]              # (B, H)
    enc2 = enc_ref[...]                                  # (B*T, H)
    scores = _diag_rows(_dot_t(enc2, q), B, T)           # (B, T)
    alphas = jax.nn.softmax(scores, axis=-1)
    cv = _dot_c0(_diag_expand(alphas, B, T), enc2)       # (B, H)
    return _context_out(x, cv, ctxw_ref, ctxb_ref, outw_ref, outb_ref)


# ---------------------------------------------------------------------------
# greedy
# ---------------------------------------------------------------------------

def _greedy_kernel(L, B, H, E, A, T, Vp,
                   enc_ref, wx0_ref, wxr_ref, wh_ref, b_ref,
                   wa_ref, wab_ref, ctxw_ref, ctxb_ref,
                   outw_ref, outb_ref, embed_ref, h0_ref, c0_ref,
                   tok_ref,
                   h_s, c_s, ht_s, oh_s, fin_s):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[...] = h0_ref[...]
        c_s[...] = c0_ref[...]
        ht_s[...] = jnp.zeros_like(ht_s)
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
        oh_s[...] = (lane == SYMBOLS.GO_ID).astype(jnp.float32)
        fin_s[...] = jnp.zeros_like(fin_s)

    all_done = jnp.sum(fin_s[...]) >= B

    @pl.when(jnp.logical_not(all_done))
    def _():
        refs = (enc_ref, wx0_ref, wxr_ref, wh_ref, b_ref, wa_ref,
                wab_ref, ctxw_ref, ctxb_ref, outw_ref, outb_ref,
                embed_ref)
        logits, ht = _step_core(L, B, H, E, A, T, Vp, refs,
                                oh_s[...], ht_s[...], h_s, c_s)
        idx = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,)
        tok_ref[0] = idx[:, None]
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
        oh_s[...] = (lane == idx[:, None]).astype(jnp.float32)
        ht_s[...] = ht
        fin_s[...] = jnp.maximum(
            fin_s[...], (idx == SYMBOLS.EOS_ID)[:, None].astype(
                jnp.float32))

    @pl.when(all_done)
    def _():
        # steps after global EOS stay PAD, like the while_loop's
        # unvisited iterations (seq2seq.predict_greedy)
        tok_ref[0] = jnp.full((B, 1), SYMBOLS.PAD_ID, jnp.int32)


def greedy_decode_fused(enc_states, dec_h0, dec_c0, w, stop_limit,
                        interpret=False):
    """Fused greedy decode.  enc_states (B, T, H) [weight dtype],
    dec_h0/c0 (L, B, H) f32, ``w`` the fused-decoder weight dict
    (out_b padding rows at -1e9 keep argmax in-vocab).
    Returns preds (B, stop_limit) int32 — identical contract to
    ``seq2seq.predict_greedy``."""
    B, T, H = enc_states.shape
    L = dec_h0.shape[0]
    A = w["ctx_w"].shape[1]
    E = w["embed"].shape[1]
    Vp = w["out_w"].shape[1]

    kern = functools.partial(_greedy_kernel, L, B, H, E, A, T, Vp)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    tok = pl.pallas_call(
        kern,
        grid=(stop_limit,),
        in_specs=[full()] * 14,
        out_specs=pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((stop_limit, B, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((L, B, H), jnp.float32),          # h
            pltpu.VMEM((L, B, H), jnp.float32),          # c
            pltpu.VMEM((B, A), jnp.float32),             # ht
            pltpu.VMEM((B, Vp), jnp.float32),            # input one-hot
            pltpu.VMEM((B, 1), jnp.float32),             # finished
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(enc_states.reshape(-1, H), w["wx0"], w["wx_rest"], w["wh"], w["b"],
      w["wa"], w["wa_b"], w["ctx_w"], w["ctx_b"], w["out_w"], w["out_b"],
      w["embed"], dec_h0, dec_c0)
    return tok[..., 0].T  # (B, stop_limit)


# ---------------------------------------------------------------------------
# beam
# ---------------------------------------------------------------------------

NEG_INF = -1e30


def fused_beam_fits(L, Bc, N, H, E, A, T, Vp, weight_bytes=2):
    """VMEM feasibility for the beam kernel at utterance-chunk Bc:
    R = Bc*N state rows + the UNTILED (Bc*T, H) encoder block + the
    (R, R) gather matmul temporaries."""
    R = Bc * N
    if H % 128 or A % 128 or E % 128 or Bc % 8 or Vp % 128:
        return False
    wb = weight_bytes
    lstm_w = ((E + A) * 4 * H + (L - 1) * H * 4 * H + L * H * 4 * H) * wb
    attn_w = (H * H + (2 * H) * A) * wb
    vocab_w = (A * Vp + Vp * E) * wb
    enc = Bc * T * H * wb
    scratch = (2 * L * R * H + R * A + R * Vp + 2 * R) * 4
    work = (R * R + R * Vp + 2 * Bc * R) * 4   # GG, logp mask, cand maps
    est = lstm_w + attn_w + vocab_w + enc + scratch + work
    return est < VMEM_BUDGET


def fused_beam_chunk(L, B, N, H, E, A, T, Vp, weight_bytes=2):
    """Largest utterance chunk (divisor of B, multiple of 8) whose beam
    kernel fits; 0 if none."""
    for c in aligned_divisors(B):
        if fused_beam_fits(L, c, N, H, E, A, T, Vp, weight_bytes):
            return c
    return 0


def _beam_kernel(L, Bc, N, K, H, E, A, T, Vp,
                 lanevf_ref, lanenkf_ref, lanenf_ref, slotf_ref,
                 enc_ref, wx0_ref, wxr_ref, wh_ref, b_ref,
                 wa_ref, wab_ref, ctxw_ref, ctxb_ref,
                 outw_ref, outb_ref, embed_ref, h0_ref, c0_ref,
                 tok_ref, par_ref, val_ref, sc_ref,
                 h_s, c_s, ht_s, oh_s, score_s, fin_s):
    """One grid step = one frontier advance for Bc utterances x N beam
    slots (R = Bc*N rows, utt-major).

    Selection/pruning runs entirely in-kernel.  All cross-layout moves
    are expressed as iota-mask matmuls on the MXU (no sublane<->lane
    reshapes): candidate space is (Bc, N*K); flat per-row vectors are
    (R, 1) columns; the parent gather is one (R, R) block-diagonal
    one-hot matmul against each state tensor.

    Index arithmetic runs in f32 (exact at these magnitudes): Mosaic
    legalizes neither int->float converts (arith.sitofp) nor float
    tpu.iota, so the float lane iotas arrive as INPUTS
    (lanevf/lanenkf/lanenf/slotf) and argmax indices are recovered as
    min-over-tied-lanes of those iotas.
    """
    R = Bc * N
    NK = N * K
    t = pl.program_id(0)
    f32 = jnp.float32

    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)        # r
    lane_vf = lanevf_ref[...]                                   # (R, Vp)

    @pl.when(t == 0)
    def _():
        h_s[...] = h0_ref[...]
        c_s[...] = c0_ref[...]
        ht_s[...] = jnp.zeros_like(ht_s)
        oh_s[...] = (lane_vf == float(SYMBOLS.GO_ID)).astype(f32)
        # reference init: a single live hypothesis per utterance
        # (nn.py:235-243); slots 1..N-1 start at -inf
        score_s[...] = jnp.where(row % N == 0, 0.0, NEG_INF)
        fin_s[...] = jnp.zeros_like(fin_s)

    all_done = jnp.sum(fin_s[...]) >= R

    @pl.when(jnp.logical_not(all_done))
    def _():
        # ---- decode step for all R rows (shared LSTM stack; only the
        # attention below is beam-specific) ----
        x = _lstm_stack(L, H, wx0_ref, wxr_ref, wh_ref, b_ref,
                        embed_ref, oh_s[...], ht_s[...], h_s, c_s)

        # attention: all N slots of an utt share its encoder rows, so
        # the enc block is UNTILED (Bc*T, H) and each slot index runs
        # the standard block-diagonal trick on its (Bc, H) query slice
        q = _dot(x, wa_ref[...]) + wab_ref[...]           # (R, H)
        enc2 = enc_ref[...]                               # (Bc*T, H)
        q_by_slot = q.reshape(Bc, N, H)
        cvs = []
        for n in range(N):
            q_n = q_by_slot[:, n, :]                      # (Bc, H)
            scores_n = _diag_rows(_dot_t(enc2, q_n), Bc, T)
            alphas_n = jax.nn.softmax(scores_n, axis=-1)
            cvs.append(_dot_c0(_diag_expand(alphas_n, Bc, T), enc2))
        cv = jnp.stack(cvs, axis=1).reshape(R, H)         # (R, H)
        logits, ht = _context_out(x, cv, ctxw_ref, ctxb_ref,
                                  outw_ref, outb_ref)     # (R, Vp)
        logp = jax.nn.log_softmax(logits, axis=-1)

        # ---- top-K continuations per row: iterative masked argmax
        # (ties -> lowest index, same as lax.top_k); the index comes
        # back as a float min-over-tied-lanes, no int->float convert ----
        masked = logp
        tl_cols, tt_cols = [], []
        for _ in range(K):
            m = jnp.max(masked, axis=-1, keepdims=True)   # (R, 1)
            amf = jnp.min(jnp.where(masked == m, lane_vf, float(Vp)),
                          axis=-1, keepdims=True)         # (R, 1) f32
            tl_cols.append(m)
            tt_cols.append(amf)
            masked = jnp.where(lane_vf == amf, NEG_INF, masked)

        # ---- candidate space (Bc, NK), m = n*K + k ----
        b_rows = jax.lax.broadcasted_iota(jnp.int32, (Bc, R), 0)
        r_cols = jax.lax.broadcasted_iota(jnp.int32, (Bc, R), 1)
        mask_b = ((r_cols // N) == b_rows).astype(f32)    # (Bc, R)
        rr = jax.lax.broadcasted_iota(jnp.int32, (R, NK), 0)
        mm = jax.lax.broadcasted_iota(jnp.int32, (R, NK), 1)
        E_n = ((rr % N) == (mm // K)).astype(f32)         # (R, NK)

        def to_cand(col, E):
            # (R,1) flat column -> (Bc, NK): C[b, m] = col[b*N + m//K]
            # (value-exact: carries scores and raw token ids)
            return _dot_x(mask_b, col * E)

        S_C = to_cand(score_s[...], E_n)
        F_C = to_cand(fin_s[...], E_n)
        TL_C = jnp.zeros((Bc, NK), f32)
        TT_C = jnp.zeros((Bc, NK), f32)
        for k in range(K):
            E_k = (((rr % N) == (mm // K)) & ((mm % K) == k)).astype(f32)
            TL_C = TL_C + to_cand(tl_cols[k], E_k)
            TT_C = TT_C + to_cand(tt_cols[k], E_k)

        # frozen hyps contribute themselves once, score unchanged
        # (reference: nn.py:307-318; ops/beam.py body)
        k0 = (jax.lax.broadcasted_iota(jnp.int32, (Bc, NK), 1) % K) == 0
        C = S_C + jnp.where(F_C > 0,
                            jnp.where(k0, 0.0, NEG_INF), TL_C)
        T_C = jnp.where(F_C > 0, float(SYMBOLS.EOS_ID), TT_C)

        # ---- select N best of NK per utt (descending, lowest-index
        # ties), scattering every result back to flat (R, 1) columns ----
        mlane_f = lanenkf_ref[...]                    # (Bc, NK) f32
        n_lane_f = lanenf_ref[...]                    # (Bc, N) f32
        Epn = ((jax.lax.broadcasted_iota(jnp.int32, (NK, N), 0) // K)
               == jax.lax.broadcasted_iota(jnp.int32, (NK, N), 1)
               ).astype(f32)                              # (NK, N)
        En_flat = ((jax.lax.broadcasted_iota(jnp.int32, (N, R), 1) % N)
                   == jax.lax.broadcasted_iota(jnp.int32, (N, R), 0)
                   ).astype(f32)                          # (N, R)

        selC = C
        taken = jnp.zeros((Bc, NK), f32)
        score_new = jnp.zeros((R, 1), f32)
        tok_new = jnp.zeros((R, 1), f32)
        par_new = jnp.zeros((R, 1), f32)
        valid_new = jnp.zeros((R, 1), f32)
        fin_new = jnp.zeros((R, 1), f32)
        GG = jnp.zeros((R, R), f32)
        for j in range(N):
            m = jnp.max(selC, axis=-1, keepdims=True)     # (Bc, 1)
            # distinct-lane guarantee (the lax.top_k contract of
            # ops/beam.py): a taken lane sits at NEG_INF, which is
            # bit-identical to dead candidates' scores, so once every
            # live candidate is exhausted (possible when N > K) it
            # would re-enter the tie set and be re-selected.
            # Penalizing taken lanes by +NK makes the lowest UNTAKEN
            # lane win every tie — selection-sort order over distinct
            # lanes, exactly top_k's (value desc, index asc).
            pen = mlane_f + taken * float(NK)             # (Bc, NK)
            amf = jnp.min(jnp.where(selC == m, pen, float(2 * NK)),
                          axis=-1, keepdims=True)         # (Bc, 1) f32
            SO = (pen == amf).astype(f32)                 # (Bc, NK)
            taken = taken + SO
            selC = jnp.where(SO > 0, NEG_INF, selC)
            tok_j = jnp.sum(SO * T_C, axis=-1, keepdims=True)
            pfin_j = jnp.sum(SO * F_C, axis=-1, keepdims=True)
            eos_j = (tok_j == float(SYMBOLS.EOS_ID)).astype(f32)
            PO = _dot(SO, Epn)                            # (Bc, N)
            par_j = jnp.sum(PO * n_lane_f, axis=-1, keepdims=True)
            # scatter to flat slot r = b*N + j (value-exact dots)
            F_j = ((r_cols == b_rows * N + j)).astype(f32)  # (Bc, R)
            score_new += _dot_c0_x(F_j, m)                # (R, 1)
            tok_new += _dot_c0_x(F_j, tok_j)
            par_new += _dot_c0_x(F_j, par_j)
            valid_new += _dot_c0_x(F_j, 1.0 - pfin_j)
            fin_new += _dot_c0_x(F_j, jnp.maximum(pfin_j, eos_j))
            # PO/GG carry only exact 0/1 one-hots — fast dots are safe
            PO_big = _dot(PO, En_flat) * mask_b           # (Bc, R)
            GG = GG + _dot_c0(F_j, PO_big)                # (R, R)

        # ---- gather parent states + set next input one-hot ----
        # (value-exact: a demoted gather would re-quantize the f32
        # LSTM/attention state to bf16 every step)
        for l in range(L):
            h_s[l] = _gather_1hot(GG, h_s[l])
            c_s[l] = _gather_1hot(GG, c_s[l])
        ht_s[...] = _gather_1hot(GG, ht)
        oh_s[...] = (lane_vf == tok_new).astype(f32)
        score_s[...] = score_new
        fin_s[...] = fin_new

        tok_ref[0] = tok_new
        par_ref[0] = par_new
        val_ref[0] = valid_new
        sc_ref[0] = score_new

    @pl.when(all_done)
    def _():
        # frontier frozen: identity parents, placeholder EOS tokens,
        # scores carried — the outside backtrack skips valid=0 rows
        tok_ref[0] = jnp.full((R, 1), float(SYMBOLS.EOS_ID), f32)
        par_ref[0] = slotf_ref[...]  # identity parents: r % N as f32
        val_ref[0] = jnp.zeros((R, 1), f32)
        sc_ref[0] = score_s[...]


def beam_decode_fused(enc_states, dec_h0, dec_c0, w, N, K, stop_limit,
                      interpret=False):
    """Fused beam search for one batch chunk.

    enc_states (Bc, T, H) [weight dtype], dec_h0/c0 (L, Bc, H) f32, ``w``
    the fused-decoder weight dict.  Returns (hyps (Bc, N, stop_limit+1)
    int32 starting with GO, scores (Bc, N) f32, lengths (Bc, N) int32) —
    the exact contract of ops.beam.make_beam_decoder.
    """
    Bc, T, H = enc_states.shape
    L = dec_h0.shape[0]
    A = w["ctx_w"].shape[1]
    E = w["embed"].shape[1]
    Vp = w["out_w"].shape[1]
    R = Bc * N
    max_len = stop_limit + 1

    h0 = jnp.repeat(dec_h0, N, axis=1)                   # (L, R, H)
    c0 = jnp.repeat(dec_c0, N, axis=1)

    kern = functools.partial(_beam_kernel, L, Bc, N, K, H, E, A, T, Vp)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def tblk():
        return pl.BlockSpec((1, R, 1), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)

    # tok/parent stream as f32 (Mosaic has no int<->float converts;
    # the values are small exact integers) and are cast outside
    out_shapes = [
        jax.ShapeDtypeStruct((stop_limit, R, 1), jnp.float32),  # tok
        jax.ShapeDtypeStruct((stop_limit, R, 1), jnp.float32),  # parent
        jax.ShapeDtypeStruct((stop_limit, R, 1), jnp.float32),  # valid
        jax.ShapeDtypeStruct((stop_limit, R, 1), jnp.float32),  # score
    ]
    NK = N * K
    f32 = jnp.float32
    lanevf = jnp.broadcast_to(jnp.arange(Vp, dtype=f32), (R, Vp))
    lanenkf = jnp.broadcast_to(jnp.arange(NK, dtype=f32), (Bc, NK))
    lanenf = jnp.broadcast_to(jnp.arange(N, dtype=f32), (Bc, N))
    slotf = jnp.tile(jnp.arange(N, dtype=f32), Bc)[:, None]

    tok, par, valid, score = pl.pallas_call(
        kern,
        grid=(stop_limit,),
        in_specs=[full()] * 18,
        out_specs=[tblk()] * 4,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((L, R, H), jnp.float32),          # h
            pltpu.VMEM((L, R, H), jnp.float32),          # c
            pltpu.VMEM((R, A), jnp.float32),             # ht
            pltpu.VMEM((R, Vp), jnp.float32),            # input one-hot
            pltpu.VMEM((R, 1), jnp.float32),             # scores
            pltpu.VMEM((R, 1), jnp.float32),             # finished
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(lanevf, lanenkf, lanenf, slotf,
      enc_states.reshape(-1, H), w["wx0"], w["wx_rest"], w["wh"], w["b"],
      w["wa"], w["wa_b"], w["ctx_w"], w["ctx_b"], w["out_w"], w["out_b"],
      w["embed"], h0, c0)

    U = stop_limit
    tok = tok[..., 0].reshape(U, Bc, N).astype(jnp.int32)
    par = par[..., 0].reshape(U, Bc, N).astype(jnp.int32)
    valid = valid[..., 0].reshape(U, Bc, N)
    final_scores = score[-1, :, 0].reshape(Bc, N)

    # ---- backtrack: follow parent pointers from the final slots ----
    slot0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                             (Bc, N))

    def back(slot, xs):
        tok_t, par_t, val_t = xs
        tt = jnp.take_along_axis(tok_t, slot, axis=1)
        vv = jnp.take_along_axis(val_t, slot, axis=1)
        slot = jnp.take_along_axis(par_t, slot, axis=1)
        return slot, (tt, vv)

    _, (toks, valids) = jax.lax.scan(back, slot0, (tok, par, valid),
                                     reverse=True)

    # left-compact the valid tokens behind a leading GO
    pos = (jnp.cumsum(valids, axis=0) - valids + 1.0).astype(jnp.int32)
    hyps0 = jnp.full((Bc, N, max_len), SYMBOLS.PAD_ID, jnp.int32)
    hyps0 = hyps0.at[:, :, 0].set(SYMBOLS.GO_ID)

    def write(hyps, xs):
        tok_t, val_t, pos_t = xs
        upd = (jnp.arange(max_len)[None, None, :] == pos_t[:, :, None]) \
            & (val_t[:, :, None] > 0)
        return jnp.where(upd, tok_t[:, :, None], hyps), None

    hyps, _ = jax.lax.scan(write, hyps0, (toks, valids, pos))
    lengths = 1 + jnp.sum(valids, axis=0).astype(jnp.int32)
    return hyps, final_scores, lengths
