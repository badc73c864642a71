"""Luong *general* attention as fused einsums.

Equivalent to the reference's per-step batch_matmul attention (reference:
seq2seq.py:336-357): score = enc_states @ (Wa h_dec), softmax over encoder
time, context = alpha-weighted sum of encoder states.

Parity quirk preserved: by default there is NO length masking — PAD encoder
frames receive attention mass exactly as in the reference (its masking line
is commented out at seq2seq.py:344-347).  Pass ``enc_mask`` plus the model
flag ``attn_mask: true`` to enable correct masking as an option.
"""

import jax
import jax.numpy as jnp


def init_attention_params(key, hidden, attn_units, n_attn=1):
    """attn heads wa: list of (H,H); context: ((n_attn+1)*H, attn_units)."""
    keys = jax.random.split(key, n_attn + 1)
    lecun = jax.nn.initializers.lecun_normal()
    params = {
        "wa": [
            {"w": lecun(keys[i], (hidden, hidden)),
             "b": jnp.zeros((hidden,))}
            for i in range(n_attn)
        ],
        "context": {
            "w": lecun(keys[-1], ((n_attn + 1) * hidden, attn_units)),
            "b": jnp.zeros((attn_units,)),
        },
    }
    return params


def luong_attention(attn_params, enc_states, dec_h, enc_mask=None,
                    compute_dtype=jnp.float32, block_size=0):
    """Compute attentional hidden state.

    enc_states: (B, T, H); dec_h: (B, H).
    Returns (ht (B, A), alphas (B, T) of the first head).

    ``block_size > 0`` switches to the streaming (blockwise/online-softmax)
    formulation: encoder time is processed in chunks with a running
    (max, sum, weighted-value) triple, so memory is O(block) in T and
    arbitrarily long utterances become a knob rather than a rewrite
    (SURVEY §5 long-context; Fisher never needs it at <=400 frames).
    The result is mathematically identical to the dense softmax.
    """
    cd = compute_dtype
    enc_c = enc_states.astype(cd)
    cvs = []
    alphas0 = None
    for i, wa in enumerate(attn_params["wa"]):
        q = (dec_h @ wa["w"] + wa["b"]).astype(cd)  # (B, H)
        if block_size and enc_states.shape[1] > block_size:
            cv, alphas = _blockwise_attend(enc_c, q, enc_mask, block_size)
        else:
            scores = jnp.einsum(
                "bth,bh->bt", enc_c, q, preferred_element_type=jnp.float32
            )
            if enc_mask is not None:
                scores = jnp.where(enc_mask, scores, -1e9)
            alphas = jax.nn.softmax(scores, axis=-1)
            cv = jnp.einsum(
                "bt,bth->bh", alphas.astype(cd), enc_c,
                preferred_element_type=jnp.float32,
            )
        cvs.append(cv)
        if i == 0:
            alphas0 = alphas
    cv_hdec = jnp.concatenate(cvs + [dec_h], axis=-1)
    ht = jnp.tanh(cv_hdec @ attn_params["context"]["w"]
                  + attn_params["context"]["b"])
    return ht, alphas0


def _blockwise_attend(enc_c, q, enc_mask, block_size):
    """Online-softmax streaming attention over encoder-time chunks."""
    B, T, H = enc_c.shape
    pad = (-T) % block_size
    if pad:
        enc_p = jnp.pad(enc_c, ((0, 0), (0, pad), (0, 0)))
        mask_p = jnp.pad(
            enc_mask if enc_mask is not None
            else jnp.ones((B, T), bool),
            ((0, 0), (0, pad)), constant_values=False)
    else:
        enc_p = enc_c
        mask_p = (enc_mask if enc_mask is not None
                  else jnp.ones((B, T), bool))
    n_blocks = enc_p.shape[1] // block_size
    enc_b = enc_p.reshape(B, n_blocks, block_size, H)
    mask_b = mask_p.reshape(B, n_blocks, block_size)

    def body(carry, inp):
        m, s, acc = carry
        e_blk, msk = inp  # (B, bs, H), (B, bs)
        scores = jnp.einsum("bkh,bh->bk", e_blk, q,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(msk, scores, -1e30)
        m_new = jnp.maximum(m, scores.max(axis=-1))
        scale = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[:, None])
        s_new = s * scale + p.sum(axis=-1)
        acc_new = acc * scale[:, None] + jnp.einsum(
            "bk,bkh->bh", p.astype(e_blk.dtype), e_blk,
            preferred_element_type=jnp.float32)
        return (m_new, s_new, acc_new), scores

    m0 = jnp.full((B,), -jnp.inf)
    s0 = jnp.zeros((B,))
    acc0 = jnp.zeros((B, H))
    (m, s, acc), all_scores = jax.lax.scan(
        body, (m0, s0, acc0),
        (jnp.moveaxis(enc_b, 1, 0), jnp.moveaxis(mask_b, 1, 0)))
    cv = acc / s[:, None]
    # reconstruct alphas for the (B, T) diagnostics contract — alphas
    # are inherently O(T), so the stacked scores cost nothing beyond
    # the output itself, and XLA dead-code-eliminates the stack in the
    # (common) jitted callers that discard alphas; only the context
    # vector accumulation above is the O(block) streaming part
    scores_full = jnp.moveaxis(all_scores, 0, 1).reshape(B, -1)[:, :T]
    alphas = jnp.exp(scores_full - m[:, None]) / s[:, None]
    return cv.astype(jnp.float32), alphas
