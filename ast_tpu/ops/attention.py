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
                    compute_dtype=jnp.float32):
    """Compute attentional hidden state.

    enc_states: (B, T, H); dec_h: (B, H).
    Returns (ht (B, A), alphas (B, T) of the first head).
    """
    cd = compute_dtype
    enc_c = enc_states.astype(cd)
    cvs = []
    alphas0 = None
    for i, wa in enumerate(attn_params["wa"]):
        q = (dec_h @ wa["w"] + wa["b"]).astype(cd)  # (B, H)
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
