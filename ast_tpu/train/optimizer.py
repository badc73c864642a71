"""Optimizer construction as an optax gradient-transform chain.

Mirrors the reference's optimizer + hook stack (reference: nn.py:81-119) in
hook order: L2 weight decay added to the raw gradient, then global-norm
clipping, then annealed gradient noise, then Adam(amsgrad) / SGD scaling.
Layer freezing is a trainable-mask wrapper: frozen subtrees get zero
updates (reference freezes via ``disable_update`` on named links).

Legacy capability carried: SGD linear LR scaling (reference:
nmt_run.py:567-576) via ``lr_scale``.
"""

import jax
import jax.numpy as jnp
import optax

from ast_tpu.config import OPT_ADAM, OPT_SGD


def _noise_transform(eta, gamma=0.55, seed=0):
    """Annealed additive gradient noise: N(0, eta/(1+t)^gamma) — the
    Chainer GradientNoise hook's schedule (Neelakantan et al. 2015)."""

    def init_fn(params):
        return {"count": jnp.zeros((), jnp.int32),
                "key": jax.random.PRNGKey(seed)}

    def update_fn(updates, state, params=None):
        count = state["count"]
        key, sub = jax.random.split(state["key"])
        sigma = jnp.sqrt(eta / (1.0 + count.astype(jnp.float32)) ** gamma)
        leaves, treedef = jax.tree.flatten(updates)
        keys = jax.random.split(sub, len(leaves))
        noised = [
            leaf + sigma * jax.random.normal(k, leaf.shape, leaf.dtype)
            for leaf, k in zip(leaves, keys)
        ]
        return (jax.tree.unflatten(treedef, noised),
                {"count": count + 1, "key": key})

    return optax.GradientTransformation(init_fn, update_fn)


def freeze_mask(params, freeze_list):
    """Boolean mask pytree: True = trainable.  Names address top-level
    param groups ("cnn", "enc", "attn", "dec") or dotted subpaths
    ("dec.embed"), covering the reference's freezable link names."""

    def frozen(path):
        for name in freeze_list:
            parts = name.split(".")
            if path[: len(parts)] == tuple(parts):
                return True
        return False

    def build(tree, path=()):
        if isinstance(tree, dict):
            return {k: build(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [build(v, path + (str(i),)) for i, v in enumerate(tree)]
            return type(tree)(t) if isinstance(tree, tuple) else t
        return not frozen(path)

    return build(params)


def build_optimizer(opt_cfg, params, seed=0):
    """Returns (optax.GradientTransformation, init opt_state)."""
    chain = []
    if opt_cfg.get("l2", 0) > 0:
        chain.append(optax.add_decayed_weights(opt_cfg["l2"]))
    if opt_cfg.get("grad_clip", 0) > 0:
        chain.append(optax.clip_by_global_norm(opt_cfg["grad_clip"]))
    if opt_cfg.get("grad_noise_eta", 0) > 0:
        chain.append(_noise_transform(opt_cfg["grad_noise_eta"], seed=seed))

    lr = opt_cfg["lr"] * opt_cfg.get("lr_scale", 1)
    if opt_cfg.get("type", OPT_ADAM) == OPT_ADAM:
        # moments_dtype="bfloat16": keep Adam's first moment in bf16
        # (the update divides by sqrt(nu), so mu precision is the least
        # critical of the three accumulators; nu and the amsgrad max
        # stay f32)
        mu_dtype = opt_cfg.get("moments_dtype") or None
        chain.append(optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=1e-8,
                                            mu_dtype=mu_dtype))
        chain.append(optax.scale(-lr))
    else:
        chain.append(optax.scale(-lr))

    tx = optax.chain(*chain)

    freeze = opt_cfg.get("freeze", [])
    if freeze:
        mask = freeze_mask(params, freeze)
        tx = optax.chain(
            optax.masked(tx, mask),
            # zero out updates for frozen leaves entirely
        )

        def zero_frozen(updates):
            return jax.tree.map(
                lambda u, m: u if m else jnp.zeros_like(u), updates, mask)

        base = tx

        def update_fn(updates, state, params=None):
            updates, state = base.update(updates, state, params)
            return zero_frozen(updates), state

        tx = optax.GradientTransformation(base.init, update_fn)

    opt_state = tx.init(params)
    return tx, opt_state
