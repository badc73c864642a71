"""Checkpointing: flat-key NPZ snapshots of params + BN state + optimizer.

The reference serializes the whole Chainer chain as NPZ named
``seq2seq_<epoch>.model`` and auto-resumes from the max-epoch file
(reference: train.py:75, nn.py:139-156) — but drops optimizer state
(nmt_run.py:755-761 commented out).  We keep the naming/cadence contract
and *also* persist optimizer state and the data-epoch, so resume is exact.

``transfer_params`` reproduces copy_params.py semantics (reference:
copy_params.py:26-56): subtree-copy encoder ("cnn"+"enc"), attention
("attn") and/or decoder ("dec") groups from a donor checkpoint, then save
as epoch 0 of the target experiment.
"""

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.train import chainer_import


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        if not tree:
            # an empty dict inside a list (e.g. cnn_bn state with
            # "bn": false) must leave a marker, or _unflatten's
            # list materialize hits a missing index key
            flat[f"{prefix}__emptydict__"] = np.asarray(0)
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        flat[f"{prefix}__len__"] = np.asarray(len(tree))
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        flat[f"{prefix}__none__"] = np.asarray(0)
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat):
    # reconstruct nested structure from path keys
    root = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def materialize(node):
        if not isinstance(node, dict):
            return node
        if "__none__" in node:
            return None
        if "__emptydict__" in node:
            return {}
        if "__len__" in node:
            n = int(node["__len__"])
            return [materialize(node[str(i)]) for i in range(n)]
        return {k: materialize(v) for k, v in node.items()}

    return materialize(root)


def merge_into(template, loaded, what="checkpoint"):
    """Merge loaded (numpy, possibly list-shaped) leaves into a live
    pytree TEMPLATE, preserving the template's container types and leaf
    dtypes.

    NPZ flattening stores optax NamedTuple/tuple states as plain lists,
    so a structural ``jax.tree.map(template, loaded)`` raises on every
    optimizer-state restore — matching by leaf ORDER (identical for
    list/tuple/NamedTuple of the same tree) is the correct equivalence.
    Leaf count and per-leaf shape are validated so a checkpoint from a
    different model/optimizer config fails HERE with an attributable
    error instead of a trace-time crash (or silent broadcasting) later.
    """
    t_leaves, treedef = jax.tree.flatten(template)
    l_leaves = jax.tree.leaves(loaded)
    if len(t_leaves) != len(l_leaves):
        raise ValueError(
            f"{what}: leaf count mismatch (template {len(t_leaves)}, "
            f"loaded {len(l_leaves)}) — config changed?")
    merged = []
    for i, (a, b) in enumerate(zip(t_leaves, l_leaves)):
        b = jnp.asarray(b, jnp.asarray(a).dtype)
        if jnp.shape(a) != jnp.shape(b):
            raise ValueError(
                f"{what}: leaf {i} shape mismatch (template "
                f"{jnp.shape(a)}, loaded {jnp.shape(b)}) — config "
                f"changed?")
        merged.append(b)
    return jax.tree.unflatten(treedef, merged)


def _savable(x):
    """np.asarray, upcasting dtypes NPZ cannot represent (ml_dtypes
    bfloat16 serializes as raw ``|V2`` void bytes and loses its type on
    load) to float32.  A bf16 Adam moment reloaded as f32 is re-cast to
    ``moments_dtype`` by optax on the next update, so resume stays
    correct."""
    a = np.asarray(x)
    if a.dtype.kind == "V":
        a = np.asarray(jnp.asarray(x), np.float32)
    return a


def save_checkpoint(path, params, state=None, opt_state=None, extra=None):
    """Save a training snapshot to ``path`` (.npz appended if missing)."""
    tree = {"params": params}
    if state is not None:
        tree["state"] = state
    if opt_state is not None:
        tree["opt"] = opt_state
    if extra is not None:
        tree["extra"] = extra
    flat = _flatten(jax.tree.map(_savable, tree))
    if not path.endswith(".npz"):
        path = path + ".npz"
    # atomic: a SIGKILL mid-write must not leave a truncated max-epoch
    # file that bricks every future auto-resume.  The tmp name keeps
    # the .npz suffix so np.savez does not append another one.
    tmp = path[:-len(".npz")] + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_checkpoint(path):
    """Load a snapshot; returns dict with 'params' and optional
    'state'/'opt'/'extra' subtrees (numpy leaves).

    Reference (Chainer-serialized) checkpoints are detected by their key
    schema and converted in place — a trained ``seq2seq_<epoch>.model``
    from a reference experiment directory loads directly (params + BN
    state; the reference saves no optimizer state)."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as f:
        flat = {k: f[k] for k in f.files}
    if chainer_import.is_chainer_checkpoint(flat):
        return chainer_import.chainer_to_ast(flat)
    return _unflatten(flat)


# our snapshots are ``seq2seq_<e>.model.npz``; reference checkpoints are
# ``seq2seq_<e>.model`` (Chainer hands numpy.savez an open file handle,
# so no .npz suffix is appended) — auto-resume accepts both
_CKPT_RE = re.compile(r"seq2seq_(\d+)\.model(\.npz)?$")


def checkpoint_path(model_dir, epoch):
    return os.path.join(model_dir, f"seq2seq_{epoch}.model.npz")


def latest_checkpoint(model_dir):
    """(path, epoch) of the max-epoch checkpoint, or (None, 0)."""
    ckpts = list_checkpoints(model_dir)
    if not ckpts:
        return None, 0
    epoch, path = ckpts[-1]
    return path, epoch


def list_checkpoints(model_dir):
    """Sorted ``[(epoch, path)]`` of every epoch checkpoint in the dir.
    At equal epoch our ``.model.npz`` outranks a reference ``.model``
    (ours carries optimizer state and the exact-resume extras)."""
    found = {}
    if os.path.isdir(model_dir):
        for f in os.listdir(model_dir):
            m = _CKPT_RE.search(f)
            if not m:
                continue
            epoch, ours = int(m.group(1)), m.group(2) is not None
            if epoch not in found or (ours and not found[epoch][1]):
                found[epoch] = (os.path.join(model_dir, f), ours)
    return [(e, found[e][0]) for e in sorted(found)]


def average_checkpoints(paths):
    """Elementwise mean of params (and BN running stats) over several
    epoch checkpoints — the standard decode-time checkpoint-averaging
    trick (no counterpart in the reference, which always decodes the
    latest checkpoint; see beam.py:80 there).  Returns (params, state);
    optimizer state and resume extras are deliberately dropped — the
    artifact is for decode/export, not for resuming training."""
    if not paths:
        raise ValueError("no checkpoints to average")
    acc = None
    n = 0
    for path in paths:
        snap = load_checkpoint(path)
        cur = (snap["params"], snap.get("state") or {})
        if acc is None:
            acc = jax.tree.map(lambda a: np.asarray(a, np.float64), cur)
        else:
            acc = jax.tree.map(
                lambda a, b: a + np.asarray(b, np.float64), acc, cur)
        n += 1
    params, state = jax.tree.map(
        lambda a: (a / n).astype(np.float32), acc)
    return params, state


# param groups matching the reference's component lists
# (reference: copy_params.py:20-24)
TRANSFER_GROUPS = {
    "enc": ["cnn", "enc"],
    "attn": ["attn"],
    "dec": ["dec"],
}


def transfer_params(src_params, dst_params, groups=("enc",),
                    src_state=None, dst_state=None):
    """Copy whole param groups from a donor model into a target model.

    Shapes must match within copied groups (they do when model_cfg agrees;
    the decoder group additionally requires equal vocab sizes).
    Returns (new_params, new_state).
    """
    new_params = dict(dst_params)
    for g in groups:
        for key in TRANSFER_GROUPS[g]:
            def check(a, b):
                if np.shape(a) != np.shape(b):
                    raise ValueError(
                        f"shape mismatch transferring '{key}': "
                        f"{np.shape(b)} -> {np.shape(a)}")
                return b
            new_params[key] = jax.tree.map(check, dst_params[key],
                                           src_params[key])
    new_state = dst_state
    if "enc" in groups and src_state is not None and dst_state is not None:
        # BN running stats ride along with the encoder
        new_state = dict(dst_state)
        new_state["cnn_bn"] = src_state["cnn_bn"]
        new_state["enc_proj_bn"] = src_state["enc_proj_bn"]
    return new_params, new_state
