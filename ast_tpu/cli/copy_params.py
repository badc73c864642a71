"""Pretrain-transfer CLI.

Reproduces copy_params.py semantics (reference: copy_params.py:26-68) with
proper arguments instead of hardcoded paths: copy encoder / attention /
decoder param groups from a donor experiment's latest checkpoint into a
freshly initialized target model, then save as epoch 0 of the target so
training auto-resumes from the transferred weights.
"""

import argparse
import os

import jax
import numpy as np

from ast_tpu.config import Config
from ast_tpu.models import seq2seq
from ast_tpu.train.checkpoint import (
    average_checkpoints, checkpoint_path, latest_checkpoint,
    list_checkpoints, load_checkpoint, save_checkpoint, transfer_params,
)


def _average(src_dir, spec, out):
    """--average: mean of several epoch checkpoints (decode-time trick,
    no reference counterpart).  spec: 'last:K' or 'e1,e2,...'."""
    available = dict(list_checkpoints(src_dir))
    if not available:
        raise FileNotFoundError(f"no checkpoints found in {src_dir}")
    if spec.startswith("last:"):
        k = int(spec.split(":", 1)[1])
        if k < 1:
            raise ValueError(f"--average last:K needs K >= 1, got {k}")
        epochs = sorted(available)[-k:]
    else:
        epochs = [int(e) for e in spec.split(",") if e.strip()]
        missing = [e for e in epochs if e not in available]
        if missing:
            raise FileNotFoundError(
                f"epochs {missing} have no checkpoint in {src_dir} "
                f"(available: {sorted(available)})")
    params, state = average_checkpoints([available[e] for e in epochs])
    out = out or os.path.join(
        src_dir, f"seq2seq_avg_{'-'.join(map(str, epochs))}.model.npz")
    save_checkpoint(out, params, state)
    print(f"averaged epochs {epochs} -> {out}")
    print("decode/export from it with --ckpt "
          f"{out} on beam/infer/export_model")
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="Transfer param groups")
    parser.add_argument("--src", required=True, help="donor experiment dir")
    parser.add_argument("--dst", help="target experiment dir")
    parser.add_argument("--groups", default="enc",
                        help="comma list of: enc, attn, dec")
    parser.add_argument("--export-chainer", metavar="FILE",
                        help="instead of transferring, write --src's latest "
                             "checkpoint in the reference's Chainer "
                             "save_npz layout (loadable by the reference's "
                             "nn.py:150 serializers.load_npz)")
    parser.add_argument("--average", metavar="SPEC",
                        help="instead of transferring, average --src epoch "
                             "checkpoints ('last:K' or 'e1,e2,...') into "
                             "one decode-time model (use via --ckpt)")
    parser.add_argument("--out", default=None,
                        help="output path for --average")
    args = parser.parse_args(argv)

    if args.average:
        _average(args.src, args.average, args.out)
        return

    groups = tuple(g.strip() for g in args.groups.split(",") if g.strip())

    src_ckpt, src_epoch = latest_checkpoint(args.src)
    if src_ckpt is None:
        raise FileNotFoundError(f"no checkpoint found in {args.src}")
    print(f"donor checkpoint: {src_ckpt} (epoch {src_epoch})")
    src = load_checkpoint(src_ckpt)

    if args.export_chainer:
        from ast_tpu.train.chainer_import import ast_to_chainer
        arrays = ast_to_chainer(src["params"], src.get("state") or {})
        with open(args.export_chainer, "wb") as f:
            np.savez_compressed(f, **arrays)
        print(f"exported Chainer-format model: {args.export_chainer} "
              f"({len(arrays)} arrays)")
        return
    if not args.dst:
        parser.error("--dst is required unless --export-chainer is given")

    dst_cfg = Config(args.dst)
    key = jax.random.PRNGKey(0)
    dst_params, dst_state = seq2seq.init_model(key, dst_cfg.model)

    new_params, new_state = transfer_params(
        src["params"], dst_params, groups=groups,
        src_state=src.get("state"), dst_state=dst_state)

    # sanity print, as the reference verifies copied arrays (copy_params.py:61-65)
    ok = np.allclose(np.asarray(new_params["cnn"][0]["w"]),
                     np.asarray(src["params"]["cnn"][0]["w"]))
    print(f"encoder conv weights match donor: {ok}")

    out = checkpoint_path(args.dst, 0)
    save_checkpoint(out, new_params, new_state)
    print(f"saved transferred model: {out}")


if __name__ == "__main__":
    main()
