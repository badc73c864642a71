"""Pretrain-transfer CLI.

Reproduces copy_params.py semantics (reference: copy_params.py:26-68) with
proper arguments instead of hardcoded paths: copy encoder / attention /
decoder param groups from a donor experiment's latest checkpoint into a
freshly initialized target model, then save as epoch 0 of the target so
training auto-resumes from the transferred weights.
"""

import argparse

import jax
import numpy as np

from ast_tpu.config import Config
from ast_tpu.models import seq2seq
from ast_tpu.train.checkpoint import (
    checkpoint_path, latest_checkpoint, load_checkpoint, save_checkpoint,
    transfer_params,
)


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
    args = parser.parse_args(argv)

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
