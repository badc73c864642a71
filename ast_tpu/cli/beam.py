"""Beam-search CLI: ``python beam.py -m <dir> -n N -k K -s <set> -w W``.

Mirrors the reference decode driver (reference: beam.py:45-147): beam
results are pickled to ``<set>_beam_N-<n>_K-<k>.p`` (resumable with
``--resume``), reranked with length normalization ``score/(len-2)^W``,
BLEU-scored against the refs dir and written to
``<set>_beam_N-<n>_K-<k>_W-<w>.en`` — but the decode itself runs fully
batched on device instead of one hypothesis at a time.
"""

import argparse
import os
import pickle

from ast_tpu.eval.bleu import Eval
from ast_tpu.ops.beam import get_best_hyps
from ast_tpu.train.trainer import NN


def main(argv=None):
    parser = argparse.ArgumentParser(description="Beam search decode")
    parser.add_argument("-m", "--cfg_path", required=True)
    parser.add_argument("-n", "--N", required=True, help="number of hyps")
    parser.add_argument("-k", "--K", required=True, help="expansion width")
    parser.add_argument("-s", "--S", required=True, help="dev/dev2/test")
    parser.add_argument("-w", "--W", required=True, help="len norm weight")
    parser.add_argument("--resume", action="store_true",
                        help="reuse pickled beam results")
    parser.add_argument("--ckpt", default=None,
                        help="decode from this checkpoint file instead "
                             "of the latest epoch (e.g. a copy_params "
                             "--average artifact)")
    parser.add_argument("--save-attn", action="store_true",
                        help="pickle per-hypothesis attention history "
                             "alongside (hyp, score), as the reference "
                             "beam entries do")
    args = parser.parse_args(argv)

    cfg_path = args.cfg_path
    N, K, W = int(args.N), int(args.K), float(args.W)
    set_key = args.S

    nn = NN(cfg_path, ckpt=args.ckpt)
    refs_path = os.path.join(nn.cfg.train["data"]["refs_path"], set_key)
    metrics = Eval(refs_path, nn.cfg.train["data"]["n_evals"])

    # keyed by checkpoint identity when --ckpt is given, so --resume can
    # never serve cached beams from a different model, and an explicit-
    # checkpoint decode never clobbers the latest-epoch results
    tag = ""
    if args.ckpt:
        tag = "_ckpt-" + os.path.splitext(os.path.basename(args.ckpt))[0]
    beam_path = os.path.join(cfg_path, f"{set_key}_beam_N-{N}_K-{K}{tag}.p")
    if args.resume and os.path.exists(beam_path):
        print("Loading saved beam results")
        with open(beam_path, "rb") as f:
            beam = pickle.load(f)
    else:
        print("Computing beam results (batched on device)")
        beam = nn.decode_beam_set(set_key, N=N, K=K,
                                  save_attn=args.save_attn)
        with open(beam_path, "wb") as f:
            pickle.dump(beam, f)

    preds = get_best_hyps(beam, W)
    hyps = nn.data_loader.get_hyps(preds.items())
    bleu = metrics.calc_bleu(hyps) * 100
    print(f"BLEU = {bleu:.2f}")

    out_fname = os.path.join(
        cfg_path, f"{set_key}_beam_N-{N}_K-{K}_W-{W:.2f}{tag}.en")
    metrics.write_to_file(hyps, out_fname)
    print(f"Predictions written to: {out_fname}")
    return bleu


if __name__ == "__main__":
    main()
