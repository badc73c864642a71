"""Decode loose audio/feature files with a trained experiment.

``python -m ast_tpu.cli.infer -m <exp_dir> utt1.wav utt2.sph feats.npy ...
[--beam N,K] [-w W] [--cmvn utt|none|<stats.pkl>] [-o out.txt]``

The dataset CLIs (train/beam) decode corpus *splits*; this is the
missing "transcribe these files" front door: each input is read
(WAV/SPHERE audio or a precomputed ``(T, 13)`` ``.npy`` feature
matrix), audio is run through the same on-device MFCC+CMVN front-end
the wav-mode trainer uses, inputs are grouped into duration buckets
(padding stays under one bucket width — the model attends over padding
unmasked, same contract as training), and each group is decoded in one
batched device call (greedy, or beam with the reference's
``score/(len-2)^W`` rerank, reference: beam.py:30-32).

The reference has no file-level inference path at all — decoding there
requires a corpus pickle tree (reference: beam.py:45-147).
"""

import argparse
import os
import pickle

import numpy as np

from ast_tpu.ops import beam as beam_ops
from ast_tpu.ops.fbank import MfccExtractor, apply_cmvn, compute_cmvn_stats
from ast_tpu.symbols import SYMBOLS
from ast_tpu.train.trainer import NN


def _read_input(path, mfcc, cmvn_mode, cmvn_stats, utt2spk, utt):
    """One file -> float32 (T, n_ceps) features."""
    from ast_tpu.data import wav_loader

    if path.endswith(".npy"):
        x = np.load(path).astype(np.float32)
        if x.ndim == 2:          # precomputed features, used as-is
            return x
        if x.ndim != 1:
            raise ValueError(f"{path}: expected 1-D audio or 2-D "
                             f"features, got shape {x.shape}")
        audio, rate = x, None
    elif path.endswith(".sph"):
        audio, rate = wav_loader.read_sph(path, with_rate=True)
    else:
        audio, rate = wav_loader.read_wav(path, with_rate=True)
    want = mfcc.cfg.sample_rate
    if rate is not None and rate != want:
        raise ValueError(
            f"{path}: sample rate {rate} != model front-end rate {want}; "
            "resample offline (the experiment was trained on "
            f"{want} Hz features)")
    feats = np.asarray(mfcc(audio), np.float32)
    if cmvn_mode == "none":
        return feats
    if cmvn_mode == "utt":
        stats = compute_cmvn_stats([feats])
    else:
        spk = utt2spk.get(utt, utt)
        if spk not in cmvn_stats:
            raise KeyError(
                f"{path}: no CMVN stats for speaker {spk!r} in the "
                "provided stats file (and no utt2spk entry); use "
                "--cmvn utt for per-utterance normalization")
        stats = cmvn_stats[spk]
    return np.asarray(apply_cmvn(feats, stats), np.float32)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Decode loose audio/feature files")
    parser.add_argument("-m", "--cfg_path", required=True)
    parser.add_argument("inputs", nargs="+",
                        help=".wav/.sph audio, 1-D .npy audio, or "
                             "2-D (T, n_ceps) .npy features")
    parser.add_argument("--beam", default=None, metavar="N,K",
                        help="beam decode at N,K (default: greedy)")
    parser.add_argument("-w", "--W", type=float, default=0.6,
                        help="beam length-norm weight (default 0.6)")
    parser.add_argument("--cmvn", default="utt",
                        help="'utt' (per-utterance stats, default), "
                             "'none', or a path to a cmvn.stats pickle "
                             "({'utt2spk': ..., 'stats': ...}, the "
                             "wav-mode training layout)")
    parser.add_argument("--batch", type=int, default=None,
                        help="max decode batch (default: train batch_size)")
    parser.add_argument("--stop-limit", type=int, default=None,
                        help="max decode steps (default data.max_pred)")
    parser.add_argument("-o", "--output", default=None,
                        help="write '<name>\\t<text>' lines here too")
    parser.add_argument("--ckpt", default=None,
                        help="decode from this checkpoint file instead "
                             "of the latest epoch (e.g. a copy_params "
                             "--average artifact)")
    args = parser.parse_args(argv)
    beam_nk = None
    if args.beam is not None:
        # validate BEFORE the model loads (same contract as
        # export_model): a bad spec should be a parser error, not a
        # tuple-unpacking traceback minutes in
        try:
            beam_nk = tuple(int(v) for v in args.beam.split(","))
            if len(beam_nk) != 2:
                raise ValueError
        except ValueError:
            parser.error(f"--beam expects N,K (got {args.beam!r})")

    nn = NN(args.cfg_path, ckpt=args.ckpt)
    if nn.loaded_ckpt is None:
        print("warning: no checkpoint found — decoding with random init")
    data_cfg = nn.cfg.train["data"]
    stop_limit = args.stop_limit or int(data_cfg["max_pred"])
    bs = nn.cfg.train["batch_size"]
    if isinstance(bs, dict):  # legacy per-bucket sizes {max, med, min}
        bs = max(int(bs[k]) for k in ("max", "med", "min") if k in bs)
    batch_size = args.batch or int(bs)
    width_b = int(data_cfg["buckets_width"])
    # same frame cap as corpus decode (dataloader._load_speech): the
    # model never saw longer sequences, and unmasked attention over an
    # unbounded one-off shape would silently degrade instead of erroring
    max_sp = (int(data_cfg["buckets_num"]) + 1) * width_b

    cmvn_stats, utt2spk = {}, {}
    if args.cmvn not in ("utt", "none"):
        with open(args.cmvn, "rb") as f:
            blob = pickle.load(f)
        cmvn_stats = blob.get("stats", blob)
        utt2spk = blob.get("utt2spk", {})

    # unique utt key per input file (basename, deduplicated)
    mfcc = MfccExtractor()
    feats, seen = [], {}
    for path in args.inputs:
        utt = os.path.splitext(os.path.basename(path))[0]
        if utt in seen:
            seen[utt] += 1
            utt = f"{utt}#{seen[utt]}"
        else:
            seen[utt] = 0
        feats.append((utt, _read_input(path, mfcc, args.cmvn,
                                       cmvn_stats, utt2spk, utt)))

    # bucket by padded length: one static T per group bounds both the
    # unmasked-attention padding mass and the number of compiles
    groups = {}
    for utt, x in feats:
        if x.shape[0] > max_sp:
            print(f"warning: {utt}: {x.shape[0]} frames truncated to "
                  f"the training cap {max_sp}")
            x = x[:max_sp]
        T = max(width_b, -(-x.shape[0] // width_b) * width_b)
        groups.setdefault(T, []).append((utt, x))

    use_beam = beam_nk is not None
    if use_beam:
        N, K = beam_nk
        decode = beam_ops.make_beam_decoder(
            nn.mcfg, N=N, K=K, stop_limit=stop_limit,
            compute_dtype=nn.compute_dtype)
    else:
        import jax

        from ast_tpu.models import seq2seq

        greedy = jax.jit(lambda p, s, X: seq2seq.predict_greedy(
            p, s, nn.mcfg, X, stop_limit, nn.compute_dtype)[0])

    preds = {}
    for T in sorted(groups):
        items = groups[T]
        for i in range(0, len(items), batch_size):
            chunk = items[i:i + batch_size]
            X = np.zeros((len(chunk), T, chunk[0][1].shape[1]), np.float32)
            for j, (_, x) in enumerate(chunk):
                X[j, : x.shape[0]] = x[:T]
            if use_beam:
                hyps, scores, lengths = (
                    np.asarray(a) for a in decode(nn.params, nn.state, X))
                entries = {
                    utt: [(hyps[j, n, : int(lengths[j, n])].tolist(),
                           float(scores[j, n]))
                          for n in range(hyps.shape[1])]
                    for j, (utt, _) in enumerate(chunk)}
                preds.update(beam_ops.get_best_hyps(entries, args.W))
            else:
                p = np.asarray(greedy(nn.params, nn.state, X))
                for j, (utt, _) in enumerate(chunk):
                    # cut each file's ids at its own first EOS: batch
                    # mates finish at different steps and post-EOS
                    # argmax is babble conditioned past the sentence
                    # (corpus decode keeps it for reference parity; a
                    # transcription tool must not)
                    eos = np.nonzero(p[j] == SYMBOLS.EOS_ID)[0]
                    preds[utt] = (p[j][: eos[0]] if eos.size
                                  else p[j]).tolist()

    hyps = nn.data_loader.get_hyps(preds.items())
    lines = []
    for utt, _ in feats:                      # input order, not bucket order
        lines.append(f"{utt}\t{' '.join(hyps[utt])}")
        print(lines[-1])
    if args.output:
        with open(args.output, "w") as f:
            f.write("\n".join(lines) + "\n")
    return {utt: " ".join(hyps[utt]) for utt, _ in feats}


if __name__ == "__main__":
    main()
