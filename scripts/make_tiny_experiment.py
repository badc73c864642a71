#!/usr/bin/env python
"""Generate the checked-in `experiments/syn_tiny` fixture experiment.

The reference's shipped experiments (`es_en_20h`, `asr_gpfr`) point at
LDC-licensed corpora that cannot be committed, so a fresh clone has no
runnable recipe out of the box (reference: experiments/es_en_20h/
train_cfg.json -> ./data/fisher/...).  This script builds a tiny
*transcribable* synthetic corpus — every vocab word has a fixed 8-frame
spectral signature, utterance features are the concatenation of its
words' signatures plus noise — in the exact on-disk formats the real
recipes use (map/vocab/info pickles, refs/ dir with eval.ids + ref.en0,
GlobalPhone-style single data pickle; reference formats:
preprocessing/preprocess_gp.py:66-176), and a config pair in the same
JSON schema.  The output is committed, so

    python train.py -m experiments/syn_tiny -e 5
    python beam.py  -m experiments/syn_tiny -s syn_tiny_dev -n 3 -k 3 -w 0.6

work from a fresh clone with no external data; dev BLEU climbs fast
because the corpus is deterministic and learnable.

Regenerate (byte-stable) from the repo root:
    python scripts/make_tiny_experiment.py
"""

import json
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_TRAIN = 240
N_DEV = 40
VOCAB_WORDS = 24
SEED = 7


def main():
    rng = np.random.RandomState(SEED)
    data_dir = os.path.join(REPO, "data", "syn_tiny")
    exp_dir = os.path.join(REPO, "experiments", "syn_tiny")
    refs_dir = os.path.join(data_dir, "refs", "syn_tiny_dev")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(exp_dir, exist_ok=True)
    os.makedirs(refs_dir, exist_ok=True)

    words = [f"w{i:02d}".encode() for i in range(VOCAB_WORDS)]
    specials = [b"_PAD", b"_GO", b"_EOS", b"_UNK"]
    w2i = {w: i for i, w in enumerate(specials + words)}
    vocab = {"en_w": {"w2i": w2i,
                      "i2w": {i: w for w, i in w2i.items()},
                      "freq": {w: 10 for w in words}}}

    # fixed 8-frame x 13-dim spectral signature per word
    signatures = rng.randn(VOCAB_WORDS, 8, 13).astype(np.float32) * 2.0

    sets = {"syn_tiny_train": N_TRAIN, "syn_tiny_dev": N_DEV}
    map_dict, info, speech = {}, {}, {}
    for set_key, n in sets.items():
        map_dict[set_key], info[set_key], speech[set_key] = {}, {}, {}
        for i in range(n):
            utt = f"{set_key}_u{i:04d}"
            n_words = int(rng.randint(2, 9))
            idx = rng.randint(VOCAB_WORDS, size=n_words)
            feats = np.concatenate([signatures[j] for j in idx], axis=0)
            feats = feats + 0.1 * rng.randn(*feats.shape).astype(np.float32)
            # stored float16 to keep the committed pickle small; the
            # GlobalPhone loader casts to float32 on read
            speech[set_key][utt] = feats.astype(np.float16)
            map_dict[set_key][utt] = {"en_w": [words[j] for j in idx]}
            info[set_key][utt] = {"sp": len(feats), "en_w": n_words}

    for name, obj in [("syn_tiny.vocab", vocab),
                      ("syn_tiny.map", map_dict),
                      ("syn_tiny.info", info),
                      ("syn_tiny.data", speech)]:
        with open(os.path.join(data_dir, name), "wb") as f:
            pickle.dump(obj, f, protocol=2)

    dev_utts = sorted(map_dict["syn_tiny_dev"])
    with open(os.path.join(refs_dir, "eval.ids"), "w") as f:
        f.write("\n".join(dev_utts) + "\n")
    with open(os.path.join(refs_dir, "ref.en0"), "w") as f:
        for u in dev_utts:
            f.write(" ".join(
                w.decode() for w in map_dict["syn_tiny_dev"][u]["en_w"])
                + "\n")

    model_cfg = {
        "dropout": {"embed": 0.1, "rnn": 0.1, "out": 0},
        "rnn_config": {
            "bi_rnn": True, "enc_layers": 2, "dec_layers": 2,
            "hidden_units": 256, "embedding_units": 128, "attn_units": 256,
            "n_attn": 1, "feed_attn": True, "ln": False,
        },
        "cnn_config": {
            "bn": True,
            "cnn_layers": [
                {"in_channels": None, "out_channels": 64, "ksize": [5, 13],
                 "stride": [2, 13], "pad": [2, 0]},
                {"in_channels": None, "out_channels": 256, "ksize": [5, 1],
                 "stride": [2, 1], "pad": [2, 0]},
            ],
        },
    }
    train_cfg = {
        "seed": "syn-tiny-seed",
        "iters_save": 10,
        "train_set": "syn_tiny_train",
        "dev_set": "syn_tiny_dev",
        "extras": {"random_out": 0, "speech_noise": 0.05,
                   "teach_ratio": 0.9},
        "data": {
            "dataloader": "globalphone",
            "enc_key": "sp", "dec_key": "en_w",
            "speech_path": "./data/syn_tiny/syn_tiny.data",
            "map_path": "./data/syn_tiny/syn_tiny.map",
            "vocab_path": "./data/syn_tiny/syn_tiny.vocab",
            "info_path": "./data/syn_tiny/syn_tiny.info",
            "max_pred": 16,
            "refs_path": "./data/syn_tiny/refs",
            "n_evals": 1,
            "buckets_num": 4, "buckets_width": 24,
            "train_scale": 1, "zero_input": 0.05,
            "target_pad_multiple": 8,
        },
        "optimizer": {"type": 0, "lr": 0.001, "l2": 0.0001,
                      "grad_clip": 2, "grad_noise_eta": 0, "freeze": []},
        "batch_size": 32,
    }
    with open(os.path.join(exp_dir, "model_cfg.json"), "w") as f:
        json.dump(model_cfg, f, indent=2)
        f.write("\n")
    with open(os.path.join(exp_dir, "train_cfg.json"), "w") as f:
        json.dump(train_cfg, f, indent=2)
        f.write("\n")

    total = sum(os.path.getsize(os.path.join(data_dir, n))
                for n in os.listdir(data_dir) if not n.startswith("refs"))
    print(f"wrote {data_dir} ({total/1024:.0f} KiB) + {exp_dir}")


if __name__ == "__main__":
    sys.exit(main())
