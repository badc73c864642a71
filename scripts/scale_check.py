#!/usr/bin/env python
"""160h-scale dataloader readiness check (BASELINE config 5).

Synthesizes fisher_160h-scale metadata (~140k train utterances, Fisher-
like duration mix) and measures the host-side costs that must stay
linear: bucketing, dataloader init (including _compute_target_lengths),
per-epoch batch-stream assembly (metadata path), and the feature-pack
index.  Run on CPU; prints one timing line per stage.
"""

import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def synth_metadata(root, n_train=140_000, n_dev=4_000, vocab_words=1094,
                   seed=0):
    rng = np.random.RandomState(seed)
    words = [f"w{i}".encode() for i in range(vocab_words)]
    specials = [b"_PAD", b"_GO", b"_EOS", b"_UNK"]
    all_types = specials + words
    w2i = {w: i for i, w in enumerate(all_types)}
    i2w = {i: w for w, i in w2i.items()}
    vocab = {"bpe_w": {"w2i": w2i, "i2w": i2w,
                       "freq": {w: 5 for w in words}}}

    map_dict, info_dict = {}, {}
    for set_key, n in (("fisher_train", n_train), ("fisher_dev", n_dev)):
        m, inf = {}, {}
        # Fisher-like duration mix: lognormal, capped at 21*80 frames
        frames = np.minimum(
            (np.exp(rng.normal(5.6, 0.7, n))).astype(int) + 30, 1680)
        n_words = np.clip((frames / 40).astype(int) + rng.randint(
            2, 8, n), 2, 60)
        for i in range(n):
            utt = f"{set_key}_u{i:06d}"
            toks = [words[j % vocab_words]
                    for j in rng.randint(0, vocab_words, n_words[i])]
            m[utt] = {"bpe_w": toks}
            inf[utt] = {"sp": int(frames[i]), "bpe_w": int(n_words[i])}
        map_dict[set_key] = m
        info_dict[set_key] = inf

    paths = {}
    for name, obj in (("scale.vocab", vocab), ("scale.map", map_dict),
                      ("scale.info", info_dict)):
        p = os.path.join(root, name)
        with open(p, "wb") as f:
            pickle.dump(obj, f)
        paths[name.split(".")[1]] = p
    return paths


def main():
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 140_000
    root = tempfile.mkdtemp(prefix="scale160_")
    t0 = time.perf_counter()
    paths = synth_metadata(root, n_train=n_train)
    print(f"synth metadata ({n_train} train utts): "
          f"{time.perf_counter() - t0:.1f}s")

    from ast_tpu.data.dataloader import FisherDataLoader

    data_cfg = {
        "enc_key": "sp", "dec_key": "bpe_w",
        "speech_path": root, "map_path": paths["map"],
        "vocab_path": paths["vocab"], "info_path": paths["info"],
        "max_pred": 175, "buckets_num": 20, "buckets_width": 80,
        "train_scale": 1, "zero_input": 0.1, "n_evals": 4,
        "refs_path": root,
    }
    model_dir = os.path.join(root, "model")
    os.makedirs(model_dir, exist_ok=True)

    t0 = time.perf_counter()
    dl = FisherDataLoader(data_cfg, model_dir, seed="scale-seed",
                          cache_features=False)
    print(f"dataloader init (buckets + target lengths): "
          f"{time.perf_counter() - t0:.1f}s")

    # metadata-only epoch: the full deterministic stream incl. grouped
    # runs and target assembly, feature tensors skipped
    for G in (1, 4):
        t0 = time.perf_counter()
        n_batches = 0
        n_utts = 0
        for batch in dl.get_batch(128, "fisher_train", train=True,
                                  labels=True, epoch=0, group_runs=G,
                                  _skip_speech=True):
            n_batches += 1
            n_utts += batch["n_real"]
        dt = time.perf_counter() - t0
        print(f"epoch metadata stream G={G}: {dt:.1f}s for "
              f"{n_batches} batches / {n_utts} utts "
              f"({n_utts / dt:,.0f} utts/s host-side)")

    # feature-pack index at scale: 140k entries
    from ast_tpu.data.feature_pack import FeaturePack, write_pack
    pack = os.path.join(root, "train.pack")
    t0 = time.perf_counter()
    write_pack(pack, ((f"fisher_train_u{i:06d}",
                       np.zeros((4, 13), np.float16))
                      for i in range(n_train)), dtype=np.float16)
    t_write = time.perf_counter() - t0
    t0 = time.perf_counter()
    p = FeaturePack(pack)
    t_open = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(0, n_train, 997):
        p.get(f"fisher_train_u{i:06d}")
    t_read = time.perf_counter() - t0
    print(f"feature pack: write {n_train} entries {t_write:.1f}s, "
          f"open (index load) {t_open:.2f}s, "
          f"{n_train // 997} strided reads {t_read:.2f}s")

    import shutil
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
