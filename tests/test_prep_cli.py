"""Data-prep CLI subcommands end to end on a tiny synthetic corpus."""

import os
import pickle

import numpy as np
import pytest

from ast_tpu.cli import prep_data


def _write_text_ark(path, items):
    with open(path, "w") as f:
        for utt, mat in items:
            f.write(f"{utt}  [\n")
            for i, row in enumerate(mat):
                tail = " ]" if i == len(mat) - 1 else ""
                f.write("  " + " ".join(f"{v:.6g}" for v in row) + tail + "\n")


def test_ark_to_conv_and_merge(tmp_path):
    rng = np.random.RandomState(0)
    items = [
        ("convA-1-1", rng.randn(4, 13).astype(np.float32)),
        ("convA-1-2", rng.randn(3, 13).astype(np.float32)),
        ("convB-2-1", rng.randn(5, 13).astype(np.float32)),
    ]
    ark = str(tmp_path / "feats.ark")
    _write_text_ark(ark, items)
    conv_dir = str(tmp_path / "convs")
    prep_data.main(["ark-to-conv", ark, conv_dir])
    assert os.path.exists(os.path.join(conv_dir, "convA.np"))

    seg_map = {"utt1": {"seg": ["convA-1-1", "convA-1-2"]},
               "utt2": {"seg": ["convB-2-1"]}}
    map_path = str(tmp_path / "seg.map")
    with open(map_path, "wb") as f:
        pickle.dump(seg_map, f)
    out_dir = str(tmp_path / "utts")
    prep_data.main(["merge-segments", "--map", map_path,
                    "--conv_dir", conv_dir, "--out_dir", out_dir])
    u1 = np.load(os.path.join(out_dir, "utt1.npy"))
    assert u1.shape == (7, 13)
    np.testing.assert_allclose(
        u1, np.concatenate([items[0][1], items[1][1]]), rtol=1e-4)


def test_mfcc_and_cmvn(tmp_path):
    rng = np.random.RandomState(0)
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    for i in range(3):
        np.save(audio_dir / f"u{i}.npy",
                rng.randn(4000).astype(np.float32))
    feat_dir = str(tmp_path / "feats")
    prep_data.main(["mfcc", str(audio_dir), feat_dir])
    f0 = np.load(os.path.join(feat_dir, "u0.npy"))
    assert f0.shape[1] == 13 and f0.shape[0] > 0

    utt2spk = tmp_path / "utt2spk"
    utt2spk.write_text("u0 s0\nu1 s0\nu2 s1\n")
    prep_data.main(["cmvn", "--feat_dir", feat_dir,
                    "--utt2spk", str(utt2spk)])
    with open(os.path.join(feat_dir, "cmvn.stats"), "rb") as f:
        blob = pickle.load(f)
    assert set(blob["stats"].keys()) == {"s0", "s1"}
    assert blob["stats"]["s0"]["mean"].shape == (13,)


def test_learn_bpe_cli(tmp_path):
    text = tmp_path / "train.txt"
    text.write_text("low lower lowest\nnew newer newest\n" * 5)
    out = str(tmp_path / "codes")
    prep_data.main(["learn-bpe", str(text), out, "--merges", "20"])
    from ast_tpu.data.bpe import load_merges
    assert len(load_merges(out)) > 0
