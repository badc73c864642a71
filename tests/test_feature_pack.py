"""Packed feature store: roundtrip, f16 storage, CLI, and transparent
Fisher-dataloader pickup (batches identical to the per-.npy path)."""

import os

import numpy as np
import pytest

from ast_tpu.data.feature_pack import FeaturePack, pack_features, write_pack


def _mats(n, seed=0):
    rng = np.random.RandomState(seed)
    return [(f"utt{i:03d}", rng.randn(int(rng.randint(5, 40)), 13)
             .astype(np.float32)) for i in range(n)]


def test_roundtrip(tmp_path):
    items = _mats(7)
    path = str(tmp_path / "feats.pack")
    assert write_pack(path, items) == 7
    pack = FeaturePack(path)
    assert len(pack) == 7
    for utt, mat in items:
        assert utt in pack
        got = pack.get(utt)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, mat)
        np.testing.assert_array_equal(pack.get(utt, max_rows=3), mat[:3])
    assert "nope" not in pack


def test_f16_storage_halves_and_stays_close(tmp_path):
    items = _mats(5, seed=1)
    p32 = str(tmp_path / "f32.pack")
    p16 = str(tmp_path / "f16.pack")
    write_pack(p32, items)
    write_pack(p16, items, dtype=np.float16)
    assert os.path.getsize(p16) < 0.6 * os.path.getsize(p32)
    pack = FeaturePack(p16)
    for utt, mat in items:
        np.testing.assert_allclose(pack.get(utt), mat,
                                   rtol=1e-2, atol=1e-2)


def test_rejects_non_pack(tmp_path):
    path = str(tmp_path / "junk")
    with open(path, "wb") as f:
        f.write(b"not a pack at all")
    with pytest.raises(ValueError):
        FeaturePack(path)


def test_pack_features_walks_subdirs(tmp_path):
    src = tmp_path / "speech"
    (src / "sub").mkdir(parents=True)
    a = np.random.RandomState(0).randn(8, 13).astype(np.float32)
    b = np.random.RandomState(1).randn(5, 13).astype(np.float32)
    np.save(str(src / "top.npy"), a)
    np.save(str(src / "sub" / "nested.npy"), b)
    out = str(tmp_path / "all.pack")
    assert pack_features(src, out) == 2
    pack = FeaturePack(out)
    np.testing.assert_array_equal(pack.get("top"), a)
    np.testing.assert_array_equal(pack.get("nested"), b)


def test_dataloader_picks_up_pack(tmp_path):
    from ast_tpu.cli import prep_data
    from ast_tpu.config import Config
    from ast_tpu.data.dataloader import FisherDataLoader
    from tests.conftest import make_tiny_experiment

    exp = make_tiny_experiment(str(tmp_path), n_train=10, n_dev=4,
                               batch_size=4)
    cfg = Config(exp)
    data_cfg = cfg.train["data"]
    speech = data_cfg["speech_path"]

    loader_npy = FisherDataLoader(data_cfg, exp, seed="s")
    batches_npy = list(loader_npy.get_batch(4, "tiny_train", train=False,
                                            labels=True, epoch=0))

    # pack the train split through the CLI; dev stays per-.npy
    prep_data.main(["pack-features",
                    os.path.join(speech, "tiny_train"),
                    os.path.join(speech, "tiny_train.pack")])

    loader_pack = FisherDataLoader(data_cfg, exp, seed="s")
    assert loader_pack._pack_for("tiny_train") is not None
    assert loader_pack._pack_for("tiny_dev") is None
    batches_pack = list(loader_pack.get_batch(4, "tiny_train",
                                              train=False, labels=True,
                                              epoch=0))
    assert len(batches_pack) == len(batches_npy)
    for b1, b2 in zip(batches_npy, batches_pack):
        assert b1["utts"] == b2["utts"]
        np.testing.assert_array_equal(b1["X"], b2["X"])
        np.testing.assert_array_equal(b1["y"], b2["y"])
