"""On-device feature pipeline: raw audio -> MFCC+CMVN fused in the step."""

import json
import os
import pickle

import numpy as np
import pytest

from ast_tpu.data.wav_loader import (
    WavDataLoader, read_wav, samples_for_frames,
)
from ast_tpu.ops.fbank import MfccConfig
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG


@pytest.fixture
def wav_exp(tmp_path):
    """Tiny experiment whose speech is raw 8 kHz audio."""
    rng = np.random.RandomState(0)
    cfg = MfccConfig()
    exp = tmp_path / "exp"
    data = tmp_path / "data"
    speech = tmp_path / "speech"
    exp.mkdir()
    data.mkdir()

    words = [f"w{i}".encode() for i in range(6)]
    w2i = {w: i for i, w in enumerate(SYMBOLS.START_VOCAB + words)}
    vocab = {"en_w": {"w2i": w2i,
                      "i2w": {i: w for w, i in w2i.items()}, "freq": {}}}

    map_dict, info = {}, {}
    utt2spk, stats = {}, {}
    for set_key, n in [("wav_train", 6), ("wav_dev", 3)]:
        map_dict[set_key] = {}
        info[set_key] = {}
        os.makedirs(speech / set_key, exist_ok=True)
        for i in range(n):
            utt = f"{set_key}_u{i}"
            spk = f"spk{i % 2}"
            n_fr = int(rng.randint(20, 90))
            S = samples_for_frames(cfg, n_fr)
            audio = rng.randn(S).astype(np.float32) * 0.1
            np.save(speech / set_key / f"{utt}.npy", audio)
            toks = [words[rng.randint(6)] for _ in range(rng.randint(2, 5))]
            map_dict[set_key][utt] = {"en_w": toks}
            info[set_key][utt] = {"sp": n_fr, "en_w": len(toks)}
            utt2spk[utt] = spk
    for spk in ["spk0", "spk1"]:
        stats[spk] = {"mean": rng.randn(13).astype(np.float32) * 0.1,
                      "std": np.ones(13, np.float32)}
    with open(speech / "cmvn.stats", "wb") as f:
        pickle.dump({"utt2spk": utt2spk, "stats": stats}, f)

    for name, obj in [("v", vocab), ("m", map_dict), ("i", info)]:
        with open(data / name, "wb") as f:
            pickle.dump(obj, f)

    refs = data / "refs" / "wav_dev"
    os.makedirs(refs, exist_ok=True)
    dev = sorted(map_dict["wav_dev"])
    (refs / "eval.ids").write_text("\n".join(dev) + "\n")
    (refs / "ref.en0").write_text("\n".join(
        " ".join(w.decode() for w in map_dict["wav_dev"][u]["en_w"])
        for u in dev) + "\n")

    train_cfg = {
        "seed": "wav-seed", "iters_save": 5,
        "train_set": "wav_train", "dev_set": "wav_dev",
        "extras": {"random_out": 0, "speech_noise": 0, "teach_ratio": 1.0},
        "data": {
            "enc_key": "sp", "dec_key": "en_w",
            "features": "wav",
            "speech_path": str(speech),
            "map_path": str(data / "m"), "vocab_path": str(data / "v"),
            "info_path": str(data / "i"),
            "refs_path": str(data / "refs"),
            "max_pred": 10, "n_evals": 1,
            "buckets_num": 3, "buckets_width": 32,
            "train_scale": 1, "zero_input": 0,
            "target_pad_multiple": 4,
        },
        "optimizer": {"type": 0, "lr": 0.01, "l2": 0, "grad_clip": 2,
                      "grad_noise_eta": 0, "freeze": []},
        "batch_size": 3,
    }
    with open(exp / "model_cfg.json", "w") as f:
        json.dump(TINY_MODEL_CFG, f)
    with open(exp / "train_cfg.json", "w") as f:
        json.dump(train_cfg, f)
    return str(exp)


def test_wav_loader_batches(wav_exp):
    from ast_tpu.config import Config
    cfg = Config(wav_exp)
    dl = WavDataLoader(cfg.train["data"], wav_exp, seed="s")
    mfcc = MfccConfig()
    n = 0
    for b in dl.get_batch(3, "wav_train", train=True, labels=True):
        T = b["n_frames"]
        assert b["audio"].shape == (3, samples_for_frames(mfcc, T))
        assert b["cmvn_mean"].shape == (3, 13)
        assert b["y"][0, 0] == SYMBOLS.GO_ID
        assert "X" not in b
        n += b["n_real"]
    assert n == 6


def test_wav_train_end_to_end(wav_exp):
    """Full harness: on-device MFCC+CMVN fused into the train step."""
    from ast_tpu.train.trainer import NN
    nn = NN(wav_exp)
    assert nn.wav_mode
    loss1 = nn.train_epoch("wav_train", epoch=1)
    loss2 = nn.train_epoch("wav_train", epoch=2)
    assert np.isfinite(loss1) and np.isfinite(loss2)
    preds = nn.predict("wav_dev")
    assert len(preds) == 3
    hyps = nn.data_loader.get_hyps(preds)
    assert len(hyps) == 3


def test_read_wav_roundtrip(tmp_path):
    import wave
    path = str(tmp_path / "t.wav")
    x = (np.sin(np.linspace(0, 100, 800)) * 20000).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x.tobytes())
    y = read_wav(path)
    np.testing.assert_allclose(y, x.astype(np.float32) / 32768.0,
                               atol=1e-6)


def test_wav_beam_decode(wav_exp):
    """Beam decode with on-device featurization."""
    from ast_tpu.train.trainer import NN
    nn = NN(wav_exp)
    results = nn.decode_beam_set("wav_dev", N=2, K=2)
    assert len(results) == 3
    for utt, hyps in results.items():
        assert len(hyps) == 2
        ids, score = hyps[0]
        assert ids[0] == 1  # GO
        assert score <= 0
