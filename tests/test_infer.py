"""File-level inference CLI (ast_tpu/cli/infer.py).

Pins: greedy output over loose .npy feature files equals the direct
predict_greedy call at identical padding; wav audio goes through the
MFCC+CMVN front-end and beam decode end to end; input order and
duplicate basenames are preserved in the output file.
"""

import os
import wave

import numpy as np

import jax

from conftest import make_tiny_experiment

from ast_tpu.cli import infer
from ast_tpu.models import seq2seq
from ast_tpu.train.trainer import NN


def _write_wav(path, x, rate=8000):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(x, -1, 1) * 32767).astype("<i2").tobytes())


def test_infer_features_matches_direct_greedy(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    speech = os.path.join(str(tmp_path), "speech", "tiny_dev")
    files = sorted(os.listdir(speech))[:3]
    paths = [os.path.join(speech, f) for f in files]

    out = infer.main(["-m", exp, "-o", str(tmp_path / "hyps.txt")] + paths)
    assert list(out) == [os.path.splitext(f)[0] for f in files]

    # direct decode at the CLI's padding contract (width 50 buckets)
    nn = NN(exp)
    feats = [np.load(p) for p in paths]
    for utt, x in zip(out, feats):
        T = max(50, -(-x.shape[0] // 50) * 50)
        X = np.zeros((1, T, 13), np.float32)
        X[0, : x.shape[0]] = x
        p, _ = jax.jit(
            lambda X, T=T: seq2seq.predict_greedy(
                nn.params, nn.state, nn.mcfg, X, 16, nn.compute_dtype)
        )(X)
        ref = nn.data_loader.get_hyps([(utt, np.asarray(p)[0].tolist())])
        assert out[utt] == " ".join(ref[utt])

    with open(tmp_path / "hyps.txt") as f:
        lines = f.read().splitlines()
    assert [ln.split("\t")[0] for ln in lines] == list(out)


def test_infer_wav_beam_and_duplicates(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    rng = np.random.RandomState(0)
    a = tmp_path / "a"
    b = tmp_path / "b"
    os.makedirs(a)
    os.makedirs(b)
    # ~1 s of 8 kHz noise -> ~98 MFCC frames
    _write_wav(str(a / "utt.wav"), rng.randn(8000) * 0.1)
    _write_wav(str(b / "utt.wav"), rng.randn(8000) * 0.1)

    out = infer.main(["-m", exp, "--beam", "2,2", "-w", "0.6",
                      str(a / "utt.wav"), str(b / "utt.wav")])
    assert list(out) == ["utt", "utt#1"]     # dedup, input order
    assert all(isinstance(v, str) for v in out.values())


def test_infer_truncates_to_training_cap_and_dict_batch(tmp_path):
    # (a) inputs beyond max_sp=(buckets_num+1)*width frames decode the
    # training-cap prefix instead of compiling an unbounded one-off
    # shape the model never saw; (b) legacy per-bucket dict batch_size
    # configs work without --batch
    exp = make_tiny_experiment(str(tmp_path))
    import json
    cfg_file = os.path.join(exp, "train_cfg.json")
    with open(cfg_file) as f:
        cfg = json.load(f)
    cfg["batch_size"] = {"max": 4, "med": 2, "min": 2}
    with open(cfg_file, "w") as f:
        json.dump(cfg, f)

    long_feats = np.random.RandomState(0).randn(400, 13).astype(np.float32)
    np.save(tmp_path / "long.npy", long_feats)
    out = infer.main(["-m", exp, str(tmp_path / "long.npy")])

    # max_sp = (4+1)*50 = 250: equals decoding the truncated prefix
    nn = NN(exp)
    X = long_feats[None, :250]
    p, _ = jax.jit(lambda X: seq2seq.predict_greedy(
        nn.params, nn.state, nn.mcfg, X, 16, nn.compute_dtype))(X)
    ref = nn.data_loader.get_hyps([("long", np.asarray(p)[0].tolist())])
    assert out["long"] == " ".join(ref["long"])


def test_infer_rejects_wrong_sample_rate(tmp_path):
    exp = make_tiny_experiment(str(tmp_path))
    _write_wav(str(tmp_path / "x.wav"), np.zeros(16000), rate=16000)
    try:
        infer.main(["-m", exp, str(tmp_path / "x.wav")])
    except ValueError as e:
        assert "sample rate" in str(e)
    else:
        raise AssertionError("16 kHz wav should have been rejected")
