"""One-command Fisher recipe: a synthetic raw LDC-style tree (shorten
SPHERE tapes + Kaldi segments + transcripts) -> runnable experiment ->
one train epoch -> beam decode, with zero external tools.

Mirrors the reference's chained shell pipeline
(linking_files/fisher/kaldi/train_all.sh:32-60)."""

import json
import os
import pickle

import numpy as np
import pytest

from ast_tpu.data import shorten as sh
from tests.conftest import TINY_MODEL_CFG

pytestmark = pytest.mark.slow


def _speechlike(n, seed, scale=6000.0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    x = (scale * np.sin(t / 23.0) * (0.5 + 0.5 * np.sin(t / 311.0) ** 2)
         + rng.randn(n) * scale * 0.05)
    return np.round(x).astype(np.int64)


def _write_shorten_sph(path, pcm2):
    """2-channel mu-law embedded-shorten-v2 SPHERE from int PCM."""
    codes = np.stack(
        [sh._nearest_code(pcm2[:, c], sh._ULAW_EXPAND) for c in (0, 1)],
        axis=1)
    internal = sh._SIGNMAG_IN[codes]
    data = sh.encode(internal, sh.TYPE_AU1, nmean=4)
    body = "".join(f"{k} {t} {v}\n" for k, (t, v) in {
        "channel_count": ("-i", 2),
        "sample_count": ("-i", len(pcm2)),
        "sample_rate": ("-i", 8000),
        "sample_n_bytes": ("-i", 1),
        "sample_coding": ("-s26", "ulaw,embedded-shorten-v2"),
    }.items())
    hdr = ("NIST_1A\n   1024\n" + body + "end_head\n").encode().ljust(
        1024, b" ")
    with open(path, "wb") as f:
        f.write(hdr + data)


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    """Synthetic raw corpus: 2 conversations (2-ch shorten tapes), a
    segments table slicing ~1 s utterances, per-set transcripts."""
    root = tmp_path_factory.mktemp("raw")
    audio = root / "audio"
    text = root / "text"
    audio.mkdir()
    text.mkdir()
    rate = 8000
    rng = np.random.RandomState(3)
    words = [f"w{i}" for i in range(10)]

    seg_lines, utts = [], {}
    for ci, conv in enumerate(["conv_a", "conv_b"]):
        n = rate * 12
        pcm = np.stack([_speechlike(n, 10 + ci),
                        _speechlike(n, 20 + ci, scale=3000.0)], axis=1)
        _write_shorten_sph(str(audio / f"{conv}.sph"), pcm)
        t = 0.25
        for k in range(8):
            dur = 0.8 + 0.1 * (k % 3)
            utt = f"{conv}_{k:03d}"
            seg_lines.append(f"{utt} {conv} {t:.2f} {t + dur:.2f}")
            utts[utt] = " ".join(
                words[rng.randint(10)] for _ in range(rng.randint(2, 6)))
            t += dur + 0.2
    (root / "segments").write_text("\n".join(seg_lines) + "\n")
    (root / "channel_map").write_text("conv_a 0\nconv_b 1\n")

    all_utts = sorted(utts)
    splits = {"train": all_utts[:12], "dev": all_utts[12:]}
    for c, lst in splits.items():
        (text / f"{c}.ids").write_text("\n".join(lst) + "\n")
        (text / f"{c}.clean.text").write_text(
            "\n".join(utts[u] for u in lst) + "\n")
    return root


@pytest.fixture(scope="module")
def recipe_exp(raw_tree, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp_out"))
    mc = os.path.join(out, "tiny_model.json")
    with open(mc, "w") as f:
        json.dump(TINY_MODEL_CFG, f)
    import ast_tpu.cli.prep_data as prep
    prep.main([
        "fisher-recipe",
        "--audio_dir", str(raw_tree / "audio"),
        "--segments", str(raw_tree / "segments"),
        "--text_dir", str(raw_tree / "text"),
        "--out", out,
        "--channel-map", str(raw_tree / "channel_map"),
        "--merges", "30", "--buckets_num", "4", "--buckets_width", "50",
        "--batch_size", "4", "--model_cfg", mc,
    ])
    return os.path.join(out, "exp")


def test_recipe_builds_complete_experiment(recipe_exp):
    out = os.path.dirname(recipe_exp)
    cfg = json.load(open(os.path.join(recipe_exp, "train_cfg.json")))
    assert cfg["train_set"] == "train" and cfg["dev_set"] == "dev"
    # features exist, CMVN'd, 13-dim, frame counts match info
    info = pickle.load(open(cfg["data"]["info_path"], "rb"))
    for c in ("train", "dev"):
        for u, entry in info[c].items():
            feats = np.load(os.path.join(out, "speech", c, f"{u}.npy"))
            assert feats.shape == (entry["sp"], 13)
    # a whole split is roughly normalized (per-speaker CMVN)
    train_feats = np.concatenate([
        np.load(os.path.join(out, "speech", "train", f"{u}.npy"))
        for u in info["train"]])
    assert abs(float(train_feats.mean())) < 0.2
    assert 0.5 < float(train_feats.std()) < 2.0
    # refs
    refs = cfg["data"]["refs_path"]
    for c in ("train", "dev"):
        assert os.path.exists(os.path.join(refs, c, "eval.ids"))
        assert os.path.exists(os.path.join(refs, c, "ref.en0"))


def test_recipe_experiment_trains_and_decodes(recipe_exp):
    import ast_tpu.cli.beam as beam_cli
    import ast_tpu.cli.train as train_cli
    train_cli.main(["-m", recipe_exp, "-e", "1"])
    assert os.path.exists(os.path.join(recipe_exp,
                                       "seq2seq_1.model.npz"))
    lines = open(os.path.join(recipe_exp, "train.log")).read().split()
    assert len(lines) >= 1
    bleu = beam_cli.main(["-m", recipe_exp, "-n", "2", "-k", "2",
                          "-s", "dev", "-w", "0.6"])
    assert bleu >= 0
    assert os.path.exists(
        os.path.join(recipe_exp, "dev_beam_N-2_K-2_W-0.60.en"))


@pytest.fixture(scope="module")
def recipe_exp_wav(raw_tree, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exp_out_wav"))
    mc = os.path.join(out, "tiny_model.json")
    with open(mc, "w") as f:
        json.dump(TINY_MODEL_CFG, f)
    import ast_tpu.cli.prep_data as prep
    prep.main([
        "fisher-recipe", "--wav",
        "--audio_dir", str(raw_tree / "audio"),
        "--segments", str(raw_tree / "segments"),
        "--text_dir", str(raw_tree / "text"),
        "--out", out,
        "--channel-map", str(raw_tree / "channel_map"),
        "--merges", "30", "--buckets_num", "4", "--buckets_width", "50",
        "--batch_size", "4", "--model_cfg", mc,
    ])
    return os.path.join(out, "exp")


def test_recipe_wav_mode_trains(recipe_exp_wav):
    """--wav: raw audio + cmvn.stats ship; MFCC runs inside the jitted
    step; the experiment trains and greedy-decodes end to end."""
    out = os.path.dirname(recipe_exp_wav)
    cfg = json.load(open(os.path.join(recipe_exp_wav,
                                      "train_cfg.json")))
    assert cfg["data"]["features"] == "wav"
    # audio (1-D) not features (2-D) on disk, stats pickle present
    u = sorted(os.listdir(os.path.join(out, "speech", "train")))[0]
    x = np.load(os.path.join(out, "speech", "train", u))
    assert x.ndim == 1
    assert os.path.exists(os.path.join(out, "speech", "cmvn.stats"))
    stats = pickle.load(open(os.path.join(out, "speech", "cmvn.stats"),
                             "rb"))
    assert stats["stats"] and stats["utt2spk"]

    import ast_tpu.cli.train as train_cli
    from ast_tpu.train.trainer import NN
    train_cli.main(["-m", recipe_exp_wav, "-e", "1"])
    assert os.path.exists(os.path.join(recipe_exp_wav,
                                       "seq2seq_1.model.npz"))
    nn = NN(recipe_exp_wav)
    preds = nn.predict("dev")
    assert len(preds) == nn.data_loader.n_utts["dev"]
