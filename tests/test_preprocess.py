"""Corpus preparation pipeline: BPE + map/vocab/info/data + refs, and the
resulting artifacts actually drive a GlobalPhone-style dataloader."""

import os
import pickle

import numpy as np
import pytest

from ast_tpu.data.dataloader import GlobalPhoneDataLoader
from ast_tpu.data.preprocess import prepare_corpus
from ast_tpu.symbols import SYMBOLS


@pytest.fixture
def corpus(tmp_path):
    in_path = tmp_path / "in"
    rng = np.random.RandomState(0)
    sents = ["the cat sat", "the dog ran fast", "a cat ran",
             "the fast dog", "a dog sat", "the cat ran fast"]
    for c, n in [("train", 4), ("dev", 2)]:
        ids, lines = [], []
        os.makedirs(in_path / c, exist_ok=True)
        conv = {}
        for i in range(n):
            utt = f"{c}_u{i}"
            ids.append(utt)
            lines.append(sents[(i + (0 if c == "train" else 4)) % len(sents)])
            conv[utt] = rng.randn(rng.randint(20, 60), 13).astype(np.float32)
        (in_path / f"{c}.ids").write_text("\n".join(ids) + "\n")
        (in_path / f"{c}.clean.text").write_text("\n".join(lines) + "\n")
        with open(in_path / c / "conv0.np", "wb") as f:
            pickle.dump(conv, f)
    return str(in_path), str(tmp_path / "out")


def test_prepare_corpus_artifacts(corpus):
    in_path, out_path = corpus
    paths = prepare_corpus(in_path, out_path, bpe_merges=20,
                           sets=("train", "dev"))
    for p in paths.values():
        assert os.path.exists(p)

    vocab = pickle.load(open(paths["vocab"], "rb"))
    assert vocab["bpe_w"]["w2i"][SYMBOLS.PAD] == 0
    map_dict = pickle.load(open(paths["map"], "rb"))
    assert "train_u0" in map_dict["train"]
    assert isinstance(map_dict["train"]["train_u0"]["bpe_w"][0], bytes)
    info = pickle.load(open(paths["info"], "rb"))
    assert info["train"]["train_u0"]["sp"] > 0
    # refs protocol files
    assert os.path.exists(os.path.join(out_path, "refs", "dev", "eval.ids"))
    assert os.path.exists(os.path.join(out_path, "refs", "dev", "ref.en0"))
    assert os.path.exists(os.path.join(out_path, "dev.clean.wer"))


def test_artifacts_drive_dataloader(corpus, tmp_path):
    in_path, out_path = corpus
    paths = prepare_corpus(in_path, out_path, bpe_merges=20,
                           sets=("train", "dev"))
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir, exist_ok=True)
    data_cfg = {
        "enc_key": "sp", "dec_key": "bpe_w",
        "speech_path": paths["data"],
        "map_path": paths["map"],
        "vocab_path": paths["vocab"],
        "info_path": paths["info"],
        "max_pred": 16, "buckets_num": 3, "buckets_width": 30,
        "train_scale": 1, "zero_input": 0, "n_evals": 1,
        "target_pad_multiple": 8,
    }
    dl = GlobalPhoneDataLoader(data_cfg, model_dir, seed="s")
    batches = list(dl.get_batch(2, "train", train=True, labels=True))
    assert sum(b["n_real"] for b in batches) == 4
    b0 = batches[0]
    assert b0["X"].shape[2] == 13
    assert b0["y"][0, 0] == SYMBOLS.GO_ID
    # detok roundtrip through BPE merge markers
    utt = b0["utts"][0]
    y_ids = [int(v) for v in b0["y"][0] if v >= SYMBOLS.N_SPECIAL]
    hyps = dl.get_hyps([(utt, y_ids)])
    map_dict = pickle.load(open(paths["map"], "rb"))
    set_key = "train"
    raw = [w.decode() for w in map_dict[set_key][utt]["en_w"]]
    assert hyps[utt] == raw


def test_prepare_corpus_rejects_skewed_ids(corpus):
    """<set>.ids and <set>.clean.text must pair line-for-line: a skew
    would silently train every later utterance on another utterance's
    transcript, so it is an error at corpus-build time."""
    in_path, out_path = corpus
    with open(os.path.join(in_path, "train.ids"), "a") as f:
        f.write("train_extra\n")
    with pytest.raises(ValueError, match="line-for-line"):
        prepare_corpus(in_path, out_path, bpe_merges=20,
                       sets=("train", "dev"))


def test_create_new_vocab_special_collision():
    """A corpus token equal to a special symbol must not steal its id
    (PAD/GO/EOS/UNK = 0..3 contract) or duplicate ids."""
    from collections import Counter

    from ast_tpu.data.preprocess import create_new_vocab

    vocab = create_new_vocab(Counter({"_UNK": 7, "cat": 3, "dog": 3}))
    w2i = vocab["w2i"]
    assert w2i[SYMBOLS.UNK] == 3                  # contract intact
    assert len(set(w2i.values())) == len(w2i)     # ids unique
    assert len(vocab["i2w"]) == len(w2i)
    # ties break by token (build_vocab order): b'cat' before b'dog'
    assert w2i[b"cat"] < w2i[b"dog"]
