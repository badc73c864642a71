"""Legacy-path capabilities carried forward: per-bucket batch sizes,
curriculum ordering, text-encoder mode, weight noise schedule."""

import os
import pickle

import jax
import numpy as np
import pytest

from ast_tpu.data.dataloader import FisherDataLoader
from ast_tpu.models import seq2seq
from ast_tpu.symbols import SYMBOLS


@pytest.fixture
def text_loader(tmp_path):
    """Synthetic text-to-text corpus (enc_key = es_w, dec_key = en_w)."""
    rng = np.random.RandomState(0)
    es = [f"s{i}".encode() for i in range(6)]
    en = [f"w{i}".encode() for i in range(6)]
    specials = list(SYMBOLS.START_VOCAB)

    def mkvocab(words):
        w2i = {w: i for i, w in enumerate(specials + words)}
        return {"w2i": w2i, "i2w": {i: w for w, i in w2i.items()},
                "freq": {}}

    vocab = {"es_w": mkvocab(es), "en_w": mkvocab(en)}
    map_dict, info = {"train": {}}, {"train": {}}
    for i in range(10):
        utt = f"u{i}"
        n_src = int(rng.randint(3, 20))
        n_tgt = int(rng.randint(2, 8))
        map_dict["train"][utt] = {
            "es_w": [es[rng.randint(6)] for _ in range(n_src)],
            "en_w": [en[rng.randint(6)] for _ in range(n_tgt)],
        }
        info["train"][utt] = {"es_w": n_src, "en_w": n_tgt, "sp": 0}

    data = tmp_path / "data"
    data.mkdir()
    for name, obj in [("v", vocab), ("m", map_dict), ("i", info)]:
        with open(data / name, "wb") as f:
            pickle.dump(obj, f)
    model_dir = tmp_path / "model"
    model_dir.mkdir()

    cfg = {
        "enc_key": "es_w", "dec_key": "en_w",
        "speech_path": str(data),
        "map_path": str(data / "m"), "vocab_path": str(data / "v"),
        "info_path": str(data / "i"),
        "max_pred": 12, "buckets_num": 3, "buckets_width": 8,
        "train_scale": 1, "zero_input": 0, "n_evals": 1,
        "target_pad_multiple": 4,
    }
    return FisherDataLoader(cfg, str(model_dir), seed="s")


def test_text_mode_batches(text_loader):
    batches = list(text_loader.get_batch(4, "train", train=True, labels=True))
    assert sum(b["n_real"] for b in batches) == 10
    b0 = batches[0]
    assert b0["X"].dtype == np.int32
    assert b0["X"].ndim == 2  # (B, T) token ids
    assert b0["y"][0, 0] == SYMBOLS.GO_ID
    # bucketed on source token count
    assert os.path.exists(
        os.path.join(text_loader.model_dir, "buckets_es_w.dict"))


def test_text_mode_model_forward(text_loader):
    mcfg = {
        "dropout": {"embed": 0, "rnn": 0, "out": 0},
        "rnn_config": {
            "bi_rnn": True, "enc_layers": 2, "dec_layers": 2,
            "hidden_units": 16, "embedding_units": 8, "attn_units": 16,
            "n_attn": 1, "feed_attn": True, "ln": False,
            "dec_vocab_size": 10, "enc_vocab_size": 10,
        },
        "cnn_config": {
            "bn": True,
            "cnn_layers": [
                {"in_channels": None, "out_channels": 8, "ksize": [3, 8],
                 "stride": [1, 8], "pad": [1, 0]},
            ],
        },
    }
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    assert "embed" in params["enc"]
    X = np.zeros((2, 16), dtype=np.int32)
    X[:, :5] = 4
    y = np.full((2, 6), SYMBOLS.PAD_ID, dtype=np.int32)
    y[:, 0] = SYMBOLS.GO_ID
    y[:, 1] = 5
    y[:, 2] = SYMBOLS.EOS_ID
    loss, _ = seq2seq.forward_loss(
        params, state, mcfg, jax.numpy.asarray(X), jax.numpy.asarray(y),
        jax.random.PRNGKey(0), train=True)
    assert np.isfinite(float(loss))


def test_per_bucket_batch_sizes(text_loader):
    sizes = {"max": 6, "med": 4, "min": 2}
    seen = {}
    for b in text_loader.get_batch(sizes, "train", train=True, labels=False):
        seen.setdefault(b["bucket"], set()).add(b["X"].shape[0])
    num_b = 3
    for bucket, s in seen.items():
        if bucket < num_b // 3:
            assert s == {6}
        elif bucket < (num_b * 2) // 3:
            assert s == {4}
        else:
            assert s == {2}


def test_curriculum_orders_buckets(text_loader):
    order = [b["bucket"]
             for b in text_loader.get_batch(4, "train", train=True,
                                            labels=False, curriculum=True)]
    assert order == sorted(order)  # short buckets first, stable
