"""LayerNorm option and limited-vocab mode."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ast_tpu.data.dataloader import FisherDataLoader
from ast_tpu.models import seq2seq
from ast_tpu.symbols import SYMBOLS
from tests.conftest import TINY_MODEL_CFG

V = 12


def test_ln_params_and_forward():
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=V, ln=True)
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    assert "ln" in params["enc"] and len(params["enc"]["ln"]) == 2
    assert "ln" in params["dec"]
    X = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 13))
    y = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 4, V)
    y = y.astype(jnp.int32).at[:, 0].set(SYMBOLS.GO_ID)
    loss, _ = seq2seq.forward_loss(params, state, mcfg, X, y,
                                   jax.random.PRNGKey(3), train=True)
    assert np.isfinite(float(loss))
    # LN params receive gradient
    g = jax.grad(lambda p: seq2seq.forward_loss(
        p, state, mcfg, X, y, jax.random.PRNGKey(3), train=False)[0])(params)
    assert np.any(np.asarray(g["enc"]["ln"][0]["g"]) != 0)
    assert np.any(np.asarray(g["dec"]["ln"][0]["g"]) != 0)


@pytest.fixture
def limited_loader(tmp_path):
    words = [f"w{i}".encode() for i in range(4)]
    flat_w2i = {w: i for i, w in enumerate(
        SYMBOLS.START_VOCAB + words[:2])}  # limited: only w0, w1 known
    vocab = {"w2i": flat_w2i,
             "i2w": {i: w for w, i in flat_w2i.items()}}
    map_dict = {"train": {
        "u0": {"en_w": [b"w0", b"w3", b"w1"]},   # w3 is OOV -> dropped
        "u1": {"en_w": [b"w2", b"w3"]},          # all OOV -> empty
    }}
    info = {"train": {"u0": {"sp": 10, "en_w": 3},
                      "u1": {"sp": 10, "en_w": 2}}}
    data = tmp_path / "d"
    data.mkdir()
    for name, obj in [("v", vocab), ("m", map_dict), ("i", info)]:
        with open(data / name, "wb") as f:
            pickle.dump(obj, f)
    md = tmp_path / "model"
    md.mkdir()
    cfg = {
        "enc_key": "sp", "dec_key": "en_w",
        "speech_path": str(data), "map_path": str(data / "m"),
        "vocab_path": str(data / "v"), "info_path": str(data / "i"),
        "max_pred": 8, "buckets_num": 2, "buckets_width": 20,
        "train_scale": 1, "zero_input": 0, "n_evals": 1,
        "limit_vocab": True, "add_unk": True,
        "target_pad_multiple": 4,
    }
    dl = FisherDataLoader(cfg, str(md), seed="s")

    # synth speech
    import os
    os.makedirs(data / "train", exist_ok=True)
    for u in ["u0", "u1"]:
        np.save(data / "train" / f"{u}.npy",
                np.zeros((10, 13), np.float32))
    return dl


def test_limit_vocab_drops_oov(limited_loader):
    batches = {u: None for u in ["u0", "u1"]}
    for b in limited_loader.get_batch(2, "train", train=False, labels=True):
        for j, u in enumerate(b["utts"]):
            batches[u] = b["y"][j]
    w0 = limited_loader.vocab["w2i"][b"w0"]
    w1 = limited_loader.vocab["w2i"][b"w1"]
    y0 = [int(v) for v in batches["u0"] if v != SYMBOLS.PAD_ID]
    assert y0 == [SYMBOLS.GO_ID, w0, w1, SYMBOLS.EOS_ID]  # w3 dropped
    y1 = [int(v) for v in batches["u1"] if v != SYMBOLS.PAD_ID]
    assert y1 == [SYMBOLS.GO_ID, SYMBOLS.UNK_ID, SYMBOLS.EOS_ID]  # add_unk


def test_limit_vocab_hyps(limited_loader):
    hyps = limited_loader.get_hyps([("u0", [1, 4, 5, 2])])
    assert hyps["u0"] == ["w0", "w1"]


def test_add_unk_empty_target_fits_static_len(tmp_path):
    """An empty (or all-OOV) target under limit_vocab+add_unk becomes
    [GO, UNK, EOS] at assembly; the per-bucket static U must cover that
    even with target_pad_multiple=1 (the raw token count is 0)."""
    flat_w2i = {w: i for i, w in enumerate(SYMBOLS.START_VOCAB)}
    vocab = {"w2i": flat_w2i,
             "i2w": {i: w for w, i in flat_w2i.items()}}
    map_dict = {"train": {"u0": {"en_w": []}}}     # empty target
    info = {"train": {"u0": {"sp": 10, "en_w": 0}}}
    data = tmp_path / "d"
    data.mkdir()
    for name, obj in [("v", vocab), ("m", map_dict), ("i", info)]:
        with open(data / name, "wb") as f:
            pickle.dump(obj, f)
    md = tmp_path / "model"
    md.mkdir()
    cfg = {
        "enc_key": "sp", "dec_key": "en_w",
        "speech_path": str(data), "map_path": str(data / "m"),
        "vocab_path": str(data / "v"), "info_path": str(data / "i"),
        "max_pred": 8, "buckets_num": 2, "buckets_width": 20,
        "train_scale": 1, "zero_input": 0, "n_evals": 1,
        "limit_vocab": True, "add_unk": True,
        "target_pad_multiple": 1,
    }
    dl = FisherDataLoader(cfg, str(md), seed="s")
    import os
    os.makedirs(data / "train", exist_ok=True)
    np.save(data / "train" / "u0.npy", np.zeros((10, 13), np.float32))

    got = None
    for b in dl.get_batch(1, "train", train=False, labels=True):
        got = [int(v) for v in b["y"][0] if v != SYMBOLS.PAD_ID]
    assert got == [SYMBOLS.GO_ID, SYMBOLS.UNK_ID, SYMBOLS.EOS_ID]
