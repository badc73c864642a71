"""Dataloader: static shapes, padding policy, target construction, detok."""

import numpy as np

from ast_tpu.config import Config
from ast_tpu.data.dataloader import FisherDataLoader
from ast_tpu.symbols import SYMBOLS


def _loader(tiny_exp):
    cfg = Config(tiny_exp)
    return cfg, FisherDataLoader(cfg.train["data"], tiny_exp, seed="s")


def test_batch_shapes_static_per_bucket(tiny_exp):
    cfg, dl = _loader(tiny_exp)
    shapes = {}
    n_seen = 0
    for batch in dl.get_batch(4, "tiny_train", train=True, labels=True):
        b = batch["bucket"]
        shape = (batch["X"].shape, batch["y"].shape)
        assert batch["X"].shape[0] == 4  # batch axis padded
        if b in shapes:
            assert shapes[b] == shape
        shapes[b] = shape
        n_seen += batch["n_real"]
        # bucket width policy: T = (b+1)*width (last bucket: max_sp)
        width = cfg.train["data"]["buckets_width"]
        num_b = cfg.train["data"]["buckets_num"]
        expect_T = (num_b + 1) * width if b == num_b - 1 else (b + 1) * width
        assert batch["X"].shape[1] == expect_T
    assert n_seen == dl.n_utts["tiny_train"]


def test_targets_have_go_eos_pad(tiny_exp):
    cfg, dl = _loader(tiny_exp)
    for batch in dl.get_batch(4, "tiny_train", train=False, labels=True):
        y = batch["y"]
        for j in range(batch["n_real"]):
            row = y[j]
            assert row[0] == SYMBOLS.GO_ID
            eos_pos = np.where(row == SYMBOLS.EOS_ID)[0]
            assert len(eos_pos) == 1
            assert (row[eos_pos[0] + 1:] == SYMBOLS.PAD_ID).all()
        # dummy rows are pure PAD
        for j in range(batch["n_real"], y.shape[0]):
            assert (y[j] == SYMBOLS.PAD_ID).all()
        break


def test_epoch_order_is_seeded(tiny_exp):
    cfg, dl1 = _loader(tiny_exp)
    cfg, dl2 = _loader(tiny_exp)
    o1 = [b["utts"] for b in dl1.get_batch(4, "tiny_train", True, True)]
    o2 = [b["utts"] for b in dl2.get_batch(4, "tiny_train", True, True)]
    assert o1 == o2
    # and a second epoch differs (shuffling advances)
    o1b = [b["utts"] for b in dl1.get_batch(4, "tiny_train", True, True)]
    assert o1 != o1b


def test_frame_dropout_zeroes_rows(tiny_exp):
    cfg, dl = _loader(tiny_exp)
    x = np.ones((100, 13), dtype=np.float32)
    out = dl._drop_frames(x, 0.3)
    zero_rows = int((out.sum(axis=1) == 0).sum())
    assert 1 <= zero_rows <= 30  # choice with replacement => <= 30


def test_get_hyps_detok(tiny_exp):
    cfg, dl = _loader(tiny_exp)
    # ids: specials filtered wherever they appear, including after EOS
    preds = [("u0", [SYMBOLS.GO_ID, 4, 5, SYMBOLS.EOS_ID, 6])]
    hyps = dl.get_hyps(preds)
    assert hyps["u0"] == ["w0", "w1", "w2"]


def test_get_hyps_bpe_merge(tiny_exp):
    cfg, dl = _loader(tiny_exp)
    dl.data_cfg = dict(dl.data_cfg, dec_key="bpe_w")
    dl.vocab["bpe_w"] = {
        "w2i": {}, "i2w": {4: b"hel@@", 5: b"lo", 6: b"there"}}
    hyps = dl.get_hyps([("u0", [4, 5, 6])])
    assert hyps["u0"] == ["hello", "there"]
