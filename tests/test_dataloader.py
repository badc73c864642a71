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


def test_tail_rows_policy():
    """Tail batches pad to the smallest repeated-half of the bucket
    batch size that holds them, constrained to min_rows multiples."""
    f = FisherDataLoader.tail_rows
    assert f(5, 128, 8) == 8
    assert f(37, 128, 8) == 64
    assert f(65, 128, 8) == 128
    assert f(8, 128, 8) == 8
    assert f(5, 128, 32) == 32          # mesh data axis floor
    assert f(5, 96, 8) == 24            # halves stop at non-multiple-of-8
    assert f(3, 8, 8) == 8


def test_tail_shrink_batches(tiny_exp):
    """With tail_shrink, only each bucket's last partial batch shrinks;
    real rows / utts / loss accounting are unchanged."""
    cfg, dl = _loader(tiny_exp)
    plain = list(dl.get_batch(4, "tiny_train", train=True, labels=True,
                              epoch=0))
    cfg2, dl2 = _loader(tiny_exp)
    shrunk = list(dl2.get_batch(4, "tiny_train", train=True, labels=True,
                                epoch=0, tail_shrink=2))
    assert [b["utts"] for b in plain] == [b["utts"] for b in shrunk]
    saw_shrunk = False
    for p, s in zip(plain, shrunk):
        assert p["n_real"] == s["n_real"]
        assert p["X"].shape[0] == 4
        expect = FisherDataLoader.tail_rows(s["n_real"], 4, 2) \
            if s["n_real"] < 4 else 4
        assert s["X"].shape[0] == expect == s["rows"]
        assert s["y"].shape[0] == expect
        saw_shrunk |= expect < 4
        # shrunk batch contents match the full-pad batch's real rows
        np.testing.assert_array_equal(p["X"][:p["n_real"]],
                                      s["X"][:s["n_real"]])
        np.testing.assert_array_equal(p["y"][:p["n_real"]],
                                      s["y"][:s["n_real"]])
    assert saw_shrunk, "fixture produced no partial tail batch"


def test_prefetcher_multiworker_order_and_errors():
    """The parallel Prefetcher yields in exact generator order at any
    worker count, propagates prepare errors at the failing item's
    position, and surfaces generator errors after the good prefix."""
    import time as _t

    from ast_tpu.train.trainer import Prefetcher

    def gen(n):
        for i in range(n):
            yield i

    def slow_prepare(i):
        _t.sleep(0.002 * ((i * 7) % 5))  # jittered: forces reordering
        return i * 10

    for workers in (1, 2, 4):
        out = list(Prefetcher(gen(40), slow_prepare, depth=4,
                              workers=workers))
        assert out == [i * 10 for i in range(40)], workers

    # prepare error at item 5 arrives at position 5
    def bad_prepare(i):
        if i == 5:
            raise RuntimeError("boom5")
        return i

    got = []
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom5"):
        for v in Prefetcher(gen(10), bad_prepare, workers=3):
            got.append(v)
    assert got == [0, 1, 2, 3, 4]

    # generator error after a good prefix
    def bad_gen():
        yield 0
        yield 1
        raise ValueError("genboom")

    got = []
    with _pytest.raises(ValueError, match="genboom"):
        for v in Prefetcher(bad_gen(), lambda x: x, workers=2):
            got.append(v)
    assert got == [0, 1]

    # early consumer abandonment doesn't hang or leak
    p = Prefetcher(gen(100), slow_prepare, depth=4, workers=3)
    for i, v in enumerate(p):
        if i == 3:
            break
    p.close()
    assert all(not t.is_alive() for t in p.threads)
