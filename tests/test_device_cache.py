"""HBM-resident epoch feature cache (extras.hbm_cache).

Pins the bit-exactness contract: gathering train batches out of the
device cache (data/device_cache.py + dataloader index mode) produces
EXACTLY the losses and parameters of host-assembled feeding — same
epoch streams, same frame-dropout RNG draws, same math — on the single
device and on a data-parallel mesh, in single-step and grouped
(steps_per_dispatch) dispatch.
"""

import copy
import json
import os

import numpy as np
import pytest

import jax

from tests.conftest import make_tiny_experiment


def _patch_extras(exp_dir, extras):
    cfg_path = os.path.join(exp_dir, "train_cfg.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["extras"].update(extras)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)


def _patch_cfg(exp_dir, top):
    cfg_path = os.path.join(exp_dir, "train_cfg.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg.update(top)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)


def _train(exp_dir, epochs=2):
    from ast_tpu.train.trainer import NN
    nn = NN(exp_dir)
    losses = [nn.train_epoch("tiny_train", epoch=e)
              for e in range(1, epochs + 1)]
    return losses, jax.device_get(nn.params)


def _assert_identical(run_a, run_b):
    losses_a, params_a = run_a
    losses_b, params_b = run_b
    assert losses_a == losses_b, (losses_a, losses_b)
    for a, b in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hbm_cache_bit_identical_losses_and_params(tmp_path):
    """f32 cache + gather + 0/1 mask == host-assembled batches, down to
    identical post-training parameters (zero_input frame dropout active
    in the tiny config, so the mask path is load-bearing)."""
    host = str(tmp_path / "host")
    cached = str(tmp_path / "cached")
    make_tiny_experiment(host, n_train=10, n_dev=4)
    make_tiny_experiment(cached, n_train=10, n_dev=4)
    _patch_extras(os.path.join(cached, "exp"), {"hbm_cache": True})
    _assert_identical(_train(os.path.join(host, "exp")),
                      _train(os.path.join(cached, "exp")))


def test_hbm_cache_multi_dispatch_identical(tmp_path):
    """Grouped dispatch (steps_per_dispatch=2) with the cache as a scan
    constant matches the host-fed grouped path exactly."""
    host = str(tmp_path / "host")
    cached = str(tmp_path / "cached")
    make_tiny_experiment(host, n_train=10, n_dev=4,
                         extras={"steps_per_dispatch": 2})
    make_tiny_experiment(cached, n_train=10, n_dev=4,
                         extras={"steps_per_dispatch": 2})
    _patch_extras(os.path.join(cached, "exp"), {"hbm_cache": True})
    _assert_identical(_train(os.path.join(host, "exp")),
                      _train(os.path.join(cached, "exp")))


@pytest.mark.slow
def test_hbm_cache_mesh_identical(tmp_path):
    """Data-parallel mesh: sharded gather indices against the
    replicated cache reproduce the mesh host-fed run exactly."""
    host = str(tmp_path / "host")
    cached = str(tmp_path / "cached")
    for d in (host, cached):
        make_tiny_experiment(d, n_train=10, n_dev=4)
        _patch_cfg(os.path.join(d, "exp"),
                   {"parallel": {"data_axis": 2}})
    _patch_extras(os.path.join(cached, "exp"), {"hbm_cache": True})
    _assert_identical(_train(os.path.join(host, "exp"), epochs=1),
                      _train(os.path.join(cached, "exp"), epochs=1))


def test_hbm_cache_bf16_trains(tmp_path):
    """hbm_cache_dtype=bfloat16: not bit-exact (documented), but the
    run completes and the loss stays finite/close to the f32 run."""
    root = str(tmp_path / "b")
    make_tiny_experiment(root, n_train=10, n_dev=4)
    _patch_extras(os.path.join(root, "exp"),
                  {"hbm_cache": True, "hbm_cache_dtype": "bfloat16"})
    losses, _ = _train(os.path.join(root, "exp"), epochs=1)
    assert np.isfinite(losses).all()


def test_hbm_cache_rejects_incompatible_modes(tmp_path):
    from ast_tpu.data.device_cache import EpochFeatureCache

    class TextLoader:
        text_mode = True

    with pytest.raises(ValueError, match="text-encoder"):
        EpochFeatureCache(TextLoader(), "train")

    root = str(tmp_path / "w")
    make_tiny_experiment(root, n_train=6, n_dev=2)
    exp = os.path.join(root, "exp")
    _patch_extras(exp, {"hbm_cache": True, "hbm_cache_dtype": "int8"})
    from ast_tpu.train.trainer import NN
    with pytest.raises(ValueError, match="hbm_cache_dtype"):
        NN(exp)


def test_index_mode_stream_matches_host_stream(tmp_path):
    """The dataloader's index mode consumes the identical RNG stream:
    gathering cache rows by rows_idx and applying drop_mask reproduces
    the host batches' X bit-for-bit, batch by batch."""
    from ast_tpu.data.dataloader import make_dataloader
    from ast_tpu.data.device_cache import EpochFeatureCache

    root = str(tmp_path / "s")
    make_tiny_experiment(root, n_train=10, n_dev=4)
    with open(os.path.join(root, "exp", "train_cfg.json")) as f:
        tcfg = json.load(f)
    loader_a = make_dataloader(copy.deepcopy(tcfg),
                               os.path.join(root, "exp"))
    loader_b = make_dataloader(copy.deepcopy(tcfg),
                               os.path.join(root, "exp"))
    cache = EpochFeatureCache(loader_b, "tiny_train")

    host_gen = loader_a.get_batch(4, "tiny_train", train=True,
                                  labels=True, epoch=3)
    idx_gen = loader_b.get_batch(4, "tiny_train", train=True,
                                 labels=True, epoch=3,
                                 index_cache=cache)
    n = 0
    for hb, ib in zip(host_gen, idx_gen):
        assert hb["utts"] == ib["utts"]
        np.testing.assert_array_equal(hb["y"], ib["y"])
        np.testing.assert_array_equal(hb["frame_len"], ib["frame_len"])
        arr = np.asarray(cache.bucket_array(hb["bucket"]))
        got = arr[ib["rows_idx"]] * \
            ib["drop_mask"].astype(np.float32)[:, :, None]
        np.testing.assert_array_equal(hb["X"], got)
        n += 1
    assert n >= 2


def test_hbm_cache_eval_paths_identical(tmp_path):
    """predict / eval_loss / decode_beam_set with the cache equal the
    host-fed paths exactly (eval streams carry all-ones masks; the
    gather output feeds the unchanged eval steps)."""
    from ast_tpu.train.trainer import NN

    host = str(tmp_path / "host")
    cached = str(tmp_path / "cached")
    make_tiny_experiment(host, n_train=8, n_dev=6)
    make_tiny_experiment(cached, n_train=8, n_dev=6)
    _patch_extras(os.path.join(cached, "exp"), {"hbm_cache": True})

    nn_h = NN(os.path.join(host, "exp"))
    nn_c = NN(os.path.join(cached, "exp"))
    # identical init (same seed), so outputs must match exactly
    preds_h = dict(nn_h.predict("tiny_dev"))
    preds_c = dict(nn_c.predict("tiny_dev"))
    assert preds_h.keys() == preds_c.keys()
    for u in preds_h:
        assert list(preds_h[u]) == list(preds_c[u]), u
    assert nn_h.eval_loss("tiny_dev") == nn_c.eval_loss("tiny_dev")
    beams_h = nn_h.decode_beam_set("tiny_dev", N=2, K=2)
    beams_c = nn_c.decode_beam_set("tiny_dev", N=2, K=2)
    assert beams_h.keys() == beams_c.keys()
    for u in beams_h:
        for (ha, hs), (ca, cs) in zip(beams_h[u], beams_c[u]):
            assert ha == ca and hs == cs, u
