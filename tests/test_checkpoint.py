"""Checkpoint roundtrip, resume discovery, subtree transfer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ast_tpu.models import seq2seq
from ast_tpu.train.checkpoint import (
    checkpoint_path, latest_checkpoint, load_checkpoint, save_checkpoint,
    transfer_params,
)
from tests.conftest import TINY_MODEL_CFG


def _model(vocab=12, seed=0):
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=vocab)
    return mcfg, *seq2seq.init_model(jax.random.PRNGKey(seed), mcfg)


def test_roundtrip(tmp_path):
    mcfg, params, state = _model()
    opt_state = {"mu": jax.tree.map(jnp.zeros_like, params),
                 "count": jnp.zeros((), jnp.int32)}
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, params, state, opt_state, extra={"epoch": np.int64(7)})
    loaded = load_checkpoint(p)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(loaded["extra"]["epoch"]) == 7
    # structure preserved (lists stay lists)
    assert isinstance(loaded["params"]["cnn"], list)


def test_latest_checkpoint(tmp_path):
    mcfg, params, state = _model()
    for epoch in [1, 10, 3]:
        save_checkpoint(checkpoint_path(str(tmp_path), epoch), params)
    path, epoch = latest_checkpoint(str(tmp_path))
    assert epoch == 10
    assert path.endswith("seq2seq_10.model.npz")
    assert latest_checkpoint(str(tmp_path / "nope")) == (None, 0)


def test_transfer_enc_attn(tmp_path):
    _, src_params, src_state = _model(seed=0)
    _, dst_params, dst_state = _model(seed=1)
    new_params, new_state = transfer_params(
        src_params, dst_params, groups=("enc", "attn"),
        src_state=src_state, dst_state=dst_state)
    np.testing.assert_array_equal(
        np.asarray(new_params["cnn"][0]["w"]),
        np.asarray(src_params["cnn"][0]["w"]))
    np.testing.assert_array_equal(
        np.asarray(new_params["attn"]["wa"][0]["w"]),
        np.asarray(src_params["attn"]["wa"][0]["w"]))
    # decoder untouched
    np.testing.assert_array_equal(
        np.asarray(new_params["dec"]["embed"]),
        np.asarray(dst_params["dec"]["embed"]))


def test_transfer_shape_mismatch_raises(tmp_path):
    _, src_params, _ = _model(vocab=12)
    _, dst_params, _ = _model(vocab=20)
    with pytest.raises(ValueError):
        transfer_params(src_params, dst_params, groups=("dec",))
    # enc transfer across different vocabs is fine
    transfer_params(src_params, dst_params, groups=("enc",))


def test_average_checkpoints_and_explicit_ckpt(tmp_path):
    """copy_params --average: elementwise-mean model; NN(ckpt=...) loads
    exactly that file (no auto-resume scan, no inflight recovery)."""
    import os

    from ast_tpu.cli import copy_params as cp_cli
    from ast_tpu.train.checkpoint import average_checkpoints, list_checkpoints
    from ast_tpu.train.trainer import NN
    from tests.conftest import make_tiny_experiment

    exp = make_tiny_experiment(str(tmp_path), n_train=8, n_dev=4,
                               batch_size=4)
    mcfg, p1, s1 = _model(seed=1)
    _, p2, s2 = _model(seed=2)
    save_checkpoint(checkpoint_path(exp, 1), p1, s1)
    save_checkpoint(checkpoint_path(exp, 2), p2, s2)
    assert [e for e, _ in list_checkpoints(exp)] == [1, 2]

    cp_cli.main(["--src", exp, "--average", "last:2",
                 "--out", str(tmp_path / "avg.model.npz")])
    avg_path = str(tmp_path / "avg.model.npz")
    assert os.path.exists(avg_path)

    avg = load_checkpoint(avg_path)
    for a, b1, b2 in zip(jax.tree.leaves(avg["params"]),
                         jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), (np.asarray(b1) + np.asarray(b2)) / 2,
            rtol=0, atol=1e-7)

    # a stale inflight snapshot must NOT override an explicit checkpoint
    save_checkpoint(os.path.join(exp, "seq2seq_inflight"), p2, s2,
                    extra={"epoch": np.int64(9), "step": np.int64(3)})
    nn = NN(exp, ckpt=avg_path)
    assert nn.loaded_ckpt == avg_path
    assert nn.inflight_resume is None
    np.testing.assert_array_equal(
        np.asarray(nn.params["dec"]["out_w"]),
        np.asarray(avg["params"]["dec"]["out_w"]))

    # explicit-epoch spec + direct helper agree
    pa, _ = average_checkpoints([checkpoint_path(exp, 1),
                                 checkpoint_path(exp, 2)])
    np.testing.assert_array_equal(np.asarray(pa["dec"]["out_w"]),
                                  np.asarray(avg["params"]["dec"]["out_w"]))

    # 'last:0' must be rejected, not silently average everything
    import pytest
    with pytest.raises(ValueError):
        cp_cli.main(["--src", exp, "--average", "last:0"])


def test_optimizer_state_roundtrips(tmp_path):
    """REAL optax opt state (NamedTuple/tuple containers) must survive
    save -> load -> merge_into bit-exact, with the template's container
    types restored.  NPZ flattening stores tuples as lists, so the
    merge must match by leaf order, not container type — a structural
    tree.map here silently restarted Adam's moments on every resume."""
    from ast_tpu.train.checkpoint import merge_into
    from ast_tpu.train.optimizer import build_optimizer

    mcfg, params, state = _model()
    tx, opt_state = build_optimizer(
        {"optimizer": "adam", "lr": 1e-3}, params)
    # advance one step so the moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)

    p = str(tmp_path / "ckpt")
    save_checkpoint(p, params, state, opt_state)
    loaded = load_checkpoint(p)
    merged = merge_into(opt_state, loaded["opt"], "opt")
    assert jax.tree.structure(merged) == jax.tree.structure(opt_state)
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a structurally different optimizer state must still raise (the
    # trainer catches it and restarts moments, loudly)
    tx2, opt2 = build_optimizer(
        {"optimizer": "adam", "lr": 1e-3, "amsgrad": True}, params)
    if len(jax.tree.leaves(opt2)) != len(jax.tree.leaves(opt_state)):
        with pytest.raises(ValueError, match="leaf count"):
            merge_into(opt2, loaded["opt"], "opt")


def test_empty_dict_state_roundtrips(tmp_path):
    """A bn:false model's state list contains {} entries — the flat-NPZ
    schema must mark them or the checkpoint is unloadable."""
    from ast_tpu.train.checkpoint import _flatten, _unflatten

    tree = {"state": {"cnn_bn": [{}, {"bn_mean": np.ones(3)}]}}
    out = _unflatten(_flatten(tree))
    assert out["state"]["cnn_bn"][0] == {}
    np.testing.assert_array_equal(out["state"]["cnn_bn"][1]["bn_mean"],
                                  np.ones(3))

    # and end-to-end through save/load
    mcfg, params, state = _model()
    p = str(tmp_path / "bnless")
    save_checkpoint(p, params, {"cnn_bn": [{}, {}]})
    loaded = load_checkpoint(p)
    assert loaded["state"]["cnn_bn"] == [{}, {}]


def test_merge_into_rejects_shape_mismatch():
    from ast_tpu.train.checkpoint import merge_into

    with pytest.raises(ValueError, match="shape mismatch"):
        merge_into({"w": np.zeros((2, 3))}, {"w": np.zeros((3, 2))})
