"""Chainer checkpoint import: gate-order semantics, round-trip, CLI resume.

The importer (ast_tpu/train/chainer_import.py) must reproduce Chainer's
compute semantics from its on-disk layout alone.  The substantive risk is
the LSTM gate packing — Chainer interleaves (a, i, f, o) per unit
(chainer/functions/activation/lstm.py ``_extract_gates``), ours packs
contiguous (i, f, g, o) blocks — so the oracle here is an independent
NumPy implementation of Chainer's documented cell math applied to random
Chainer-layout weights, checked against our cell after conversion.
"""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.models import seq2seq
from ast_tpu.ops.lstm import lstm_step
from ast_tpu.train import checkpoint
from ast_tpu.train.chainer_import import (
    ast_to_chainer, chainer_to_ast, is_chainer_checkpoint,
)
from tests.conftest import TINY_MODEL_CFG

V = 12


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _chainer_lstm_step(up_w, up_b, lat_w, h, c, x):
    """Chainer L.LSTM forward, implemented from its documented semantics:
    z = upward(x) + lateral(h); gates read interleaved per unit in order
    (a, i, f, o), a = tanh cell candidate; c' = a*i + f*c; h' = o*tanh(c')."""
    z = x @ up_w.T + up_b + h @ lat_w.T
    B, H4 = z.shape
    r = z.reshape(B, H4 // 4, 4)
    a, i, f, o = np.tanh(r[..., 0]), _sigmoid(r[..., 1]), \
        _sigmoid(r[..., 2]), _sigmoid(r[..., 3])
    c_new = a * i + f * c
    return o * np.tanh(c_new), c_new


def test_lstm_gate_order_semantics():
    rng = np.random.default_rng(0)
    H, IN, B = 5, 7, 3
    up_w = rng.normal(size=(4 * H, IN)).astype(np.float32)
    up_b = rng.normal(size=(4 * H,)).astype(np.float32)
    lat_w = rng.normal(size=(4 * H, H)).astype(np.float32)
    h = rng.normal(size=(B, H)).astype(np.float32)
    c = rng.normal(size=(B, H)).astype(np.float32)
    x = rng.normal(size=(B, IN)).astype(np.float32)

    h_ref, c_ref = _chainer_lstm_step(up_w, up_b, lat_w, h, c, x)

    conv = chainer_to_ast({
        "L0_dec/upward/W": up_w, "L0_dec/upward/b": up_b,
        "L0_dec/lateral/W": lat_w,
        # minimal valid model around the one cell under test
        "embed_dec/W": np.zeros((V, IN), np.float32),
        "out/W": np.zeros((V, H), np.float32),
        "out/b": np.zeros((V,), np.float32),
        "attn_Wa/W": np.zeros((H, H), np.float32),
        "attn_Wa/b": np.zeros((H,), np.float32),
        "context/W": np.zeros((H, 2 * H), np.float32),
        "context/b": np.zeros((H,), np.float32),
    })
    p = conv["params"]["dec"]["lstm"][0]
    h_ours, c_ours = lstm_step(
        {k: jnp.asarray(v) for k, v in p.items()},
        jnp.asarray(h), jnp.asarray(c), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(h_ours), h_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_ours), c_ref, atol=1e-6)


def test_linear_semantics():
    """Chainer Linear y = x @ W.T + b must equal ours after transpose."""
    rng = np.random.default_rng(1)
    W = rng.normal(size=(6, 4)).astype(np.float32)  # (out, in)
    b = rng.normal(size=(6,)).astype(np.float32)
    x = rng.normal(size=(3, 4)).astype(np.float32)
    conv = chainer_to_ast({
        "attn_Wa/W": np.zeros((4, 4), np.float32),
        "attn_Wa/b": np.zeros((4,), np.float32),
        "context/W": np.zeros((4, 8), np.float32),
        "context/b": np.zeros((4,), np.float32),
        "embed_dec/W": np.zeros((V, 4), np.float32),
        "out/W": W, "out/b": b,
    })
    y_ref = x @ W.T + b
    y_ours = x @ conv["params"]["dec"]["out_w"] + conv["params"]["dec"]["out_b"]
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-6)


def _mcfg(**rnn_over):
    mcfg = jax.tree.map(lambda x: x, TINY_MODEL_CFG)
    mcfg["rnn_config"] = dict(mcfg["rnn_config"], dec_vocab_size=V,
                              **rnn_over)
    return mcfg


def _assert_trees_equal(a, b):
    ta, tb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for la, lb in zip(ta, tb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_roundtrip_identity_tiny():
    mcfg = _mcfg()
    params, state = seq2seq.init_model(jax.random.PRNGKey(0), mcfg)
    conv = chainer_to_ast(ast_to_chainer(params, state))
    _assert_trees_equal(conv["params"], params)
    _assert_trees_equal(conv["state"], state)


def test_roundtrip_identity_variants():
    """ln + linear_proj + n_attn=2, and the unidirectional encoder."""
    for over in ({"ln": True, "linear_proj": True, "n_attn": 2},
                 {"bi_rnn": False}):
        mcfg = _mcfg(**over)
        params, state = seq2seq.init_model(jax.random.PRNGKey(1), mcfg)
        conv = chainer_to_ast(ast_to_chainer(params, state))
        _assert_trees_equal(conv["params"], params)
        _assert_trees_equal(conv["state"], state)


def test_load_checkpoint_detects_chainer(tmp_path):
    """A file written exactly as the reference writes it (open handle ->
    numpy.savez_compressed, name ``seq2seq_<e>.model``) loads through
    load_checkpoint into the init_model tree."""
    mcfg = _mcfg()
    params, state = seq2seq.init_model(jax.random.PRNGKey(2), mcfg)
    arrays = ast_to_chainer(params, state)
    assert is_chainer_checkpoint(arrays)
    path = os.path.join(str(tmp_path), "seq2seq_3.model")
    with open(path, "wb") as f:  # as chainer.serializers.save_npz does
        np.savez_compressed(f, **arrays)

    loaded = checkpoint.load_checkpoint(path)
    assert loaded.get("opt") is None
    _assert_trees_equal(loaded["params"], params)
    _assert_trees_equal(loaded["state"], state)

    # auto-resume discovery picks it up with the right epoch
    best, epoch = checkpoint.latest_checkpoint(str(tmp_path))
    assert best == path and epoch == 3


def test_latest_checkpoint_prefers_ours_on_tie(tmp_path):
    ref = os.path.join(str(tmp_path), "seq2seq_2.model")
    ours = os.path.join(str(tmp_path), "seq2seq_2.model.npz")
    for p in (ref, ours):
        with open(p, "wb") as f:
            f.write(b"x")
    best, epoch = checkpoint.latest_checkpoint(str(tmp_path))
    assert best == ours and epoch == 2
    # a newer reference checkpoint still outranks an older one of ours
    newer = os.path.join(str(tmp_path), "seq2seq_5.model")
    with open(newer, "wb") as f:
        f.write(b"x")
    best, epoch = checkpoint.latest_checkpoint(str(tmp_path))
    assert best == newer and epoch == 5


def test_copy_params_export_chainer_cli(tmp_path):
    """--export-chainer writes a file the importer round-trips exactly."""
    from ast_tpu.cli import copy_params as cli
    from ast_tpu.train.checkpoint import checkpoint_path, save_checkpoint

    mcfg = _mcfg()
    params, state = seq2seq.init_model(jax.random.PRNGKey(3), mcfg)
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    save_checkpoint(checkpoint_path(src, 2), params, state)

    out = os.path.join(str(tmp_path), "seq2seq_2.model")
    cli.main(["--src", src, "--export-chainer", out])
    conv = checkpoint.load_checkpoint(out)  # auto-detected as Chainer
    _assert_trees_equal(conv["params"], params)
    _assert_trees_equal(conv["state"], state)


def test_trainer_resumes_from_chainer_checkpoint(tmp_path):
    """Drop a reference-format checkpoint into an experiment dir: the
    trainer must auto-resume from it (params/BN state loaded, fresh
    optimizer) and decode with exactly those weights."""
    from ast_tpu.train.trainer import NN
    from tests.conftest import make_tiny_experiment

    exp = make_tiny_experiment(str(tmp_path))
    # a "trained" reference model: distinct deterministic weights
    nn_probe = NN(exp)
    params, state = jax.tree.map(np.asarray, (nn_probe.params,
                                              nn_probe.state))
    params = jax.tree.map(lambda x: x + 0.25, params)
    with open(os.path.join(exp, "seq2seq_4.model"), "wb") as f:
        np.savez_compressed(f, **ast_to_chainer(params, state))

    nn = NN(exp)
    assert nn.max_epoch == 4
    _assert_trees_equal(jax.tree.map(np.asarray, nn.params), params)
    _assert_trees_equal(jax.tree.map(np.asarray, nn.state), state)
