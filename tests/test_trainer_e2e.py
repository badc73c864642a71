"""End-to-end harness tests on the synthetic tiny experiment:
train epochs, logs, checkpoint/resume, greedy + beam CLI, transfer."""

import os

import numpy as np
import pytest

from ast_tpu.train.trainer import NN
from tests.conftest import make_tiny_experiment


@pytest.fixture(scope="module")
def trained_exp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    exp = make_tiny_experiment(root)
    import ast_tpu.cli.train as train_cli
    train_cli.main(["-m", exp, "-e", "2"])
    return exp


def test_train_writes_logs_and_ckpt(trained_exp):
    train_log = os.path.join(trained_exp, "train.log")
    dev_log = os.path.join(trained_exp, "dev.log")
    assert os.path.exists(train_log)
    lines = open(train_log).read().strip().split("\n")
    assert len(lines) == 2
    epoch, loss = lines[0].split(", ")
    assert epoch == "1" and float(loss) > 0
    dev_lines = open(dev_log).read().strip().split("\n")
    assert len(dev_lines) == 2
    assert os.path.exists(
        os.path.join(trained_exp, "seq2seq_2.model.npz"))
    # bucket dict persisted in the model dir
    assert os.path.exists(os.path.join(trained_exp, "buckets_sp.dict"))


def test_resume_continues_from_max_epoch(trained_exp):
    nn = NN(trained_exp)
    assert nn.max_epoch == 2


@pytest.mark.slow
def test_loss_decreases_over_epochs(trained_exp):
    nn = NN(trained_exp)
    losses = [nn.train_epoch("tiny_train", epoch=e) for e in range(3, 7)]
    assert losses[-1] < losses[0]


def test_predict_and_hyps(trained_exp):
    nn = NN(trained_exp)
    preds = nn.predict("tiny_dev")
    assert len(preds) == nn.data_loader.n_utts["tiny_dev"]
    hyps = nn.data_loader.get_hyps(preds)
    assert set(hyps.keys()) == set(u for u, _ in preds)


def test_beam_cli(trained_exp):
    import ast_tpu.cli.beam as beam_cli
    bleu = beam_cli.main(["-m", trained_exp, "-n", "3", "-k", "3",
                          "-s", "tiny_dev", "-w", "0.6"])
    assert bleu >= 0
    assert os.path.exists(
        os.path.join(trained_exp, "tiny_dev_beam_N-3_K-3.p"))
    assert os.path.exists(
        os.path.join(trained_exp, "tiny_dev_beam_N-3_K-3_W-0.60.en"))
    # resumable from pickle
    bleu2 = beam_cli.main(["-m", trained_exp, "-n", "3", "-k", "3",
                           "-s", "tiny_dev", "-w", "0.6", "--resume"])
    assert abs(bleu - bleu2) < 1e-9


def test_beam_cli_explicit_ckpt_paths(trained_exp):
    """--ckpt results are keyed by checkpoint identity: cached beams and
    .en outputs never collide with (or get served from) the
    latest-epoch decode's files, even under --resume."""
    import ast_tpu.cli.beam as beam_cli
    import ast_tpu.cli.copy_params as cp_cli

    avg = os.path.join(trained_exp, "avg.npz")
    cp_cli.main(["--src", trained_exp, "--average", "last:1",
                 "--out", avg])
    beam_cli.main(["-m", trained_exp, "-n", "2", "-k", "2",
                   "-s", "tiny_dev", "-w", "0.6", "--ckpt", avg])
    assert os.path.exists(os.path.join(
        trained_exp, "tiny_dev_beam_N-2_K-2_ckpt-avg.p"))
    assert os.path.exists(os.path.join(
        trained_exp, "tiny_dev_beam_N-2_K-2_W-0.60_ckpt-avg.en"))
    assert not os.path.exists(os.path.join(
        trained_exp, "tiny_dev_beam_N-2_K-2.p"))


@pytest.mark.slow
def test_remat_gradients_match(tmp_path):
    """extras.remat (jax.checkpoint around the loss) must produce the
    same parameter update as the plain step — recompute-for-memory only,
    never different math."""
    import jax
    import jax.numpy as jnp

    exp = make_tiny_experiment(str(tmp_path), n_train=8, n_dev=4,
                               batch_size=4)
    nn_plain = NN(exp)
    exp_r = make_tiny_experiment(str(tmp_path) + "_r", n_train=8,
                                 n_dev=4, batch_size=4,
                                 extras={"remat": True})
    nn_remat = NN(exp_r)
    # identical init (same seed string)
    batch = next(nn_plain.data_loader.get_batch(
        4, "tiny_train", train=True, labels=True, epoch=0))
    db = nn_plain._device_batch(batch, True)
    key = jax.random.PRNGKey(3)

    def copy(t):
        return jax.tree.map(jnp.array, t)

    p1, _, _, l1 = nn_plain._train_step(
        copy(nn_plain.params), copy(nn_plain.state),
        copy(nn_plain.opt_state), db["X"], db["y"], db["n_real"],
        key, 0)
    p2, _, _, l2 = nn_remat._train_step(
        copy(nn_remat.params), copy(nn_remat.state),
        copy(nn_remat.opt_state), db["X"], db["y"], db["n_real"],
        key, 0)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=f"remat param mismatch at {pa}")


def test_copy_params_cli(trained_exp, tmp_path):
    target = make_tiny_experiment(str(tmp_path), seed=1)
    import ast_tpu.cli.copy_params as cp
    cp.main(["--src", trained_exp, "--dst", target, "--groups", "enc,attn"])
    assert os.path.exists(os.path.join(target, "seq2seq_0.model.npz"))
    # target resumes from the transferred epoch-0 checkpoint
    nn_t = NN(target)
    assert nn_t.max_epoch == 0
    nn_s = NN(trained_exp)
    np.testing.assert_array_equal(
        np.asarray(nn_t.params["cnn"][0]["w"]),
        np.asarray(nn_s.params["cnn"][0]["w"]))


@pytest.mark.slow
def test_decode_pipeline_depth_invariance(trained_exp):
    """extras.decode_pipeline is pure dispatch overlap: predict and
    decode_beam_set return IDENTICAL results at depth 1 (the old
    drain-immediately loop) and a deeper pipeline."""
    outs = {}
    for depth in (1, 3):
        nn = NN(trained_exp)
        nn.cfg.train["extras"]["decode_pipeline"] = depth
        outs[depth] = (nn.predict("tiny_dev"),
                       nn.decode_beam_set("tiny_dev", N=2, K=2))
    assert outs[1][0] == outs[3][0]
    assert outs[1][1] == outs[3][1]


@pytest.mark.slow
def test_label_smoothing_wired(tmp_path):
    """extras.label_smoothing reaches the train-path loss: a smoothed
    step produces a different loss and different updates than eps=0,
    and eps=0 stays the exact reference CE (same as an unset config)."""
    import jax
    import jax.numpy as jnp

    def copy(t):
        return jax.tree.map(jnp.array, t)

    exps = {}
    for name, eps in [("e0", 0.0), ("es", 0.2)]:
        exp = make_tiny_experiment(
            os.path.join(str(tmp_path), name), n_train=8, n_dev=4,
            batch_size=4, extras={"label_smoothing": eps})
        exps[name] = NN(exp)
    nn0, nns = exps["e0"], exps["es"]
    batch = next(nn0.data_loader.get_batch(
        4, "tiny_train", train=True, labels=True, epoch=0))
    db = nn0._device_batch(batch, True)
    key = jax.random.PRNGKey(7)

    p0, _, _, l0 = nn0._train_step(
        copy(nn0.params), copy(nn0.state), copy(nn0.opt_state),
        db["X"], db["y"], db["n_real"], key, 0)
    ps, _, _, ls = nns._train_step(
        copy(nns.params), copy(nns.state), copy(nns.opt_state),
        db["X"], db["y"], db["n_real"], key, 0)
    assert abs(float(l0) - float(ls)) > 1e-6
    leaves0 = jax.tree_util.tree_leaves(p0)
    leavess = jax.tree_util.tree_leaves(ps)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leavess))


def test_transfer_dtype_narrow_wire(tmp_path):
    """extras.transfer_dtype=float16: features cross the wire narrow,
    the step widens on device — training works and one step lands
    within rounding distance of the f32-wire step."""
    import jax
    import jax.numpy as jnp

    def copy(t):
        return jax.tree.map(jnp.array, t)

    nns = {}
    for name, dt in [("f32", "float32"), ("f16", "float16")]:
        exp = make_tiny_experiment(
            os.path.join(str(tmp_path), name), n_train=8, n_dev=4,
            batch_size=4, extras={"transfer_dtype": dt})
        nns[name] = NN(exp)
    n0, n1 = nns["f32"], nns["f16"]
    batch = next(n0.data_loader.get_batch(
        4, "tiny_train", train=True, labels=True, epoch=0))
    db0 = n0._device_batch(batch, True, narrow=True)
    db1 = n1._device_batch(batch, True, narrow=True)
    assert np.asarray(db1["X"]).dtype == np.float16
    assert np.asarray(db0["X"]).dtype == np.float32
    key = jax.random.PRNGKey(5)
    _, _, _, l0 = n0._train_step(
        copy(n0.params), copy(n0.state), copy(n0.opt_state),
        db0["X"], db0["y"], db0["n_real"], key, 0)
    _, _, _, l1 = n1._train_step(
        copy(n1.params), copy(n1.state), copy(n1.opt_state),
        db1["X"], db1["y"], db1["n_real"], key, 0)
    assert np.isfinite(float(l1))
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-2)
    # bad value rejected loudly
    with pytest.raises(ValueError, match="transfer_dtype"):
        NN(make_tiny_experiment(os.path.join(str(tmp_path), "bad"),
                                extras={"transfer_dtype": "int8"}))
