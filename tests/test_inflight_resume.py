"""Mid-epoch crash recovery: inflight snapshots are actually consumed.

The reference can only resume at epoch boundaries (reference:
nn.py:139-156); ast_tpu additionally snapshots every ``checkpoint_steps``
batches and — because the per-epoch batch stream is deterministic — a
fresh process resumes the SAME epoch at the SAME position, consuming
exactly the unconsumed suffix of the stream.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tests.conftest import make_tiny_experiment


def _enable_step_ckpt(exp, every=1):
    cfg_path = os.path.join(exp, "train_cfg.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["checkpoint_steps"] = every
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)


class _Boom(RuntimeError):
    pass


def _crash_after(nn, n_batches, consumed):
    """Wrap the loader so the stream raises after ``n_batches`` yields."""
    orig = nn.data_loader.get_batch

    def wrapper(*a, **k):
        for i, b in enumerate(orig(*a, **k)):
            if i == n_batches:
                raise _Boom()
            consumed.append(tuple(b["utts"]))
            yield b

    nn.data_loader.get_batch = wrapper


def test_kill_and_resume_consumes_exact_suffix(tmp_path):
    from ast_tpu.train.trainer import NN

    exp = make_tiny_experiment(str(tmp_path), n_train=12, n_dev=4,
                               batch_size=4)
    _enable_step_ckpt(exp)

    # run 1: crash after 2 batches (each already snapshotted)
    nn1 = NN(exp)
    first = []
    _crash_after(nn1, 2, first)
    with pytest.raises(_Boom):
        nn1.train_epoch("tiny_train", epoch=1)
    assert len(first) == 2
    assert os.path.exists(os.path.join(exp, "seq2seq_inflight.npz"))

    # run 2 (fresh process stand-in): picks up the inflight snapshot
    nn2 = NN(exp)
    assert nn2.max_epoch == 0          # CLI restarts epoch 1
    skip = nn2.inflight_resume[1]
    assert nn2.inflight_resume[0] == 1 and 1 <= skip <= 2

    # params actually came from the snapshot: nn1's params after the two
    # trained batches, not a fresh init
    np.testing.assert_array_equal(np.asarray(nn2.params["dec"]["out_w"]),
                                  np.asarray(nn1.params["dec"]["out_w"]))

    # the optimizer state came from the snapshot too: Adam's moments
    # and bias-correction count CONTINUE rather than restart (the
    # flat-NPZ list vs optax-tuple structure mismatch used to silently
    # zero them on every resume)
    import jax as _jax
    nn1_leaves = _jax.tree.leaves(nn1.opt_state)
    nn2_leaves = _jax.tree.leaves(nn2.opt_state)
    assert len(nn1_leaves) == len(nn2_leaves)
    assert any(np.any(np.asarray(a) != 0) for a in nn2_leaves)
    for a, b in zip(nn1_leaves, nn2_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    second = []
    _crash_after(nn2, 10**9, second)
    loss = nn2.train_epoch("tiny_train", epoch=1)
    assert np.isfinite(loss)

    # the resumed run consumed EXACTLY the unconsumed suffix of the
    # deterministic epoch-1 stream: the generator replays the identical
    # stream (islice pulls-and-drops the consumed prefix), and the number
    # of TRAINED steps is the stream minus the skipped prefix
    from ast_tpu.config import Config
    from ast_tpu.data.dataloader import make_dataloader
    cfg = Config(exp)
    dl = make_dataloader(cfg.train, cfg.model["model_dir"])
    stream = [tuple(b["utts"]) for b in dl.get_batch(
        4, "tiny_train", train=True, labels=True, epoch=1)]
    assert first == stream[:2]
    assert second == stream
    assert nn2.timer.n_steps == len(stream) - skip

    # epoch completion writes the "epoch 2, 0 consumed" marker: a third
    # process starts cleanly at epoch 2 with the trained params
    nn3 = NN(exp)
    assert nn3.max_epoch == 1
    assert nn3.inflight_resume is None
    np.testing.assert_array_equal(np.asarray(nn3.params["dec"]["out_w"]),
                                  np.asarray(nn2.params["dec"]["out_w"]))


def test_preempt_snapshots_and_resumes(tmp_path):
    """request_preempt (the CLI wires SIGTERM to it) stops at the next
    batch boundary with an inflight snapshot — even WITHOUT
    checkpoint_steps — and a fresh process resumes that exact position."""
    import os as _os
    import signal

    from ast_tpu.cli.train import _install_preempt_handler
    from ast_tpu.train.trainer import NN, PreemptedError

    exp = make_tiny_experiment(str(tmp_path), n_train=12, n_dev=4,
                               batch_size=4)
    nn1 = NN(exp)
    # the real signal path: handler installed by the CLI helper flips
    # the flag when SIGTERM is delivered
    _install_preempt_handler(nn1)
    _os.kill(_os.getpid(), signal.SIGTERM)
    with pytest.raises(PreemptedError):
        nn1.train_epoch("tiny_train", epoch=1)
    signal.signal(signal.SIGTERM, signal.SIG_DFL)

    nn2 = NN(exp)
    assert nn2.max_epoch == 0
    assert nn2.inflight_resume == (1, 1)   # one batch trained, then stop
    np.testing.assert_array_equal(np.asarray(nn2.params["dec"]["out_w"]),
                                  np.asarray(nn1.params["dec"]["out_w"]))
    loss = nn2.train_epoch("tiny_train", epoch=1)
    assert np.isfinite(loss)
    n_stream = sum(1 for _ in nn2.data_loader.get_batch(
        4, "tiny_train", train=True, labels=True, epoch=1))
    assert nn2.timer.n_steps == n_stream - 1   # stream minus skip=1


def test_inflight_position_discarded_on_g_change(tmp_path):
    """An inflight position recorded under one steps_per_dispatch must
    not be replayed under another (the grouped stream order differs):
    params load, the position resets to the epoch start."""
    import json

    from ast_tpu.train.trainer import NN

    exp = make_tiny_experiment(str(tmp_path), n_train=12, n_dev=4,
                               batch_size=4)
    _enable_step_ckpt(exp)
    nn1 = NN(exp)
    first = []
    _crash_after(nn1, 2, first)
    with pytest.raises(_Boom):
        nn1.train_epoch("tiny_train", epoch=1)

    # same G: position kept
    assert NN(exp).inflight_resume is not None

    # change steps_per_dispatch: position discarded, params kept
    cfg_path = os.path.join(exp, "train_cfg.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["extras"]["steps_per_dispatch"] = 3
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    nn2 = NN(exp)
    assert nn2.inflight_resume is None
    assert nn2.max_epoch == 0          # epoch 1 restarts
    np.testing.assert_array_equal(np.asarray(nn2.params["dec"]["out_w"]),
                                  np.asarray(nn1.params["dec"]["out_w"]))


def test_stale_inflight_is_ignored(tmp_path):
    from ast_tpu.train.trainer import NN

    exp = make_tiny_experiment(str(tmp_path), n_train=8, n_dev=4,
                               batch_size=4)
    _enable_step_ckpt(exp)
    nn1 = NN(exp)
    nn1.train_epoch("tiny_train", epoch=1)
    nn1.save(5)  # a NEWER epoch checkpoint outranks the inflight file

    nn2 = NN(exp)
    assert nn2.max_epoch == 5
    assert nn2.inflight_resume is None


def test_preempt_after_training_phase_saves_epoch(tmp_path, monkeypatch):
    """A SIGTERM landing BETWEEN the batch loop and the eval phase must
    not discard the just-finished epoch: the CLI's phase-boundary check
    saves an epoch checkpoint before exiting (with the default config
    there are no in-epoch snapshots to fall back on)."""
    from ast_tpu.cli import train as train_cli
    from ast_tpu.train import trainer
    from ast_tpu.train.checkpoint import checkpoint_path

    orig = trainer.NN.train_epoch

    def finish_then_preempt(self, *a, **k):
        loss = orig(self, *a, **k)
        self.request_preempt()  # SIGTERM delivered as the loop ends
        return loss

    monkeypatch.setattr(trainer.NN, "train_epoch", finish_then_preempt)
    exp = make_tiny_experiment(str(tmp_path), n_train=8, n_dev=4,
                               batch_size=4)
    # -e 3 with iters_save=2: epoch 1 is NOT save-eligible on its own
    train_cli.main(["-m", exp, "-e", "3"])

    assert os.path.exists(checkpoint_path(exp, 1))
    with open(os.path.join(exp, "train.log")) as f:
        assert len(f.read().splitlines()) == 1  # exited after epoch 1
    nn = trainer.NN(exp)
    assert nn.max_epoch == 1  # resume continues at epoch 2
