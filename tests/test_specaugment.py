"""In-graph SpecAugment: mask geometry, determinism, trainer wiring."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ast_tpu.ops.specaugment import frame_lengths, spec_augment
from tests.conftest import make_tiny_experiment


def _batch(lengths, T=50, D=13, fill=1.0):
    X = np.zeros((len(lengths), T, D), np.float32)
    for j, L in enumerate(lengths):
        X[j, :L] = fill
    return jnp.asarray(X)


def test_frame_lengths_padding_and_interior_zeros():
    X = _batch([50, 20, 0, 7])
    # interior zero_input-style dropped frame must not shorten the row
    X = X.at[1, 5].set(0.0)
    np.testing.assert_array_equal(frame_lengths(X), [50, 20, 0, 7])


def test_disabled_masks_are_identity():
    X = _batch([30, 50])
    key = jax.random.PRNGKey(0)
    out = spec_augment(key, X, {"freq_masks": 0, "time_masks": 0})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(X))
    out = spec_augment(key, X, {"freq_masks": 2, "freq_width": 0,
                                "time_masks": 2, "time_width": 0})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(X))


def test_time_masks_land_inside_real_length():
    lengths = [40, 12, 50, 3]
    X = _batch(lengths)
    cfg = {"freq_masks": 0, "time_masks": 2, "time_width": 30}
    hit = False
    for s in range(8):
        out = np.asarray(spec_augment(jax.random.PRNGKey(s), X, cfg))
        for j, L in enumerate(lengths):
            zero_t = np.where(~out[j].any(axis=-1))[0]
            masked = [t for t in zero_t if t < L]
            hit = hit or bool(masked)
            # each of the <=2 masks is one contiguous span of width <=30
            if masked:
                runs = np.split(masked,
                                np.where(np.diff(masked) != 1)[0] + 1)
                assert len(runs) <= 2
                # two masks of width <=30 (they may merge into one run)
                assert sum(len(r) for r in runs) <= 60
            # everything past the real length was zero to begin with
            assert (out[j, L:] == 0).all()
            # unmasked real frames are untouched
            keep_t = [t for t in range(L) if t not in masked]
            assert (out[j, keep_t] == 1).all()
    assert hit  # widths up to 30 on rows this long must mask sometimes


def test_freq_masks_are_contiguous_bands():
    X = _batch([50, 50], D=24)
    cfg = {"freq_masks": 2, "freq_width": 8, "time_masks": 0}
    out = np.asarray(spec_augment(jax.random.PRNGKey(3), X, cfg))
    for j in range(2):
        zero_d = np.where(~out[j, :50].any(axis=0))[0]
        if len(zero_d):
            runs = np.split(zero_d, np.where(np.diff(zero_d) != 1)[0] + 1)
            assert len(runs) <= 2
            assert sum(len(r) for r in runs) <= 16
            # a freq band is zero across ALL real frames
            assert (out[j, :50, zero_d] == 0).all()


def test_time_p_caps_mask_width():
    lengths = [40] * 16
    X = _batch(lengths, T=64)
    cfg = {"freq_masks": 0, "time_masks": 1, "time_width": 64,
           "time_p": 0.1}  # cap = floor(0.1 * 40) = 4
    for s in range(4):
        out = np.asarray(spec_augment(jax.random.PRNGKey(s), X, cfg))
        for j, L in enumerate(lengths):
            masked = np.where(~out[j, :L].any(axis=-1))[0]
            assert len(masked) <= 4


def test_deterministic_and_jittable():
    X = _batch([30, 45, 50])
    cfg = {"freq_masks": 2, "freq_width": 4, "time_masks": 2,
           "time_width": 10}
    key = jax.random.PRNGKey(7)
    a = spec_augment(key, X, cfg)
    b = jax.jit(lambda k, x: spec_augment(k, x, cfg))(key, X)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_trainer_spec_augment_path(tmp_path):
    """A spec_augment config trains (finite decreasing-ish loss) and
    produces different params than the unaugmented run; absence of the
    key leaves the step's key stream untouched (same seed => identical
    params to a baseline build)."""
    from ast_tpu.train.trainer import NN

    def run(root, sa):
        exp = make_tiny_experiment(root)
        if sa is not None:
            cfg_path = os.path.join(exp, "train_cfg.json")
            cfg = json.load(open(cfg_path))
            cfg["data"]["spec_augment"] = sa
            json.dump(cfg, open(cfg_path, "w"))
        nn = NN(exp)
        losses = [nn.train_epoch("tiny_train", epoch=e) for e in (1, 2)]
        return losses, jax.tree.leaves(nn.params)

    sa = {"freq_masks": 2, "freq_width": 3, "time_masks": 2,
          "time_width": 12}
    losses_a, leaves_a = run(str(tmp_path / "a"), sa)
    assert all(np.isfinite(l) for l in losses_a)
    losses_b, leaves_b = run(str(tmp_path / "b"), None)
    losses_c, leaves_c = run(str(tmp_path / "c"), None)
    # augmentation actually perturbed training
    assert any(not np.array_equal(x, y)
               for x, y in zip(leaves_a, leaves_b))
    # and the disabled path is bit-reproducible across builds
    for x, y in zip(leaves_b, leaves_c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_true_lengths_override_inference():
    """Passing the loader's true lengths beats the last-nonzero
    heuristic: a row whose FINAL real frame was zeroed (zero_input can
    do this) still masks within its true extent, and a dummy all-zero
    row with length 0 stays untouched."""
    lengths = [40, 40, 0]
    X = np.array(_batch([40, 40, 5]))
    X[1, 39] = 0.0      # final real frame zeroed: heuristic says 39
    X[2] = 0.0
    X[2, :5] = 1.0      # "dummy" row with stale data; true length 0
    X = jnp.asarray(X)
    cfg = {"freq_masks": 0, "time_masks": 2, "time_width": 30}
    for s in range(6):
        out = np.asarray(spec_augment(
            jax.random.PRNGKey(s), X, cfg,
            lengths=jnp.asarray(lengths, jnp.int32)))
        # row 2: length 0 => no time mask touches it
        np.testing.assert_array_equal(out[2], np.asarray(X)[2])
        for j in (0, 1):
            masked = np.where(~out[j, :40].any(axis=-1))[0]
            masked = [t for t in masked if t != 39]  # 39 already zero in row 1
            if masked:
                runs = np.split(np.asarray(masked),
                                np.where(np.diff(masked) != 1)[0] + 1)
                assert sum(len(r) for r in runs) <= 60


def test_loader_emits_true_frame_lengths(tmp_path):
    """Every dataloader batch carries frame_len == the true per-row
    frame count (dummy rows 0), even when zero_input dropout zeroes
    frames."""
    from ast_tpu.train.trainer import NN

    exp = make_tiny_experiment(str(tmp_path), n_train=8, batch_size=4)
    cfg_path = os.path.join(exp, "train_cfg.json")
    cfg = json.load(open(cfg_path))
    cfg["data"]["zero_input"] = 3
    json.dump(cfg, open(cfg_path, "w"))
    nn = NN(exp)
    seen = 0
    for batch in nn.data_loader.get_batch(4, "tiny_train", train=True,
                                          labels=True, epoch=0):
        fl = batch["frame_len"]
        assert fl.shape == (batch["rows"],)
        n_real = batch["n_real"]
        assert (fl[:n_real] > 0).all()
        assert (fl[n_real:] == 0).all()
        T = batch["X"].shape[1]
        assert (fl <= T).all()
        # real frames exist at fl-1... but zero_input may have zeroed
        # them — the POINT of carrying true lengths; just check padding
        for j in range(n_real, batch["rows"]):
            assert not batch["X"][j].any()
        seen += 1
    assert seen > 0
