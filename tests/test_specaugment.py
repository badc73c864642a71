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
