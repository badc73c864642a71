"""Multi-step dispatch (`extras.steps_per_dispatch`): one jitted
lax.scan advances G stacked same-bucket batches — must be bit-equivalent
to G sequential single-step dispatches, and the dataloader's
``group_runs`` ordering must stay a deterministic permutation so
prefix-based crash resume keeps working."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from ast_tpu.data.dataloader import _group_bucket_runs
from ast_tpu.train.trainer import NN, _group_stream
from tests.conftest import make_tiny_experiment


def test_group_bucket_runs_is_deterministic_permutation():
    rng = np.random.RandomState(0)
    batch_list = [((f"u{i}",), int(rng.randint(4))) for i in range(37)]
    out1 = _group_bucket_runs(list(batch_list), 3)
    out2 = _group_bucket_runs(list(batch_list), 3)
    assert out1 == out2
    assert sorted(map(str, out1)) == sorted(map(str, batch_list))
    # runs of the same bucket, length <= 3 except where forced by supply
    runs = []
    for item in out1:
        if runs and runs[-1][0] == item[1]:
            runs[-1][1] += 1
        else:
            runs.append([item[1], 1])
    # every full run is exactly 3; short runs only when the bucket has
    # fewer remaining entries (i.e. at most one short run per bucket tail
    # is not guaranteed in general, but total entries per bucket match)
    from collections import Counter
    per_bucket = Counter(b for _, b in batch_list)
    emitted = Counter()
    for b, n in runs:
        emitted[b] += n
    assert emitted == per_bucket


def test_group_stream_chunks_same_bucket():
    batches = [{"bucket": b} for b in (1, 1, 1, 2, 2, 1, 3)]
    groups = list(_group_stream(iter(batches), 2))
    assert [[g["bucket"] for g in grp] for grp in groups] == \
        [[1, 1], [1], [2, 2], [1], [3]]


@pytest.mark.slow
def test_multi_step_matches_sequential_singles(tmp_path):
    G = 2
    exp = make_tiny_experiment(
        str(tmp_path), n_train=16, n_dev=4, batch_size=4,
        extras={"steps_per_dispatch": G})
    nn = NN(exp)
    assert nn._train_multi_step is not None

    # first full same-bucket run from the grouped stream
    gen = nn.data_loader.get_batch(4, "tiny_train", train=True,
                                   labels=True, epoch=0, group_runs=G)
    group = None
    for grp in _group_stream(gen, G):
        if len(grp) == G:
            group = grp
            break
    assert group is not None, "no full run in the tiny stream"

    kind, payload = nn._device_group(group)
    assert kind == "multi"
    epoch_key = jax.random.PRNGKey(7)

    def copy(t):
        return jax.tree.map(jnp.array, t)

    p_m, s_m, o_m, losses_m = nn._train_multi_step(
        copy(nn.params), copy(nn.state), copy(nn.opt_state),
        payload["X"], payload["y"], payload["n_real"], epoch_key, 5)

    p, s, o = copy(nn.params), copy(nn.state), copy(nn.opt_state)
    losses_s = []
    for j, b in enumerate(group):
        db = nn._device_batch(b, True)
        p, s, o, loss = nn._train_step(
            p, s, o, db["X"], db["y"], db["n_real"], epoch_key, 5 + j)
        losses_s.append(float(loss))

    np.testing.assert_allclose(np.asarray(losses_m),
                               np.asarray(losses_s), rtol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_m),
            jax.tree_util.tree_leaves_with_path(p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=f"param mismatch at {pa}")


@pytest.mark.slow
def test_e2e_train_with_multi_dispatch(tmp_path):
    exp = make_tiny_experiment(
        str(tmp_path), n_train=16, n_dev=4, batch_size=4,
        extras={"steps_per_dispatch": 3})
    from ast_tpu.cli import train as train_cli
    train_cli.main(["-m", exp, "-e", "2"])
    import os
    with open(os.path.join(exp, "train.log")) as f:
        rows = [line.strip().split(", ") for line in f]
    assert len(rows) == 2
    losses = [float(r[1]) for r in rows]
    assert all(np.isfinite(l) for l in losses)
    assert losses[1] < losses[0]


def test_crossing_gate_not_stepped_over():
    """The multi-host preemption sync must fire on CROSSING a boundary:
    with variable-size consumed increments (grouped runs + shrunken
    tails) an exact-modulo check can be stepped over for a whole epoch."""
    from ast_tpu.train.trainer import CrossingGate

    # increments of 4 with boundary 10: exact-modulo (x % 10 == 0)
    # never fires on 2,6,12,16,22,26,... — the crossing gate must
    g = CrossingGate(10, start=2)
    seq = [6, 12, 16, 22, 26, 32]
    fired = [c for c in seq if g.crossed(c)]
    assert fired == [12, 22, 32]
    assert all(c % 10 for c in seq), "sequence must dodge exact multiples"

    # multiple crossings in one jump still fire once per check
    g2 = CrossingGate(5)
    assert g2.crossed(17) and not g2.crossed(18) and g2.crossed(20)
