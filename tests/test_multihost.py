"""Multi-host utilities: disjoint strided batch coverage."""

from ast_tpu.parallel.multihost import shard_batches_for_host


def test_strided_coverage_disjoint_and_complete():
    batches = [f"b{i}" for i in range(10)]
    shards = [
        list(shard_batches_for_host(iter(batches), host_id=h, n_hosts=3))
        for h in range(3)
    ]
    flat = [b for s in shards for b in s]
    assert sorted(flat) == sorted(batches)  # complete
    assert len(set(flat)) == len(flat)      # disjoint
    assert shards[0] == ["b0", "b3", "b6", "b9"]


def test_single_host_identity():
    batches = list(range(5))
    out = list(shard_batches_for_host(iter(batches), host_id=0, n_hosts=1))
    assert out == batches
