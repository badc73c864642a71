"""Multi-host (DCN) coordination.

New capability vs. the single-process reference (SURVEY §2.5).  Model:
every host runs the same program; ``jax.distributed`` handles the global
device mesh; the *data* pipeline is split by giving every host the same
deterministic batch list (same experiment seed => same shuffles) and
striding it by process index — bucket boundaries are respected because
striding happens after bucketing/batching.  Gradient all-reduce rides
ICI within a slice and DCN across slices, inserted by XLA from the mesh
shardings; per-host RNG is decorrelated by folding the process index
into the step key.
"""

import jax


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize jax.distributed when running multi-process; no-op (and
    safe) for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_info():
    """(process_index, process_count) of this host."""
    return jax.process_index(), jax.process_count()


def shard_batches_for_host(batch_iter, host_id=None, n_hosts=None):
    """Stride a deterministic batch stream so each host consumes a
    disjoint subset.  All hosts must build the identical stream (same
    seed) — then host h takes batches h, h+n, h+2n, ..."""
    if host_id is None or n_hosts is None:
        host_id, n_hosts = host_info()
    for i, batch in enumerate(batch_iter):
        if i % n_hosts == host_id:
            yield batch


def fold_host_into_key(key, host_id=None):
    """Per-host RNG decorrelation for dropout/noise streams."""
    if host_id is None:
        host_id = jax.process_index()
    return jax.random.fold_in(key, host_id)
