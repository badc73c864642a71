"""Data-parallel (+ tensor-parallel) step compilation.

A new capability vs. the single-GPU reference (SURVEY §2.5): the train step
is jitted over the mesh with batches sharded on 'data' and params laid out
by :mod:`ast_tpu.parallel.mesh`; XLA's SPMD partitioner inserts the
gradient all-reduce (psum over ICI) and any vocab-axis collectives from
the sharding annotations alone — no hand-written communication.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ast_tpu.parallel.mesh import batch_spec, param_spec


def shard_train_step(step, mesh, donate_argnums=()):
    """jit ``step(params, state, opt_state, X, y, n_real, key)`` over mesh.

    Inputs arrive already placed (params replicated / vocab-sharded by
    :func:`ast_tpu.parallel.mesh.replicate`, batches data-sharded by
    :func:`shard_batch`); jit propagates those shardings and the SPMD
    partitioner inserts the gradient all-reduce.
    """
    return jax.jit(step, donate_argnums=donate_argnums)


def shard_eval_step(step, mesh):
    """jit ``step(params, state, X)``; X arrives data-sharded."""
    return jax.jit(step)
