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
    """jit ``step(params, state, opt_state, X, y, n_real, key)`` over mesh."""
    repl = NamedSharding(mesh, P())
    data4 = NamedSharding(mesh, P("data", None, None))
    data2 = NamedSharding(mesh, P("data", None))

    def wrapped(params, state, opt_state, X, y, n_real, key):
        return step(params, state, opt_state, X, y, n_real, key)

    jitted = jax.jit(
        wrapped,
        donate_argnums=donate_argnums,
        in_shardings=(None, None, None, data4, data2, repl, repl),
        out_shardings=None,
    )
    return jitted


def shard_eval_step(step, mesh):
    """jit ``step(params, state, X)`` with X sharded on 'data'."""
    data4 = NamedSharding(mesh, P("data", None, None))
    return jax.jit(step, in_shardings=(None, None, data4))
