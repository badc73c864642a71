"""Profiling / throughput observability.

The reference has no profiling at all (SURVEY §5: tqdm bars only); the
north-star metric is utterances/sec/chip, so it is a first-class counter
here, plus ``jax.profiler`` trace capture for kernel-level analysis.
"""

import contextlib
import time

import jax


class StepTimer:
    """Wall-clock + items/sec accounting across steps."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.total_items = 0
        self.n_steps = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items=0):
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.total_time += dt
        self.total_items += n_items
        self.n_steps += 1

    def add(self, dt, n_items, n_steps=1):
        """Record an externally-timed region (e.g. a whole epoch measured
        wall-clock including the final device sync — per-step stop() on
        async dispatch would measure enqueue rate, not execution)."""
        self.total_time += dt
        self.total_items += n_items
        self.n_steps += n_steps

    @property
    def items_per_sec(self):
        return self.total_items / self.total_time if self.total_time else 0.0

    @property
    def sec_per_step(self):
        return self.total_time / self.n_steps if self.n_steps else 0.0


@contextlib.contextmanager
def profile_trace(logdir):
    """Capture a jax.profiler trace (open with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_tree(tree):
    """Block until all arrays in a pytree are computed (for timing)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
