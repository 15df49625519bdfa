"""Tracing / profiling helpers (SURVEY.md §5 aux subsystem).

- ``trace(path)``: context manager around ``jax.profiler`` for TensorBoard
  traces of train/eval steps.
- ``step_timer``: wall-clock step timing with device synchronization via
  host fetch (``block_until_ready`` is unreliable over tunneled backends —
  see bench.py).
- ``annotate``: named trace regions.
- ``count_params`` / ``flops_estimate``: the param-count / FLOPs prints the
  reference smoke tests do ad hoc (``ReLayNet_2017.py:225``,
  ``Masood_2024.py:305-307``), as utilities.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def step_timer(record: dict, key: str = "step_time_s"):
    t0 = time.perf_counter()
    yield
    record[key] = time.perf_counter() - t0


def sync(tree):
    """Force completion by fetching a scalar reduction to host."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        float(jnp.sum(leaves[0]).astype(jnp.float32))
    return tree


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def flops_estimate(fn, *args) -> float | None:
    """XLA-reported FLOPs estimate for a jitted function, if available."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None
