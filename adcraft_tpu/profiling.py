"""Profiling and throughput measurement helpers.

The reference's only performance tooling is ad-hoc ``%timeit`` cells
(SURVEY.md §5). Here: a throughput harness with proper device
synchronization and a jax.profiler trace wrapper.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


def synchronize(x) -> float:
    """Force execution to finish by fetching a scalar.

    On the tunneled axon backend ``block_until_ready`` can return before
    execution completes (observed ~400x timing inflation); pulling a value
    to the host is the reliable barrier.
    """
    return float(jax.numpy.asarray(x).sum())


def measure_steps_per_sec(
    step_fn: Callable,
    init_carry,
    num_steps: int = 10,
    warmup: int = 1,
    items_per_step: int = 1,
) -> Dict[str, float]:
    """Time ``carry, out = step_fn(carry)`` loops with real synchronization.

    Returns steps/s, items/s (e.g. env-steps/s for a batch env), and
    ms/step.
    """
    carry = init_carry
    out = None
    for _ in range(warmup):
        carry, out = step_fn(carry)
    synchronize(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(num_steps):
        carry, out = step_fn(carry)
    synchronize(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    return {
        "ms_per_step": 1e3 * dt / num_steps,
        "steps_per_sec": num_steps / dt,
        "items_per_sec": num_steps * items_per_step / dt,
    }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/adcraft_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    with jax.profiler.trace(logdir):
        yield
