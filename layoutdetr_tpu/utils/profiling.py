"""Tracing / profiling utilities.

Parity target: the reference's torch.autograd.profiler annotations and
per-phase CUDA event timing (training_loop.py:199-203, 255, 302, 430-435;
torch_utils/misc.py:103-108 @profiled_function) — mapped to the JAX
equivalents: ``jax.profiler`` traces (viewable in TensorBoard /
Perfetto), ``jax.named_scope`` annotations inside jitted code, and a
host-side phase timer whose results surface as ``Timing/<name>`` stats.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict, Optional

import jax


def profiled_function(fn):
    """Annotate a function with a named scope in profiler traces
    (reference: torch_utils/misc.py:103-108)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace for the enclosed block."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Host wall-clock timing of named phases -> Timing/<name> stats.

    The device pipeline is async; ``sync=True`` blocks on a representative
    array to measure true step time (the analogue of the reference's CUDA
    start/end events, training_loop.py:199-203).
    """

    def __init__(self):
        self._start: Dict[str, float] = {}
        self.results: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_array: Optional[jax.Array] = None):
        t0 = time.perf_counter()
        yield
        if sync_array is not None:
            jax.block_until_ready(sync_array)
        self.results[f"Timing/{name}"] = time.perf_counter() - t0
