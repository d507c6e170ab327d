"""Named scalar statistics as moment counters, SPMD-synced.

Parity target: torch_utils/training_stats.py — per-name [num, sum,
sum-of-squares] accumulators with cross-replica reduction and a
Collector exposing mean/std since the last flush.

TPU-native model: inside a jitted step, per-batch scalars are plain
outputs of the step function (no global mutable state under jit — XLA
would constant-fold it); the host-side ``Collector`` accumulates the
three moments. Cross-process reduction (multi-host) goes through
``jax.experimental.multihost_utils`` when more than one process exists,
replacing torch.distributed all_reduce (training_stats.py:232-264).
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping

import numpy as np

import jax


class Collector:
    """Accumulates [n, Σx, Σx²] per name; mean()/std() since last update()."""

    def __init__(self, regex: str = ".*"):
        import re

        self._regex = re.compile(regex)
        self._moments: Dict[str, np.ndarray] = {}
        self._cumulative: Dict[str, np.ndarray] = {}
        self._deltas: Dict[str, np.ndarray] = {}

    def report(self, name: str, value) -> None:
        """Accumulate a scalar or array of values under ``name``."""
        if not self._regex.fullmatch(name):
            return
        arr = np.asarray(jax.device_get(value), dtype=np.float64).ravel()
        arr = arr[np.isfinite(arr)]
        m = np.array([arr.size, arr.sum(), np.square(arr).sum()], np.float64)
        self._moments[name] = self._moments.get(name, np.zeros(3)) + m

    def report_dict(self, stats: Mapping[str, object]) -> None:
        for k, v in stats.items():
            self.report(k, v)

    def update(self) -> None:
        """Snapshot deltas since the previous update (training_stats.py:166-183)."""
        self._sync()
        for name, total in self._cumulative.items():
            prev = self._deltas.get(name + "/_prev", np.zeros(3))
            self._deltas[name] = total - prev
            self._deltas[name + "/_prev"] = total.copy()

    def _sync(self) -> None:
        pending = self._moments
        self._moments = {}
        if jax.process_count() > 1 and pending:
            from jax.experimental import multihost_utils

            names = sorted(pending)
            stacked = np.stack([pending[n] for n in names])
            summed = multihost_utils.process_allgather(stacked).sum(axis=0)
            pending = {n: summed[i] for i, n in enumerate(names)}
        for name, m in pending.items():
            self._cumulative[name] = self._cumulative.get(name, np.zeros(3)) + m

    def names(self) -> Iterable[str]:
        return [n for n in self._deltas if not n.endswith("/_prev")]

    def num(self, name: str) -> int:
        return int(self._deltas.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        d = self._deltas.get(name, np.zeros(3))
        return float(d[1] / d[0]) if d[0] > 0 else float("nan")

    def std(self, name: str) -> float:
        d = self._deltas.get(name, np.zeros(3))
        if d[0] <= 1:
            return 0.0 if d[0] == 1 else float("nan")
        mean = d[1] / d[0]
        var = max(d[2] / d[0] - mean * mean, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            name: dict(num=self.num(name), mean=self.mean(name), std=self.std(name))
            for name in self.names()
        }
