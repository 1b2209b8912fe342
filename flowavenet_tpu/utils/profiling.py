"""Profiling / tracing hooks (SURVEY §5.1 rebuild item).

The reference only prints wall-clock per step (train.py:236-239).  Here:
* ``trace(logdir)``: jax.profiler trace context (view in TensorBoard/XProf);
* ``StepTimer``: wall-clock stats with compile-step exclusion;
* ``device_memory_stats``: live HBM usage of the addressable devices.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    skip_first: int = 1          # exclude compile step(s)
    times: list = field(default_factory=list)
    _t0: float = 0.0
    _count: int = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def best(self) -> float:
        return min(self.times) if self.times else 0.0


def device_memory_stats() -> list[dict]:
    import jax

    out = []
    for d in jax.local_devices():
        try:
            s = d.memory_stats() or {}
            out.append({
                "device": str(d),
                "bytes_in_use": s.get("bytes_in_use", -1),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", -1),
            })
        except Exception:
            out.append({"device": str(d), "bytes_in_use": -1,
                        "peak_bytes_in_use": -1})
    return out
