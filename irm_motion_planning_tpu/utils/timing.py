"""Measurement harness: compile-excluded timing with mean/stddev.

Capability parity with the reference harness (ref: main.py:117-129): warm-up
run excluded (compile), `jax.block_until_ready` around the timed region,
``n_measurements`` x ``n_times`` repeats reported as mean (stddev) ms.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List

import jax
import numpy as np


@dataclass
class TimingReport:
    per_measurement_ms: List[float]
    mean_ms: float
    stddev_ms: float
    compile_ms: float

    def __str__(self) -> str:
        return (
            f"mean {self.mean_ms:.3f} ms, stddev {self.stddev_ms:.3f} ms "
            f"(compile {self.compile_ms:.0f} ms, "
            f"{len(self.per_measurement_ms)} measurements)"
        )


def time_fn(
    fn: Callable[[], object],
    n_measurements: int = 1,
    n_times: int = 1,
    warmup: bool = True,
) -> TimingReport:
    """Time ``fn`` like the reference does (ref: main.py:117-129): per
    measurement, run it ``n_times`` and record the per-call average; report
    mean/stddev over measurements."""
    compile_ms = 0.0
    if warmup:
        t0 = time.time()
        jax.block_until_ready(fn())
        compile_ms = 1000 * (time.time() - t0)

    runtimes = []
    for _ in range(n_measurements):
        t0 = time.time()
        for _ in range(n_times):
            result = fn()
            jax.block_until_ready(result)
        t1 = time.time()
        runtimes.append(1000 * (t1 - t0) / n_times)
    return TimingReport(
        per_measurement_ms=runtimes,
        mean_ms=float(np.mean(runtimes)),
        stddev_ms=float(np.std(runtimes)),
        compile_ms=compile_ms,
    )
