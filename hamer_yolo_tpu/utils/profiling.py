"""Profiling / timing utilities.

TPU equivalent of the reference's ad-hoc timing (line_profiler on main,
time_synchronized pairs, thop FLOPs — SURVEY.md 5): a jax.profiler trace
context for xprof dumps, a block-until-ready stage timer, and an analytic
FLOPs estimator from compiled HLO cost analysis.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hamer_yolo_tpu_trace"):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing with device synchronization.

    Replacement for the reference's time_synchronized() pairs; every
    stage end blocks on the given arrays so async dispatch can't lie.
    """

    def __init__(self):
        self.stages: List[tuple] = []
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    def start(self, name: str) -> None:
        self._name = name
        self._t0 = time.perf_counter()

    def stop(self, *block_on) -> float:
        if block_on:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.stages.append((self._name, dt))
        return dt

    def report(self) -> str:
        total = sum(dt for _, dt in self.stages)
        lines = [f"{n:<24s} {dt * 1e3:8.2f} ms  {dt / total * 100:5.1f}%"
                 for n, dt in self.stages]
        lines.append(f"{'total':<24s} {total * 1e3:8.2f} ms")
        return "\n".join(lines)


def compiled_flops(fn: Callable, *args) -> Dict[str, float]:
    """FLOPs / bytes from XLA's cost analysis of the compiled program
    (thop.profile equivalent, but exact for the compiled graph)."""
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return {
            "flops": float(cost.get("flops", -1)),
            "bytes_accessed": float(cost.get("bytes accessed", -1)),
        }
    except Exception:
        return {"flops": -1.0, "bytes_accessed": -1.0}


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> Dict[str, float]:
    """Median / p90 latency of a jitted callable (block_until_ready)."""
    import numpy as np

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1e3
    return {
        "p50_ms": float(np.percentile(lat_ms, 50)),
        "p90_ms": float(np.percentile(lat_ms, 90)),
        "mean_ms": float(lat_ms.mean()),
    }
