"""Profiling / tracing utilities.

The reference has only ad-hoc timing (cuda-synced time_sync, a thop-based op
profiler — utils/torch_utils.py:100-156). Here:

  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory;
  * :func:`profile_op` — compile-aware op benchmarker: reports compile time,
    steady-state latency (scan-length differencing so dispatch/transfer
    overhead cancels) and achieved FLOP/s when given a flop count;
  * :class:`StepTimer` — EMA-smoothed per-stage wall timers for train loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_op(fn: Callable, *args, flops: Optional[float] = None,
               n_short: int = 2, n_long: int = 8, repeats: int = 3) -> dict:
    """Benchmark a jittable fn(*args) -> array.

    The op is scanned n times inside one jit region with a varying dummy
    input folded in, and two scan lengths are differenced — the only robust
    timing on backends with large per-call overhead.
    """

    def make(n):
        @jax.jit
        def f(*a):
            def body(c, i):
                r = fn(*a)
                return c + r.sum().astype(jnp.float32) + 0.0 * i, ()
            s, _ = jax.lax.scan(body, 0.0, jnp.arange(n, dtype=jnp.float32))
            return s
        return f

    f_s, f_l = make(n_short), make(n_long)
    t0 = time.perf_counter()
    jax.block_until_ready(f_s(*args))
    compile_s = time.perf_counter() - t0
    jax.block_until_ready(f_l(*args))

    ts, tl = [], []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f_s(*args))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(f_l(*args))
        tl.append(time.perf_counter() - t0)
    dt = (min(tl) - min(ts)) / (n_long - n_short)
    out = {"compile_s": compile_s, "latency_s": dt}
    if flops:
        out["tflops"] = flops / dt / 1e12
    return out


class StepTimer:
    """Named wall-clock stages with EMA smoothing for progress bars."""

    def __init__(self, smooth: float = 0.9):
        self.smooth = smooth
        self.avg = {}
        self._start = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        prev = self.avg.get(name)
        self.avg[name] = dt if prev is None else (
            self.smooth * prev + (1 - self.smooth) * dt
        )

    def summary(self) -> str:
        return " ".join(f"{k}={v * 1000:.0f}ms" for k, v in self.avg.items())
