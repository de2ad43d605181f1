"""Timing utilities.

The reference instruments with clock_gettime stamps around recv/H2D/matmul
(cuda_server.c:519-624) and nvprof timelines; here the host-side analog is
Timer, and DeviceBench implements the reliable device-throughput
measurement for this project: run K iterations of a step inside one
compiled scan and force completion with a scalar readback (host-side
completion events can be unreliable/asynchronous under tunneled setups;
see bench.py notes).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np


class Timer:
    """Accumulating section timer: with t.section("recv"): ..."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    def section(self, name: str):
        return _Section(self, name)

    def add(self, name: str, dt: float):
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_ms": v / self.counts[k] * 1e3}
            for k, v in self.totals.items()
        }


class _Section:
    def __init__(self, timer, name):
        self.timer, self.name = timer, name

    def __enter__(self):
        self.t0 = time.time()

    def __exit__(self, *exc):
        self.timer.add(self.name, time.time() - self.t0)


class DeviceBench:
    """Scan-based device timer: step_fn(params, x_i) -> scalar-reducible.

    xs has a leading K axis; the whole scan runs as one compiled program
    and a float() readback forces completion.
    """

    def __init__(self, step_fn: Callable, reps: int = 3):
        import jax
        import jax.numpy as jnp

        self.reps = reps

        @jax.jit
        def run(params, xs):
            def body(c, x):
                return c + jnp.sum(step_fn(params, x)).astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

        self._run = run

    def measure(self, params, xs) -> dict:
        import jax

        K = jax.tree_util.tree_leaves(xs)[0].shape[0]
        t0 = time.time()
        float(self._run(params, xs))
        compile_s = time.time() - t0
        times = []
        for _ in range(self.reps):
            t0 = time.time()
            float(self._run(params, xs))
            times.append(time.time() - t0)
        best = min(times)
        return {
            "per_iter_ms": best / K * 1e3,
            "total_s": best,
            "iters": K,
            "compile_s": compile_s,
            "reps_ms": [t * 1e3 for t in times],
        }
