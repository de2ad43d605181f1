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

    def measure_corrected(self, params, xs) -> dict:
        """Two-K differencing (r5): one scan wall carries exactly one
        tunnel RPC+readback, so measure()'s per_iter_ms has an additive
        ~rpc/K term.  Measure the SAME step at K and 4K (xs tiled along
        the leading axis — one extra compile) and difference:
        per_iter_ms = (wall(4K) - wall(K)) / 3K is exact for the device
        term; the residual per-call constant is reported alongside and
        reproduces the independently probed rpc_ms.  Falls back to the
        raw value if the difference is degenerate (tunnel stall)."""
        import jax
        import jax.numpy as jnp

        r = self.measure(params, xs)
        xs4 = jax.tree_util.tree_map(
            lambda a: None if a is None else jnp.concatenate([a] * 4), xs,
            is_leaf=lambda a: a is None)
        r4 = self.measure(params, xs4)
        K = r["iters"]
        dev_ms = (r4["total_s"] - r["total_s"]) / (3 * K) * 1e3
        const_ms = r["total_s"] * 1e3 - K * dev_ms
        degenerate = dev_ms <= 0
        if degenerate:
            dev_ms, const_ms = r["per_iter_ms"], 0.0
        return {
            "per_iter_ms": dev_ms,
            "percall_const_ms": const_ms,
            "raw_per_iter_ms": r["per_iter_ms"],
            "raw_per_iter_ms_4k": r4["per_iter_ms"],
            "iters": K,
            "compile_s": r["compile_s"],
            "degenerate_fallback": degenerate,
        }
