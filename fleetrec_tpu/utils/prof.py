"""Profiler hooks — the analog of the reference's nvprof timelines and
Vitis --profile_kernel taps (run_cuda_server.sh:4, FPGA/Makefile:114-117)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/fleetrec_trace", enabled: bool = True):
    """jax.profiler trace context; view with tensorboard/xprof.

    Falls back to a no-op if the backend does not support profiling
    (e.g. tunneled single-chip setups)."""
    if not enabled:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
