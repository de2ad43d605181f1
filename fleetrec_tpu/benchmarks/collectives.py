"""Collective bandwidth microbenchmarks — the ICI analog of the reference's
iperf_krnl network throughput kernel (FPGA/kernel/user_krnl/iperf_krnl/src/
hls/iperf_client.cpp: client/server with useConn/pkgWordCount/timeInSeconds
knobs). Here the "network" is the chip interconnect and the traffic is the
collectives the serving engine actually uses: the all-gather of per-shard
feature slices and the psum of W1 partial products.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ici_bench(mesh: Mesh, mbytes: int = 64, iters: int = 16) -> Dict:
    """Measure all_gather / psum / ppermute over the mesh "model" axis.

    Payload: mbytes MiB of fp32 per device. Returns achieved GB/s per
    collective (algorithm bandwidth: payload moved per device / time).
    """
    m = mesh.shape["model"]
    n_rows = max(m, 1)
    cols = (mbytes * 2**20) // 4 // 128 or 1
    x = jnp.zeros((n_rows * 8, cols, 16), jnp.float32) + 1.0
    x = jax.device_put(x, NamedSharding(mesh, P("model", None, None)))
    per_dev_bytes = x.nbytes // max(m, 1)

    def timed(step):
        @jax.jit
        def run(x):
            def body(c, _):
                return c + step(x), ()
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))[0]

        float(run(x))
        t0 = time.time()
        float(run(x))
        return (time.time() - t0) / iters

    results = {"model_axis": m, "per_device_mbytes": per_dev_bytes / 2**20}
    if m == 1:
        results["note"] = "single device: collectives are no-ops"
        return results

    spec = P("model", None, None)

    def ag(x):
        y = jax.shard_map(
            lambda lx: jax.lax.all_gather(lx, "model", axis=0, tiled=True),
            mesh=mesh, in_specs=spec, out_specs=P(None, None, None),
            check_vma=False,
        )(x)
        return jnp.sum(y[0, 0, :1])

    def ps(x):
        # psum result is identical on every shard; keeping out_specs=spec
        # just re-tiles it (we only read one element for the data dep).
        y = jax.shard_map(
            lambda lx: jax.lax.psum(lx, "model"),
            mesh=mesh, in_specs=spec, out_specs=spec,
        )(x)
        return jnp.sum(y[0, 0, :1])

    def pp(x):
        def f(lx):
            m_ = jax.lax.axis_size("model")
            return jax.lax.ppermute(lx, "model", [(i, (i + 1) % m_) for i in range(m_)])
        y = jax.shard_map(f, mesh=mesh, in_specs=spec, out_specs=spec)(x)
        return jnp.sum(y[0, 0, :1])

    for name, fn, moved in [
        ("all_gather", ag, per_dev_bytes * (m - 1)),
        ("psum", ps, 2 * per_dev_bytes * (m - 1) / m),
        ("ppermute", pp, per_dev_bytes),
    ]:
        dt = timed(fn)
        results[name] = {
            "ms": round(dt * 1e3, 3),
            "GB_s": round(moved / dt / 1e9, 2),
        }
    return results
