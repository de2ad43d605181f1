"""Gather issue-rate vs row bytes: is XLA's take per-INDEX flat (13.5 ns
issue floor) or per-BYTE bound at sub-512B rows?

docs/DESIGN.md measured 6 ns/row for 16-bit tables on 64-LANE rows
(isolated) but 6x slower end-to-end from sub-128-lane relayouts.  The
untested cell: 16-bit / 8-bit tables at FULL 128 lanes (256 B / 128 B per
row) — if the sequencer is byte-bound below 512 B, model3's 264-take-table
wall (4096 x 264 x 13.5 ns = 14.6 ms) halves or quarters by narrowing the
table dtype while keeping the 128-lane layout that avoids relayouts.
Also measures the full take path (gather + mask-einsum extraction) per
dtype at a model3-like shape, where any relayout cost would reappear.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_gather_dtype.py
One JSON line per measurement; progress on stderr.
"""

import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fleetrec_tpu.utils.timing import DeviceBench

    B, K = 4096, 16
    rng = np.random.default_rng(0)

    # ---- 1. bare gather: [1M, lanes] buffer, 64 indices/query
    R, NIDX = 1 << 20, 4096 * 64
    for lanes in (128, 256):
        base = rng.standard_normal((R, lanes)).astype(np.float32)
        idx = jnp.asarray(rng.integers(0, R, (K, NIDX)).astype(np.int32))
        for dtype in ("float32", "bfloat16", "int8"):
            if dtype == "int8":
                tb = jnp.asarray(
                    np.clip(np.rint(base * 32), -127, 127).astype(np.int8))
            else:
                tb = jnp.asarray(base, dtype=jnp.dtype(dtype))
            r = DeviceBench(lambda t, i: jnp.take(t, i, axis=0)).measure(tb, idx)
            ns = r["per_iter_ms"] * 1e6 / NIDX
            row_bytes = lanes * tb.dtype.itemsize
            log(f"gather [{R},{lanes}] {dtype}: {ns:.2f} ns/row "
                f"({row_bytes} B/row, {row_bytes/ns:.1f} GB/s)")
            print(json.dumps({"exp": "bare_gather", "rows": R, "lanes": lanes,
                              "dtype": dtype, "row_bytes": row_bytes,
                              "ns_per_row": round(ns, 2)}), flush=True)

    # ---- 2. full take path at a model3-like shape: n tables of [100K, 8]
    # packed s=lanes/d rows per phys row, gather + mask-einsum extraction
    n, Rt, d = 64, 100_000, 8
    idx_t = jnp.asarray(rng.integers(0, Rt, (K, B, n)).astype(np.int32))
    for dtype in ("float32", "bfloat16", "int8"):
        jdt = jnp.dtype(dtype)
        lanes = 128
        s = lanes // d
        phys_rows = -(-Rt // s)
        buf = rng.choice([-1.0, 1.0], size=(n * phys_rows, lanes)).astype(np.float32)
        if dtype == "int8":
            tb = jnp.asarray((buf * 64).astype(np.int8))
        else:
            tb = jnp.asarray(buf, dtype=jdt)
        bases = jnp.asarray(np.arange(n) * phys_rows, jnp.int32)

        def take_path(tbuf, ib, s=s, d=d, lanes=lanes):
            phys = bases[None, :] + (ib // s).astype(jnp.int32)
            sub = (ib % s).astype(jnp.int32)
            rows = jnp.take(tbuf, phys.reshape(-1), axis=0).reshape(B, n, s, d)
            iota = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
            if tbuf.dtype == jnp.int8:
                m = (sub[..., None] == iota).astype(jnp.int32)
                e = jnp.einsum("bnsd,bns->bnd", rows.astype(jnp.int32), m)
                return e.astype(jnp.float32) * (2.0 ** -6)
            m = (sub[..., None] == iota).astype(rows.dtype)
            return jnp.einsum("bnsd,bns->bnd", rows, m).astype(jnp.float32)

        r = DeviceBench(take_path).measure(tb, idx_t)
        ns = r["per_iter_ms"] * 1e6 / (B * n)
        log(f"take path n={n} [{Rt},{d}] {dtype} (128 lanes): "
            f"{r['per_iter_ms']:.3f} ms = {ns:.2f} ns/idx")
        print(json.dumps({"exp": "take_extract", "n": n, "rows": Rt, "dim": d,
                          "dtype": dtype, "ms_per_batch": round(r["per_iter_ms"], 4),
                          "ns_per_index": round(ns, 2)}), flush=True)


if __name__ == "__main__":
    main()
