"""Experiment: per-table row-fetch strategies at increasing table size.

Question behind it: autotune shows the [n, rows_pad, dim] one-hot class
path beating the unified 128-lane take even at 16K-row tables (model2:
5.63 -> 4.56 ms/batch). Is the win (a) narrow fetch (d*4 bytes/slice vs a
512-byte packed row) or (b) small-table locality (VMEM-resident)? Decided
by comparing, at fixed B=4096 over growing table size:

  take128   : jnp.take of packed [P, 128] rows          (current take path)
  oh-packed : onehot[B,P] @ packed [P,128]              (same bytes as take)
  oh-narrow : onehot[B,R] @ unpacked [R, d]             (current one-hot path,
                                                         128/d x HBM bloat)

If oh-narrow wins while oh-packed ~= take128, the win is the narrow fetch
(b is false) and the one-hot threshold trades HBM for speed (planner
accounts it). If oh-packed also wins, packed one-hot should replace take
below the crossover with NO memory cost.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_onehot_vs_take.py
"""

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from fleetrec_tpu.utils.timing import DeviceBench

    B, K = 4096, 32
    d = 8            # model2's dominant dim
    s = 128 // d     # logical rows per packed row
    rng = np.random.default_rng(0)

    for R in (4096, 16384, 65536, 262144, 1048576):
        P = R // s
        packed = jnp.asarray(rng.standard_normal((P, 128)).astype(np.float32))
        narrow = jnp.asarray(rng.standard_normal((R, d)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, R, (K, B)).astype(np.int32))

        def take128(buf, i):
            return jnp.take(buf, i // s, axis=0)  # [B,128]

        def oh_packed(buf, i):
            p = i // s
            iota = jax.lax.broadcasted_iota(jnp.int32, (P,), 0)
            oh = (p[:, None] == iota).astype(jnp.float32)
            return jax.lax.dot_general(
                oh, buf, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def oh_narrow(buf, i):
            iota = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
            oh = (i[:, None] == iota).astype(jnp.float32)
            return jax.lax.dot_general(
                oh, buf, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        row = {"rows": R, "phys_rows": P}
        row["take128_us"] = round(
            DeviceBench(take128).measure(packed, idx)["per_iter_ms"] * 1e3, 1)
        row["oh_packed_us"] = round(
            DeviceBench(oh_packed).measure(packed, idx)["per_iter_ms"] * 1e3, 1)
        row["oh_narrow_us"] = round(
            DeviceBench(oh_narrow).measure(narrow, idx)["per_iter_ms"] * 1e3, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
