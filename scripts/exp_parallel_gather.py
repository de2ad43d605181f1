"""Do independent gathers overlap on this chip, or is there ONE serialized
gather sequencer?  (The last untested angle on model3's take floor: its
~104-table gather costs ~13.5 ns x B x n_take serial; if two independent
`jnp.take` ops on disjoint buffers can run concurrently, splitting the
unified buffer into k sub-buffers would cut the wall clock up to k-fold.)

Measures, at fixed total work (NIDX indices over [R,128] fp32):
  one_buffer_one_take   — the current design
  k_buffers_k_takes     — k independent takes on k disjoint buffers,
                          results concatenated (XLA free to interleave)
  one_buffer_k_takes    — k takes on the SAME buffer (aliasing pressure)

If k-way time ~= 1-way time / k: the sequencer parallelizes -> redesign
lead.  If k-way ~= 1-way: serialized issue confirmed -> the DESIGN floor
stands (expected outcome; every other angle measured serial).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_parallel_gather.py
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

    R, L, NIDX, K = 1 << 20, 128, 4096 * 64, 16
    rng = np.random.default_rng(0)
    base = rng.standard_normal((R, L)).astype(np.float32)
    idx = jnp.asarray(rng.integers(0, R, (K, NIDX)).astype(np.int32))

    tb = jnp.asarray(base)
    r = DeviceBench(lambda t, i: jnp.take(t, i, axis=0)).measure(tb, idx)
    ns1 = r["per_iter_ms"] * 1e6 / NIDX
    log(f"one_buffer_one_take: {ns1:.2f} ns/row")
    print(json.dumps({"exp": "one_take", "ns_per_row": round(ns1, 2)}), flush=True)

    for k in (2, 4):
        Rk = R // k
        bufs = tuple(jnp.asarray(base[j * Rk:(j + 1) * Rk]) for j in range(k))
        nk = NIDX // k
        idxk = jnp.asarray(rng.integers(0, Rk, (K, k, nk)).astype(np.int32))

        def k_takes(bs, i, k=k, nk=nk):
            outs = [jnp.take(bs[j], i[j], axis=0) for j in range(k)]
            return jnp.concatenate(outs, axis=0)

        r = DeviceBench(k_takes).measure(bufs, idxk)
        ns = r["per_iter_ms"] * 1e6 / NIDX
        log(f"{k}_buffers_{k}_takes: {ns:.2f} ns/row ({ns1/ns:.2f}x vs 1-take)")
        print(json.dumps({"exp": f"{k}_bufs", "ns_per_row": round(ns, 2),
                          "speedup_vs_one": round(ns1 / ns, 2)}), flush=True)

        def k_takes_same(t, i, k=k):
            outs = [jnp.take(t, i[j], axis=0) for j in range(k)]
            return jnp.concatenate(outs, axis=0)

        idxs = jnp.asarray(rng.integers(0, R, (K, k, nk)).astype(np.int32))
        r = DeviceBench(k_takes_same).measure(tb, idxs)
        ns = r["per_iter_ms"] * 1e6 / NIDX
        log(f"one_buffer_{k}_takes: {ns:.2f} ns/row")
        print(json.dumps({"exp": f"{k}_takes_same_buf", "ns_per_row": round(ns, 2),
                          "speedup_vs_one": round(ns1 / ns, 2)}), flush=True)


if __name__ == "__main__":
    main()
