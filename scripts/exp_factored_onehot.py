"""Factored (two-level) one-hot lookup vs take vs single-level one-hot.

Mechanism under test (candidate for beating the 13.5 ns/index take floor,
VERDICT r1 #5): split each row id into hi = idx // R2, lo = idx % R2.
Selection becomes
    A[b,n,l,d] = sum_h onehot_hi[b,n,h] * T[n,h,l,d]      (MXU matmul)
    out[b,n,d] = sum_l onehot_lo[b,n,l] * A[b,n,l,d]      (VPU extract)
Cost model per index (v5e, 1925 compares/ns VPU, 197 TFLOP/s bf16 MXU,
819 GB/s HBM):
    compares: (R/R2 + R2) * 0.52 ps      (vs R * 0.52 ps single-level)
    MXU:      2 * R * d / 197e12 s        (the irreducible term)
    A traffic: 8 * R2 * d bytes           (if XLA materializes A)
vs take's flat ~13.5 ns/index.  Predicts a win for R*d <~ 1.3M wherever
the compare wall (one-hot) or the issue floor (take) dominates.

Exactness: both contractions have exactly one nonzero per reduction row, so
selection is exact up to the MXU's operand rounding (same class as the
production one-hot path).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_factored_onehot.py
Writes one JSON line per measurement to stdout.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fleetrec_tpu.utils.timing import DeviceBench

    B, K = 4096, 16
    rng = np.random.default_rng(0)

    # (label, n_tables, rows, dim) — model1's dim-8 take bucket, the
    # one-hot-class top end, and a criteo-ish dim-32 mid table
    CASES = [
        ("m1_take_bucket", 12, 100_000, 8),
        ("onehot_top", 10, 8_192, 8),
        ("onehot_mid", 10, 2_048, 8),
        ("criteo_mid", 4, 32_768, 32),
        ("m1_d16", 2, 500_000, 16),
    ]

    for label, n, R, d in CASES:
        tables = rng.choice([-1.0, 1.0], size=(n, R, d)).astype(np.float32)
        idx_np = rng.integers(0, R, size=(K, B, n)).astype(np.int32)
        idx = jnp.asarray(idx_np)
        golden = np.stack(
            [tables[j, idx_np[0, :, j]] for j in range(n)], axis=1
        )  # [B, n, d]

        results = {}
        log(f"[{label}] n={n} R={R} d={d} — measuring take baseline...")

        # ---- take baseline: pack s=128//d rows per 128-lane physical row,
        # one jnp.take + mask-einsum extraction (the production large path)
        s = 128 // d
        phys_rows = -(-R // s)
        buf = np.zeros((n * phys_rows, 128), np.float32)
        for j in range(n):
            p = np.zeros((phys_rows * s, d), np.float32)
            p[:R] = tables[j]
            buf[j * phys_rows : (j + 1) * phys_rows] = p.reshape(phys_rows, 128)
        buf_j = jnp.asarray(buf)
        base = jnp.asarray(np.arange(n) * phys_rows, jnp.int32)

        def take_path(bufs, ib):
            phys = base[None, :] + (ib // s).astype(jnp.int32)
            sub = (ib % s).astype(jnp.int32)
            rows = jnp.take(bufs, phys.reshape(-1), axis=0).reshape(B, n, s, d)
            iota = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
            m = (sub[..., None] == iota).astype(rows.dtype)
            return jnp.einsum("bnsd,bns->bnd", rows, m)

        r = DeviceBench(take_path).measure(buf_j, idx)
        results["take"] = r["per_iter_ms"]
        log(f"[{label}] take: {r['per_iter_ms']:.3f} ms "
            f"(compile {r['compile_s']:.0f}s)")
        out = np.asarray(jax.jit(take_path)(buf_j, idx[0]))
        assert np.array_equal(out, golden), f"{label}: take mismatch"

        # ---- single-level one-hot (production small path)
        tab_j = jnp.asarray(tables)

        def onehot_path(tab, ib):
            iota = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
            oh = (ib[..., None] == iota).astype(tab.dtype)  # [B, n, R]
            out = jax.lax.dot_general(
                oh, tab, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.float32)  # [n, B, d]
            return out.transpose(1, 0, 2)

        if R <= 16_384:  # compare wall makes bigger R pointless
            r = DeviceBench(onehot_path).measure(tab_j, idx)
            log(f"[{label}] onehot: {r['per_iter_ms']:.3f} ms")
            results["onehot"] = r["per_iter_ms"]
            out = np.asarray(jax.jit(onehot_path)(tab_j, idx[0]))
            assert np.array_equal(out, golden), f"{label}: onehot mismatch"

        # ---- factored hi/lo at several R2
        for R2 in (16, 32, 64, 128, 256):
            R1 = -(-R // R2)
            Tr = np.zeros((n, R1 * R2, d), np.float32)
            Tr[:, :R] = tables
            Tr = Tr.reshape(n, R1, R2 * d)
            Tr_j = jnp.asarray(Tr)

            def factored(tr, ib, R1=R1, R2=R2):
                hi = (ib // R2).astype(jnp.int32)
                lo = (ib % R2).astype(jnp.int32)
                ih = jax.lax.broadcasted_iota(jnp.int32, (R1,), 0)
                il = jax.lax.broadcasted_iota(jnp.int32, (R2,), 0)
                ohh = (hi[..., None] == ih).astype(tr.dtype)  # [B, n, R1]
                ohl = (lo[..., None] == il).astype(tr.dtype)  # [B, n, R2]
                A = jax.lax.dot_general(
                    ohh, tr, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                    preferred_element_type=jnp.float32)  # [n, B, R2*d]
                A = A.transpose(1, 0, 2).reshape(B, n, R2, d)
                return jnp.einsum("bnld,bnl->bnd", A, ohl)

            r = DeviceBench(factored).measure(Tr_j, idx)
            log(f"[{label}] hilo R2={R2}: {r['per_iter_ms']:.3f} ms")
            results[f"hilo_R2={R2}"] = r["per_iter_ms"]
            out = np.asarray(jax.jit(factored)(Tr_j, idx[0]))
            assert np.array_equal(out, golden), f"{label}: hilo R2={R2} mismatch"

        per_idx = {k: v * 1e6 / (B * n) for k, v in results.items()}
        print(json.dumps({
            "case": label, "n": n, "R": R, "d": d, "B": B,
            "ms_per_batch": {k: round(v, 4) for k, v in results.items()},
            "ns_per_index": {k: round(v, 2) for k, v in per_idx.items()},
        }), flush=True)
        log(f"{label}: " + "  ".join(f"{k}={v:.1f}ns" for k, v in per_idx.items()))


if __name__ == "__main__":
    main()
