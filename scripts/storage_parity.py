"""On-chip storage-dtype parity artifact (VERDICT r3 #2).

The CPU suite structurally cannot execute bf16 dots (tests/test_ops.py),
so bf16 TABLE-storage lookup correctness was verified nowhere until this
artifact: for all five BASELINE configs x {float32, bfloat16, int8} table
storage, run the full forward with fp32 ACTIVATIONS at
matmul_precision="highest" on the attached TPU and assert the scores are
BIT-EXACT against the float64 oracle.  pm1 table data (+1/-1 rows,
reference convention host/embedding_krnl/host.cpp:282-305) is exactly
representable in every storage dtype (int8 via the power-of-two dequant,
embedding.py::_pow2_scale), dense inputs are +/-1 and weights all-ones,
so the whole chain is exact integer arithmetic — any deviation is a
wrong-row/extraction bug in that storage dtype's lookup path.  This is
the storage analog of the reference's by-construction load exactness
(embedding_krnl.cpp:1049-1068).

Each (config, dtype) runs in its own subprocess (fresh HBM, hang
containment).  Writes artifacts/STORAGE_PARITY.json with a tunnel-health
stamp.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/storage_parity.py
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (config, factory kwargs, row cap) — caps are the bench.py single-chip
# operating points; geometry (dims/offsets/tiers) is unchanged by capping
CONFIGS = [
    ("fleetrec_model1", {}, 0),
    ("tiny_dlrm", {}, 0),
    ("fleetrec_model2", {}, 2_000_000),
    ("fleetrec_model3", {}, 1_000_000),
    ("criteo_terabyte", {}, 4_000_000),
]
DTYPES = ["float32", "bfloat16", "int8"]
B = 256  # parity batch; small keeps per-case chip time low


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_one(name, table_dtype):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model

    kw, cap = next((k, c) for n, k, c in CONFIGS if n == name)
    # fp32 activations + highest precision isolate the lookup/extraction
    # path; only the TABLE storage dtype varies across cases
    cfg = C.get_config(name, batch_size=B, dtype="float32", **kw)
    cfg = dataclasses.replace(
        cfg, table_dtype=table_dtype, matmul_precision="highest")
    if cap:
        cfg = dataclasses.replace(
            cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, cap))
                              for t in cfg.tables))
    cfg.validate()

    t0 = time.time()
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables, mlp_scheme="ones")
    log(f"[{name}/{table_dtype}] init {time.time()-t0:.0f}s")

    rng = np.random.default_rng(7)
    idx_np = np.stack(
        [rng.integers(0, t.rows, size=B) for t in cfg.tables], axis=1
    ).astype(np.int32)
    dense_np = None
    if cfg.dense_dim:
        dense_np = rng.choice([-1.0, 1.0], (B, cfg.dense_dim)).astype(np.float32)

    out = np.asarray(
        jax.jit(model.forward)(
            params, jnp.asarray(idx_np),
            None if dense_np is None else jnp.asarray(dense_np)),
        dtype=np.float64)
    bw = (ref.init_bottom_weights(cfg, "ones")
          if cfg.bottom_mlp is not None else None)
    golden = ref.forward(cfg, tables, ref.init_mlp_weights(cfg, "ones"),
                         idx_np, dense_np, bottom_weights=bw)
    exact = bool(np.array_equal(out.astype(np.float32),
                                golden.astype(np.float32)))
    result = {
        "bitexact": exact,
        "batch": B,
        "n_checked": int(out.size),
        "sample_ours": [float(v) for v in out[:3]],
        "sample_oracle": [float(v) for v in golden[:3]],
    }
    if not exact:
        bad = np.flatnonzero(out.astype(np.float32) != golden.astype(np.float32))
        result["n_mismatch"] = int(bad.size)
        result["first_mismatch"] = {
            "i": int(bad[0]), "ours": float(out[bad[0]]),
            "oracle": float(golden[bad[0]]),
        }
    print(json.dumps(result))
    return 0 if exact else 3


def main():
    import jax  # noqa: F401  (parent process only probes tunnel health)

    from fleetrec_tpu.utils.tunnelhealth import probe

    health = probe()
    log(f"tunnel health: {health}")

    results = {}
    ok = True
    for name, _kw, _cap in CONFIGS:
        results[name] = {}
        for dt in DTYPES:
            log(f"=== {name} / {dt} ===")
            try:
                p = subprocess.run(
                    [sys.executable, __file__, "--one", name, dt],
                    stdout=subprocess.PIPE, stderr=None, text=True,
                    timeout=900,
                    env=dict(os.environ, PYTHONPATH="/root/.axon_site:" + REPO),
                )
                r = json.loads(p.stdout.strip().splitlines()[-1])
                if p.returncode not in (0, 3):
                    raise RuntimeError(f"rc={p.returncode}")
            except Exception as e:  # noqa: BLE001
                r = {"error": f"{type(e).__name__}: {e}"}
            results[name][dt] = r
            ok = ok and r.get("bitexact", False)
            log(f"[{name}/{dt}] -> {r.get('bitexact', r)}")

    art = {
        "what": "full-forward parity per TABLE storage dtype: fp32 "
                "activations, matmul_precision=highest, pm1 data, vs the "
                "float64 oracle — bit-exact required (exact integer chain)",
        "why": "bf16 dots cannot run on the CPU backend, so storage-dtype "
               "lookup correctness is only checkable on-chip "
               "(VERDICT r3 #2); reference analog: by-construction load "
               "exactness, embedding_krnl.cpp:1049-1068",
        "all_bitexact": ok,
        "tunnel_health": health,
        "configs": results,
    }
    out_path = os.path.join(REPO, "artifacts", "STORAGE_PARITY.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=2)
        f.write("\n")
    print(out_path)
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--one":
        sys.exit(run_one(sys.argv[2], sys.argv[3]))
    else:
        sys.exit(main())
