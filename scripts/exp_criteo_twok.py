"""Two-K (tunnel-clean) device times for the criteo variants that decide
SCALING.md's criteo verdict: int8 tables (the forced (4 data, 4 model)
full-cardinality split) and QR compression at FULL cardinality.

The r4 records for these used the single-scan method (wall/K), which
carries ~rpc/K of tunnel smear per batch (see bench.py r5 docstring) —
at criteo's ~1-1.4 ms true per-batch time that smear is >50%.  This
script re-measures both with (wall(4K)-wall(K))/3K and writes
artifacts/CRITEO_TWOK.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_criteo_twok.py
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B, K = 4096, 16

POINTS = [
    ("int8_cap4M", dict(table_dtype="int8"), 4_000_000, {}),
    ("bf16_cap4M", dict(), 4_000_000, {}),
    ("qr_full", dict(qr_threshold=1_000_000, qr_rem=131072), 0, {}),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_point(label):
    import numpy as np

    from fleetrec_tpu import config as C
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.utils.timing import DeviceBench
    from fleetrec_tpu.utils.tunnelhealth import probe

    kw, cap, _x = next((k, c, x) for n, k, c, x in POINTS if n == label)
    cfg = C.criteo_terabyte(batch_size=B, **kw)
    if cap:
        cfg = dataclasses.replace(
            cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, cap))
                              for t in cfg.tables))
    t0 = time.time()
    model, params = init_model(cfg)
    init_s = time.time() - t0
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    idx1 = np.stack([rng.integers(0, t.rows, (K, B)) for t in cfg.tables],
                    2).astype(np.int32)
    d1 = rng.uniform(-1, 1, (K, B, cfg.dense_dim)).astype(np.float32)
    bench = DeviceBench(lambda p, x: model.forward(p, x[0], x[1]))
    rK = bench.measure(params, (jnp.asarray(idx1), jnp.asarray(d1)))
    r4K = bench.measure(params, (jnp.asarray(np.concatenate([idx1] * 4)),
                                 jnp.asarray(np.concatenate([d1] * 4))))
    dev_ms = (r4K["total_s"] - rK["total_s"]) / (3 * K) * 1e3
    const_ms = rK["total_s"] * 1e3 - K * dev_ms
    out = {
        "label": label, "batch": B, "scan_K": K,
        "table_dtype": cfg.table_dtype, "qr_rem": cfg.qr_rem,
        "rows_capped_at": cap or None,
        "ms_per_batch": round(dev_ms, 4),
        "inferences_per_sec": round(B / (dev_ms / 1e3), 1),
        "raw_scan_ms": {"K": round(rK["per_iter_ms"], 4),
                        "4K": round(r4K["per_iter_ms"], 4)},
        "percall_const_ms": round(const_ms, 2),
        "init_s": round(init_s, 1),
        "tunnel_health": probe(),
    }
    print(json.dumps(out))


def main():
    results = {}
    for label, *_ in POINTS:
        log(f"=== {label} ===")
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--one", label],
                stdout=subprocess.PIPE, stderr=None, text=True, timeout=1500,
                env=dict(os.environ, PYTHONPATH="/root/.axon_site:" + REPO),
            )
            if p.returncode != 0:
                raise RuntimeError(f"rc={p.returncode}")
            results[label] = json.loads(p.stdout.strip().splitlines()[-1])
            log(f"  {results[label]['ms_per_batch']} ms = "
                f"{results[label]['inferences_per_sec']/1e6:.2f} M inf/s")
        except Exception as e:  # noqa: BLE001
            log(f"  FAILED: {type(e).__name__}: {e}")
            results[label] = {"error": f"{type(e).__name__}: {e}"}
    art = {
        "what": "two-K tunnel-clean device times for the criteo variants "
                "behind SCALING.md's verdict (int8 = the (4,4) "
                "full-cardinality split's dtype; qr_full = opt-in "
                "compression at full 1.655B-row cardinality on ONE chip)",
        "points": results,
    }
    path = os.path.join(REPO, "artifacts", "CRITEO_TWOK.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(path)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        run_point(sys.argv[2])
    else:
        main()
