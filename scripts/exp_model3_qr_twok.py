"""Two-K (tunnel-clean) confirmation of the model3 squeeze winner
(artifacts/MODEL3_SQUEEZE.json relative sweep): QR on every table above
50K rows (rem=1024) — the 152 x 100K-row d8 factored tables collapse to
Q(98)+R(1024) one-hot pairs, cutting the tier's MXU MACs ~90x, and the
104 take tables compress likewise.  Opt-in compression semantics, NOT
the reference's exact lookup (labeled everywhere).

Writes artifacts/MODEL3_QR_TWOK.json: {B=4096, B=1024} x {exact
baseline, qr>50K rem1024}, two-K method, health-stamped.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_model3_qr_twok.py
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAP, K = 1_000_000, 8

POINTS = [
    ("exact_B4096", 4096, {}),
    ("qr50k_rem1024_B4096", 4096, {"qr_threshold": 50_000, "qr_rem": 1024}),
    ("qr50k_rem1024_B1024", 1024, {"qr_threshold": 50_000, "qr_rem": 1024}),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_point(label):
    import numpy as np

    from fleetrec_tpu import config as C
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.utils.timing import DeviceBench
    from fleetrec_tpu.utils.tunnelhealth import probe

    B, spec = next((b, s) for (n, b, s) in POINTS if n == label)
    cfg = C.fleetrec_model3(batch_size=B)
    cfg = dataclasses.replace(
        cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, CAP))
                          for t in cfg.tables))
    if spec:
        cfg = dataclasses.replace(cfg, **spec)
        cfg.validate()
    t0 = time.time()
    model, params = init_model(cfg)
    init_s = time.time() - t0
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    idx1 = np.stack([rng.integers(0, t.rows, (K, B)) for t in cfg.tables],
                    2).astype(np.int32)
    d1 = rng.uniform(-1, 1, (K, B, cfg.dense_dim)).astype(np.float32)
    bench = DeviceBench(lambda p, x: model.forward(p, x[0], x[1]))
    rK = bench.measure(params, (jnp.asarray(idx1), jnp.asarray(d1)))
    r4K = bench.measure(params, (jnp.asarray(np.concatenate([idx1] * 4)),
                                 jnp.asarray(np.concatenate([d1] * 4))))
    dev_ms = (r4K["total_s"] - rK["total_s"]) / (3 * K) * 1e3
    print(json.dumps({
        "label": label, "batch": B, "scan_K": K, "spec": spec,
        "ms_per_batch": round(dev_ms, 4),
        "inferences_per_sec": round(B / (dev_ms / 1e3), 1),
        "raw_scan_ms": {"K": round(rK["per_iter_ms"], 4),
                        "4K": round(r4K["per_iter_ms"], 4)},
        "percall_const_ms": round(rK["total_s"] * 1e3 - K * dev_ms, 2),
        "n_onehot": model.layout.n_onehot, "n_take": model.layout.n_take,
        "init_s": round(init_s, 1),
        "tunnel_health": probe(),
    }))


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
                f"{results[label]['inferences_per_sec']/1e6:.3f} M inf/s")
        except Exception as e:  # noqa: BLE001
            log(f"  FAILED: {type(e).__name__}: {e}")
            results[label] = {"error": f"{type(e).__name__}: {e}"}
    art = {
        "what": "two-K tunnel-clean confirmation of the model3 squeeze "
                "winner (QR threshold 50K, rem 1024 — COMPRESSION, "
                "opt-in, labeled; exact baseline alongside). Relative "
                "sweep: artifacts/MODEL3_SQUEEZE.json.",
        "points": results,
    }
    path = os.path.join(REPO, "artifacts", "MODEL3_QR_TWOK.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(path)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        run_point(sys.argv[2])
    else:
        main()
