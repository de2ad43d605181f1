"""model3 one-hot/factored-tier squeeze (VERDICT r4 #4).

The tier costs 10.06 of model3's 15.2 ms lookup
(artifacts/MODEL3_STAGES.json).  Mechanism: the factored hi/lo selection
is an MXU matmul whose MACs per index are rows_pad * d REGARDLESS of the
r2 split (r2 only moves compare volume), so exact-lookup levers are
bucketing granularity and the tier thresholds; the big lever is QR
compression (opt-in, not reference-exact): a 100K-row d8 table
decomposes to ~sqrt-row Q/R pairs, cutting the per-index MACs ~150x.

Sweeps, all at the committed SLA operating point B=1024 (SCALING.md) and
rows capped 1M (comparable to MODEL3_STAGES):
  * baseline (int8 default, factor=131072, r2=16)
  * QR with per-knee rem on the mid tier and/or the take tier
  * _BUCKET_FIXED_ROWS (the per-dim DP bucketing constant)
  * onehot_max re-sweep under the factored default
Winner re-measured at B=4096.  Each point runs in its own subprocess
(fresh HBM; a tunnel hang costs one point).  Writes
artifacts/MODEL3_SQUEEZE.json with a tunnel-health stamp per point.

Match: the reference's per-config tuned constants
(embedding_377_krnl/src/hls/constants.hpp:41-43).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_model3_squeeze.py
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# env overrides for CPU smoke tests of the script itself
CAP = int(os.environ.get("SQUEEZE_CAP", 1_000_000))
K = int(os.environ.get("SQUEEZE_K", 16))

# name -> point spec
POINTS = [
    # label, B, dict(qr_threshold, qr_rem, bucket, onehot_max)
    ("baseline_B1024", 1024, {}),
    ("qr_mid_take_rem1024_B1024", 1024, {"qr_threshold": 4096, "qr_rem": 1024}),
    ("qr_mid_take_rem256_B1024", 1024, {"qr_threshold": 4096, "qr_rem": 256}),
    ("qr_above50k_rem1024_B1024", 1024, {"qr_threshold": 50_000, "qr_rem": 1024}),
    ("bucket16k_B1024", 1024, {"bucket": 16_384}),
    ("bucket98k_B1024", 1024, {"bucket": 98_304}),
    ("onehot8k_B1024", 1024, {"onehot_max": 8192}),
    ("onehot2k_B1024", 1024, {"onehot_max": 2048}),
    ("baseline_B4096", 4096, {}),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_point(label):
    import numpy as np

    B, spec = next((b, s) for (n, b, s) in POINTS if n == label)
    from fleetrec_tpu import config as C
    from fleetrec_tpu.models import embedding
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.utils.timing import DeviceBench
    from fleetrec_tpu.utils.tunnelhealth import probe

    if "bucket" in spec:
        # _partition_rows binds its default at def time; the experiment
        # overrides it the same way a config knob would
        embedding._partition_rows.__defaults__ = (spec["bucket"],)
    kw = {}
    if "onehot_max" in spec:
        kw["onehot_max"] = spec["onehot_max"]
    cfg = C.fleetrec_model3(batch_size=B, **kw)
    cfg = dataclasses.replace(
        cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, CAP))
                          for t in cfg.tables))
    if "qr_rem" in spec:
        cfg = dataclasses.replace(cfg, qr_threshold=spec["qr_threshold"],
                                  qr_rem=spec["qr_rem"])
        cfg.validate()
    t0 = time.time()
    model, params = init_model(cfg)
    init_s = time.time() - t0
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.rows, (K, B)) for t in cfg.tables], 2).astype(np.int32))
    dense = jnp.asarray(
        rng.uniform(-1, 1, (K, B, cfg.dense_dim)).astype(np.float32))
    r = DeviceBench(lambda p, x: model.forward(p, x[0], x[1])).measure(
        params, (idx, dense))
    ms = r["per_iter_ms"]
    out = {
        "label": label, "batch": B, "spec": spec, "scan_K": K,
        "ms_per_batch": round(ms, 4),
        "inferences_per_sec": round(B / (ms / 1e3), 1),
        "n_onehot": model.layout.n_onehot, "n_take": model.layout.n_take,
        "init_s": round(init_s, 1),
        "tunnel_health": probe(),
    }
    print(json.dumps(out))


def main():
    results = {}
    for label, _b, _s in POINTS:
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
            log(f"  {results[label]['ms_per_batch']} ms "
                f"({results[label]['inferences_per_sec']/1e3:.0f} K inf/s)")
        except Exception as e:  # noqa: BLE001
            log(f"  FAILED: {type(e).__name__}: {e}")
            results[label] = {"error": f"{type(e).__name__}: {e}"}

    art = {
        "what": "model3 factored-tier squeeze sweep (VERDICT r4 #4): QR "
                "per-knee rem on mid/take tiers, DP bucket constant, "
                "onehot_max, at the B=1024 SLA operating point; rows "
                "capped 1M (comparable to MODEL3_STAGES.json). QR points "
                "are COMPRESSION (opt-in), not reference-exact lookup.",
        "mechanism": "factored hi/lo selection MACs per index = rows_pad*d "
                     "independent of r2; exact-lookup levers only move "
                     "compare volume/bucket padding. QR shrinks rows_pad "
                     "itself (~150x fewer MACs for the 100K d8 tables).",
        "points": results,
    }
    path = os.path.join(REPO, "artifacts", "MODEL3_SQUEEZE.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(path)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        run_point(sys.argv[2])
    else:
        main()
