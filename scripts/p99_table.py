"""Committed p99-at-load table for all five BASELINE configs (VERDICT r2
#4): offered Poisson load at ~80% of the relevant sustainable rate,
per-query p50/p99 through batch formation + device scoring + readback,
fused and unfused — the checkable artifact behind BASELINE's "p99 <= 20 ms
at target throughput" (reference metric: per-batch max-over-senders
latency post-processing, cuda_server.c:704-744).

Two operating points per config:
  * fused (fuse=32, device pool): offered = 80% of the scan-measured
    DEVICE rate — the production-shaped dispatch (amortizes this dev
    setup's ~29 ms tunnel RPC floor the way a host-attached chip's cheap
    dispatch does naturally).
  * unfused (fuse=1, device pool): offered = 80% of the measured PER-CALL
    rate of THIS rig.  On the tunneled dev chip the per-call rate is
    RPC-bound (~30 ms/call), so this point characterizes the tunnel, not
    the engine; it is included because the reference's rig is also
    per-batch blocking.  Production fuse=1 p99 ~= batch-fill wait +
    compute (docs/DESIGN.md "tunnel dispatch floor").

Each config runs in its own subprocess (fresh HBM; a hung tunnel readback
costs one config, not the table).  Writes artifacts/P99_TABLE.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/p99_table.py
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("fleetrec_model1", {}, 0),
    ("tiny_dlrm", {}, 0),
    ("fleetrec_model2", {}, 2_000_000),
    ("fleetrec_model3", {}, 1_000_000),
    ("criteo_terabyte", {"dtype": "bfloat16"}, 4_000_000),
]
B = 4096
FUSE = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_one(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving.servebench import run_servebench
    from fleetrec_tpu.utils.timing import DeviceBench

    kw, cap = next((k, c) for n, k, c in CONFIGS if n == name)
    cfg = C.get_config(name, batch_size=B, **kw)
    if cap:
        cfg = dataclasses.replace(
            cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, cap))
                              for t in cfg.tables))
    t0 = time.time()
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables)
    log(f"[{name}] init {time.time()-t0:.0f}s")

    # device rate (scan+readback, the only trustworthy method here)
    rng = np.random.default_rng(0)
    K = 8
    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.rows, (K, B)) for t in cfg.tables], 2).astype(np.int32))
    dense = (jnp.asarray(rng.uniform(-1, 1, (K, B, cfg.dense_dim)).astype(np.float32))
             if cfg.dense_dim else None)

    def step(p, x):
        if dense is not None:
            return model.forward(p, x[0], x[1])
        return model.forward(p, x, None)

    r = DeviceBench(step).measure(params, (idx, dense) if dense is not None else idx)
    device_qps = B / (r["per_iter_ms"] / 1e3)
    log(f"[{name}] device rate {device_qps/1e6:.2f} M q/s "
        f"({r['per_iter_ms']:.2f} ms/batch)")

    # per-call rate of this rig (fuse=1, device pool): time blocking calls
    fwd = jax.jit(model.forward)
    i0 = idx[0]
    d0 = None if dense is None else dense[0]
    np.asarray(fwd(params, i0, d0)[:1])
    t0 = time.time()
    REPS = 8
    for _ in range(REPS):
        np.asarray(fwd(params, i0, d0)[:1])
    percall_s = (time.time() - t0) / REPS
    unfused_qps = B / percall_s
    log(f"[{name}] per-call rate {unfused_qps/1e3:.0f} K q/s "
        f"({percall_s*1e3:.1f} ms/call)")

    out = {"batch": B, "device_qps": round(device_qps, 1),
           "ms_per_batch_device": round(r["per_iter_ms"], 4),
           "percall_ms": round(percall_s * 1e3, 2)}
    for mode, fuse, rate in (("fused", FUSE, device_qps),
                             ("unfused", 1, unfused_qps)):
        offered = 0.8 * rate
        res = run_servebench(model, params, batch_size=B, offered_qps=offered,
                             duration_s=6.0, max_wait_ms=2.0,
                             device_pool=True, fuse=fuse)
        out[mode] = {
            "fuse": fuse,
            "offered_qps": round(offered, 1),
            "achieved_qps": round(res.achieved_qps, 1),
            "p50_ms": round(res.latency_ms_p50, 2),
            "p99_ms": round(res.latency_ms_p99, 2),
            "max_ms": round(res.latency_ms_max, 2),
            "mean_batch_fill": round(res.mean_batch_fill, 3),
        }
        log(f"[{name}] {mode}: offered {offered/1e6:.2f}M achieved "
            f"{res.achieved_qps/1e6:.2f}M p50 {res.latency_ms_p50:.1f} "
            f"p99 {res.latency_ms_p99:.1f} ms")
    if cap:
        out["rows_capped_at"] = cap
    print(json.dumps(out))


def main():
    results = {}
    for name, _kw, _cap in CONFIGS:
        log(f"=== {name} ===")
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--one", name],
                stdout=subprocess.PIPE, stderr=None, text=True, timeout=1200,
                env=dict(os.environ,
                         PYTHONPATH="/root/.axon_site:" + REPO),
            )
            if p.returncode != 0:
                raise RuntimeError(f"rc={p.returncode}")
            results[name] = json.loads(p.stdout.strip().splitlines()[-1])
        except Exception as e:  # noqa: BLE001
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")
            results[name] = {"error": f"{type(e).__name__}: {e}"}

    art = {
        "what": "per-query p50/p99 at ~80% offered load, fused and unfused "
                "(servebench Poisson rig; latency = arrival -> scores on host)",
        "hardware": "1 tunneled TPU v5e chip (dev setup): per-call dispatch "
                    "carries ~29 ms RPC the production host-attached chip "
                    "does not; fused points amortize it, unfused points "
                    "characterize the tunnel floor (docs/DESIGN.md)",
        "sla_reference": "BASELINE.md p99 <= 20 ms at target throughput; "
                         "reference metric cuda_server.c:704-744",
        "configs": results,
    }
    out_path = os.path.join(REPO, "artifacts", "P99_TABLE.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(art, f, indent=2)
        f.write("\n")
    print(out_path)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
