"""Committed p99-at-load table for all five BASELINE configs — now with the
latency decomposition and a production-p99 bound that excludes the tunnel
term (VERDICT r3 #5; reference metric: per-batch max-over-senders latency
post-processing, cuda_server.c:704-744).

Three operating points per config:
  * production_sim: the servebench loop (same arrivals, batching, bounded
    in-flight window) with service time = the DeviceBench-MEASURED
    per-batch device ms + the MEASURED production dispatch
    (artifacts/DISPATCH.json: real ingest loop with a stub scorer +
    compiled-call overhead + bounded H2D; scripts/measure_dispatch.py),
    offered at 80% of the modeled rate.  This is the committed
    production-p99 bound: every term is measured on this rig except the
    H2D staging bound (slot bytes / 10 GB/s, stated) — the tunnel does
    not appear.  SLA verdict (p99 <= 20 ms, BASELINE.md) is computed
    from this point.  (r3/r4 used a stated 0.3 ms dispatch constant —
    VERDICT r4 retired it.)
  * fused (fuse=32, device pool): the real chip behind the tunnel with the
    RPC floor amortized — demonstrates the engine sustains ~the device
    rate end-to-end on THIS rig.
  * unfused (fuse=1, device pool): characterizes the tunnel per-call floor
    (kept for continuity with r2/r3 artifacts; not SLA-relevant).

Every run stamps artifacts/P99_TABLE.json with a tunnel-health probe
(utils/tunnelhealth.py) so cross-artifact rate discrepancies are
attributable to the window they were captured in (VERDICT r3 weak #3).

Each config runs in its own subprocess (fresh HBM; a hung tunnel readback
costs one config, not the table).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/p99_table.py
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, kwargs, row cap, scan length K).  K matches bench.py per config
# so the device rates here agree with BENCH_r{N} — the r3 artifact used
# K=8 everywhere, which puts rpc_ms/K (~3-5 ms/batch) of tunnel smear on
# fast configs and made its rates disagree 3.8x with the bench
# (VERDICT r3 weak #3; DeviceBench per_iter = scan wall incl. ONE
# RPC+readback, divided by K).
CONFIGS = [
    ("fleetrec_model1", {}, 0, 64),
    ("tiny_dlrm", {}, 0, 32),
    ("fleetrec_model2", {}, 2_000_000, 16),
    ("fleetrec_model3", {}, 1_000_000, 8),
    ("criteo_terabyte", {}, 4_000_000, 16),
]
B = 4096
FUSE = 32
SLA_P99_MS = 20.0       # BASELINE.md


def dispatch_ms(name: str, bsz: int) -> tuple:
    """MEASURED production dispatch for (config, batch) from
    artifacts/DISPATCH.json (scripts/measure_dispatch.py: real ingest->
    parse->validate->submit->drain loop with a stub scorer + compiled-call
    overhead + H2D staging bound).  Replaces the r3/r4 stated 0.3 ms
    constant (VERDICT r4 #2).  Falls back loudly if the artifact is
    missing — run measure_dispatch.py first."""
    path = os.path.join(REPO, "artifacts", "DISPATCH.json")
    with open(path) as f:
        d = json.load(f)["configs"][name][f"B{bsz}"]
    basis = (f"measured device ms (scan+readback) + measured "
             f"{d['host_loop_ms_per_batch'] + d['py_dispatch_ms']:.3f} ms "
             f"host dispatch + bounded {d['h2d_bound_ms']:.3f} ms H2D "
             f"(artifacts/DISPATCH.json); real engine loop, no tunnel term")
    return d["dispatch_total_ms"], basis


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _round_res(res):
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in res.to_json().items()}


def run_one(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.serving.servebench import run_servebench
    from fleetrec_tpu.utils.timing import DeviceBench
    from fleetrec_tpu.utils.tunnelhealth import probe

    kw, cap, K = next((k, c, kk) for n, k, c, kk in CONFIGS if n == name)
    cfg = C.get_config(name, batch_size=B, **kw)
    if cap:
        cfg = dataclasses.replace(
            cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, cap))
                              for t in cfg.tables))
    t0 = time.time()
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables)
    log(f"[{name}] init {time.time()-t0:.0f}s")

    # device rate via TWO-K differencing: one scan wall carries ONE
    # tunnel RPC + readback, so wall(K)/K has an additive rpc/K smear
    # that the "tunnel excluded" sim must not inherit (a ~3 ms/batch
    # smear at K=8 flipped model3's B=1024 SLA verdict between otherwise
    # comparable windows).  wall(4K) - wall(K) cancels the additive term
    # EXACTLY: device_ms = (wall4K - wallK) / 3K.  The residual constant
    # a = wallK - K*device_ms is the per-call tunnel+dispatch term —
    # reported as the K-scan-extrapolated per-call bound (VERDICT r4 #2).
    rng = np.random.default_rng(0)

    def two_k(bsz):
        idx1 = np.stack([rng.integers(0, t.rows, (K, bsz))
                         for t in cfg.tables], 2).astype(np.int32)
        idx4 = np.concatenate([idx1] * 4)
        d1 = (rng.uniform(-1, 1, (K, bsz, cfg.dense_dim)).astype(np.float32)
              if cfg.dense_dim else None)
        d4 = None if d1 is None else np.concatenate([d1] * 4)

        def step(p, x):
            if cfg.dense_dim:
                return model.forward(p, x[0], x[1])
            return model.forward(p, x, None)

        def run(i, d):
            i = jnp.asarray(i)
            dd = None if d is None else jnp.asarray(d)
            return DeviceBench(step).measure(
                params, (i, dd) if dd is not None else i)

        rK = run(idx1, d1)
        r4K = run(idx4, d4)
        dev_ms = (r4K["total_s"] - rK["total_s"]) / (3 * K) * 1e3
        const_ms = rK["total_s"] * 1e3 - K * dev_ms  # per-call tunnel term
        return dev_ms, const_ms, rK["per_iter_ms"], r4K["per_iter_ms"]

    device_ms, const_ms, raw_k, raw_4k = two_k(B)
    device_qps = B / (device_ms / 1e3)
    health = probe()
    log(f"[{name}] device rate {device_qps/1e6:.2f} M q/s "
        f"({device_ms:.2f} ms/batch; raw scan {raw_k:.2f}@K={K} / "
        f"{raw_4k:.2f}@4K; per-call const {const_ms:.1f} ms); tunnel rpc "
        f"{health['rpc_ms']} ms h2d {health['h2d_mbps']} MB/s")

    # smaller batch for the latency-optimal production point: per-query
    # lookup cost is per-index flat (docs/DESIGN.md), so B=1024 keeps the
    # rate while quartering per-batch service time — what decides the
    # 20 ms SLA for the slow-batch configs (model3: 15 ms at B=4096).
    B2 = 1024
    device_ms_b2, const_ms_b2, raw_k2, raw_4k2 = two_k(B2)
    device_qps_b2 = B2 / (device_ms_b2 / 1e3)
    log(f"[{name}] device rate @B={B2}: {device_qps_b2/1e6:.2f} M q/s "
        f"({device_ms_b2:.2f} ms/batch; per-call const {const_ms_b2:.1f} ms)")

    # per-call rate of this rig (fuse=1, device pool): time blocking calls
    fwd = jax.jit(model.forward)
    rng2 = np.random.default_rng(1)
    i0 = jnp.asarray(np.stack([rng2.integers(0, t.rows, B)
                               for t in cfg.tables], 1).astype(np.int32))
    d0 = (jnp.asarray(rng2.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32))
          if cfg.dense_dim else None)
    np.asarray(fwd(params, i0, d0)[:1])
    t0 = time.time()
    REPS = 8
    for _ in range(REPS):
        np.asarray(fwd(params, i0, d0)[:1])
    percall_s = (time.time() - t0) / REPS
    unfused_qps = B / percall_s
    log(f"[{name}] per-call rate {unfused_qps/1e3:.0f} K q/s "
        f"({percall_s*1e3:.1f} ms/call)")

    out = {"batch": B, "scan_K": K,
           "device_qps": round(device_qps, 1),
           "ms_per_batch_device": round(device_ms, 4),
           "batch_small": B2, "device_qps_small": round(device_qps_b2, 1),
           "ms_per_batch_device_small": round(device_ms_b2, 4),
           "method": "two-K differencing: (wall(4K)-wall(K))/3K — cancels "
                     "the per-call tunnel RPC+readback term the single-"
                     "scan method smears in at rpc/K",
           "raw_scan_ms_per_batch": {"K": round(raw_k, 4),
                                     "4K": round(raw_4k, 4),
                                     "K_small": round(raw_k2, 4),
                                     "4K_small": round(raw_4k2, 4)},
           # K-scan-extrapolated per-call constant (tunnel RPC + readback
           # + dispatch on THIS rig) — the bound VERDICT r4 #2 asked for
           "percall_const_ms_extrapolated": round(const_ms, 2),
           "percall_const_ms_extrapolated_small": round(const_ms_b2, 2),
           "percall_ms": round(percall_s * 1e3, 2),
           "tunnel_health": health}

    # production-p99 bound: measured device ms + MEASURED production
    # dispatch (artifacts/DISPATCH.json; was a stated 0.3 ms through r4),
    # through the real engine loop at 80% of the modeled rate.
    # Two batch sizes: B=4096 (throughput-shaped) and B=1024 (latency-
    # shaped); the SLA verdict is the better of the two operating points.
    for key, bsz, dms, dqps in (
        ("production_sim", B, device_ms, device_qps),
        ("production_sim_small_batch", B2, device_ms_b2, device_qps_b2),
    ):
        # offered = 80 % of the MODELED capacity (device + dispatch) —
        # basing it on the device-only rate overloads the system when the
        # dispatch is comparable to the per-batch device time.  The
        # dispatch is serialized with the device term here — conservative:
        # bg_drain overlaps the next batch's parse with the readback.
        disp, basis = dispatch_ms(name, bsz)
        service = dms + disp
        sim = run_servebench(
            None, None, batch_size=bsz,
            offered_qps=0.8 * bsz / (service / 1e3),
            duration_s=8.0, max_wait_ms=2.0,
            simulate_service_ms=service)
        out[key] = {
            **_round_res(sim),
            "batch": bsz,
            "dispatch_ms": round(disp, 3),
            "service_model_ms": round(service, 3),
            "basis": basis,
            "sla_p99_ms": SLA_P99_MS,
            "meets_sla": bool(sim.latency_ms_p99 <= SLA_P99_MS),
        }
        log(f"[{name}] {key} (B={bsz}): offered {sim.offered_qps/1e6:.2f}M "
            f"achieved {sim.achieved_qps/1e6:.2f}M p50 {sim.latency_ms_p50:.1f} "
            f"p99 {sim.latency_ms_p99:.1f} ms "
            f"({'MEETS' if sim.latency_ms_p99 <= SLA_P99_MS else 'MISSES'} "
            f"{SLA_P99_MS} ms SLA)")
    out["meets_sla_any"] = bool(
        out["production_sim"]["meets_sla"]
        or out["production_sim_small_batch"]["meets_sla"])

    for mode, fuse, rate in (("fused", FUSE, device_qps),
                             ("unfused", 1, unfused_qps)):
        offered = 0.8 * rate
        res = run_servebench(model, params, batch_size=B, offered_qps=offered,
                             duration_s=6.0, max_wait_ms=2.0,
                             device_pool=True, fuse=fuse)
        out[mode] = {"fuse": fuse, **_round_res(res)}
        log(f"[{name}] {mode}: offered {offered/1e6:.2f}M achieved "
            f"{res.achieved_qps/1e6:.2f}M p50 {res.latency_ms_p50:.1f} "
            f"p99 {res.latency_ms_p99:.1f} ms")
    if cap:
        out["rows_capped_at"] = cap
    print(json.dumps(out))


def main():
    from fleetrec_tpu.utils.tunnelhealth import probe

    health0 = probe()
    print(f"tunnel health at start: {health0}", file=sys.stderr, flush=True)

    results = {}
    for name, _kw, _cap, _K in CONFIGS:
        log(f"=== {name} ===")
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--one", name],
                stdout=subprocess.PIPE, stderr=None, text=True, timeout=1800,
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
        "what": "per-query p50/p99 at ~80% offered load with the latency "
                "decomposition {batch-fill wait, service} per point; "
                "production_sim is the committed production-p99 bound "
                "(measured device ms + MEASURED dispatch from "
                "artifacts/DISPATCH.json, tunnel excluded) and carries "
                "the SLA verdict",
        "hardware": "1 tunneled TPU v5e chip (dev setup); each config's "
                    "record embeds its own tunnel-health probe",
        "sla_reference": "BASELINE.md p99 <= 20 ms at target throughput; "
                         "reference metric cuda_server.c:704-744",
        "tunnel_health_at_start": health0,
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
