"""Find each config's best SLA-compliant production operating point.

Reads the measured per-batch device times from artifacts/P99_TABLE.json
(captured on-chip by scripts/p99_table.py, r5: two-K tunnel-clean) and
the MEASURED production dispatch from artifacts/DISPATCH.json, and
sweeps the PRODUCTION simulation (real engine loop, virtual device at
device + dispatch service time — servebench simulate_service_ms) over
batch size x offered load, recording the highest throughput whose
per-query p99 meets the 20 ms SLA.  Needs no chip; runs after every
p99_table capture.  (The fixed 80%-load production_sim points are owned
by p99_table.py itself — this script only adds sla_operating_point.)

Writes the result back into P99_TABLE.json under
configs[<name>]["sla_operating_point"].

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/sla_operating_points.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SLA_MS = 20.0


def dispatch_ms_for(name, bsz):
    """Measured dispatch (artifacts/DISPATCH.json) for (config, batch);
    linear in B between the two measured batch sizes."""
    path = os.path.join(REPO, "artifacts", "DISPATCH.json")
    with open(path) as f:
        d = json.load(f)["configs"][name]
    d1, d4 = d["B1024"]["dispatch_total_ms"], d["B4096"]["dispatch_total_ms"]
    return d1 + (d4 - d1) * (bsz - 1024) / (4096 - 1024)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from fleetrec_tpu.serving.servebench import run_servebench

    path = os.path.join(REPO, "artifacts", "P99_TABLE.json")
    with open(path) as f:
        art = json.load(f)

    def round_res(res):
        return {k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in res.to_json().items()}

    for name, rec in art["configs"].items():
        if "ms_per_batch_device" not in rec:
            continue
        # per-query device cost is per-index flat (docs/DESIGN.md): scale
        # the measured B=4096 and B=1024 points to intermediate batches by
        # interpolating on the per-batch times actually measured
        points = {4096: rec["ms_per_batch_device"],
                  1024: rec["ms_per_batch_device_small"]}
        # B=2048: linear in B between the two measured points
        points[2048] = points[1024] + (points[4096] - points[1024]) * (
            (2048 - 1024) / (4096 - 1024))
        best = None
        for bsz, dms in sorted(points.items()):
            service = dms + dispatch_ms_for(name, bsz)
            cap = bsz / (service / 1e3)  # saturation q/s
            for frac in (0.9, 0.8, 0.7, 0.6, 0.5):
                offered = frac * cap
                sim = run_servebench(
                    None, None, batch_size=bsz, offered_qps=offered,
                    duration_s=6.0, max_wait_ms=2.0,
                    simulate_service_ms=service)
                ok = sim.latency_ms_p99 <= SLA_MS
                log(f"[{name}] B={bsz} svc={service:.2f} offered={offered/1e6:.2f}M "
                    f"p99={sim.latency_ms_p99:.1f} {'OK' if ok else 'no'}")
                if ok and (best is None or sim.achieved_qps > best["qps"]):
                    best = {"qps": round(sim.achieved_qps, 1),
                            "batch": bsz,
                            "load_fraction": frac,
                            "service_model_ms": round(service, 3),
                            "p50_ms": round(sim.latency_ms_p50, 2),
                            "p99_ms": round(sim.latency_ms_p99, 2)}
                if ok:
                    break  # highest fraction that meets for this batch size
        rec["sla_operating_point"] = best or {
            "qps": 0, "note": f"no tested point meets p99<={SLA_MS} ms"}
        log(f"[{name}] best: {rec['sla_operating_point']}")

    art["sla_operating_point_note"] = (
        "per config: highest simulated throughput meeting p99 <= 20 ms — "
        "real engine loop with service = two-K measured device ms + "
        "MEASURED dispatch (artifacts/DISPATCH.json, interpolated in B), "
        "batch sizes 1024/2048/4096, load fractions 0.5-0.9 of "
        "saturation; dispatch is serialized with the device term "
        "(conservative — bg_drain overlaps them in production)")
    with open(path, "w") as f:
        json.dump(art, f, indent=2)
        f.write("\n")
    print(path)


if __name__ == "__main__":
    main()
