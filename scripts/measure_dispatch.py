"""Measure the production dispatch constant; retire "stated 0.3 ms"
(VERDICT r4 #2 / weak #3).

Every SLA verdict in artifacts/P99_TABLE.json rested on a production
dispatch cost that was asserted, never measured.  Its host-side
components are tunnel-free and measurable on THIS rig today:

  * host loop: the REAL ServingEngine.run_from_ingest path (ingest ring
    acquire -> slot parse/copy -> index validation -> stack -> submit ->
    drain bookkeeping) driven over loopback TCP with a STUB scorer, so
    the per-batch wall is pure host dispatch work (no device, no tunnel);
  * python/PJRT call overhead: dispatch latency of an already-compiled
    trivial executable on ready arrays (CPU backend; the per-call
    client-side cost structure a host-attached accelerator sees);
  * H2D staging: bounded by batch bytes / PCIe-class 10 GB/s (production
    hosts overlap this with compute; counted anyway).

Writes artifacts/DISPATCH.json; scripts/p99_table.py consumes it and the
production_sim basis string becomes "measured X ms host + bounded Y ms
dispatch" per config.  Reference metric being matched:
GPU/final_network_cublasLt_3_nodes_no_FIFO_scatter/cuda_server.c:704-744
(its recv->H2D->matmul path is self-measuring).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/measure_dispatch.py
(CPU only; no chip needed.)
"""

import json
import os
import socket
import sys
import threading
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fleetrec_tpu import config as C  # noqa: E402
from fleetrec_tpu.serving import IngestServer, ServingEngine  # noqa: E402

CONFIGS = ["fleetrec_model1", "tiny_dlrm", "fleetrec_model2",
           "fleetrec_model3", "criteo_terabyte"]
BATCHES = [4096, 1024]
NB = 48          # wire batches per measurement (first excluded by stats)
PORT = 23180
H2D_GBPS = 10.0  # PCIe-class staging bound (production host-attached)


def measure_host_loop(cfg, B, port):
    """Per-batch host dispatch ms through the REAL run_from_ingest loop
    with a stub scorer.  The sender pre-streams every batch as fast as
    loopback TCP accepts (ring slots buffer them), so acquire() returns
    immediately and the loop wall is parse+validate+submit+drain work."""
    T, D = cfg.num_tables, cfg.dense_dim
    out = np.zeros(B, np.float32)

    # max_in_flight=0: drain inline right after each submit, so the
    # t_ready -> t_done interval is pure per-batch host work (a window
    # would span the NEXT batches' wire waits into the stamp)
    eng = ServingEngine(lambda i, d: out, num_tables=T, dense_dim=D,
                        batch_size=B, max_in_flight=0)
    nbytes = [B * (T + D) * 4]
    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables],
                   1).astype(np.int32)
    dense = (rng.uniform(-1, 1, (B, D)).astype(np.float32) if D else None)
    payload = idx.tobytes() + (dense.tobytes() if dense is not None else b"")

    with IngestServer(nbytes, n_slots=16, port_base=port) as ing:
        def send():
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            for _ in range(NB):
                s.sendall(payload)
            s.close()

        th = threading.Thread(target=send, daemon=True)
        th.start()
        t0 = time.perf_counter()
        eng.run_from_ingest(
            ing, NB, mode="index",
            row_limits=[t.rows for t in cfg.tables])
        wall = time.perf_counter() - t0
        th.join(10)
    # host work per batch = t_ready -> t_done from the engine's OWN
    # records (slot bytes on host -> parse -> validate -> submit -> stub
    # -> drain bookkeeping).  The loop wall additionally contains the
    # loopback wire/ring time the 16-slot ring couldn't hide — reported
    # separately (production counts the wire via the first-byte stamps).
    host = np.asarray([(r.t_done - r.t_ready) * 1e3
                       for r in eng.stats.records[1:]])
    return {
        "host_loop_ms_per_batch": float(np.percentile(host, 50)),
        "host_loop_ms_p99": float(np.percentile(host, 99)),
        "loop_wall_ms_per_batch_incl_wire": wall / NB * 1e3,
        "slot_bytes": nbytes[0],
    }


def measure_py_dispatch(B, T):
    """Call overhead of an already-compiled trivial executable on ready
    device arrays — the client-side per-call dispatch floor."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    x = jnp.zeros((B, T), jnp.int32)
    f = jax.jit(lambda a: a[0, 0])  # O(1) body: wall ~= dispatch overhead
    np.asarray(f(x))
    REPS = 300
    t0 = time.perf_counter()
    for _ in range(REPS):
        f(x)
    f(x).block_until_ready()
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    art = {
        "what": "measured host-side production dispatch terms per config "
                "(real run_from_ingest loop w/ stub scorer, loopback TCP, "
                "no device) + compiled-call overhead + H2D staging bound; "
                "replaces the previously STATED 0.3 ms dispatch constant "
                "in P99_TABLE.json's production_sim",
        "h2d_bound_formula": f"slot_bytes / {H2D_GBPS} GB/s (PCIe-class; "
                             "production hosts overlap it with compute)",
        "configs": {},
    }
    port = PORT
    for name in CONFIGS:
        art["configs"][name] = {}
        for B in BATCHES:
            cfg = C.get_config(name, batch_size=B)
            r = measure_host_loop(cfg, B, port)
            port += 1
            r["py_dispatch_ms"] = measure_py_dispatch(B, cfg.num_tables)
            r["h2d_bound_ms"] = r["slot_bytes"] / (H2D_GBPS * 1e9) * 1e3
            r["dispatch_total_ms"] = (r["host_loop_ms_per_batch"]
                                      + r["py_dispatch_ms"]
                                      + r["h2d_bound_ms"])
            r = {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in r.items()}
            art["configs"][name][f"B{B}"] = r
            print(f"{name} B={B}: host loop "
                  f"{r['host_loop_ms_per_batch']:.3f} ms/batch, py dispatch "
                  f"{r['py_dispatch_ms']:.3f} ms, h2d bound "
                  f"{r['h2d_bound_ms']:.3f} ms -> total "
                  f"{r['dispatch_total_ms']:.3f} ms", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "DISPATCH.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
