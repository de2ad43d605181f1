"""Command-line entry points — the analog of the reference's host CLIs
(host <xclbin> batch_num destIP destPort localIP boardNum pkgWordCount
useConn, FPGA/host/embedding_47_krnl/host.cpp:112-178) and run scripts
(GPU/*/run_cuda_server.sh, run_client_sender.sh).

  python -m fleetrec_tpu.cli serve  --config fleetrec_model1 --batch 1024 ...
  python -m fleetrec_tpu.cli loadgen --config fleetrec_model1 --ip ... --batches N
  python -m fleetrec_tpu.cli bench  --config fleetrec_model1 --batch 4096
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import numpy as np


def _make_cfg(args, reduce_rows=None):
    """Config construction shared by every command (flags: --max-rows,
    --take-lanes, --onehot-max, --take-stripes, --dtype)."""
    from . import config as C

    cfg = C.get_config(args.config, batch_size=args.batch)
    if reduce_rows or args.max_rows:
        cap = reduce_rows or args.max_rows
        cfg = dataclasses.replace(
            cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, cap)) for t in cfg.tables)
        )
    if getattr(args, "take_lanes", 0):
        cfg = dataclasses.replace(cfg, take_lanes=args.take_lanes)
    if getattr(args, "onehot_max", None) is not None:
        cfg = dataclasses.replace(cfg, onehot_max=args.onehot_max)
    if getattr(args, "onehot_factor_max", None) is not None:
        cfg = dataclasses.replace(cfg, onehot_factor_max=args.onehot_factor_max)
    if getattr(args, "onehot_r2", None) is not None:
        cfg = dataclasses.replace(cfg, onehot_r2=args.onehot_r2)
    if getattr(args, "take_stripes", 0):
        cfg = dataclasses.replace(cfg, take_stripes=args.take_stripes)
    if getattr(args, "qr_rem", 0):
        # QR compressed embeddings (config.ModelConfig docstring); applied
        # AFTER --max-rows so the threshold acts on the capped rows
        cfg = dataclasses.replace(
            cfg, qr_threshold=args.qr_threshold or 1_000_000,
            qr_rem=args.qr_rem)
        cfg.validate()
    elif getattr(args, "qr_threshold", 0):
        # the gate is qr_rem; a lone threshold would silently build the
        # exact (uncompressed) model (ADVICE r4)
        raise SystemExit("--qr-threshold requires --qr-rem > 0")
    if args.dtype:
        if args.dtype == "int8":
            # int8 quantizes table storage only; the MLP stays fp32
            cfg = dataclasses.replace(cfg, table_dtype="int8")
        else:
            cfg = dataclasses.replace(cfg, dtype=args.dtype, table_dtype=args.dtype)
    return cfg


def _build(args, reduce_rows=None):
    from . import reference as ref
    from .models import init_model

    cfg = _make_cfg(args, reduce_rows)
    if getattr(args, "ckpt", ""):
        from . import io as fio
        from .models import FleetRecModel

        model = FleetRecModel.create(cfg)
        params = fio.load_npz(args.ckpt, model)
        return cfg, model, params, None
    # tables_np=None: init_model generates over the model's INTERNAL specs
    # (for QR configs the giant tables exist only as their small Q/R
    # decomposition — materializing cfg.tables would build the raw 1B-row
    # table on the host, ~128 GB)
    model, params = init_model(cfg, table_scheme=args.table_scheme,
                               mlp_scheme=args.mlp_scheme)
    return cfg, model, params, None


def cmd_serve(args):
    """Start the ingest server + serving loop (index mode).

    --senders 1 (default): one sender ships int32 indices [B, T] then
    float32 dense [B, dense_dim].
    --senders N > 1: the reference 3-node topology (cuda_server.c:362-488)
    with indices on the wire — sender 0 ships the dense slice (the CPU0
    analog, when dense_dim > 0), the others int32 indices for contiguous
    config-order table ranges (the FPGA-shard analogs), each on port
    base+s, assembled at fixed slot offsets (serving/wire.py).

    --mesh D,M: serve through the SHARDED engine (tables row-sharded over
    M model shards, batch over D data shards) instead of the single-chip
    program — the flagship multi-chip deployment.  With --procs N /
    --proc-id I / --coordinator host:port, every process runs this same
    command over one jax.distributed global mesh; each process's ingest
    tier owns --batch LOCAL rows of the D*... global batch and replies its
    own rows' scores (the reference's multi-node run_cuda_server.sh order:
    server + per-node senders, each node owning a byte range,
    constant.h:25-27).  --fuse K works in BOTH modes (multiprocess fused
    dispatch goes through the pipelined collective step); --peer-timeout
    bounds the multiprocess lockstep wait (serving/engine.PeerWatchdog).

    The assembly itself is library code: serving/compose.py (ServeSpec +
    serve()); this command only parses flags."""
    from .serving.compose import ServeSpec, serve

    multiproc = args.procs > 1
    if multiproc:
        if not args.mesh:
            raise SystemExit("--procs requires --mesh D,M")
        import jax

        # must run before ANY device use (backend init): rendezvous first,
        # then _build's device_put sees the global device set
        jax.distributed.initialize(args.coordinator, num_processes=args.procs,
                                   process_id=args.proc_id)
    cfg, model, params, _ = _build(args)
    spec = ServeSpec(
        batch=args.batch, batches=args.batches, port=args.port,
        slots=args.slots, senders=args.senders,
        mesh=(tuple(int(x) for x in args.mesh.split(","))
              if args.mesh else None),
        multiprocess=multiproc, fuse=args.fuse, bg_drain=args.bg_drain,
        reply=args.reply,
        scatter=tuple(args.scatter.split(",")) if args.scatter else (),
        warm=args.warm, peer_timeout_s=args.peer_timeout or None,
        bag_L=args.bag_l, bag_mean=args.bag_mean,
    )
    print(json.dumps(serve(cfg, model, params, spec)))


def cmd_loadgen(args):
    """Send synthetic index batches to a serve instance.

    --senders N > 1 emulates the reference's N-node sender fleet from one
    process (the run_client_sender.sh analog): one TCP connection per role
    (dense node + table-shard nodes), each streaming only its slice of
    every batch (serving/wire.py layout)."""
    import queue as queue_mod
    import socket
    import threading

    from . import config as C
    from .serving.wire import IndexWireFormat

    cfg = C.get_config(args.config, batch_size=args.batch)
    if args.max_rows:
        cfg = dataclasses.replace(
            cfg,
            tables=tuple(dataclasses.replace(t, rows=min(t.rows, args.max_rows)) for t in cfg.tables),
        )
    B = args.batch
    rng = np.random.default_rng(args.seed)

    def draw(rows):
        if args.dist == "zipf":
            # bounded Zipf(1.1) — hot-item skew typical of production traffic
            z = rng.zipf(1.1, size=B)
            return np.minimum(z - 1, rows - 1).astype(np.int64)
        return rng.integers(0, rows, B)

    def gen_batch():
        if args.bag_l:
            # pooled bags: random valid prefix lengths in [1, L], -1 pad
            L = args.bag_l
            idx = np.full((B, cfg.num_tables, L), -1, np.int32)
            for j, t in enumerate(cfg.tables):
                lens = rng.integers(1, L + 1, B)
                for l in range(L):
                    rowv = draw(t.rows)
                    take = lens > l
                    idx[take, j, l] = rowv[take]
        else:
            idx = np.stack([draw(t.rows) for t in cfg.tables], 1).astype(np.int32)
        dense = (rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
                 if cfg.dense_dim else None)
        return idx, dense

    def connect(port, tries=100):
        # the server may still be building the model / binding (the C
        # loadgen retries the same way, native/ingest.cpp loadgen_run)
        while True:
            try:
                return socket.create_connection((args.ip, port), timeout=30)
            except OSError:
                tries -= 1
                if tries == 0:
                    raise
                time.sleep(0.1)

    n_senders = args.senders
    socks = [connect(args.port + s) for s in range(n_senders)]
    reader = None
    scores_read = [0]
    if args.read_scores:
        # scores stream back on sender 0's connection (serve --reply)
        def _read():
            want = args.batches * B * 4
            got = 0
            while got < want:
                chunk = socks[0].recv(min(1 << 16, want - got))
                if not chunk:
                    break
                got += len(chunk)
            scores_read[0] = got // 4

        reader = threading.Thread(target=_read, daemon=True)
        reader.start()

    t0 = time.time()
    # offered-load pacing: --qps Q paces batch k to start at t0 + k*B/Q
    # (open-loop arrivals; if a send blocks on TCP backpressure the sender
    # falls behind and the measured rate shows it — closed-loop honesty)
    interval = B / args.qps if args.qps else 0.0

    def pace(k):
        if interval:
            lag = t0 + k * interval - time.time()
            if lag > 0:
                time.sleep(lag)

    if n_senders == 1:
        for k in range(args.batches):
            idx, dense = gen_batch()
            payload = idx.tobytes()
            if dense is not None:
                payload += dense.tobytes()
            pace(k)
            socks[0].sendall(payload)
    else:
        wire = IndexWireFormat.plan(cfg, B, n_senders)
        qs = [queue_mod.Queue(maxsize=4) for _ in range(n_senders)]

        def pump(s):
            while True:
                payload = qs[s].get()
                if payload is None:
                    return
                socks[s].sendall(payload)

        pumps = [threading.Thread(target=pump, args=(s,), daemon=True)
                 for s in range(n_senders)]
        for t in pumps:
            t.start()
        for k in range(args.batches):
            idx, dense = gen_batch()
            pace(k)
            for s, payload in enumerate(wire.payloads(idx, dense)):
                qs[s].put(payload)
        for q in qs:
            q.put(None)
        for t in pumps:
            t.join(timeout=60)
    if reader is not None:
        reader.join(timeout=60)
    for sock in socks:
        sock.close()
    dt = time.time() - t0
    msg = (f"sent {args.batches} x {B} queries over {n_senders} sender(s) "
           f"in {dt:.2f}s ({args.batches * B / dt:.0f} q/s)")
    if args.qps:
        msg += f" [offered {args.qps:.0f} q/s]"
    if args.read_scores:
        msg += f"; scores received: {scores_read[0]}"
    print(msg)


def cmd_bench(args):
    """Device throughput for a config (scan-based; see utils.timing).

    --stage picks the pipeline slice, the analog of the reference's
    measurement variants that disable the matmuls to isolate the data path
    (GPU/measure_network_cuda_cp_latency_*, cuda_server.c:627-650):
      e2e (default) | lookup (gather+concat only) | mlp (scoring only).

    r5: reports the two-K-differenced device time (the single-scan wall
    carries one ~25-30 ms tunnel RPC, i.e. rpc/iters of per-batch smear;
    utils/timing.measure_corrected) plus the raw wall/K for comparison
    with r1-r4 records.
    """
    import jax.numpy as jnp

    from .models.embedding import lookup_concat
    from .models.mlp import mlp_apply
    from .utils.timing import DeviceBench

    cfg, model, params, _ = _build(args)
    rng = np.random.default_rng(0)
    K = args.iters
    if args.stage == "mlp":
        x = jnp.asarray(
            rng.uniform(-1, 1, (K, args.batch, cfg.feature_dim)).astype(np.float32)
        ).astype(jnp.dtype(cfg.dtype))
        bench = DeviceBench(lambda p, xb: mlp_apply(p["mlp"], xb))
        r = bench.measure_corrected(params, x)
    else:
        idx = jnp.asarray(
            np.stack(
                [rng.integers(0, t.rows, (K, args.batch)) for t in cfg.tables], 2
            ).astype(np.int32)
        )
        dense = (
            jnp.asarray(rng.uniform(-1, 1, (K, args.batch, cfg.dense_dim)).astype(np.float32))
            if cfg.dense_dim
            else None
        )
        if args.stage == "lookup":

            def step(p, x):
                # plan_indices = QR column derivation + spec->plan perm
                i = model.plan_indices(x[0] if dense is not None else x)
                d = x[1] if dense is not None else None
                return lookup_concat(p["tables"], i, d)
        else:

            def step(p, x):
                if dense is not None:
                    return model.forward(p, x[0], x[1])
                return model.forward(p, x, None)

        bench = DeviceBench(step)
        r = bench.measure_corrected(
            params, (idx, dense) if dense is not None else idx)
    qps = args.batch / (r["per_iter_ms"] / 1e3)
    print(json.dumps({
        "config": cfg.name, "stage": args.stage, "batch": args.batch,
        "dtype": cfg.dtype,
        "ms_per_batch": round(r["per_iter_ms"], 4),
        "inferences_per_sec": round(qps, 1),
        "ms_per_batch_raw_scan": round(r["raw_per_iter_ms"], 4),
        "percall_const_ms": round(r["percall_const_ms"], 2),
    }))


def cmd_servebench(args):
    """Latency-bounded serving bench: Poisson arrivals, batching window,
    per-query p50/p99 (the BASELINE p99-SLA rig)."""
    from .serving.servebench import run_servebench

    cfg, model, params, _ = _build(args)
    r = run_servebench(
        model, params, batch_size=args.batch, offered_qps=args.qps,
        duration_s=args.duration, max_wait_ms=args.max_wait_ms,
        device_pool=args.device_pool, fuse=args.fuse,
    )
    print(json.dumps({"config": cfg.name, "fuse": args.fuse, **r.to_json()}))


def cmd_netbench(args):
    """Ingest-tier TCP throughput/latency rig over localhost — the analog
    of the reference's iperf/hls_test network bring-up kernels and its
    sender-side GB/s printouts (multiple_connections_network_client_sender.c
    :91-96)."""
    from .serving import IngestServer, Loadgen

    nbytes = [args.bytes_per_batch] * args.senders
    t_first = None
    with IngestServer(nbytes, n_slots=args.slots, port_base=args.port,
                      n_conns=args.conns, pkg_bytes=args.pkg_bytes) as ing:
        lg = Loadgen("127.0.0.1", args.port, nbytes, args.batches, fill=1.0,
                     n_conns=args.conns, pkg_bytes=args.pkg_bytes).start()
        lat = []
        for _ in range(args.batches):
            r = ing.acquire(30_000)
            assert r is not None, "timeout"
            slot, _view, t_fb, t_done = r
            if t_first is None:
                t_first = t_fb
            lat.append((t_done - t_fb) / 1e6)
            t_last = t_done
            ing.release(slot)
        total = ing.bytes_received
        dt = (t_last - t_first) / 1e9
        lat = np.asarray(lat[1:] or lat)
        print(json.dumps({
            "senders": args.senders, "conns": args.conns,
            "pkg_bytes": args.pkg_bytes, "batches": args.batches,
            "GB_s": round(total / dt / 1e9, 3),
            "batch_assembly_ms_p50": round(float(np.percentile(lat, 50)), 3),
            "batch_assembly_ms_p99": round(float(np.percentile(lat, 99)), 3),
            # per-sender rx counters (network_stack.sv:1049-1100 analog)
            "per_sender": ing.sender_stats(),
        }))


def cmd_export(args):
    """Synthesize (or re-pack) a model and write an npz checkpoint with the
    config fingerprint — the table-loading path the reference lacks (its
    hosts re-synthesize tables every run, host.cpp:282-718).

    --quantize-int8: quantize the (float) table buffers per table with
    power-of-two scales before saving — the float-train -> int8-serve
    workflow (training rejects int8 storage, models/train.py).  The
    checkpoint is fingerprinted for table_dtype="int8" and loads into
    the int8 config of the same geometry."""
    from . import io as fio

    cfg, model, params, _ = _build(args)
    if getattr(args, "quantize_int8", False):
        if cfg.table_dtype == "int8":
            raise SystemExit("--quantize-int8: config already stores int8 "
                             "(build with --dtype float32/bfloat16)")
        params = fio.quantize_tables(params, model)
        cfg = dataclasses.replace(cfg, table_dtype="int8")
    fio.save_npz(args.out, params, cfg=cfg)
    import os

    print(json.dumps({"path": args.out, "bytes": os.path.getsize(args.out),
                      "config": cfg.name, "table_dtype": cfg.table_dtype,
                      "fingerprint": fio.config_fingerprint(cfg)[:12]}))


def cmd_autotune(args):
    """Sweep the one-hot/take crossover threshold for a config on the
    attached chip and report ms/batch per candidate (the measured analog
    of the reference's static PLRAM-vs-HBM table assignment)."""
    import jax.numpy as jnp

    from .utils.timing import DeviceBench

    results = []
    best = None
    for th in args.thresholds:
        args.onehot_max = th
        cfg, model, params, _ = _build(args)
        n_oh = model.layout.n_onehot
        rng = np.random.default_rng(0)
        idx = jnp.asarray(
            np.stack(
                [rng.integers(0, t.rows, (args.iters, args.batch)) for t in cfg.tables], 2
            ).astype(np.int32)
        )
        dense = (
            jnp.asarray(
                rng.uniform(-1, 1, (args.iters, args.batch, cfg.dense_dim)).astype(np.float32))
            if cfg.dense_dim else None
        )

        def step(p, x):
            if dense is not None:
                return model.forward(p, x[0], x[1])
            return model.forward(p, x, None)

        r = DeviceBench(step).measure(params, (idx, dense) if dense is not None else idx)
        row = {"onehot_max": th, "onehot_tables": n_oh,
               "take_tables": model.layout.n_take,
               "ms_per_batch": round(r["per_iter_ms"], 4)}
        results.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
        if best is None or row["ms_per_batch"] < best["ms_per_batch"]:
            best = row
    print(json.dumps({"config": args.config, "batch": args.batch,
                      "best": best, "sweep": results}))


def cmd_gatherbench(args):
    """Row-gather shootout: XLA take vs the Pallas DMA-pipeline kernel on
    the same [R, 128] buffer — re-runs the measurement behind the lookup
    design decision (docs/DESIGN.md), ns/row apiece."""
    import jax.numpy as jnp

    from .ops.gather_pallas import gather_rows, gather_rows_grouped
    from .utils.timing import DeviceBench

    rng = np.random.default_rng(0)
    R, L, N, K = args.rows, 128, args.n_rows, args.iters
    table = jnp.asarray(rng.standard_normal((R, L)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, R, (K, N)).astype(np.int32))

    # r5: two-K-differenced (the single-scan wall's per-call tunnel term
    # is ~rpc/(K*N) per ROW — at the defaults it was HALF the reported
    # ns/row; relative verdicts between the three kernels were unaffected)
    res = {}
    b = DeviceBench(lambda t, i: jnp.take(t, i, axis=0))
    res["xla_take_ns_per_row"] = (
        b.measure_corrected(table, idx)["per_iter_ms"] * 1e6 / N)
    b = DeviceBench(lambda t, i: gather_rows(t, i, chunk=args.chunk,
                                             window=args.window))
    res["pallas_dma_ns_per_row"] = (
        b.measure_corrected(table, idx)["per_iter_ms"] * 1e6 / N)
    b = DeviceBench(lambda t, i: gather_rows_grouped(
        t, i, chunk=args.chunk, group=args.group, window=args.window))
    res["pallas_grouped_ns_per_row"] = (
        b.measure_corrected(table, idx)["per_iter_ms"] * 1e6 / N)
    # gather_rows_grouped shrinks chunk to a multiple of group; record the
    # effective value so the JSON doesn't misstate the grouped kernel's run
    grouped_chunk = (args.chunk // max(1, min(args.group, args.chunk))) * max(
        1, min(args.group, args.chunk))
    res.update(rows=R, gathered_rows=N, chunk=args.chunk,
               grouped_chunk=grouped_chunk, window=args.window,
               group=args.group)
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}))


def cmd_plan(args):
    """Placement plan: per-chip byte accounting + shard load balance for a
    config on an n_model-way mesh (the analog of the reference's
    config_sp_*.txt bank-pinning files, computed instead of hand-written).

    --recommend N: pick the (data, model) split of an N-chip slice —
    model axis = smallest that fits the HBM budget (the model axis divides
    table BYTES; issued gather indices divide along the DATA axis, so
    per-query lookup cost is topology-independent — docs/DESIGN.md
    "v5e-16 projection"), data axis = N / model."""
    from .parallel import plan

    cfg = _make_cfg(args)
    if args.recommend:
        N = args.recommend
        budget = args.hbm_gb << 30
        chosen = None
        for m in [d for d in range(1, N + 1) if N % d == 0]:
            p = plan(cfg, n_model=m, hbm_budget_bytes=budget,
                     batch_size=args.batch)
            if p.fits:
                chosen = (m, p)
                break
        if chosen is None:
            print(json.dumps({"recommend": None,
                              "reason": f"does not fit {N} chips at "
                              f"{args.hbm_gb} GiB; min_model_shards="
                              f"{p.min_model_shards}"}))
            return
        m, p = chosen
        print(json.dumps({
            "chips": N, "data_axis": N // m, "model_axis": m,
            "per_chip_bytes": p.per_chip_bytes,
            "hbm_budget_bytes": p.hbm_budget_bytes,
            "note": "model axis = min that fits (divides table bytes); "
                    "data axis divides issued gather indices; per-query "
                    "lookup cost is topology-independent",
        }, indent=2))
        return
    p = plan(cfg, n_model=args.model_axis,
             hbm_budget_bytes=args.hbm_gb << 30, batch_size=args.batch)
    out = p.to_json()
    if not args.shards:
        out.pop("shards")
    print(json.dumps(out, indent=2))


def cmd_icibench(args):
    """Collective bandwidth over the mesh — iperf_krnl's ICI analog."""
    import jax

    from .benchmarks import ici_bench
    from .parallel import make_mesh

    n = len(jax.devices())
    model_ax = args.model_axis or max(n // args.data, 1)
    mesh = make_mesh(data=args.data, model=model_ax)
    print(json.dumps(ici_bench(mesh, mbytes=args.mbytes, iters=args.iters)))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="fleetrec_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--platform", default="",
                        help="force jax platform (cpu|tpu|axon); note: the "
                        "JAX_PLATFORMS env var may be overridden by site "
                        "customization — this flag uses jax.config.update, "
                        "which always wins")
    common.add_argument("--config", default="fleetrec_model1")
    common.add_argument("--batch", type=int, default=1024)
    common.add_argument("--max-rows", type=int, default=0,
                        help="cap table rows (dev/testing)")
    common.add_argument("--dtype", default="",
                        help="override compute dtype (float32|bfloat16)")
    common.add_argument("--table-scheme", default="pm1")
    common.add_argument("--take-lanes", type=int, default=0,
                        help="take-buffer row width in lanes (multiple of 128)")
    common.add_argument("--mlp-scheme", default="ones")
    common.add_argument("--onehot-max", type=int, default=None,
                        help="one-hot/take crossover row threshold")
    common.add_argument("--onehot-factor-max", type=int, default=None,
                        help="factored hi/lo one-hot tier: tables with "
                        "onehot_max < rows <= this select via a hi-one-hot "
                        "MXU matmul + exact lo mask-einsum (0 = off)")
    common.add_argument("--onehot-r2", type=int, default=None,
                        help="lo-level width of the factored tier "
                        "(rounded so r2*dim is a lane multiple)")
    common.add_argument("--take-stripes", type=int, default=0,
                        help="striped take layout (balanced row-sharding); "
                        "0 = config default")
    common.add_argument("--qr-rem", type=int, default=0,
                        help="QR compressed embeddings: remainder table "
                        "size (0 = off; emb = Q[id//rem] + R[id%%rem])")
    common.add_argument("--qr-threshold", type=int, default=0,
                        help="rows above which tables QR-decompose "
                        "(default 1M when --qr-rem is set)")
    common.add_argument("--ckpt", default="",
                        help="load params from an npz checkpoint (fingerprint-"
                        "checked) instead of synthesizing")

    s = sub.add_parser("serve", parents=[common])
    s.add_argument("--port", type=int, default=7080)
    s.add_argument("--slots", type=int, default=8)
    s.add_argument("--batches", type=int, default=100)
    s.add_argument("--senders", type=int, default=1,
                   help="index-mode senders: 1 = single wire; N>1 = the "
                   "reference 3-node topology (dense node + table-shard "
                   "nodes at ports base..base+N-1)")
    s.add_argument("--bg-drain", action="store_true",
                   help="readbacks on a background thread (overlaps the next "
                   "batch's ingest copy with the previous readback)")
    s.add_argument("--reply", action="store_true",
                   help="stream fp32 scores back to sender 0 after each "
                   "batch (client must read them)")
    s.add_argument("--scatter", default="",
                   help="comma-separated host:port consumers to fan scores "
                   "out to round-robin (the scatter_krnl tier; slow/dead "
                   "consumers shed their own share only)")
    s.add_argument("--fuse", type=int, default=1,
                   help="ingest batches per device call (lax.scan); "
                   "amortizes per-call dispatch overhead — required for "
                   "rate on the tunneled dev chip (~29 ms/call floor). "
                   "--batches must divide by it")
    s.add_argument("--warm", action="store_true",
                   help="compile the scoring program on dummy data before "
                   "accepting traffic (keeps XLA compile out of the "
                   "latency records)")
    s.add_argument("--mesh", default="",
                   help="D,M — serve through the sharded engine on a "
                   "(data=D, model=M) device mesh")
    s.add_argument("--procs", type=int, default=1,
                   help="multi-host serving: total jax.distributed "
                   "processes (each runs its own serve with its own "
                   "ingest ports; --batch is rows PER PROCESS)")
    s.add_argument("--proc-id", type=int, default=0)
    s.add_argument("--coordinator", default="localhost:29500",
                   help="jax.distributed coordinator address (--procs > 1)")
    s.add_argument("--peer-timeout", type=float, default=0,
                   help="multiprocess lockstep watchdog: abort this "
                   "process (exit 124) with a diagnostic if a collective "
                   "dispatch/readback stalls past this many seconds — a "
                   "dead peer otherwise hangs every process forever "
                   "(0 = no bound)")
    s.add_argument("--bag-l", type=int, default=0,
                   help="pooled bag serving: slots carry int32 [B, T, L] "
                   "multi-hot bags (-1 padding) pooled on-chip "
                   "(models/pooled.py; single-chip, single-sender)")
    s.add_argument("--bag-mean", action="store_true",
                   help="mean pooling instead of sum (with --bag-l)")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("loadgen", parents=[common])
    s.add_argument("--ip", default="127.0.0.1")
    s.add_argument("--port", type=int, default=7080)
    s.add_argument("--batches", type=int, default=100)
    s.add_argument("--senders", type=int, default=1,
                   help="emulate N sender nodes (must match serve --senders)")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--dist", default="uniform", choices=["uniform", "zipf"])
    s.add_argument("--read-scores", action="store_true",
                   help="read the fp32 scores the server streams back "
                   "(pair with serve --reply)")
    s.add_argument("--qps", type=float, default=0,
                   help="offered load in queries/s (paced open-loop); "
                   "0 = send as fast as TCP accepts")
    s.add_argument("--bag-l", type=int, default=0,
                   help="send pooled [B, T, L] bags (match serve --bag-l; "
                   "single sender only)")
    s.set_defaults(fn=cmd_loadgen)

    s = sub.add_parser("bench", parents=[common])
    s.add_argument("--iters", type=int, default=32)
    s.add_argument("--stage", default="e2e", choices=["e2e", "lookup", "mlp"])
    s.set_defaults(fn=cmd_bench)

    s = sub.add_parser("servebench", parents=[common])
    s.add_argument("--qps", type=float, default=500_000)
    s.add_argument("--duration", type=float, default=5.0)
    s.add_argument("--max-wait-ms", type=float, default=2.0)
    s.add_argument("--device-pool", action="store_true",
                   help="pre-stage the query pool on device (use on the "
                   "tunneled dev chip where per-call H2D is ~14 MB/s)")
    s.add_argument("--fuse", type=int, default=1,
                   help="batches per dispatch (scan); amortizes the tunnel's "
                   "~29 ms per-call floor; implies --device-pool")
    s.set_defaults(fn=cmd_servebench)

    s = sub.add_parser("netbench")
    s.add_argument("--senders", type=int, default=3)
    s.add_argument("--bytes-per-batch", type=int, default=1024 * 1952 * 4)
    s.add_argument("--batches", type=int, default=50)
    s.add_argument("--slots", type=int, default=8)
    s.add_argument("--port", type=int, default=27080)
    s.add_argument("--conns", type=int, default=1,
                   help="parallel connections per sender (the reference's "
                   "useConn knob, default 4 there)")
    s.add_argument("--pkg-bytes", type=int, default=64 * 1024,
                   help="stripe packet size when --conns > 1 (pkgWordCount "
                   "analog)")
    s.set_defaults(fn=cmd_netbench)

    s = sub.add_parser("export", parents=[common],
                       help="write an npz checkpoint (+config fingerprint)")
    s.add_argument("--out", required=True)
    s.add_argument("--quantize-int8", action="store_true",
                   help="per-table pow2 quantization of the float table "
                   "buffers (float-train -> int8-serve workflow)")
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser("autotune", parents=[common],
                       help="sweep the one-hot/take crossover on-device")
    s.add_argument("--iters", type=int, default=16)
    s.add_argument("--thresholds", type=int, nargs="+",
                   default=[512, 1024, 2048, 4096, 8192])
    s.set_defaults(fn=cmd_autotune)

    s = sub.add_parser("gatherbench",
                       help="XLA take vs Pallas DMA gather, ns/row")
    s.add_argument("--rows", type=int, default=1 << 20)
    s.add_argument("--n-rows", type=int, default=4096 * 30,
                   help="gathered rows per iteration (model1-like)")
    s.add_argument("--iters", type=int, default=16)
    s.add_argument("--chunk", type=int, default=512)
    s.add_argument("--window", type=int, default=8)
    s.add_argument("--group", type=int, default=8,
                   help="rows per semaphore group in the grouped-DMA kernel")
    s.add_argument("--platform", default="")
    s.set_defaults(fn=cmd_gatherbench)

    s = sub.add_parser("plan", parents=[common],
                       help="placement plan: per-chip bytes + load balance")
    s.add_argument("--model-axis", type=int, default=8)
    s.add_argument("--hbm-gb", type=int, default=16,
                   help="per-chip HBM budget in GiB (v5e: 16)")
    s.add_argument("--shards", action="store_true",
                   help="include the per-shard row-range table")
    s.add_argument("--recommend", type=int, default=0,
                   help="recommend the (data, model) split for an N-chip "
                   "slice (0 = off)")
    s.set_defaults(fn=cmd_plan)

    s = sub.add_parser("icibench", parents=[common],
                       help="collective bandwidth microbench (iperf analog)")
    s.add_argument("--data", type=int, default=1)
    s.add_argument("--model-axis", type=int, default=0,
                   help="model axis size; 0 = all devices")
    s.add_argument("--mbytes", type=int, default=64)
    s.add_argument("--iters", type=int, default=16)
    s.set_defaults(fn=cmd_icibench)

    args = ap.parse_args(argv)
    if getattr(args, "platform", ""):
        import jax

        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
