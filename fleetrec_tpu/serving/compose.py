"""Serve-tier assembly: one tested library entry point wiring engine x
ingest x wire x scatter x mesh x multi-process together (VERDICT r4 #9 —
this lived inline in cli.py's cmd_serve; the CLI is now a thin flag
parser over ServeSpec/serve()).

The assembly is the analog of the reference's run_cuda_server.sh
bring-up: bind ingest ports, (optionally) rendezvous the jax.distributed
process group, build the scoring engine over the chosen mesh, arm the
peer watchdog, then pump n batches from the wire through the device and
back out (replies / scatter fan-out).
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Optional, Sequence, Tuple

from .engine import PeerWatchdog, ServingEngine
from .ingest import IngestServer, ScatterEgress
from .wire import IndexWireFormat


@dataclasses.dataclass
class ServeSpec:
    """Everything that shapes one serving session (mirrors `cli serve`
    flags; see cmd_serve's docstring for the reference topology map)."""

    batch: int                      # rows per wire batch (PER PROCESS)
    batches: int                    # wire batches to serve then exit
    port: int = 7080                # ingest port base (sender s -> port+s)
    slots: int = 8                  # ingest ring depth
    senders: int = 1                # index-mode senders (N>1: 3-node topo)
    mesh: Optional[Tuple[int, int]] = None  # (data, model) device mesh
    multiprocess: bool = False      # jax.distributed global mesh
    fuse: int = 1                   # wire batches per device call
    bg_drain: bool = False          # readbacks on a background thread
    reply: bool = False             # stream fp32 scores back to sender 0
    scatter: Tuple[str, ...] = ()   # "host:port" fan-out consumers
    warm: bool = False              # compile before accepting traffic
    # multiprocess lockstep bound: a peer stalled/dead past this many
    # seconds aborts THIS process with a diagnostic instead of hanging the
    # collective forever (engine.PeerWatchdog).  None = no bound.
    peer_timeout_s: Optional[float] = None
    # pooled bag serving (models/pooled.py): slots carry int32 [B, T, L]
    # bags (-1 padding); single-chip, single-sender wire only
    bag_L: int = 0
    bag_mean: bool = False


def build_engine(model, params, spec: ServeSpec):
    """The scoring half of the assembly: single-chip or sharded engine
    (+ sharded params placement) per the spec's mesh/process settings."""
    if spec.mesh is None:
        if spec.multiprocess:
            raise ValueError("multiprocess serving requires a mesh")
        return ServingEngine.from_model(
            model, params, batch_size=spec.batch,
            background_drain=spec.bg_drain, fuse=spec.fuse,
            bag_L=spec.bag_L, bag_mean=spec.bag_mean)
    if spec.bag_L:
        raise ValueError("pooled bag serving is single-chip (no --mesh); "
                         "use ShardedFleetRec.forward_pooled directly for "
                         "multi-chip bags")
    from ..parallel import ShardedFleetRec
    from ..parallel.multihost import global_mesh

    D, M = spec.mesh
    mesh = global_mesh(data=D, model=M)
    sh = ShardedFleetRec(model, mesh)
    sparams = sh.shard_params(params)
    eng = ServingEngine.from_sharded(
        sh, sparams, batch_size=spec.batch, background_drain=spec.bg_drain,
        fuse=spec.fuse, multiprocess=spec.multiprocess)
    if spec.multiprocess and spec.peer_timeout_s:
        import jax

        eng.watchdog = PeerWatchdog(spec.peer_timeout_s,
                                    process_id=jax.process_index())
    return eng


def serve(cfg, model, params, spec: ServeSpec) -> dict:
    """Run one full serving session; returns the latency/throughput
    summary (engine.run_from_ingest's dict + per-sender rx counters +
    scatter stats).  Prints the 'serving ...' banner once the ingest
    ports are BOUND — clients key their connects off it."""
    eng = build_engine(model, params, spec)
    if spec.warm:
        t0 = time.time()
        eng.warmup()
        print(f"warmup compile: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
    B = spec.batch
    wire = None
    if spec.senders > 1:
        if spec.bag_L:
            raise ValueError("pooled bag serving is single-sender wire only")
        wire = IndexWireFormat.plan(cfg, B, spec.senders)
        nbytes = wire.bytes_per_sender()
    else:
        nbytes = [B * (cfg.num_tables * max(spec.bag_L, 1)
                       + cfg.dense_dim) * 4]
    scatter = None
    if spec.scatter:
        scatter = ScatterEgress(queue_blocks=spec.slots)
        for dest in spec.scatter:
            host, _, port = dest.partition(":")
            scatter.connect(host, int(port))
    with IngestServer(nbytes, n_slots=spec.slots, port_base=spec.port) as ing:
        print(f"serving {cfg.name} B={B} on ports {spec.port}"
              f"..{spec.port + len(nbytes) - 1} ({nbytes} B/batch)",
              flush=True)
        summary = eng.run_from_ingest(
            ing, spec.batches, mode="index", wire=wire,
            row_limits=[t.rows for t in cfg.tables],
            reply_to=0 if spec.reply else None,
            scatter=scatter,
        )
        eng.close()
        # per-sender rx counters (the hardware packet-counter analog,
        # network_stack.sv:1049-1100) — spot the slow/flapping sender
        summary["per_sender"] = ing.sender_stats()
        if scatter is not None:
            summary["scatter"] = scatter.stats()
            scatter.close()
    return summary
