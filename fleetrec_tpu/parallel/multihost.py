"""Multi-host bring-up.

The reference's cluster bring-up is manual: start the GPU server, then each
sender node in dependency order with sleeps (run_cuda_server.sh /
run_client_sender.sh). The TPU equivalent is jax.distributed: every host
runs the same program, the coordinator handles rendezvous, and the global
mesh spans all hosts' chips — collectives ride ICI inside a slice and DCN
across slices.

Topology mapping (FleetRec -> mesh axes):
  FPGA nodes (table shards)   -> "model" axis (tables/W1 row-sharded)
  GPU nodes (scoring replicas) -> "data" axis (batch-sharded replicas)
  CPU feature nodes            -> per-host ingest (serving tier) feeding
                                  process-local shards of the global batch
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when single-process."""
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def global_mesh(data: int, model: int) -> Mesh:
    """Mesh over ALL processes' devices, data-major so that each host's
    local devices fall in the same data row where possible (batch stays
    host-local; the model axis crosses hosts only when tables do)."""
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, axis_names=("data", "model"))


def host_local_batch_to_global(mesh: Mesh, arr: np.ndarray, spec=P("data", None)):
    """Assemble a global device array from per-process local batch shards —
    each host's ingest tier feeds only its own rows (the analog of each
    sender node owning a byte range, constant.h:25-27)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, arr)


def global_scores_to_host_local(out, axis: int = 0) -> np.ndarray:
    """THIS process's batch rows of a P(\"data\")-sharded global result, in
    global row order — the inverse of host_local_batch_to_global for the
    score egress: each host replies only the rows its own ingest tier
    contributed (the reference's per-sender score return path,
    cuda_server.c:624-632).  Model-axis replicas of the same data row are
    deduped by shard index.  ``axis`` is the batch dimension: 0 for the
    plain [B] forward, 1 for the fused/pipelined [K, B] output
    (P(None, \"data\"))."""
    shards = {}
    for s in out.addressable_shards:
        start = s.index[axis].start or 0
        shards.setdefault(start, s)
    return np.concatenate(
        [np.asarray(shards[k].data) for k in sorted(shards)], axis=axis
    )
