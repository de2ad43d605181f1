"""Device mesh construction.

The reference's static topology — which node owns which tables and which
byte range of the feature vector (GPU/.../constant.h:25-27, config_sp_*.txt
bank pinning) — becomes a jax.sharding.Mesh with two axes:

  "data"  — batch replicas, the analog of the 16 independent server threads
            with their own CUDA stream (cuda_server.c THREAD_NUM).
  "model" — table/feature shards, the analog of spreading tables over
            FPGA memory channels and over the two FPGA nodes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
