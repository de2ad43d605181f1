"""Multi-chip sharded FleetRec: GSPMD partitioning of the fused
lookup->concat->MLP program.

Replaces the reference's cross-device tiers — FPGA-channel table placement,
the 100 Gbps hardware TCP link (FPGA/kernel/network_krnl), the scatter
fan-out kernel (scatter_krnl/src/hls/scatter.cpp) and the GPU server's
fixed-offset receive concatenation (cuda_server.c:514-587) — with shardings
over a 2-axis Mesh and XLA-inserted ICI collectives:

  * embedding buffers: row-sharded over "model" (each chip owns a
    contiguous block of every dim-group's physical rows — the analog of
    tables-per-channel / tables-per-FPGA placement);
  * gather: indices replicated over "model"; XLA partitions the gather so
    each chip looks up rows it owns and combines partial rows (the analog
    of each FPGA producing its slice of the feature vector);
  * W1 row-sharded over "model": the feature->hidden1 matmul consumes the
    feature vector where it was produced and exchanges only [B, H1]
    partial sums (psum over ICI) — strictly less traffic than the
    reference's ship-the-whole-feature-vector design whenever
    H1 < feature_dim (model-3: 2048 < 3968);
  * batch: sharded over "data" (the analog of the 16 independent
    server threads, cuda_server.c:55).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fleetrec import FleetRecModel


class ShardedFleetRec:
    """Wrap a FleetRecModel with mesh shardings and a pjit'ed step."""

    def __init__(self, model: FleetRecModel, mesh: Mesh):
        self.model = model
        self.mesh = mesh

    # ---- sharding specs -------------------------------------------------
    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]

    def param_shardings(self, params) -> Dict:
        mesh = self.mesh
        repl = NamedSharding(mesh, P())
        rowshard = NamedSharding(mesh, P("model", None))
        m = self.n_model
        pt = params["tables"]
        # one-hot class buffers [n, rows_pad, dim]: shard over tables when
        # divisible (table-wise model parallelism), else replicate — they
        # are small (the reference's PLRAM/URAM class).
        oh = [
            NamedSharding(mesh, P("model", None, None)) if b.shape[0] % m == 0 else repl
            for b in pt.onehot_buffers
        ]
        leaves = oh + ([rowshard] if pt.take_buffer is not None else [])
        tables = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(pt), leaves
        )
        mlp = []
        for i, w in enumerate(params["mlp"]):
            if i == 0 and w.shape[0] % m == 0:
                # W1 rows are feature positions: shard where features live.
                # (Indivisible feature widths fall back to replicated W1 —
                # XLA then all-gathers the sharded gather output instead.)
                mlp.append(rowshard)
            else:
                mlp.append(repl)
        return {"tables": tables, "mlp": mlp}

    def data_shardings(self):
        mesh = self.mesh
        batch = NamedSharding(mesh, P("data", None))
        return batch

    def shard_params(self, params):
        """Pad each dim-group buffer to a row-count divisible by the model
        axis (pad rows are never indexed — logical row ids are bounded by
        table rows), then place params per param_shardings."""
        m = self.n_model
        tables = params["tables"]
        take = tables.take_buffer
        if take is not None:
            pad = (-take.shape[0]) % m
            if pad:
                take = jnp.pad(take, ((0, pad), (0, 0)))
        tables = dataclasses.replace(tables, take_buffer=take)
        params = {"tables": tables, "mlp": params["mlp"]}
        return jax.device_put(params, self.param_shardings(params))

    def shard_batch(self, indices, dense=None):
        s = self.data_shardings()
        indices = jax.device_put(indices, s)
        if dense is not None:
            dense = jax.device_put(dense, s)
        return indices, dense

    # ---- compiled steps -------------------------------------------------
    @cached_property
    def forward(self):
        model = self.model
        mesh = self.mesh
        batch = NamedSharding(mesh, P("data", None))
        out_s = NamedSharding(mesh, P("data"))

        def fwd(params, indices, dense):
            # Keep the batch on "data"; let GSPMD partition the gather over
            # the row-sharded tables and psum the W1 matmul over "model".
            indices = jax.lax.with_sharding_constraint(indices, batch)
            scores = model.forward(params, indices, dense)
            return jax.lax.with_sharding_constraint(scores, out_s)

        return jax.jit(fwd, out_shardings=out_s)

    @cached_property
    def train_step(self):
        """One SGD step on logistic loss — exercises the full backward
        (gather -> scatter-add grads on sharded tables, psum'd MLP grads).
        The reference has no training; this exists so the serving engine's
        tables/weights can be fine-tuned in place and to validate the
        sharding layout end-to-end (grads inherit param shardings)."""
        model = self.model
        mesh = self.mesh
        batch = NamedSharding(mesh, P("data", None))

        def loss_fn(params, indices, dense, labels):
            scores = model.forward(params, indices, dense)
            return jnp.mean(
                jnp.maximum(scores, 0) - scores * labels + jnp.log1p(jnp.exp(-jnp.abs(scores)))
            )

        def step(params, indices, dense, labels, lr):
            indices = jax.lax.with_sharding_constraint(indices, batch)
            loss, grads = jax.value_and_grad(loss_fn)(params, indices, dense, labels)
            new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
            return loss, new_params

        return jax.jit(step, donate_argnums=(0,))
