"""The flagship end-to-end model: sharded multi-table embedding lookup ->
fixed-offset concat -> dense MLP scoring, fused into ONE jitted program.

This is the whole reference pipeline (FPGA embedding stage + 100G TCP link +
GPU cuBLASLt scoring stage, README.md:2-8) collapsed on-chip: the lookup and
the matmul chain live in the same XLA program so the "link" between stages is
VMEM/HBM, not a network.  Multi-chip sharding of the same program lives in
``fleetrec_tpu.parallel``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import reference as ref
from ..config import ModelConfig
from .embedding import (
    PackedLayout,
    PackedTables,
    build_layout,
    index_columns,
    lookup_concat,
    pack_tables,
)
from .mlp import init_mlp_params, mlp_apply


@dataclasses.dataclass(frozen=True)
class FleetRecModel:
    """Static model description (hashable; safe to close over in jit)."""

    cfg: ModelConfig
    layout: PackedLayout
    # permutation of index-matrix columns: spec order -> group order
    index_perm: tuple
    # QR compressed embeddings (config.qr_expand): the INTERNAL table
    # specs the layout/packing are built over (Q tables in place + hidden
    # R tables appended), and ((config_column, rem), ...) telling
    # plan_indices how to derive the Q/R index columns.  Empty = QR off
    # and spec_tables == cfg.tables.
    spec_tables: tuple = ()
    qr_positions: tuple = ()

    @classmethod
    def create(cls, cfg: ModelConfig) -> "FleetRecModel":
        from ..config import qr_expand

        internal, qr_positions, sum_pairs = qr_expand(cfg)
        # NOTE: an isolated [R,64] bf16 take measures 6 ns/row (2x faster
        # than 128-lane), but end-to-end the 64-lane layout is several times
        # SLOWER — sub-128-lane intermediates force vector relayouts in the
        # extraction/concat chain.  Multiples of 128 are safe; wider rows
        # fold several physical rows per gather index (cfg.take_lanes).
        if cfg.interaction == "dot":
            # DLRM: the "feature vector" produced by the lookup stage is the
            # plain [T*D] concat in offset order (the interaction head
            # consumes it as [B, T, D]); the dense slice feeds the bottom
            # MLP, not the concat.
            emb_dim = cfg.num_tables * cfg.tables[0].dim
            layout = build_layout(
                internal, emb_dim, 0,
                onehot_max=cfg.onehot_max, take_lanes=cfg.take_lanes,
                take_stripes=cfg.take_stripes,
                onehot_factor_max=cfg.onehot_factor_max,
                onehot_r2=cfg.onehot_r2,
                sum_pairs=sum_pairs,
            )
        else:
            layout = build_layout(
                internal, cfg.feature_dim, cfg.dense_dim,
                onehot_max=cfg.onehot_max, take_lanes=cfg.take_lanes,
                take_stripes=cfg.take_stripes,
                onehot_factor_max=cfg.onehot_factor_max,
                onehot_r2=cfg.onehot_r2,
                sum_pairs=sum_pairs,
            )
        perm = tuple(int(p) for p in index_columns(layout, [t.table_id for t in internal]))
        return cls(cfg=cfg, layout=layout, index_perm=perm,
                   spec_tables=tuple(internal), qr_positions=qr_positions)

    def plan_indices(self, indices: jax.Array) -> jax.Array:
        """Config-order index matrix [B, num_tables] -> plan-order internal
        matrix: derive QR columns (q = id // rem in place, r = id % rem
        appended) then apply the spec->plan column permutation.  Shared by
        the single-device forward and the shard_map local forward."""
        if self.qr_positions:
            extras = []
            updated = indices
            for pos, rem in self.qr_positions:
                col = jax.lax.slice_in_dim(indices, pos, pos + 1, axis=1)
                extras.append(col % rem)  # R column, appended at the tail
                updated = jax.lax.dynamic_update_slice(
                    updated, col // rem, (0, pos))  # Q replaces in place
            indices = jnp.concatenate([updated] + extras, axis=1)
        if self.index_perm:
            indices = indices[:, jnp.asarray(self.index_perm, dtype=jnp.int32)]
        return indices

    def bad_take_rows(self, plan_indices: jax.Array):
        """[B] bool (or None): rows whose take-tier ids fall outside their
        table's [0, rows) range, from PLAN-order indices — poison these
        rows' scores with NaN (the fail-loud contract of forward's
        docstring; shared with the sharded forward).  Cost: B x n_take
        int compares + a [B] where — nothing on the gather path."""
        from .embedding import take_bad_rows

        lay = self.layout
        if not lay.take_groups:
            return None
        n_oh = lay.n_onehot
        tidx = jax.lax.slice_in_dim(plan_indices, n_oh, n_oh + lay.n_take,
                                    axis=1)
        return take_bad_rows(lay, tidx)

    @staticmethod
    def poison_scores(scores: jax.Array, bad) -> jax.Array:
        if bad is None:
            return scores
        return jnp.where(bad, jnp.asarray(jnp.nan, scores.dtype), scores)

    def forward(
        self,
        params: Dict,
        indices: jax.Array,
        dense: Optional[jax.Array] = None,
    ) -> jax.Array:
        """indices: [B, num_tables] in config table order; dense:
        [B, dense_dim].  Returns scores [B].

        Out-of-range take-tier row ids (positive overflow AND negative)
        poison their batch row's score with NaN, so bad indices surface
        rather than silently reading a wrong row — the sharded forward
        implements the identical contract (parallel/sharded.py; VERDICT r4
        #6).  The serving tier additionally validates indices host-side
        (serving/engine.py).
        """
        if indices.ndim != 2 or indices.shape[1] != self.cfg.num_tables:
            raise ValueError(
                f"indices must be [B, {self.cfg.num_tables}], got {indices.shape}"
            )
        if self.cfg.dense_dim:
            if dense is None or dense.shape != (indices.shape[0], self.cfg.dense_dim):
                raise ValueError(
                    f"dense must be [{indices.shape[0]}, {self.cfg.dense_dim}], got "
                    f"{None if dense is None else dense.shape}"
                )
        indices = self.plan_indices(indices)
        bad = self.bad_take_rows(indices)
        if self.cfg.interaction == "dot":
            emb = lookup_concat(params["tables"], indices, None)
            return self.poison_scores(
                interaction_head(self.cfg, params, emb, dense), bad)
        feats = lookup_concat(params["tables"], indices, dense)
        dtype = jnp.dtype(self.cfg.dtype)
        x = feats.astype(dtype)
        if self.cfg.interaction == "cross":
            # DCNv2: stacked cross layers on the concatenated [emb | dense]
            # feature vector, then the top MLP (arXiv:2008.13535).
            from .interaction import cross_network

            x = cross_network(x, params["cross"], precision=self.cfg.matmul_precision)
        scores = mlp_apply(
            params["mlp"], x, activation=self.cfg.mlp.activation,
            precision=self.cfg.matmul_precision,
        )
        return self.poison_scores(scores[:, 0], bad)


def interaction_head(cfg: ModelConfig, params: Dict, emb_flat: jax.Array,
                     dense: Optional[jax.Array]) -> jax.Array:
    """DLRM head: [B, T*D] offset-order embeddings (+ dense via the bottom
    MLP) -> pairwise dot interaction -> top MLP -> scores [B].

    Shared by the single-device forward and the shard_map serving path
    (parallel/sharded.py applies it after the feature psum)."""
    from .interaction import dot_interaction

    dtype = jnp.dtype(cfg.dtype)
    prec = cfg.matmul_precision
    B = emb_flat.shape[0]
    D = cfg.tables[0].dim
    vecs = emb_flat.reshape(B, cfg.num_tables, D).astype(dtype)
    bottom = None
    if cfg.bottom_mlp is not None:
        bottom = mlp_apply(
            params["bottom"], dense.astype(dtype),
            activation=cfg.bottom_mlp.activation, out_dtype=dtype,
            precision=prec,
        )
        vecs = jnp.concatenate([bottom[:, None, :], vecs], axis=1)
    z = dot_interaction(vecs, precision=prec)
    if bottom is not None:
        z = jnp.concatenate([bottom, z], axis=1)
    scores = mlp_apply(params["mlp"], z.astype(dtype), activation=cfg.mlp.activation,
                       precision=prec)
    return scores[:, 0]


def init_model(
    cfg: ModelConfig,
    table_scheme: str = "pm1",
    mlp_scheme: str = "ones",
    seed: int = 0,
    tables_np: Optional[Sequence[np.ndarray]] = None,
    mlp_np: Optional[Sequence[np.ndarray]] = None,
):
    """Build (model, params).  Default data matches the reference parity
    convention (pm1 tables, all-ones weights); pass tables_np/mlp_np to load
    real parameters."""
    model = FleetRecModel.create(cfg)
    specs = model.spec_tables or tuple(cfg.tables)
    if tables_np is None:
        # QR configs init over the INTERNAL specs (Q + hidden R tables)
        tables_np = [ref.init_table(t, scheme=table_scheme, seed=seed)
                     for t in specs]
    assert len(tables_np) == len(specs), (
        f"tables_np has {len(tables_np)} arrays but the model packs "
        f"{len(specs)} specs"
        + (" (QR configs pack Q + R tables — pass tables_np=None to "
           "auto-init, or arrays matching model.spec_tables)"
           if model.qr_positions else "")
    )
    if mlp_np is None:
        mlp = init_mlp_params(cfg.mlp, scheme=mlp_scheme, seed=seed, dtype=jnp.dtype(cfg.dtype))
    else:
        mlp = [jnp.asarray(w, dtype=jnp.dtype(cfg.dtype)) for w in mlp_np]
    packed = pack_tables(tables_np, specs, model.layout, dtype=jnp.dtype(cfg.table_dtype))
    params = {"tables": packed, "mlp": mlp}
    if cfg.bottom_mlp is not None:
        params["bottom"] = init_mlp_params(
            cfg.bottom_mlp, scheme=mlp_scheme, seed=seed + 1,
            dtype=jnp.dtype(cfg.dtype),
        )
    if cfg.interaction == "cross":
        from .interaction import init_cross_params

        params["cross"] = init_cross_params(
            cfg.feature_dim, cfg.cross_layers, rank=cfg.cross_rank,
            scheme=mlp_scheme, seed=seed, dtype=jnp.dtype(cfg.dtype),
        )
    return model, params


def forward(model: FleetRecModel, params, indices, dense=None):
    return model.forward(params, indices, dense)
