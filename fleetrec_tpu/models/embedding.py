"""Packed multi-table embedding storage + lookup for TPU.

TPU-native replacement for the reference's per-memory-channel table
placement and gather tree (FPGA/kernel/user_krnl/embedding_krnl/src/hls/
embedding_krnl.cpp: per-channel ``load_single_embedding_*`` burst loaders
:1049-1095 and the static interleave tree ``gather_embeddings`` :1230-1347).

Layout
------
Tables are grouped by embedding dim ``d``.  Within a group, each table packs
``s = 128 // d`` logical rows into one 128-lane physical row, and all the
group's physical rows are stacked into a single ``[phys_rows_total, 128]``
array.  Why: XLA pads the minor-most dim to 128 lanes, so a naive
``[rows, d]`` table wastes ``128/d``x HBM capacity and bandwidth (32x for
the reference's dim-4 PLRAM tables, 4x for the 1e8-row dim-32 DDR tables —
which would then not even fit in one chip's HBM).  The packed layout has
zero lane waste and every gather touches exactly one aligned 128-lane row.

Lookup
------
For a group: physical row index = base[t] + idx // s, sub-row = idx % s.
One ``take`` per group fetches [B, n_tables, 128]; a reshape to
[B, n, s, d] + take_along_axis(sub) extracts the logical row — all VPU
work that XLA fuses.  Finally a single static feature-axis gather places
every table slice at its configured ``out_offset`` (the VECTOR_START_IDX_*
layout, constants.hpp:279-306) and appends the dense tail, replacing the
reference's hard-wired group_4/group_2/group_1 interleave network.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LANES, ModelConfig, TableSpec


@dataclasses.dataclass(frozen=True)
class GroupMeta:
    """Static metadata for one dim-group (hashable; closed over by jit)."""

    dim: int
    table_ids: Tuple[int, ...]  # global table ids, in group order
    base_phys: Tuple[int, ...]  # physical-row base of each table in the group buffer
    phys_rows_total: int

    @property
    def rows_per_phys(self) -> int:
        return LANES // self.dim

    @property
    def num_tables(self) -> int:
        return len(self.table_ids)


@dataclasses.dataclass(frozen=True)
class PackedLayout:
    """Static lookup plan for a set of tables (usually one shard's subset)."""

    groups: Tuple[GroupMeta, ...]
    # Map from output feature position -> source position in
    # concat([group embeddings..., dense, zero]) — see lookup_concat.
    feature_perm: Tuple[int, ...]
    feature_dim: int
    dense_dim: int
    # column order of the index matrix: indices[:, k] belongs to
    # table id index_table_ids[k]
    index_table_ids: Tuple[int, ...]


def build_layout(
    tables: Sequence[TableSpec], feature_dim: int, dense_dim: int = 0
) -> PackedLayout:
    """Plan packing for ``tables`` into dim-groups + the static layout perm.

    ``feature_dim`` is the width of the produced feature vector; positions
    not covered by a table or the dense tail are zero-filled (model2 pads
    876 -> 880, embedding_98_krnl constants.hpp:13).
    """
    by_dim: Dict[int, List[TableSpec]] = {}
    for t in tables:
        by_dim.setdefault(t.dim, []).append(t)

    groups: List[GroupMeta] = []
    # source position of each table's flat slice in the concatenated
    # group-embedding vector
    src_offset: Dict[int, int] = {}
    cursor = 0
    for d in sorted(by_dim):
        ts = by_dim[d]
        bases, b = [], 0
        for t in ts:
            bases.append(b)
            b += t.phys_rows
        groups.append(
            GroupMeta(
                dim=d,
                table_ids=tuple(t.table_id for t in ts),
                base_phys=tuple(bases),
                phys_rows_total=b,
            )
        )
        for t in ts:
            src_offset[t.table_id] = cursor
            cursor += d
    emb_total = cursor

    # Source vector = [group embeddings (emb_total) | dense (dense_dim) | 0]
    zero_src = emb_total + dense_dim
    perm = np.full(feature_dim, zero_src, dtype=np.int64)
    for t in tables:
        perm[t.out_offset : t.out_offset + t.dim] = np.arange(
            src_offset[t.table_id], src_offset[t.table_id] + t.dim
        )
    if dense_dim:
        perm[feature_dim - dense_dim :] = np.arange(emb_total, emb_total + dense_dim)

    index_ids = tuple(tid for g in groups for tid in g.table_ids)
    return PackedLayout(
        groups=tuple(groups),
        feature_perm=tuple(int(p) for p in perm),
        feature_dim=feature_dim,
        dense_dim=dense_dim,
        index_table_ids=index_ids,
    )


@dataclasses.dataclass
class PackedTables:
    """Device-resident packed table storage: one [phys, 128] array per
    dim-group (a pytree leaf per group)."""

    layout: PackedLayout
    buffers: List[jax.Array]  # parallel to layout.groups

    def tree_flatten(self):
        return self.buffers, self.layout

    @classmethod
    def tree_unflatten(cls, layout, buffers):
        return cls(layout=layout, buffers=list(buffers))


jax.tree_util.register_pytree_node(
    PackedTables, PackedTables.tree_flatten, PackedTables.tree_unflatten
)


def pack_tables(
    tables_np: Sequence[np.ndarray],
    specs: Sequence[TableSpec],
    layout: PackedLayout,
    dtype=jnp.float32,
) -> PackedTables:
    """Pack per-table [rows, dim] numpy arrays into the grouped layout.

    ``tables_np`` is parallel to ``specs`` (order = config order); the
    layout's groups reference tables by table_id.
    """
    by_id = {s.table_id: (s, np.asarray(a)) for s, a in zip(specs, tables_np)}
    buffers = []
    for g in layout.groups:
        s = g.rows_per_phys
        buf = np.zeros((g.phys_rows_total, LANES), dtype=np.float32)
        for tid, base in zip(g.table_ids, g.base_phys):
            spec, arr = by_id[tid]
            assert arr.shape == (spec.rows, spec.dim), (tid, arr.shape)
            padded_rows = spec.phys_rows * s
            p = np.zeros((padded_rows, spec.dim), dtype=np.float32)
            p[: spec.rows] = arr
            buf[base : base + spec.phys_rows] = p.reshape(spec.phys_rows, LANES)
        buffers.append(jnp.asarray(buf, dtype=dtype))
    return PackedTables(layout=layout, buffers=buffers)


def group_lookup(
    buf: jax.Array, g: GroupMeta, idx: jax.Array
) -> jax.Array:
    """Gather one dim-group.  idx: [B, n_tables_in_group] logical row ids.
    Returns [B, n * d] embeddings in group order."""
    s = g.rows_per_phys
    base = jnp.asarray(g.base_phys, dtype=jnp.int32)  # [n]
    phys = base[None, :] + (idx // s).astype(jnp.int32)  # [B, n]
    sub = (idx % s).astype(jnp.int32)  # [B, n]
    rows = jnp.take(buf, phys.reshape(-1), axis=0)  # [B*n, 128]
    B, n = idx.shape
    rows = rows.reshape(B, n, s, g.dim)
    picked = jnp.take_along_axis(rows, sub[:, :, None, None], axis=2)  # [B,n,1,d]
    return picked.reshape(B, n * g.dim)


def lookup_concat(
    packed: PackedTables,
    indices: jax.Array,
    dense: Optional[jax.Array] = None,
    apply_layout: bool = True,
) -> jax.Array:
    """Full multi-table lookup + fixed-offset concat.

    indices: [B, num_tables] in *group order* — column k belongs to table
    ``layout.index_table_ids[k]``; use ``index_columns`` to permute an index
    matrix from config/spec order.  dense: [B, dense_dim].
    Returns [B, feature_dim] with the reference VECTOR_START_IDX layout
    when apply_layout, else the raw grouped concat (+ dense tail) for
    psum-mode where the layout permutation is folded into W1.
    """
    layout = packed.layout
    B = indices.shape[0]
    parts = []
    k = 0
    for g, buf in zip(layout.groups, packed.buffers):
        gi = jax.lax.slice_in_dim(indices, k, k + g.num_tables, axis=1)
        parts.append(group_lookup(buf, g, gi))
        k += g.num_tables
    emb = jnp.concatenate(parts, axis=1) if parts else jnp.zeros((B, 0))
    if not apply_layout:
        if dense is not None:
            emb = jnp.concatenate([emb, dense.astype(emb.dtype)], axis=1)
        return emb
    srcs = [emb]
    if layout.dense_dim:
        assert dense is not None
        srcs.append(dense.astype(emb.dtype))
    srcs.append(jnp.zeros((B, 1), dtype=emb.dtype))
    src = jnp.concatenate(srcs, axis=1)
    perm = jnp.asarray(layout.feature_perm, dtype=jnp.int32)
    return jnp.take(src, perm, axis=1)


def index_columns(layout: PackedLayout, spec_table_ids: Sequence[int]) -> np.ndarray:
    """Static permutation taking an index matrix whose columns follow
    ``spec_table_ids`` order into the group order lookup_concat expects:
    ``indices_grouped = indices[:, index_columns(...)]``."""
    col_of = {tid: j for j, tid in enumerate(spec_table_ids)}
    return np.asarray([col_of[tid] for tid in layout.index_table_ids], dtype=np.int64)
