"""Packed multi-table embedding storage + lookup for TPU.

TPU-native replacement for the reference's per-memory-channel table
placement and gather tree (FPGA/kernel/user_krnl/embedding_krnl/src/hls/
embedding_krnl.cpp: per-channel ``load_single_embedding_*`` burst loaders
:1049-1095 and the static interleave tree ``gather_embeddings`` :1230-1347).

Strategy (measured on v5e; see bench notes in ops/):

* Small tables (rows <= onehot_max, the reference's PLRAM/URAM class):
  one-hot MXU lookup.  Tables are stacked per (rows_pad, dim) class into a
  [n_tables, rows_pad, dim] buffer; lookup is a batched dot_general of a
  one-hot [B, n, rows_pad] against it.  Exact in fp32 (each reduction has
  exactly one nonzero) and ~2x faster than XLA's row gather below ~2K rows.

* Large tables (the HBM/DDR class): ``s = 128 // dim`` logical rows pack
  into one 128-lane physical row (zero lane-padding waste — a naive
  [rows, dim] layout costs 128/dim x HBM capacity, 4x for the 1e8-row
  dim-32 tables which then don't fit), ALL tables share ONE unified
  [phys_total, 128] buffer, and a single jnp.take fetches every (query,
  table) physical row at once (~13-16 ns/row, the measured XLA gather
  floor; a hand-rolled Pallas DMA pipeline measured 3x slower).  Sub-row
  extraction uses a mask-einsum (2.5x faster than take_along_axis, and
  exact: one nonzero per reduction).

Finally a single static feature-axis gather places every table slice at
its configured ``out_offset`` (the VECTOR_START_IDX_* layout,
constants.hpp:279-306) and appends the dense tail, replacing the
reference's hard-wired group_4/group_2/group_1 interleave network.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LANES, ModelConfig, TableSpec

# Tables at or below this row count go to the one-hot MXU path.
DEFAULT_ONEHOT_MAX = 2048

# Bucketing the one-hot classes: each extra class costs one more XLA op
# (~0.1-0.4 ms fixed on this chip) but stops small tables padding to the
# class max (the mask costs B*n*rows_pad VPU compares, ~1 ns each at
# B=4096 — docs/DESIGN.md "One-hot cost mechanism").  Expressed in row
# units: one op's fixed cost ~ 0.2 ms / (B * 1 ns) ~ 48K padded rows.
_BUCKET_FIXED_ROWS = 49152


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _partition_rows(rows_sorted: List[int], fixed: int = _BUCKET_FIXED_ROWS) -> List[int]:
    """Optimal contiguous partition of a sorted row-count list into buckets
    minimizing sum over buckets of (fixed + n_bucket * max_rows_bucket) —
    the per-op overhead vs padded-compare-volume tradeoff.  Returns bucket
    end indices (exclusive).  O(k^2) DP; k = tables per dim (<= ~200)."""
    k = len(rows_sorted)
    cost = [0.0] * (k + 1)
    back = [0] * (k + 1)
    for i in range(1, k + 1):
        best, bj = None, 0
        for j in range(i):
            c = cost[j] + fixed + (i - j) * rows_sorted[i - 1]
            if best is None or c < best:
                best, bj = c, j
        cost[i], back[i] = best, bj
    ends = []
    i = k
    while i > 0:
        ends.append(i)
        i = back[i]
    return ends[::-1]


@dataclasses.dataclass(frozen=True)
class OneHotClass:
    """Tables of one (rows_pad, dim) class, stacked.

    r2 == 0 (plain): buffer [n, rows_pad, dim]; selection is one one-hot
    MXU matmul (B*n*rows_pad compares for the mask).

    r2 > 0 (factored hi/lo): rows_pad = R1 * r2 and the buffer is stored
    [n, R1, r2*dim]; row id splits into hi = id // r2 (one-hot MXU matmul
    over R1) and lo = id % r2 (exact mask-einsum over r2) — compare cost
    drops from rows_pad to R1 + r2 per index, and the minor dim r2*dim is
    kept a multiple of 128 so the buffer has no lane bloat.  Both
    contractions have exactly one nonzero per reduction row: exact."""

    dim: int
    rows_pad: int
    table_ids: Tuple[int, ...]
    r2: int = 0

    @property
    def num_tables(self) -> int:
        return len(self.table_ids)

    @property
    def r1(self) -> int:
        assert self.r2 > 0
        return self.rows_pad // self.r2


@dataclasses.dataclass(frozen=True)
class TakeGroup:
    """Tables of one dim sharing the unified packed buffer.

    base_phys are physical-row offsets: absolute in the unified buffer for
    an unstriped layout, intra-stripe for a striped one (see PackedLayout.
    take_stripes).  ``lanes`` is the physical row width: 128 for 4-byte
    tables; 64 for 16-bit tables, whose row gather measures 2x faster
    (6 vs 13 ns/row on v5e) when the fetched slice is narrower than 128
    lanes.
    """

    dim: int
    table_ids: Tuple[int, ...]
    base_phys: Tuple[int, ...]
    lanes: int = LANES

    @property
    def rows_per_phys(self) -> int:
        return self.lanes // self.dim

    @property
    def num_tables(self) -> int:
        return len(self.table_ids)


@dataclasses.dataclass(frozen=True)
class PackedLayout:
    """Static lookup plan for a set of tables (usually one shard's subset)."""

    onehot_classes: Tuple[OneHotClass, ...]
    take_groups: Tuple[TakeGroup, ...]
    take_phys_total: int
    take_lanes: int
    # Map output feature position -> source position in
    # concat([onehot outs..., take outs..., dense, zero]).
    feature_perm: Tuple[int, ...]
    feature_dim: int
    dense_dim: int
    # index-matrix column order: column k belongs to table index_table_ids[k]
    index_table_ids: Tuple[int, ...]
    # logical row count per take COLUMN (plan order) — the fail-loud range
    # check both forwards apply: a take id outside [0, rows) poisons its
    # batch row's score with NaN instead of silently reading a wrong row
    take_rows: Tuple[int, ...] = ()
    # QR compressed embeddings (config.qr_expand): (dst_src, src_src, dim)
    # source-column triples — AFTER the per-table lookups, emb[:, dst:+d]
    # += emb[:, src:+d] (Q += R) and the src (R) columns are dropped by
    # the feature permutation (their tables are hidden from it).
    qr_sum_pairs: Tuple[Tuple[int, int, int], ...] = ()
    # Striped layout: the buffer is take_stripes stripes of stripe_height
    # rows; physical row p of a table at intra-stripe offset base lives at
    # (p % S) * H + base + p // S.  With S a multiple of the mesh "model"
    # axis, EVERY row-shard owns exactly 1/S of every table — gather load
    # balanced by construction (a giant-table config like criteo measures
    # 5.3x imbalance unstriped).  S=1 = plain contiguous segments.
    take_stripes: int = 1
    stripe_height: int = 0

    @property
    def n_onehot(self) -> int:
        return sum(c.num_tables for c in self.onehot_classes)

    @property
    def n_take(self) -> int:
        return sum(g.num_tables for g in self.take_groups)


def build_layout(
    tables: Sequence[TableSpec],
    feature_dim: int,
    dense_dim: int = 0,
    onehot_max: int = DEFAULT_ONEHOT_MAX,
    take_lanes: int = LANES,
    take_stripes: int = 1,
    onehot_factor_max: int = 0,
    onehot_r2: int = 64,
    sum_pairs: Sequence[Tuple[int, int]] = (),
) -> PackedLayout:
    """Plan the two-path (or three-path) packing + the static output-layout
    permutation.

    ``feature_dim`` is the width of the produced feature vector; positions
    not covered by a table or the dense tail are zero-filled (model2 pads
    876 -> 880, embedding_98_krnl constants.hpp:13).

    onehot_factor_max > 0 adds the factored hi/lo one-hot tier for tables
    with onehot_max < rows <= onehot_factor_max (see OneHotClass).

    sum_pairs: (dst_table_id, src_table_id) pairs for QR compressed
    embeddings (config.qr_expand): src tables are packed and looked up
    normally but HIDDEN from the feature permutation; their output
    columns are summed into dst's (lookup_concat) before the layout
    gather.
    """
    hidden = {src for _dst, src in sum_pairs}
    small = [t for t in tables if t.rows <= onehot_max]
    mid = [t for t in tables
           if onehot_max < t.rows <= onehot_factor_max]
    large = [t for t in tables if t.rows > max(onehot_max, onehot_factor_max)]

    # One-hot classes: per dim, tables partition into row-size buckets by a
    # DP balancing per-op fixed overhead against padded mask volume (the
    # mask costs B*n*rows_pad compares; one class per dim measured 2.4-2.8x
    # compare-volume waste on the paper geometries).
    by_class: Dict[int, List[TableSpec]] = {}
    for t in small:
        by_class.setdefault(t.dim, []).append(t)
    classes_list: List[OneHotClass] = []
    for d, ts in sorted(by_class.items()):
        ts = sorted(ts, key=lambda t: t.rows)
        ends = _partition_rows([t.rows for t in ts])
        start = 0
        for end in ends:
            bucket = ts[start:end]
            classes_list.append(
                OneHotClass(
                    dim=d,
                    rows_pad=_round_up(max(max(t.rows for t in bucket), 8), 8),
                    table_ids=tuple(t.table_id for t in bucket),
                )
            )
            start = end
    # Factored hi/lo classes for the mid tier: same per-dim DP bucketing;
    # R2 rounds up so the stored minor dim R2*d is a lane multiple (no
    # bloat), rows pad to a multiple of R2.
    by_mid: Dict[int, List[TableSpec]] = {}
    for t in mid:
        by_mid.setdefault(t.dim, []).append(t)
    for d, ts in sorted(by_mid.items()):
        r2 = _round_up(max(onehot_r2, 1), max(LANES // d, 1))
        ts = sorted(ts, key=lambda t: t.rows)
        ends = _partition_rows([t.rows for t in ts])
        start = 0
        for end in ends:
            bucket = ts[start:end]
            classes_list.append(
                OneHotClass(
                    dim=d,
                    rows_pad=_round_up(max(t.rows for t in bucket), r2),
                    table_ids=tuple(t.table_id for t in bucket),
                    r2=r2,
                )
            )
            start = end
    classes = tuple(classes_list)

    by_dim: Dict[int, List[TableSpec]] = {}
    for t in large:
        by_dim.setdefault(t.dim, []).append(t)
    if large:
        take_lanes = max(take_lanes, max(t.dim for t in large))
    S = max(take_stripes, 1)
    groups: List[TakeGroup] = []
    phys = 0  # S=1: absolute rows; S>1: intra-stripe rows (stripe height)
    for d in sorted(by_dim):
        ts = by_dim[d]
        s_rows = take_lanes // d
        bases = []
        for t in ts:
            bases.append(phys)
            pr = -(-t.rows // s_rows)
            phys += -(-pr // S) if S > 1 else pr
        groups.append(
            TakeGroup(dim=d, table_ids=tuple(t.table_id for t in ts),
                      base_phys=tuple(bases), lanes=take_lanes)
        )
    stripe_height = phys if S > 1 else 0
    phys_total = phys * S if S > 1 else phys

    # source offsets: onehot outs first (class order), then take outs
    src_offset: Dict[int, int] = {}
    cursor = 0
    for c in classes:
        for tid in c.table_ids:
            src_offset[tid] = cursor
            cursor += c.dim
    for g in groups:
        for tid in g.table_ids:
            src_offset[tid] = cursor
            cursor += g.dim
    emb_total = cursor

    zero_src = emb_total + dense_dim
    perm = np.full(feature_dim, zero_src, dtype=np.int64)
    for t in tables:
        if t.table_id in hidden:
            continue  # QR remainder tables: summed into Q, not placed
        perm[t.out_offset : t.out_offset + t.dim] = np.arange(
            src_offset[t.table_id], src_offset[t.table_id] + t.dim
        )
    if dense_dim:
        perm[feature_dim - dense_dim :] = np.arange(emb_total, emb_total + dense_dim)

    dim_of = {t.table_id: t.dim for t in tables}
    qr_sum = tuple(
        (src_offset[dst], src_offset[src], dim_of[dst])
        for dst, src in sum_pairs
    )

    index_ids = tuple(
        [tid for c in classes for tid in c.table_ids]
        + [tid for g in groups for tid in g.table_ids]
    )
    rows_of = {t.table_id: t.rows for t in tables}
    take_rows = tuple(rows_of[tid] for g in groups for tid in g.table_ids)
    return PackedLayout(
        onehot_classes=classes,
        take_groups=tuple(groups),
        take_phys_total=phys_total,
        take_lanes=take_lanes,
        feature_perm=tuple(int(p) for p in perm),
        feature_dim=feature_dim,
        dense_dim=dense_dim,
        index_table_ids=index_ids,
        take_rows=take_rows,
        take_stripes=S,
        stripe_height=stripe_height,
        qr_sum_pairs=qr_sum,
    )


@dataclasses.dataclass
class PackedTables:
    """Device-resident storage: one stacked buffer per one-hot class plus
    the unified take buffer (pytree).  For int8-quantized tables the
    per-table power-of-two dequant scales ride along (power-of-two so the
    reference's ±1 parity data dequantizes bit-exactly: ±64 * 2^-6)."""

    layout: PackedLayout
    onehot_buffers: List[jax.Array]  # parallel to layout.onehot_classes
    take_buffer: Optional[jax.Array]  # [phys_total, lanes] or None
    onehot_scales: Optional[List[jax.Array]] = None  # [n,1,1] f32 per class
    take_scales: Optional[jax.Array] = None  # [n_take] f32 per column

    def tree_flatten(self):
        leaves = list(self.onehot_buffers)
        if self.take_buffer is not None:
            leaves.append(self.take_buffer)
        quant = self.onehot_scales is not None
        if quant:
            leaves.extend(self.onehot_scales)
            if self.take_scales is not None:
                leaves.append(self.take_scales)
        return leaves, (self.layout, self.take_buffer is not None, quant)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        layout, has_take, quant = aux
        leaves = list(leaves)
        n_oh = len(layout.onehot_classes)
        bufs = leaves[:n_oh]
        rest = leaves[n_oh:]
        take = rest.pop(0) if has_take else None
        oh_scales = take_scales = None
        if quant:
            oh_scales = rest[:n_oh]
            rest = rest[n_oh:]
            take_scales = rest.pop(0) if has_take else None
        return cls(layout=layout, onehot_buffers=bufs, take_buffer=take,
                   onehot_scales=oh_scales, take_scales=take_scales)


jax.tree_util.register_pytree_node(
    PackedTables, PackedTables.tree_flatten, PackedTables.tree_unflatten
)


def _pow2_scale(arr: np.ndarray) -> float:
    """Smallest power-of-two scale with arr/scale in [-127, 127]."""
    amax = float(np.max(np.abs(arr))) if arr.size else 0.0
    if amax == 0.0:
        return 1.0
    e = int(np.ceil(np.log2(amax / 127.0)))
    return float(2.0 ** e)


def pack_tables(
    tables_np: Sequence[np.ndarray],
    specs: Sequence[TableSpec],
    layout: PackedLayout,
    dtype=jnp.float32,
) -> PackedTables:
    """Pack per-table [rows, dim] numpy arrays into the two-path layout.

    dtype int8 enables quantized storage: per-table power-of-two scales,
    int8 buffers (4x memory vs fp32), dequant fused after lookup."""
    by_id = {s.table_id: (s, np.asarray(a)) for s, a in zip(specs, tables_np)}
    quant = jnp.dtype(dtype) == jnp.int8
    if quant:
        scales = {tid: _pow2_scale(a) for tid, (_sp, a) in by_id.items()}
        by_id = {
            tid: (sp, np.clip(np.rint(a / scales[tid]), -127, 127).astype(np.float32))
            for tid, (sp, a) in by_id.items()
        }

    onehot_buffers = []
    onehot_scales = [] if quant else None
    for c in layout.onehot_classes:
        buf = np.zeros((c.num_tables, c.rows_pad, c.dim), dtype=np.float32)
        for j, tid in enumerate(c.table_ids):
            spec, arr = by_id[tid]
            assert arr.shape == (spec.rows, spec.dim), (tid, arr.shape)
            buf[j, : spec.rows] = arr
        if c.r2:
            # factored storage: row id r lives at [r // r2, (r % r2)*d : +d]
            buf = buf.reshape(c.num_tables, c.r1, c.r2 * c.dim)
        onehot_buffers.append(jnp.asarray(buf, dtype=dtype))
        if quant:
            sc = np.asarray([scales[tid] for tid in c.table_ids], np.float32)
            onehot_scales.append(jnp.asarray(sc[:, None, None]))

    take = None
    if layout.take_phys_total:
        S, H = layout.take_stripes, layout.stripe_height
        buf = np.zeros((layout.take_phys_total, layout.take_lanes), dtype=np.float32)
        for g in layout.take_groups:
            s = g.rows_per_phys
            for tid, base in zip(g.table_ids, g.base_phys):
                spec, arr = by_id[tid]
                assert arr.shape == (spec.rows, spec.dim), (tid, arr.shape)
                phys_rows = -(-spec.rows // s)
                p = np.zeros((phys_rows * s, spec.dim), dtype=np.float32)
                p[: spec.rows] = arr
                packed_rows = p.reshape(phys_rows, g.lanes)
                if S > 1:
                    pr = np.arange(phys_rows)
                    buf[(pr % S) * H + base + pr // S] = packed_rows
                else:
                    buf[base : base + phys_rows] = packed_rows
        take = jnp.asarray(buf, dtype=dtype)
    take_scales = None
    if quant and layout.take_groups:
        sc = []
        for g in layout.take_groups:
            sc.extend(scales[tid] for tid in g.table_ids)
        take_scales = jnp.asarray(np.asarray(sc, np.float32))
    return PackedTables(
        layout=layout, onehot_buffers=onehot_buffers, take_buffer=take,
        onehot_scales=onehot_scales if quant else None, take_scales=take_scales,
    )


def take_phys_sub(layout: PackedLayout, tidx: jax.Array):
    """Map plan-order logical row ids [B, n_take] to (buffer row, sub-row).

    One formula covers both layouts: contiguous (S=1) and striped
    (row p of a table at intra-stripe offset base -> (p % S) * H + base +
    p // S).  Used by the single-device and shard_map forwards."""
    bases, ss = [], []
    for g in layout.take_groups:
        bases.extend(g.base_phys)
        ss.extend([g.rows_per_phys] * g.num_tables)
    base = jnp.asarray(bases, dtype=jnp.int32)
    s_arr = jnp.asarray(ss, dtype=jnp.int32)
    p = (tidx // s_arr[None, :]).astype(jnp.int32)
    sub = (tidx % s_arr[None, :]).astype(jnp.int32)
    S = layout.take_stripes
    if S > 1:
        phys = (p % S) * layout.stripe_height + base[None, :] + p // S
    else:
        phys = base[None, :] + p
    return phys, sub


def take_bad_rows(layout: PackedLayout, tidx: jax.Array) -> jax.Array:
    """[B] bool: batch rows with ANY take-tier id outside its table's
    logical [0, rows) range.  Shared fail-loud contract of the single and
    sharded forwards: such rows' scores are poisoned with NaN (a bare
    jnp.take would NaN-fill only ids past the whole buffer and silently
    wrap/misread everything else — VERDICT r4 #6)."""
    lim = jnp.asarray(
        np.minimum(np.asarray(layout.take_rows, np.int64),
                   np.iinfo(np.int32).max).astype(np.int32))
    return jnp.any((tidx < 0) | (tidx >= lim[None, :]), axis=1)


def _onehot_lookup(
    buf: jax.Array, c: OneHotClass, idx: jax.Array,
    scale: Optional[jax.Array] = None,
) -> jax.Array:
    """idx: [B, n] -> [B, n*d].  Exact: one nonzero per reduction row.
    int8 buffers accumulate in int32 (exact) and dequant by the per-table
    power-of-two scale."""
    B, n = idx.shape
    quant = buf.dtype == jnp.int8
    if c.r2:
        # factored hi/lo: hi-one-hot MXU matmul over R1, then exact lo
        # mask-einsum over r2 (compare cost R1 + r2 instead of rows_pad)
        hi = (idx // c.r2).astype(jnp.int32)
        lo = (idx % c.r2).astype(jnp.int32)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (c.r1,), 0)
        ohh = (hi[..., None] == i1).astype(buf.dtype)  # [B, n, R1]
        A = jax.lax.dot_general(
            ohh, buf,
            dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )  # [n, B, r2*d]
        A = A.transpose(1, 0, 2).reshape(B, n, c.r2, c.dim)
        i2 = jax.lax.broadcasted_iota(jnp.int32, (c.r2,), 0)
        if quant:
            m = (lo[..., None] == i2).astype(jnp.int32)
            e = jnp.einsum("bnld,bnl->bnd", A, m)
            e = e.astype(jnp.float32) * scale.reshape(1, n, 1)
            return e.reshape(B, n * c.dim)
        m = (lo[..., None] == i2).astype(A.dtype)
        e = jnp.einsum("bnld,bnl->bnd", A, m)
        return e.reshape(B, n * c.dim).astype(buf.dtype)
    iota = jax.lax.broadcasted_iota(jnp.int32, (c.rows_pad,), 0)
    oh = (idx[..., None] == iota).astype(buf.dtype)  # [B, n, R]
    out = jax.lax.dot_general(
        oh, buf,
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.int32 if quant else jnp.float32,
    )  # [n, B, d]
    if quant:
        out = out.astype(jnp.float32) * scale  # scale: [n,1,1]
        return out.transpose(1, 0, 2).reshape(B, n * c.dim)
    return out.transpose(1, 0, 2).reshape(B, n * c.dim).astype(buf.dtype)


def lookup_concat(
    packed: PackedTables,
    indices: jax.Array,
    dense: Optional[jax.Array] = None,
    apply_layout: bool = True,
) -> jax.Array:
    """Full multi-table lookup + fixed-offset concat.

    indices: [B, num_tables] in *plan order* — column k belongs to table
    ``layout.index_table_ids[k]``; use ``index_columns`` to permute an index
    matrix from config/spec order.  dense: [B, dense_dim].
    Returns [B, feature_dim] in the reference VECTOR_START_IDX layout when
    apply_layout, else the raw plan-order concat (+ dense tail) for
    psum-mode where the layout permutation is folded into W1.

    Out-of-range row ids AT THIS LAYER: one-hot path yields zeros; take
    path follows jnp.take's fill semantics (NaN on positive overflow; a
    negative id wraps NumPy-style).  The full fail-loud contract — ANY
    take-tier id outside its table's [0, rows) poisons the row's SCORE
    with NaN — is enforced by FleetRecModel.forward via take_bad_rows on
    the [B] score vector (zero hot-path cost; a [B, emb]-wide poison here
    measured ~3% on model1 e2e).
    """
    layout = packed.layout
    B = indices.shape[0]
    quant = packed.onehot_scales is not None
    parts = []
    k = 0
    for i, (c, buf) in enumerate(zip(layout.onehot_classes, packed.onehot_buffers)):
        gi = jax.lax.slice_in_dim(indices, k, k + c.num_tables, axis=1)
        sc = packed.onehot_scales[i] if quant else None
        n_buf = buf.shape[0]
        if n_buf > c.num_tables:
            # ShardedFleetRec.shard_params pads the class table axis to a
            # multiple of the model-axis size (all-zero pad tables); the
            # GSPMD training path shares those params with serving, so
            # tolerate the padding here: pad the index columns, drop the
            # pad tables' output columns.
            gi = jnp.pad(gi, ((0, 0), (0, n_buf - c.num_tables)))
            out = _onehot_lookup(buf, c, gi, sc)
            parts.append(
                jax.lax.slice_in_dim(out, 0, c.num_tables * c.dim, axis=1))
        else:
            parts.append(_onehot_lookup(buf, c, gi, sc))
        k += c.num_tables

    if layout.take_groups:
        n_take = layout.n_take
        tidx = jax.lax.slice_in_dim(indices, k, k + n_take, axis=1)  # [B, n_take]
        phys, sub = take_phys_sub(layout, tidx)
        rows = jnp.take(packed.take_buffer, phys.reshape(-1), axis=0)
        rows = rows.reshape(B, n_take, layout.take_lanes)
        tq = packed.take_buffer.dtype == jnp.int8
        # per-group sub-row extraction via mask-einsum (exact; int8 rows
        # extract in int32 then dequant per column)
        kk = 0
        for g in layout.take_groups:
            ng, s, d = g.num_tables, g.rows_per_phys, g.dim
            r = jax.lax.slice_in_dim(rows, kk, kk + ng, axis=1).reshape(B, ng, s, d)
            sb = jax.lax.slice_in_dim(sub, kk, kk + ng, axis=1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
            if tq:
                m = (sb[..., None] == iota).astype(jnp.int32)
                e = jnp.einsum("bnsd,bns->bnd", r.astype(jnp.int32), m)
                sc = jax.lax.slice_in_dim(packed.take_scales, kk, kk + ng)
                e = e.astype(jnp.float32) * sc[None, :, None]
            else:
                m = (sb[..., None] == iota).astype(r.dtype)
                e = jnp.einsum("bnsd,bns->bnd", r, m)
            parts.append(e.reshape(B, ng * d))
            kk += ng

    emb = jnp.concatenate(parts, axis=1) if parts else jnp.zeros((B, 0))
    emb = apply_qr_sums(emb, layout)
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


def apply_qr_sums(emb: jax.Array, layout: PackedLayout) -> jax.Array:
    """QR compressed embeddings: sum each remainder table's output columns
    into its quotient table's (emb = Q[q] + R[r]) in the pre-permutation
    source layout.  Linear, so the sharded forward may apply it to
    per-shard partials before the psum (sum-then-psum == psum-then-sum).
    No-op when the layout has no QR pairs."""
    for dst, src, d in layout.qr_sum_pairs:
        emb = emb.at[:, dst : dst + d].add(
            jax.lax.slice_in_dim(emb, src, src + d, axis=1))
    return emb


def index_columns(layout: PackedLayout, spec_table_ids: Sequence[int]) -> np.ndarray:
    """Static permutation taking an index matrix whose columns follow
    ``spec_table_ids`` order into the plan order lookup_concat expects:
    ``indices_plan = indices[:, index_columns(...)]``."""
    col_of = {tid: j for j, tid in enumerate(spec_table_ids)}
    return np.asarray([col_of[tid] for tid in layout.index_table_ids], dtype=np.int64)
