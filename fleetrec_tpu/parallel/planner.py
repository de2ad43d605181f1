"""Placement planner: decide how a model's tables map onto a TPU mesh.

The TPU-native replacement for the reference's hand-written bank pinning
(`config_sp_embedding_*.txt` sp= lines assigning each table to an HBM/DDR/
PLRAM channel of the U280, plus the per-kernel constants.hpp channel maps):
given a ModelConfig, a model-axis size and a per-chip HBM budget, compute
where every byte lands, whether it fits, and how balanced the gather load
is — before paying a compile.

Three artifacts:

* ``plan()`` -> PlacementPlan: per-chip byte accounting (MLP weights and
  the W1 fold replicate; the unified take buffer row-shards and the
  one-hot/factored class buffers table-axis-shard over the "model" axis),
  per-shard row ranges with the tables they touch, each shard's one-hot
  class partition, and the expected fraction of gathers each shard serves
  under uniform traffic.

* ``split_table_columns()``: column-wise sharding of a giant/hot table —
  splits one dim-d table into k dim-(d/k) parts covering disjoint column
  ranges of the same rows.  Exact (tested bit-identical); the parts land in
  different regions of the packed buffer, so a hot table's lookup load
  spreads over more row-shards.  The per-query gather count for that table
  grows k-fold: use it for load balance / giant-row tables, not raw speed.

* ``cli plan`` prints the plan as JSON (fleetrec_tpu/cli.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import LANES, ModelConfig, TableSpec
from ..models.embedding import build_layout


_ITEMSIZE = {"float32": 4, "bfloat16": 2, "float16": 2, "int8": 1}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class ShardReport:
    """One model-axis shard's slice of the unified take buffer plus its
    partition of the one-hot/factored classes (VERDICT r3 #7: classes are
    table-axis sharded, each shard computes selection only for its own)."""

    shard: int
    phys_row_start: int
    phys_row_end: int
    take_bytes: int
    # table ids with at least one physical row on this shard
    tables_touched: Tuple[int, ...]
    # expected fraction of all take-gathers this shard serves when every
    # table's indices are uniform over its rows (1/n_model = perfectly flat)
    uniform_load_frac: float
    # one-hot/factored table ids this shard owns (computes selection for),
    # in class order — ShardedFleetRec._local_pre's contiguous split
    onehot_tables: Tuple[int, ...] = ()


@dataclasses.dataclass(frozen=True)
class PlacementPlan:
    config_name: str
    n_model: int
    table_dtype: str
    # per-chip byte accounting
    onehot_bytes: int          # total across shards (table-axis sharded)
    onehot_bytes_per_chip: int  # this chip's class partition (incl. padding)
    mlp_bytes: int             # replicated on every chip
    # permutation-folded W1 ([src_cols, H1], staged once per params by
    # ShardedFleetRec.shard_params when H1 < feature_dim) — replicated
    w1_fold_bytes: int
    take_bytes_total: int      # across all shards
    take_bytes_per_chip: int   # row-sharded slice
    activation_bytes: int      # rough per-batch working set (B rows in flight)
    per_chip_bytes: int
    hbm_budget_bytes: int
    fits: bool
    # smallest model-axis size at which per-chip bytes fit the budget
    # (0 = does not fit at any size: replicated parts alone exceed budget)
    min_model_shards: int
    shards: Tuple[ShardReport, ...]
    notes: Tuple[str, ...]

    def to_json(self) -> dict:
        d = dataclasses.asdict(self)
        d["shards"] = [dataclasses.asdict(s) for s in self.shards]
        return d


def plan(
    cfg: ModelConfig,
    n_model: int,
    hbm_budget_bytes: int = 16 << 30,  # v5e: 16 GiB HBM per chip
    batch_size: Optional[int] = None,
    max_in_flight: int = 2,
) -> PlacementPlan:
    """Byte-accurate placement accounting for ``cfg`` on ``n_model`` shards.

    Mirrors exactly what ``ShardedFleetRec.shard_params`` will do: the take
    buffer pads to a multiple of n_model and splits into equal row ranges;
    each one-hot/factored class's table axis pads likewise and splits into
    ceil(n/M)-table blocks; MLP weights and the W1 fold replicate.
    """
    B = batch_size or cfg.batch_size
    from ..config import qr_expand

    eff_tables, _qr_pos, sum_pairs = qr_expand(cfg)
    layout = build_layout(eff_tables, cfg.feature_dim, cfg.dense_dim,
                          onehot_max=cfg.onehot_max, take_lanes=cfg.take_lanes,
                          take_stripes=cfg.take_stripes,
                          onehot_factor_max=cfg.onehot_factor_max,
                          onehot_r2=cfg.onehot_r2, sum_pairs=sum_pairs)
    isz = _ITEMSIZE[cfg.table_dtype]

    # plain one-hot class buffers are [n, rows_pad, dim]; on TPU the minor
    # dim physically pads to 128 lanes and the second-minor to the dtype's
    # sublane tile (8 rows f32, 16 bf16, 32 int8), so HBM cost is 128/dim x
    # the logical bytes — THE tradeoff autotuning the one-hot threshold
    # buys speed with.  Factored classes store [n, R1, r2*dim] whose minor
    # dim is already a lane multiple: no bloat, only sublane padding on R1.
    sublane = {4: 8, 2: 16, 1: 32}[isz]
    onehot_bytes = 0
    onehot_bytes_per_chip = 0
    for c in layout.onehot_classes:
        per_table = (_round_up(c.r1, sublane) * c.r2 * c.dim * isz if c.r2
                     else _round_up(c.rows_pad, sublane) * LANES * isz)
        onehot_bytes += c.num_tables * per_table
        # shard_params pads the class table axis to a multiple of n_model
        # and shards it; each chip holds ceil(n_pad/M) = ceil(n/M) tables
        onehot_bytes_per_chip += -(-c.num_tables // n_model) * per_table
    mlp_isz = _ITEMSIZE[cfg.dtype]
    w = cfg.mlp.widths
    mlp_bytes = sum(a * b for a, b in zip(w[:-1], w[1:])) * mlp_isz
    # W1-fold staging buffer (sharded.py::fold_w1): active exactly when the
    # sharded forward ships the [B, H1] partial product instead of [B, F]
    w1_fold_bytes = 0
    if cfg.interaction == "none" and len(w) >= 2 and w[1] < cfg.feature_dim:
        n_emb = sum(c.num_tables * c.dim for c in layout.onehot_classes)
        n_emb += sum(g.num_tables * g.dim for g in layout.take_groups)
        src_cols = n_emb + cfg.dense_dim + 1
        w1_fold_bytes = src_cols * w[1] * mlp_isz

    phys_total = layout.take_phys_total
    phys_pad = -(-phys_total // n_model) * n_model if phys_total else 0
    take_bytes_total = phys_pad * layout.take_lanes * isz
    rows_per_shard = phys_pad // n_model if n_model else 0
    take_bytes_per_chip = rows_per_shard * layout.take_lanes * isz

    # per-table physical ranges in the unified buffer; a striped layout
    # gives each table one range per stripe
    S, H = layout.take_stripes, layout.stripe_height
    ranges: List[Tuple[int, List[Tuple[int, int]], int]] = []  # (tid, [(b,e)], rows)
    by_id = {t.table_id: t for t in eff_tables}
    for g in layout.take_groups:
        s = g.rows_per_phys
        for tid, base in zip(g.table_ids, g.base_phys):
            pr = -(-by_id[tid].rows // s)
            if S > 1:
                span = -(-pr // S)
                rs = [(k * H + base, k * H + base + span) for k in range(S)]
            else:
                rs = [(base, base + pr)]
            ranges.append((tid, rs, pr))

    n_take = layout.n_take
    shards = []
    for s in range(n_model):
        lo, hi = s * rows_per_shard, (s + 1) * rows_per_shard
        touched = []
        load = 0.0
        for tid, rs, pr in ranges:
            ov = sum(max(0, min(e, hi) - max(b, lo)) for b, e in rs)
            if ov:
                touched.append(tid)
                # each take-table contributes 1/n_take of the gathers; a
                # uniform index lands on this shard w.p. overlap/table_rows
                load += (ov / pr) / max(n_take, 1)
        # one-hot/factored class partition: contiguous ceil(n/M)-table
        # blocks of each class (matches ShardedFleetRec._local_pre)
        oh_owned: List[int] = []
        for c in layout.onehot_classes:
            n_loc = -(-c.num_tables // n_model)
            oh_owned.extend(c.table_ids[s * n_loc : (s + 1) * n_loc])
        shards.append(
            ShardReport(
                shard=s,
                phys_row_start=lo,
                phys_row_end=hi,
                take_bytes=take_bytes_per_chip,
                tables_touched=tuple(touched),
                uniform_load_frac=round(load, 6),
                onehot_tables=tuple(oh_owned),
            )
        )

    # rough activation working set: gathered rows + features + widest
    # hidden, x in-flight batches (fp32 compute intermediates)
    act = B * (n_take * layout.take_lanes * isz + (cfg.feature_dim + max(w)) * 4)
    act *= max_in_flight

    replicated = mlp_bytes + w1_fold_bytes + act
    per_chip = replicated + take_bytes_per_chip + onehot_bytes_per_chip
    fits = per_chip <= hbm_budget_bytes
    avail = hbm_budget_bytes - replicated
    if avail <= 0:
        min_shards = 0
    elif take_bytes_total == 0 and onehot_bytes == 0:
        min_shards = 1
    else:
        # (take + one-hot) bytes both divide by the model axis now; solve
        # sharded_total / M <= avail (class padding ignored: <= one
        # table's bytes per class)
        sharded_total = phys_total * layout.take_lanes * isz + onehot_bytes
        min_shards = max(1, int(-(-sharded_total // avail)))

    notes = []
    if layout.take_phys_total:
        loads = [sh.uniform_load_frac for sh in shards]
        imb = max(loads) / (sum(loads) / len(loads)) if sum(loads) else 1.0
        if imb > 1.25:
            notes.append(
                f"uniform-traffic gather load imbalance {imb:.2f}x: set "
                f"take_stripes={n_model} (striped layout balances by "
                "construction); split_table_columns also spreads a hot table"
            )
    if not fits and cfg.table_dtype == "float32":
        notes.append("tables are fp32: bfloat16 halves, int8 quarters, take bytes")
    if not fits and min_shards:
        notes.append(f"fits at n_model >= {min_shards}")

    return PlacementPlan(
        config_name=cfg.name,
        n_model=n_model,
        table_dtype=cfg.table_dtype,
        onehot_bytes=onehot_bytes,
        onehot_bytes_per_chip=onehot_bytes_per_chip,
        mlp_bytes=mlp_bytes,
        w1_fold_bytes=w1_fold_bytes,
        take_bytes_total=take_bytes_total,
        take_bytes_per_chip=take_bytes_per_chip,
        activation_bytes=act,
        per_chip_bytes=per_chip,
        hbm_budget_bytes=hbm_budget_bytes,
        fits=fits,
        min_model_shards=min_shards,
        shards=tuple(shards),
        notes=tuple(notes),
    )


def split_table_columns(
    cfg: ModelConfig, table_id: int, parts: int
) -> Tuple[ModelConfig, np.ndarray]:
    """Column-shard one table: dim d -> ``parts`` tables of dim d/parts.

    Returns (new_cfg, index_map) where ``index_map`` expands an index
    matrix in the OLD config's column order to the new one:
    ``new_indices = indices[:, index_map]`` (the split table's row id is
    duplicated into each part's column).  Table data splits with
    ``split_table_data``.  Exact: the parts cover disjoint column ranges
    [k*d/p, (k+1)*d/p) of the same rows at out_offset + k*d/p, so the
    concatenated feature vector is bit-identical.

    This is the "column" half of BASELINE config 5's row+column sharding:
    the parts occupy different regions of the packed take buffer, so a
    hot/giant table's lookups spread over more row-shards of the mesh.
    """
    dc = dataclasses
    by_pos = {t.table_id: i for i, t in enumerate(cfg.tables)}
    if table_id not in by_pos:
        raise ValueError(f"no table {table_id} in {cfg.name}")
    t = cfg.tables[by_pos[table_id]]
    if parts < 2 or t.dim % parts:
        raise ValueError(f"parts={parts} must divide dim={t.dim}")
    nd = t.dim // parts
    if nd not in (1, 2, 4, 8, 16, 32, 64, 128):
        raise ValueError(f"split dim {nd} unsupported")

    next_id = max(tt.table_id for tt in cfg.tables) + 1
    new_tables: List[TableSpec] = []
    index_map: List[int] = []
    for i, tt in enumerate(cfg.tables):
        if tt.table_id != table_id:
            new_tables.append(tt)
            index_map.append(i)
            continue
        for k in range(parts):
            new_tables.append(
                dc.replace(
                    tt,
                    table_id=tt.table_id if k == 0 else next_id + k - 1,
                    dim=nd,
                    out_offset=tt.out_offset + k * nd,
                )
            )
            index_map.append(i)
    new_cfg = dc.replace(
        cfg, name=f"{cfg.name}+split{table_id}x{parts}", tables=tuple(new_tables)
    )
    new_cfg.validate()
    return new_cfg, np.asarray(index_map, dtype=np.int64)


def split_table_data(
    tables_np: Sequence[np.ndarray], cfg: ModelConfig, table_id: int, parts: int
) -> List[np.ndarray]:
    """Split the [rows, dim] array of ``table_id`` into ``parts`` column
    slices, in the position order split_table_columns produces."""
    out: List[np.ndarray] = []
    for t, arr in zip(cfg.tables, tables_np):
        if t.table_id != table_id:
            out.append(arr)
            continue
        nd = t.dim // parts
        out.extend(arr[:, k * nd : (k + 1) * nd] for k in range(parts))
    return out
