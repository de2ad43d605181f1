"""Direct packed-buffer synthesis for giant table sets.

The normal init path (reference.init_tables -> pack_tables) materializes
every table as a [rows, dim] float32 numpy array first — at BASELINE
config 5's real cardinalities (criteo_terabyte: 1.655 B rows, the 1B-row
giant alone would be 128 GB fp32) that is impossible on any host.  The
reference faces the same problem scaled down and solves it by synthesizing
rows on the fly inside the per-table init loops
(FPGA/host/embedding_krnl/host.cpp:282-718 writes the +1/-1 pattern
directly into the staging buffers); this module is that idea applied to
the packed TPU layout: generate the pm1 parity pattern (even row = +1,
odd = -1, reference.py convention) DIRECTLY into the unified take buffer,
shard by shard, via jax.make_array_from_callback — peak host memory is one
shard chunk, and the result is already placed on the mesh so
shard_params's device_put is a no-op for it.

Used by scripts/criteo_full_dryrun.py to execute the planner's fit claim
at full cardinality; pm1_take_chunk is validated bit-identical to
pack_tables on shrunken geometries (tests/test_ops.py)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from .embedding import PackedLayout, PackedTables

# pm1 data has amax 1.0 -> _pow2_scale picks 2^-6 (quantized value ±64,
# dequantizes to ±1 bit-exactly)
_PM1_INT8_SCALE = 2.0 ** -6
_PM1_INT8_Q = 64


def pm1_take_chunk(layout: PackedLayout, cfg: ModelConfig,
                   lo: int, hi: int, dtype) -> np.ndarray:
    """Rows [lo, hi) of the unified take buffer under the pm1 scheme.

    Inverts the packing map: buffer row P = (pr % S) * H + base + pr // S
    for logical physical-row pr of the table at intra-stripe offset base
    (embedding.py::pack_tables striped write), so stripe k = P // H,
    intra-stripe o = P % H, pr = (o - base) * S + k.  Rows past a table's
    last physical row, sub-rows past its last logical row, and shard-pad
    rows past take_phys_total are zero — exactly what pack_tables writes.
    """
    dtype = np.dtype(dtype)
    qval = _PM1_INT8_Q if dtype == np.int8 else 1.0
    out = np.zeros((hi - lo, layout.take_lanes), dtype)
    S = layout.take_stripes
    H = layout.stripe_height if S > 1 else layout.take_phys_total
    Prow = np.arange(lo, hi)
    in_buf = Prow < layout.take_phys_total
    if S > 1:
        k = Prow // H
        o = Prow % H
    else:
        k = np.zeros_like(Prow)
        o = Prow
    rows_of: Dict[int, int] = {t.table_id: t.rows for t in cfg.tables}
    for g in layout.take_groups:
        s, d = g.rows_per_phys, g.dim
        for tid, base in zip(g.table_ids, g.base_phys):
            rows_t = rows_of[tid]
            pr_t = -(-rows_t // s)
            span = -(-pr_t // S) if S > 1 else pr_t
            m = in_buf & (o >= base) & (o < base + span)
            if not m.any():
                continue
            sel = np.nonzero(m)[0]
            pr = (o[sel] - base) * S + k[sel] if S > 1 else (o[sel] - base)
            r = pr[:, None] * s + np.arange(s)[None, :]  # logical rows [m, s]
            sign = np.where(r % 2 == 0, qval, -qval)
            sign = np.where((r < rows_t) & (pr[:, None] < pr_t), sign, 0)
            out[sel] = np.repeat(sign, d, axis=1).astype(dtype)
    return out


def pack_pm1_sharded(
    cfg: ModelConfig,
    layout: PackedLayout,
    mesh: Optional[Mesh] = None,
    chunk_rows: int = 1 << 22,
) -> PackedTables:
    """PackedTables under the pm1 scheme with the take buffer generated
    shard-by-shard (never materializing per-table arrays).  With a mesh the
    buffer is born row-sharded over the "model" axis (pre-padded to the
    axis size, matching ShardedFleetRec.shard_params); without one it is a
    single host-device array built in chunks."""
    table_dtype = jnp.dtype(cfg.table_dtype)
    np_dtype = np.int8 if table_dtype == jnp.int8 else (
        np.float32 if table_dtype == jnp.float32 else np.float32)
    quant = table_dtype == jnp.int8

    # one-hot (small-table) classes are tiny: normal init path, restricted
    # to the small tables
    by_id = {t.table_id: t for t in cfg.tables}
    onehot_buffers = []
    onehot_scales = [] if quant else None
    for c in layout.onehot_classes:
        buf = np.zeros((c.num_tables, c.rows_pad, c.dim), np.float32)
        for j, tid in enumerate(c.table_ids):
            sp = by_id[tid]
            r = np.arange(sp.rows)
            v = np.where(r % 2 == 0, 1.0, -1.0).astype(np.float32)
            buf[j, : sp.rows] = np.repeat(v[:, None], sp.dim, axis=1)
            if quant:
                buf[j, : sp.rows] *= _PM1_INT8_Q
        if c.r2:
            buf = buf.reshape(c.num_tables, c.r1, c.r2 * c.dim)
        onehot_buffers.append(jnp.asarray(buf, dtype=table_dtype))
        if quant:
            sc = np.full((c.num_tables, 1, 1), _PM1_INT8_SCALE, np.float32)
            onehot_scales.append(jnp.asarray(sc))

    take = None
    take_scales = None
    if layout.take_phys_total:
        n_model = mesh.shape["model"] if mesh is not None else 1
        phys_pad = -(-layout.take_phys_total // n_model) * n_model
        if mesh is not None:
            sharding = NamedSharding(mesh, P("model", None))

            def cb(index):
                lo = index[0].start or 0
                stop = index[0].stop
                hi = phys_pad if stop is None else stop
                # build the shard in bounded sub-chunks (callback result is
                # one shard; sub-chunking only bounds numpy temporaries)
                parts = [
                    pm1_take_chunk(layout, cfg, a, min(a + chunk_rows, hi), np_dtype)
                    for a in range(lo, hi, chunk_rows)
                ]
                return parts[0] if len(parts) == 1 else np.concatenate(parts)

            take = jax.make_array_from_callback(
                (phys_pad, layout.take_lanes), sharding, cb)
        else:
            take = jnp.concatenate([
                jnp.asarray(pm1_take_chunk(
                    layout, cfg, a, min(a + chunk_rows, phys_pad), np_dtype))
                for a in range(0, phys_pad, chunk_rows)
            ])
        if quant:
            n_take = layout.n_take
            take_scales = jnp.asarray(
                np.full((n_take,), _PM1_INT8_SCALE, np.float32))
    if table_dtype == jnp.bfloat16 and take is not None:
        take = take.astype(jnp.bfloat16)  # ±1 exact in bf16

    return PackedTables(
        layout=layout, onehot_buffers=onehot_buffers, take_buffer=take,
        onehot_scales=onehot_scales if quant else None, take_scales=take_scales,
    )
