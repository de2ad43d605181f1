"""Multi-hot pooled embedding bags (beyond-reference capability).

The reference pipeline looks up exactly ONE row per table per query
(embedding_krnl.cpp's fixed per-channel fetch).  Production recommenders
also need BAG features — a variable-length list of ids per (query,
table) whose embeddings are sum- or mean-pooled (DLRM's sparse multi-hot
inputs).  TPU-first realization on the SAME packed storage:

  * plain one-hot classes: the selection mask generalizes from one-hot
    to MULTI-hot — sum_l (id_l == iota) — so sum-pooling costs the SAME
    single MXU matmul as a single-id lookup (the mask simply has up to L
    nonzeros per row).  Exact: each id contributes exactly one row.
  * factored hi/lo classes: the hi/lo split ties each id's two halves
    together, so bags loop over the L slots (a compile-time-unrolled sum
    of L cheap factored lookups).
  * take tier: gather B*n*L rows (L x the single-id gather — distinct
    rows genuinely must be fetched) and mask-sum the extracted sub-rows
    over the bag axis.

Padding: slot id < 0 marks an empty slot (standard ragged-to-dense
padding).  Empty slots contribute zero; mean pooling divides by the
VALID count (empty bag -> zero vector).  Ids >= the table's row count
poison the row's score with NaN, matching the single-id fail-loud
contract (embedding.take_bad_rows) — note the contract difference: in
pooled mode NEGATIVE ids are padding, not errors.

Bags are [B, T, L] int32 with a static max bag length L (XLA needs
static shapes; hosts pad ragged bags to L, exactly like the wire padding
the reference's fixed-offset slots impose).  Single-id behavior is
recovered at L=1 with no padding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .embedding import (
    PackedTables,
    _onehot_lookup,
    apply_qr_sums,
    take_phys_sub,
)


def pooled_class_lookup(buf, c, gi, gv, scale=None, mean: bool = False):
    """Pooled lookup for ONE one-hot/factored class: ids [B, n, L] +
    validity [B, n, L] -> [B, n*d].  ``n`` may be the class's LOCAL table
    shard (the sharded path slices the index columns before calling).
    Plain classes pool via a multi-hot mask (same one MXU matmul as a
    single-id lookup); factored classes unroll the L slots."""
    B, n, L = gi.shape
    quant = buf.dtype == jnp.int8
    if c.r2 == 0:
        # multi-hot mask: one matmul pools the whole bag (padding ids are
        # negative and match no iota position)
        iota = jax.lax.broadcasted_iota(jnp.int32, (c.rows_pad,), 0)
        mh = (gi[..., None] == iota).astype(buf.dtype)  # [B, n, L, R]
        mh = mh.sum(axis=2)  # [B, n, R] multi-hot
        out = jax.lax.dot_general(
            mh, buf,
            dimension_numbers=(((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )  # [n, B, d]
        if quant:
            out = out.astype(jnp.float32) * scale
        out = out.transpose(1, 0, 2).reshape(B, n * c.dim)
        pooled = out if quant else out.astype(buf.dtype)
    else:
        # factored classes: unrolled sum of L single-id lookups with
        # invalid slots zeroed (id 0 stands in; its row is masked off)
        acc = None
        for l in range(L):
            idl = jnp.where(gv[:, :, l], gi[:, :, l], 0)
            e = _onehot_lookup(buf, c, idl, scale)  # [B, n*d]
            m = jnp.repeat(gv[:, :, l], c.dim, axis=1).astype(e.dtype)
            e = e * m
            acc = e if acc is None else acc + e
        pooled = acc
    if mean:
        cnt = gv.sum(axis=2).astype(jnp.float32)  # [B, n]
        inv = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
        pooled = (pooled.reshape(B, n, c.dim)
                  * inv[:, :, None].astype(pooled.dtype)
                  ).reshape(B, n * c.dim)
    return pooled


def pooled_take_extract(packed: PackedTables, tidx, tval, local_start=0,
                        local_rows=None, mean: bool = False):
    """Pooled take-tier gather+extract: plan-order bag ids [B, n_take, L]
    + validity -> [B, sum(n_g * d_g)].  With local_start/local_rows the
    gather runs against a LOCAL row-range shard of the take buffer
    (clip+mask, the sharded path); padding and out-of-range rows
    contribute zero (range errors are surfaced by the CALLER's NaN
    poison, pooled_bad_rows)."""
    layout = packed.layout
    B, n_take, L = tidx.shape
    safe_ids = jnp.where(tval, tidx, 0)
    ids2 = safe_ids.transpose(0, 2, 1).reshape(B * L, n_take)
    phys, sub = take_phys_sub(layout, ids2)
    phys = phys.reshape(B, L, n_take).transpose(0, 2, 1)
    sub = sub.reshape(B, L, n_take).transpose(0, 2, 1)
    buf = packed.take_buffer
    bag_val = tval  # GLOBAL bag validity — the mean denominator
    if local_rows is not None:
        ploc = phys - local_start
        lval = (ploc >= 0) & (ploc < local_rows)
        rows = jnp.take(buf, jnp.clip(ploc, 0, local_rows - 1).reshape(-1),
                        axis=0, mode="clip")
        tval = tval & lval  # einsum mask only; counts stay global
    else:
        rows = jnp.take(buf, phys.reshape(-1), axis=0)
    rows = rows.reshape(B, n_take, L, layout.take_lanes)
    tq = buf.dtype == jnp.int8
    outs = []
    kk = 0
    for g in layout.take_groups:
        ng, s, d = g.num_tables, g.rows_per_phys, g.dim
        r = jax.lax.slice_in_dim(rows, kk, kk + ng, axis=1)
        r = r.reshape(B, ng, L, s, d)
        sb = jax.lax.slice_in_dim(sub, kk, kk + ng, axis=1)  # [B,ng,L]
        gv = jax.lax.slice_in_dim(tval, kk, kk + ng, axis=1)
        gvb = jax.lax.slice_in_dim(bag_val, kk, kk + ng, axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
        # select the sub-row AND zero padding/non-local slots in one mask,
        # then sum over both the sub-row and bag axes
        if tq:
            m = ((sb[..., None] == iota) & gv[..., None]).astype(jnp.int32)
            e = jnp.einsum("bnlsd,bnls->bnd", r.astype(jnp.int32), m)
            sc = jax.lax.slice_in_dim(packed.take_scales, kk, kk + ng)
            e = e.astype(jnp.float32) * sc[None, :, None]
        else:
            m = ((sb[..., None] == iota) & gv[..., None]).astype(r.dtype)
            e = jnp.einsum("bnlsd,bnls->bnd", r, m)
        outs.append((e, gvb))
        kk += ng
    if mean:
        # NOTE: under the sharded path ``mean`` must divide by the GLOBAL
        # valid count — callers pass the global validity for that
        res = []
        for e, gv in outs:
            cnt = gv.sum(axis=2).astype(jnp.float32)
            inv = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
            res.append((e * inv[:, :, None].astype(e.dtype)).reshape(
                e.shape[0], -1))
        return res
    return [e.reshape(e.shape[0], -1) for e, _gv in outs]


def pooled_lookup_concat(
    packed: PackedTables,
    indices: jax.Array,
    dense: Optional[jax.Array] = None,
    mean: bool = False,
) -> jax.Array:
    """Bag lookup + fixed-offset concat: [B, num_tables, L] plan-order ids
    -> [B, feature_dim] pooled features in the reference layout.

    Mirrors lookup_concat (embedding.py) with per-table bags; see module
    docstring for the per-tier mechanism and the padding contract."""
    layout = packed.layout
    B, _T, L = indices.shape
    quant = packed.onehot_scales is not None
    valid = indices >= 0  # [B, T, L]; padding slots contribute nothing
    parts = []
    k = 0
    for i, (c, buf) in enumerate(zip(layout.onehot_classes, packed.onehot_buffers)):
        gi = jax.lax.slice_in_dim(indices, k, k + c.num_tables, axis=1)
        gv = jax.lax.slice_in_dim(valid, k, k + c.num_tables, axis=1)
        sc = packed.onehot_scales[i] if quant else None
        k += c.num_tables
        parts.append(pooled_class_lookup(buf, c, gi, gv, sc, mean))

    if layout.take_groups:
        n_take = layout.n_take
        tidx = jax.lax.slice_in_dim(indices, k, k + n_take, axis=1)  # [B,n,L]
        tval = jax.lax.slice_in_dim(valid, k, k + n_take, axis=1)
        parts.extend(pooled_take_extract(packed, tidx, tval, mean=mean))

    emb = jnp.concatenate(parts, axis=1) if parts else jnp.zeros((B, 0))
    emb = apply_qr_sums(emb, layout)
    srcs = [emb]
    if layout.dense_dim:
        assert dense is not None
        srcs.append(dense.astype(emb.dtype))
    srcs.append(jnp.zeros((B, 1), dtype=emb.dtype))
    src = jnp.concatenate(srcs, axis=1)
    perm = jnp.asarray(layout.feature_perm, dtype=jnp.int32)
    return jnp.take(src, perm, axis=1)


def pooled_bad_rows(model, plan_indices: jax.Array):
    """[B] bool: rows with any VALID (non-padding) take-tier id outside
    its table's [0, rows) — the pooled-mode fail-loud contract (negative
    ids are padding here, unlike the single-id contract)."""
    lay = model.layout
    if not lay.take_groups:
        return None
    n_oh = lay.n_onehot
    tidx = jax.lax.slice_in_dim(plan_indices, n_oh, n_oh + lay.n_take,
                                axis=1)  # [B, n, L]
    lim = jnp.asarray(
        np.minimum(np.asarray(lay.take_rows, np.int64),
                   np.iinfo(np.int32).max).astype(np.int32))
    return jnp.any(tidx >= lim[None, :, None], axis=(1, 2))


def plan_bags(model, indices: jax.Array) -> jax.Array:
    """[B, num_tables, L] config-order bag ids (-1 padding) -> plan-order
    [B, T', L]: QR column derivation + spec->plan permutation applied per
    bag slot, with the padding marker preserved (QR columns derived from
    a padding slot stay padding)."""
    B, _T, L = indices.shape
    neg = indices < 0
    flat = jnp.where(neg, 0, indices).transpose(0, 2, 1).reshape(B * L, -1)
    planned = model.plan_indices(flat)
    negf = jnp.concatenate(
        [neg.transpose(0, 2, 1).reshape(B * L, -1)]
        + [neg.transpose(0, 2, 1).reshape(B * L, -1)[:, [pos]]
           for pos, _rem in model.qr_positions], axis=1)
    if model.index_perm:
        negf = negf[:, jnp.asarray(model.index_perm, dtype=jnp.int32)]
    planned = jnp.where(negf, -1, planned)
    return planned.reshape(B, L, -1).transpose(0, 2, 1)  # [B, T', L]


def forward_pooled(model, params, indices, dense=None, mean: bool = False):
    """Bag-pooled forward on a FleetRecModel: [B, num_tables, L]
    config-order ids (-1 padding) -> scores [B].  QR configs derive the
    Q/R columns per bag slot (linear pooling commutes with the QR sum).
    The multi-chip variant is ShardedFleetRec.forward_pooled (same
    partitioned-class + local-row-range + one-psum structure as the
    single-id sharded forward)."""
    from .mlp import mlp_apply

    cfg = model.cfg
    if indices.ndim != 3 or indices.shape[1] != cfg.num_tables:
        raise ValueError(
            f"indices must be [B, {cfg.num_tables}, L], got {indices.shape}")
    planned = plan_bags(model, indices)
    bad = pooled_bad_rows(model, planned)
    feats = pooled_lookup_concat(params["tables"], planned, dense, mean=mean)
    x = feats.astype(jnp.dtype(cfg.dtype))
    scores = mlp_apply(params["mlp"], x, activation=cfg.mlp.activation,
                       precision=cfg.matmul_precision)[:, 0]
    return model.poison_scores(scores, bad)
