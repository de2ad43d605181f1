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
        if c.r2 == 0:
            # multi-hot mask: one matmul pools the whole bag (padding ids
            # are negative and match no iota position)
            iota = jax.lax.broadcasted_iota(jnp.int32, (c.rows_pad,), 0)
            mh = (gi[..., None] == iota).astype(buf.dtype)  # [B, n, L, R]
            mh = mh.sum(axis=2)  # [B, n, R] multi-hot
            out = jax.lax.dot_general(
                mh, buf,
                dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )  # [n, B, d]
            if quant:
                out = out.astype(jnp.float32) * sc
            out = out.transpose(1, 0, 2).reshape(B, c.num_tables * c.dim)
            pooled = out if quant else out.astype(buf.dtype)
        else:
            # factored classes: unrolled sum of L single-id lookups with
            # invalid slots zeroed (id 0 stands in; its row is masked off)
            acc = None
            for l in range(L):
                idl = jnp.where(gv[:, :, l], gi[:, :, l], 0)
                e = _onehot_lookup(buf, c, idl, sc)  # [B, n*d]
                m = jnp.repeat(gv[:, :, l], c.dim, axis=1).astype(e.dtype)
                e = e * m
                acc = e if acc is None else acc + e
            pooled = acc
        if mean:
            cnt = gv.sum(axis=2).astype(jnp.float32)  # [B, n]
            inv = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
            pooled = (pooled.reshape(B, c.num_tables, c.dim)
                      * inv[:, :, None].astype(pooled.dtype)
                      ).reshape(B, c.num_tables * c.dim)
        parts.append(pooled)

    if layout.take_groups:
        n_take = layout.n_take
        tidx = jax.lax.slice_in_dim(indices, k, k + n_take, axis=1)  # [B,n,L]
        tval = jax.lax.slice_in_dim(valid, k, k + n_take, axis=1)
        safe_ids = jnp.where(tval, tidx, 0)
        # take_phys_sub maps per-COLUMN (one table per column): fold the
        # bag axis into the batch axis, then restore [B, n, L]
        ids2 = safe_ids.transpose(0, 2, 1).reshape(B * L, n_take)
        phys, sub = take_phys_sub(layout, ids2)
        phys = phys.reshape(B, L, n_take).transpose(0, 2, 1)
        sub = sub.reshape(B, L, n_take).transpose(0, 2, 1)
        rows = jnp.take(packed.take_buffer, phys.reshape(-1), axis=0)
        rows = rows.reshape(B, n_take, L, layout.take_lanes)
        tq = packed.take_buffer.dtype == jnp.int8
        kk = 0
        outs = []
        for g in layout.take_groups:
            ng, s, d = g.num_tables, g.rows_per_phys, g.dim
            r = jax.lax.slice_in_dim(rows, kk, kk + ng, axis=1)
            r = r.reshape(B, ng, L, s, d)
            sb = jax.lax.slice_in_dim(sub, kk, kk + ng, axis=1)  # [B,ng,L]
            gv = jax.lax.slice_in_dim(tval, kk, kk + ng, axis=1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
            # select the sub-row AND zero padding slots in one mask, then
            # sum over both the sub-row and bag axes (exact: one nonzero
            # per valid (slot, sub-row) pair)
            if tq:
                m = ((sb[..., None] == iota) & gv[..., None]).astype(jnp.int32)
                e = jnp.einsum("bnlsd,bnls->bnd", r.astype(jnp.int32), m)
                sc = jax.lax.slice_in_dim(packed.take_scales, kk, kk + ng)
                e = e.astype(jnp.float32) * sc[None, :, None]
            else:
                m = ((sb[..., None] == iota) & gv[..., None]).astype(r.dtype)
                e = jnp.einsum("bnlsd,bnls->bnd", r, m)
            if mean:
                cnt = gv.sum(axis=2).astype(jnp.float32)
                inv = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
                e = e * inv[:, :, None].astype(e.dtype)
            outs.append(e.reshape(B, ng * d))
            kk += ng
        parts.extend(outs)

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


def forward_pooled(model, params, indices, dense=None, mean: bool = False):
    """Bag-pooled forward on a FleetRecModel: [B, num_tables, L]
    config-order ids (-1 padding) -> scores [B].  QR configs derive the
    Q/R columns per bag slot (linear pooling commutes with the QR sum)."""
    from .mlp import mlp_apply

    cfg = model.cfg
    if indices.ndim != 3 or indices.shape[1] != cfg.num_tables:
        raise ValueError(
            f"indices must be [B, {cfg.num_tables}, L], got {indices.shape}")
    B, _T, L = indices.shape
    # plan_indices operates on [B, T]: apply it per bag slot, preserving
    # the padding marker (-1 stays negative through // and % only if
    # handled — derive QR columns from the clamped ids and re-mark)
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
    planned = planned.reshape(B, L, -1).transpose(0, 2, 1)  # [B, T', L]

    bad = pooled_bad_rows(model, planned)
    feats = pooled_lookup_concat(params["tables"], planned, dense, mean=mean)
    x = feats.astype(jnp.dtype(cfg.dtype))
    scores = mlp_apply(params["mlp"], x, activation=cfg.mlp.activation,
                       precision=cfg.matmul_precision)[:, 0]
    return model.poison_scores(scores, bad)
