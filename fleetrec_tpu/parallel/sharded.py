"""Multi-chip sharded FleetRec: explicit SPMD partitioning of the fused
lookup->concat->MLP program.

Replaces the reference's cross-device tiers — FPGA-channel table placement,
the 100 Gbps hardware TCP link (FPGA/kernel/network_krnl), the scatter
fan-out kernel (scatter_krnl/src/hls/scatter.cpp) and the GPU server's
fixed-offset receive concatenation (cuda_server.c:514-587) — with a 2-axis
Mesh and ICI collectives:

  "data"  — batch replicas (the reference's 16 server threads);
  "model" — table shards (the reference's channels/FPGAs).

The serving forward is written with shard_map for explicit collective
placement: each model-shard owns a row-range of the unified take buffer,
gathers ONLY rows it owns (clip+mask), extracts sub-rows locally, and the
exchange is ONE psum — of the [B, H1] W1-partial product when H1 <
feature_dim (the feature-layout permutation is folded into W1, so each
shard multiplies its zero-masked local features through W1 and only the
partial activations cross the wire — model3 ships 2048 floats/query
instead of 3968), else of the extracted [B, feature] vector (interaction
heads always use this form: they consume the feature vector itself).
Letting GSPMD partition the same program placed the all-reduce on the
un-extracted gathered rows ([B*n_take, 128] — 11-16x more ICI bytes;
measured via HLO inspection, see docs/DESIGN.md), which is why the
collective is placed by hand; tests/test_hlo.py pins the placement.

The one-hot/factored (small- and mid-table) classes are PARTITIONED over
the model axis too (n_model > 1): each class's table axis is padded to a
multiple of M and sharded P("model", ...), so shard m computes the
selection matmuls only for its n/M tables and contributes them to the
same psum — the r3 design computed every class on every shard and
multiplied M-1 copies by zero (replicated wasted MXU/VPU work, material
for criteo's forced n_model>=4 where the factored tier is the heavy
stage; VERDICT r3 #7).  The dense tail stays shard-0-contributed.

Training keeps the GSPMD path (autodiff-friendly; throughput of the
backward is not the serving-critical path).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.embedding import LANES, lookup_concat
from ..models.fleetrec import FleetRecModel
from ..models.mlp import mlp_apply


def src_cols(layout) -> int:
    """Width of the pre-extraction local src vector in _local_forward:
    all embedding output columns in storage order + dense + 1 zero pad
    column (padding slots of feature_perm point at the zero column)."""
    n_emb = sum(c.num_tables * c.dim for c in layout.onehot_classes)
    n_emb += sum(g.num_tables * g.dim for g in layout.take_groups)
    return n_emb + layout.dense_dim + 1


def fold_w1(layout, W1):
    """Precompute the permutation-folded first layer A (src @ A ==
    feats @ W1): A[c] = sum of W1 rows j with feature_perm[j] == c.

    Computed ONCE per params at shard/restore time (the analog of the
    reference's one-time weight staging, cuda_server.c:349-357) — NOT
    inside the jitted forward, where the [src_cols, H1] scatter-add
    (model3: ~32 MB fp32) would otherwise be rebuilt every call;
    tests/test_hlo.py::test_fold_is_staged_not_per_call pins this."""
    perm = jnp.asarray(layout.feature_perm, dtype=jnp.int32)
    return jnp.zeros((src_cols(layout), W1.shape[1]), W1.dtype).at[perm].add(W1)


class ShardedFleetRec:
    """Wrap a FleetRecModel with mesh shardings and compiled SPMD steps."""

    def __init__(self, model: FleetRecModel, mesh: Mesh):
        self.model = model
        self.mesh = mesh
        self._pooled_jits: Dict = {}  # (mean, has_dense) -> jitted fwd

    # ---- sharding specs -------------------------------------------------
    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]

    @property
    def _use_w1_fold(self) -> bool:
        """Ship the [B, H1] W1-partial product instead of the [B, F] feature
        vector whenever that is fewer ICI bytes.  Interaction heads (dot /
        cross) consume the feature vector itself, so they keep the feature
        psum."""
        cfg = self.model.cfg
        return (
            cfg.interaction == "none"
            and len(cfg.mlp.widths) >= 2
            and cfg.mlp.widths[1] < self.model.layout.feature_dim
        )

    def param_shardings(self, params) -> Dict:
        mesh = self.mesh
        repl = NamedSharding(mesh, P())
        rowshard = NamedSharding(mesh, P("model", None))
        tabshard = NamedSharding(mesh, P("model", None, None))
        pt = params["tables"]
        # one-hot/factored class buffers: table axis sharded over "model"
        # (padded to a multiple of M by shard_params) so each shard computes
        # the selection matmuls only for its tables (VERDICT r3 #7).
        oh = [tabshard for _ in pt.onehot_buffers]
        leaves = oh + ([rowshard] if pt.take_buffer is not None else [])
        if pt.onehot_scales is not None:  # int8 dequant scales follow tables
            leaves += [tabshard for _ in pt.onehot_scales]
            if pt.take_scales is not None:
                leaves.append(repl)
        tables = jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(pt), leaves)
        mlp = [repl for _ in params["mlp"]]
        out = {"tables": tables, "mlp": mlp}
        if "bottom" in params:
            out["bottom"] = [repl for _ in params["bottom"]]
        if "cross" in params:
            out["cross"] = jax.tree_util.tree_map(lambda _: repl, params["cross"])
        if "w1_fold" in params:
            out["w1_fold"] = repl
        return out

    def fold_w1(self, W1):
        return fold_w1(self.model.layout, W1)

    def data_shardings(self):
        return NamedSharding(self.mesh, P("data", None))

    def shard_params(self, params):
        """Pad the take buffer to a row-count divisible by the model axis
        (pad rows are never indexed) and every one-hot class's table axis
        likewise (pad tables are all-zero and never selected), then place
        params."""
        m = self.n_model
        tables = params["tables"]
        take = tables.take_buffer
        if take is not None:
            pad = (-take.shape[0]) % m
            if pad:
                take = jnp.pad(take, ((0, pad), (0, 0)))
        oh_bufs = []
        for buf in tables.onehot_buffers:
            pad = (-buf.shape[0]) % m
            oh_bufs.append(jnp.pad(buf, ((0, pad),) + ((0, 0),) * (buf.ndim - 1))
                           if pad else buf)
        oh_scales = tables.onehot_scales
        if oh_scales is not None:
            padded = []
            for sc in oh_scales:
                pad = (-sc.shape[0]) % m
                # pad scale = 1.0: multiplies all-zero pad-table outputs
                padded.append(jnp.pad(sc, ((0, pad), (0, 0), (0, 0)),
                                      constant_values=1.0) if pad else sc)
            oh_scales = padded
        tables = dataclasses.replace(
            tables, take_buffer=take, onehot_buffers=oh_bufs,
            onehot_scales=oh_scales)
        params = {**params, "tables": tables}
        if self._use_w1_fold:
            params["w1_fold"] = self.fold_w1(params["mlp"][0])
        return jax.device_put(params, self.param_shardings(params))

    def shard_batch(self, indices, dense=None):
        s = self.data_shardings()
        indices = jax.device_put(indices, s)
        if dense is not None:
            dense = jax.device_put(dense, s)
        return indices, dense

    # ---- the SPMD forward ----------------------------------------------
    def _local_pre(self, params, indices, dense):
        """Everything BEFORE the exchange, per device under shard_map:
        local gather + sub-row extraction and (fold path) the local
        W1-partial product.  Returns the per-shard psum operand — [B, H1]
        (fold) or the extracted [B, F] feature vector (fallback).

        indices: local batch rows [B_loc, T] in config order; take buffer
        local row-range; onehot buffers + mlp replicated."""
        model = self.model
        layout = model.layout
        midx = jax.lax.axis_index("model")
        B = indices.shape[0]

        indices = model.plan_indices(indices)  # QR expansion + plan perm

        parts = []
        k = 0
        from ..models.embedding import _onehot_lookup

        pt = params["tables"]
        quant = pt.onehot_scales is not None
        M = self.n_model
        for i, (c, buf) in enumerate(zip(layout.onehot_classes, pt.onehot_buffers)):
            gi = jax.lax.slice_in_dim(indices, k, k + c.num_tables, axis=1)
            k += c.num_tables
            sc = pt.onehot_scales[i] if quant else None
            if M == 1:
                parts.append(_onehot_lookup(buf, c, gi, sc))
                continue
            # Partitioned class: buf/sc arrive as the LOCAL table-axis shard
            # [n_loc, ...] (n_loc = n_pad/M, shard_params pads with zero
            # tables).  Shard m selects only its own tables' columns of the
            # index matrix, computes its n_loc lookups, and places the
            # result at its column offset of the class output — the psum
            # reassembles the full [B, n*d] (pad-table columns are sliced
            # off).  This is what removes the r3 compute-then-zero waste.
            n, d = c.num_tables, c.dim
            n_loc = buf.shape[0]
            n_pad = n_loc * M
            gi_pad = (jnp.pad(gi, ((0, 0), (0, n_pad - n)))
                      if n_pad > n else gi)
            gi_loc = jax.lax.dynamic_slice(
                gi_pad, (0, midx * n_loc), (B, n_loc))
            out_loc = _onehot_lookup(buf, c, gi_loc, sc)  # [B, n_loc*d]
            full = jnp.zeros((B, n_pad * d), out_loc.dtype)
            full = jax.lax.dynamic_update_slice(
                full, out_loc, (0, midx * n_loc * d))
            parts.append(jax.lax.slice_in_dim(full, 0, n * d, axis=1))

        if layout.take_groups:
            from ..models.embedding import take_phys_sub

            n_take = layout.n_take
            tidx = jax.lax.slice_in_dim(indices, k, k + n_take, axis=1)
            phys, sub = take_phys_sub(layout, tidx)

            take_local = params["tables"].take_buffer  # [rows_local, lanes]
            rows_local = take_local.shape[0]
            start = midx * rows_local
            phys_local = phys - start
            valid = (phys_local >= 0) & (phys_local < rows_local)
            safe = jnp.clip(phys_local, 0, rows_local - 1)
            rows = jnp.take(take_local, safe.reshape(-1), axis=0, mode="clip")
            rows = rows.reshape(B, n_take, layout.take_lanes)
            tq = take_local.dtype == jnp.int8
            rows = jnp.where(valid[:, :, None], rows, jnp.zeros((), rows.dtype))
            kk = 0
            for g in layout.take_groups:
                ng, s, d = g.num_tables, g.rows_per_phys, g.dim
                r = jax.lax.slice_in_dim(rows, kk, kk + ng, axis=1).reshape(B, ng, s, d)
                sb = jax.lax.slice_in_dim(sub, kk, kk + ng, axis=1)
                iota = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
                if tq:
                    mask = (sb[..., None] == iota).astype(jnp.int32)
                    e = jnp.einsum("bnsd,bns->bnd", r.astype(jnp.int32), mask)
                    sc = jax.lax.slice_in_dim(pt.take_scales, kk, kk + ng)
                    e = e.astype(jnp.float32) * sc[None, :, None]
                else:
                    mask = (sb[..., None] == iota).astype(r.dtype)
                    e = jnp.einsum("bnsd,bns->bnd", r, mask)
                parts.append(e.reshape(B, ng * d))
                kk += ng

        emb = jnp.concatenate(parts, axis=1) if parts else jnp.zeros((B, 0))
        return self._pre_tail(params, emb, dense, midx)

    def _pre_tail(self, params, emb, dense, midx):
        """Shared tail of the per-shard pre-psum computation (single-id
        and pooled): QR sums, dense tail (shard-0-contributed), zero pad
        column, then the W1-fold partial product or the feature-perm
        gather — the value the psum reduces."""
        model = self.model
        layout = model.layout
        B = emb.shape[0]
        # QR sums are linear: applying them to this shard's partial emb
        # before the psum equals applying them after (embedding.py).
        from ..models.embedding import apply_qr_sums

        emb = apply_qr_sums(emb, layout)
        # one-hot columns are already per-shard partials (each shard filled
        # only its own tables' columns above); only the replicated dense
        # tail needs the shard-0 mask so the psum stays exact.
        srcs = [emb]
        if layout.dense_dim:
            d = dense.astype(emb.dtype)
            d = d * jnp.where(midx == 0, 1.0, 0.0).astype(emb.dtype)
            srcs.append(d)
        srcs.append(jnp.zeros((B, 1), dtype=emb.dtype))
        src = jnp.concatenate(srcs, axis=1)
        perm = jnp.asarray(layout.feature_perm, dtype=jnp.int32)

        if self._use_w1_fold:
            # THE exchange, minimal-wire-bytes form (the analog of the
            # reference's hand-off of only what the next stage needs,
            # embedding_krnl.cpp:45-143 + constant.h:30-33): fold the
            # feature-layout permutation into W1 — A[j] = sum of W1 rows i
            # with feature_perm[i] == j, so src @ A == feats @ W1 — compute
            # the [B, H1] partial product on the LOCAL (zero-masked) src,
            # and psum that.  Strictly fewer ICI bytes than the [B, F]
            # feature psum whenever H1 < F (model3: 2048 < 3968), at zero
            # extra FLOPs: the first matmul already runs on every shard
            # (post-psum, replicated); this moves it before the psum.
            # A is staged once per params by shard_params -> fold_w1 (the
            # scatter-add must NOT run per call; see fold_w1 docstring).
            dtype = jnp.dtype(model.cfg.dtype)
            A = params["w1_fold"]
            x = src.astype(dtype)
            return jnp.dot(x, A.astype(x.dtype),
                           preferred_element_type=jnp.float32,
                           precision=model.cfg.matmul_precision)

        # fallback pre-psum value: interaction heads need the actual
        # feature vector, and F < H1 configs move fewer bytes this way
        return jnp.take(src, perm, axis=1)

    def _local_pooled(self, params, indices, dense, mean):
        """Bag-pooled per-shard forward (models/pooled.py's multi-chip
        variant): partitioned one-hot/factored classes pool their local
        tables' bags, the take tier gathers its local row-range with the
        bag axis folded in, ONE psum reduces the partials, and the same
        fail-loud NaN contract applies (pooled_bad_rows: negative ids are
        padding, valid-but-out-of-range ids poison).  Supported for
        interaction='none' configs (the pooled head is the plain MLP)."""
        from ..models.pooled import (
            plan_bags,
            pooled_bad_rows,
            pooled_class_lookup,
            pooled_take_extract,
        )

        model = self.model
        if model.cfg.interaction != "none":
            raise NotImplementedError(
                "pooled sharded forward supports interaction='none'")
        layout = model.layout
        midx = jax.lax.axis_index("model")
        B, _T, L = indices.shape
        planned = plan_bags(model, indices)  # [B, T', L]
        valid = planned >= 0
        pt = params["tables"]
        quant = pt.onehot_scales is not None
        M = self.n_model
        parts = []
        k = 0
        for i, (c, buf) in enumerate(zip(layout.onehot_classes, pt.onehot_buffers)):
            gi = jax.lax.slice_in_dim(planned, k, k + c.num_tables, axis=1)
            gv = jax.lax.slice_in_dim(valid, k, k + c.num_tables, axis=1)
            k += c.num_tables
            sc = pt.onehot_scales[i] if quant else None
            if M == 1:
                parts.append(pooled_class_lookup(buf, c, gi, gv, sc, mean))
                continue
            # partitioned class (see _local_pre): this shard pools only
            # its own tables' bags; pad columns are marked PADDING (-1 /
            # False) so pad tables contribute nothing
            n, d = c.num_tables, c.dim
            n_loc = buf.shape[0]
            n_pad = n_loc * M
            if n_pad > n:
                gi = jnp.pad(gi, ((0, 0), (0, n_pad - n), (0, 0)),
                             constant_values=-1)
                gv = jnp.pad(gv, ((0, 0), (0, n_pad - n), (0, 0)))
            gi_loc = jax.lax.dynamic_slice(gi, (0, midx * n_loc, 0),
                                           (B, n_loc, L))
            gv_loc = jax.lax.dynamic_slice(gv, (0, midx * n_loc, 0),
                                           (B, n_loc, L))
            out_loc = pooled_class_lookup(buf, c, gi_loc, gv_loc, sc, mean)
            full = jnp.zeros((B, n_pad * d), out_loc.dtype)
            full = jax.lax.dynamic_update_slice(
                full, out_loc, (0, midx * n_loc * d))
            parts.append(jax.lax.slice_in_dim(full, 0, n * d, axis=1))

        if layout.take_groups:
            n_take = layout.n_take
            tidx = jax.lax.slice_in_dim(planned, k, k + n_take, axis=1)
            tval = jax.lax.slice_in_dim(valid, k, k + n_take, axis=1)
            rows_local = pt.take_buffer.shape[0]
            parts.extend(pooled_take_extract(
                pt, tidx, tval, local_start=midx * rows_local,
                local_rows=rows_local, mean=mean))

        emb = jnp.concatenate(parts, axis=1) if parts else jnp.zeros((B, 0))
        part = self._pre_tail(params, emb, dense, midx)
        h = jax.lax.psum(part, "model")
        scores = self._local_post(params, h, dense)
        return model.poison_scores(scores, pooled_bad_rows(model, planned))

    def forward_pooled(self, params, indices, dense=None, mean: bool = False):
        """Multi-chip bag-pooled forward: [B, num_tables, L] config-order
        ids (-1 padding) -> scores [B], same mesh/psum structure as
        `forward` (models/pooled.py documents the per-tier mechanism).
        The jitted program is cached per (mean, has_dense)."""
        key = (bool(mean), dense is not None)
        fwd = self._pooled_jits.get(key)
        if fwd is None:
            mesh = self.mesh
            make_specs = self._make_specs
            local = self._local_pooled
            bspec = P("data", None, None)

            def fn(params, indices, dense):
                specs = make_specs(params)
                if dense is None:
                    f = jax.shard_map(
                        lambda p, i: local(p, i, None, mean),
                        mesh=mesh, in_specs=(specs, bspec),
                        out_specs=P("data"), check_vma=False,
                    )
                    return f(params, indices)
                f = jax.shard_map(
                    lambda p, i, d: local(p, i, d, mean),
                    mesh=mesh, in_specs=(specs, bspec, P("data", None)),
                    out_specs=P("data"), check_vma=False,
                )
                return f(params, indices, dense)

            fwd = self._pooled_jits[key] = jax.jit(fn)
        return fwd(params, indices, dense)

    def _local_post(self, params, h, dense):
        """Everything AFTER the exchange: consumes the psum'd [B, H1]
        partial activations (fold) or [B, F] feature vector (fallback),
        replicated per model-shard."""
        model = self.model
        if self._use_w1_fold:
            dtype = jnp.dtype(model.cfg.dtype)
            rest = params["mlp"][1:]
            if model.cfg.mlp.activation == "relu" and rest:
                h = jnp.maximum(h, 0.0)
            h = h.astype(dtype)
            if not rest:
                return h[:, 0]
            scores = mlp_apply(rest, h, activation=model.cfg.mlp.activation,
                               precision=model.cfg.matmul_precision)
            return scores[:, 0]

        feats = h
        if model.cfg.interaction == "dot":
            # DLRM head (bottom MLP + pairwise dots + top MLP) runs on the
            # psum'd [B, T*D] embeddings, replicated per data-shard.
            from ..models.fleetrec import interaction_head

            return interaction_head(model.cfg, params, feats, dense)

        dtype = jnp.dtype(model.cfg.dtype)
        x = feats.astype(dtype)
        if model.cfg.interaction == "cross":
            # DCNv2 cross stack on the psum'd feature vector, replicated
            # per data-shard (cross weights are small: L x [F, F]).
            from ..models.interaction import cross_network

            x = cross_network(x, params["cross"],
                              precision=model.cfg.matmul_precision)
        scores = mlp_apply(params["mlp"], x,
                           activation=model.cfg.mlp.activation,
                           precision=model.cfg.matmul_precision)
        return scores[:, 0]

    def _local_forward(self, params, indices, dense):
        """pre -> THE exchange (ONE psum) -> post, per device.

        Scores of rows with out-of-range take ids are poisoned with NaN —
        the single-device forward's fail-loud contract (VERDICT r4 #6;
        the local clip+mask alone would contribute silent zeros).  Every
        shard sees the same indices, so the [B]-level poison needs no
        collective; plan_indices here CSEs with _local_pre's call."""
        part = self._local_pre(params, indices, dense)
        h = jax.lax.psum(part, "model")
        scores = self._local_post(params, h, dense)
        model = self.model
        return model.poison_scores(
            scores, model.bad_take_rows(model.plan_indices(indices)))

    def _local_pipelined(self, params, indices, dense):
        """Software-double-buffered K-batch serving step, per device:
        iteration k psums batch k-1's partial while computing batch k's
        local gather+partial — the two are data-independent inside one
        scan step, so the scheduler overlaps the collective with the next
        batch's compute (async all-reduce-start/done; the ICI-overlap
        assumption of docs/DESIGN.md's v5e-16 projection, pinned by
        tests/test_hlo.py).  The reference decouples receive from compute
        the same way with its ring + dedicated receiver threads
        (measure_.../cuda_server.c:119-240).

        indices: [K, B_loc, T] local batch rows; returns [K, B_loc]."""
        has_dense = dense is not None
        d0 = dense[0] if has_dense else None
        part0 = self._local_pre(params, indices[0], d0)

        head = None
        if indices.shape[0] > 1:
            if has_dense:
                def body(carry, x):
                    part_prev, dense_prev = carry
                    h = jax.lax.psum(part_prev, "model")
                    scores_prev = self._local_post(params, h, dense_prev)
                    part_k = self._local_pre(params, x[0], x[1])
                    return (part_k, x[1]), scores_prev

                (part_last, dense_last), head = jax.lax.scan(
                    body, (part0, d0), (indices[1:], dense[1:]))
            else:
                def body_nd(part_prev, idx_k):
                    h = jax.lax.psum(part_prev, "model")
                    scores_prev = self._local_post(params, h, None)
                    part_k = self._local_pre(params, idx_k, None)
                    return part_k, scores_prev

                part_last, head = jax.lax.scan(body_nd, part0, indices[1:])
                dense_last = None
        else:
            part_last, dense_last = part0, d0
        h = jax.lax.psum(part_last, "model")
        s_last = self._local_post(params, h, dense_last)
        out = (s_last[None] if head is None
               else jnp.concatenate([head, s_last[None]], axis=0))
        # same fail-loud NaN contract as _local_forward, vectorized over
        # the K fused batches ([K*B, T] through plan_indices/bad_take_rows)
        model = self.model
        K, B = indices.shape[0], indices.shape[1]
        bad = model.bad_take_rows(
            model.plan_indices(indices.reshape(K * B, -1)))
        if bad is not None:
            out = model.poison_scores(out, bad.reshape(K, B))
        return out

    # Build in_specs as a pytree matching the params dict.
    def _make_specs(self, params_like):
        pt = params_like["tables"]
        oh = [P("model", None, None) for _ in pt.onehot_buffers]
        leaves = oh + ([P("model", None)] if pt.take_buffer is not None else [])
        if pt.onehot_scales is not None:
            leaves += [P("model", None, None) for _ in pt.onehot_scales]
            if pt.take_scales is not None:
                leaves.append(P(None))
        tables = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(pt), leaves
        )
        mlp = [P(None, None) for _ in params_like["mlp"]]
        specs = {"tables": tables, "mlp": mlp}
        if "bottom" in params_like:
            specs["bottom"] = [P(None, None) for _ in params_like["bottom"]]
        if "cross" in params_like:
            specs["cross"] = jax.tree_util.tree_map(
                lambda _: P(), params_like["cross"]
            )
        if "w1_fold" in params_like:
            specs["w1_fold"] = P(None, None)
        return specs

    @cached_property
    def forward(self):
        mesh = self.mesh
        make_specs = self._make_specs
        local = self._local_forward

        def fwd(params, indices, dense):
            specs = make_specs(params)
            in_specs = (specs, P("data", None), P("data", None) if dense is not None else None)
            if dense is None:
                f = jax.shard_map(
                    lambda p, i: local(p, i, None),
                    mesh=mesh, in_specs=in_specs[:2], out_specs=P("data"),
                    check_vma=False,
                )
                return f(params, indices)
            f = jax.shard_map(
                local, mesh=mesh, in_specs=in_specs, out_specs=P("data"),
                check_vma=False,
            )
            return f(params, indices, dense)

        return jax.jit(fwd, static_argnames=())

    @cached_property
    def forward_pipelined(self):
        """K-batch double-buffered serving step: [K, B, T] (+[K, B, D]) ->
        [K, B], batch k's psum overlapped with batch k+1's local gather
        (see _local_pipelined).  The fused sharded dispatch path
        (ServingEngine.from_sharded(fuse=K)) uses this."""
        mesh = self.mesh
        make_specs = self._make_specs
        local = self._local_pipelined

        def fwd(params, indices, dense):
            specs = make_specs(params)
            bspec = P(None, "data", None)
            if dense is None:
                f = jax.shard_map(
                    lambda p, i: local(p, i, None),
                    mesh=mesh, in_specs=(specs, bspec),
                    out_specs=P(None, "data"), check_vma=False,
                )
                return f(params, indices)
            f = jax.shard_map(
                local, mesh=mesh, in_specs=(specs, bspec, bspec),
                out_specs=P(None, "data"), check_vma=False,
            )
            return f(params, indices, dense)

        return jax.jit(fwd, static_argnames=())

    # ---- training (GSPMD path: autodiff-friendly) -----------------------
    @cached_property
    def train_step(self):
        """One SGD step on logistic loss — exercises the full backward
        (gather -> scatter-add grads on sharded tables, psum'd MLP grads).
        Uses GSPMD partitioning of the plain forward (grads inherit param
        shardings); serving throughput is not gated on this path."""
        model = self.model
        mesh = self.mesh
        batch = NamedSharding(mesh, P("data", None))

        def loss_fn(params, indices, dense, labels):
            scores = model.forward(params, indices, dense)
            return jnp.mean(
                jnp.maximum(scores, 0) - scores * labels + jnp.log1p(jnp.exp(-jnp.abs(scores)))
            )

        def step(params, indices, dense, labels, lr):
            from ..models.train import check_trainable

            check_trainable(params)  # int8 tables are not trainable
            # w1_fold is DERIVED from mlp[0]: keep it out of the grad tree
            # and re-fold from the updated W1 so serving after training
            # never sees a stale fold.
            core = {k: v for k, v in params.items() if k != "w1_fold"}
            indices = jax.lax.with_sharding_constraint(indices, batch)
            loss, grads = jax.value_and_grad(loss_fn)(core, indices, dense, labels)
            new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, core, grads)
            if "w1_fold" in params:
                new_params["w1_fold"] = self.fold_w1(new_params["mlp"][0])
            return loss, new_params

        return jax.jit(step, donate_argnums=(0,))
