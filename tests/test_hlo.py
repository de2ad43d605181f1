"""HLO regression tests pinning the hand-placed collective.

The sharded forward's 11x ICI win (parallel/sharded.py module docstring)
rests on the all-reduce sitting AFTER sub-row extraction — on the [B, H1]
W1-partial product (fold path) or the [B, F] feature vector (fallback) —
never on the gathered rows ([B * n_take, take_lanes], 11-16x more bytes).
GSPMD left alone places it at gathered-row size; a refactor or JAX upgrade
could silently reintroduce that.  These tests compile the sharded forward
and assert on the all-reduce ops in the optimized HLO.
"""

import dataclasses
import re

import jax.numpy as jnp
import numpy as np
import pytest

from fleetrec_tpu import config as C
from fleetrec_tpu.models import init_model
from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh

# matches e.g. "%all-reduce.3 = f32[8,32]{1,0} all-reduce(" and the async
# "all-reduce-start(" spelling; group 1 = operand result dims
_AR = re.compile(r"=\s*\w+\[([0-9,]*)\][^=]*?\ball-reduce(?:-start)?\(")


def _all_reduce_shapes(compiled_text: str):
    """Element counts of every all-reduce result in the HLO, in order."""
    out = []
    for m in _AR.finditer(compiled_text):
        dims = m.group(1)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n)
    return out


def _compile_forward(cfg, data, model_ax, seed=0):
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    mesh = make_mesh(data=data, model=model_ax)
    sh = ShardedFleetRec(model, mesh)
    sparams = sh.shard_params(params)
    rng = np.random.default_rng(seed)
    B = cfg.batch_size
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = (rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32)
             if cfg.dense_dim else None)
    sidx, sdense = sh.shard_batch(jnp.asarray(idx),
                                  None if dense is None else jnp.asarray(dense))
    lowered = sh.forward.lower(sparams, sidx, sdense)
    return sh, model, lowered.compile().as_text()


def test_fold_path_single_allreduce_at_w1_partial_size():
    # micro_test: F=100, H1=32 -> fold active; exactly one all-reduce at
    # [B_loc, H1], none at gathered-row or feature size.
    cfg = C.micro_test(batch_size=32)
    sh, model, txt = _compile_forward(cfg, data=1, model_ax=8)
    assert sh._use_w1_fold
    shapes = _all_reduce_shapes(txt)
    B_loc = 32
    H1 = cfg.mlp.widths[1]
    assert shapes == [B_loc * H1], (shapes, B_loc * H1)
    gathered = B_loc * model.layout.n_take * model.layout.take_lanes
    assert gathered not in shapes
    assert B_loc * cfg.feature_dim not in shapes


def test_fallback_path_single_allreduce_at_feature_size():
    # tiny_dlrm: F=128 < H1=256 -> feature psum stays (fewer bytes).
    cfg = dataclasses.replace(
        C.tiny_dlrm(batch_size=32),
        tables=tuple(dataclasses.replace(t, rows=4096) for t in C.tiny_dlrm().tables),
    )
    sh, model, txt = _compile_forward(cfg, data=2, model_ax=4)
    assert not sh._use_w1_fold
    shapes = _all_reduce_shapes(txt)
    B_loc = 32 // 2
    assert shapes == [B_loc * cfg.feature_dim], shapes
    gathered = B_loc * model.layout.n_take * model.layout.take_lanes
    assert gathered not in shapes


def test_model3_fold_allreduce_is_h1_not_feature():
    # The flagship multi-chip config: the exchange must be [B_loc, 2048],
    # not [B_loc, 3968] — the halved-ICI claim in docs/DESIGN.md.
    cfg = C.fleetrec_model3(batch_size=16)
    cfg = dataclasses.replace(
        cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, 128)) for t in cfg.tables)
    )
    sh, model, txt = _compile_forward(cfg, data=2, model_ax=4)
    assert sh._use_w1_fold
    shapes = _all_reduce_shapes(txt)
    B_loc = 16 // 2
    assert shapes == [B_loc * 2048], shapes
    assert B_loc * 3968 not in shapes


def test_fold_is_staged_not_per_call():
    # The [src_cols, H1] fold matrix A is built ONCE by shard_params
    # (fold_w1) — the compiled forward must contain NO scatter(-add) at
    # all (the old per-call `zeros.at[perm].add(W1)` lowered to one); the
    # staged A arrives as a parameter instead (VERDICT r2 #7).
    cfg = C.micro_test(batch_size=32)
    sh, model, txt = _compile_forward(cfg, data=1, model_ax=8)
    assert sh._use_w1_fold
    assert "scatter(" not in txt and "scatter-add" not in txt, (
        "per-call scatter found in sharded forward HLO — the W1 fold must "
        "be staged by shard_params, not rebuilt every call")


def test_train_step_refreshes_fold():
    # After a train step updates W1, the re-folded A must equal
    # fold_w1(new W1) — a stale fold would silently skew every subsequent
    # sharded forward.
    import jax

    cfg = C.micro_test(batch_size=32)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    assert "w1_fold" in sp
    rng = np.random.default_rng(3)
    idx = np.stack([rng.integers(0, t.rows, 32) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.uniform(-1, 1, (32, cfg.dense_dim)).astype(np.float32)
    labels = rng.integers(0, 2, (32,)).astype(np.float32)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    w1_before = np.asarray(sp["mlp"][0])  # sp is donated by train_step
    _, new_params = sh.train_step(sp, si, sd, jnp.asarray(labels), 0.1)
    want = np.asarray(sh.fold_w1(new_params["mlp"][0]))
    got = np.asarray(new_params["w1_fold"])
    assert np.array_equal(got, want)
    # and W1 actually moved, so the refresh is load-bearing
    assert not np.array_equal(np.asarray(new_params["mlp"][0]), w1_before)


@pytest.mark.parametrize("data,model_ax", [(1, 8), (2, 4)])
def test_fold_path_bitexact_on_parity_data(data, model_ax):
    # pm1 tables + all-ones W: every partial sum is a small integer, so the
    # fold's different contraction order must still be bit-exact vs the
    # single-device forward.
    import jax

    cfg = C.micro_test(batch_size=32)
    model, params = init_model(cfg)  # pm1 / ones
    rng = np.random.default_rng(7)
    idx = np.stack([rng.integers(0, t.rows, 32) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.integers(0, 3, (32, cfg.dense_dim)).astype(np.float32)
    single = np.asarray(
        jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense))
    )
    mesh = make_mesh(data=data, model=model_ax)
    sh = ShardedFleetRec(model, mesh)
    assert sh._use_w1_fold
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    got = np.asarray(sh.forward(sp, si, sd))
    assert np.array_equal(got, single)


def _pipelined_inputs(cfg, K, B, seed=7, dense_ints=True):
    rng = np.random.default_rng(seed)
    idx = np.stack([rng.integers(0, t.rows, (K, B)) for t in cfg.tables], 2).astype(np.int32)
    dense = (rng.integers(0, 3, (K, B, cfg.dense_dim)).astype(np.float32)
             if cfg.dense_dim else None)
    return idx, dense


@pytest.mark.parametrize("name,kw", [
    ("micro_test", {}),          # fold path, dense carried through the scan
    ("tiny_dlrm", {}),           # fallback feature-psum path, no dense
    ("micro_dlrm", {"onehot_max": 70}),  # dot interaction (dense post-psum)
])
def test_pipelined_forward_bitexact(name, kw):
    # The double-buffered K-batch step must produce bit-identical scores to
    # K sequential forwards (same psum, same contraction order — only the
    # schedule moves).
    import dataclasses as dc

    import jax

    cfg = C.get_config(name, batch_size=32, **kw)
    if name == "tiny_dlrm":
        cfg = dc.replace(cfg, tables=tuple(
            dc.replace(t, rows=4096) for t in cfg.tables))
    model, params = init_model(cfg)
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    K, B = 3, 32
    idx, dense = _pipelined_inputs(cfg, K, B)
    seq = np.stack([
        np.asarray(sh.forward(sp, jnp.asarray(idx[k]),
                              None if dense is None else jnp.asarray(dense[k])))
        for k in range(K)
    ])
    pip = np.asarray(sh.forward_pipelined(
        sp, jnp.asarray(idx), None if dense is None else jnp.asarray(dense)))
    assert np.array_equal(seq, pip)


def test_pipelined_psum_overlaps_next_gather():
    """The ICI-overlap structure behind docs/DESIGN.md's v5e-16 projection
    (VERDICT r2 #9): in the scan body, the all-reduce's operand must be a
    LOOP-CARRY element (batch k-1's partial product, %get-tuple-element of
    the while parameter) — never a value computed in the same iteration —
    so the collective is data-independent of the current batch's gather and
    the scheduler can run them concurrently (async all-reduce-start/done on
    TPU; the CPU backend keeps a synchronous all-reduce but the structural
    independence is identical).  Exactly 2 all-reduces total: one in the
    steady-state body, one epilogue for the final batch."""
    cfg = C.micro_test(batch_size=32)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    mesh = make_mesh(data=1, model=8)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    idx, dense = _pipelined_inputs(cfg, 4, 32)
    txt = sh.forward_pipelined.lower(
        sp, jnp.asarray(idx), jnp.asarray(dense)).compile().as_text()
    ars = re.findall(r"all-reduce(?:-start)?\((%[\w.\-]+)\)", txt)
    assert len(ars) == 2, ars
    # the while-body all-reduce consumes the carry; the epilogue one may
    # consume anything (it's after the last gather by construction)
    assert any(op.startswith("%get-tuple-element") for op in ars), ars


def test_interaction_head_keeps_feature_psum():
    # dot interaction consumes the feature vector itself -> no fold.
    cfg = C.micro_dlrm(batch_size=32, onehot_max=70)
    sh, model, txt = _compile_forward(cfg, data=2, model_ax=4)
    assert not sh._use_w1_fold
    shapes = _all_reduce_shapes(txt)
    B_loc = 32 // 2
    emb_flat = cfg.num_tables * cfg.tables[0].dim
    assert shapes == [B_loc * emb_flat], shapes


_DOT = re.compile(r"=\s*\w+\[([0-9,]*)\][^=]*?\bdot\(")


def test_onehot_classes_partitioned_over_model_axis():
    """VERDICT r3 #7: with n_model > 1 each shard computes the one-hot /
    factored selection matmuls ONLY for its own tables — the compiled
    per-shard HLO must contain class dots at the local table count
    (ceil(n_pad/M)) and none at the full class size.  criteo geometry
    (rows capped into the one-hot/factored tiers), n_model=4."""
    cfg = C.criteo_terabyte(batch_size=32)
    cfg = dataclasses.replace(
        cfg,
        tables=tuple(dataclasses.replace(t, rows=min(t.rows, 20265))
                     for t in cfg.tables),
    )
    sh, model, txt = _compile_forward(cfg, data=1, model_ax=4)
    classes = model.layout.onehot_classes
    # layout sanity for this geometry: one plain (n=10) + one factored (n=16)
    assert sorted(c.num_tables for c in classes) == [10, 16]
    M = 4
    lead = set()
    for m in _DOT.finditer(txt):
        dims = [int(d) for d in m.group(1).split(",") if d]
        if len(dims) == 3:  # class dots are [n, B, cols]; MLP dots are 2-D
            lead.add(dims[0])
    for c in classes:
        n_loc = -(-c.num_tables // M)
        assert n_loc in lead, (c.num_tables, n_loc, lead)
        assert c.num_tables not in lead, (
            f"full-size class dot (n={c.num_tables}) found — the class is "
            f"being computed replicated, not partitioned", lead)


def test_pipelined_forward_bitexact_int8_partitioned():
    """K-batch pipelined step with int8 tables AND model-axis-partitioned
    one-hot classes: bit-identical to sequential sharded forwards (the
    int8 dequant scales ride the scan carry path unchanged)."""
    import dataclasses as dc

    cfg = dc.replace(C.micro_test(batch_size=32), table_dtype="int8")
    model, params = init_model(cfg)  # pm1 / ones: int8 pow2 exact
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    K, B = 3, 32
    idx, dense = _pipelined_inputs(cfg, K, B)
    seq = np.stack([
        np.asarray(sh.forward(sp, jnp.asarray(idx[k]), jnp.asarray(dense[k])))
        for k in range(K)
    ])
    pip = np.asarray(sh.forward_pipelined(
        sp, jnp.asarray(idx), jnp.asarray(dense)))
    assert np.array_equal(seq, pip)
