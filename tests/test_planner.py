"""Placement planner: byte accounting, fit checks, and exactness of the
column-split (row+column sharding, BASELINE config 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fleetrec_tpu import config as C
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import init_model
from fleetrec_tpu.parallel import (
    ShardedFleetRec,
    make_mesh,
    plan,
    split_table_columns,
    split_table_data,
)


def test_plan_criteo_fits_at_16_not_at_1():
    cfg = C.criteo_terabyte()  # bf16, ~1.7B rows total, dim 32
    p1 = plan(cfg, n_model=1)
    p16 = plan(cfg, n_model=16)
    assert not p1.fits and p16.fits
    assert 1 < p16.min_model_shards <= 16
    assert p16.take_bytes_per_chip * 16 == p16.take_bytes_total
    # load fractions sum to ~1 (stripe-span ceil rounding overestimates a
    # few tenths of a percent) and every shard serves traffic
    loads = [s.uniform_load_frac for s in p16.shards]
    assert abs(sum(loads) - 1.0) < 5e-3
    assert min(loads) > 0


def test_plan_model1_single_chip():
    cfg = C.fleetrec_model1()
    p = plan(cfg, n_model=1)
    assert p.fits and p.min_model_shards == 1
    # replicated small tables + row-sharded take buffer account for all
    # table bytes (take side is phys-padded so >= the raw large-table
    # bytes; the factored tier's tables live in class buffers, not take)
    large = sum(t.nbytes for t in cfg.tables
                if t.rows > max(cfg.onehot_max, cfg.onehot_factor_max))
    assert p.take_bytes_total >= large
    assert len(p.shards) == 1 and p.shards[0].uniform_load_frac == pytest.approx(1.0)


def test_column_split_exact_single_device():
    cfg = C.micro_test(batch_size=8)
    # dim-32 table is table_id 6 in micro_test
    tid = next(t.table_id for t in cfg.tables if t.dim == 32)
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, t.rows, 8) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.uniform(-1, 1, (8, cfg.dense_dim)).astype(np.float32)
    golden = ref.forward(cfg, tables, ws, idx, dense)

    new_cfg, imap = split_table_columns(cfg, tid, 4)
    new_tables = split_table_data(tables, cfg, tid, 4)
    assert new_cfg.num_tables == cfg.num_tables + 3
    new_idx = idx[:, imap]

    # oracle agrees on the split geometry
    golden2 = ref.forward(new_cfg, new_tables, ws, new_idx, dense)
    np.testing.assert_array_equal(golden2, golden)

    # split fused model is bit-identical to the unsplit fused model (same
    # feature vector bits -> same MLP bits); both match the f64 oracle to fp32
    model0, params0 = init_model(cfg, tables_np=tables, mlp_np=ws)
    want = np.asarray(
        jax.jit(model0.forward)(params0, jnp.asarray(idx), jnp.asarray(dense))
    )
    model, params = init_model(new_cfg, tables_np=new_tables, mlp_np=ws)
    out = np.asarray(
        jax.jit(model.forward)(params, jnp.asarray(new_idx), jnp.asarray(dense))
    )
    np.testing.assert_array_equal(out, want)
    np.testing.assert_allclose(out, golden, rtol=1e-5)


def test_column_split_sharded_forward():
    """Row+column sharding together: split the giant table, then row-shard
    the packed buffer over 8 devices; scores match the unsplit oracle."""
    cfg = C.micro_test(batch_size=16, rows=512)
    tid = next(t.table_id for t in cfg.tables if t.dim == 32)
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    rng = np.random.default_rng(1)
    idx = np.stack([rng.integers(0, t.rows, 16) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.uniform(-1, 1, (16, cfg.dense_dim)).astype(np.float32)
    golden = ref.forward(cfg, tables, ws, idx, dense)

    new_cfg, imap = split_table_columns(cfg, tid, 2)
    new_tables = split_table_data(tables, cfg, tid, 2)
    model, params = init_model(new_cfg, tables_np=new_tables, mlp_np=ws)
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx[:, imap]), jnp.asarray(dense))
    out = np.asarray(sh.forward(sp, si, sd))
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_striped_layout_exact_and_balanced():
    """take_stripes=4: (a) single-device lookup is bit-identical to the
    contiguous layout, (b) sharded forward matches the oracle, (c) the
    planner reports flat per-shard gather load where the contiguous layout
    is imbalanced."""
    cfg0 = C.micro_test(batch_size=16, rows=512)
    cfg = dataclasses.replace(cfg0, take_stripes=4)
    tables = ref.init_tables(cfg0, scheme="uniform")
    ws = ref.init_mlp_weights(cfg0, scheme="uniform")
    rng = np.random.default_rng(2)
    idx = np.stack([rng.integers(0, t.rows, 16) for t in cfg0.tables], 1).astype(np.int32)
    dense = rng.uniform(-1, 1, (16, cfg0.dense_dim)).astype(np.float32)

    m0, p0 = init_model(cfg0, tables_np=tables, mlp_np=ws)
    m1, p1 = init_model(cfg, tables_np=tables, mlp_np=ws)
    want = np.asarray(jax.jit(m0.forward)(p0, jnp.asarray(idx), jnp.asarray(dense)))
    got = np.asarray(jax.jit(m1.forward)(p1, jnp.asarray(idx), jnp.asarray(dense)))
    np.testing.assert_array_equal(got, want)

    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(m1, mesh)
    sp = sh.shard_params(p1)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    out = np.asarray(sh.forward(sp, si, sd))
    golden = ref.forward(cfg0, tables, ws, idx, dense)
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


def test_striped_criteo_balances_plan():
    cfg = C.criteo_terabyte()  # take_stripes=16 default
    p = plan(cfg, n_model=16)
    loads = [s.uniform_load_frac for s in p.shards]
    assert max(loads) / (sum(loads) / len(loads)) < 1.05
    # every shard touches every take table (factored-tier tables live in
    # class buffers, not the take buffer)
    n_take_tables = sum(1 for t in cfg.tables
                        if t.rows > max(cfg.onehot_max, cfg.onehot_factor_max))
    assert all(len(s.tables_touched) == n_take_tables for s in p.shards)
    # contiguous layout for comparison: imbalanced
    p0 = plan(dataclasses.replace(cfg, take_stripes=1), n_model=16)
    l0 = [s.uniform_load_frac for s in p0.shards]
    assert max(l0) / (sum(l0) / len(l0)) > 2.0


def test_split_rejects_bad_parts():
    cfg = C.micro_test()
    tid = next(t.table_id for t in cfg.tables if t.dim == 8)
    with pytest.raises(ValueError):
        split_table_columns(cfg, tid, 3)
    with pytest.raises(ValueError):
        split_table_columns(cfg, 999, 2)
