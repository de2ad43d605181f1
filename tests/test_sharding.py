"""Multi-device sharding tests on the 8-virtual-CPU mesh — the analog of
the reference's run-the-cluster-on-one-box emulation (GPU/* sender binaries
that 'simulate FPGA', localhost variants)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fleetrec_tpu import config as C
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import init_model
from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh


def small_cfg(name="micro_test", B=32):
    cfg = C.micro_test(batch_size=B)
    return cfg


def make_inputs(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    idx = np.stack([rng.integers(0, t.rows, size=B) for t in cfg.tables], axis=1).astype(np.int32)
    dense = rng.uniform(-1, 1, size=(B, cfg.dense_dim)).astype(np.float32) if cfg.dense_dim else None
    return idx, dense


@pytest.mark.parametrize("data,model_ax", [(8, 1), (1, 8), (2, 4)])
def test_sharded_forward_matches_single(data, model_ax):
    cfg = small_cfg(B=32)
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    idx, dense = make_inputs(cfg, 32)

    single = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))

    mesh = make_mesh(data=data, model=model_ax)
    sh = ShardedFleetRec(model, mesh)
    sparams = sh.shard_params(params)
    sidx, sdense = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    out = np.asarray(sh.forward(sparams, sidx, sdense))
    np.testing.assert_allclose(out, single, rtol=2e-6, atol=1e-6)


def test_sharded_train_step_decreases_loss():
    cfg = small_cfg(B=64)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    idx, dense = make_inputs(cfg, 64)
    labels = (np.arange(64) % 2).astype(np.float32)

    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    params = sh.shard_params(params)
    sidx, sdense = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    labels = jnp.asarray(labels)

    losses = []
    for _ in range(5):
        loss, params = sh.train_step(params, sidx, sdense, labels, 0.1)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_fleetrec_model3_two_shard_layout():
    """Model-3's two-FPGA table split sharded over model axis: scores match
    the oracle (the ICI replacement for the 2xFPGA + CPU -> GPU topology)."""
    cfg = C.fleetrec_model3(batch_size=16)
    # fp32 storage: the rowid scheme's values (~1e5) are not int8-
    # representable and this test pins the two-shard TOPOLOGY (model3's
    # int8 default parity is covered by test_parity + STORAGE_PARITY).
    cfg = dataclasses.replace(
        cfg,
        tables=tuple(dataclasses.replace(t, rows=min(t.rows, 128)) for t in cfg.tables),
        table_dtype="float32",
    )
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    idx, dense = make_inputs(cfg, 16)
    golden = ref.forward(cfg, tables, ws, idx, dense)

    mesh = make_mesh(data=2, model=2)
    sh = ShardedFleetRec(model, mesh)
    sparams = sh.shard_params(params)
    sidx, sdense = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    out = np.asarray(sh.forward(sparams, sidx, sdense))
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=2e-3)


def test_trainer_reduces_loss_and_serves():
    """optax Trainer over the serving params pytree: loss falls, and the
    trained params serve through the same forward (train->serve loop)."""
    from fleetrec_tpu.models.train import Trainer

    cfg = C.micro_test(batch_size=64)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    rng = np.random.default_rng(0)
    idx, dense = make_inputs(cfg, 64)
    # learnable signal: label depends on one feature sign
    labels = (dense[:, 0] > 0).astype(np.float32)
    import optax

    tr = Trainer(model, optimizer=optax.adagrad(0.3))
    params, losses = tr.fit(params, [(idx, dense, labels)] * 80)
    assert losses[-1] < losses[0] * 0.7, losses[::20]
    scores = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    acc = np.mean((scores > 0) == (labels > 0.5))
    assert acc > 0.8, acc


@pytest.mark.parametrize("data,model_ax", [(1, 8), (2, 4)])
def test_partitioned_onehot_int8_matches_single(data, model_ax):
    """Model-axis-partitioned one-hot classes with int8 storage: the
    padded per-shard dequant scales and zero pad-tables must reproduce the
    single-device scores exactly (pm1 data dequantizes bit-exactly)."""
    cfg = dataclasses.replace(C.micro_test(batch_size=32), table_dtype="int8")
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables, mlp_scheme="ones")
    idx, dense = make_inputs(cfg, 32)
    dense = np.ones_like(dense)
    single = np.asarray(jax.jit(model.forward)(
        params, jnp.asarray(idx), jnp.asarray(dense)))

    mesh = make_mesh(data=data, model=model_ax)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    out = np.asarray(sh.forward(sp, si, sd))
    np.testing.assert_array_equal(out, single)


def test_partitioned_factored_criteo_matches_single():
    """criteo geometry capped into the one-hot/factored tiers (one plain
    n=10 class + one factored n=16 class), partitioned over model=4:
    sharded scores equal the single-device forward.  fp32 here — the CPU
    backend cannot execute bf16 dots (tests/test_ops.py notes the same);
    the bf16-storage serving default is covered on-chip by the
    STORAGE_PARITY artifact."""
    cfg = C.criteo_terabyte(batch_size=32, dtype="float32")
    cfg = dataclasses.replace(
        cfg,
        tables=tuple(dataclasses.replace(t, rows=min(t.rows, 20265))
                     for t in cfg.tables),
    )
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables, mlp_scheme="ones")
    idx, dense = make_inputs(cfg, 32)
    dense = np.sign(dense) if dense is not None else None
    single = np.asarray(jax.jit(model.forward)(
        params, jnp.asarray(idx), jnp.asarray(dense)))

    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    out = np.asarray(sh.forward(sp, si, sd))
    np.testing.assert_array_equal(out, single)


def test_train_after_shard_params_with_padded_onehot():
    """The GSPMD training path shares shard_params' padded one-hot buffers
    (lookup_concat pads index columns); the step must run and refresh the
    fold, and a subsequent sharded serve must work."""
    cfg = C.micro_test(batch_size=32)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    idx, dense = make_inputs(cfg, 32)
    labels = (np.arange(32) % 2).astype(np.float32)
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    loss, new_params = sh.train_step(sp, si, sd, jnp.asarray(labels), 0.05)
    assert np.isfinite(float(loss))
    out = np.asarray(sh.forward(new_params, si, sd))
    assert out.shape == (32,) and np.all(np.isfinite(out))


@pytest.mark.parametrize("table_dtype", ["float32", "int8"])
def test_bad_index_nan_on_both_forwards(table_dtype):
    """Out-of-buffer row ids must surface as NaN scores on the SHARDED
    forward exactly like the single-device one (jnp.take fill semantics,
    models/fleetrec.py docstring) — not silent zero contributions
    (VERDICT r4 #6).  Valid rows of the same batch stay exact."""
    cfg = dataclasses.replace(C.micro_test(batch_size=16), onehot_max=8,
                              table_dtype=table_dtype)  # all tables -> take
    model, params = init_model(cfg)
    idx, dense = make_inputs(cfg, 16)
    idx[3, 0] = 1 << 28   # far past the unified buffer's last row
    idx[9, 4] = -7        # negative ids poison too

    single = np.asarray(jax.jit(model.forward)(
        params, jnp.asarray(idx), jnp.asarray(dense)))
    assert np.isnan(single[3]) and np.isnan(single[9]), single

    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sparams = sh.shard_params(params)
    sidx, sdense = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    out = np.asarray(sh.forward(sparams, sidx, sdense))
    np.testing.assert_array_equal(np.isnan(out), np.isnan(single))
    good = ~np.isnan(single)
    np.testing.assert_allclose(out[good], single[good], rtol=2e-6, atol=1e-6)
