"""DLRM dot-interaction model family (beyond-reference capability).

The reference serves one architecture (lookup -> concat -> MLP); this family
adds the standard DLRM head — bottom MLP on the dense slice, pairwise dot
interaction across the (T+1) feature vectors, top MLP — reusing the same
packed-table storage, sharding, serving and checkpoint machinery.  Parity
is checked bit-exactly against the float64 numpy oracle on integer-valued
data (all partial sums < 2^24, so fp32 accumulation is exact).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fleetrec_tpu import config as C
from fleetrec_tpu import io as fio
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import init_model
from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh


def make_inputs(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    idx = np.stack(
        [rng.integers(0, t.rows, size=B) for t in cfg.tables], axis=1
    ).astype(np.int32)
    # small integers keep every partial sum < 2^24 => fp32 bit-exact
    dense = rng.integers(0, 4, size=(B, cfg.dense_dim)).astype(np.float32)
    return idx, dense


def oracle(cfg, idx, dense, table_scheme="pm1", mlp_scheme="ones"):
    tables = ref.init_tables(cfg, scheme=table_scheme)
    ws = ref.init_mlp_weights(cfg, scheme=mlp_scheme)
    bw = ref.init_bottom_weights(cfg, scheme=mlp_scheme)
    return ref.forward(cfg, tables, ws, idx, dense, bottom_weights=bw)


def test_micro_dlrm_parity_bitexact():
    cfg = C.micro_dlrm(batch_size=32)
    model, params = init_model(cfg)  # pm1 tables, ones weights
    idx, dense = make_inputs(cfg, 32)
    got = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    want = oracle(cfg, idx, dense)
    assert np.array_equal(got, want.astype(np.float32))


def test_micro_dlrm_mixed_paths_parity():
    # onehot_max=70 puts table 0 (64 rows) on the one-hot path and the rest
    # (72..88 rows) on the packed take path — both lookup paths + striping
    cfg = C.micro_dlrm(batch_size=32, onehot_max=70)
    cfg = dataclasses.replace(cfg, take_stripes=4)
    model, params = init_model(cfg)
    idx, dense = make_inputs(cfg, 32, seed=3)
    got = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    want = oracle(cfg, idx, dense)
    assert np.array_equal(got, want.astype(np.float32))


@pytest.mark.parametrize("data,model_ax", [(8, 1), (2, 4)])
def test_dlrm_sharded_matches_single(data, model_ax):
    cfg = C.micro_dlrm(batch_size=32, onehot_max=70)
    model, params = init_model(cfg)
    idx, dense = make_inputs(cfg, 32, seed=1)
    single = np.asarray(
        jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense))
    )

    mesh = make_mesh(data=data, model=model_ax)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    got = np.asarray(sh.forward(sp, si, sd))
    assert np.array_equal(got, single)


def test_dlrm_checkpoint_roundtrip(tmp_path):
    cfg = C.micro_dlrm(batch_size=16, onehot_max=70)
    model, params = init_model(cfg)
    path = str(tmp_path / "dlrm.npz")
    fio.save_npz(path, params, cfg=cfg)
    loaded = fio.load_npz(path, model)
    assert "bottom" in loaded and len(loaded["bottom"]) == 2
    idx, dense = make_inputs(cfg, 16, seed=2)
    a = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    b = np.asarray(jax.jit(model.forward)(loaded, jnp.asarray(idx), jnp.asarray(dense)))
    assert np.array_equal(a, b)


def test_dlrm_fingerprint_differs_from_plain():
    dlrm = C.micro_dlrm()
    plain = C.micro_test()
    assert fio.config_fingerprint(dlrm) != fio.config_fingerprint(plain)


def test_dlrm_train_step_updates_all_towers():
    cfg = C.micro_dlrm(batch_size=32, onehot_max=70)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    params = sh.shard_params(params)
    idx, dense = make_inputs(cfg, 32, seed=4)
    labels = jnp.asarray((np.arange(32) % 2).astype(np.float32))
    w_before = np.asarray(params["bottom"][0])
    loss, new_params = sh.train_step(
        params, jnp.asarray(idx), jnp.asarray(dense), labels, 0.1
    )
    assert np.isfinite(float(loss))
    assert not np.array_equal(np.asarray(new_params["bottom"][0]), w_before)


def test_dlrm_terabyte_config_valid():
    cfg = C.dlrm_terabyte()
    assert cfg.mlp.input_dim == 128 + 27 * 26 // 2
    # capped-rows variant must build a layout (single-chip dev path)
    capped = dataclasses.replace(
        cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, 4096)) for t in cfg.tables)
    )
    capped.validate()
    from fleetrec_tpu.models.fleetrec import FleetRecModel

    model = FleetRecModel.create(dataclasses.replace(capped, take_stripes=1))
    assert model.layout.feature_dim == 26 * 128
