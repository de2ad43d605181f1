"""DCNv2 cross-interaction model family (beyond-reference capability).

interaction="cross" inserts a stacked cross network (x_{l+1} = x0 * (x_l W_l
+ b_l) + x_l, arXiv:2008.13535) between the fixed-offset concat and the top
MLP.  Same packed-table storage, sharding, serving and checkpoint machinery
as the reference architecture; parity is checked bit-exactly against the
float64 numpy oracle on integer-valued data (matmul_precision="highest" is
pinned in micro_cross because cross activations carry >8-bit mantissas).
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
    dense = rng.integers(0, 2, size=(B, cfg.dense_dim)).astype(np.float32)
    return idx, dense


def oracle(cfg, idx, dense, table_scheme="pm1", mlp_scheme="ones"):
    tables = ref.init_tables(cfg, scheme=table_scheme)
    ws = ref.init_mlp_weights(cfg, scheme=mlp_scheme)
    cw = ref.init_cross_weights(cfg, scheme=mlp_scheme)
    return ref.forward(cfg, tables, ws, idx, dense, cross_weights=cw)


def test_micro_cross_parity_bitexact():
    cfg = C.micro_cross(batch_size=32)
    model, params = init_model(cfg)  # pm1 tables, ones weights (+ zero bias)
    assert "cross" in params and len(params["cross"]) == cfg.cross_layers
    idx, dense = make_inputs(cfg, 32)
    got = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    want = oracle(cfg, idx, dense)
    assert np.array_equal(got, want.astype(np.float32))


def test_micro_cross_lowrank_parity():
    # one layer: two stacked all-ones UV layers push activations past 2^24
    # where fp32 integer exactness ends (W = UV = rank * ones amplifies)
    cfg = C.micro_cross(batch_size=32, cross_layers=1, cross_rank=4)
    model, params = init_model(cfg)
    assert len(params["cross"][0]) == 3  # [U, V, b]
    idx, dense = make_inputs(cfg, 32, seed=5)
    got = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    want = oracle(cfg, idx, dense)
    assert np.array_equal(got, want.astype(np.float32))


def test_micro_cross_uniform_close():
    # uniform weights (the non-parity path): float64 oracle to tight rtol
    cfg = C.micro_cross(batch_size=32)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    idx, dense = make_inputs(cfg, 32, seed=6)
    got = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    cw = ref.init_cross_weights(cfg, scheme="uniform")
    want = ref.forward(cfg, tables, ws, idx, dense, cross_weights=cw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("data,model_ax", [(8, 1), (2, 4)])
def test_cross_sharded_matches_single(data, model_ax):
    # onehot_max=70 puts table 0 (64 rows) on the one-hot path and the rest
    # on the packed take path — both lookup paths under shard_map
    cfg = dataclasses.replace(C.micro_cross(batch_size=32), onehot_max=70)
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


def test_cross_checkpoint_roundtrip(tmp_path):
    cfg = C.micro_cross(batch_size=16)
    model, params = init_model(cfg)
    path = str(tmp_path / "cross.npz")
    fio.save_npz(path, params, cfg=cfg)
    loaded = fio.load_npz(path, model)
    assert "cross" in loaded and len(loaded["cross"]) == cfg.cross_layers
    idx, dense = make_inputs(cfg, 16, seed=2)
    a = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    b = np.asarray(jax.jit(model.forward)(loaded, jnp.asarray(idx), jnp.asarray(dense)))
    assert np.array_equal(a, b)


def test_cross_fingerprint_depends_on_knobs():
    a = C.micro_cross(cross_layers=2)
    b = C.micro_cross(cross_layers=3)
    c = C.micro_cross(cross_layers=2, cross_rank=4)
    plain = C.micro_test()
    fps = {fio.config_fingerprint(x) for x in (a, b, c, plain)}
    assert len(fps) == 4  # depth, rank and interaction all distinguish


def test_cross_knob_validation():
    # stale cross knobs on a non-cross config must be rejected
    with pytest.raises(AssertionError):
        dataclasses.replace(C.micro_test(), cross_rank=4).validate()
    with pytest.raises(AssertionError):
        dataclasses.replace(C.micro_dlrm(), cross_layers=1).validate()
    with pytest.raises(AssertionError):
        dataclasses.replace(
            C.micro_test(), interaction="cross", cross_layers=0
        ).validate()


def test_cross_train_step_updates_cross_weights():
    cfg = C.micro_cross(batch_size=32)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    params = sh.shard_params(params)
    idx, dense = make_inputs(cfg, 32, seed=4)
    labels = jnp.asarray((np.arange(32) % 2).astype(np.float32))
    w_before = np.asarray(params["cross"][0][0])
    loss, new_params = sh.train_step(
        params, jnp.asarray(idx), jnp.asarray(dense), labels, 0.1
    )
    assert np.isfinite(float(loss))
    assert not np.array_equal(np.asarray(new_params["cross"][0][0]), w_before)
