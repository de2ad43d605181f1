"""Parity tests: the TPU engine vs the numpy golden oracle and the
reference's closed-form constants (GPU/final_network_cublasLt_1_node_
no_FIFO_scatter/README.md:7-11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fleetrec_tpu import config as C
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import init_model


def rand_indices(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [rng.integers(0, t.rows, size=B) for t in cfg.tables], axis=1
    ).astype(np.int32) if cfg.tables else np.zeros((B, 0), np.int32)


def rand_dense(cfg, B, seed=1):
    if not cfg.dense_dim:
        return None
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(B, cfg.dense_dim)).astype(np.float32)


@pytest.mark.parametrize("width,expected", [(512, 68719476736.0), (1024, 137438953472.0)])
def test_closed_form_parity_constant(width, expected):
    """All-ones input through the all-ones 1024-512-256-1 chain must hit the
    reference README constants exactly (fp32 is exact: powers of two)."""
    cfg = C.parity_synthetic(width, batch_size=8)
    model, params = init_model(cfg)
    dense = np.ones((8, width), dtype=np.float32)
    idx = np.zeros((8, 0), dtype=np.int32)
    scores = np.asarray(jax.jit(model.forward)(params, idx, dense))
    assert ref.closed_form_all_ones_score(width) == expected
    np.testing.assert_array_equal(scores, np.full(8, expected, np.float32))


@pytest.mark.parametrize("scheme", ["pm1", "rowid"])
def test_micro_gather_concat_exact(scheme):
    """Lookup+concat must be bit-exact vs the golden (pure data movement)."""
    cfg = C.micro_test()
    tables = ref.init_tables(cfg, scheme=scheme)
    model, params = init_model(cfg, tables_np=tables)
    B = cfg.batch_size
    idx, dense = rand_indices(cfg, B), rand_dense(cfg, B)
    golden = ref.gather_concat(cfg, tables, idx, dense)

    from fleetrec_tpu.models.embedding import lookup_concat

    gi = idx[:, np.asarray(model.index_perm)]
    feats = np.asarray(lookup_concat(params["tables"], jnp.asarray(gi), jnp.asarray(dense)))
    np.testing.assert_array_equal(feats, golden)


@pytest.mark.parametrize("name", ["fleetrec_model1", "fleetrec_model2", "fleetrec_model3"])
def test_reference_models_gather_exact(name):
    """The three paper configs: gather/concat bit-exact on ±1 tables, and
    scores match the float64 oracle to fp32 tolerance."""
    cfg = C.get_config(name, batch_size=16)
    # shrink giant tables for test speed: geometry (dims/offsets) unchanged
    import dataclasses

    small = tuple(
        dataclasses.replace(t, rows=min(t.rows, 512)) for t in cfg.tables
    )
    # fp32 storage: the rowid scheme's values (0..511) are not int8-
    # representable and this test pins gather GEOMETRY, not quantization
    # (model3 defaults to int8 tables; its int8 parity is covered by
    # test_int8_quantized_parity_pm1 and the chip STORAGE_PARITY artifact).
    cfg = dataclasses.replace(cfg, tables=small, table_dtype="float32")
    tables = ref.init_tables(cfg, scheme="rowid")
    model, params = init_model(cfg, tables_np=tables)
    B = cfg.batch_size
    idx, dense = rand_indices(cfg, B), rand_dense(cfg, B)

    from fleetrec_tpu.models.embedding import lookup_concat

    gi = idx[:, np.asarray(model.index_perm)]
    d = None if dense is None else jnp.asarray(dense)
    feats = np.asarray(lookup_concat(params["tables"], jnp.asarray(gi), d))
    golden = ref.gather_concat(cfg, tables, idx, dense)
    np.testing.assert_array_equal(feats, golden)


@pytest.mark.parametrize("name", ["micro_test", "fleetrec_model1"])
def test_end_to_end_vs_oracle(name):
    cfg = C.get_config(name) if name != "fleetrec_model1" else C.fleetrec_model1(batch_size=8)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, 256)) for t in cfg.tables)
    )
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    B = cfg.batch_size
    idx, dense = rand_indices(cfg, B), rand_dense(cfg, B)
    d = None if dense is None else jnp.asarray(dense)
    scores = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), d))
    golden = ref.forward(cfg, tables, ws, idx, dense)
    # fp32 chain vs float64 oracle: absolute error scales with intermediate
    # magnitudes (~1), not the near-zero final score -> atol-dominated bound.
    np.testing.assert_allclose(scores, golden, rtol=1e-3, atol=2e-3)


def test_pm1_parity_end_to_end():
    """±1 tables + all-ones weights: score is an exact even integer the
    oracle predicts; engine must match to fp32-rounding of the same value."""
    cfg = C.micro_test(batch_size=32)
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables, mlp_scheme="ones")
    idx = rand_indices(cfg, 32)
    dense = np.ones((32, cfg.dense_dim), dtype=np.float32)
    scores = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    golden = ref.forward(cfg, tables, ref.init_mlp_weights(cfg, "ones"), idx, dense)
    np.testing.assert_array_equal(scores, golden.astype(np.float32))


def test_take_lanes_64_gather_exact():
    """64-lane packed take buffer (the 16-bit serving layout) must produce
    the same gather/concat as the 128-lane layout (fp32 here; the dtype is
    orthogonal to the packing math)."""
    from fleetrec_tpu.models.embedding import (
        build_layout, index_columns, lookup_concat, pack_tables,
    )

    cfg = C.micro_test(batch_size=24)
    tables = ref.init_tables(cfg, scheme="rowid")
    idx, dense = rand_indices(cfg, 24), rand_dense(cfg, 24)
    golden = ref.gather_concat(cfg, tables, idx, dense)
    for lanes in (64, 128, 256, 512):
        layout = build_layout(cfg.tables, cfg.feature_dim, cfg.dense_dim,
                              take_lanes=lanes)
        packed = pack_tables(tables, cfg.tables, layout)
        gi = idx[:, index_columns(layout, [t.table_id for t in cfg.tables])]
        feats = np.asarray(
            lookup_concat(packed, jnp.asarray(gi), jnp.asarray(dense))
        )
        np.testing.assert_array_equal(feats, golden)


def test_int8_quantized_parity_pm1():
    """int8 tables with power-of-two scales: ±1 parity data dequantizes
    bit-exactly, so scores equal the fp32 oracle exactly."""
    import dataclasses

    cfg = C.micro_test(batch_size=32)
    # bump two tables above the one-hot threshold so BOTH paths quantize
    bumped = tuple(
        dataclasses.replace(t, rows=5000) if t.table_id in (2, 6) else t
        for t in cfg.tables
    )
    cfg = dataclasses.replace(cfg, tables=bumped, table_dtype="int8")
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables, mlp_scheme="ones")
    assert params["tables"].take_buffer.dtype == jnp.int8
    assert params["tables"].onehot_buffers[0].dtype == jnp.int8
    idx = rand_indices(cfg, 32)
    dense = np.ones((32, cfg.dense_dim), np.float32)
    scores = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    golden = ref.forward(cfg, tables, ref.init_mlp_weights(cfg, "ones"), idx, dense)
    np.testing.assert_array_equal(scores, golden.astype(np.float32))


def test_int8_quantized_error_bound():
    """Uniform tables: int8 dequant error bounded by scale/2 per element."""
    import dataclasses

    cfg = C.micro_test(batch_size=16)
    cfg8 = dataclasses.replace(cfg, table_dtype="int8")
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    m32, p32 = init_model(cfg, tables_np=tables, mlp_np=ws)
    m8, p8 = init_model(cfg8, tables_np=tables, mlp_np=ws)
    idx = rand_indices(cfg, 16)
    dense = rand_dense(cfg, 16)
    s32 = np.asarray(jax.jit(m32.forward)(p32, jnp.asarray(idx), jnp.asarray(dense)))
    s8 = np.asarray(jax.jit(m8.forward)(p8, jnp.asarray(idx), jnp.asarray(dense)))
    # values in [-1,1] -> scale 2^-6 -> elementwise err <= 2^-7; through the
    # micro MLP the score error stays small
    np.testing.assert_allclose(s8, s32, atol=0.3)
    assert np.mean(np.abs(s8 - s32)) < 0.05


def test_int8_activation_dtype_rejected():
    """dtype (activations) must not accept int8 — int8 activations score
    garbage silently (VERDICT r3 weak #4); quantized storage goes through
    table_dtype instead."""
    import dataclasses

    with pytest.raises(AssertionError, match="activation"):
        C.criteo_terabyte(dtype="int8")
    with pytest.raises(AssertionError, match="activation"):
        dataclasses.replace(C.micro_test(), dtype="int8").validate()
    # the legal quantized spelling still works
    cfg = C.criteo_terabyte(dtype="bfloat16", table_dtype="int8")
    assert cfg.dtype == "bfloat16" and cfg.table_dtype == "int8"


def test_model3_defaults_int8_tables():
    """model3's benched configuration is its measured-best operating point
    (VERDICT r3 #3): int8 table storage, fp32 activations."""
    cfg = C.fleetrec_model3(batch_size=8)
    assert cfg.table_dtype == "int8" and cfg.dtype == "float32"
