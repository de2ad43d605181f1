"""Checkpoint I/O, criteo row-sharding, and the sharded serving path."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fleetrec_tpu import config as C
from fleetrec_tpu import io as fio
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import init_model
from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh


def _inputs(cfg, B, seed=0):
    rng = np.random.default_rng(seed)
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = (
        rng.uniform(-1, 1, (B, cfg.dense_dim)).astype(np.float32) if cfg.dense_dim else None
    )
    return idx, dense


def test_npz_roundtrip(tmp_path):
    cfg = C.micro_test(batch_size=8)
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    idx, dense = _inputs(cfg, 8)
    want = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))

    path = os.path.join(tmp_path, "ckpt.npz")
    fio.save_npz(path, params, cfg=cfg)
    params2 = fio.load_npz(path, model)
    got = np.asarray(jax.jit(model.forward)(params2, jnp.asarray(idx), jnp.asarray(dense)))
    np.testing.assert_array_equal(got, want)


def test_checkpoint_config_fingerprint_mismatch(tmp_path):
    """Loading against the wrong geometry fails fast, not with a shape
    error deep in packing (or a silent wrong-offset gather)."""
    cfg = C.micro_test(batch_size=8)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    path = os.path.join(tmp_path, "ckpt.npz")
    fio.save_npz(path, params, cfg=cfg)

    other = C.tiny_dlrm(batch_size=8)
    other_model, other_params = init_model(
        other, table_scheme="uniform", mlp_scheme="uniform"
    )
    with pytest.raises(fio.ConfigMismatchError):
        fio.load_npz(path, other_model)

    opath = os.path.join(tmp_path, "orbax_ckpt")
    fio.save_orbax(opath, other_params, cfg=other)
    with pytest.raises(fio.ConfigMismatchError):
        fio.load_orbax(opath, model, params)


def test_orbax_roundtrip(tmp_path):
    cfg = C.micro_test(batch_size=8)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    idx, dense = _inputs(cfg, 8)
    want = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    path = os.path.join(tmp_path, "orbax_ckpt")
    fio.save_orbax(path, params)
    params2 = fio.load_orbax(path, model, params)
    got = np.asarray(jax.jit(model.forward)(params2, jnp.asarray(idx), jnp.asarray(dense)))
    np.testing.assert_array_equal(got, want)


def test_criteo_row_sharded_forward():
    """Criteo-scale geometry (26 tables incl. the 1B-row giant, shrunk for
    test) row-sharded over 8 devices: the giant's rows split across the
    model axis — the analog of BASELINE config 5's row+column sharding."""
    cfg = C.criteo_terabyte(batch_size=32, dtype="float32")
    cfg = dataclasses.replace(
        cfg,
        tables=tuple(dataclasses.replace(t, rows=min(t.rows, 4096)) for t in cfg.tables),
    )
    tables = ref.init_tables(cfg, scheme="rowid")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    idx, dense = _inputs(cfg, 32)
    golden = ref.forward(cfg, tables, ws, idx, dense)

    mesh = make_mesh(data=1, model=8)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    out = np.asarray(sh.forward(sp, si, sd))
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=2e-3)


def test_sharded_serving_engine():
    """Scatter-tier analog: one ingest point feeding a 2x4 mesh."""
    from fleetrec_tpu.serving import ServingEngine

    cfg = C.micro_test(batch_size=16)
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    eng = ServingEngine.from_sharded(sh, sp, batch_size=16)
    idx, dense = _inputs(cfg, 16)
    outs = {}
    eng.submit(idx, dense, on_done=lambda bid, s: outs.__setitem__(bid, s))
    summary = eng.drain()
    assert summary["batches"] == 1
    golden = ref.forward(cfg, tables, ws, idx, dense)
    np.testing.assert_allclose(outs[0], golden, rtol=1e-4, atol=1e-3)


def test_orbax_int8_scales_roundtrip(tmp_path):
    """int8-quantized params carry dequant scales; orbax must preserve
    them (dropping them restores un-dequantized tables)."""
    import os

    cfg = dataclasses.replace(C.micro_test(batch_size=8), table_dtype="int8")
    tables = ref.init_tables(cfg, scheme="pm1")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    idx, dense = _inputs(cfg, 8)
    want = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))

    path = os.path.join(tmp_path, "orbax_int8")
    fio.save_orbax(path, params, cfg=cfg)
    restored = fio.load_orbax(path, model, params)
    assert restored["tables"].onehot_scales is not None
    got = np.asarray(jax.jit(model.forward)(restored, jnp.asarray(idx), jnp.asarray(dense)))
    np.testing.assert_array_equal(got, want)


def test_orbax_sharded_roundtrip(tmp_path):
    """Save params placed on a (2,4) mesh, restore onto the same shardings
    — the multi-host checkpoint path (orbax handles per-shard layout)."""
    import os

    cfg = C.micro_test(batch_size=8, rows=512)
    tables = ref.init_tables(cfg, scheme="uniform")
    ws = ref.init_mlp_weights(cfg, scheme="uniform")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)

    path = os.path.join(tmp_path, "orbax_sharded")
    fio.save_orbax(path, sp, cfg=cfg)
    restored = fio.load_orbax(path, model, sp)

    idx, dense = _inputs(cfg, 8)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    want = np.asarray(sh.forward(sp, si, sd))
    got = np.asarray(sh.forward(restored, si, sd))
    np.testing.assert_array_equal(got, want)


def test_ingest_timeout_raises():
    """No senders connected: run_from_ingest must fail fast with a clear
    timeout, not wedge (the reference blocks forever in accept())."""
    import pytest as _pytest

    from fleetrec_tpu.serving import IngestServer, ServingEngine

    eng = ServingEngine(lambda i, d: i, num_tables=0, dense_dim=0, batch_size=4)
    with IngestServer([64], n_slots=2, port_base=27999) as ing:
        with _pytest.raises(TimeoutError):
            eng.run_from_ingest(ing, 1, mode="feature", feature_dim=4,
                                timeout_ms=200)


def test_multihost_helpers_single_process():
    from fleetrec_tpu.parallel.multihost import global_mesh, host_local_batch_to_global

    mesh = global_mesh(data=2, model=4)
    arr = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = host_local_batch_to_global(mesh, arr)
    assert g.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(g), arr)


def test_quantize_tables_matches_pack_int8_on_pm1():
    """quantize_tables(float params) must be BIT-IDENTICAL to packing the
    same tables directly at table_dtype=int8 (buffers and scales), incl.
    a striped layout — the float-train -> int8-serve workflow."""
    from fleetrec_tpu import io as fio

    cfg = dataclasses.replace(C.micro_test(batch_size=8), take_stripes=4,
                              onehot_max=70)  # mixed onehot/take split
    tables = ref.init_tables(cfg, scheme="pm1")
    model_f, params_f = init_model(cfg, tables_np=tables)
    qp = fio.quantize_tables(params_f, model_f)

    cfg8 = dataclasses.replace(cfg, table_dtype="int8")
    model_8, params_8 = init_model(cfg8, tables_np=tables)
    for a, b in zip(qp["tables"].onehot_buffers, params_8["tables"].onehot_buffers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(qp["tables"].take_buffer),
                                  np.asarray(params_8["tables"].take_buffer))
    for a, b in zip(qp["tables"].onehot_scales, params_8["tables"].onehot_scales):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(qp["tables"].take_scales),
                                  np.asarray(params_8["tables"].take_scales))


def test_float_train_then_quantized_serve_roundtrip(tmp_path):
    """Train on float tables, quantize, save, load into the int8 config,
    serve: scores bounded by the per-table quantization error."""
    import jax
    import jax.numpy as jnp

    from fleetrec_tpu import io as fio
    from fleetrec_tpu.models import FleetRecModel
    from fleetrec_tpu.models.train import Trainer

    cfg = C.micro_test(batch_size=32)
    model, params = init_model(cfg, table_scheme="uniform", mlp_scheme="uniform")
    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, t.rows, 32) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.uniform(-1, 1, (32, cfg.dense_dim)).astype(np.float32)
    labels = (dense[:, 0] > 0).astype(np.float32)
    tr = Trainer(model)
    params, _ = tr.fit(params, [(idx, dense, labels)] * 3)

    float_scores = np.asarray(jax.jit(model.forward)(
        params, jnp.asarray(idx), jnp.asarray(dense)))

    qp = fio.quantize_tables(params, model)
    cfg8 = dataclasses.replace(cfg, table_dtype="int8")
    model8 = FleetRecModel.create(cfg8)
    path = str(tmp_path / "q.npz")
    fio.save_npz(path, qp, cfg=cfg8)
    loaded = fio.load_npz(path, model8)
    q_scores = np.asarray(jax.jit(model8.forward)(
        loaded, jnp.asarray(idx), jnp.asarray(dense)))
    # per-element table error <= scale/2 <= 1/127-ish on unit-scale data;
    # propagated through the small MLP this stays a small absolute delta
    assert np.all(np.isfinite(q_scores))
    np.testing.assert_allclose(q_scores, float_scores, atol=0.35, rtol=0.1)

    # and the fingerprint guards against loading into the FLOAT config
    with pytest.raises(fio.ConfigMismatchError):
        fio.load_npz(path, model)


def test_quantize_tables_qr_config():
    """quantize_tables on a QR config must key segments off the INTERNAL
    spec tables (Q tables carry post-decomposition row counts; hidden R
    table ids are absent from cfg.tables — ADVICE r4: KeyError + wrong
    segment sizes when keyed off cfg.tables).  Mirror of
    test_quantize_tables_matches_pack_int8_on_pm1."""
    from fleetrec_tpu import io as fio

    # onehot_max=8 forces every internal table (incl. Q rows ~7-8 and
    # R rows 16) into the unified take buffer
    cfg = dataclasses.replace(C.micro_test(batch_size=8), onehot_max=8,
                              qr_threshold=100, qr_rem=16)
    cfg.validate()
    model_f, params_f = init_model(cfg)  # pm1 over the internal specs
    qp = fio.quantize_tables(params_f, model_f)

    cfg8 = dataclasses.replace(cfg, table_dtype="int8")
    model_8, params_8 = init_model(cfg8)
    np.testing.assert_array_equal(np.asarray(qp["tables"].take_buffer),
                                  np.asarray(params_8["tables"].take_buffer))
    np.testing.assert_array_equal(np.asarray(qp["tables"].take_scales),
                                  np.asarray(params_8["tables"].take_scales))
