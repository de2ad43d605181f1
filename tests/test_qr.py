"""QR compressed embeddings (config.qr_threshold/qr_rem — the opt-in,
beyond-reference compression that removes criteo's forced model sharding,
SCALING.md).  Correctness convention: a QR model must score IDENTICALLY
to a plain model whose big tables are materialized as
full[i] = Q[i // rem] + R[i % rem]."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fleetrec_tpu import config as C
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import FleetRecModel, init_model
from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh


def qr_cfg(B=32, rem=16, threshold=100):
    """micro_test geometry with QR on: tables above `threshold` rows
    (the last few of micro_test's 64..120-row ladder) decompose."""
    base = C.micro_test(batch_size=B)
    cfg = dataclasses.replace(base, qr_threshold=threshold, qr_rem=rem)
    cfg.validate()
    return cfg


def materialized_equivalent(cfg, model, tables_np):
    """Plain (QR-off) config + table data where each QR'd table is the
    materialized sum full[i] = Q[i//rem] + R[i%rem]."""
    plain = dataclasses.replace(cfg, qr_threshold=0, qr_rem=0)
    spec_by_id = {t.table_id: i for i, t in enumerate(model.spec_tables)}
    # config position -> (Q array, R array) via qr_positions order
    from fleetrec_tpu.config import qr_expand

    internal, qr_positions, sum_pairs = qr_expand(cfg)
    full_tables = []
    qr_at = {pos: (dst, src) for (pos, _rem), (dst, src) in
             zip(qr_positions, sum_pairs)}
    for pos, t in enumerate(cfg.tables):
        if pos in qr_at:
            dst, src = qr_at[pos]
            Q = tables_np[spec_by_id[dst]]
            R = tables_np[spec_by_id[src]]
            i = np.arange(t.rows)
            full = Q[i // cfg.qr_rem] + R[i % cfg.qr_rem]
            full_tables.append(full.astype(np.float32))
        else:
            full_tables.append(tables_np[spec_by_id[t.table_id]])
    return plain, full_tables


def test_qr_expand_shapes():
    cfg = qr_cfg(rem=16, threshold=100)
    from fleetrec_tpu.config import qr_expand

    internal, qr_positions, sum_pairs = qr_expand(cfg)
    n_qr = sum(1 for t in cfg.tables if t.rows > 100)
    assert n_qr >= 2  # micro_test has 104/112/120-row tables
    assert len(internal) == len(cfg.tables) + n_qr
    assert len(qr_positions) == len(sum_pairs) == n_qr
    for (pos, rem), (dst, src) in zip(qr_positions, sum_pairs):
        t = cfg.tables[pos]
        q = next(s for s in internal if s.table_id == dst)
        r = next(s for s in internal if s.table_id == src)
        assert q.rows == -(-t.rows // rem) and r.rows == rem
        assert q.out_offset == r.out_offset == t.out_offset


@pytest.mark.parametrize("rem,onehot_max", [(16, 2048), (16, 8), (32, 70)])
def test_qr_matches_materialized_plain_model(rem, onehot_max):
    """QR forward == plain forward on the materialized sum tables,
    bit-exact (pm1 Q/R data: sums are small integers, ones weights).
    onehot_max variants put Q/R in one-hot vs take tiers."""
    cfg = dataclasses.replace(qr_cfg(rem=rem), onehot_max=onehot_max)
    model, params = init_model(cfg, table_scheme="pm1", mlp_scheme="ones")
    tables_np = [ref.init_table(t, scheme="pm1") for t in model.spec_tables]

    plain_cfg, full_tables = materialized_equivalent(cfg, model, tables_np)
    plain_model, plain_params = init_model(
        plain_cfg, tables_np=full_tables, mlp_scheme="ones")

    rng = np.random.default_rng(0)
    B = cfg.batch_size
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = np.sign(rng.uniform(-1, 1, (B, cfg.dense_dim))).astype(np.float32)

    qr_scores = np.asarray(jax.jit(model.forward)(
        params, jnp.asarray(idx), jnp.asarray(dense)))
    plain_scores = np.asarray(jax.jit(plain_model.forward)(
        plain_params, jnp.asarray(idx), jnp.asarray(dense)))
    np.testing.assert_array_equal(qr_scores, plain_scores)


@pytest.mark.parametrize("data,model_ax", [(1, 8), (2, 4)])
def test_qr_sharded_matches_single(data, model_ax):
    """QR model through the shard_map forward (Q/R rows row-sharded, sums
    applied to per-shard partials pre-psum): bit-exact vs single device."""
    cfg = qr_cfg(rem=16)
    model, params = init_model(cfg, table_scheme="pm1", mlp_scheme="ones")
    rng = np.random.default_rng(1)
    B = cfg.batch_size
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = np.sign(rng.uniform(-1, 1, (B, cfg.dense_dim))).astype(np.float32)
    single = np.asarray(jax.jit(model.forward)(
        params, jnp.asarray(idx), jnp.asarray(dense)))

    mesh = make_mesh(data=data, model=model_ax)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    out = np.asarray(sh.forward(sp, si, sd))
    np.testing.assert_array_equal(out, single)


def test_qr_criteo_fits_single_chip():
    """The point of QR: full-cardinality criteo with the giants decomposed
    fits ONE chip (no forced model sharding -> pure DP, SCALING.md)."""
    from fleetrec_tpu.parallel import planner

    cfg = C.criteo_terabyte(batch_size=4096, qr_threshold=1_000_000,
                            qr_rem=131072)
    p = planner.plan(cfg, n_model=1)
    assert p.fits, (p.per_chip_bytes, p.hbm_budget_bytes)
    assert p.min_model_shards == 1
    # vs the exact config, which forces model sharding in bf16
    p0 = planner.plan(C.criteo_terabyte(batch_size=4096), n_model=1)
    assert not p0.fits


def test_qr_fingerprint_differs():
    from fleetrec_tpu import io as fio

    a = fio.config_fingerprint(C.criteo_terabyte())
    b = fio.config_fingerprint(
        C.criteo_terabyte(qr_threshold=1_000_000, qr_rem=131072))
    assert a != b


def test_qr_checkpoint_roundtrip(tmp_path):
    from fleetrec_tpu import io as fio

    cfg = qr_cfg(rem=16)
    model, params = init_model(cfg, table_scheme="pm1", mlp_scheme="ones")
    path = str(tmp_path / "qr.npz")
    fio.save_npz(path, params, cfg=cfg)
    loaded = fio.load_npz(path, model)
    rng = np.random.default_rng(2)
    B = cfg.batch_size
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = np.ones((B, cfg.dense_dim), np.float32)
    a = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    b = np.asarray(jax.jit(model.forward)(loaded, jnp.asarray(idx), jnp.asarray(dense)))
    np.testing.assert_array_equal(a, b)


def test_qr_dot_interaction_matches_materialized():
    """QR under the DLRM dot-interaction head: the emb path applies the
    Q+R sums before the offset-order gather the head consumes, so the QR
    model must equal the plain model on materialized sum tables."""
    base = C.micro_dlrm(batch_size=16)
    cfg = dataclasses.replace(base, qr_threshold=70, qr_rem=8)
    cfg.validate()
    model, params = init_model(cfg, table_scheme="pm1", mlp_scheme="ones")
    tables_np = [ref.init_table(t, scheme="pm1") for t in model.spec_tables]
    plain_cfg, full_tables = materialized_equivalent(cfg, model, tables_np)
    pmodel, pparams = init_model(plain_cfg, tables_np=full_tables,
                                 mlp_scheme="ones")
    rng = np.random.default_rng(5)
    B = cfg.batch_size
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = np.sign(rng.uniform(-1, 1, (B, cfg.dense_dim))).astype(np.float32)
    a = np.asarray(jax.jit(model.forward)(params, jnp.asarray(idx), jnp.asarray(dense)))
    b = np.asarray(jax.jit(pmodel.forward)(pparams, jnp.asarray(idx), jnp.asarray(dense)))
    np.testing.assert_array_equal(a, b)


def test_qr_serving_engine_end_to_end():
    """QR config through the real TCP serving tier (3-sender index mode):
    the wire carries CONFIG-order indices (the QR expansion is internal to
    the forward); engine scores must equal the jitted QR forward."""
    import socket
    import threading

    import fleetrec_tpu as fr
    from fleetrec_tpu.serving import IndexWireFormat, IngestServer, ServingEngine

    PORT = 17690
    cfg = qr_cfg(B=8, rem=16, threshold=100)
    B, NB = 8, 4
    model, params = init_model(cfg, table_scheme="pm1", mlp_scheme="ones")
    eng = ServingEngine.from_model(model, params, batch_size=B)
    wire = IndexWireFormat.plan(cfg, B, 3)

    rng = np.random.default_rng(6)
    batches = []
    for _ in range(NB):
        idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
        dense = np.sign(rng.uniform(-1, 1, (B, cfg.dense_dim))).astype(np.float32)
        batches.append((idx, dense))
    streams = [b"" for _ in range(3)]
    for idx, dense in batches:
        for s, p in enumerate(wire.payloads(idx, dense)):
            streams[s] += p

    outs = {}
    with IngestServer(wire.bytes_per_sender(), n_slots=4, port_base=PORT) as ing:
        def send(s):
            sock = socket.create_connection(("127.0.0.1", PORT + s), timeout=5)
            sock.sendall(streams[s])
            sock.close()

        ths = [threading.Thread(target=send, args=(s,), daemon=True) for s in range(3)]
        for t in ths:
            t.start()
        summary = eng.run_from_ingest(
            ing, NB, mode="index", wire=wire,
            row_limits=[t.rows for t in cfg.tables],
            on_done=lambda bid, sc: outs.__setitem__(bid, sc),
        )
        for t in ths:
            t.join(5)
    assert summary["batches"] == NB
    for b, (idx, dense) in enumerate(batches):
        want = np.asarray(jax.jit(model.forward)(
            params, jnp.asarray(idx), jnp.asarray(dense)))
        np.testing.assert_array_equal(outs[b], want)
