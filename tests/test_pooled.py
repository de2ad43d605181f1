"""Multi-hot pooled embedding bags (models/pooled.py) vs a float64 numpy
oracle — sum/mean pooling over padded [B, T, L] bags on the same packed
storage (beyond-reference capability; DLRM-style sparse multi-hot)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fleetrec_tpu import config as C
from fleetrec_tpu import reference as ref
from fleetrec_tpu.models import init_model
from fleetrec_tpu.models.pooled import forward_pooled

L = 4


def make_bags(cfg, B, seed=0, all_empty_row=None):
    """Random bags with random valid lengths in [1, L]; -1 padding."""
    rng = np.random.default_rng(seed)
    idx = np.full((B, cfg.num_tables, L), -1, np.int32)
    for j, t in enumerate(cfg.tables):
        lens = rng.integers(1, L + 1, B)
        for b in range(B):
            idx[b, j, : lens[b]] = rng.integers(0, t.rows, lens[b])
    if all_empty_row is not None:
        idx[all_empty_row, :, :] = -1
    dense = (rng.choice([-1.0, 1.0], (B, cfg.dense_dim)).astype(np.float32)
             if cfg.dense_dim else None)
    return idx, dense


def oracle(cfg, tables, weights, idx, dense, mean=False):
    """float64: per-table pooled embedding at its out_offset + dense tail
    -> MLP chain."""
    B = idx.shape[0]
    feats = np.zeros((B, cfg.feature_dim), np.float64)
    for j, t in enumerate(cfg.tables):
        pooled = np.zeros((B, t.dim), np.float64)
        cnt = np.zeros(B)
        for l in range(L):
            v = idx[:, j, l] >= 0
            pooled[v] += tables[j][idx[v, j, l]]
            cnt += v
        if mean:
            nz = cnt > 0
            pooled[nz] /= cnt[nz, None]
        feats[:, t.out_offset : t.out_offset + t.dim] = pooled
    if cfg.dense_dim:
        feats[:, cfg.feature_dim - cfg.dense_dim :] = dense
    return ref.mlp_chain(feats, weights, cfg.mlp.activation)[:, 0]


def mixed_cfg(**kw):
    # onehot_max=70: dims 4/8 split across plain one-hot AND take
    return dataclasses.replace(C.micro_test(batch_size=16), onehot_max=70,
                               **kw)


@pytest.mark.parametrize("mean", [False, True])
def test_pooled_matches_oracle_mixed_tiers(mean):
    cfg = mixed_cfg()
    tables = ref.init_tables(cfg, scheme="pm1")
    ws = ref.init_mlp_weights(cfg, scheme="ones")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    idx, dense = make_bags(cfg, 16, all_empty_row=5)

    out = np.asarray(jax.jit(
        lambda p, i, d: forward_pooled(model, p, i, d, mean=mean)
    )(params, jnp.asarray(idx), jnp.asarray(dense)))
    golden = oracle(cfg, tables, ws, idx, dense, mean=mean)
    if mean:
        np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-4)
    else:
        # pm1 sums are exact integers end to end
        np.testing.assert_array_equal(out, golden.astype(np.float32))


def test_pooled_factored_tier_and_int8():
    """Factored hi/lo classes take the unrolled-L path; int8 storage pools
    through the int32-exact accumulate + pow2 dequant."""
    cfg = dataclasses.replace(C.micro_test(batch_size=12), onehot_max=8,
                              onehot_factor_max=100, table_dtype="int8")
    tables = ref.init_tables(cfg, scheme="pm1")
    ws = ref.init_mlp_weights(cfg, scheme="ones")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    assert model.layout.onehot_classes and any(
        c.r2 for c in model.layout.onehot_classes)
    idx, dense = make_bags(cfg, 12, seed=3)
    out = np.asarray(jax.jit(
        lambda p, i, d: forward_pooled(model, p, i, d)
    )(params, jnp.asarray(idx), jnp.asarray(dense)))
    golden = oracle(cfg, tables, ws, idx, dense)
    np.testing.assert_array_equal(out, golden.astype(np.float32))


def test_pooled_L1_matches_single_id_forward():
    cfg = mixed_cfg()
    model, params = init_model(cfg)
    rng = np.random.default_rng(1)
    idx = np.stack([rng.integers(0, t.rows, 16) for t in cfg.tables],
                   1).astype(np.int32)
    dense = rng.uniform(-1, 1, (16, cfg.dense_dim)).astype(np.float32)
    single = np.asarray(jax.jit(model.forward)(
        params, jnp.asarray(idx), jnp.asarray(dense)))
    pooled = np.asarray(jax.jit(
        lambda p, i, d: forward_pooled(model, p, i, d)
    )(params, jnp.asarray(idx)[:, :, None], jnp.asarray(dense)))
    np.testing.assert_array_equal(pooled, single)


def test_pooled_qr_config():
    """QR configs derive Q/R columns per bag slot; pooling commutes with
    the linear QR sum."""
    cfg = dataclasses.replace(mixed_cfg(), qr_threshold=100, qr_rem=16)
    cfg.validate()
    tables_logical = ref.init_tables(
        dataclasses.replace(cfg, qr_threshold=0, qr_rem=0), scheme="pm1")
    ws = ref.init_mlp_weights(cfg, scheme="ones")
    model, params = init_model(cfg, mlp_np=ws)  # packs Q+R internally
    # logical oracle tables: materialize Q[i//rem] + R[i%rem]
    from fleetrec_tpu.config import qr_expand

    internal, qr_positions, _sum = qr_expand(cfg)
    qr_at = dict(qr_positions)
    mats = []
    for pos, spec in enumerate(cfg.tables):
        if pos in qr_at:
            rem = qr_at[pos]
            Q = ref.init_table(internal[pos], scheme="pm1")
            # R tables are appended in qr_positions order
            ridx = len(cfg.tables) + [p for p, _ in qr_positions].index(pos)
            R = ref.init_table(internal[ridx], scheme="pm1")
            i = np.arange(spec.rows)
            mats.append(Q[i // rem] + R[i % rem])
        else:
            mats.append(tables_logical[pos])
    idx, dense = make_bags(cfg, 16, seed=7)
    out = np.asarray(jax.jit(
        lambda p, i, d: forward_pooled(model, p, i, d)
    )(params, jnp.asarray(idx), jnp.asarray(dense)))
    golden = oracle(cfg, mats, ws, idx, dense)
    np.testing.assert_array_equal(out, golden.astype(np.float32))


def test_pooled_bad_id_nan_padding_ok():
    cfg = mixed_cfg()
    model, params = init_model(cfg)
    idx, dense = make_bags(cfg, 16, seed=2, all_empty_row=4)
    idx[7, -1, 0] = 1 << 28  # beyond the last (take) table's rows
    out = np.asarray(jax.jit(
        lambda p, i, d: forward_pooled(model, p, i, d)
    )(params, jnp.asarray(idx), jnp.asarray(dense)))
    assert np.isnan(out[7])
    good = np.ones(16, bool)
    good[7] = False
    assert np.all(np.isfinite(out[good]))  # padding alone never poisons


def test_pooled_data_parallel_gspmd():
    """The pooled forward is jittable under a data-sharded batch (tables
    replicated — GSPMD DP; the explicit model-sharded path is
    ShardedFleetRec.forward_pooled, tested below)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = mixed_cfg()
    model, params = init_model(cfg)
    idx, dense = make_bags(cfg, 16, seed=9)
    single = np.asarray(jax.jit(
        lambda p, i, d: forward_pooled(model, p, i, d)
    )(params, jnp.asarray(idx), jnp.asarray(dense)))

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    bspec = NamedSharding(mesh, P("data", None, None))
    dspec = NamedSharding(mesh, P("data", None))
    out = np.asarray(jax.jit(
        lambda p, i, d: forward_pooled(model, p, i, d)
    )(params, jax.device_put(jnp.asarray(idx), bspec),
      jax.device_put(jnp.asarray(dense), dspec)))
    np.testing.assert_allclose(out, single, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("data,model_ax,table_dtype,mean", [
    (2, 4, "float32", False),
    (1, 8, "float32", True),
    (2, 4, "int8", False),
])
def test_pooled_sharded_matches_single(data, model_ax, table_dtype, mean):
    """ShardedFleetRec.forward_pooled == the single-device pooled forward:
    partitioned classes pool only their local tables' bags, the take tier
    gathers its local row-range, one psum reassembles."""
    from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh

    cfg = mixed_cfg(table_dtype=table_dtype)
    model, params = init_model(cfg)
    idx, dense = make_bags(cfg, 16, seed=4, all_empty_row=2)
    single = np.asarray(jax.jit(
        lambda p, i, d: forward_pooled(model, p, i, d, mean=mean)
    )(params, jnp.asarray(idx), jnp.asarray(dense)))

    mesh = make_mesh(data=data, model=model_ax)
    sh = ShardedFleetRec(model, mesh)
    sparams = sh.shard_params(params)
    out = np.asarray(sh.forward_pooled(
        sparams, jnp.asarray(idx), jnp.asarray(dense), mean=mean))
    # mean pooling introduces 1/count divisions whose products accumulate
    # in different orders across shards (sum pooling on pm1 stays exact)
    tol = dict(rtol=1e-5, atol=1e-3) if mean else dict(rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(out, single, **tol)


def test_pooled_sharded_bad_id_nan():
    from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh

    cfg = mixed_cfg()
    model, params = init_model(cfg)
    idx, dense = make_bags(cfg, 16, seed=6)
    idx[3, -1, 1] = 1 << 28
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sparams = sh.shard_params(params)
    out = np.asarray(sh.forward_pooled(
        sparams, jnp.asarray(idx), jnp.asarray(dense)))
    assert np.isnan(out[3]) and np.isfinite(np.delete(out, 3)).all()


def test_pooled_engine_serving_e2e():
    """Pooled bags served end to end: TCP sender ships int32 [B, T, L]
    bags (+dense) -> ingest ring -> ServingEngine.from_model(bag_L=L)
    fused dispatch -> scores vs the float64 oracle; padding validated at
    the wire (-1 allowed, out-of-range rejected)."""
    import socket
    import threading

    from fleetrec_tpu.serving import IngestServer, ServingEngine

    cfg = mixed_cfg(batch_size=8)
    B, NB, FUSE = 8, 4, 2
    tables = ref.init_tables(cfg, scheme="pm1")
    ws = ref.init_mlp_weights(cfg, scheme="ones")
    model, params = init_model(cfg, tables_np=tables, mlp_np=ws)
    eng = ServingEngine.from_model(model, params, batch_size=B, fuse=FUSE,
                                   bag_L=L)
    eng.warmup()

    batches = [make_bags(cfg, B, seed=20 + k) for k in range(NB)]
    payloads = [idx.tobytes() + dense.tobytes() for idx, dense in batches]
    outs = {}
    nbytes = [B * (cfg.num_tables * L + cfg.dense_dim) * 4]
    with IngestServer(nbytes, n_slots=4, port_base=18740) as ing:
        def send():
            s = socket.create_connection(("127.0.0.1", 18740), timeout=5)
            for p in payloads:
                s.sendall(p)
            s.close()

        th = threading.Thread(target=send, daemon=True)
        th.start()
        summary = eng.run_from_ingest(
            ing, NB, mode="index",
            row_limits=[t.rows for t in cfg.tables],
            on_done=lambda bid, sc: outs.__setitem__(bid, np.asarray(sc)),
        )
        th.join(5)
    assert summary["fuse"] == FUSE and summary["wire_batches"] == NB
    flat = np.concatenate([outs[g].reshape(-1, B) for g in sorted(outs)])
    for k, (idx, dense) in enumerate(batches):
        golden = oracle(cfg, tables, ws, idx, dense)
        np.testing.assert_array_equal(flat[k], golden.astype(np.float32))


def test_pooled_engine_validates_bags():
    from fleetrec_tpu.serving import ServingEngine

    cfg = mixed_cfg(batch_size=8)
    model, params = init_model(cfg)
    eng = ServingEngine.from_model(model, params, batch_size=8, bag_L=L)
    idx, _ = make_bags(cfg, 8)
    eng.validate_indices(idx, [t.rows for t in cfg.tables])  # -1 padding OK
    idx[2, 1, 0] = cfg.tables[1].rows  # one past the end
    with pytest.raises(ValueError, match="bag index out of range"):
        eng.validate_indices(idx, [t.rows for t in cfg.tables])
