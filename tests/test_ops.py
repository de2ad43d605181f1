"""Pallas op tests (interpreter mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from fleetrec_tpu.config import MLPSpec
from fleetrec_tpu.models.mlp import init_mlp_params, mlp_apply
from fleetrec_tpu.ops import fused_mlp, fused_mlp_available


def test_fused_mlp_matches_xla_chain():
    spec = MLPSpec(input_dim=352, hidden=(1024, 512, 256))
    assert fused_mlp_available(spec.widths, jnp.float32)
    ws = init_mlp_params(spec, scheme="uniform", seed=3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (700, 352)).astype(np.float32))  # non-multiple of tile
    ref = np.asarray(jax.jit(lambda w, x: mlp_apply(w, x))(ws, x))
    out = np.asarray(jax.jit(lambda w, x: fused_mlp(w, x))(ws, x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fused_mlp_relu_and_parity_constant():
    spec = MLPSpec(input_dim=512, hidden=(1024, 512, 256))
    ws = init_mlp_params(spec, scheme="ones")
    x = jnp.ones((16, 512), jnp.float32)
    out = np.asarray(jax.jit(lambda w, x: fused_mlp(w, x))(ws, x))
    np.testing.assert_array_equal(out[:, 0], np.full(16, 68719476736.0, np.float32))
    # relu variant runs (values positive -> same result)
    out_r = np.asarray(jax.jit(lambda w, x: fused_mlp(w, x, activation="relu"))(ws, x))
    np.testing.assert_array_equal(out, out_r)


def test_pallas_gather_rows_matches_take():
    """Interpret-mode check of the Pallas DMA gather vs jnp.take (the
    production path); includes the pad-to-chunk remainder case."""
    import jax.numpy as jnp

    from fleetrec_tpu.ops.gather_pallas import gather_rows

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((4096, 128)).astype(np.float32))
    for n in (512, 700):  # multiple of chunk and a ragged tail
        idx = jnp.asarray(rng.integers(0, 4096, n).astype(np.int32))
        got = gather_rows(table, idx, chunk=256, window=4, interpret=True)
        want = jnp.take(table, idx, axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_gather_rows_grouped_matches_take():
    """Interpret-mode check of the grouped-DMA gather (DMAs land directly
    in the output block, one semaphore per group) vs jnp.take, including
    ragged tail and group/window clamping."""
    import jax.numpy as jnp

    from fleetrec_tpu.ops.gather_pallas import gather_rows_grouped

    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((4096, 128)).astype(np.float32))
    for n, chunk, group, window in ((512, 256, 8, 4), (700, 256, 8, 4),
                                    (256, 256, 16, 64), (96, 64, 5, 2)):
        idx = jnp.asarray(rng.integers(0, 4096, n).astype(np.int32))
        got = gather_rows_grouped(table, idx, chunk=chunk, group=group,
                                  window=window, interpret=True)
        want = jnp.take(table, idx, axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ici_bench_runs_on_mesh():
    from fleetrec_tpu.benchmarks import ici_bench
    from fleetrec_tpu.parallel import make_mesh

    r = ici_bench(make_mesh(1, 8), mbytes=2, iters=2)
    assert r["model_axis"] == 8
    for op in ("all_gather", "psum", "ppermute"):
        assert r[op]["GB_s"] > 0


def test_pm1_direct_pack_matches_pack_tables():
    """biginit.pm1_take_chunk / pack_pm1_sharded must write the SAME bytes
    as the materializing init path (reference.init_tables + pack_tables) —
    validated on a shrunken criteo geometry (striped, int8 and fp32) so
    the full-cardinality dryrun's generator is trustworthy."""
    import dataclasses

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.models.biginit import pack_pm1_sharded, pm1_take_chunk
    from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh

    for dtype in ("float32", "int8"):
        # factored tier off: the generator under test fills the striped
        # TAKE buffer, and the 4000-row shrink would otherwise push every
        # table into class buffers
        cfg = C.criteo_terabyte(batch_size=16, dtype="float32",
                                onehot_factor_max=0)
        cfg = dataclasses.replace(
            cfg,
            table_dtype=dtype,
            tables=tuple(dataclasses.replace(t, rows=min(t.rows, 4000))
                         for t in cfg.tables),
        )
        model, params = init_model(cfg, table_scheme="pm1")
        want_take = np.asarray(params["tables"].take_buffer)
        layout = model.layout
        # chunked direct generation, odd chunk size to cross boundaries
        got = np.concatenate([
            pm1_take_chunk(layout, cfg, lo, min(lo + 777, layout.take_phys_total),
                           want_take.dtype)
            for lo in range(0, layout.take_phys_total, 777)
        ])
        np.testing.assert_array_equal(got, want_take)

        # sharded construction end-to-end: same forward scores
        mesh = make_mesh(data=1, model=8)
        sh = ShardedFleetRec(model, mesh)
        packed = pack_pm1_sharded(cfg, layout, mesh)
        for a, b in zip(packed.onehot_buffers, params["tables"].onehot_buffers):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        sp_direct = sh.shard_params({**params, "tables": packed})
        sp_ref = sh.shard_params(params)
        rng = np.random.default_rng(0)
        idx = np.stack([rng.integers(0, t.rows, 16) for t in cfg.tables], 1).astype(np.int32)
        dense = rng.choice([-1.0, 1.0], (16, cfg.dense_dim)).astype(np.float32)
        si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
        np.testing.assert_array_equal(
            np.asarray(sh.forward(sp_direct, si, sd)),
            np.asarray(sh.forward(sp_ref, si, sd)),
        )


def test_factored_onehot_bitexact_all_paths():
    """Three-tier split (plain one-hot / factored hi-lo / take) must be
    bit-exact vs the float64 oracle in fp32, bf16-storage, and int8 modes,
    and equal to the two-tier (factored disabled) forward."""
    import dataclasses

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model

    B = 32
    base = C.micro_test(batch_size=B)
    # spread rows so all three tiers engage: micro_test tables get row
    # counts straddling onehot_max=64 and factor_max=1500
    rows = [40, 50, 300, 700, 900, 1400, 3000, 5000]
    tables = tuple(
        dataclasses.replace(t, rows=rows[i % len(rows)])
        for i, t in enumerate(base.tables)
    )
    # (bf16 storage exercises the same program but the CPU backend lacks
    # BF16xBF16=F32 dot thunks — bf16 parity is a chip-side check)
    for dtype, table_dtype in [("float32", "float32"),
                               ("float32", "int8")]:
        cfg = dataclasses.replace(
            base, tables=tables, dtype=dtype, table_dtype=table_dtype,
            onehot_max=64, onehot_factor_max=1500, onehot_r2=32)
        cfg.validate()
        data = ref.init_tables(cfg, scheme="pm1")
        ws = ref.init_mlp_weights(cfg, scheme="ones")
        model, params = init_model(cfg, tables_np=data, mlp_np=ws)
        lay = model.layout
        assert any(c.r2 for c in lay.onehot_classes), "factored tier unused"
        assert any(not c.r2 for c in lay.onehot_classes)
        assert lay.n_take > 0
        # r2 rounded so r2*dim is a lane multiple
        for c in lay.onehot_classes:
            if c.r2:
                assert (c.r2 * c.dim) % 128 == 0
                assert c.rows_pad % c.r2 == 0

        rng = np.random.default_rng(3)
        idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
        dense = rng.choice([-1.0, 1.0], (B, cfg.dense_dim)).astype(np.float32)
        out = np.asarray(jax.jit(model.forward)(
            params, jnp.asarray(idx), jnp.asarray(dense)), dtype=np.float64)
        golden = ref.forward(cfg, data, ws, idx, dense)
        assert np.array_equal(out.astype(np.float32),
                              golden.astype(np.float32)), (dtype, table_dtype)

        # two-tier (factored off) must agree bit-for-bit
        cfg2 = dataclasses.replace(cfg, onehot_factor_max=0)
        model2, params2 = init_model(cfg2, tables_np=data, mlp_np=ws)
        out2 = np.asarray(jax.jit(model2.forward)(
            params2, jnp.asarray(idx), jnp.asarray(dense)), dtype=np.float64)
        assert np.array_equal(out, out2), (dtype, table_dtype)


def test_factored_onehot_sharded_forward():
    """Factored classes replicate like plain one-hot classes; the sharded
    forward stays bit-identical to the single-device one on parity data."""
    import dataclasses

    from fleetrec_tpu import config as C
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.parallel import ShardedFleetRec, make_mesh

    B = 32
    base = C.micro_test(batch_size=B)
    cfg = dataclasses.replace(
        base,
        tables=tuple(dataclasses.replace(t, rows=200 + 150 * i)
                     for i, t in enumerate(base.tables)),
        onehot_max=64, onehot_factor_max=600, onehot_r2=32)
    cfg.validate()
    model, params = init_model(cfg)  # pm1 / ones
    rng = np.random.default_rng(5)
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = rng.integers(0, 3, (B, cfg.dense_dim)).astype(np.float32)
    single = np.asarray(jax.jit(model.forward)(
        params, jnp.asarray(idx), jnp.asarray(dense)))
    mesh = make_mesh(data=2, model=4)
    sh = ShardedFleetRec(model, mesh)
    sp = sh.shard_params(params)
    si, sd = sh.shard_batch(jnp.asarray(idx), jnp.asarray(dense))
    got = np.asarray(sh.forward(sp, si, sd))
    assert np.array_equal(got, single)


def test_factored_onehot_planner_no_lane_bloat():
    """Planner: factored class bytes have no 128/dim lane bloat."""
    import dataclasses

    from fleetrec_tpu import config as C
    from fleetrec_tpu.parallel import plan

    base = C.micro_test(batch_size=8)
    cfg = dataclasses.replace(
        base,
        tables=tuple(dataclasses.replace(t, rows=1000) for t in base.tables),
        onehot_max=64, onehot_factor_max=2000, onehot_r2=32)
    p_fact = plan(cfg, n_model=1)
    p_take = plan(dataclasses.replace(cfg, onehot_factor_max=0), n_model=1)
    # factored storage ~= logical bytes (r2*d minor dim); plain one-hot on
    # the same tables would pay 128/d; the take path pays none either — so
    # factored one-hot bytes should be within ~2x of take bytes for the
    # same tables, far below the 128/d-bloated plain class
    assert p_fact.onehot_bytes < 4 * p_take.take_bytes_total
