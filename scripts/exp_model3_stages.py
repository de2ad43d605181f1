"""model3 per-stage split + factored-tier re-sweep under int8 tables
(VERDICT r3 #3): where do the ~15 ms/batch go, and are the r3 factored
thresholds (tuned under fp32) still right for the int8 default?

Stages measured on the same packed params (DeviceBench scan, K=8):
  take      — the unified-buffer row gather alone (phys address + take)
  extract   — gather + mask-einsum sub-row extraction (take path complete)
  onehot    — the one-hot + factored class lookups alone
  lookup    — full lookup_concat (both paths + feature permutation)
  mlp       — the 4-matmul tower alone on a feature-shaped input
  e2e       — the fused forward

Sweep: same-process relative comparisons (r3 convention: same-window
K=8), winner re-confirmed fresh by `cli bench`.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_model3_stages.py
"""

import dataclasses
import json
import sys
import time

import numpy as np

CAP = 1_000_000
B, K = 4096, 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(cfg, tables):
    from fleetrec_tpu.models import init_model

    t0 = time.time()
    model, params = init_model(cfg, tables_np=tables)
    log(f"  pack {time.time()-t0:.0f}s")
    return model, params


def measure_stages(model, params, cfg):
    import jax
    import jax.numpy as jnp

    from fleetrec_tpu.models.embedding import (
        _onehot_lookup, lookup_concat, take_phys_sub)
    from fleetrec_tpu.utils.timing import DeviceBench

    layout = model.layout
    rng = np.random.default_rng(0)
    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.rows, (K, B)) for t in cfg.tables], 2
    ).astype(np.int32))
    dense = jnp.asarray(
        rng.choice([-1.0, 1.0], (K, B, cfg.dense_dim)).astype(np.float32))
    perm = jnp.asarray(np.asarray(model.index_perm), dtype=jnp.int32)
    n_oh = layout.n_onehot
    n_take = layout.n_take

    def plan_idx(x):
        return x[:, perm]

    def take_only(p, x):
        tidx = jax.lax.slice_in_dim(plan_idx(x), n_oh, n_oh + n_take, axis=1)
        phys, _sub = take_phys_sub(layout, tidx)
        return jnp.take(p["tables"].take_buffer, phys.reshape(-1), axis=0)

    def extract(p, x):
        # gather + mask-einsum extraction: the take path complete.  Uses
        # lookup_concat internals shape-for-shape by zeroing the one-hot
        # columns' work via a take-only layout would change the program, so
        # instead run the real take branch inline.
        pt = p["tables"]
        gi = plan_idx(x)
        tidx = jax.lax.slice_in_dim(gi, n_oh, n_oh + n_take, axis=1)
        phys, sub = take_phys_sub(layout, tidx)
        rows = jnp.take(pt.take_buffer, phys.reshape(-1), axis=0)
        rows = rows.reshape(B, n_take, layout.take_lanes)
        tq = pt.take_buffer.dtype == jnp.int8
        outs = []
        kk = 0
        for g in layout.take_groups:
            ng, s, d = g.num_tables, g.rows_per_phys, g.dim
            r = jax.lax.slice_in_dim(rows, kk, kk + ng, axis=1).reshape(B, ng, s, d)
            sb = jax.lax.slice_in_dim(sub, kk, kk + ng, axis=1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (s,), 0)
            if tq:
                m = (sb[..., None] == iota).astype(jnp.int32)
                e = jnp.einsum("bnsd,bns->bnd", r.astype(jnp.int32), m)
                sc = jax.lax.slice_in_dim(pt.take_scales, kk, kk + ng)
                e = e.astype(jnp.float32) * sc[None, :, None]
            else:
                m = (sb[..., None] == iota).astype(r.dtype)
                e = jnp.einsum("bnsd,bns->bnd", r, m)
            outs.append(e.reshape(B, ng * d))
            kk += ng
        return jnp.concatenate(outs, axis=1)

    def onehot_only(p, x):
        pt = p["tables"]
        gi = plan_idx(x)
        quant = pt.onehot_scales is not None
        outs = []
        k = 0
        for i, (c, buf) in enumerate(zip(layout.onehot_classes, pt.onehot_buffers)):
            gic = jax.lax.slice_in_dim(gi, k, k + c.num_tables, axis=1)
            outs.append(_onehot_lookup(
                buf, c, gic, pt.onehot_scales[i] if quant else None))
            k += c.num_tables
        return jnp.concatenate(outs, axis=1)

    def lookup_full(p, x):
        return lookup_concat(p["tables"], plan_idx(x[0]), x[1])

    def mlp_only(p, x):
        from fleetrec_tpu.models.mlp import mlp_apply

        return mlp_apply(p["mlp"], x, precision=cfg.matmul_precision)

    def e2e(p, x):
        return model.forward(p, x[0], x[1])

    from fleetrec_tpu.utils.timing import DeviceBench  # noqa: F811

    feats = jnp.asarray(
        rng.uniform(-1, 1, (K, B, cfg.feature_dim)).astype(np.float32)
    ).astype(jnp.dtype(cfg.dtype))

    out = {}
    for name, fn, xs in (
        ("e2e", e2e, (idx, dense)),
        ("lookup", lookup_full, (idx, dense)),
        ("take", take_only, idx),
        ("extract", extract, idx),
        ("onehot", onehot_only, idx),
        ("mlp", mlp_only, feats),
    ):
        # r5: two-K differencing — the r4 absolutes carried ~rpc/K of
        # per-call tunnel smear (utils/timing.measure_corrected)
        r = DeviceBench(fn).measure_corrected(params, xs)
        out[name] = round(r["per_iter_ms"], 3)
        log(f"  {name}: {r['per_iter_ms']:.3f} ms "
            f"(raw {r['raw_per_iter_ms']:.3f}, const {r['percall_const_ms']:.1f})")
    return out


def main():
    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref

    # base: the int8 serving default
    cfg0 = C.fleetrec_model3(batch_size=B)
    cfg0 = dataclasses.replace(
        cfg0, tables=tuple(dataclasses.replace(t, rows=min(t.rows, CAP))
                           for t in cfg0.tables))
    t0 = time.time()
    tables = ref.init_tables(cfg0, scheme="pm1")
    log(f"init_tables {time.time()-t0:.0f}s")

    log("=== stage split (int8 default: factor 131072, r2 16) ===")
    model, params = build(cfg0, tables)
    stages = measure_stages(model, params, cfg0)
    print(json.dumps({"exp": "stages", "config": "model3_int8_default",
                      **stages}), flush=True)
    del model, params
    if "--stages-only" in sys.argv:
        return

    log("=== factored re-sweep under int8 (same-process, relative) ===")
    sweep = []
    for fmax, r2 in ((131072, 16), (131072, 8), (131072, 32),
                     (262144, 16), (65536, 16), (0, 16)):
        cfg = dataclasses.replace(cfg0, onehot_factor_max=fmax, onehot_r2=r2)
        m, p = build(cfg, tables)
        import jax.numpy as jnp  # noqa: F401

        from fleetrec_tpu.utils.timing import DeviceBench
        import jax

        rng = np.random.default_rng(0)
        idx = np.stack([rng.integers(0, t.rows, (K, B)) for t in cfg.tables],
                       2).astype(np.int32)
        import jax.numpy as jnp

        idxj = jnp.asarray(idx)
        dense = jnp.asarray(
            rng.choice([-1.0, 1.0], (K, B, cfg.dense_dim)).astype(np.float32))
        r = DeviceBench(lambda pp, x: m.forward(pp, x[0], x[1])).measure(
            p, (idxj, dense))
        row = {"exp": "sweep", "factor_max": fmax, "r2": r2,
               "ms_per_batch": round(r["per_iter_ms"], 3)}
        sweep.append(row)
        log(f"  factor={fmax} r2={r2}: {r['per_iter_ms']:.3f} ms")
        print(json.dumps(row), flush=True)
        del m, p
    best = min(sweep, key=lambda r: r["ms_per_batch"])
    print(json.dumps({"exp": "sweep_best", **best}), flush=True)


if __name__ == "__main__":
    main()
