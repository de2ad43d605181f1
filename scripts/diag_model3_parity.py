"""Diagnose WHY model3 (fp32!) and criteo report rtol<1e-2 instead of
bitexact in bench.py's parity spot-check on the chip (VERDICT r2 weak #2 /
ADVICE r2 medium).  Both are bit-exact on the CPU backend, so the defect is
chip-side; this isolates the stage:

  1. lookup stage: lookup_concat output vs the float64 oracle's feature
     vector (gather/extraction wrongness shows here);
  2. mlp stage: the jitted MLP chain on the ORACLE feature vector vs the
     float64 chain (MXU operand-truncation shows here);
  3. end to end (what bench.py checks).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/diag_model3_parity.py
Prints one JSON line per config to stdout, progress to stderr.
"""

import dataclasses
import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def diag(name, dtype_kw, cap):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.models.embedding import lookup_concat

    B = 64
    cfg = C.get_config(name, batch_size=B, **dtype_kw)
    if cap:
        cfg = dataclasses.replace(
            cfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, cap))
                              for t in cfg.tables))
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables)
    log(f"[{name}] packed ({cfg.table_bytes/1e9:.2f} GB)")

    rng = np.random.default_rng(0)
    idx = np.stack([rng.integers(0, t.rows, B) for t in cfg.tables], 1).astype(np.int32)
    dense = (rng.choice([-1.0, 1.0], (B, cfg.dense_dim)).astype(np.float32)
             if cfg.dense_dim else None)

    feats_oracle = ref.gather_concat(cfg, tables, idx, dense)  # float64

    # stage 1: lookup only
    perm = jnp.asarray(np.asarray(model.index_perm), dtype=jnp.int32)

    @jax.jit
    def lk(p, i, d):
        return lookup_concat(p["tables"], i[:, perm], d)

    feats_dev = np.asarray(
        lk(params, jnp.asarray(idx),
           None if dense is None else jnp.asarray(dense)), dtype=np.float64)
    lk_exact = bool(np.array_equal(feats_dev.astype(np.float32),
                                   feats_oracle.astype(np.float32)))
    lk_err = float(np.max(np.abs(feats_dev - feats_oracle)))
    n_bad = int(np.sum(feats_dev.astype(np.float32)
                       != feats_oracle.astype(np.float32)))
    log(f"[{name}] lookup: exact={lk_exact} max_abs_err={lk_err} "
        f"bad_elems={n_bad}/{feats_dev.size}")
    bad_detail = None
    if not lk_exact:
        bb, ff = np.argwhere(feats_dev.astype(np.float32)
                             != feats_oracle.astype(np.float32))[0]
        bad_detail = {"batch_row": int(bb), "feature_col": int(ff),
                      "got": float(feats_dev[bb, ff]),
                      "want": float(feats_oracle[bb, ff])}
        log(f"[{name}] first bad: {bad_detail}")

    # stage 2: MLP on the oracle features
    from fleetrec_tpu.models.mlp import mlp_apply

    @jax.jit
    def ml(p, x):
        return mlp_apply(p["mlp"], x, activation=cfg.mlp.activation,
                         precision=cfg.matmul_precision)[:, 0]

    x_dev = jnp.asarray(feats_oracle.astype(np.float32)).astype(jnp.dtype(cfg.dtype))
    s_dev = np.asarray(ml(params, x_dev), dtype=np.float64)
    golden = ref.mlp_chain(feats_oracle, ref.init_mlp_weights(cfg, "ones"),
                           cfg.mlp.activation)[:, 0]
    mlp_exact = bool(np.array_equal(s_dev.astype(np.float32),
                                    golden.astype(np.float32)))
    mlp_err = float(np.max(np.abs(s_dev - golden) / (np.abs(golden) + 1e-30)))
    log(f"[{name}] mlp-on-oracle-feats: exact={mlp_exact} max_rel={mlp_err:.3e}")

    # stage 3: end to end (bench.py's check)
    fwd = jax.jit(model.forward)
    out = np.asarray(
        fwd(params, jnp.asarray(idx),
            None if dense is None else jnp.asarray(dense)), dtype=np.float64)
    e2e_exact = bool(np.array_equal(out.astype(np.float32),
                                    golden.astype(np.float32)))
    e2e_err = float(np.max(np.abs(out - golden) / (np.abs(golden) + 1e-30)))
    log(f"[{name}] e2e: exact={e2e_exact} max_rel={e2e_err:.3e} "
        f"out[:3]={out[:3]} golden[:3]={golden[:3]}")

    print(json.dumps({
        "config": name, "dtype": cfg.dtype, "table_dtype": cfg.table_dtype,
        "lookup_exact": lk_exact, "lookup_max_abs_err": lk_err,
        "lookup_bad_elems": n_bad, "lookup_first_bad": bad_detail,
        "mlp_on_oracle_exact": mlp_exact, "mlp_on_oracle_max_rel": mlp_err,
        "e2e_exact": e2e_exact, "e2e_max_rel": e2e_err,
    }), flush=True)


def main():
    diag("fleetrec_model3", {}, 1_000_000)
    diag("criteo_terabyte", {"dtype": "bfloat16"}, 4_000_000)


if __name__ == "__main__":
    main()
