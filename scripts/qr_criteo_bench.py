"""Committed QR-criteo artifact (SCALING.md "what closes the gap" #2).

Two parts, one chip session:
  1. CORRECTNESS at capped rows (2 M, threshold 1 M): the QR forward must
     BIT-EXACTLY equal a plain forward over tables materialized as
     full[i] = Q[i // rem] + R[i % rem] (pm1 Q/R data, ones weights —
     integer chain).  This is the QR semantics check at a size where the
     materialization is feasible.
  2. PERFORMANCE at FULL cardinality (1.655 B logical rows, qr_rem =
     131072): the whole table set fits one chip (largest Q = 7630 rows);
     scan-timed rate with a tunnel-health stamp.

Writes artifacts/QR_CRITEO.json.
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/qr_criteo_bench.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B, K = 4096, 16
QR_REM = 131072
QR_THRESHOLD = 1_000_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.config import qr_expand
    from fleetrec_tpu.models import init_model
    from fleetrec_tpu.utils.timing import DeviceBench
    from fleetrec_tpu.utils.tunnelhealth import probe

    # ---- 1. correctness, capped rows -----------------------------------
    cap = 2_000_000
    qcfg = C.criteo_terabyte(batch_size=256, qr_threshold=QR_THRESHOLD,
                             qr_rem=QR_REM)
    qcfg = dataclasses.replace(
        qcfg, tables=tuple(dataclasses.replace(t, rows=min(t.rows, cap))
                           for t in qcfg.tables))
    qmodel, qparams = init_model(qcfg, table_scheme="pm1", mlp_scheme="ones")
    tnp = [ref.init_table(t, scheme="pm1") for t in qmodel.spec_tables]
    internal, qpos, pairs = qr_expand(qcfg)
    byid = {t.table_id: i for i, t in enumerate(qmodel.spec_tables)}
    qa = {p: (d, s) for (p, _r), (d, s) in zip(qpos, pairs)}
    full = []
    for p, t in enumerate(qcfg.tables):
        if p in qa:
            d, s = qa[p]
            i = np.arange(t.rows)
            full.append((tnp[byid[d]][i // QR_REM]
                         + tnp[byid[s]][i % QR_REM]).astype(np.float32))
        else:
            full.append(tnp[byid[t.table_id]])
    pcfg = dataclasses.replace(qcfg, qr_threshold=0, qr_rem=0)
    pmodel, pparams = init_model(pcfg, tables_np=full, mlp_scheme="ones")
    rng = np.random.default_rng(3)
    ix = np.stack([rng.integers(0, t.rows, 256) for t in qcfg.tables], 1).astype(np.int32)
    dn = np.sign(rng.uniform(-1, 1, (256, qcfg.dense_dim))).astype(np.float32)
    a = np.asarray(jax.jit(qmodel.forward)(qparams, jnp.asarray(ix), jnp.asarray(dn)))
    b = np.asarray(jax.jit(pmodel.forward)(pparams, jnp.asarray(ix), jnp.asarray(dn)))
    bitexact = bool(np.array_equal(a, b))
    log(f"QR == materialized plain (rows capped {cap}): {bitexact}")
    assert bitexact, (a[:3], b[:3])
    del qmodel, qparams, pmodel, pparams, full, tnp

    # ---- 2. performance, full cardinality ------------------------------
    cfg = C.criteo_terabyte(batch_size=B, qr_threshold=QR_THRESHOLD,
                            qr_rem=QR_REM)
    t0 = time.time()
    model, params = init_model(cfg, table_scheme="pm1", mlp_scheme="ones")
    init_s = time.time() - t0
    n_spec = len(model.spec_tables)
    logical_rows = sum(t.rows for t in cfg.tables)
    packed_rows = sum(t.rows for t in model.spec_tables)
    log(f"full-cardinality init {init_s:.0f}s: {logical_rows/1e9:.3f}B "
        f"logical rows -> {n_spec} specs / {packed_rows/1e6:.2f}M packed rows")

    idx = jnp.asarray(np.stack(
        [rng.integers(0, t.rows, (K, B)) for t in cfg.tables], 2).astype(np.int64)
        .astype(np.int32))
    dense = jnp.asarray(rng.uniform(-1, 1, (K, B, cfg.dense_dim)).astype(np.float32))
    r = DeviceBench(lambda p, x: model.forward(p, x[0], x[1])).measure(
        params, (idx, dense))
    qps = B / (r["per_iter_ms"] / 1e3)
    health = probe()
    log(f"full-cardinality QR rate: {r['per_iter_ms']:.3f} ms/batch "
        f"-> {qps/1e6:.2f} M inf/s (rpc {health['rpc_ms']} ms)")

    art = {
        "what": "QR compressed embeddings on criteo_terabyte "
                "(qr_threshold=1M, qr_rem=131072): capped-row bit-exact "
                "equivalence vs the materialized-sum oracle + "
                "FULL-cardinality single-chip rate",
        "semantics_note": "QR is a compression (emb = Q[id//rem] + "
                          "R[id%rem]), NOT the reference's exact lookup; "
                          "opt-in, SCALING.md",
        "correctness_capped_2M_bitexact": bitexact,
        "full_cardinality": {
            "logical_rows": int(logical_rows),
            "packed_rows": int(packed_rows),
            "n_internal_tables": int(n_spec),
            "batch": B,
            "scan_K": K,
            "ms_per_batch": round(r["per_iter_ms"], 4),
            "inferences_per_sec": round(qps, 1),
            "fits_single_chip": True,
        },
        "tunnel_health": health,
    }
    out = os.path.join(REPO, "artifacts", "QR_CRITEO.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=2)
        f.write("\n")
    print(out)


if __name__ == "__main__":
    main()
