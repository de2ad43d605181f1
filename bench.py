"""Headline benchmark: single-chip inference throughput on FleetRec model-1.

Runs the fused lookup+concat+MLP program (full 47-table model-1 geometry,
real row counts, fp32 parity mode) on the attached TPU chip and reports
inferences/sec. Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the only end-to-end rate recoverable from reference artifacts —
the committed FIFO measurement rig sustained a 512-query batch every
5.772 ms through its network->GPU path (GPU/measure_network_cuda_cp_latency_
single_node/memcpy_result), i.e. 88,703 inferences/s. vs_baseline is
ours / that.

Measurement method: the tunneled single-chip setup's completion events are
asynchronous (block_until_ready can return before device completion), so
per-call host timing is unreliable. We instead scan the forward over K
device-resident index batches inside ONE compiled program and force
completion with a scalar readback; wall/K is the per-batch device time.
This is also the shape of the production dispatch loop (no per-batch host
round trip). Diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fleetrec_tpu import config as C
    from fleetrec_tpu import reference as ref
    from fleetrec_tpu.models import init_model

    BATCH = 4096
    K = 64  # batches per timed program
    cfg = C.fleetrec_model1(batch_size=BATCH)
    log(f"building {cfg.name}: {cfg.num_tables} tables, {cfg.table_bytes/1e9:.2f} GB")
    t0 = time.time()
    tables = ref.init_tables(cfg, scheme="pm1")
    model, params = init_model(cfg, tables_np=tables)
    log(f"init+pack: {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    idx_np = np.stack(
        [rng.integers(0, t.rows, size=(K, BATCH)) for t in cfg.tables], axis=2
    ).astype(np.int32)  # [K, B, T]
    idx = jnp.asarray(idx_np)

    @jax.jit
    def run_k(params, idx_k):
        def step(carry, ib):
            s = model.forward(params, ib, None)
            # combine so nothing is dead-code eliminated; sum is exact for
            # the parity data (integers)
            return carry + jnp.sum(s, dtype=jnp.float64), s[:4]
        total, heads = jax.lax.scan(step, jnp.float64(0.0), idx_k)
        return total, heads

    # single-batch parity check first
    fwd = jax.jit(model.forward)
    out_head = np.asarray(fwd(params, idx[0], None)[:64])
    golden = ref.forward(cfg, tables, ref.init_mlp_weights(cfg, "ones"), idx_np[0], None)
    assert np.array_equal(out_head, golden[:64].astype(np.float32)), "parity check failed"
    log("parity spot-check (64 rows): bit-exact")

    t0 = time.time()
    total, heads = run_k(params, idx)
    tot = float(total)  # readback forces completion
    log(f"compile+first K-run: {time.time()-t0:.1f}s (sum={tot:.3e})")

    times = []
    for rep in range(3):
        t0 = time.time()
        total, _ = run_k(params, idx)
        float(total)
        times.append(time.time() - t0)
    dt = min(times)
    per_batch_ms = dt / K * 1e3
    qps = K * BATCH / dt
    log(
        f"device: {dt*1e3:.1f} ms for {K} x {BATCH} => {per_batch_ms:.3f} ms/batch, "
        f"{qps/1e6:.3f} M inf/s (reps: {[f'{t*1e3:.0f}ms' for t in times]})"
    )

    baseline = 512 / 5.772618e-3  # reference memcpy_result rig
    print(
        json.dumps(
            {
                "metric": "model1_inferences_per_sec_single_chip",
                "value": round(qps, 1),
                "unit": "inferences/s",
                "vs_baseline": round(qps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
