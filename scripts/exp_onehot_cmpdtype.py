"""Experiment: does an int16 compare cut the one-hot mask cost?

docs/DESIGN.md established the one-hot path is bound by B*n*rows_pad VPU
COMPARES (not the reduce: bf16 class buffers measured only 2.5%). The
compare operand dtype was never swept: TPU VPU lanes are 32-bit, but
Mosaic packs 16-bit ops 2/lane, so an int16 `idx == iota` could run ~2x.
Safe whenever rows_pad <= 32768 (iota max 32767 fits int16), which holds
for every tuned onehot_max (16384/32768). The mask values are exactly
0/1 either way, so the fp32 one-nonzero reduction stays bit-exact.

Measures a model2-like class ([16, 15000, 8] @ B=4096): compare dtype
{int32, int16} x buffer {f32, bf16}.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_onehot_cmpdtype.py
"""

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from fleetrec_tpu.utils.timing import DeviceBench

    B, K = 4096, 32
    n, R, d = 16, 15000, 8
    rng = np.random.default_rng(0)
    data = np.where(rng.integers(0, 2, (n, R, d)) > 0, 1.0, -1.0).astype(np.float32)
    idx32 = jnp.asarray(rng.integers(0, R, (K, B, n)).astype(np.int32))

    def onehot_step(cmp_dtype):
        def step(b, i):
            iota = jax.lax.broadcasted_iota(cmp_dtype, (R,), 0)
            oh = (i.astype(cmp_dtype)[..., None] == iota).astype(b.dtype)
            out = jax.lax.dot_general(
                oh, b, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.float32)
            return out.transpose(1, 0, 2).reshape(B, n * d)
        return step

    for cmp_dt in (jnp.int32, jnp.int16):
        for buf_dt in (jnp.float32, jnp.bfloat16):
            buf = jnp.asarray(data, dtype=buf_dt)
            r = DeviceBench(onehot_step(cmp_dt)).measure(buf, idx32)
            print(json.dumps({
                "cmp": str(jnp.dtype(cmp_dt)), "buf": str(jnp.dtype(buf_dt)),
                "ms_per_batch": round(r["per_iter_ms"], 3)}), flush=True)


if __name__ == "__main__":
    main()
