"""Experiment: does a bf16 one-hot class buffer cut the mask/reduce cost?

The one-hot path costs ~B*n*rows_pad (docs/DESIGN.md). The int32 compare
can't get cheaper, but if the masked REDUCTION is the bottleneck, bf16
operands halve it (and stay bit-exact for the ±1 parity data). Measures a
model2-like class ([16, 15000, 8] @ B=4096) in f32 vs bf16 storage.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/exp_onehot_dtype.py
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
    idx = jnp.asarray(rng.integers(0, R, (K, B, n)).astype(np.int32))

    def onehot_step(buf):
        def step(b, i):
            iota = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
            oh = (i[..., None] == iota).astype(b.dtype)  # [B, n, R]
            out = jax.lax.dot_general(
                oh, b, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.float32)
            return out.transpose(1, 0, 2).reshape(B, n * d)
        return step

    for dt in (jnp.float32, jnp.bfloat16):
        buf = jnp.asarray(data, dtype=dt)
        r = DeviceBench(onehot_step(buf)).measure(buf, idx)
        print(json.dumps({"dtype": str(jnp.dtype(dt)),
                          "ms_per_batch": round(r["per_iter_ms"], 3)}),
              flush=True)


if __name__ == "__main__":
    main()
