"""Chip: two-K rate for the pooled bag forward (model1 geometry, L=4)."""
import dataclasses, json, time
import numpy as np
from fleetrec_tpu import config as C
from fleetrec_tpu.models import init_model
from fleetrec_tpu.models.pooled import forward_pooled
from fleetrec_tpu.utils.timing import DeviceBench
from fleetrec_tpu.utils.tunnelhealth import probe

B, K, L = 4096, 16, 4
cfg = C.fleetrec_model1(batch_size=B)
model, params = init_model(cfg)
rng = np.random.default_rng(0)
idx = np.stack([rng.integers(0, t.rows, (K, B, L)) for t in cfg.tables], 2).astype(np.int32)
# random padding: ~25% slots empty, at least one valid
mask = rng.uniform(size=idx.shape) < 0.25
mask[..., 0] = False
idx = np.where(mask, -1, idx)
import jax.numpy as jnp
r = DeviceBench(lambda p, x: forward_pooled(model, p, x, None)).measure_corrected(
    params, jnp.asarray(idx))
out = {"config": "fleetrec_model1_pooled", "batch": B, "bag_L": L, "scan_K": K,
       "ms_per_batch": round(r["per_iter_ms"], 4),
       "inferences_per_sec": round(B / (r["per_iter_ms"] / 1e3), 1),
       "raw_scan_ms": round(r["raw_per_iter_ms"], 4),
       "percall_const_ms": round(r["percall_const_ms"], 2),
       "method": "two-K differencing", "tunnel_health": probe()}
print(json.dumps(out))
