"""Parameter save/load — the table-loading path the reference lacks
(its hosts synthesize tables at startup and keep nothing on disk,
host.cpp:282-718; SURVEY §5 flags the gap).

Formats:
  * npz  — single-file, host-memory sized models (dev/test).
  * orbax — sharded checkpoint directory for multi-host scale (tables are
    saved with their shardings; restore re-shards onto the current mesh).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import jax
import numpy as np


def config_fingerprint(cfg) -> str:
    """Deterministic hash of everything that shapes the packed parameter
    buffers (table geometry, feature layout, MLP widths, dtypes).  Stored
    with checkpoints so a load against the wrong geometry fails fast with
    a clear error instead of a shape mismatch (or worse, a silent
    wrong-offset gather — the reference has no checkpointing at all and
    re-synthesizes tables per run, host.cpp:282-718)."""
    blob = {
        "tables": [
            [t.table_id, t.rows, t.dim, t.out_offset] for t in cfg.tables
        ],
        "mlp": list(cfg.mlp.widths),
        "use_bias": cfg.mlp.use_bias,
        "activation": cfg.mlp.activation,
        "dense_dim": cfg.dense_dim,
        "dtype": cfg.dtype,
        "table_dtype": cfg.table_dtype,
        "take_lanes": cfg.take_lanes,
        # both change the packed-buffer layout (onehot/take split; striped
        # vs contiguous row placement) without necessarily changing buffer
        # SHAPES — a load across them would silently gather wrong rows
        "onehot_max": cfg.onehot_max,
        "take_stripes": cfg.take_stripes,
    }
    if getattr(cfg, "qr_rem", 0):
        # QR decomposition changes the packed-buffer set (Q + hidden R
        # tables); keyed conditionally so pre-QR fingerprints are unchanged
        blob["qr"] = [cfg.qr_threshold, cfg.qr_rem]
    # Interaction configs (DLRM family) carry an extra tower; keyed
    # conditionally so reference-architecture fingerprints are unchanged.
    if getattr(cfg, "interaction", "none") != "none":
        blob["interaction"] = cfg.interaction
        blob["bottom_mlp"] = (
            list(cfg.bottom_mlp.widths) if cfg.bottom_mlp is not None else None
        )
        if cfg.interaction == "cross":
            # cross depth/rank change the param shapes; two cross configs
            # must not share a fingerprint (ADVICE r1).
            blob["cross"] = [cfg.cross_layers, cfg.cross_rank]
    data = json.dumps(blob, sort_keys=True, separators=(",", ":")).encode()
    return hashlib.sha256(data).hexdigest()


class ConfigMismatchError(ValueError):
    pass


def quantize_tables(params: dict, model) -> dict:
    """Float-trained params -> int8 serving params (the workflow the
    training guard points at: train with float table storage, quantize the
    SERVING checkpoint — models/train.py::check_trainable).

    Quantizes the packed buffers in place per TABLE (the scale unit
    pack_tables uses): each one-hot class table along its buffer's axis 0,
    and each take-group table over its own physical rows of the unified
    buffer (contiguous or striped — the same placement arithmetic as
    pack_tables).  Scales are powers of two (embedding.py::_pow2_scale),
    so pm1 parity data survives bit-exactly.  Layout is independent of
    table_dtype, so the result serves through
    ``FleetRecModel.create(dataclasses.replace(cfg, table_dtype="int8"))``
    unchanged.  MLP/bottom/cross weights are untouched (activations stay
    the config's float dtype).
    """
    import jax.numpy as jnp

    from .models.embedding import PackedTables, _pow2_scale

    layout = model.layout
    tables = params["tables"]
    if tables.onehot_scales is not None or (
        tables.take_buffer is not None and tables.take_buffer.dtype == jnp.int8
    ):
        raise ValueError("params are already int8-quantized")

    def q(arr, scale):
        return np.clip(np.rint(arr / scale), -127, 127).astype(np.int8)

    oh_bufs, oh_scales = [], []
    for buf in tables.onehot_buffers:
        b = np.asarray(buf, dtype=np.float32)
        scales = np.asarray([_pow2_scale(b[j]) for j in range(b.shape[0])],
                            np.float32)
        oh_bufs.append(jnp.asarray(q(b, scales.reshape(-1, *([1] * (b.ndim - 1))))))
        oh_scales.append(jnp.asarray(scales[:, None, None]))

    take = None
    take_scales = None
    if tables.take_buffer is not None:
        tb = np.asarray(tables.take_buffer, dtype=np.float32)
        out = np.zeros(tb.shape, np.int8)
        S, H = layout.take_stripes, layout.stripe_height
        # QR configs pack over the INTERNAL specs (Q tables with their
        # post-decomposition row counts + hidden R tables whose ids are
        # absent from cfg.tables) — keying on cfg.tables would KeyError on
        # the R ids and mis-size the Q segments (ADVICE r4).
        by_id = {t.table_id: t for t in (model.spec_tables or model.cfg.tables)}
        sc = []
        for g in layout.take_groups:
            s = g.rows_per_phys
            for tid, base in zip(g.table_ids, g.base_phys):
                pr = np.arange(-(-by_id[tid].rows // s))
                rows = ((pr % S) * H + base + pr // S) if S > 1 else (base + pr)
                seg = tb[rows]
                scale = _pow2_scale(seg)
                out[rows] = q(seg, scale)
                sc.append(scale)
        take = jnp.asarray(out)
        take_scales = jnp.asarray(np.asarray(sc, np.float32))

    new_tables = PackedTables(
        layout=layout, onehot_buffers=oh_bufs, take_buffer=take,
        onehot_scales=oh_scales, take_scales=take_scales)
    return {**{k: v for k, v in params.items() if k != "w1_fold"},
            "tables": new_tables}


def _check_fingerprint(stored: Optional[str], model, path: str) -> None:
    if stored is None or model is None:
        return
    want = config_fingerprint(model.cfg)
    if stored != want:
        raise ConfigMismatchError(
            f"checkpoint {path} was saved for a different model geometry "
            f"(stored fingerprint {stored[:12]}…, current config "
            f"'{model.cfg.name}' is {want[:12]}…)"
        )


def save_npz(path: str, params, cfg=None) -> None:
    tables = params["tables"]
    arrs = {}
    if cfg is not None:
        arrs["config_fingerprint"] = np.frombuffer(
            config_fingerprint(cfg).encode(), dtype=np.uint8
        )
    for i, b in enumerate(tables.onehot_buffers):
        arrs[f"onehot_{i}"] = np.asarray(b)
    if tables.take_buffer is not None:
        arrs["take"] = np.asarray(tables.take_buffer)
    if tables.onehot_scales is not None:
        for i, sc in enumerate(tables.onehot_scales):
            arrs[f"onehot_scale_{i}"] = np.asarray(sc)
        if tables.take_scales is not None:
            arrs["take_scales"] = np.asarray(tables.take_scales)
    for i, w in enumerate(params["mlp"]):
        arrs[f"mlp_{i}"] = np.asarray(w)
    for i, w in enumerate(params.get("bottom", [])):
        arrs[f"bottom_{i}"] = np.asarray(w)
    for li, layer in enumerate(params.get("cross", [])):
        for j, w in enumerate(layer):
            arrs[f"cross_{li}_{j}"] = np.asarray(w)
    np.savez(path, **arrs)


def load_npz(path: str, model) -> dict:
    """Rebuild a params pytree for ``model`` from a save_npz file."""
    import jax.numpy as jnp

    from .models.embedding import PackedTables

    data = np.load(path)
    if "config_fingerprint" in data:
        _check_fingerprint(bytes(data["config_fingerprint"]).decode(), model, path)
    layout = model.layout
    dtype = jnp.dtype(model.cfg.table_dtype)
    onehot = [jnp.asarray(data[f"onehot_{i}"], dtype=dtype)
              for i in range(len(layout.onehot_classes))]
    take = jnp.asarray(data["take"], dtype=dtype) if "take" in data else None
    oh_scales = take_scales = None
    if "onehot_scale_0" in data or "take_scales" in data:
        oh_scales = [jnp.asarray(data[f"onehot_scale_{i}"])
                     for i in range(len(layout.onehot_classes))]
        take_scales = jnp.asarray(data["take_scales"]) if "take_scales" in data else None
    n_mlp = len(model.cfg.mlp.widths) - 1
    mlp = [jnp.asarray(data[f"mlp_{i}"], dtype=jnp.dtype(model.cfg.dtype))
           for i in range(n_mlp)]
    tables = PackedTables(layout=layout, onehot_buffers=onehot, take_buffer=take,
                          onehot_scales=oh_scales, take_scales=take_scales)
    out = {"tables": tables, "mlp": mlp}
    if model.cfg.bottom_mlp is not None:
        n_b = len(model.cfg.bottom_mlp.widths) - 1
        out["bottom"] = [jnp.asarray(data[f"bottom_{i}"], dtype=jnp.dtype(model.cfg.dtype))
                         for i in range(n_b)]
    if model.cfg.interaction == "cross":
        n_mats = 2 if model.cfg.cross_rank == 0 else 3  # [W,b] or [U,V,b]
        out["cross"] = [
            [jnp.asarray(data[f"cross_{li}_{j}"], dtype=jnp.dtype(model.cfg.dtype))
             for j in range(n_mats)]
            for li in range(model.cfg.cross_layers)
        ]
    return out


def _orbax_tree(params) -> dict:
    """Orbax tree for a params pytree; includes the int8 dequant scales
    (dropping them would silently restore un-dequantized tables)."""
    tables = params["tables"]
    tree = {
        "onehot": list(tables.onehot_buffers),
        "take": tables.take_buffer,
        "mlp": list(params["mlp"]),
    }
    if tables.onehot_scales is not None:
        tree["onehot_scales"] = list(tables.onehot_scales)
        tree["take_scales"] = tables.take_scales
    if "bottom" in params:
        tree["bottom"] = list(params["bottom"])
    if "cross" in params:
        tree["cross"] = [list(layer) for layer in params["cross"]]
    return tree


def save_orbax(path: str, params, cfg=None) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = _orbax_tree(params)
    path = os.path.abspath(path)
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    if cfg is not None:
        with open(os.path.join(path, "fleetrec_config.json"), "w") as f:
            json.dump({"name": cfg.name, "fingerprint": config_fingerprint(cfg)}, f)


def load_orbax(path: str, model, like_params) -> dict:
    """Restore into the structure/shardings of ``like_params``."""
    import orbax.checkpoint as ocp

    from .models.embedding import PackedTables

    meta_path = os.path.join(os.path.abspath(path), "fleetrec_config.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            _check_fingerprint(json.load(f)["fingerprint"], model, path)

    tpl = _orbax_tree(like_params)
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path), tpl)
    out_tables = PackedTables(
        layout=model.layout,
        onehot_buffers=list(tree["onehot"]),
        take_buffer=tree["take"],
        onehot_scales=list(tree["onehot_scales"]) if "onehot_scales" in tree else None,
        take_scales=tree.get("take_scales"),
    )
    out = {"tables": out_tables, "mlp": list(tree["mlp"])}
    if "bottom" in tree:
        out["bottom"] = list(tree["bottom"])
    if "cross" in tree:
        out["cross"] = [list(layer) for layer in tree["cross"]]
    if "w1_fold" in like_params:
        # derived from mlp[0] (not checkpointed): re-fold from the restored
        # W1 and place it on the template's (replicated) sharding
        from .parallel.sharded import fold_w1

        out["w1_fold"] = jax.device_put(
            fold_w1(model.layout, out["mlp"][0]), like_params["w1_fold"].sharding
        )
    return out
