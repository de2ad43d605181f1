"""Pallas fused MLP tower: the whole bias-free matmul chain in one kernel.

The reference runs four separate cublasLtMatmul calls with activations
round-tripping through GPU HBM (cuda_server.c:598-621). XLA similarly emits
one HLO per layer. This kernel keeps ALL weights VMEM-resident (the
reference's scoring weights total a few MB — W1 is the largest at
feature_dim x hidden1) and runs every layer per batch-tile without touching
HBM for intermediates: HBM traffic collapses to x-in / scores-out.

Inference-only (the training path uses the XLA chain for autodiff).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def fused_mlp_available(widths: Sequence[int], dtype, vmem_budget: int = 96 * 2**20) -> bool:
    """All weights + per-tile activations must fit in VMEM."""
    bpe = jnp.dtype(dtype).itemsize
    w_bytes = sum(a * b * bpe for a, b in zip(widths[:-1], widths[1:]))
    act_bytes = 2 * 512 * max(widths) * 4
    return w_bytes + act_bytes < vmem_budget


def _kernel(n_layers: int, activation: Optional[str], dtype, *refs):
    x_ref = refs[0]
    w_refs = refs[1 : 1 + n_layers]
    out_ref = refs[1 + n_layers]
    h = x_ref[:]
    for i, w in enumerate(w_refs):
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32)
        if activation == "relu" and i < n_layers - 1:
            h = jnp.maximum(h, 0.0)
        if i < n_layers - 1:
            h = h.astype(dtype)  # match the XLA chain's inter-layer dtype
    out_ref[:] = h.astype(jnp.float32)


def fused_mlp(
    weights: Sequence[jax.Array],
    x: jax.Array,
    activation: Optional[str] = None,
    tile_b: int = 512,
) -> jax.Array:
    """x: [B, input_dim] -> [B, out_dim] float32.

    Weights [in, out] per layer, all the same dtype as x. B is padded to a
    tile multiple internally. Mirrors models.mlp.mlp_apply numerics
    (fp32 accumulation, inter-layer cast to the storage dtype).
    """
    n = len(weights)
    B, D = x.shape
    out_dim = weights[-1].shape[1]
    dtype = x.dtype
    # Pallas TPU kernels need the interpreter on non-TPU backends (tests).
    interpret = jax.default_backend() != "tpu"

    Bp = _round_up(B, tile_b)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))

    kern = functools.partial(_kernel, n, activation, dtype)
    grid = (Bp // tile_b,)
    in_specs = [
        pl.BlockSpec((tile_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [
        # weights: whole-array blocks, same for every grid step — the
        # pipeline fetches them once and keeps them VMEM-resident
        pl.BlockSpec(w.shape, (lambda i: (0, 0)), memory_space=pltpu.VMEM)
        for w in weights
    ]
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_b, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, out_dim), jnp.float32),
        interpret=interpret,
    )(x, *weights)
    return out[:B] if Bp != B else out
