"""Feature-interaction layers (beyond-reference model families).

The reference serves exactly one architecture — lookup -> fixed-offset
concat -> dense MLP (GPU/final_network_cublasLt_3_nodes_no_FIFO_scatter/
cuda_server.c:598-621).  Production recommenders usually insert an explicit
feature-interaction stage between the embeddings and the scoring tower; the
two standard ones are DLRM's pairwise dot interaction and DCNv2's cross
network.  Both are provided TPU-first:

* dot: the pairwise Gram matrix is ONE batched MXU matmul
  (einsum bnd,bmd->bnm) and the lower triangle is pulled out with a single
  static column gather — no dynamic shapes, no Python loops, fuses under jit.
* cross (DCNv2, arXiv:2008.13535): each layer is x_{l+1} = x0 * (x_l W + b)
  + x_l — one [F, F] MXU matmul plus fused elementwise per layer (the
  low-rank variant factors W = U V with two skinny matmuls).  Static shapes,
  a plain Python loop that unrolls under jit.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def num_pairs(n_vectors: int) -> int:
    """Strict lower triangle count (DLRM convention: self-dots excluded)."""
    return n_vectors * (n_vectors - 1) // 2


def dot_interaction(vecs: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Pairwise dot products of per-example feature vectors.

    vecs: [B, n, D] -> [B, n*(n-1)//2] — entry k is <v_i, v_j> for the k-th
    (i>j) pair in row-major lower-triangle order.  The Gram matmul runs on
    the MXU with fp32 accumulation; for the integer-valued parity data the
    result is exact (products of +-1 vectors, |sum| <= D << 2^24) provided
    the operands are bf16-representable or precision="highest" is set
    (docs/DESIGN.md "fp32 matmul precision").
    """
    B, n, _ = vecs.shape
    gram = jnp.einsum(
        "bnd,bmd->bnm", vecs, vecs, preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(vecs.dtype)
    li, lj = np.tril_indices(n, k=-1)
    cols = jnp.asarray(li * n + lj, dtype=jnp.int32)
    return jnp.take(gram.reshape(B, n * n), cols, axis=1)


def init_cross_params(
    feature_dim: int,
    n_layers: int,
    rank: int = 0,
    scheme: str = "ones",
    seed: int = 0,
    dtype=jnp.float32,
) -> List[List[jax.Array]]:
    """Per-layer cross weights: [W [F,F], b [F]] full-rank, or
    [U [F,r], V [r,F], b [F]] when rank > 0.  "ones" (+ zero bias) is the
    deterministic parity scheme (integer-valued on ±1 data, like the
    reference's all-ones MLP weights, cuda_server.c:154-161); seeding
    matches reference.init_cross_weights (seed+2 namespace, cf. the bottom
    tower's seed+1)."""
    layers: List[List[jax.Array]] = []
    F = feature_dim
    for li in range(n_layers):
        if scheme == "ones":
            mats = ([np.ones((F, F), np.float32)] if rank == 0 else
                    [np.ones((F, rank), np.float32), np.ones((rank, F), np.float32)])
        elif scheme == "uniform":
            rng = np.random.default_rng((seed + 2) * 104729 + li)
            if rank == 0:
                mats = [(rng.uniform(-1, 1, (F, F)) / np.sqrt(F)).astype(np.float32)]
            else:
                mats = [
                    (rng.uniform(-1, 1, (F, rank)) / np.sqrt(F)).astype(np.float32),
                    (rng.uniform(-1, 1, (rank, F)) / np.sqrt(rank)).astype(np.float32),
                ]
        else:
            raise ValueError(scheme)
        layers.append([jnp.asarray(m, dtype=dtype) for m in mats]
                      + [jnp.zeros((F,), dtype=dtype)])
    return layers


def cross_network(
    x0: jax.Array, layers: Sequence[Sequence[jax.Array]], precision=None
) -> jax.Array:
    """DCNv2 stacked cross layers: x_{l+1} = x0 * (x_l W_l + b_l) + x_l.

    x0: [B, F].  Each layer is one (or two, low-rank) MXU matmul with fp32
    accumulation plus a fused elementwise multiply-add — the whole stack
    stays inside the jitted program.  Output [B, F] feeds the top MLP.
    """
    x = x0
    for lp in layers:
        *mats, b = lp
        xw = x
        for m in mats:
            xw = jnp.dot(xw, m.astype(x.dtype), preferred_element_type=jnp.float32,
                         precision=precision)
        x = x0 * (xw.astype(x0.dtype) + b.astype(x0.dtype)) + x
    return x
