"""Feature-interaction layers (beyond-reference model families).

The reference serves exactly one architecture — lookup -> fixed-offset
concat -> dense MLP (GPU/final_network_cublasLt_3_nodes_no_FIFO_scatter/
cuda_server.c:598-621).  Production recommenders usually insert an explicit
feature-interaction stage between the embeddings and the scoring tower; the
standard one is DLRM's pairwise dot interaction.  This module provides it
TPU-first: the pairwise Gram matrix is ONE batched MXU matmul
(einsum bnd,bmd->bnm) and the lower triangle is pulled out with a single
static column gather — no dynamic shapes, no Python loops, fuses under jit.
"""

from __future__ import annotations

import numpy as np

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
