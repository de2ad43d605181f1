"""Training support.

The reference is inference-only (tables are synthesized, never learned —
host.cpp:282-718), but a serving framework needs the fine-tuning path: CTR
training drives the embedding tables the serving engine looks up.  This
module provides an optax-based Trainer over the same params pytree the
serving engine uses, so a trained checkpoint (io.py) drops straight into
serving.  Gradients flow through both lookup paths: the one-hot matmul
(dense dw = oh^T @ g per class) and the unified take (scatter-add), and
inherit the mesh shardings (tables/W1 row-sharded -> grads likewise;
XLA psums the replicated parts).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bce_with_logits(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically stable binary cross-entropy on logits."""
    return jnp.mean(
        jnp.maximum(scores, 0) - scores * labels + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    )


def check_trainable(params) -> None:
    """Fail fast (at trace time) when the table storage is int8-quantized:
    gradients through quantized buffers are meaningless and jax.grad rejects
    integer inputs with an opaque error.  Train with table_dtype float32/
    bfloat16 and quantize the checkpoint for serving (model3's serving
    default is int8 tables, config.py)."""
    pt = params.get("tables") if isinstance(params, dict) else None
    if pt is None:
        return
    bufs = list(getattr(pt, "onehot_buffers", []) or [])
    if getattr(pt, "take_buffer", None) is not None:
        bufs.append(pt.take_buffer)
    for b in bufs:
        if jnp.dtype(b.dtype) == jnp.int8:
            raise ValueError(
                "training requires float table storage (table_dtype='float32' "
                "or 'bfloat16'); this params pytree holds int8-quantized "
                "tables — rebuild with a float table_dtype and quantize only "
                "the serving checkpoint"
            )


class Trainer:
    """Minimal CTR trainer: loss = BCE(score, click)."""

    def __init__(self, model, optimizer=None, sharded=None):
        import optax

        self.model = model
        self.opt = optimizer or optax.adagrad(1e-2)  # DLRM-standard optimizer
        self.sharded = sharded  # optional ShardedFleetRec for mesh placement

        def loss_fn(params, indices, dense, labels):
            scores = model.forward(params, indices, dense)
            return bce_with_logits(scores, labels)

        @jax.jit
        def step(params, opt_state, indices, dense, labels):
            check_trainable(params)
            loss, grads = jax.value_and_grad(loss_fn)(params, indices, dense, labels)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            import optax as _optax

            params = _optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = step

    def init(self, params):
        return self.opt.init(params)

    def step(self, params, opt_state, indices, dense, labels):
        """One SGD/Adagrad step; returns (params, opt_state, loss)."""
        return self._step(params, opt_state, indices, dense, labels)

    def fit(self, params, batches, epochs: int = 1, log_every: int = 0):
        """batches: iterable of (indices, dense, labels) numpy arrays."""
        opt_state = self.init(params)
        losses = []
        i = 0
        for _ in range(epochs):
            for idx, dense, labels in batches:
                d = None if dense is None else jnp.asarray(dense)
                params, opt_state, loss = self.step(
                    params, opt_state, jnp.asarray(idx), d, jnp.asarray(labels)
                )
                losses.append(float(loss))
                i += 1
                if log_every and i % log_every == 0:
                    print(f"step {i}: loss {losses[-1]:.4f}", flush=True)
        return params, losses
