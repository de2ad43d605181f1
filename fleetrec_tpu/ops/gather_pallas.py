"""Pallas row-gather over the packed embedding buffer — the hand-rolled
DMA-pipeline alternative to XLA's gather.

This is the direct TPU analog of the reference's per-channel II=1 burst
loaders (FPGA/kernel/user_krnl/embedding_krnl/src/hls/embedding_krnl.cpp
:1049-1068 ``load_single_embedding_1_tables``: one random row address per
cycle per memory channel, serviced by a dedicated AXI read port): each
output row is one scatter-read DMA HBM->VMEM, kept ``window`` deep in
flight, written to the output block as it lands.

MEASURED SLOWER than XLA's native gather on v5e (47 ns/row vs 13-16 ns/row
for `jnp.take` on 128-lane rows; see docs/DESIGN.md "Embedding lookup") —
the production path stays `jnp.take`, which compiles to the hardware
gather sequencer rather than discrete per-row DMAs.  Kept in-tree because
(a) the comparison is the load-bearing design decision and must stay
reproducible (`cli gatherbench` re-runs it), and (b) the kernel is the
starting point for fused gather+reduce variants where XLA's gather can't
follow (e.g. multi-row pooled embeddings).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(chunk: int, window: int, idx_ref, table_ref, out_ref,
                   scratch, sems):
    """One grid step gathers ``chunk`` rows; ``window`` DMAs stay in flight.

    idx_ref: [N] int32 scalar-prefetch (physical row ids, host-padded to a
    multiple of chunk); table_ref: [R, L] in HBM; out block [chunk, L] VMEM.
    """
    base = pl.program_id(0) * chunk

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[base + j]],
            scratch.at[slot],
            sems.at[slot],
        )

    # warm-up: fill the window
    for w in range(window):
        get_dma(w, w).start()

    def body(j, _):
        slot = jax.lax.rem(j, window)
        get_dma(slot, j).wait()
        out_ref[j, :] = scratch[slot]

        @pl.when(j + window < chunk)
        def _():
            get_dma(slot, j + window).start()

        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _gather_grouped_kernel(chunk: int, group: int, window: int, idx_ref,
                           table_ref, out_ref, sems):
    """Grouped-DMA variant (VERDICT r2 next-1 "amortized descriptor" angle):
    every row's DMA lands DIRECTLY in the output block (no VMEM scratch, no
    per-row copy-out), rows are issued in unrolled groups of ``group`` that
    share one semaphore, and ``window`` groups stay in flight.  The per-row
    work in the scalar core is ONE dma.start() — the hypothesis under test
    is that the per-row kernel's 47 ns/row was scalar-loop + scratch-copy
    overhead, not DMA-engine throughput."""
    base = pl.program_id(0) * chunk
    n_groups = chunk // group

    def row_dma(g, k):
        j = g * group + k
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[base + j]],
            out_ref.at[j],
            sems.at[jax.lax.rem(g, window)],
        )

    def start_group(g):
        for k in range(group):  # unrolled: group is static
            row_dma(g, k).start()

    def wait_group(g):
        for k in range(group):  # each wait retires one row's bytes
            row_dma(g, k).wait()

    for w in range(window):  # warm-up: fill the window (static count)
        start_group(w)

    def body(g, _):
        wait_group(g)

        @pl.when(g + window < n_groups)
        def _():
            start_group(g + window)

        return 0

    jax.lax.fori_loop(0, n_groups, body, 0)


@functools.partial(jax.jit, static_argnames=("chunk", "group", "window", "interpret"))
def gather_rows_grouped(
    table: jax.Array,
    phys_idx: jax.Array,
    chunk: int = 1024,
    group: int = 8,
    window: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Grouped-DMA gather: rows of ``table`` [R, L] at ``phys_idx`` [N] ->
    [N, L].  See _gather_grouped_kernel; ``cli gatherbench`` reports it as
    pallas_grouped_ns_per_row (alongside take and the per-row kernel)."""
    N = phys_idx.shape[0]
    L = table.shape[1]
    group = max(1, min(group, chunk))
    chunk = (chunk // group) * group
    window = max(1, min(window, chunk // group))
    n_pad = -N % chunk
    idx = jnp.pad(phys_idx.astype(jnp.int32), (0, n_pad))
    total = N + n_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((chunk, L), lambda i, _idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((window,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_grouped_kernel, chunk, group, window),
        out_shape=jax.ShapeDtypeStruct((total, L), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, table)
    return out[:N]


@functools.partial(jax.jit, static_argnames=("chunk", "window", "interpret"))
def gather_rows(
    table: jax.Array,
    phys_idx: jax.Array,
    chunk: int = 512,
    window: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Gather rows of ``table`` [R, L] at ``phys_idx`` [N] -> [N, L].

    Drop-in for ``jnp.take(table, phys_idx, axis=0)`` (indices assumed
    in-range; the engine validates at the wire).  N pads internally to a
    multiple of ``chunk``.
    """
    N = phys_idx.shape[0]
    L = table.shape[1]
    # window > chunk would warm-start DMAs past the block (reading idx out
    # of bounds) and leave them never waited on, corrupting the slot pairing
    window = max(1, min(window, chunk))
    n_pad = -N % chunk
    idx = jnp.pad(phys_idx.astype(jnp.int32), (0, n_pad))
    total = N + n_pad

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((chunk, L), lambda i, _idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window, L), table.dtype),
            pltpu.SemaphoreType.DMA((window,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, chunk, window),
        out_shape=jax.ShapeDtypeStruct((total, L), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, table)
    return out[:N]
