"""Pallas TPU row-scatter: pipelined per-row DMA into an HBM pool.

XLA's TPU scatter lowers to a SEQUENTIAL per-index loop (~170 ns/row
measured, PERF.md) — at unique_cap 32768 that is ~5.6 ms/step, the single
largest device cost of the embedding train step (ref fused_apply_gradient's
role, runtime/ops/hash_table_op.cc). The rows being written are unique and
their payload is one packed 128-lane row each, so the operation is really
"32k independent 512 B copies to computed addresses" — exactly what the
DMA engines are for. This kernel keeps NSLOTS row copies in flight
(values[i] -> pool[rows[i]]), hiding HBM latency behind DMA pipelining
instead of paying it serially per row.

Row indices arrive via scalar prefetch (SMEM) so destination addresses are
known before the body runs; the pool is aliased in-place (donated), values
and pool stay in HBM (`pltpu.ANY`) — nothing is staged through VMEM.
Rows < 0 (padding / filtered ids) are skipped. Duplicate rows are NOT
allowed (callers pass host-deduped uniques).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_scatter_enabled() -> bool:
    """Whether the DMA scatter path should be used: TPU backends only (the
    CPU test mesh keeps the XLA scatter), overridable with
    MT_PALLAS_SCATTER=0."""
    if os.environ.get("MT_PALLAS_SCATTER", "1") != "1":
        return False
    try:
        # pltpu kernels lower on TPU backends only (incl. the tunneled
        # "axon" platform); GPU/CPU keep the XLA scatter
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False

_NSLOTS = 32  # concurrent row DMAs (per-slot semaphores); measured best

# Row indices are a scalar-prefetch operand and live in SMEM (~1 MB/core
# on v5e). Above this many rows (256 KB of int32) the call is split into
# independent chunked kernel launches so SMEM never overflows; production
# shapes (unique_cap <= 64K) take the single-launch path unchanged.
_MAX_PREFETCH_ROWS = 1 << 16


def _scatter_kernel(rows_ref, values_ref, pool_in_ref, pool_out_ref, sems):
    del pool_in_ref  # aliased with pool_out_ref
    n = values_ref.shape[0]

    def copy(i, slot):
        return pltpu.make_async_copy(values_ref.at[i],
                                     pool_out_ref.at[rows_ref[i]],
                                     sems.at[slot])

    def body(i, carry):
        # retire the copy NSLOTS behind us on this slot (same descriptor)
        @pl.when((i >= _NSLOTS) & (rows_ref[i - _NSLOTS] >= 0))
        def _():
            copy(i - _NSLOTS, (i - _NSLOTS) % _NSLOTS).wait()

        @pl.when(rows_ref[i] >= 0)
        def _():
            copy(i, i % _NSLOTS).start()
        return carry

    jax.lax.fori_loop(0, n, body, 0)

    def drain(j, carry):
        i = n - _NSLOTS + j

        @pl.when((i >= 0) & (rows_ref[jnp.maximum(i, 0)] >= 0))
        def _():
            copy(jnp.maximum(i, 0), jnp.maximum(i, 0) % _NSLOTS).wait()
        return carry

    jax.lax.fori_loop(0, _NSLOTS, drain, 0)


def _gather_kernel(rows_ref, pool_ref, out_ref, sems):
    n = out_ref.shape[0]

    def copy(i, slot):
        row = jnp.maximum(rows_ref[i], 0)  # -1 rows masked to 0 by caller
        return pltpu.make_async_copy(pool_ref.at[row], out_ref.at[i],
                                     sems.at[slot])

    def body(i, carry):
        @pl.when(i >= _NSLOTS)
        def _():
            copy(i - _NSLOTS, (i - _NSLOTS) % _NSLOTS).wait()
        copy(i, i % _NSLOTS).start()
        return carry

    jax.lax.fori_loop(0, n, body, 0)

    def drain(j, carry):
        i = n - _NSLOTS + j

        @pl.when(i >= 0)
        def _():
            copy(jnp.maximum(i, 0), jnp.maximum(i, 0) % _NSLOTS).wait()
        return carry

    jax.lax.fori_loop(0, _NSLOTS, drain, 0)


def row_dma_supported(dtype, width: int) -> bool:
    """Whether the row-DMA kernels can move (width,)-rows of this dtype.

    Mosaic (current stack) requires an HBM row slice to be 128 int32
    lanes — the row byte width must be a multiple of 512. f32 packed rows
    (128 lanes, 512 B) qualify; 16-bit rows qualify only at width % 256
    == 0 (run on an int32 view of the same bytes — direct 16-bit
    single-row slices fail tiling: "slice along dim 0 must be aligned to
    tiling (8), but is 1"). Unsupported shapes fall back to the XLA
    scatter/gather, measured comparable at production shapes on current
    stacks (PERF.md round-4). Only 2- and 4-byte dtypes are admitted:
    gather_rows/scatter_rows remap itemsize==2 through the int32 view but
    would feed a 1-byte dtype to the DMA kernel directly, hitting the same
    single-row tiling failure (ADVICE r4)."""
    itemsize = jnp.dtype(dtype).itemsize
    return itemsize in (2, 4) and (width * itemsize) % 512 == 0


def _as_int32_rows(a: jnp.ndarray) -> jnp.ndarray:
    """View a (N, P) 2-byte-dtype array as (N, P/2) int32 without moving
    data (a DMA copies bytes; dtype is irrelevant)."""
    n, p = a.shape
    return jax.lax.bitcast_convert_type(a.reshape(n, p // 2, 2), jnp.int32)


def _from_int32_rows(a: jnp.ndarray, dtype) -> jnp.ndarray:
    n, p2 = a.shape
    return jax.lax.bitcast_convert_type(a, dtype).reshape(n, p2 * 2)


def gather_rows(pool: jnp.ndarray, rows: jnp.ndarray) -> jnp.ndarray:
    """out[i] = pool[rows[i]] via the same pipelined row-DMA scheme as
    scatter_rows (XLA's TPU gather also row-loops serially, ~30 ns/row —
    ~1 ms at unique_cap 32768). Rows < 0 read pool[0] here; the CALLER
    must mask them to zeros (one fused elementwise select), which
    table.gather_packed does. Shapes the DMA kernel can't move (see
    row_dma_supported) take the XLA gather with identical semantics."""
    if not row_dma_supported(pool.dtype, pool.shape[1]):
        return pool[jnp.maximum(rows, 0)]
    if pool.dtype.itemsize == 2:
        return _from_int32_rows(gather_rows(_as_int32_rows(pool), rows),
                                pool.dtype)
    n = rows.shape[0]
    if n > _MAX_PREFETCH_ROWS:
        outs = [gather_rows(pool, rows[i:i + _MAX_PREFETCH_ROWS])
                for i in range(0, n, _MAX_PREFETCH_ROWS)]
        return jnp.concatenate(outs, axis=0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_NSLOTS,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows.shape[0], pool.shape[1]),
                                       pool.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(rows.astype(jnp.int32), pool)


def scatter_rows(pool: jnp.ndarray, rows: jnp.ndarray,
                 values: jnp.ndarray) -> jnp.ndarray:
    """pool[rows[i]] = values[i] for rows[i] >= 0; rows unique; pool is
    updated in place when the caller's jit allows donation (the train step
    donates table state). pool [cap, P], rows [U] int32, values [U, P]
    with values.dtype == pool.dtype.

    Profiled in-program (v5e, cap 2^21, P 128, U 32768): 1.14 ms vs
    ~3 ms for the XLA scatter — bound by the scalar core's DMA issue rate
    (~33 ns/descriptor) instead of serial per-row HBM latency."""
    assert values.dtype == pool.dtype, (values.dtype, pool.dtype)
    assert rows.shape[0] == values.shape[0]
    assert values.shape[1] == pool.shape[1]
    if not row_dma_supported(pool.dtype, pool.shape[1]):
        # XLA fallback with identical semantics (rows < 0 dropped)
        safe = jnp.where(rows < 0, jnp.int32(pool.shape[0]),
                         rows.astype(jnp.int32))
        return pool.at[safe].set(values, mode="drop", unique_indices=True)
    if pool.dtype.itemsize == 2:
        return _from_int32_rows(
            scatter_rows(_as_int32_rows(pool), rows, _as_int32_rows(values)),
            pool.dtype)
    n = rows.shape[0]
    if n > _MAX_PREFETCH_ROWS:
        for i in range(0, n, _MAX_PREFETCH_ROWS):
            pool = scatter_rows(pool, rows[i:i + _MAX_PREFETCH_ROWS],
                                values[i:i + _MAX_PREFETCH_ROWS])
        return pool
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_NSLOTS,))],
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={2: 0},  # pool (after scalar prefetch) -> out
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(rows.astype(jnp.int32), values, pool)
