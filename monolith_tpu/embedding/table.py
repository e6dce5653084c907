"""Device-resident embedding table: packed row pool.

TPU-native rebuild of the reference's embedding hash table value path
(ref: runtime/hash_table/embedding_hash_table_interface.h:34 Lookup/Assign/
BatchOptimize, entry_accessor.{h,cc} segment dispatch). Like the reference's
entry accessor — which packs [embedding segments | optimizer state | ts]
into one contiguous blob per id — each id's FULL state here is one row of a
single `[capacity, P]` pool in TPU HBM:

    [ seg0 params | seg1 params | ... | seg0 slots | seg1 slots | pad ]

with P padded to a multiple of 128 lanes. This is a measured TPU layout
decision, not a style choice (see PERF.md): narrow per-array pools
([cap, 17], [cap, 16]) are lane-padded 7.5x in HBM, push XLA into
transposed layouts, and cost 4 sequential scatters per step; one packed
row costs ONE gather + ONE scatter and is HBM-dense.

Row indices are assigned by the host `HostStore`; all float math (init,
lookup, per-segment optimize) runs on device as pure jit-able functions of
(state, rows, grads). Rows = -1 (filtered / padded) read zeros and drop
updates via XLA gather/scatter OOB semantics (mode='fill'/'drop'). NOTE:
JAX wraps negative indices BEFORE applying mode, so -1 sentinels are
remapped on device to `capacity` (a true OOB index) by `_sanitize` first.

bf16 tables (spec.dtype == bfloat16) store the SAME packed row in a bf16
pool — physically HALF the HBM bytes per row (a [cap, <=128] f32 pool is
tiled to 512 B/row on TPU regardless of logical width; bf16 is 256 B/row),
i.e. 2x ids per chip and half the gather/scatter traffic. All row math
(init/optimize) runs in f32 on the gathered rows; the write-back rounds
stochastically when spec.stochastic_rounding is set (Pallas TPU PRNG
kernel, ops/rounding.py) so sub-ulp updates accumulate in expectation —
the packed analogue of ref stochastic_rounding.cc. NOTE optimizer
accumulators are 16-bit too in this mode (like ref QuantizedEntryAccessor,
quantized_entry_accessor.h); force EngineConfig(packed="off") to get the
structure-of-arrays layout with f32 accumulators instead.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.embedding.spec import TableSpec

# state pytree:
#   packed: {"data": [cap, P] f32}
#   legacy: {"params": [cap, D] dtype, "slots": [ {name: [cap, k] f32}, ... ]}
TableState = Dict

_LANES = 128


def is_packed(spec: TableSpec) -> bool:
    return spec.dtype in (jnp.float32, jnp.bfloat16)


@functools.lru_cache(maxsize=None)
def _layout(spec: TableSpec):
    """Column layout of a packed row: (width, padded, slot_offsets) where
    slot_offsets[(seg_idx, name)] = (offset, k, init_value). Params occupy
    [0, dim) in segment order; slots follow in (segment, sorted-name) order
    — the same order tiered.pack_rows / checkpoints use."""
    off = spec.dim
    slots = {}
    for i, seg in enumerate(spec.segments):
        for name, (k, init_value) in sorted(seg.optimizer.slot_spec(seg.dim).items()):
            slots[(i, name)] = (off, k, init_value)
            off += k
    width = off
    padded = max(_LANES, -(-width // _LANES) * _LANES)
    return width, padded, slots


def packed_width(spec: TableSpec) -> int:
    """Logical row width: params + all optimizer slots (no padding)."""
    return _layout(spec)[0]


def packed_padded_width(spec: TableSpec) -> int:
    """Physical packed-row width (padded to 128 lanes)."""
    return _layout(spec)[1]


def _sanitize(rows: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Map negative sentinel rows to a genuinely out-of-bounds index."""
    return jnp.where(rows < 0, jnp.int32(capacity), rows.astype(jnp.int32))


# ----------------------------------------------------------------------
# state construction
# ----------------------------------------------------------------------

def create_state(spec: TableSpec, packed: bool = None) -> TableState:
    """Allocate the device pool(s) for one shard."""
    cap = spec.capacity_per_shard
    if packed is None:
        packed = is_packed(spec)
    if packed:
        _, padded, slots = _layout(spec)
        data = jnp.zeros((cap, padded), dtype=spec.dtype)
        # slot columns start at their init value
        for (_, _name), (off, k, init_value) in slots.items():
            if init_value != 0.0:
                data = data.at[:, off:off + k].set(init_value)
        return {"data": data}
    params = jnp.zeros((cap, spec.dim), dtype=spec.dtype)
    slots: List[Dict[str, jnp.ndarray]] = []
    for seg in spec.segments:
        seg_slots = {}
        for name, (k, init_value) in seg.optimizer.slot_spec(seg.dim).items():
            seg_slots[name] = jnp.full((cap, k), init_value, dtype=jnp.float32)
        slots.append(seg_slots)
    return {"params": params, "slots": slots}


def init_packed(spec: TableSpec, key: jax.Array, n: int) -> jnp.ndarray:
    """Fresh packed rows [n, P]: per-segment initializer values for params,
    slot init values, zero padding."""
    _, padded, slots = _layout(spec)
    seg_keys = jax.random.split(key, max(len(spec.segments), 1))
    pieces = [seg.initializer.init(seg_keys[i], (n, seg.dim))
              for i, seg in enumerate(spec.segments)]
    row = jnp.zeros((n, padded), jnp.float32)
    row = row.at[:, :spec.dim].set(jnp.concatenate(pieces, axis=-1))
    for (_i, _name), (off, k, init_value) in slots.items():
        if init_value != 0.0:
            row = row.at[:, off:off + k].set(init_value)
    return row


# ----------------------------------------------------------------------
# packed fast path (used by the fused engine step)
# ----------------------------------------------------------------------

def gather_packed(spec: TableSpec, state: TableState,
                  rows: jnp.ndarray, unbatched: bool = True) -> jnp.ndarray:
    """Gather full packed rows [n, P] as f32; -1 rows read zeros. bf16
    pools upcast after the gather so all row math runs in f32. On TPU,
    unbatched calls use the pipelined row-DMA kernel (ops/scatter.py) —
    XLA's gather row-loops serially like its scatter."""
    if unbatched and rows.ndim == 1:
        from monolith_tpu.ops.scatter import (gather_rows,
                                              pallas_scatter_enabled)
        if pallas_scatter_enabled():
            out = gather_rows(state["data"], rows.astype(jnp.int32))
            out = jnp.where((rows >= 0)[:, None], out, 0)
            return out.astype(jnp.float32)
    rows = _sanitize(rows, spec.capacity_per_shard)
    out = state["data"].at[rows].get(mode="fill", fill_value=0)
    return out.astype(jnp.float32)


def scatter_packed(spec: TableSpec, state: TableState, rows: jnp.ndarray,
                   values: jnp.ndarray, key=None,
                   unbatched: bool = True) -> TableState:
    """Write full packed rows; -1 rows dropped. THE one scatter per step.
    f32 values are narrowed to a bf16 pool stochastically when
    spec.stochastic_rounding is set and a PRNG `key` is given (so sub-ulp
    optimizer updates accumulate in expectation); round-to-nearest
    otherwise (init/assign/restore of values that were never wider).

    On TPU the scatter runs as a pipelined per-row DMA kernel
    (ops/scatter.py) — XLA's scatter is a serial per-index loop and was the
    single largest device cost of the step (PERF.md); the kernel is ~100x
    faster at unique_cap 32768. `unbatched=False` (callers tracing under
    vmap — a tracer's ndim can't reveal that) and CPU backends keep the
    XLA path; the engine skips vmap entirely for single-shard tables."""
    pool = state["data"]
    if pool.dtype != values.dtype:
        if spec.stochastic_rounding and key is not None and \
                pool.dtype == jnp.bfloat16:
            from monolith_tpu.ops.rounding import stochastic_round_bf16
            values = stochastic_round_bf16(values, key)
        else:
            values = values.astype(pool.dtype)
    if unbatched and rows.ndim == 1:
        from monolith_tpu.ops.scatter import (pallas_scatter_enabled,
                                              scatter_rows)
        if pallas_scatter_enabled():
            return {"data": scatter_rows(pool, rows.astype(jnp.int32),
                                         values)}
    rows = _sanitize(rows, spec.capacity_per_shard)
    return {"data": pool.at[rows].set(values, mode="drop",
                                      unique_indices=True)}


def params_of(spec: TableSpec, packed: jnp.ndarray) -> jnp.ndarray:
    """Params columns of gathered packed rows."""
    return packed[..., :spec.dim]


def optimize_packed(spec: TableSpec, packed: jnp.ndarray, grads: jnp.ndarray,
                    step: jnp.ndarray, stale: jnp.ndarray = None) -> jnp.ndarray:
    """Pure row math: apply each segment's optimizer to gathered packed rows
    (ref BatchOptimize, embedding_hash_table_interface.h:73). Returns the
    new packed rows; the caller scatters them once.

    `stale`: in the 1-step-stale pipelined mode (async_optimize), the rows
    the FORWARD actually used — segments whose optimizer supports delta
    compensation (DC, ref dc_optimizer.cc:30-44 OptimizeWithLatestValue)
    receive them as stale_p to compensate the gradient."""
    _, padded, slot_offs = _layout(spec)
    new_p, new_slots = [], {}
    off = 0
    for i, seg in enumerate(spec.segments):
        g_seg = grads[..., off:off + seg.dim]
        p_seg = packed[..., off:off + seg.dim]
        gathered = {}
        for name in seg.optimizer.slot_spec(seg.dim):
            o, k, _ = slot_offs[(i, name)]
            gathered[name] = packed[..., o:o + k]
        lr = seg.learning_rate(step)
        if stale is not None and hasattr(seg.optimizer, "stale_apply"):
            p_new, slots_new = seg.optimizer.stale_apply(
                p_seg, gathered, g_seg, lr, step,
                stale[..., off:off + seg.dim])
        else:
            p_new, slots_new = seg.optimizer.apply(p_seg, gathered, g_seg,
                                                   lr, step)
        new_p.append(p_new)
        for name, val in slots_new.items():
            new_slots[(i, name)] = val
        off += seg.dim
    out = packed
    out = out.at[..., :spec.dim].set(jnp.concatenate(new_p, axis=-1))
    for (i, name), val in new_slots.items():
        o, k, _ = slot_offs[(i, name)]
        out = out.at[..., o:o + k].set(val)
    return out


# ----------------------------------------------------------------------
# generic API (both modes) — lookup / init / optimize / assign / restore
# ----------------------------------------------------------------------

def lookup(spec: TableSpec, state: TableState, rows: jnp.ndarray,
           unbatched: bool = True) -> jnp.ndarray:
    """Gather rows ([n] int32, -1 -> zeros) as [n, dim] float32."""
    if "data" in state:
        return params_of(spec, gather_packed(spec, state, rows,
                                             unbatched=unbatched))
    rows = _sanitize(rows, spec.capacity_per_shard)
    emb = state["params"].at[rows].get(mode="fill", fill_value=0)
    return emb.astype(jnp.float32)


def init_rows(spec: TableSpec, state: TableState, rows: jnp.ndarray,
              key: jax.Array, unbatched: bool = True) -> TableState:
    """Initialize newly-admitted (or recycled) rows: initializer values for
    params and RESET optimizer slots — critical when a row is recycled after
    eviction so the new id doesn't inherit stale accumulator state."""
    k = rows.shape[0]
    if "data" in state:
        return scatter_packed(spec, state, rows, init_packed(spec, key, k),
                              unbatched=unbatched)
    rows = _sanitize(rows, spec.capacity_per_shard)
    seg_keys = jax.random.split(key, max(len(spec.segments), 1))
    pieces = [seg.initializer.init(seg_keys[i], (k, seg.dim))
              for i, seg in enumerate(spec.segments)]
    init_vals = jnp.concatenate(pieces, axis=-1).astype(spec.dtype)
    params = state["params"].at[rows].set(init_vals, mode="drop")
    new_slots = []
    for seg, seg_slots in zip(spec.segments, state["slots"]):
        spec_map = seg.optimizer.slot_spec(seg.dim)
        d = {}
        for name, arr in seg_slots.items():
            width, init_value = spec_map[name]
            d[name] = arr.at[rows].set(
                jnp.full((k, width), init_value, dtype=arr.dtype), mode="drop")
        new_slots.append(d)
    return {"params": params, "slots": new_slots}


def apply_gradients(spec: TableSpec, state: TableState, rows: jnp.ndarray,
                    grads: jnp.ndarray, step: jnp.ndarray,
                    key: jax.Array = None,
                    unbatched: bool = True) -> TableState:
    """Per-segment per-row optimize (ref BatchOptimize). `rows` [m] must be
    unique; -1 entries drop. `grads` [m, dim] are summed per unique row.
    `key` seeds the stochastic bf16 write-back; callers that vmap over
    shards/tables must pass distinct keys so rounding noise stays
    independent (the in-expectation accumulation argument needs it)."""
    if "data" in state:
        packed = gather_packed(spec, state, rows, unbatched=unbatched)
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(0), step)
        return scatter_packed(spec, state, rows,
                              optimize_packed(spec, packed, grads, step),
                              key=key, unbatched=unbatched)
    rows = _sanitize(rows, spec.capacity_per_shard)
    p = state["params"].at[rows].get(mode="fill", fill_value=0).astype(jnp.float32)
    new_p_pieces = []
    new_slots = []
    off = 0
    for seg, seg_slots in zip(spec.segments, state["slots"]):
        g_seg = grads[:, off:off + seg.dim]
        p_seg = p[:, off:off + seg.dim]
        gathered = {name: arr.at[rows].get(mode="fill", fill_value=0)
                    for name, arr in seg_slots.items()}
        lr = seg.learning_rate(step)
        p_new, slots_new = seg.optimizer.apply(p_seg, gathered, g_seg, lr, step)
        new_p_pieces.append(p_new)
        new_slots.append({name: seg_slots[name].at[rows].set(val, mode="drop")
                          for name, val in slots_new.items()})
        off += seg.dim
    p_new_full = jnp.concatenate(new_p_pieces, axis=-1)
    if spec.stochastic_rounding and spec.dtype == jnp.bfloat16:
        from monolith_tpu.ops.rounding import stochastic_round_bf16
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(0), step)
        p_new_full = stochastic_round_bf16(p_new_full, key)
    else:
        p_new_full = p_new_full.astype(spec.dtype)
    params = state["params"].at[rows].set(p_new_full, mode="drop")
    return {"params": params, "slots": new_slots}


def assign_rows(spec: TableSpec, state: TableState, rows: jnp.ndarray,
                values: jnp.ndarray, unbatched: bool = True) -> TableState:
    """Directly write embedding values (ref Assign — restore / param-sync)."""
    if "data" in state:
        packed = gather_packed(spec, state, rows, unbatched=unbatched)
        packed = packed.at[..., :spec.dim].set(values.astype(jnp.float32))
        return scatter_packed(spec, state, rows, packed,
                              unbatched=unbatched)
    rows = _sanitize(rows, spec.capacity_per_shard)
    params = state["params"].at[rows].set(values.astype(spec.dtype), mode="drop")
    return {"params": params, "slots": state["slots"]}


def restore_packed_rows(spec: TableSpec, state: TableState, rows: jnp.ndarray,
                        packed: jnp.ndarray,
                        unbatched: bool = True) -> TableState:
    """Write full row state (params + optimizer slots) from a packed
    [k, width] value matrix — the two-tier revive path. Column layout is
    the packed layout (params, then per-segment slots in sorted-name
    order), which tiered.pack_rows matches."""
    if "data" in state:
        _, padded, _ = _layout(spec)
        k, w = packed.shape
        full = jnp.zeros((k, padded), jnp.float32).at[:, :w].set(packed)
        return scatter_packed(spec, state, rows, full, unbatched=unbatched)
    rows = _sanitize(rows, spec.capacity_per_shard)
    off = spec.dim
    params = state["params"].at[rows].set(
        packed[:, :off].astype(spec.dtype), mode="drop")
    new_slots = []
    for seg, seg_slots in zip(spec.segments, state["slots"]):
        d = {}
        for name in sorted(seg_slots):
            k = seg.optimizer.slot_spec(seg.dim)[name][0]
            d[name] = seg_slots[name].at[rows].set(
                packed[:, off:off + k].astype(seg_slots[name].dtype),
                mode="drop")
            off += k
        new_slots.append(d)
    return {"params": params, "slots": new_slots}


def params_view(spec: TableSpec, state: TableState) -> jnp.ndarray:
    """[..., cap, dim] params of a state in either storage mode."""
    if "data" in state:
        return state["data"][..., :spec.dim]
    return state["params"]


def slot_view(spec: TableSpec, state: TableState, seg_idx: int,
              name: str) -> jnp.ndarray:
    """[..., cap, k] optimizer slot array in either storage mode."""
    if "data" in state:
        off, k, _ = _layout(spec)[2][(seg_idx, name)]
        return state["data"][..., off:off + k]
    return state["slots"][seg_idx][name]


# ----------------------------------------------------------------------
# host-side accessors (checkpoint / export / streaming / tiered)
# ----------------------------------------------------------------------

def params_np(spec: TableSpec, shard_state) -> np.ndarray:
    """[cap, dim] params of one (host-fetched) shard state, f32."""
    if "data" in shard_state:
        return np.asarray(shard_state["data"], np.float32)[:, :spec.dim]
    return np.asarray(shard_state["params"], np.float32)


def slot_items_np(spec: TableSpec, shard_state) -> List[Tuple[str, np.ndarray]]:
    """[('seg{i}/{name}', [cap, k]), ...] for one shard, f32, sorted order."""
    out = []
    if "data" in shard_state:
        data = np.asarray(shard_state["data"], np.float32)
        _, _, slot_offs = _layout(spec)
        for i, seg in enumerate(spec.segments):
            for name in sorted(seg.optimizer.slot_spec(seg.dim)):
                off, k, _ = slot_offs[(i, name)]
                out.append((f"seg{i}/{name}", data[:, off:off + k]))
        return out
    for i, seg_slots in enumerate(shard_state["slots"]):
        for name, arr in sorted(seg_slots.items()):
            out.append((f"seg{i}/{name}", np.asarray(arr, np.float32)))
    return out


def slot_arrays(spec_or_state, state=None):
    """Back-compat shim: slot_arrays(spec, state) preferred; legacy
    slot_arrays(state) only works for structure-of-arrays states."""
    if state is None:
        st = spec_or_state
        out = []
        for i, seg_slots in enumerate(st["slots"]):
            for name, arr in sorted(seg_slots.items()):
                out.append((f"seg{i}/{name}", arr))
        return out
    return slot_items_np(spec_or_state, state)


def state_from_np(spec: TableSpec, pools: np.ndarray,
                  slot_stacks: Dict[str, np.ndarray],
                  packed: bool = None) -> TableState:
    """Build a device state (with leading shard axis) from host arrays:
    pools [S, cap, dim], slot_stacks {'seg{i}/{name}': [S, cap, k]}."""
    S, cap, _ = pools.shape
    if packed is None:
        packed = is_packed(spec)
    if packed:
        _, padded, slot_offs = _layout(spec)
        data = np.zeros((S, cap, padded), np.float32)
        data[:, :, :spec.dim] = pools
        for i, seg in enumerate(spec.segments):
            for name in seg.optimizer.slot_spec(seg.dim):
                off, k, init_value = slot_offs[(i, name)]
                key = f"seg{i}/{name}"
                if key in slot_stacks:
                    data[:, :, off:off + k] = slot_stacks[key]
                else:
                    data[:, :, off:off + k] = init_value
        return {"data": jnp.asarray(data).astype(spec.dtype)}
    state = {"params": jnp.asarray(pools).astype(spec.dtype), "slots": []}
    for i, seg in enumerate(spec.segments):
        d = {}
        for name, (k, init_value) in seg.optimizer.slot_spec(seg.dim).items():
            key = f"seg{i}/{name}"
            if key in slot_stacks:
                d[name] = jnp.asarray(slot_stacks[key])
            else:
                d[name] = jnp.full((S, cap, k), init_value, jnp.float32)
        state["slots"].append(d)
    return state
