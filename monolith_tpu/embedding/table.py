"""Device-resident embedding table: row pool + per-row optimizer state.

TPU-native rebuild of the reference's embedding hash table value path
(ref: runtime/hash_table/embedding_hash_table_interface.h:34 Lookup/Assign/
BatchOptimize, entry_accessor.{h,cc} segment dispatch). The reference packs
[embedding | optimizer state | ts] into one host byte blob per ID; here each
table shard is a fixed-capacity structure-of-arrays in TPU HBM:

    params                       [capacity, dim]   (dim = sum of segment dims)
    slots[i][name]               [capacity, k]     per-segment optimizer state

Row indices are assigned by the host `HostStore`; all float math (init,
lookup, per-segment optimize) runs on device as pure jit-able functions of
(state, rows, grads). Rows = -1 (filtered / padded) read zeros and drop
updates via XLA gather/scatter OOB semantics (mode='fill'/'drop'), which is
how collisionless "missing id -> default value, no update" is expressed
without host branching. NOTE: JAX wraps negative indices BEFORE applying
mode, so -1 sentinels are remapped on device to `capacity` (a true OOB
index) by `_sanitize` first."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from monolith_tpu.embedding.spec import TableSpec

# state pytree: {"params": [cap, D], "slots": [ {name: [cap,k]}, ... ]}
TableState = Dict


def _sanitize(rows: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Map negative sentinel rows to a genuinely out-of-bounds index.

    JAX normalizes negative indices (wrap-around) BEFORE applying
    mode='fill'/'drop', so -1 would silently alias the last pool row."""
    return jnp.where(rows < 0, jnp.int32(capacity), rows.astype(jnp.int32))


def create_state(spec: TableSpec) -> TableState:
    """Allocate the device row pool + optimizer slot arrays for one shard."""
    cap = spec.capacity_per_shard
    params = jnp.zeros((cap, spec.dim), dtype=spec.dtype)
    slots: List[Dict[str, jnp.ndarray]] = []
    for seg in spec.segments:
        seg_slots = {}
        for name, (k, init_value) in seg.optimizer.slot_spec(seg.dim).items():
            seg_slots[name] = jnp.full((cap, k), init_value, dtype=jnp.float32)
        slots.append(seg_slots)
    return {"params": params, "slots": slots}


def init_rows(spec: TableSpec, state: TableState, rows: jnp.ndarray,
              key: jax.Array) -> TableState:
    """Initialize newly-admitted (or recycled) rows.

    `rows` is int32 [k], padded with -1 (dropped by scatter). Writes each
    segment's initializer values into params and RESETS optimizer slots to
    their init value — critical when a row is recycled after eviction so the
    new ID doesn't inherit stale accumulator state."""
    rows = _sanitize(rows, spec.capacity_per_shard)
    k = rows.shape[0]
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


def lookup(spec: TableSpec, state: TableState, rows: jnp.ndarray) -> jnp.ndarray:
    """Gather rows ([n] int32, -1 -> zeros) as [n, dim] float32."""
    rows = _sanitize(rows, spec.capacity_per_shard)
    emb = state["params"].at[rows].get(mode="fill", fill_value=0)
    return emb.astype(jnp.float32)


def apply_gradients(spec: TableSpec, state: TableState, rows: jnp.ndarray,
                    grads: jnp.ndarray, step: jnp.ndarray) -> TableState:
    """Per-segment per-row optimize (ref BatchOptimize,
    embedding_hash_table_interface.h:73).

    `rows` [m] must be unique (the host batcher dedups); -1 entries drop.
    `grads` [m, dim] are the summed gradients for each unique row."""
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
        key = jax.random.fold_in(jax.random.PRNGKey(0), step)
        p_new_full = stochastic_round_bf16(p_new_full, key)
    else:
        p_new_full = p_new_full.astype(spec.dtype)
    params = state["params"].at[rows].set(p_new_full, mode="drop")
    return {"params": params, "slots": new_slots}


def assign_rows(spec: TableSpec, state: TableState, rows: jnp.ndarray,
                values: jnp.ndarray) -> TableState:
    """Directly write embedding values (ref Assign — restore / param-sync)."""
    rows = _sanitize(rows, spec.capacity_per_shard)
    params = state["params"].at[rows].set(values.astype(spec.dtype), mode="drop")
    return {"params": params, "slots": state["slots"]}


def restore_packed_rows(spec: TableSpec, state: TableState, rows: jnp.ndarray,
                        packed: jnp.ndarray) -> TableState:
    """Write full row state (params + optimizer slots) from a packed [k,
    width] value matrix — the two-tier revive path (embedding/tiered.py).
    Column layout matches tiered.pack_rows: params, then each segment's slot
    arrays in sorted-name order."""
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


def slot_arrays(state: TableState) -> List[Tuple[str, jnp.ndarray]]:
    """Flat (name, array) list of optimizer state, for checkpointing."""
    out = []
    for i, seg_slots in enumerate(state["slots"]):
        for name, arr in sorted(seg_slots.items()):
            out.append((f"seg{i}/{name}", arr))
    return out
