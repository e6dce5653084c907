"""Checkpoint save/restore for trainer state.

TPU-native rebuild of the reference checkpoint layer (PartialRecoverySaver
save_utils.py:512; hash tables saved as sharded EntryDump files via saver
listeners hash_table_ops.py:591; hash-filter split dumps hash_filter_ops.py:139).

Layout (one directory per step):
    <dir>/ckpt-<step>/
        meta.json                      step, ts, table inventory
        dense.msgpack                  flax params
        opt_state.msgpack              dense optimizer state
        tables/<table>-s<k>.npz        pool params + optimizer slot arrays +
                                       host map dump (fids/rows/ts/counts)
        filters/<table>-s<k>.bin       admission-filter state
    <dir>/CHECKPOINT                   latest step pointer

Tables are saved per (table, shard) so restore can be partial: shards that
are still alive keep their state; lost shards restore from their own file
(the reference's partial_recovery, save_utils.py:433). Eviction-before-save
is supported via `evict_before_save`.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np
from flax import serialization

from monolith_tpu.embedding import table as table_lib


def _tables_dir(path):
    return os.path.join(path, "tables")


def _save_archives(trainer, path):
    """Persist tiered-storage host archives (spilled full-row state) so a
    restart does not lose cold rows — the reference's host-RAM tables are
    part of its checkpoint (hash_table dump covers every stored entry).
    Each process writes only its local (materialized) shards."""
    archives = getattr(trainer.engine, "archives", None)
    if not archives:
        return
    adir = os.path.join(path, "archives")
    os.makedirs(adir, exist_ok=True)
    for tname, shards in archives.items():
        for s, arch in enumerate(shards):
            if arch is not None and arch.size() > 0:
                arch.save(os.path.join(adir, f"{tname}-s{s}.npz"))


def _restore_archives(trainer, path):
    """Archive files are keyed by global shard id; restoring at a DIFFERENT
    total shard count leaves fids in archives their new owner shard never
    queries — those cold rows degrade to plain evictions (re-initialized on
    next sight), which is safe but lossy. Reshard with matching shard
    counts (or accept the cold-row reset) — the hot rows ride the table
    reshard path regardless."""
    archives = getattr(trainer.engine, "archives", None)
    adir = os.path.join(path, "archives")
    if not archives or not os.path.isdir(adir):
        return
    for tname, shards in archives.items():
        for s, arch in enumerate(shards):
            p = os.path.join(adir, f"{tname}-s{s}.npz")
            if arch is not None and os.path.exists(p):
                arch.restore(p)


def save(trainer, directory: str, evict_before_save: bool = False,
         dense_only: bool = False) -> str:
    """Save trainer state; returns the checkpoint path. Multi-process
    trainers (globally-sharded, not fully addressable table state) route to
    save_distributed transparently."""
    leaves = jax.tree.leaves(trainer.table_states)
    if leaves and not getattr(leaves[0], "is_fully_addressable", True):
        return save_distributed(trainer, directory,
                                evict_before_save=evict_before_save,
                                dense_only=dense_only)
    step = trainer.step
    path = os.path.join(directory, f"ckpt-{step}")
    os.makedirs(_tables_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, "filters"), exist_ok=True)

    if evict_before_save:
        now = int(time.time())
        for tname, spec in trainer.engine.tables.items():
            if spec.eviction.ttl_seconds > 0:
                # trainer-level evict zeroes the freed device rows too
                trainer.evict_expired(now - spec.eviction.ttl_seconds)

    if trainer.params is not None:
        with open(os.path.join(path, "dense.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(trainer.params)))
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(trainer.opt_state)))
        if getattr(trainer, "model_state", None):
            with open(os.path.join(path, "model_state.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(
                    jax.device_get(trainer.model_state)))

    meta = {"step": step, "ts": int(time.time()), "dense_only": dense_only,
            "tables": {}}
    if not dense_only:
        for tname, spec in trainer.engine.tables.items():
            dev_state = trainer.table_states[tname]
            num_shards = jax.tree.leaves(dev_state)[0].shape[0]
            meta["tables"][tname] = {"shards": num_shards, "dim": spec.dim}
            for s in range(num_shards):
                store = trainer.engine.stores[tname][s]
                fids, rows, tss, counts = store.save()
                # Live-prefix fetch: rows come from a dense free-list /
                # fresh counter, so every live row sits below the
                # high-water mark — slice on device and read back only
                # that prefix (the reference dumps only live entries,
                # embedding_hash_table.proto EntryDump; a full-capacity
                # readback of a mostly-empty pool costs minutes on
                # tunnel-attached chips, PERF.md round-4).
                hw = int(rows.max()) + 1 if len(rows) else 0
                shard = jax.device_get(
                    jax.tree.map(lambda x: x[s, :hw], dev_state))
                arrays = {"pool": table_lib.params_np(spec, shard),
                          "fids": fids, "rows": rows, "tss": tss,
                          "counts": counts}
                for name, arr in table_lib.slot_items_np(spec, shard):
                    arrays["slot:" + name] = arr
                np.savez(os.path.join(_tables_dir(path), f"{tname}-s{s}.npz"),
                         **arrays)
                blob = store.filter_save()
                if blob:
                    with open(os.path.join(path, "filters", f"{tname}-s{s}.bin"),
                              "wb") as f:
                        f.write(blob)

    _save_archives(trainer, path)

    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(directory, "CHECKPOINT"), "w") as f:
        f.write(str(step))
    return path


def save_delta(trainer, directory: str, since_ts: int,
               base_step: Optional[int] = None) -> str:
    """Incremental checkpoint: save only rows whose last update ts >= since_ts
    (the reference's incremental delta snapshots for realtime training /
    serving refresh). Layout: <dir>/delta-<step>/<table>-s<k>.npz with
    (fids, ts, counts, values) — row indices are NOT saved; restore_delta
    re-assigns rows through the host map.
    """
    step = trainer.step
    path = os.path.join(directory, f"delta-{step}")
    os.makedirs(path, exist_ok=True)
    meta = {"step": step, "since_ts": int(since_ts), "base_step": base_step,
            "ts": int(time.time()), "tables": {}}
    for tname, spec in trainer.engine.tables.items():
        dev_state = trainer.table_states[tname]
        num_shards = jax.tree.leaves(dev_state)[0].shape[0]
        meta["tables"][tname] = {"shards": num_shards, "dim": spec.dim}
        for s in range(num_shards):
            store = trainer.engine.stores[tname][s]
            fids, rows, tss, counts = store.save()
            sel = tss >= np.uint32(since_ts)
            fids, rows, tss, counts = fids[sel], rows[sel], tss[sel], counts[sel]
            if len(rows):
                # gather ONLY the delta rows on device, read back that
                # (n, dim) slice — never the full pool
                import jax.numpy as jnp
                ridx = jnp.asarray(rows)
                shard_rows = jax.tree.map(lambda x: x[s][ridx], dev_state)
                values = table_lib.params_np(spec,
                                             jax.device_get(shard_rows))
            else:
                values = np.zeros((0, spec.dim), np.float32)
            np.savez(os.path.join(path, f"{tname}-s{s}.npz"),
                     fids=fids, tss=tss, counts=counts, values=values)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def restore_delta(trainer, delta_path: str) -> int:
    """Apply an incremental checkpoint on top of current state: new ids are
    admitted through the host map, existing ids overwritten. Optimizer slot
    state is NOT in deltas (full checkpoints carry it); rows newly admitted
    here keep freshly-initialized slots."""
    import jax.numpy as jnp
    from monolith_tpu.embedding import table as table_lib

    with open(os.path.join(delta_path, "meta.json")) as f:
        meta = json.load(f)
    applied = 0
    for tname, tmeta in meta["tables"].items():
        spec = trainer.engine.tables[tname]
        for s in range(tmeta["shards"]):
            z = np.load(os.path.join(delta_path, f"{tname}-s{s}.npz"))
            fids = z["fids"]
            if len(fids) == 0:
                continue
            store = trainer.engine.stores[tname][s]
            rows, _, _ = store.assign(fids, ts=int(meta["ts"]))
            ok = rows >= 0
            shard_state = jax.tree.map(lambda x: x[s],
                                       trainer.table_states[tname])
            shard_state = table_lib.assign_rows(
                spec, shard_state, jnp.asarray(rows), jnp.asarray(z["values"]))
            trainer.table_states[tname] = jax.tree.map(
                lambda full, sh: full.at[s].set(sh),
                trainer.table_states[tname], shard_state)
            applied += int(ok.sum())
    trainer.step = meta["step"]
    return applied


def latest_step(directory: str) -> Optional[int]:
    p = os.path.join(directory, "CHECKPOINT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def restore(trainer, directory: str, step: Optional[int] = None) -> int:
    """Restore trainer state in place; returns the restored step.
    Multi-process trainers route to restore_distributed transparently."""
    import jax.numpy as jnp

    leaves = jax.tree.leaves(trainer.table_states)
    if leaves and not getattr(leaves[0], "is_fully_addressable", True):
        return restore_distributed(trainer, directory, step=step)

    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no CHECKPOINT in {directory}")
    path = os.path.join(directory, f"ckpt-{step}")
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    dense_path = os.path.join(path, "dense.msgpack")
    if os.path.exists(dense_path):
        if trainer.params is None:
            raise ValueError(
                "dense params must be initialized before restore (run one "
                "prepare/_maybe_init or a warmup step first)")
        with open(dense_path, "rb") as f:
            trainer.params = serialization.from_bytes(trainer.params, f.read())
        with open(os.path.join(path, "opt_state.msgpack"), "rb") as f:
            trainer.opt_state = serialization.from_bytes(trainer.opt_state, f.read())
        ms_path = os.path.join(path, "model_state.msgpack")
        if os.path.exists(ms_path) and getattr(trainer, "model_state", None):
            with open(ms_path, "rb") as f:
                trainer.model_state = serialization.from_bytes(
                    trainer.model_state, f.read())

    if not meta.get("dense_only"):
        for tname, tmeta in meta["tables"].items():
            spec = trainer.engine.tables[tname]
            state = trainer.table_states[tname]  # shapes/mode only — no d2h
            cur_shards = jax.tree.leaves(state)[0].shape[0]
            if tmeta["shards"] != cur_shards:
                _restore_resharded(trainer, tname, spec, path,
                                   tmeta["shards"], cur_shards, state)
                continue
            cap = spec.capacity_per_shard
            init_of = _slot_init_values(spec)
            pools, slot_stacks = [], {}
            for s in range(tmeta["shards"]):
                z = np.load(os.path.join(_tables_dir(path), f"{tname}-s{s}.npz"))
                store = trainer.engine.stores[tname][s]
                store.restore(z["fids"], z["rows"], z["tss"], z["counts"])
                fpath = os.path.join(path, "filters", f"{tname}-s{s}.bin")
                if os.path.exists(fpath):
                    with open(fpath, "rb") as f:
                        store.filter_restore(f.read())
                # live-prefix checkpoints store pool[:high_water]; pad back
                # to capacity (params zero like fresh alloc, slots at their
                # optimizer init values like create_state)
                pools.append(_pad_rows(z["pool"], cap, 0.0))
                for k in z.files:
                    if k.startswith("slot:"):
                        slot_stacks.setdefault(k[5:], []).append(
                            _pad_rows(z[k], cap, init_of.get(k[5:], 0.0)))
            new_state = table_lib.state_from_np(
                spec, np.stack(pools),
                {k: np.stack(v) for k, v in slot_stacks.items()},
                packed="data" in state)
            trainer.table_states[tname] = _place_like_trainer(trainer, new_state)

    _restore_archives(trainer, path)
    trainer.step = meta["step"]
    return meta["step"]


def _restore_resharded(trainer, tname, spec, path, old_shards: int,
                       new_shards: int, state) -> None:
    """Restore a table whose checkpoint shard count differs from the current
    trainer's (scale the job up or down between runs).

    Every entry (fid, ts, count, params, optimizer slots) is re-routed to
    `shard_of(fid, new_shards)` — the same hash the host batcher uses at
    training time — and packed into contiguous rows per new shard. Admission
    filters are NOT carried over (count-min state is keyed to the old shard
    layout); live ids are already admitted via the restored map, so only the
    occurrence window for not-yet-admitted ids resets.

    Reference equivalent: the reference requires identical num_ps on restore
    for training (save_utils.py PartialRecoverySaver) and reshards only at
    export/serving; here training restore reshards too.
    """
    import jax.numpy as jnp

    from monolith_tpu.embedding.host_store import shard_of_batch

    # 1. collect every entry across the old shards
    all_fids, all_tss, all_counts = [], [], []
    pool_vals = []          # [n, dim] per old shard
    slot_vals = {}          # key -> [n, k] per old shard
    pool_dtype = None
    for s in range(old_shards):
        z = np.load(os.path.join(_tables_dir(path), f"{tname}-s{s}.npz"))
        fids, rows = z["fids"], z["rows"]
        all_fids.append(fids)
        all_tss.append(z["tss"])
        all_counts.append(z["counts"])
        pool = z["pool"]
        pool_dtype = pool.dtype
        pool_vals.append(pool[rows] if len(rows) else pool[:0])
        for k in z.files:
            if k.startswith("slot:"):
                arr = z[k]
                slot_vals.setdefault(k[5:], []).append(
                    arr[rows] if len(rows) else arr[:0])
    fids = np.concatenate(all_fids) if all_fids else np.empty(0, np.int64)
    tss = np.concatenate(all_tss) if all_tss else np.empty(0, np.uint32)
    counts = (np.concatenate(all_counts) if all_counts
              else np.empty(0, np.uint32))
    values = (np.concatenate(pool_vals)
              if pool_vals else np.empty((0, spec.dim), np.float32))
    slots_cat = {k: np.concatenate(v) for k, v in slot_vals.items()}

    # 2. route to new shards with the batcher's hash (vectorized: one numpy
    # pass over all fids, not one ctypes call per fid)
    dest = shard_of_batch(fids, new_shards)
    cap = spec.capacity_per_shard
    pools = np.zeros((new_shards, cap, spec.dim), dtype=np.float32)
    slot_out = {k: np.zeros((new_shards, cap) + v.shape[1:], dtype=v.dtype)
                for k, v in slots_cat.items()}
    # untouched rows keep slot init values
    for i, seg in enumerate(spec.segments):
        for name, (k, init_value) in seg.optimizer.slot_spec(seg.dim).items():
            key = f"seg{i}/{name}"
            if key in slot_out and init_value != 0.0:
                slot_out[key][:] = init_value
    for s in range(new_shards):
        sel = dest == s
        n = int(sel.sum())
        if n > cap:
            raise ValueError(
                f"resharding table '{tname}' {old_shards}->{new_shards}: "
                f"shard {s} needs {n} rows but capacity_per_shard is {cap}")
        rows = np.arange(n, dtype=np.int32)
        store = trainer.engine.stores[tname][s]
        store.restore(fids[sel], rows, tss[sel], counts[sel])
        pools[s, :n] = values[sel]
        for k, v in slots_cat.items():
            slot_out[k][s, :n] = v[sel]

    # 3. rebuild the device state in the trainer's storage mode
    new_state = table_lib.state_from_np(spec, pools, slot_out,
                                        packed="data" in state)
    trainer.table_states[tname] = _place_like_trainer(trainer, new_state)


def _pad_rows(arr: np.ndarray, cap: int, fill: float) -> np.ndarray:
    """Pad a live-prefix array [h, ...] back to [cap, ...] with `fill`."""
    if arr.shape[0] >= cap:
        return arr
    full = np.full((cap,) + arr.shape[1:], fill, dtype=arr.dtype)
    full[:arr.shape[0]] = arr
    return full


def _slot_init_values(spec) -> Dict[str, float]:
    """{'seg{i}/{name}': init_value} for every optimizer slot."""
    out = {}
    for i, seg in enumerate(spec.segments):
        for name, (_, init_value) in seg.optimizer.slot_spec(seg.dim).items():
            out[f"seg{i}/{name}"] = init_value
    return out


def _shard_data(arr, s: int, hw: Optional[int] = None) -> np.ndarray:
    """Shard s of a globally-sharded array (leading axis = shard axis);
    only valid for shards addressable from this process. hw: read back only
    the live prefix [:hw] of the row axis (sliced on device, so the d2h
    transfer is O(live rows), not O(capacity))."""
    for sh in arr.addressable_shards:
        idx0 = sh.index[0]
        start = idx0.start if idx0.start is not None else 0
        if start == s:
            data = sh.data
            if hw is not None:
                data = data[:, :hw]
            return np.asarray(data)[0]
    raise ValueError(f"shard {s} is not addressable from this process")


def _zeroed_rows(arr: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Copy of `arr` with the given row indices zeroed."""
    out = np.array(arr, copy=True)
    out[rows] = 0
    return out


def save_distributed(trainer, directory: str,
                     evict_before_save: bool = False,
                     dense_only: bool = False) -> str:
    """Multi-process checkpoint save for MultiHostTrainer: each process
    writes ONLY its own table shards (per-shard files in the same layout as
    `save`, so single-host `restore` / `_restore_resharded` can read them);
    process 0 writes the dense state and metadata. All processes
    barrier-sync before the CHECKPOINT pointer lands, so a checkpoint is
    never observable half-written.

    Reference equivalent: hash tables are saved outside the TF ckpt as
    per-table sharded dumps by each worker's saver listener
    (hash_table_ops.py:591, save_utils.py:512)."""
    from jax.experimental import multihost_utils

    # a step dispatched-but-not-executed would admit ids through its map
    # callback AFTER store.save() below read the host map, pairing a
    # pre-step store snapshot with post-step pools — sync first (same
    # hazard class as evict/spill, see MultiHostTrainer._sync_inflight)
    if hasattr(trainer, "_sync_inflight"):
        trainer._sync_inflight()

    step = trainer.step
    path = os.path.join(directory, f"ckpt-{step}")
    os.makedirs(_tables_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, "filters"), exist_ok=True)
    proc0 = jax.process_index() == 0

    if evict_before_save:
        now = int(time.time())
        for tname, spec in trainer.engine.tables.items():
            if spec.eviction.ttl_seconds > 0:
                # trainer-level evict zeroes the freed device rows too
                trainer.evict_expired(now - spec.eviction.ttl_seconds)

    if proc0 and trainer.params is not None:
        with open(os.path.join(path, "dense.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(trainer.params)))
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(trainer.opt_state)))
        if getattr(trainer, "model_state", None):
            with open(os.path.join(path, "model_state.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(
                    jax.device_get(trainer.model_state)))

    meta = {"step": step, "ts": int(time.time()),
            "dense_only": dense_only, "tables": {}}
    for tname, spec in trainer.engine.tables.items():
        if dense_only:
            break
        state = trainer.table_states[tname]
        num_shards = jax.tree.leaves(state)[0].shape[0]
        meta["tables"][tname] = {"shards": num_shards, "dim": spec.dim}
        for s in trainer.local_device_ids:
            store = trainer.engine.stores[tname][s]
            fids, rows, tss, counts = store.save()
            # live-prefix readback, matching single-host save(): rows come
            # from a dense free-list, so every live row sits below the
            # high-water mark — slice on device, read back O(live rows)
            hw = int(rows.max()) + 1 if len(rows) else 0
            shard = jax.tree.map(lambda x: _shard_data(x, s, hw), state)
            # rows freed by evict/spill whose deferred in-step zeroing has
            # not drained yet (MultiHostTrainer._pending_zero) still hold
            # the evicted ids' content on device — zero them in the SAVED
            # copy so a restore never resurrects stale state (pending rows
            # at/above the high-water mark are simply not saved; restore
            # pads them back with zeros/init values)
            pend = getattr(trainer, "_pending_zero", {}).get(tname, {})
            if pend.get(s):
                zr = np.fromiter(pend[s], dtype=np.int64)
                zr = zr[zr < hw]
                if len(zr):
                    shard = jax.tree.map(
                        lambda x: _zeroed_rows(x, zr), shard)
            arrays = {"pool": table_lib.params_np(spec, shard),
                      "fids": fids, "rows": rows, "tss": tss,
                      "counts": counts}
            for name, arr in table_lib.slot_items_np(spec, shard):
                arrays["slot:" + name] = arr
            np.savez(os.path.join(_tables_dir(path), f"{tname}-s{s}.npz"),
                     **arrays)
            blob = store.filter_save()
            if blob:
                with open(os.path.join(path, "filters",
                                       f"{tname}-s{s}.bin"), "wb") as f:
                    f.write(blob)

    _save_archives(trainer, path)  # each process: its local shards only

    multihost_utils.sync_global_devices(f"mt_ckpt_save_{step}")
    if proc0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(directory, "CHECKPOINT"), "w") as f:
            f.write(str(step))
    multihost_utils.sync_global_devices(f"mt_ckpt_done_{step}")
    return path


def restore_distributed(trainer, directory: str,
                        step: Optional[int] = None) -> int:
    """Multi-process restore for MultiHostTrainer: each process restores
    ONLY its local shards. Works from checkpoints written by
    `save_distributed` OR single-host `save` (same layout), at the same or
    a DIFFERENT shard count — when counts differ, every entry is re-routed
    to shard_of(fid, new_shards) (this process keeps only entries routed to
    its local shards)."""
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    from monolith_tpu.embedding.host_store import shard_of_batch

    # in-flight steps must land before state is replaced, and any queued
    # recycled-row zeroing belongs to the PRE-restore mapping: the restored
    # store may map those rows to live fids again, and the saved pool
    # already holds zeros for whatever was pending at save time
    if hasattr(trainer, "_sync_inflight"):
        trainer._sync_inflight()
    for pend in getattr(trainer, "_pending_zero", {}).values():
        for s in pend:
            pend[s].clear()

    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no CHECKPOINT in {directory}")
    path = os.path.join(directory, f"ckpt-{step}")
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)

    dense_path = os.path.join(path, "dense.msgpack")
    if os.path.exists(dense_path):
        if trainer.params is None:
            raise ValueError("dense params must be initialized before "
                             "restore (run one train_step first)")
        with open(dense_path, "rb") as f:
            trainer.params = serialization.from_bytes(trainer.params, f.read())
        with open(os.path.join(path, "opt_state.msgpack"), "rb") as f:
            trainer.opt_state = serialization.from_bytes(trainer.opt_state,
                                                         f.read())
        ms_path = os.path.join(path, "model_state.msgpack")
        if os.path.exists(ms_path) and getattr(trainer, "model_state", None):
            with open(ms_path, "rb") as f:
                trainer.model_state = serialization.from_bytes(
                    trainer.model_state, f.read())

    new_shards = trainer.num_devices
    shard = NamedSharding(trainer.mesh, P(trainer.axis))
    for tname, tmeta in meta["tables"].items():
        spec = trainer.engine.tables[tname]
        old_shards = tmeta["shards"]
        cap = spec.capacity_per_shard
        local_states = {}  # s -> {"pool": [cap, dim], "slot:...": ...}
        if old_shards == new_shards:
            for s in trainer.local_device_ids:
                z = np.load(os.path.join(_tables_dir(path),
                                         f"{tname}-s{s}.npz"))
                store = trainer.engine.stores[tname][s]
                store.restore(z["fids"], z["rows"], z["tss"], z["counts"])
                fpath = os.path.join(path, "filters", f"{tname}-s{s}.bin")
                if os.path.exists(fpath):
                    with open(fpath, "rb") as f:
                        store.filter_restore(f.read())
                # checkpoints (single-host save AND save_distributed) store
                # the live prefix pool[:high_water]; pad back to capacity
                # (ADVICE r4 high: restoring a live-prefix file unpadded
                # built tables with capacity == high-water mark)
                init_of = _slot_init_values(spec)
                st = {}
                for k in z.files:
                    if k == "pool":
                        st[k] = _pad_rows(z[k], cap, 0.0)
                    elif k.startswith("slot:"):
                        st[k] = _pad_rows(z[k], cap, init_of.get(k[5:], 0.0))
                    else:
                        st[k] = z[k]
                local_states[s] = st
        else:
            # reshard: route every old entry to its new shard; keep local
            fids_l, tss_l, counts_l, vals_l = [], [], [], []
            slots_l = {}
            for so in range(old_shards):
                z = np.load(os.path.join(_tables_dir(path),
                                         f"{tname}-s{so}.npz"))
                fids, rows = z["fids"], z["rows"]
                fids_l.append(fids)
                tss_l.append(z["tss"])
                counts_l.append(z["counts"])
                vals_l.append(z["pool"][rows] if len(rows)
                              else z["pool"][:0])
                for k in z.files:
                    if k.startswith("slot:"):
                        arr = z[k]
                        slots_l.setdefault(k, []).append(
                            arr[rows] if len(rows) else arr[:0])
            fids = np.concatenate(fids_l) if fids_l else np.empty(0, np.int64)
            tss = np.concatenate(tss_l) if tss_l else np.empty(0, np.uint32)
            counts = (np.concatenate(counts_l) if counts_l
                      else np.empty(0, np.uint32))
            values = (np.concatenate(vals_l) if vals_l
                      else np.empty((0, spec.dim), np.float32))
            slots_cat = {k: np.concatenate(v) for k, v in slots_l.items()}
            dest = shard_of_batch(fids, new_shards)
            for s in trainer.local_device_ids:
                sel = dest == s
                n = int(sel.sum())
                if n > cap:
                    raise ValueError(
                        f"resharding table '{tname}' {old_shards}->"
                        f"{new_shards}: shard {s} needs {n} rows but "
                        f"capacity_per_shard is {cap}")
                rows = np.arange(n, dtype=np.int32)
                store = trainer.engine.stores[tname][s]
                store.restore(fids[sel], rows, tss[sel], counts[sel])
                pool = np.zeros((cap, spec.dim), np.float32)
                pool[:n] = values[sel]
                st = {"pool": pool, "fids": fids[sel], "rows": rows,
                      "tss": tss[sel], "counts": counts[sel]}
                for k, v in slots_cat.items():
                    arr = np.zeros((cap,) + v.shape[1:], v.dtype)
                    # untouched rows keep slot init values
                    _fill_slot_init(spec, k[5:], arr)
                    arr[:n] = v[sel]
                    st[k] = arr
                local_states[s] = st

        # build the global device state from the local shard arrays
        packed = trainer.engine.packed
        example = next(iter(local_states.values()))
        single = table_lib.state_from_np(
            spec, example["pool"][None],
            {k[5:]: example[k][None] for k in example if k.startswith("slot:")},
            packed=packed)

        def make_leaf(path_key, leaf0):
            def getter(s):
                st = local_states[s]
                sh = table_lib.state_from_np(
                    spec, st["pool"][None],
                    {k[5:]: st[k][None] for k in st
                     if k.startswith("slot:")}, packed=packed)
                return np.asarray(jax.tree.leaves(sh)[path_key])[0]
            return jax.make_array_from_callback(
                (new_shards,) + leaf0.shape[1:], shard,
                lambda idx: getter(idx[0].start or 0)[None])

        leaves0, treedef = jax.tree.flatten(single)
        new_leaves = [make_leaf(i, leaf0) for i, leaf0 in enumerate(leaves0)]
        trainer.table_states[tname] = jax.tree.unflatten(treedef, new_leaves)

    _restore_archives(trainer, path)
    trainer.step = meta["step"]
    return meta["step"]


def _fill_slot_init(spec, slot_key: str, arr: np.ndarray) -> None:
    """Fill a slot array with its optimizer init value ('seg{i}/{name}')."""
    seg_idx, name = slot_key.split("/", 1)
    seg = spec.segments[int(seg_idx[3:])]
    init_value = seg.optimizer.slot_spec(seg.dim)[name][1]
    if init_value != 0.0:
        arr[:] = init_value


def _place_like_trainer(trainer, state):
    """Shard restored pools over the trainer's mesh (no-op single device)."""
    mesh = getattr(trainer, "mesh", None)
    if mesh is None:
        return state
    from jax.sharding import NamedSharding, PartitionSpec as P
    shard = NamedSharding(mesh, P(trainer.axis))
    return jax.tree.map(lambda x: jax.device_put(x, shard), state)
