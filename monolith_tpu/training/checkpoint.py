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
from typing import Optional

import jax
import numpy as np
from flax import serialization

from monolith_tpu.embedding import table as table_lib


def _tables_dir(path):
    return os.path.join(path, "tables")


def save(trainer, directory: str, evict_before_save: bool = False,
         dense_only: bool = False) -> str:
    """Save trainer state; returns the checkpoint path."""
    step = trainer.step
    path = os.path.join(directory, f"ckpt-{step}")
    os.makedirs(_tables_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, "filters"), exist_ok=True)

    if evict_before_save:
        now = int(time.time())
        for tname, spec in trainer.engine.tables.items():
            if spec.eviction.ttl_seconds > 0:
                trainer.engine.evict_expired(now - spec.eviction.ttl_seconds)

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
            state = jax.device_get(trainer.table_states[tname])
            num_shards = state["params"].shape[0]
            meta["tables"][tname] = {"shards": num_shards, "dim": spec.dim}
            for s in range(num_shards):
                store = trainer.engine.stores[tname][s]
                fids, rows, tss, counts = store.save()
                arrays = {"pool": state["params"][s],
                          "fids": fids, "rows": rows, "tss": tss,
                          "counts": counts}
                for name, arr in table_lib.slot_arrays(
                        jax.tree.map(lambda x: x[s], state)):
                    arrays["slot:" + name] = np.asarray(arr)
                np.savez(os.path.join(_tables_dir(path), f"{tname}-s{s}.npz"),
                         **arrays)
                blob = store.filter_save()
                if blob:
                    with open(os.path.join(path, "filters", f"{tname}-s{s}.bin"),
                              "wb") as f:
                        f.write(blob)

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
        state = jax.device_get(trainer.table_states[tname])
        num_shards = state["params"].shape[0]
        meta["tables"][tname] = {"shards": num_shards, "dim": spec.dim}
        for s in range(num_shards):
            store = trainer.engine.stores[tname][s]
            fids, rows, tss, counts = store.save()
            sel = tss >= np.uint32(since_ts)
            fids, rows, tss, counts = fids[sel], rows[sel], tss[sel], counts[sel]
            values = (np.asarray(state["params"][s], np.float32)[rows]
                      if len(rows) else np.zeros((0, spec.dim), np.float32))
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
    """Restore trainer state in place; returns the restored step."""
    import jax.numpy as jnp

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
            state = jax.device_get(trainer.table_states[tname])
            cur_shards = state["params"].shape[0]
            if tmeta["shards"] != cur_shards:
                raise ValueError(
                    f"checkpoint for table '{tname}' has {tmeta['shards']} "
                    f"shards but trainer is configured with {cur_shards}; "
                    f"resharding on restore is not supported yet")
            pools, slot_stacks = [], {}
            for s in range(tmeta["shards"]):
                z = np.load(os.path.join(_tables_dir(path), f"{tname}-s{s}.npz"))
                store = trainer.engine.stores[tname][s]
                store.restore(z["fids"], z["rows"], z["tss"], z["counts"])
                fpath = os.path.join(path, "filters", f"{tname}-s{s}.bin")
                if os.path.exists(fpath):
                    with open(fpath, "rb") as f:
                        store.filter_restore(f.read())
                pools.append(z["pool"])
                for k in z.files:
                    if k.startswith("slot:"):
                        slot_stacks.setdefault(k[5:], []).append(z[k])
            new_state = {"params": jnp.asarray(np.stack(pools)), "slots": []}
            for i, seg_slots in enumerate(state["slots"]):
                d = {}
                for name in seg_slots:
                    d[name] = jnp.asarray(np.stack(slot_stacks[f"seg{i}/{name}"]))
                new_state["slots"].append(d)
            trainer.table_states[tname] = new_state

    trainer.step = meta["step"]
    return meta["step"]
