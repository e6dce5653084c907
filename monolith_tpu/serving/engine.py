"""Serving-side inference engine.

TPU-native rebuild of the reference serving data path (TF-Serving graphs with
remote_predict to PS shards — distributed_ps.py:302-379, model_export
signatures): a `ServingModel` holds ONE merged read-only id->row store per
table (training shards are merged at load, giving resharding for free), a
device row pool with headroom for online updates, the dense params, and a
jitted forward. Realtime parameter sync lands through `apply_delta`
(ref: parameter-sync PushRequest apply, runtime/parameter_sync/*.cc).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from monolith_tpu.embedding import table as table_lib
from monolith_tpu.embedding.host_store import Batcher, HostStore
from monolith_tpu.feature import combine
from monolith_tpu.training.task import RecTask


class ServingModel:
    """Loads an export and serves predictions; accepts online row deltas.

    Row-sharded serving (ref DistributedExporter per-PS sub-graphs,
    saved_model_exporters.py:571 + distributed_ps.py:302-379): pass
    `num_row_shards` > 1 and a `shard_index` to load only the rows whose
    `shard_of(fid, num_row_shards) == shard_index` — the replica then acts
    as one embedding shard behind `lookup_rows`, with a
    `ShardedServingRouter` playing the reference's "entry" graph. Training
    shard count is irrelevant (files are re-routed at load), so serving can
    scale to however many replicas the table needs to fit in RAM."""

    def __init__(self, task: RecTask, export_path: str,
                 headroom: float = 0.25, unique_cap: int = 8192,
                 shard_index: int = 0, num_row_shards: int = 1):
        self.task = task
        self.module = task.build_module()
        self.tables = {t.name: t for t in task.tables()}
        self.features = {f.name: f for f in task.features()}
        self.unique_cap = unique_cap
        self.shard_index = shard_index
        self.num_row_shards = num_row_shards
        self.headroom = headroom
        self._lock = threading.Lock()

        with open(os.path.join(export_path, "meta.json")) as f:
            self.meta = json.load(f)
        self.step = self.meta["step"]

        with open(os.path.join(export_path, "dense.msgpack"), "rb") as f:
            dense_bytes = f.read()
        self.params = None  # template built lazily on first predict
        self._dense_bytes = dense_bytes
        ms_path = os.path.join(export_path, "model_state.msgpack")
        self._model_state_bytes = None
        if os.path.exists(ms_path):
            with open(ms_path, "rb") as f:
                self._model_state_bytes = f.read()
        self.model_state = {}

        self.stores: Dict[str, HostStore] = {}
        self.pools: Dict[str, jnp.ndarray] = {}
        self.capacity: Dict[str, int] = {}
        for tname, tmeta in self.meta["tables"].items():
            spec = self.tables[tname]
            total_live = 0
            all_fids, all_rows_vals = [], []
            for s in range(tmeta["shards"]):
                z = np.load(os.path.join(export_path, "tables", f"{tname}-s{s}.npz"))
                fids = z["fids"]
                segs = []
                for i, seg in enumerate(spec.segments):
                    blob = {k.split(":", 1)[1]: z[k] for k in z.files
                            if k.startswith(f"seg{i}:")}
                    segs.append(seg.compressor.decompress(blob)
                                if len(fids) else np.zeros((0, seg.dim), np.float32))
                vals = (np.concatenate(segs, axis=1) if segs
                        else np.zeros((len(fids), spec.dim), np.float32))
                if self.num_row_shards > 1 and len(fids):
                    from monolith_tpu.embedding.host_store import shard_of_batch
                    keep = (shard_of_batch(fids, self.num_row_shards)
                            == self.shard_index)
                    fids, vals = fids[keep], vals[keep]
                all_fids.append(fids)
                all_rows_vals.append(vals)
                total_live += len(fids)
            cap = int(total_live * (1 + headroom)) + 1024
            self.capacity[tname] = cap
            store = HostStore(row_capacity=cap)
            pool = np.zeros((cap, spec.dim), dtype=np.float32)
            for fids, vals in zip(all_fids, all_rows_vals):
                if len(fids) == 0:
                    continue
                rows, _, _ = store.assign(fids)
                pool[rows] = vals
            self.stores[tname] = store
            self.pools[tname] = jnp.asarray(pool)
        self._batchers = {t: Batcher(expected_unique=unique_cap)
                          for t in self.tables}
        self._jit_fwd = None

    # ------------------------------------------------------------------

    def _forward(self, pools, params, inputs, batch):
        pooled = {}
        for tname, tin in inputs.items():
            spec = self.tables[tname]
            buf = table_lib.lookup(
                spec, {"params": pools[tname], "slots": []}, tin["rows"])
            n = buf.shape[0]
            for fname, idx in tin["index"].items():
                f = self.features[fname]
                idx = jnp.asarray(idx)
                safe = jnp.where(idx < 0, jnp.int32(n), idx.astype(jnp.int32))
                emb = buf.at[safe].get(mode="fill", fill_value=0)
                pooled[fname] = combine(emb, idx >= 0, f.combiner)
        out = self.module.apply(params, pooled, batch, training=False)
        return self.task.predictions(out), out["logits"]

    def _prepare(self, fid_batch):
        inputs = {}
        table_feats: Dict[str, list] = {}
        for fname, f in self.features.items():
            table_feats.setdefault(f.table, []).append(fname)
        for tname, fnames in table_feats.items():
            streams = [np.ascontiguousarray(fid_batch[f], dtype=np.int64)
                       for f in fnames]
            flat = np.concatenate([s.ravel() for s in streams])
            unique, index, counts, _ = self._batchers[tname].dedup(
                flat, num_shards=1, shard_cap=self.unique_cap)
            rows = np.full(self.unique_cap, -1, dtype=np.int32)
            c = int(counts[0])
            if c:
                rows[:c] = self.stores[tname].lookup(unique[0, :c])
            idx = {}
            off = 0
            for fname, stream in zip(fnames, streams):
                idx[fname] = index[off:off + stream.size].reshape(stream.shape)
                off += stream.size
            inputs[tname] = {"rows": rows, "index": idx}
        return inputs

    def predict(self, fid_batch: Dict[str, np.ndarray],
                batch: Optional[Dict[str, np.ndarray]] = None) -> np.ndarray:
        """Serve predictions for a batch of sparse features.

        The host prepare + pool snapshot happen under the version lock so a
        concurrent reload_export cannot pair old-store row indices with a
        new version's pools; the device forward runs outside it."""
        batch = batch or {}
        with self._lock:
            inputs, params = self._predict_host(fid_batch, batch)
            pools = dict(self.pools)
        if self._jit_fwd is None:
            self._jit_fwd = jax.jit(self._forward)
        preds, _ = self._jit_fwd(pools, params, inputs,
                                 {k: jnp.asarray(v) for k, v in batch.items()})
        return np.asarray(preds)

    def _predict_host(self, fid_batch, batch):
        """Host half of predict (caller holds self._lock)."""
        inputs = self._prepare(fid_batch)
        if self.params is None:
            # build a param template with the right treedef, then load bytes
            pooled_shapes = {}
            key = jax.random.PRNGKey(0)
            pools = self.pools
            pooled = {}
            for tname, tin in inputs.items():
                spec = self.tables[tname]
                buf = np.zeros((self.unique_cap, spec.dim), np.float32)
                for fname, idx in tin["index"].items():
                    f = self.features[fname]
                    emb = jnp.zeros((*idx.shape, spec.dim), jnp.float32)
                    pooled[fname] = combine(emb, jnp.asarray(idx) >= 0, f.combiner)
            template = dict(self.module.init(
                key, pooled, {k: jnp.asarray(v) for k, v in batch.items()},
                training=False))
            params_t = template.pop("params")
            self.model_state = template
            if self._model_state_bytes and template:
                self.model_state = serialization.from_bytes(
                    template, self._model_state_bytes)
            self.params = {"params": serialization.from_bytes(
                params_t, self._dense_bytes), **self.model_state}
        return inputs, self.params

    def lookup_rows(self, table: str, fids: np.ndarray) -> np.ndarray:
        """Embedding-shard role: raw id -> value lookup (missing ids read
        zeros). The reference's per-PS `raw_lookup` serving signature
        (distributed_ps.py:220-250); a ShardedServingRouter fans predict
        requests out to these."""
        fids = np.asarray(fids, np.int64)
        with self._lock:  # store+pool captured under one version
            rows = self.stores[table].lookup(fids)
            pool = np.asarray(self.pools[table])
        out = np.zeros((len(fids), pool.shape[1]), np.float32)
        ok = rows >= 0
        out[ok] = pool[rows[ok]]
        return out

    # ------------------------------------------------------------------
    # realtime updates (parameter sync receive path)

    def apply_delta(self, table: str, fids: np.ndarray,
                    values: np.ndarray) -> int:
        """Assign pushed rows (new ids admitted unconditionally). Returns the
        number of rows applied (ids beyond pool capacity are dropped)."""
        spec = self.tables[table]
        assert values.shape[1] == spec.dim
        with self._lock:  # assign + pool write under one version
            rows, _, _ = self.stores[table].assign(np.asarray(fids, np.int64))
            ok = rows >= 0
            self.pools[table] = table_lib.assign_rows(
                spec, {"params": self.pools[table], "slots": []},
                jnp.asarray(rows), jnp.asarray(values, jnp.float32))["params"]
        return int(ok.sum())

    def reload_dense(self, dense_bytes: bytes) -> None:
        """Hot-swap dense params (the reference's dense-only fast ckpt path)."""
        if self.params is not None:
            new_p = serialization.from_bytes(self.params["params"], dense_bytes)
            self.params = {"params": new_p, **self.model_state}
        else:
            self._dense_bytes = dense_bytes

    def reload_export(self, export_path: str) -> int:
        """Hot-swap the WHOLE model to a new export version, atomically.

        The reference's agent/TFS version state machine (agent_service
        replica_manager + tfs_monitor: watch for a new saved-model version,
        load it beside the serving one, swap, unload): the new version is
        built off to the side (memory briefly holds both, like TFS), then
        stores/pools/dense swap under the version lock so in-flight
        predicts never pair old row indices with new pools. Returns the new
        version's step."""
        fresh = ServingModel(self.task, export_path, headroom=self.headroom,
                             unique_cap=self.unique_cap,
                             shard_index=self.shard_index,
                             num_row_shards=self.num_row_shards)
        with self._lock:
            self.meta, self.step = fresh.meta, fresh.step
            self.stores, self.pools = fresh.stores, fresh.pools
            self.capacity = fresh.capacity
            self._batchers = fresh._batchers
            self._dense_bytes = fresh._dense_bytes
            self._model_state_bytes = fresh._model_state_bytes
            if self.params is not None:
                new_p = serialization.from_bytes(self.params["params"],
                                                 fresh._dense_bytes)
                if fresh._model_state_bytes and self.model_state:
                    self.model_state = serialization.from_bytes(
                        self.model_state, fresh._model_state_bytes)
                self.params = {"params": new_p, **self.model_state}
        return self.step

    def table_sizes(self) -> Dict[str, int]:
        return {t: s.size() for t, s in self.stores.items()}
