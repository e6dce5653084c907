"""Entry router for row-sharded serving.

TPU-native rebuild of the reference's distributed serving entry graph
(DistributedExporter "entry" + per-PS "ps_i" sub-graphs resolved through
remote_predict — model_export/saved_model_exporters.py:571,
distributed_ps.py:302-379): N serving replicas each hold one row-shard of
every table (`ServingModel(shard_index=s, num_row_shards=N)`); the router
holds only the dense tower, dedups each request's ids, fans the unique ids
out to their owning shards (`shard_of(fid, N)` — the SAME hash training
uses), merges the returned rows into the unique buffer, and runs
pool + dense forward locally. Predictions are bit-identical to a
single-replica ServingModel because every embedding value and the
per-example pooling order are identical.
"""

from __future__ import annotations

import json
import os
from concurrent import futures
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from monolith_tpu.embedding.host_store import Batcher
from monolith_tpu.feature import combine
from monolith_tpu.training.task import RecTask


class ShardedServingRouter:
    """Routes predict requests over row-shard replicas.

    `shards`: {shard_index: replica} where a replica is anything with
    `lookup(table, fids)` (a ServingClient) or `lookup_rows(table, fids)`
    (an in-process ServingModel). Must cover shards 0..num_row_shards-1.
    """

    def __init__(self, task: RecTask, export_path: str, shards: Dict[int, object],
                 num_row_shards: Optional[int] = None, unique_cap: int = 8192):
        self.task = task
        self.module = task.build_module()
        self.tables = {t.name: t for t in task.tables()}
        self.features = {f.name: f for f in task.features()}
        self.unique_cap = unique_cap
        self.num_row_shards = num_row_shards or len(shards)
        self._lookups = {}
        for s, rep in shards.items():
            fn = getattr(rep, "lookup", None) or getattr(rep, "lookup_rows")
            self._lookups[int(s)] = fn
        for s in range(self.num_row_shards):
            if s not in self._lookups:
                raise ValueError(f"no replica for row shard {s}")

        with open(os.path.join(export_path, "meta.json")) as f:
            self.meta = json.load(f)
        self.step = self.meta["step"]
        with open(os.path.join(export_path, "dense.msgpack"), "rb") as f:
            self._dense_bytes = f.read()
        ms_path = os.path.join(export_path, "model_state.msgpack")
        self._model_state_bytes = None
        if os.path.exists(ms_path):
            with open(ms_path, "rb") as f:
                self._model_state_bytes = f.read()
        self.params = None
        self.model_state = {}
        self._batchers = {t: Batcher(expected_unique=unique_cap)
                          for t in self.tables}
        self._jit_fwd = None
        # remote lookups are independent per (table, shard): fan them out
        # concurrently (the reference's entry graph issues its remote_predict
        # calls to all PS shards in parallel too)
        self._pool = futures.ThreadPoolExecutor(
            max_workers=max(2, self.num_row_shards * 2))

    # ------------------------------------------------------------------

    def _forward(self, params, buffers, inputs, batch):
        pooled = {}
        for tname, tin in inputs.items():
            buf = buffers[tname]
            n = buf.shape[0]
            for fname, idx in tin["index"].items():
                f = self.features[fname]
                idx = jnp.asarray(idx)
                safe = jnp.where(idx < 0, jnp.int32(n), idx.astype(jnp.int32))
                emb = buf.at[safe].get(mode="fill", fill_value=0)
                pooled[fname] = combine(emb, idx >= 0, f.combiner)
        out = self.module.apply(params, pooled, batch, training=False)
        return self.task.predictions(out)

    def predict(self, fid_batch: Dict[str, np.ndarray],
                batch: Optional[Dict[str, np.ndarray]] = None) -> np.ndarray:
        batch = batch or {}
        N, cap = self.num_row_shards, self.unique_cap
        inputs, buffers = {}, {}
        table_feats: Dict[str, list] = {}
        for fname, f in self.features.items():
            table_feats.setdefault(f.table, []).append(fname)
        for tname, fnames in table_feats.items():
            spec = self.tables[tname]
            streams = [np.ascontiguousarray(fid_batch[f], np.int64)
                       for f in fnames]
            flat = np.concatenate([s.ravel() for s in streams])
            # dedup grouped by OWNING SHARD: unique[s] is exactly the id
            # list to fetch from replica s, index already points into the
            # merged [N*cap] buffer
            unique, index, counts, overflow = self._batchers[tname].dedup(
                flat, num_shards=N, shard_cap=cap)
            if overflow:
                # unique_cap is a per-request limit: overflowed ids would
                # silently serve zero embeddings (index -1), unlike training
                # which surfaces stats['overflow'] — refuse loudly instead
                raise ValueError(
                    f"predict request exceeds unique_cap={cap} per shard for "
                    f"table {tname} ({overflow} unique ids overflowed); "
                    f"split the request or raise unique_cap")
            buf = np.zeros((N * cap, spec.dim), np.float32)
            pending = {
                s: self._pool.submit(self._lookups[s], tname,
                                     unique[s, :int(counts[s])].copy())
                for s in range(N) if int(counts[s])}
            for s, fut in pending.items():
                vals = np.asarray(fut.result())
                buf[s * cap:s * cap + len(vals)] = vals
            idx = {}
            off = 0
            for fname, stream in zip(fnames, streams):
                idx[fname] = index[off:off + stream.size].reshape(stream.shape)
                off += stream.size
            inputs[tname] = {"index": idx}
            buffers[tname] = jnp.asarray(buf)

        if self.params is None:
            key = jax.random.PRNGKey(0)
            pooled = {}
            for tname, tin in inputs.items():
                spec = self.tables[tname]
                for fname, idx in tin["index"].items():
                    f = self.features[fname]
                    emb = jnp.zeros((*idx.shape, spec.dim), jnp.float32)
                    pooled[fname] = combine(emb, jnp.asarray(idx) >= 0,
                                            f.combiner)
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
        if self._jit_fwd is None:
            self._jit_fwd = jax.jit(self._forward)
        preds = self._jit_fwd(self.params, buffers, inputs,
                              {k: jnp.asarray(v) for k, v in batch.items()})
        return np.asarray(preds)
