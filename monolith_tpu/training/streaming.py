"""Realtime (streaming) training.

TPU-native rebuild of the reference's realtime mode (SURVEY §3.5): Kafka-fed
minibatches, touched-key tracking, periodic push of delta rows to serving
replicas (ref: PS-side 10s sync thread cpu_training.py:1736-1767 /
ParameterSyncHook sync_training_hooks.py:70), dense-only fast checkpoints
(cpu_training.py:602-607), and periodic expiry eviction.

Works with any Trainer (single-device or sharded): the engine records
touched fids per table shard; every sync interval the streaming loop drains
them, reads their rows from the device pools, and pushes (fids, embeddings)
to every live serving replica via SyncClientManager.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from monolith_tpu.serving.param_sync import SyncClientManager
from monolith_tpu.training import checkpoint as ckpt_lib
from monolith_tpu.training.trainer import Trainer

log = logging.getLogger(__name__)


@dataclasses.dataclass
class StreamingConfig:
    sync_interval_steps: int = 50          # push deltas every N steps
    dense_ckpt_interval_steps: int = 0     # 0 = off (ref: 30min default)
    full_ckpt_interval_steps: int = 0
    evict_interval_steps: int = 0
    ckpt_dir: Optional[str] = None
    max_push_rows: int = 1 << 20


class StreamingTrainer:
    def __init__(self, trainer: Trainer,
                 sync_manager: Optional[SyncClientManager] = None,
                 config: StreamingConfig = StreamingConfig()):
        self.trainer = trainer
        self.sync = sync_manager
        self.config = config
        if not trainer.config.engine.record_touch and sync_manager is not None:
            raise ValueError("engine.record_touch must be True for realtime "
                             "parameter sync (EngineConfig(record_touch=True))")
        self.pushed_rows = 0
        self.sync_rounds = 0
        self._gather_jit: Dict[str, object] = {}

    # ------------------------------------------------------------------

    def _gather(self, tname):
        """Jitted touched-rows gather: [n_pad] row ids (-1 pad) -> [n_pad,
        dim] params, computed ON DEVICE so the D2H transfer is O(touched
        rows), not O(pool bytes) — the reference drains only touched keys'
        rows the same way (hopscotch steal -> PushRequest,
        hopscotch_hash_set.h:52)."""
        if tname not in self._gather_jit:
            from monolith_tpu.embedding import table as table_lib
            spec = self.trainer.engine.tables[tname]
            self._gather_jit[tname] = jax.jit(
                lambda st, rows: table_lib.lookup(spec, st, rows))
        return self._gather_jit[tname]

    @staticmethod
    def _pad_cap(n: int) -> int:
        """Pow-2 bucket >= n: bounds jit recompiles across sync rounds."""
        p = 512
        while p < n:
            p <<= 1
        return p

    @staticmethod
    def _shard_state(state, s: int):
        """Shard s's device-resident state slice. Single-process arrays are
        fully addressable ([S, ...] on local devices); under
        MultiHostTrainer the pools are globally sharded and only the
        process's own shards are addressable — the owner drains/pushes its
        local shards (ref: per-PS sync thread, cpu_training.py:1736-1767)."""
        def pick(x):
            if getattr(x, "is_fully_addressable", True):
                return x[s]
            for sh in x.addressable_shards:
                idx = sh.index[0]
                if (idx.start or 0) <= s < (idx.stop
                                            if idx.stop is not None else s + 1):
                    return sh.data[s - (idx.start or 0)]
            return None
        return jax.tree.map(pick, state)

    def sync_now(self) -> Dict[str, int]:
        """Drain touched fids and push deltas to serving (one sync round).

        Per local shard: drain touched fids (host set steal) -> host map to
        rows -> jitted device gather of JUST those rows -> small D2H ->
        push. Cost scales with touched rows, never pool size; works on
        single-device, sharded, and multi-process trainers."""
        if self.sync is None:
            return {}
        t = self.trainer
        pushed = {}
        for tname, spec in t.engine.tables.items():
            state = t.table_states[tname]
            fids_all, vals_all = [], []
            for s, store in enumerate(t.engine.stores[tname]):
                if store is None:  # not our shard (multi-process run)
                    continue
                fids = store.drain_touched(cap=self.config.max_push_rows)
                if fids.size == 0:
                    continue
                rows = store.lookup(fids)
                ok = rows >= 0
                fids, rows = fids[ok], rows[ok]
                if fids.size == 0:
                    continue
                n = fids.size
                rows_p = np.full(self._pad_cap(n), -1, np.int32)
                rows_p[:n] = rows
                shard_state = self._shard_state(state, s)
                vals = np.asarray(
                    self._gather(tname)(shard_state, rows_p))[:n]
                fids_all.append(fids)
                vals_all.append(vals)
            if not fids_all:
                continue
            fids = np.concatenate(fids_all)
            vals = np.concatenate(vals_all).astype(np.float32)
            if any(seg.retriever is not None for seg in spec.segments):
                # serve the retrieved (quantization-aware) view, matching
                # what training's forward pass saw
                off = 0
                for seg in spec.segments:
                    if seg.retriever is not None:
                        vals[:, off:off + seg.dim] = np.asarray(
                            seg.retriever.retrieve(vals[:, off:off + seg.dim],
                                                   t.step))
                    off += seg.dim
            acks = self.sync.push(tname, fids, vals)
            pushed[tname] = len(fids)
            log.info("param sync: table %s pushed %d rows -> %s",
                     tname, len(fids), acks)
        self.pushed_rows += sum(pushed.values())
        self.sync_rounds += 1
        return pushed

    # ------------------------------------------------------------------

    def run(self, data: Iterable, max_steps: Optional[int] = None) -> Dict:
        """Consume a (possibly unbounded) stream of (fid_batch, batch)."""
        t = self.trainer
        cfg = self.config
        n = 0
        for fid_batch, batch in data:
            t.train_step(fid_batch, batch)
            n += 1
            if self.sync is not None and cfg.sync_interval_steps and \
                    n % cfg.sync_interval_steps == 0:
                self.sync_now()
            if cfg.ckpt_dir and cfg.dense_ckpt_interval_steps and \
                    n % cfg.dense_ckpt_interval_steps == 0:
                ckpt_lib.save(t, cfg.ckpt_dir, dense_only=True)
            if cfg.ckpt_dir and cfg.full_ckpt_interval_steps and \
                    n % cfg.full_ckpt_interval_steps == 0:
                ckpt_lib.save(t, cfg.ckpt_dir)
            if cfg.evict_interval_steps and n % cfg.evict_interval_steps == 0:
                now = int(time.time())
                ttl = max((spec.eviction.ttl_seconds
                           for spec in t.engine.tables.values()
                           if spec.eviction.ttl_seconds > 0), default=0)
                if ttl:
                    if t.config.engine.tiered:
                        t.spill_expired(now - ttl)  # spill to host archive
                    else:
                        t.evict_expired(now - ttl)  # frees + zeroes rows
            if max_steps is not None and n >= max_steps:
                break
        # final flush
        if self.sync is not None:
            self.sync_now()
        t._drain_metrics()  # metrics accumulate on device; read them back
        return {"steps": n, "pushed_rows": self.pushed_rows,
                "sync_rounds": self.sync_rounds,
                "auc": t.auc.result(), "loss": t.loss_mean.result()}
