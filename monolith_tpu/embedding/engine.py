"""The embedding engine: host id-mapping + device row pools, end to end.

This is the TPU-native counterpart of the reference's whole "distributed
tables" stack (MultiTypeHashTable multi_type_hash_table.py:101,
DistributedMultiTypeHashTable distributed_ps.py:192 /
DistributedMultiTypeHashTableMpi distributed_ps_sync.py:69). Instead of
parameter servers or MPI all-to-all, each step is:

  host (C++):  per table: concat feature fid streams -> dedup -> bucket by
               shard -> HostStore.map_train per shard  (ref ShardingSparseFidsOp)
  device(jit): init newly-admitted rows -> gather unique rows per shard ->
               (sharded mode: all_to_all) -> per-feature gather + pool ->
               model fwd/bwd -> unique-row grads -> per-segment optimize

The device functions are pure (state in, state out) so the whole train step
jits as one XLA program; autodiff through the per-feature gather produces the
scatter-add "grads per unique row" for free, replacing the reference's
fused_gather_embeddings_by_input(+grad) kernels.

Per-step shapes are static: `unique_cap` unique ids per table shard and
`new_cap` admissions per shard, with -1 padding. Overflow ids are dropped for
the step (they read zeros and receive no update) and counted in stats — the
bucket-capacity + padding strategy from SURVEY §7 hard-part (c).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.embedding import table as table_lib
from monolith_tpu.embedding.host_store import (Batcher, Batcher2D,
                                                FilterKind, HostStore)
from monolith_tpu.embedding.spec import TableSpec
from monolith_tpu.feature import FeatureConfig, combine

_FILTER_KINDS = {
    "none": FilterKind.NONE,
    "sliding": FilterKind.SLIDING,
    "probabilistic": FilterKind.PROBABILISTIC,
    "probabilistic_unequal": FilterKind.PROBABILISTIC_UNEQUAL,
}


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    num_shards: int = 1
    unique_cap: int = 4096   # unique ids per table-shard per step
    new_cap: int = 1024      # admissions per table-shard per step
    # per-table overrides of unique_cap/new_cap as ((table, cap), ...) —
    # dozens-of-slots models size a history table very differently from
    # scalar slots (over-capping pads every gather/scatter, under-capping
    # silently drops ids as dedup overflow). Single-shard engines only.
    unique_caps: Optional[Tuple[Tuple[str, int], ...]] = None
    new_caps: Optional[Tuple[Tuple[str, int], ...]] = None
    record_touch: bool = False  # track touched fids for online param sync
    # embedding exchange for the sharded trainer: "allgather" broadcasts each
    # shard's unique rows to every device (traffic S*U*D); "a2a" sends each
    # device only the rows its batch shard needs (traffic S*bucket_cap*D) via
    # per-(table shard, batch shard) buckets — the reference's alltoall plan
    # (distributed_ps_sync.py:95)
    exchange: str = "allgather"
    bucket_cap: int = 0      # a2a bucket capacity; 0 = 2*unique_cap/num_shards
    # two-tier storage (SURVEY §7 hard-part b): spill cold rows' full state to
    # a host-RAM archive on eviction; revive exact state on re-admission
    tiered: bool = False
    archive_capacity: int = 0  # rows per shard archive; 0 = 4x table capacity
    # Compact wire format: ship per-feature index matrices as int16 (when
    # they fit) and new-row POSITIONS into the rows array (int16) instead of
    # a second int32 row array. Host->device transfer is the throughput
    # ceiling on PCIe/tunnel-attached chips; this halves the bytes. The
    # device upcasts, so numerics are identical.
    compact_wire: bool = True
    # Packed-row fused step (PERF.md): each id's params + optimizer slots
    # live in one 128-lane pool row; the step does ONE gather + ONE scatter
    # per table, with new-row init fused in as a select (no admit scatter).
    # "auto" = on when every table is f32; "off" forces the legacy
    # structure-of-arrays path.
    packed: str = "auto"  # auto | off
    # Multi-process runs: the global shard indices THIS process owns (its
    # local devices' table shards). None = all shards (single process). A
    # process only allocates host stores for its own shards — a v5e host
    # with 4 of 256 chips must not hold 256 shard maps.
    local_shards: Optional[Tuple[int, ...]] = None
    # 1-step-stale pipelined embeddings (ref enable_async_optimize,
    # cpu_training.py:488 + prefetch_queue.py pipeline): in block dispatch, step
    # i's forward gathers rows BEFORE step i-1's write-back scatter lands,
    # removing the scatter->gather serialization between scanned steps so
    # XLA overlaps the (sequential, ~170ns/row) scatter with the next
    # step's compute. The optimize still runs on the LATEST rows (a second
    # gather), so updates are never lost; ids read by the forward may be
    # one step stale — pair hot segments with the DC optimizer
    # (dc_optimizer.cc:30-44) to compensate. Packed tables + block path.
    # CAVEAT: an id ADMITTED at step i and re-read at step i+1 reads its
    # row's pre-init content in the FORWARD only — the optimize and
    # write-back still use properly initialized state. On Trainer paths
    # that's zeros (fresh rows are zero-allocated; evict_expired zeroes
    # freed rows via engine.zero_rows before recycling); only under
    # MultiHostTrainer (which cannot zero non-addressable global shards)
    # can a recycled row briefly expose the evicted id's content. Accept
    # the one-step forward noise like the reference's async pipeline does,
    # or keep the synchronous default.
    async_optimize: bool = False

    def ucap(self, table: str) -> int:
        if self.unique_caps:
            return dict(self.unique_caps).get(table, self.unique_cap)
        return self.unique_cap

    def ncap(self, table: str) -> int:
        if self.new_caps:
            return dict(self.new_caps).get(table, self.new_cap)
        return self.new_cap

    @property
    def max_ucap(self) -> int:
        caps = [self.unique_cap]
        if self.unique_caps:
            caps += [c for _, c in self.unique_caps]
        return max(caps)

    @property
    def effective_bucket_cap(self) -> int:
        if self.bucket_cap > 0:
            return self.bucket_cap
        return max(128, 2 * self.unique_cap // max(self.num_shards, 1))

    @property
    def index_dtype(self):
        """dtype for per-feature index matrices (values < num_shards*unique_cap)."""
        if self.compact_wire and self.num_shards * self.unique_cap <= 32768:
            return np.int16
        return np.int32

    @property
    def pos_dtype(self):
        """dtype for positions within one shard's unique list (< unique_cap)."""
        if self.compact_wire and self.unique_cap <= 32768:
            return np.int16
        return np.int32


def _per_shard(fn, *args):
    """vmap(fn) over the leading shard axis — or a DIRECT call when that
    axis is 1. The direct path matters: the packed write-back uses a Pallas
    DMA scatter (ops/scatter.py) that must not trace under vmap (no
    batching rule), and single-shard is the common single-chip case. `fn`
    must accept an `unbatched` keyword and forward it to the table ops."""
    import functools
    lead = jax.tree.leaves(args)[0].shape[0]
    if lead == 1:
        sliced = jax.tree.map(lambda x: x[0], args)
        return jax.tree.map(lambda x: x[None], fn(*sliced, unbatched=True))
    return jax.vmap(functools.partial(fn, unbatched=False))(*args)


class EmbeddingEngine:
    """Owns host state (stores/batchers) and builds pure device functions."""

    def __init__(self, tables: Sequence[TableSpec],
                 features: Sequence[FeatureConfig],
                 config: EngineConfig = EngineConfig(),
                 seed: int = 0):
        self.config = config
        self.tables: Dict[str, TableSpec] = {t.name: t for t in tables}
        self.features: Dict[str, FeatureConfig] = {f.name: f for f in features}
        for f in features:
            if f.table not in self.tables:
                raise ValueError(f"feature {f.name} references unknown table {f.table}")
        self.table_features: Dict[str, List[FeatureConfig]] = {
            t: [f for f in features if f.table == t] for t in self.tables}
        S = config.num_shards
        if (config.unique_caps or config.new_caps) and S != 1:
            raise ValueError("per-table unique_caps/new_caps require "
                             "num_shards == 1 (sharded paths use the "
                             "global caps)")
        self.stores: Dict[str, List[HostStore]] = {}
        self.batchers: Dict[str, Batcher] = {}
        self.batchers2d: Dict[str, Batcher2D] = {}
        local = (set(config.local_shards)
                 if config.local_shards is not None else None)
        for name, t in self.tables.items():
            kind = _FILTER_KINDS[t.admission.kind]
            self.stores[name] = [
                HostStore(row_capacity=t.capacity_per_shard,
                          filter_kind=kind,
                          admit_threshold=t.admission.threshold,
                          filter_capacity=t.admission.filter_capacity,
                          filter_splits=t.admission.filter_splits,
                          seed=seed * 1000003 + s)
                if (local is None or s in local) else None
                for s in range(S)]
            self.batchers[name] = Batcher(
                expected_unique=config.ucap(name) * S)
            self.batchers2d[name] = Batcher2D(
                expected_unique=config.ucap(name) * S)
        self.archives = {}
        if config.tiered:
            from monolith_tpu.embedding.tiered import RowArchive
            for name, t in self.tables.items():
                arch_cap = (config.archive_capacity
                            or 4 * t.capacity_per_shard)
                # like stores: a process only materializes archives for the
                # shards it owns (multi-process runs)
                self.archives[name] = [
                    RowArchive(t, arch_cap, seed=seed + s)
                    if (local is None or s in local) else None
                    for s in range(S)]
        self.packed = (config.packed != "off"
                       and all(table_lib.is_packed(t) for t in tables))

    # ------------------------------------------------------------------
    # host side
    # ------------------------------------------------------------------

    def prepare_batch(self, fid_batch: Dict[str, np.ndarray], ts: int
                      ) -> Tuple[Dict, Dict]:
        """Map a batch of per-feature fid matrices to device inputs.

        fid_batch: {feature_name: int64 [B, max_length], padding fid == -1}.
        Returns (device_inputs, stats). device_inputs is a pytree:
          {table: {"rows": [S, Ucap] i32, "new_rows": [S, Kcap] i32,
                   "index": {feature: [B, L] i32 into flat [S*Ucap]}}}
        """
        cfg = self.config
        S = cfg.num_shards
        compact = cfg.compact_wire
        packed = self.packed
        inputs = {}
        stats = {"overflow": {}, "new": {}, "unique": {}, "filtered": {},
                 "new_rejected": {}}
        for tname, feats in self.table_features.items():
            if not feats:
                continue
            U, K = cfg.ucap(tname), cfg.ncap(tname)
            streams = [np.ascontiguousarray(fid_batch[f.name], dtype=np.int64)
                       for f in feats]
            flat = np.concatenate([s.ravel() for s in streams])
            # admission filters consume per-id batch occurrence counts (ref
            # ShouldBeFiltered's count arg): the sliding filter adds the
            # full batch count to its window, probabilistic modes scale
            # their admit probability by it
            occ = None
            if self.tables[tname].admission.kind != "none":
                unique, index, counts, occ, overflow = \
                    self.batchers[tname].dedup_counts(flat, num_shards=S,
                                                      shard_cap=U)
            else:
                unique, index, counts, overflow = self.batchers[tname].dedup(
                    flat, num_shards=S, shard_cap=U)
            rows = np.full((S, U), -1, dtype=np.int32)
            # per-table: positions index THIS table's unique list of size U
            pos_dt = (np.int16 if compact and U <= 32768 else np.int32)
            if packed:
                # fused step: new ids are a SELECT over the gathered rows,
                # not a scatter — ship a mask instead of row values
                new_mask = np.zeros((S, U), dtype=np.uint8)
            elif compact:
                new_pos = np.full((S, K), -1, dtype=pos_dt)
            else:
                new_rows = np.full((S, K), -1, dtype=np.int32)
            tiered = cfg.tiered
            if tiered:
                from monolith_tpu.embedding.tiered import state_width
                width = state_width(self.tables[tname])
                if packed:
                    revive_pos = np.full((S, K), -1, dtype=pos_dt)
                else:
                    revive_rows = np.full((S, K), -1, dtype=np.int32)
                revive_values = np.zeros((S, K, width), dtype=np.float32)
            n_new = 0
            n_rej = 0
            n_filtered = 0
            for s in range(S):
                c = int(counts[s])
                if c == 0:
                    continue
                if packed or compact or occ is not None:
                    r, nr, nf, npos = self.stores[tname][s].map_train_pos(
                        unique[s, :c], ts=ts, new_cap=K,
                        record_touch=cfg.record_touch,
                        counts=None if occ is None else occ[s, :c])
                    if packed:
                        new_mask[s, npos] = 1
                    elif compact:
                        new_pos[s, :len(npos)] = npos
                    else:
                        new_rows[s, :len(nr)] = nr
                else:
                    r, nr, nf = self.stores[tname][s].map_train(
                        unique[s, :c], ts=ts, new_cap=K,
                        record_touch=cfg.record_touch)
                    new_rows[s, :len(nr)] = nr
                rows[s, :c] = r
                n_new += len(nr)
                n_rej += self.stores[tname][s].last_rejected
                # -1 rows include both admission-filtered ids AND budget-
                # rejected ids (already counted in new_rejected) — subtract
                # so the two monitoring counters don't double-count
                n_filtered += (int((r == -1).sum())
                               - self.stores[tname][s].last_rejected)
                if tiered and len(nf):
                    ok, vals = self.archives[tname][s].revive(nf)
                    if ok.any():
                        k = int(ok.sum())
                        if packed:
                            revive_pos[s, :k] = npos[ok]
                        else:
                            revive_rows[s, :k] = nr[ok]
                        revive_values[s, :k] = vals[ok]
            idx_per_feature = {}
            idt = (np.int16 if compact and S * U <= 32768 else np.int32)
            off = 0
            for f, stream in zip(feats, streams):
                n = stream.size
                idx_per_feature[f.name] = index[off:off + n].reshape(
                    stream.shape).astype(idt, copy=False)
                off += n
            inputs[tname] = {"rows": rows, "index": idx_per_feature}
            if packed:
                inputs[tname]["new_mask"] = new_mask
            elif compact:
                inputs[tname]["new_pos"] = new_pos
            else:
                inputs[tname]["new_rows"] = new_rows
            if tiered:
                if packed:
                    inputs[tname]["revive_pos"] = revive_pos
                else:
                    inputs[tname]["revive_rows"] = revive_rows
                inputs[tname]["revive_values"] = revive_values
            stats["overflow"][tname] = overflow
            stats["new"][tname] = n_new
            stats["unique"][tname] = int(counts.sum())
            # counted per shard over the first counts[s] entries only, so
            # padding slots and dedup-overflow drops never inflate it
            stats["filtered"][tname] = n_filtered
            stats["new_rejected"][tname] = n_rej
        return inputs, stats

    def prepare_batch_a2a(self, fid_batch: Dict[str, np.ndarray], ts: int
                          ) -> Tuple[Dict, Dict]:
        """Bucketed-a2a variant of prepare_batch for the sharded trainer.

        Returns per table: {"rows": [S, U], "new_rows": [S, K],
        "bucket_idx": [S, D, cap] (positions into the shard's unique list),
        "index": {feature: [B, L] into the local [S*cap] receive buffer}}.
        Batch size must be divisible by num_shards (D == S == mesh size)."""
        cfg = self.config
        S, U, K = cfg.num_shards, cfg.unique_cap, cfg.new_cap
        D = S
        cap = cfg.effective_bucket_cap
        inputs = {}
        stats = {"overflow": {}, "new": {}, "unique": {}, "new_rejected": {}}
        for tname, feats in self.table_features.items():
            if not feats:
                continue
            streams = [np.ascontiguousarray(fid_batch[f.name], dtype=np.int64)
                       for f in feats]
            B = streams[0].shape[0]
            assert B % D == 0, f"batch {B} not divisible by {D} shards"
            rows_per = B // D
            # batch-shard-major value layout: for each d, all features' fids
            per_shard_lens = [st.shape[1] * rows_per for st in streams]
            flat = np.concatenate(
                [st[d * rows_per:(d + 1) * rows_per].ravel()
                 for d in range(D) for st in streams])
            # count-aware admission on the a2a path too: the reference feeds
            # per-id batch counts to the filters on EVERY topology
            # (embedding_hash_table_tf_bridge.cc:183)
            occ = None
            if self.tables[tname].admission.kind != "none":
                (unique, counts, bucket_idx, bucket_counts, index, occ,
                 overflow) = self.batchers2d[tname].dedup2(
                    flat, num_batch_shards=D, num_shards=S, global_cap=U,
                    bucket_cap=cap)
            else:
                unique, counts, bucket_idx, bucket_counts, index, overflow = \
                    self.batchers2d[tname].dedup(flat, num_batch_shards=D,
                                                 num_shards=S, global_cap=U,
                                                 bucket_cap=cap)
            compact = cfg.compact_wire
            packed = self.packed
            rows = np.full((S, U), -1, dtype=np.int32)
            if packed:
                new_mask = np.zeros((S, U), dtype=np.uint8)
            elif compact:
                new_pos = np.full((S, K), -1, dtype=cfg.pos_dtype)
            else:
                new_rows = np.full((S, K), -1, dtype=np.int32)
            tiered = cfg.tiered
            if tiered:
                from monolith_tpu.embedding.tiered import state_width
                width = state_width(self.tables[tname])
                if packed:
                    revive_pos = np.full((S, K), -1, dtype=cfg.pos_dtype)
                else:
                    revive_rows = np.full((S, K), -1, dtype=np.int32)
                revive_values = np.zeros((S, K, width), dtype=np.float32)
            n_new = 0
            n_rej = 0
            for s_i in range(S):
                c = int(counts[s_i])
                if c == 0:
                    continue
                if packed or compact or occ is not None:
                    r, nr, nf, npos = self.stores[tname][s_i].map_train_pos(
                        unique[s_i, :c], ts=ts, new_cap=K,
                        record_touch=cfg.record_touch,
                        counts=None if occ is None else occ[s_i, :c])
                    if packed:
                        new_mask[s_i, npos] = 1
                    elif compact:
                        new_pos[s_i, :len(npos)] = npos
                    else:
                        new_rows[s_i, :len(nr)] = nr
                else:
                    r, nr, nf = self.stores[tname][s_i].map_train(
                        unique[s_i, :c], ts=ts, new_cap=K,
                        record_touch=cfg.record_touch)
                    new_rows[s_i, :len(nr)] = nr
                rows[s_i, :c] = r
                n_new += len(nr)
                n_rej += self.stores[tname][s_i].last_rejected
                if tiered and len(nf):
                    ok, vals = self.archives[tname][s_i].revive(nf)
                    if ok.any():
                        k = int(ok.sum())
                        if packed:
                            revive_pos[s_i, :k] = npos[ok]
                        else:
                            revive_rows[s_i, :k] = nr[ok]
                        revive_values[s_i, :k] = vals[ok]
            # reassemble per-feature index matrices [B, L]; values index the
            # local [S*bucket_cap] receive buffer
            a2a_idt = (np.int16 if compact and S * cap <= 32768 else np.int32)
            pos_idt = (np.int16 if compact and U <= 32768 else np.int32)
            idx_per_feature = {f.name: np.empty(st.shape, dtype=a2a_idt)
                               for f, st in zip(feats, streams)}
            pos = 0
            for d in range(D):
                for f, st, flen in zip(feats, streams, per_shard_lens):
                    chunk = index[pos:pos + flen].reshape(rows_per, st.shape[1])
                    idx_per_feature[f.name][d * rows_per:(d + 1) * rows_per] = chunk
                    pos += flen
            inputs[tname] = {"rows": rows,
                             "bucket_idx": bucket_idx.astype(pos_idt,
                                                             copy=False),
                             "index": idx_per_feature}
            if packed:
                inputs[tname]["new_mask"] = new_mask
            elif compact:
                inputs[tname]["new_pos"] = new_pos
            else:
                inputs[tname]["new_rows"] = new_rows
            if tiered:
                if packed:
                    inputs[tname]["revive_pos"] = revive_pos
                else:
                    inputs[tname]["revive_rows"] = revive_rows
                inputs[tname]["revive_values"] = revive_values
            stats["overflow"][tname] = overflow
            stats["new"][tname] = n_new
            stats["unique"][tname] = int(counts.sum())
            stats["new_rejected"][tname] = n_rej
        return inputs, stats

    def evict_expired(self, expire_before: int) -> Dict[str, np.ndarray]:
        """Run expiry eviction on every table shard; returns freed rows per
        table (shard-flattened device row indices, for optional zeroing)."""
        out = {}
        for tname, t in self.tables.items():
            if t.eviction.ttl_seconds <= 0:
                continue
            freed = []
            for s, store in enumerate(self.stores[tname]):
                if store is None:  # not a local shard (multi-process runs)
                    continue
                rows = store.evict_expired(expire_before)
                freed.append(rows.astype(np.int64) + s * t.capacity_per_shard)
            out[tname] = np.concatenate(freed) if freed else np.empty(0, np.int64)
        return out

    def zero_rows(self, table_states: Dict, freed: Dict[str, np.ndarray]
                  ) -> Dict:
        """Zero freed device rows so no stale state can survive eviction.

        Admission already guards re-mapped rows (init-select on new_mask),
        but any future path that maps a row without that select would read
        the evicted id's stale params/slots — zeroing at eviction closes the
        hazard class structurally. freed: engine.evict_expired's output
        (shard-flattened row ids). Row lists are padded to the next power of
        two with an out-of-range index (mode="drop") so jit specializations
        stay bounded at O(log cap) shapes per table.
        """
        S = self.config.num_shards
        out = dict(table_states)
        for tname, rows in freed.items():
            if rows.size == 0:
                continue
            cap = self.tables[tname].capacity_per_shard
            n = 1 << max(0, int(rows.size - 1).bit_length())
            idx = np.full(n, S * cap, dtype=np.int64)  # OOB pad -> dropped
            idx[: rows.size] = rows
            s_idx = (idx // cap).astype(np.int32)  # pad -> shard S (OOB)
            r_idx = (idx % cap).astype(np.int32)
            out[tname] = jax.tree.map(
                lambda x: x.at[s_idx, r_idx].set(0, mode="drop"),
                table_states[tname])
        return out

    # ------------------------------------------------------------------
    # device side (pure functions of state + inputs)
    # ------------------------------------------------------------------

    def create_states(self) -> Dict[str, table_lib.TableState]:
        """Per-table pools with a leading shard axis [S, cap, ...]."""
        S = self.config.num_shards

        def stack(spec):
            st = table_lib.create_state(spec, packed=self.packed)
            return jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape), st)

        return {name: stack(spec) for name, spec in self.tables.items()}

    @staticmethod
    def new_rows_from(rows: jnp.ndarray, tin: Dict) -> jnp.ndarray:
        """Materialize new-row indices from a step's inputs.

        Compact wire ships `new_pos` (positions into the rows array, int16)
        instead of row values; this gathers rows[..., new_pos] with -1
        padding. `rows` is [..., U] and new_pos [..., K] with matching
        leading dims (works per shard and vmapped alike)."""
        if "new_pos" not in tin:
            return jnp.asarray(tin["new_rows"])
        pos = jnp.asarray(tin["new_pos"]).astype(jnp.int32)
        U = rows.shape[-1]
        pad = jnp.full(rows.shape[:-1] + (1,), -1, rows.dtype)
        padded = jnp.concatenate([rows, pad], axis=-1)
        safe = jnp.where((pos < 0) | (pos >= U), jnp.int32(U), pos)
        return jnp.take_along_axis(padded, safe, axis=-1)

    def admit_rows(self, states: Dict, inputs: Dict, key: jax.Array) -> Dict:
        """Initialize newly-admitted rows on device (vmapped over shards);
        in tiered mode, archived state overwrites the fresh init (revive).

        In packed mode the trainer fast path fuses this into fused_lookup /
        fused_apply; this standalone version (select + scatter) exists for
        direct engine use (tests, eval-time admission)."""
        out = dict(states)
        for i, (tname, tin) in enumerate(sorted(inputs.items())):
            spec = self.tables[tname]
            tkey = jax.random.fold_in(key, i)
            skeys = jax.random.split(tkey, self.config.num_shards)
            if "new_mask" in tin:
                def per_shard(st, rows, mask, k, unbatched):
                    p = table_lib.gather_packed(spec, st, rows,
                                                unbatched=unbatched)
                    init = table_lib.init_packed(spec, k, rows.shape[0])
                    p = jnp.where((mask > 0)[:, None], init, p)
                    return table_lib.scatter_packed(spec, st, rows, p,
                                                    unbatched=unbatched)
                out[tname] = _per_shard(
                    per_shard, states[tname], jnp.asarray(tin["rows"]),
                    jnp.asarray(tin["new_mask"]), skeys)
                if "revive_pos" in tin:
                    def overlay(st, rows, pos, vals, mask, unbatched):
                        p = table_lib.gather_packed(spec, st, rows,
                                                    unbatched=unbatched)
                        safe = jnp.where(pos < 0, jnp.int32(p.shape[0]),
                                         pos.astype(jnp.int32))
                        full = jnp.zeros((vals.shape[0], p.shape[1]),
                                         jnp.float32
                                         ).at[:, :vals.shape[1]].set(vals)
                        p = p.at[safe].set(full, mode="drop",
                                           unique_indices=True)
                        return table_lib.scatter_packed(spec, st, rows, p,
                                                        unbatched=unbatched)
                    out[tname] = _per_shard(
                        overlay, out[tname], jnp.asarray(tin["rows"]),
                        jnp.asarray(tin["revive_pos"]),
                        jnp.asarray(tin["revive_values"]),
                        jnp.asarray(tin["new_mask"]))
                continue
            new_rows = self.new_rows_from(jnp.asarray(tin["rows"]), tin)
            st = _per_shard(
                lambda st, rows, k, unbatched: table_lib.init_rows(
                    spec, st, rows, k, unbatched=unbatched),
                states[tname], new_rows, skeys)
            if "revive_rows" in tin:
                st = _per_shard(
                    lambda st, rows, vals, unbatched:
                    table_lib.restore_packed_rows(spec, st, rows, vals,
                                                  unbatched=unbatched),
                    st, jnp.asarray(tin["revive_rows"]),
                    jnp.asarray(tin["revive_values"]))
            out[tname] = st
        return out

    # -- wire fusion: one int32 transfer per step (single-shard fast path) --

    @property
    def fuse_wire(self) -> bool:
        """Ship ALL engine inputs as ONE int32 array per step. Each
        host->device transfer has ~ms-scale fixed cost on PCIe/tunnel-
        attached chips and serializes with host prep on small hosts;
        packing rows+new_mask+index into one buffer cuts the per-step
        transfer count from ~5 to 1. Enabled on the packed single-shard
        path (multi-shard inputs are sharded pytrees; see sharded.py).

        The wire carries per-feature indices as 16-bit words decoded as
        UNSIGNED (sentinel 0xFFFF = invalid), so the path requires
        unique_cap <= 65535 (index values < unique_cap, and 65535 is
        reserved) and an explicit compact_wire opt-in — larger caps fall
        back to the multi-array int32 path instead of silently wrapping.
        Merged same-config tables (merge.py, ref MergedMultiTypeHashTable)
        need the unsigned range: a dozens-of-slots model merged into one
        table sees ~50k unique rows/step."""
        return (self.packed and self.config.compact_wire
                and self.config.num_shards == 1
                and self.config.max_ucap <= 65535
                and not self.config.tiered)

    def wire_words(self, batch_size: int) -> int:
        """Number of int32 words in the engine's wire region for a batch."""
        total = 0
        for tname, feats in self.table_features.items():
            if not feats:
                continue
            total += (self.config.ucap(tname)
                      + sum((batch_size * f.max_length + 1) // 2
                            for f in feats))
        return total

    def prepare_wire(self, fid_batch: Dict[str, np.ndarray], ts: int,
                     out: Optional[np.ndarray] = None
                     ) -> Tuple[np.ndarray, Dict]:
        """Fused host prepare for the fuse_wire path: ONE native call runs
        dedup + store map + wire pack for ALL tables, each table as one task
        on the native thread pool (many-table models parallelize across host
        cores; ref ShardingSparseFidsOp parallel parse). Writes straight
        into the final int32 wire buffer (layout identical to prepare_batch
        + pack_wire) with zero intermediate numpy copies. Pass `out`
        (contiguous int32, exactly the engine wire length) to write into a
        larger caller-owned transfer buffer."""
        from monolith_tpu.embedding import host_store
        cfg = self.config
        if cfg.max_ucap > 65535 or not cfg.compact_wire:
            # 16-bit feature indices (decoded unsigned, 0xFFFF sentinel) can
            # only address 65535 unique rows; a larger cap would silently
            # alias rows
            raise ValueError(
                f"prepare_wire requires compact_wire and unique caps <= "
                f"65535 (got compact_wire={cfg.compact_wire}, max cap "
                f"{cfg.max_ucap}); use prepare_batch (int32 indices)")
        names, streams_per_table = [], []
        offsets = [0]
        for tname in sorted(self.table_features):
            feats = self.table_features[tname]
            if not feats:
                continue
            streams = [np.ascontiguousarray(fid_batch[f.name], dtype=np.int64)
                       for f in feats]
            names.append(tname)
            streams_per_table.append(streams)
            offsets.append(offsets[-1] + cfg.ucap(tname)
                           + sum((s.size + 1) // 2 for s in streams))
        offsets = np.asarray(offsets, dtype=np.int64)
        total = int(offsets[-1])
        if out is not None:
            assert out.size == total and out.dtype == np.int32
            wire = out
        else:
            wire = np.empty(total, dtype=np.int32)
        st = host_store.prepare_wire_multi(
            [self.batchers[t] for t in names],
            [self.stores[t][0] for t in names],
            streams_per_table, ts,
            [cfg.ucap(t) for t in names], [cfg.ncap(t) for t in names],
            cfg.record_touch, wire, offsets)
        stats = {"overflow": {}, "new": {}, "unique": {}, "filtered": {},
                 "new_rejected": {}}
        for i, tname in enumerate(names):
            stats["overflow"][tname] = int(st[i, 0])
            stats["new"][tname] = int(st[i, 1])
            stats["unique"][tname] = int(st[i, 2])
            stats["filtered"][tname] = int(st[i, 3])
            stats["new_rejected"][tname] = int(st[i, 4])
        return wire, stats

    def pack_wire(self, inputs: Dict) -> np.ndarray:
        """Host-side: pack the prepare_batch outputs into one int32 array.

        Layout per table (sorted name order):
          [U words]  rows_enc: row | (new_mask << 30); -1 rows stay -1
          per feature (declared order): ceil(B*L/2) words of int16 index
        """
        parts = []
        for tname in sorted(inputs):
            tin = inputs[tname]
            rows = tin["rows"][0].astype(np.int32, copy=True)
            mask = tin["new_mask"][0]
            np.bitwise_or(rows, np.int32(1 << 30), out=rows,
                          where=mask.astype(bool))
            parts.append(rows)
            for f in self.table_features[tname]:
                idx = np.ascontiguousarray(tin["index"][f.name],
                                           dtype=np.int16).ravel()
                if idx.size % 2:
                    idx = np.concatenate([idx, np.full(1, -1, np.int16)])
                parts.append(idx.view(np.int32))
        return np.concatenate(parts)

    def decode_wire(self, wire: jnp.ndarray, batch_size: int) -> Dict:
        """Device-side inverse of pack_wire (pure jnp; shapes static)."""
        inputs = {}
        off = 0
        for tname in sorted(self.table_features):
            feats = self.table_features[tname]
            if not feats:
                continue
            U = self.config.ucap(tname)
            rows_enc = wire[off:off + U]
            off += U
            invalid = rows_enc < 0
            mask = jnp.where(invalid, 0,
                             (rows_enc >> 30) & 1).astype(jnp.uint8)
            rows = jnp.where(invalid, -1, rows_enc & ((1 << 30) - 1))
            index = {}
            for f in feats:
                n = batch_size * f.max_length
                words = (n + 1) // 2
                chunk = wire[off:off + words]
                off += words
                # 16-bit index words decode UNSIGNED: 0xFFFF (= int16 -1 on
                # the wire) is the invalid sentinel, values up to 65534 are
                # valid rows — merged tables exceed the int15 range
                idx16 = jax.lax.bitcast_convert_type(
                    chunk, jnp.uint16).reshape(-1)[:n].astype(jnp.int32)
                idx16 = jnp.where(idx16 == 0xFFFF, -1, idx16)
                index[f.name] = idx16.reshape(batch_size, f.max_length)
            inputs[tname] = {"rows": rows[None], "new_mask": mask[None],
                             "index": index}
        return inputs

    # -- packed fused path (PERF.md): ONE gather + ONE scatter per table --

    def fused_lookup(self, states: Dict, inputs: Dict, key: jax.Array,
                     step) -> Tuple[Dict[str, jnp.ndarray],
                                    Dict[str, jnp.ndarray]]:
        """Gather each table's packed rows and overlay init values for newly
        admitted ids (select, replacing the reference's admit/init scatter);
        in tiered mode, archived state overlays the fresh init (revive).

        Returns (prows {table: [S, U, P]}, unique {table: [S*U, dim]})."""
        S = self.config.num_shards
        prows, unique = {}, {}
        for i, (tname, tin) in enumerate(sorted(inputs.items())):
            spec = self.tables[tname]
            tkey = jax.random.fold_in(jax.random.fold_in(key, step), i)
            skeys = jax.random.split(tkey, S)

            def per_shard(st, rows, mask, k, unbatched):
                p = table_lib.gather_packed(spec, st, rows,
                                            unbatched=unbatched)
                init = table_lib.init_packed(spec, k, rows.shape[0])
                return jnp.where((mask > 0)[:, None], init, p)

            p = _per_shard(per_shard, states[tname],
                           jnp.asarray(tin["rows"]),
                           jnp.asarray(tin["new_mask"]), skeys)
            if "revive_pos" in tin:
                def overlay(p, pos, vals):
                    safe = jnp.where(pos < 0, jnp.int32(p.shape[0]),
                                     pos.astype(jnp.int32))
                    full = jnp.zeros((vals.shape[0], p.shape[1]), jnp.float32
                                     ).at[:, :vals.shape[1]].set(vals)
                    return p.at[safe].set(full, mode="drop",
                                          unique_indices=True)
                p = jax.vmap(overlay)(p, jnp.asarray(tin["revive_pos"]),
                                      jnp.asarray(tin["revive_values"]))
            prows[tname] = p
            unique[tname] = table_lib.params_of(spec, p).reshape(-1, spec.dim)
        return prows, unique

    def fused_apply(self, states: Dict, inputs: Dict, prows: Dict,
                    unique_grads: Dict[str, jnp.ndarray],
                    step: jnp.ndarray) -> Dict:
        """Optimize the gathered packed rows and write them back with ONE
        scatter per table (ref fused_apply_gradient)."""
        S = self.config.num_shards
        out = dict(states)
        for i, (tname, tin) in enumerate(sorted(inputs.items())):
            spec = self.tables[tname]
            U = jnp.asarray(tin["rows"]).shape[-1]
            g = unique_grads[tname].reshape(S, U, spec.dim)
            new_p = jax.vmap(
                lambda p, gg: table_lib.optimize_packed(spec, p, gg, step)
            )(prows[tname], g)
            # per-shard keys for stochastic bf16 write-back
            tkey = jax.random.fold_in(jax.random.fold_in(
                jax.random.PRNGKey(1), step), i)
            skeys = jax.random.split(tkey, S)
            out[tname] = _per_shard(
                lambda st, rows, v, k, unbatched: table_lib.scatter_packed(
                    spec, st, rows, v, key=k, unbatched=unbatched),
                states[tname], jnp.asarray(tin["rows"]), new_p, skeys)
        return out

    def optimize_rows(self, inputs: Dict, prows_latest: Dict,
                      unique_grads: Dict[str, jnp.ndarray], step,
                      prows_stale: Optional[Dict] = None) -> Dict:
        """Optimize gathered packed rows WITHOUT scattering (the
        async_optimize pipeline defers the write-back one scan iteration).
        `prows_stale`: rows the forward used, fed to DC-style optimizers."""
        S = self.config.num_shards
        out = {}
        for tname in sorted(inputs):
            spec = self.tables[tname]
            U = jnp.asarray(inputs[tname]["rows"]).shape[-1]
            g = unique_grads[tname].reshape(S, U, spec.dim)
            if prows_stale is None:
                out[tname] = jax.vmap(
                    lambda p, gg: table_lib.optimize_packed(spec, p, gg, step)
                )(prows_latest[tname], g)
            else:
                out[tname] = jax.vmap(
                    lambda p, gg, st: table_lib.optimize_packed(
                        spec, p, gg, step, stale=st)
                )(prows_latest[tname], g, prows_stale[tname])
        return out

    def scatter_rows(self, states: Dict, rows: Dict[str, jnp.ndarray],
                     values: Dict[str, jnp.ndarray], step) -> Dict:
        """ONE scatter per table of full packed rows (-1 rows drop) — the
        deferred write-back of the async_optimize pipeline."""
        out = dict(states)
        for i, tname in enumerate(sorted(rows)):
            spec = self.tables[tname]
            tkey = jax.random.fold_in(jax.random.fold_in(
                jax.random.PRNGKey(2), step), i)
            skeys = jax.random.split(tkey, self.config.num_shards)
            out[tname] = _per_shard(
                lambda st, r, v, k, unbatched: table_lib.scatter_packed(
                    spec, st, r, v, key=k, unbatched=unbatched),
                states[tname], jnp.asarray(rows[tname]), values[tname], skeys)
        return out

    def lookup_unique(self, states: Dict, inputs: Dict) -> Dict[str, jnp.ndarray]:
        """Gather each table's unique rows: {table: [S*Ucap, dim] f32}."""
        out = {}
        for tname, tin in inputs.items():
            spec = self.tables[tname]
            emb = _per_shard(
                lambda st, rows, unbatched: table_lib.lookup(
                    spec, st, rows, unbatched=unbatched),
                states[tname], jnp.asarray(tin["rows"]))
            out[tname] = emb.reshape(-1, spec.dim)
        return out

    def retrieve_unique(self, unique_embs: Dict[str, jnp.ndarray],
                        step) -> Dict[str, jnp.ndarray]:
        """Apply per-segment quantization-aware retrievers to the unique-row
        buffers (ref retriever stack; see embedding/retrievers.py). Identity
        for tables with no retriever configured. Must be called INSIDE the
        differentiated loss so autodiff produces the retriever backward."""
        out = {}
        for tname, buf in unique_embs.items():
            spec = self.tables[tname]
            if all(seg.retriever is None for seg in spec.segments):
                out[tname] = buf
                continue
            pieces, off = [], 0
            for seg in spec.segments:
                x = buf[:, off:off + seg.dim]
                pieces.append(seg.retriever.retrieve(x, step)
                              if seg.retriever is not None else x)
                off += seg.dim
            out[tname] = jnp.concatenate(pieces, axis=-1)
        return out

    def pool_features(self, unique_embs: Dict[str, jnp.ndarray],
                      inputs: Dict) -> Dict[str, jnp.ndarray]:
        """Per-feature gather + combine from the unique buffers.

        Differentiable wrt unique_embs (autodiff yields per-unique-row summed
        gradients — the reference's fused_gather_embeddings_by_input_gradient).

        Scalar slots (max_length == 1, sum/mean combiners) sharing a table
        are BATCHED into one gather: a merged dozens-of-slots table would
        otherwise pay 40 separate gather kernels (and 40 scatter-adds in the
        backward) where one [B, k] gather does — the role of the reference's
        fused_embedding_to_layout (runtime/ops/fused_embedding_to_layout.cc,
        one op scattering every slot's embeddings into the model layouts)."""
        pooled = {}
        for tname, tin in inputs.items():
            buf = unique_embs[tname]
            n = buf.shape[0]
            scalars = []  # (fname, idx [B, 1]) — poolable in one gather
            for fname, idx in tin["index"].items():
                f = self.features[fname]
                idx = jnp.asarray(idx)
                if (f.max_length == 1 and idx.shape[-1] == 1
                        and f.combiner in ("sum", "mean")):
                    scalars.append((fname, idx))
                    continue
                safe = jnp.where(idx < 0, jnp.int32(n), idx.astype(jnp.int32))
                emb = buf.at[safe].get(mode="fill", fill_value=0)  # [B, L, D]
                pooled[fname] = combine(emb, idx >= 0, f.combiner)
            if len(scalars) == 1:
                fname, idx = scalars[0]
                safe = jnp.where(idx < 0, jnp.int32(n), idx.astype(jnp.int32))
                emb = buf.at[safe].get(mode="fill", fill_value=0)
                pooled[fname] = combine(emb, idx >= 0,
                                        self.features[fname].combiner)
            elif scalars:
                idx = jnp.concatenate([i for _, i in scalars], axis=1)  # [B,k]
                safe = jnp.where(idx < 0, jnp.int32(n), idx.astype(jnp.int32))
                emb = buf.at[safe].get(mode="fill", fill_value=0)  # [B, k, D]
                # sum/mean over a single valid element are both the element
                # itself (invalid slots read zeros via the fill), so the
                # per-slot combine reduces to a column slice
                for j, (fname, _) in enumerate(scalars):
                    pooled[fname] = emb[:, j]
        return pooled

    def apply_gradients(self, states: Dict, inputs: Dict,
                        unique_grads: Dict[str, jnp.ndarray],
                        step: jnp.ndarray) -> Dict:
        """Per-segment optimize of each table's touched rows."""
        out = dict(states)
        for i, (tname, tin) in enumerate(sorted(inputs.items())):
            spec = self.tables[tname]
            g = unique_grads[tname].reshape(
                self.config.num_shards, jnp.asarray(tin["rows"]).shape[-1],
                spec.dim)
            # distinct (table, shard, step) keys for stochastic bf16
            # write-back — identical keys would correlate rounding noise
            # across shards and break its in-expectation accumulation
            tkey = jax.random.fold_in(jax.random.fold_in(
                jax.random.PRNGKey(1), step), i)
            skeys = jax.random.split(tkey, self.config.num_shards)
            out[tname] = _per_shard(
                lambda st, rows, gg, k, unbatched: table_lib.apply_gradients(
                    spec, st, rows, gg, step, key=k, unbatched=unbatched),
                states[tname], jnp.asarray(tin["rows"]), g, skeys)
        return out

    # convenience: full differentiable embed step ----------------------

    def embed(self, states: Dict, inputs: Dict, step=0
              ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        """lookup + retrieve + pool; returns (pooled features, unique buffers
        BEFORE retrieval — gradients w.r.t. these feed apply_gradients)."""
        unique = self.lookup_unique(states, inputs)
        retrieved = self.retrieve_unique(unique, step)
        return self.pool_features(retrieved, inputs), unique
