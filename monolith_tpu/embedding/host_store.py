"""Python wrappers over the native host sparse core.

`HostStore` is the collisionless fid -> row map (one per table shard) with
admission filtering, expiry eviction and touched-key tracking — the TPU-native
equivalent of the reference's C++ cuckoo hash table + hash filter + hopscotch
touched-key set (ref: runtime/hash_table/cuckoohash/cuckoo_embedding_hash_table.cc:118,
runtime/hash_filter/sliding_hash_filter.h:26, runtime/hopscotch/hopscotch_hash_set.h:52).
Unlike the reference, the store holds NO float data: embedding rows and
optimizer state live in TPU HBM row pools; the store only assigns row indices.

`Batcher` wraps the dedup/shard host op (ref ShardingSparseFidsOp,
data/kernels/parse_sparse_feature.h:42).
"""

from __future__ import annotations

import ctypes
import enum
from typing import Optional, Tuple

import numpy as np

from monolith_tpu import native


class FilterKind(enum.IntEnum):
    NONE = 0
    SLIDING = 1       # sliding count-min window (ref SlidingHashFilter)
    PROBABILISTIC = 2  # stateless equal-probability admission
    PROBABILISTIC_UNEQUAL = 3  # admit prob proportional to batch count


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class HostStore:
    """Collisionless fid -> row index map for one table shard."""

    def __init__(self,
                 row_capacity: int,
                 filter_kind: FilterKind = FilterKind.NONE,
                 admit_threshold: int = 1,
                 filter_capacity: int = 0,
                 filter_splits: int = 5,
                 seed: int = 0):
        self._lib = native.get_lib()
        self.row_capacity = int(row_capacity)
        self.filter_kind = FilterKind(filter_kind)
        self.admit_threshold = int(admit_threshold)
        self._h = self._lib.mt_store_new(
            self.row_capacity, int(filter_kind), int(filter_capacity),
            int(filter_splits), int(admit_threshold), int(seed))
        self.last_rejected = 0  # budget-rejected ids from the last map call

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.mt_store_free(h)
            self._h = None

    def map_train(self, fids: np.ndarray, ts: int, new_cap: Optional[int] = None,
                  record_touch: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Map fids to rows for a training step.

        Admits new ids subject to the admission filter AND the per-call
        `new_cap` budget: once k == new_cap ids have been admitted, further
        new ids are rejected for this step (row -1, retried next step) so
        the device always initializes every admitted row — an over-budget
        admission would silently inherit stale state from a recycled row.
        Returns (rows int32 [n] with -1 for filtered/rejected/
        out-of-capacity, new_rows int32 [k], new_fids int64 [k]); the number
        of budget-rejected ids is exposed as `self.last_rejected`.
        """
        fids = np.ascontiguousarray(fids, dtype=np.int64)
        n = fids.size
        if new_cap is None:
            new_cap = n
        rows = np.empty(n, dtype=np.int32)
        new_rows = np.empty(new_cap, dtype=np.int32)
        new_fids = np.empty(new_cap, dtype=np.int64)
        new_count = np.zeros(1, dtype=np.int64)
        self._lib.mt_store_map_train(
            self._h, _ptr(fids, ctypes.c_int64), n, ts,
            _ptr(rows, ctypes.c_int32), _ptr(new_rows, ctypes.c_int32),
            _ptr(new_fids, ctypes.c_int64), new_cap,
            _ptr(new_count, ctypes.c_int64), 1 if record_touch else 0)
        k = min(int(new_count[0]), new_cap)
        self.last_rejected = int(new_count[0]) - k
        return rows, new_rows[:k], new_fids[:k]

    def map_train_pos(self, fids: np.ndarray, ts: int,
                      new_cap: Optional[int] = None,
                      record_touch: bool = False,
                      counts: Optional[np.ndarray] = None
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """map_train that also returns each new id's POSITION within `fids`
        (strictly increasing int32 [k]) — the compact wire format ships
        positions (int16-able) instead of a second int32 row array.
        `counts` (optional, int32 [n]): per-fid batch occurrence counts,
        consumed by the probabilistic admission filters (ref
        ShouldBeFiltered's `count`, probabilistic_filter.h:48)."""
        fids = np.ascontiguousarray(fids, dtype=np.int64)
        n = fids.size
        if new_cap is None:
            new_cap = n
        rows = np.empty(n, dtype=np.int32)
        new_rows = np.empty(new_cap, dtype=np.int32)
        new_fids = np.empty(new_cap, dtype=np.int64)
        new_pos = np.empty(new_cap, dtype=np.int32)
        new_count = np.zeros(1, dtype=np.int64)
        if counts is not None:
            counts = np.ascontiguousarray(counts, dtype=np.int32)
            self._lib.mt_store_map_train_pos2(
                self._h, _ptr(fids, ctypes.c_int64), n, ts,
                _ptr(counts, ctypes.c_int32),
                _ptr(rows, ctypes.c_int32), _ptr(new_rows, ctypes.c_int32),
                _ptr(new_fids, ctypes.c_int64), _ptr(new_pos, ctypes.c_int32),
                new_cap, _ptr(new_count, ctypes.c_int64),
                1 if record_touch else 0)
        else:
            self._lib.mt_store_map_train_pos(
                self._h, _ptr(fids, ctypes.c_int64), n, ts,
                _ptr(rows, ctypes.c_int32), _ptr(new_rows, ctypes.c_int32),
                _ptr(new_fids, ctypes.c_int64), _ptr(new_pos, ctypes.c_int32),
                new_cap, _ptr(new_count, ctypes.c_int64),
                1 if record_touch else 0)
        k = min(int(new_count[0]), new_cap)
        self.last_rejected = int(new_count[0]) - k
        return rows, new_rows[:k], new_fids[:k], new_pos[:k]

    def lookup(self, fids: np.ndarray) -> np.ndarray:
        """Read-only lookup; missing ids map to -1 (serving path)."""
        fids = np.ascontiguousarray(fids, dtype=np.int64)
        rows = np.empty(fids.size, dtype=np.int32)
        self._lib.mt_store_lookup(self._h, _ptr(fids, ctypes.c_int64),
                                  fids.size, _ptr(rows, ctypes.c_int32))
        return rows

    def assign(self, fids: np.ndarray, ts: int = 0
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Map fids to rows, unconditionally admitting (restore / param-sync)."""
        fids = np.ascontiguousarray(fids, dtype=np.int64)
        n = fids.size
        rows = np.empty(n, dtype=np.int32)
        new_rows = np.empty(n, dtype=np.int32)
        new_fids = np.empty(n, dtype=np.int64)
        new_count = np.zeros(1, dtype=np.int64)
        self._lib.mt_store_assign(
            self._h, _ptr(fids, ctypes.c_int64), n, ts,
            _ptr(rows, ctypes.c_int32), _ptr(new_rows, ctypes.c_int32),
            _ptr(new_fids, ctypes.c_int64), n, _ptr(new_count, ctypes.c_int64))
        k = int(new_count[0])
        return rows, new_rows[:k], new_fids[:k]

    def evict_expired(self, expire_before: int, return_fids: bool = False):
        """Evict all entries with last-update ts < expire_before.

        Returns the freed row indices (so the caller can zero them on
        device), or (rows, fids) when return_fids=True (two-tier spill)."""
        cap = self.size()
        out = np.empty(max(cap, 1), dtype=np.int32)
        if return_fids:
            fids = np.empty(max(cap, 1), dtype=np.int64)
            n = self._lib.mt_store_evict_expired2(
                self._h, expire_before, _ptr(out, ctypes.c_int32),
                _ptr(fids, ctypes.c_int64), cap)
            n = min(n, cap)
            return out[:n], fids[:n]
        n = self._lib.mt_store_evict_expired(self._h, expire_before,
                                             _ptr(out, ctypes.c_int32), cap)
        return out[:min(n, cap)]

    def size(self) -> int:
        return int(self._lib.mt_store_size(self._h))

    def save(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Dump (fids, rows, timestamps, counts)."""
        n = self.size()
        fids = np.empty(n, dtype=np.int64)
        rows = np.empty(n, dtype=np.int32)
        tss = np.empty(n, dtype=np.uint32)
        counts = np.empty(n, dtype=np.uint32)
        m = self._lib.mt_store_save(self._h, _ptr(fids, ctypes.c_int64),
                                    _ptr(rows, ctypes.c_int32),
                                    _ptr(tss, ctypes.c_uint32),
                                    _ptr(counts, ctypes.c_uint32))
        assert m == n
        return fids, rows, tss, counts

    def restore(self, fids: np.ndarray, rows: np.ndarray,
                tss: Optional[np.ndarray] = None,
                counts: Optional[np.ndarray] = None) -> None:
        fids = np.ascontiguousarray(fids, dtype=np.int64)
        rows = np.ascontiguousarray(rows, dtype=np.int32)
        n = fids.size
        tss = np.ascontiguousarray(
            tss if tss is not None else np.zeros(n), dtype=np.uint32)
        counts = np.ascontiguousarray(
            counts if counts is not None else np.zeros(n), dtype=np.uint32)
        ok = self._lib.mt_store_restore(
            self._h, _ptr(fids, ctypes.c_int64), _ptr(rows, ctypes.c_int32),
            _ptr(tss, ctypes.c_uint32), _ptr(counts, ctypes.c_uint32), n)
        if not ok:
            raise ValueError("HostStore.restore failed: duplicate fids/rows "
                             "or rows out of range")

    # --- touched keys (online parameter sync) ---

    def touched_size(self) -> int:
        return int(self._lib.mt_store_touched_size(self._h))

    def drain_touched(self, cap: Optional[int] = None) -> np.ndarray:
        """Drain (dedup'd) fids touched since last drain ("steal")."""
        if cap is None:
            cap = self.touched_size()
        out = np.empty(max(cap, 1), dtype=np.int64)
        n = self._lib.mt_store_drain_touched(self._h, _ptr(out, ctypes.c_int64), cap)
        return out[:n]

    # --- filter state ---

    def filter_estimate(self, fid: int) -> int:
        """Estimated occurrence count in the sliding window (-1 if no filter)."""
        return int(self._lib.mt_store_filter_estimate(self._h, int(fid)))

    def filter_save(self) -> bytes:
        n = self._lib.mt_store_filter_byte_size(self._h)
        if n == 0:
            return b""
        buf = np.empty(n, dtype=np.uint8)
        m = self._lib.mt_store_filter_save(self._h, _ptr(buf, ctypes.c_uint8))
        return buf[:m].tobytes()

    def filter_restore(self, data: bytes) -> None:
        if not data:
            return
        buf = np.frombuffer(data, dtype=np.uint8).copy()
        ok = self._lib.mt_store_filter_restore(self._h, _ptr(buf, ctypes.c_uint8), buf.size)
        if not ok:
            raise ValueError("filter_restore failed (shape mismatch)")


class Batcher:
    """Dedup + shard bucketing for one merged table's fid stream."""

    def __init__(self, expected_unique: int = 4096):
        self._lib = native.get_lib()
        self._h = self._lib.mt_batcher_new(int(expected_unique))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.mt_batcher_free(h)
            self._h = None

    def dedup(self, values: np.ndarray, num_shards: int, shard_cap: int
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        """Dedup/shard a flat fid stream (padding fid == -1).

        Returns (unique [num_shards, shard_cap] int64 padded with -1,
                 index [n] int32 into unique.flatten() with -1 for padding,
                 shard_counts [num_shards] int32,
                 overflow count of unique ids dropped for capacity).
        """
        values = np.ascontiguousarray(values, dtype=np.int64).ravel()
        unique = np.empty((num_shards, shard_cap), dtype=np.int64)
        index = np.empty(values.size, dtype=np.int32)
        counts = np.empty(num_shards, dtype=np.int32)
        overflow = self._lib.mt_batcher_dedup(
            self._h, _ptr(values, ctypes.c_int64), values.size,
            num_shards, shard_cap, _ptr(unique, ctypes.c_int64),
            _ptr(index, ctypes.c_int32), _ptr(counts, ctypes.c_int32))
        return unique, index, counts, int(overflow)

    def dedup_counts(self, values: np.ndarray, num_shards: int,
                     shard_cap: int):
        """dedup that also returns per-unique batch occurrence counts
        ([num_shards, shard_cap] int32, same layout as `unique`) — consumed
        by the probabilistic admission filters."""
        values = np.ascontiguousarray(values, dtype=np.int64).ravel()
        unique = np.empty((num_shards, shard_cap), dtype=np.int64)
        index = np.empty(values.size, dtype=np.int32)
        counts = np.empty(num_shards, dtype=np.int32)
        occ = np.empty((num_shards, shard_cap), dtype=np.int32)
        overflow = self._lib.mt_batcher_dedup2(
            self._h, _ptr(values, ctypes.c_int64), values.size,
            num_shards, shard_cap, _ptr(unique, ctypes.c_int64),
            _ptr(index, ctypes.c_int32), _ptr(counts, ctypes.c_int32),
            _ptr(occ, ctypes.c_int32))
        return unique, index, counts, occ, int(overflow)


def prepare_wire(batcher: "Batcher", store: HostStore,
                 streams, ts: int, unique_cap: int, new_cap: int,
                 record_touch: bool, wire_out: np.ndarray) -> Tuple[int, int, int, int]:
    """Fused single-shard host prepare (C++ `mt_prepare_wire`): dedup the
    feature streams, map unique fids through `store`, and write the packed
    wire words (rows|new_bit then int16 indices) into `wire_out` in one pass
    — the per-step replacement for prepare_batch + pack_wire on the
    fuse_wire path. `streams` is a list of contiguous int64 arrays; wire_out
    must be a contiguous int32 array of exactly
    unique_cap + sum(ceil(s.size/2)) words.

    Returns (overflow, new_count, unique_count, filtered_count,
    new_rejected) — new_rejected counts ids that passed admission but ran
    over the per-step new_cap budget (rejected this step)."""
    n = len(streams)
    ptrs = (ctypes.POINTER(ctypes.c_int64) * n)(
        *[_ptr(s, ctypes.c_int64) for s in streams])
    sizes = np.array([s.size for s in streams], dtype=np.int64)
    stats = np.zeros(5, dtype=np.int64)
    words = batcher._lib.mt_prepare_wire(
        batcher._h, store._h, ptrs, _ptr(sizes, ctypes.c_int64), n, ts,
        unique_cap, new_cap, 1 if record_touch else 0,
        _ptr(wire_out, ctypes.c_int32), _ptr(stats, ctypes.c_int64))
    assert words == wire_out.size, (words, wire_out.size)
    return tuple(int(x) for x in stats)


def prepare_wire_multi(batchers, stores, table_streams, ts: int,
                       unique_caps, new_caps, record_touch: bool,
                       wire_out: np.ndarray, wire_offsets: np.ndarray
                       ) -> np.ndarray:
    """Multi-table fused host prepare: ONE native call for ALL tables, each
    table's dedup+map+pack running as one task on the native thread pool
    (ref ShardingSparseFidsOp parallel parse). `table_streams` is a list of
    per-table stream lists; `unique_caps`/`new_caps` are per-table step
    capacities (ints or [T] sequences); `wire_offsets` [T+1] gives each
    table's word offset in `wire_out`. Returns stats as an int64 [T, 5]
    array (overflow, new, unique, filtered, new_rejected per table)."""
    T = len(batchers)
    flat = [s for streams in table_streams for s in streams]
    n = len(flat)
    ptrs = (ctypes.POINTER(ctypes.c_int64) * n)(
        *[_ptr(s, ctypes.c_int64) for s in flat])
    sizes = np.array([s.size for s in flat], dtype=np.int64)
    soffs = np.zeros(T + 1, dtype=np.int64)
    np.cumsum([len(st) for st in table_streams], out=soffs[1:])
    bh = (ctypes.c_void_p * T)(*[b._h for b in batchers])
    sh = (ctypes.c_void_p * T)(*[s._h for s in stores])
    ucaps = np.broadcast_to(np.asarray(unique_caps, np.int64),
                            (T,)).copy()
    ncaps = np.broadcast_to(np.asarray(new_caps, np.int64), (T,)).copy()
    stats = np.zeros((T, 5), dtype=np.int64)
    lib = batchers[0]._lib
    words = lib.mt_prepare_wire_multi(
        T, bh, sh, ptrs, _ptr(sizes, ctypes.c_int64),
        _ptr(soffs, ctypes.c_int64), _ptr(wire_offsets, ctypes.c_int64),
        ts, _ptr(ucaps, ctypes.c_int64), _ptr(ncaps, ctypes.c_int64),
        1 if record_touch else 0,
        _ptr(wire_out, ctypes.c_int32), _ptr(stats, ctypes.c_int64))
    assert words == wire_out.size, (words, wire_out.size)
    return stats


def host_threads() -> int:
    """Worker threads in the native host pool (0 = inline execution)."""
    return int(native.get_lib().mt_host_threads())


class Batcher2D:
    """Two-level dedup for the bucketed all-to-all exchange (ref
    distributed_ps_sync.py:95 per-worker dedup + per-destination buckets):
    global unique per table shard (for the host map + local lookup) plus
    per-(table shard, batch shard) buckets of positions into the global
    unique list."""

    def __init__(self, expected_unique: int = 4096):
        self._lib = native.get_lib()
        self._h = self._lib.mt_batcher2d_new(int(expected_unique))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.mt_batcher2d_free(h)
            self._h = None

    def dedup(self, values: np.ndarray, num_batch_shards: int, num_shards: int,
              global_cap: int, bucket_cap: int):
        """values: flat int64, batch-shard-major, length divisible by
        num_batch_shards, padding fid == -1.

        Returns (unique [S, global_cap] i64 pad -1, counts [S] i32,
                 bucket_idx [S, D, bucket_cap] i32 pad -1 — positions into
                 shard s's unique list, bucket_counts [S, D] i32,
                 index [n] i32 — per value, index into its batch shard's
                 local receive buffer [S*bucket_cap], -1 pad/overflow,
                 overflow count)."""
        values = np.ascontiguousarray(values, dtype=np.int64).ravel()
        n = values.size
        assert n % num_batch_shards == 0
        S, D = num_shards, num_batch_shards
        unique = np.empty((S, global_cap), dtype=np.int64)
        counts = np.empty(S, dtype=np.int32)
        bucket_idx = np.empty((S, D, bucket_cap), dtype=np.int32)
        bucket_counts = np.empty((S, D), dtype=np.int32)
        index = np.empty(n, dtype=np.int32)
        overflow = self._lib.mt_batcher2d_dedup(
            self._h, _ptr(values, ctypes.c_int64), n, D, S,
            global_cap, bucket_cap,
            _ptr(unique, ctypes.c_int64), _ptr(counts, ctypes.c_int32),
            _ptr(bucket_idx, ctypes.c_int32),
            _ptr(bucket_counts, ctypes.c_int32),
            _ptr(index, ctypes.c_int32))
        return unique, counts, bucket_idx, bucket_counts, index, int(overflow)

    def dedup2(self, values: np.ndarray, num_batch_shards: int,
               num_shards: int, global_cap: int, bucket_cap: int):
        """dedup that also returns per-unique batch occurrence counts
        ([S, global_cap] int32, aligned with `unique`) — feeds the
        count-proportional admission filters on the bucketed-a2a path
        (ref embedding_hash_table_tf_bridge.cc:183 passes per-id counts on
        every path, not just the single-worker one)."""
        values = np.ascontiguousarray(values, dtype=np.int64).ravel()
        n = values.size
        assert n % num_batch_shards == 0
        S, D = num_shards, num_batch_shards
        unique = np.empty((S, global_cap), dtype=np.int64)
        counts = np.empty(S, dtype=np.int32)
        bucket_idx = np.empty((S, D, bucket_cap), dtype=np.int32)
        bucket_counts = np.empty((S, D), dtype=np.int32)
        index = np.empty(n, dtype=np.int32)
        occ = np.empty((S, global_cap), dtype=np.int32)
        overflow = self._lib.mt_batcher2d_dedup2(
            self._h, _ptr(values, ctypes.c_int64), n, D, S,
            global_cap, bucket_cap,
            _ptr(unique, ctypes.c_int64), _ptr(counts, ctypes.c_int32),
            _ptr(bucket_idx, ctypes.c_int32),
            _ptr(bucket_counts, ctypes.c_int32),
            _ptr(index, ctypes.c_int32), _ptr(occ, ctypes.c_int32))
        return (unique, counts, bucket_idx, bucket_counts, index, occ,
                int(overflow))


def shard_of(fid: int, num_shards: int) -> int:
    return int(native.get_lib().mt_shard_of(int(fid), int(num_shards)))


def shard_of_batch(fids: np.ndarray, num_shards: int) -> np.ndarray:
    """Vectorized shard_of: splitmix64(fid) % num_shards over a whole array
    (numpy uint64 wrap-around matches the C++ arithmetic exactly). Used by
    checkpoint resharding, where a per-fid FFI round-trip would turn a
    restore of millions of entries into minutes of ctypes overhead."""
    x = np.asarray(fids).astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(num_shards)).astype(np.int64)
