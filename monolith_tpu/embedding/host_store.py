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

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.mt_store_free(h)
            self._h = None

    def map_train(self, fids: np.ndarray, ts: int, new_cap: Optional[int] = None,
                  record_touch: bool = False
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Map fids to rows for a training step.

        Admits new ids subject to the admission filter. Returns
        (rows int32 [n] with -1 for filtered/out-of-capacity,
         new_rows int32 [k], new_fids int64 [k]) where k is the number of ids
        admitted by this call (so the device can initialize those rows).
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
        return rows, new_rows[:k], new_fids[:k]

    def map_train_pos(self, fids: np.ndarray, ts: int,
                      new_cap: Optional[int] = None,
                      record_touch: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """map_train that also returns each new id's POSITION within `fids`
        (strictly increasing int32 [k]) — the compact wire format ships
        positions (int16-able) instead of a second int32 row array."""
        fids = np.ascontiguousarray(fids, dtype=np.int64)
        n = fids.size
        if new_cap is None:
            new_cap = n
        rows = np.empty(n, dtype=np.int32)
        new_rows = np.empty(new_cap, dtype=np.int32)
        new_fids = np.empty(new_cap, dtype=np.int64)
        new_pos = np.empty(new_cap, dtype=np.int32)
        new_count = np.zeros(1, dtype=np.int64)
        self._lib.mt_store_map_train_pos(
            self._h, _ptr(fids, ctypes.c_int64), n, ts,
            _ptr(rows, ctypes.c_int32), _ptr(new_rows, ctypes.c_int32),
            _ptr(new_fids, ctypes.c_int64), _ptr(new_pos, ctypes.c_int32),
            new_cap, _ptr(new_count, ctypes.c_int64),
            1 if record_touch else 0)
        k = min(int(new_count[0]), new_cap)
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

    Returns (overflow, new_count, unique_count, filtered_count)."""
    n = len(streams)
    ptrs = (ctypes.POINTER(ctypes.c_int64) * n)(
        *[_ptr(s, ctypes.c_int64) for s in streams])
    sizes = np.array([s.size for s in streams], dtype=np.int64)
    stats = np.zeros(4, dtype=np.int64)
    words = batcher._lib.mt_prepare_wire(
        batcher._h, store._h, ptrs, _ptr(sizes, ctypes.c_int64), n, ts,
        unique_cap, new_cap, 1 if record_touch else 0,
        _ptr(wire_out, ctypes.c_int32), _ptr(stats, ctypes.c_int64))
    assert words == wire_out.size, (words, wire_out.size)
    return int(stats[0]), int(stats[1]), int(stats[2]), int(stats[3])


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


def shard_of(fid: int, num_shards: int) -> int:
    return int(native.get_lib().mt_shard_of(int(fid), int(num_shards)))
