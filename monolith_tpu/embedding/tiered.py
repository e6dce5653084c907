"""Two-tier embedding storage: HBM working set + host-RAM archive.

SURVEY §7 hard-part (b): production tables (10^8+ ids) exceed a chip's HBM.
The reference keeps everything in host RAM and pays a host lookup per step;
here the hot working set lives in the fixed-capacity HBM row pool (fast
gather/scatter on device) and cold rows spill to a host-RAM archive:

  - spill: expired/evicted rows' full state (params + optimizer slots) is
    read back from the device pool and stored host-side before their HBM rows
    are recycled
  - revive: when a spilled id is admitted again, its archived state is
    restored into the newly assigned HBM row as part of the jitted step (a
    values channel alongside new_rows), so training resumes exactly where the
    id left off

The archive itself reuses the collisionless HostStore as its fid -> archive
row map plus flat numpy value arrays, with its own LRU-ish recycling.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from monolith_tpu.embedding.host_store import HostStore
from monolith_tpu.embedding.spec import TableSpec


def state_width(spec: TableSpec) -> int:
    """Total row width: params dim + all optimizer slot widths."""
    w = spec.dim
    for seg in spec.segments:
        for _, (k, _) in sorted(seg.optimizer.slot_spec(seg.dim).items()):
            w += k
    return w


def pack_rows(spec: TableSpec, shard_state, rows: np.ndarray) -> np.ndarray:
    """Gather [len(rows), width] full-state matrix from a (host-side) shard
    state. In packed mode this is a direct slice — the archive row format IS
    the device row format."""
    if "data" in shard_state:
        return np.asarray(shard_state["data"],
                          np.float32)[rows][:, :state_width(spec)]
    pieces = [np.asarray(shard_state["params"], np.float32)[rows]]
    for seg, seg_slots in zip(spec.segments, shard_state["slots"]):
        for name in sorted(seg_slots):
            pieces.append(np.asarray(seg_slots[name], np.float32)[rows])
    return np.concatenate(pieces, axis=1)


def split_row_values(spec: TableSpec, values: np.ndarray
                     ) -> Tuple[np.ndarray, list]:
    """Inverse of pack_rows: (params [n, D], per-segment {name: [n, k]})."""
    off = spec.dim
    params = values[:, :off]
    slots = []
    for seg in spec.segments:
        d = {}
        for name, (k, _) in sorted(seg.optimizer.slot_spec(seg.dim).items()):
            d[name] = values[:, off:off + k]
            off += k
        slots.append(d)
    return params, slots


class RowArchive:
    """Host-RAM store of full row state for one table shard."""

    def __init__(self, spec: TableSpec, capacity: int, seed: int = 0):
        self.spec = spec
        self.capacity = capacity
        self.width = state_width(spec)
        self.map = HostStore(row_capacity=capacity, seed=seed)
        self.values = np.zeros((capacity, self.width), dtype=np.float32)
        self.tss = np.zeros(capacity, dtype=np.uint32)
        self.spilled = 0
        self.revived = 0
        self.dropped = 0

    def spill(self, fids: np.ndarray, values: np.ndarray, ts: int) -> int:
        """Store rows; if full, recycle the oldest archived rows."""
        fids = np.asarray(fids, np.int64)
        rows, _, _ = self.map.assign(fids, ts=ts)
        full = rows < 0
        if full.any():
            # evict oldest archive entries to make room
            need = int(full.sum())
            a_fids, a_rows, a_tss, _ = self.map.save()
            order = np.argsort(a_tss)[:need]
            if len(order):
                self.map.restore(np.delete(a_fids, order),
                                 np.delete(a_rows, order),
                                 np.delete(a_tss, order), None)
                rows2, _, _ = self.map.assign(fids[full], ts=ts)
                rows[full] = rows2
            self.dropped += int((rows < 0).sum())
        ok = rows >= 0
        self.values[rows[ok]] = values[ok]
        self.tss[rows[ok]] = ts
        self.spilled += int(ok.sum())
        return int(ok.sum())

    def revive(self, fids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Look up archived rows for fids; returns (mask, values [n, width]).
        Revived entries are removed from the archive."""
        fids = np.asarray(fids, np.int64)
        rows = self.map.lookup(fids)
        ok = rows >= 0
        out = np.zeros((len(fids), self.width), dtype=np.float32)
        out[ok] = self.values[rows[ok]]
        if ok.any():
            # remove revived entries (their state now lives in HBM)
            a_fids, a_rows, a_tss, _ = self.map.save()
            keep = ~np.isin(a_fids, fids[ok])
            self.map.restore(a_fids[keep], a_rows[keep], a_tss[keep], None)
        self.revived += int(ok.sum())
        return ok, out

    def size(self) -> int:
        return self.map.size()

    def save(self, path: str) -> None:
        fids, rows, tss, counts = self.map.save()
        np.savez(path, fids=fids, rows=rows, tss=tss,
                 values=self.values[rows] if len(rows) else
                 np.zeros((0, self.width), np.float32))

    def restore(self, path: str) -> None:
        z = np.load(path)
        fids = z["fids"]
        self.map = HostStore(row_capacity=self.capacity)
        if len(fids):
            rows, _, _ = self.map.assign(fids)
            self.values[rows] = z["values"]
            self.tss[rows] = z["tss"]
