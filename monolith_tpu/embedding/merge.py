"""Merging same-config tables.

TPU-native rebuild of ref MergedMultiTypeHashTable
(multi_type_hash_table.py:253): slots whose table configs are identical are
merged into ONE physical table (keyed by the config), reducing per-table
overhead; a slot mapping records where each original slot landed. Correct
only when slots use slot-encoded fids (disjoint id spaces — fid.h:22), which
the data layer's make_fid_v1/v2 guarantee.
"""

from __future__ import annotations

import dataclasses
import hashlib
import warnings
from typing import Dict, List, Sequence, Tuple

from monolith_tpu.embedding.spec import TableSpec
from monolith_tpu.feature import FeatureConfig


def _config_key(spec: TableSpec) -> str:
    """Stable digest of everything except name/capacity (ref :305 md5 of
    table config)."""
    payload = repr((spec.segments, spec.admission, spec.eviction,
                    str(spec.dtype), spec.stochastic_rounding))
    return hashlib.md5(payload.encode()).hexdigest()[:12]


def merge_table_specs(specs: Sequence[TableSpec],
                      features: Sequence[FeatureConfig],
                      max_group_bytes: int = 0
                      ) -> Tuple[List[TableSpec], List[FeatureConfig],
                                 Dict[str, str]]:
    """Group identically-configured tables into merged tables.

    Returns (merged specs, features remapped to merged tables,
    {original table name: merged table name}). Capacities add up.

    `max_group_bytes` > 0 caps each merged pool's physical size (padded
    row bytes x summed capacity): members are first-fit binned so no
    merged pool exceeds the cap; 0 merges without limit.

    History of the flag (PERF.md "Pallas-kernel memory-pressure cliff"):
    it was added as an escape hatch for a >2 GB Pallas row-DMA cliff seen
    in the round-2 device window. The round-4 device window resolved the
    decision tree: the cliff does NOT reproduce on current stacks
    (cliff_repro5: no cliff to 2 GB), and binning a ~2.5 GB pool into
    exactly TWO ~1.25 GB segments is itself a measured pathology
    (cliff_repro6: 36.9 ms/step vs 2.96 ms as one segment or 3.02 ms as
    four). Binning therefore exists for CAPACITY reasons only; a
    2-3-segment split in the GB band is warned against below."""
    groups: Dict[str, List[TableSpec]] = {}
    for spec in specs:
        groups.setdefault(_config_key(spec), []).append(spec)

    mapping: Dict[str, str] = {}
    merged: List[TableSpec] = []
    for key, members in groups.items():
        if len(members) == 1:
            merged.append(members[0])
            mapping[members[0].name] = members[0].name
            continue
        bins: List[List[TableSpec]] = [members]
        if max_group_bytes > 0:
            import numpy as np

            from monolith_tpu.embedding.table import packed_padded_width
            row_bytes = (packed_padded_width(members[0])
                         * np.dtype(members[0].dtype).itemsize)
            bins = []
            sizes: List[int] = []
            for m in sorted(members, key=lambda s: -s.capacity_per_shard):
                b = m.capacity_per_shard * row_bytes
                for i, used in enumerate(sizes):
                    if used + b <= max_group_bytes:
                        bins[i].append(m)
                        sizes[i] += b
                        break
                else:
                    bins.append([m])
                    sizes.append(b)
            # Measured pathology guard (VERDICT r4 #5 / cliff_repro6,
            # PERF.md round-4 device window): a total-GB-scale pool split
            # into exactly 2-3 ~GB segments ran 12x slower than the same
            # bytes as ONE segment or FOUR segments (36.9 ms vs
            # 2.96/3.02 ms per step). Warn so a user binning for capacity
            # doesn't silently land on the slow configuration.
            if (2 <= len(bins) <= 3
                    and max(sizes) >= (1 << 30)):
                warnings.warn(
                    f"merge_max_bytes={max_group_bytes} bins "
                    f"{len(members)} tables into {len(bins)} segments of "
                    f"{[round(s / (1 << 30), 2) for s in sizes]} GiB; "
                    "2-3 GB-scale segments are a measured slow "
                    "configuration on TPU (cliff_repro6: 36.9 ms/step vs "
                    "2.96 ms unsegmented, PERF.md round-4). Prefer "
                    "merge_max_bytes=0 (one segment), a cap small enough "
                    "for >=4 segments, or a bf16 pool (halves bytes).",
                    stacklevel=2)
        for gi, group in enumerate(bins):
            if len(group) == 1 and len(bins) > 1:
                merged.append(group[0])
                mapping[group[0].name] = group[0].name
                continue
            name = "merged_" + key + (f"_{gi}" if len(bins) > 1 else "")
            cap = sum(m.capacity_per_shard for m in group)
            merged.append(dataclasses.replace(group[0], name=name,
                                              capacity_per_shard=cap))
            for m in group:
                mapping[m.name] = name

    new_features = [dataclasses.replace(f, table=mapping[f.table])
                    for f in features]
    return merged, new_features, mapping
