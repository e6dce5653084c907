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
    merged pool exceeds the cap. Use to keep f32 pools under the Pallas
    DMA memory cliff (~2 GB, PERF.md) while still collapsing dozens of
    launches to a handful; 0 merges without limit."""
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
