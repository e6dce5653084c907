"""Production-shaped many-slot CTR task: N tables, dozens of sparse slots,
one DIN-attended click-history sequence.

The reference's real workloads are dozens-of-slots models (feature_list
config files with hundreds of slot lines; ShardingSparseFidsOp exists to
parse+shard that many streams in one op, data/kernels/parse_sparse_feature.h:42).
The single-table DeepFM bench flatters the host path — per-table dedup/map
cost scales with table count — so this task is the second bench config
(bench.py MT_BENCH_CONFIG=multislot) and the scaling fixture for the
thread-pooled host prepare.

Layout: `num_slots` scalar features assigned round-robin onto `num_tables`
merged tables (the reference's MergedMultiTypeHashTable role, same-config
slots sharing one table), plus a history sequence on its own table pooled
with FirstN and attended against slot_0's vector (DIN, layers/feature_seq.py).
Each table row = [1-dim SGD bias | dim-dim Adagrad vector].
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.embedding import initializers, optimizers
from monolith_tpu.embedding.spec import TableSegment, TableSpec
from monolith_tpu.feature import FeatureConfig
from monolith_tpu.layers.feature_seq import DIN
from monolith_tpu.layers.mlp import MLP
from monolith_tpu.training.task import RecTask


class MultiSlotModule(nn.Module):
    embedding_dim: int = 16
    hidden: Sequence[int] = (256, 128, 64)
    num_slots: int = 40
    history_length: int = 20
    dense_dtype: jnp.dtype = None  # bf16: tower matmuls on the MXU

    @nn.compact
    def __call__(self, pooled: Dict[str, jnp.ndarray], batch,
                 training: bool = False):
        d = self.embedding_dim
        bias = 0.0
        vecs = []
        for s in range(self.num_slots):
            e = pooled[f"slot_{s}"]
            bias = bias + e[:, 0]
            vecs.append(e[:, 1:1 + d])
        seq = pooled["hist_items"]            # [B, L, 1+d] (FirstN)
        mask = (jnp.arange(self.history_length)[None, :]
                < batch["hist_len"][:, None])
        att = DIN(name="din")(vecs[0], seq[:, :, 1:1 + d], mask=mask)
        deep_in = jnp.concatenate(vecs + [att], axis=-1)
        deep = MLP(output_dims=(*self.hidden, 1),
                   compute_dtype=self.dense_dtype, name="deep")(deep_in)[:, 0]
        return {"logits": bias + deep}


@dataclasses.dataclass
class MultiSlotTask(RecTask):
    name: str = "multislot"
    num_tables: int = 16
    num_slots: int = 40
    embedding_dim: int = 16
    capacity_per_shard: int = 1 << 18
    history_length: int = 20
    hidden: Sequence[int] = (256, 128, 64)
    vector_lr: float = 0.5
    bias_lr: float = 0.5
    init_scale: float = 0.05
    table_dtype: jnp.dtype = jnp.float32
    stochastic_rounding: bool = False
    dense_dtype: jnp.dtype = None
    # Merge the identically-configured tables into ONE physical table (ref
    # MergedMultiTypeHashTable, multi_type_hash_table.py:253): slot-encoded
    # fids are disjoint across slots, capacities add up, and the engine then
    # runs ONE gather + ONE scatter per step instead of one pair per table —
    # the production-shaped fast path (PERF.md round 3).
    merge: bool = False
    # Cap each merged pool's physical bytes (first-fit binning in
    # merge_table_specs): keeps f32 pools under the Pallas DMA memory
    # cliff (~2 GB, PERF.md) while still collapsing launches. 0 = one pool.
    merge_max_bytes: int = 0

    def _segments(self):
        return (
            TableSegment(dim=1,
                         optimizer=optimizers.SGD(learning_rate=self.bias_lr),
                         initializer=initializers.Zeros()),
            TableSegment(dim=self.embedding_dim,
                         optimizer=optimizers.Adagrad(
                             learning_rate=self.vector_lr,
                             initial_accumulator_value=0.01),
                         initializer=initializers.RandomUniform(
                             -self.init_scale, self.init_scale)),
        )

    def _raw(self):
        specs = [TableSpec(name=f"table_{t}",
                           capacity_per_shard=self.capacity_per_shard,
                           segments=self._segments(),
                           dtype=self.table_dtype,
                           stochastic_rounding=self.stochastic_rounding)
                 for t in range(self.num_tables)]
        specs.append(TableSpec(name="table_hist",
                               capacity_per_shard=self.capacity_per_shard,
                               segments=self._segments(),
                               dtype=self.table_dtype,
                               stochastic_rounding=self.stochastic_rounding))
        feats = [FeatureConfig(name=f"slot_{s}",
                               table=f"table_{s % self.num_tables}",
                               max_length=1, combiner="sum")
                 for s in range(self.num_slots)]
        feats.append(FeatureConfig(name="hist_items", table="table_hist",
                                   max_length=self.history_length,
                                   combiner="firstn"))
        if not self.merge:
            return specs, feats
        from monolith_tpu.embedding.merge import merge_table_specs
        import dataclasses as _dc
        specs, feats, mapping = merge_table_specs(
            specs, feats, max_group_bytes=self.merge_max_bytes)
        # identical configs -> one merged table (or a few capped bins);
        # stable names so EngineConfig per-table caps can reference them
        m_names = sorted(s.name for s in specs if s.name.startswith("merged_"))
        rename = ({m_names[0]: "table_all"} if len(m_names) == 1 else
                  {n: f"table_all_{i}" for i, n in enumerate(m_names)})
        specs = [_dc.replace(s, name=rename.get(s.name, s.name))
                 for s in specs]
        feats = [_dc.replace(f, table=rename.get(f.table, f.table))
                 for f in feats]
        return specs, feats

    def _built(self):
        # cache: engine construction consults tables() AND features(); the
        # spec build + merge binning should run once, and both views must
        # come from the same pass
        if "_raw_cache" not in self.__dict__:
            self.__dict__["_raw_cache"] = self._raw()
        return self.__dict__["_raw_cache"]

    def tables(self):
        return self._built()[0]

    def features(self):
        return self._built()[1]

    def build_module(self):
        return MultiSlotModule(embedding_dim=self.embedding_dim,
                               hidden=tuple(self.hidden),
                               num_slots=self.num_slots,
                               history_length=self.history_length,
                               dense_dtype=self.dense_dtype)
