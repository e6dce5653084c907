"""Declarative table / slice specs and learning-rate schedules.

TPU-native rebuild of the reference's table-config layer (ref: entry.py:27-630
optimizer/initializer/compressor config classes, CuckooHashTableConfig
entry.py:549, HashTableConfigInstance entry.py:566 with learning-rate fns).
The reference collects configs through a dry-run graph build; here specs are
plain frozen dataclasses composed ahead of time, so the step function can be
traced once with static structure.

A `TableSpec` is a merged table: one row pool whose row vector is the
concatenation of `segments` (the reference's feature "slices", each with its
own dim, optimizer, initializer, compressor — feature.py:122
add_feature_slice)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from monolith_tpu.embedding.compressors import Compressor, Fp32
from monolith_tpu.embedding.initializers import Initializer, RandomUniform
from monolith_tpu.embedding.optimizers import RowOptimizer, SGD


# --- learning-rate schedules (ref: learning_rate_functions.py:61) ---

@dataclasses.dataclass(frozen=True)
class LearningRateSchedule:
    def __call__(self, step: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Constant(LearningRateSchedule):
    value: float = 0.01

    def __call__(self, step):
        return jnp.asarray(self.value, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class PolynomialDecay(LearningRateSchedule):
    """lr decays from initial to end over decay_steps with given power
    (ref learning_rate_functions.py:61 mirrors tf PolynomialDecay)."""
    initial_learning_rate: float = 0.01
    decay_steps: int = 10000
    end_learning_rate: float = 0.0001
    power: float = 1.0
    cycle: bool = False

    def __call__(self, step):
        step = step.astype(jnp.float32)
        if self.cycle:
            mult = jnp.maximum(1.0, jnp.ceil(step / self.decay_steps))
            decay_steps = self.decay_steps * mult
        else:
            decay_steps = jnp.asarray(float(self.decay_steps))
            step = jnp.minimum(step, decay_steps)
        frac = 1.0 - step / decay_steps
        return ((self.initial_learning_rate - self.end_learning_rate)
                * frac ** self.power + self.end_learning_rate)


@dataclasses.dataclass(frozen=True)
class WarmupSchedule(LearningRateSchedule):
    """Linear warmup wrapper (the reference's per-optimizer warmup_steps
    fields, e.g. optimizer.proto:25, are applied at the lr-function layer)."""
    base: LearningRateSchedule = dataclasses.field(default_factory=Constant)
    warmup_steps: int = 0

    def __call__(self, step):
        lr = self.base(step)
        if self.warmup_steps <= 0:
            return lr
        scale = jnp.minimum(1.0, (step.astype(jnp.float32) + 1.0) / float(self.warmup_steps))
        return lr * scale


# --- table specs ---

@dataclasses.dataclass(frozen=True)
class TableSegment:
    """One slice of a table row: its own dim/optimizer/initializer/compressor
    (ref: feature.py:122 FeatureSlot.add_feature_slice + entry.py configs).
    `retriever` enables quantization-aware retrieval of this slice during
    training (ref retriever/fake_quant_retriever.cc, hash_net_retriever.cc)."""
    dim: int
    optimizer: RowOptimizer = dataclasses.field(default_factory=SGD)
    initializer: Initializer = dataclasses.field(default_factory=RandomUniform)
    compressor: Compressor = dataclasses.field(default_factory=Fp32)
    lr_schedule: Optional[LearningRateSchedule] = None
    retriever: Optional["Retriever"] = None  # embedding.retrievers

    def learning_rate(self, step: jnp.ndarray) -> jnp.ndarray:
        if self.lr_schedule is not None:
            return self.lr_schedule(step)
        return jnp.asarray(self.optimizer.learning_rate, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class AdmissionConfig:
    """Frequency-based feature admission (ref: sliding_hash_filter.h:26,
    probabilistic_filter.h:25; occurrence_threshold in CuckooHashTableConfig).

    Kinds: "sliding" counts occurrences in an approximate sliding window
    and admits at `threshold`; "probabilistic" admits each occurrence with
    an equal chance calibrated so P(admitted after threshold) = 95% (ref
    probabilistic_filter.cc:29); "probabilistic_unequal" admits with
    p = batch_count/threshold (ref :23) — both probabilistic modes are
    stateless (zero filter memory)."""
    kind: str = "none"  # none | sliding | probabilistic | probabilistic_unequal
    threshold: int = 1
    filter_capacity: int = 0
    filter_splits: int = 5


@dataclasses.dataclass(frozen=True)
class EvictionConfig:
    """Time-based expiry (ref: entry expire_time, cuckoo Evict)."""
    ttl_seconds: int = 0  # 0 = never evict


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """A merged embedding table: one fid space, one device row pool per shard."""
    name: str
    capacity_per_shard: int
    segments: Tuple[TableSegment, ...]
    admission: AdmissionConfig = dataclasses.field(default_factory=AdmissionConfig)
    eviction: EvictionConfig = dataclasses.field(default_factory=EvictionConfig)
    dtype: jnp.dtype = jnp.float32
    # store params in 16-bit with stochastic rounding on update (ref
    # stochastic_rounding_float16, optimizer.proto:229); requires dtype=bf16
    stochastic_rounding: bool = False

    @property
    def dim(self) -> int:
        return sum(s.dim for s in self.segments)

    @property
    def segment_offsets(self) -> Tuple[int, ...]:
        offs, acc = [], 0
        for s in self.segments:
            offs.append(acc)
            acc += s.dim
        return tuple(offs)
