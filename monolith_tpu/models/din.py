"""DIN / DIEN sequence CTR tasks.

Parity target: the reference's sequence-recommendation pattern — bounded
history features via the FirstN combiner feeding DIN/DIEN attention layers
(ref layers/feature_seq.py:33 DIN, :154 DIEN; combiners
embedding_combiners.py:73 FirstN). The reference ships these as layers used
by internal models; here a complete runnable task wires them end-to-end:
user/item embeddings + a "firstn" history sequence -> DIN attention pooling
(or DIEN interest evolution) -> MLP tower -> CTR logit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.embedding import initializers, optimizers
from monolith_tpu.embedding.spec import (AdmissionConfig, EvictionConfig,
                                         TableSegment, TableSpec)
from monolith_tpu.feature import FeatureConfig
from monolith_tpu.layers.feature_seq import DIEN, DIN
from monolith_tpu.layers.mlp import MLP
from monolith_tpu.training.task import RecTask


class DINModule(nn.Module):
    """Attention tower: target item attends over the history sequence."""
    embedding_dim: int = 16
    hidden: Sequence[int] = (128, 64)
    seq_encoder: str = "din"   # din | dien
    dien_units: int = 32

    @nn.compact
    def __call__(self, pooled: Dict[str, jnp.ndarray], batch,
                 training: bool = False):
        user = pooled["user_id"]            # [B, D]
        item = pooled["item_id"]            # [B, D]
        hist = pooled["hist_items"]         # [B, T, D] (firstn combiner)
        mask = (jnp.abs(hist).sum(-1) > 0).astype(jnp.float32)  # [B, T]
        if self.seq_encoder == "dien":
            interest = DIEN(self.dien_units, name="dien")(item, hist, mask)
        else:
            interest = DIN(mode="sum", name="din")(item, hist, mask)
        x = jnp.concatenate([user, item, interest, item * user], axis=-1)
        logits = MLP(output_dims=(*self.hidden, 1), name="tower")(x)[:, 0]
        return {"logits": logits}


@dataclasses.dataclass
class DINTask(RecTask):
    """Sequence CTR task: DIN (or DIEN) over a bounded click history."""
    name: str = "din"
    embedding_dim: int = 16
    capacity_per_shard: int = 1 << 17
    lr: float = 1.0
    init_scale: float = 0.3
    accumulator_init: float = 0.01
    admission_threshold: int = 1
    ttl_seconds: int = 0
    history_length: int = 10
    hidden: Sequence[int] = (128, 64)
    seq_encoder: str = "din"

    def tables(self):
        segs = (TableSegment(
            dim=self.embedding_dim,
            optimizer=optimizers.Adagrad(
                learning_rate=self.lr,
                initial_accumulator_value=self.accumulator_init),
            initializer=initializers.RandomUniform(-self.init_scale,
                                                   self.init_scale)),)
        admission = (AdmissionConfig(kind="sliding",
                                     threshold=self.admission_threshold)
                     if self.admission_threshold > 1 else AdmissionConfig())
        return [TableSpec(name="sparse",
                          capacity_per_shard=self.capacity_per_shard,
                          segments=segs, admission=admission,
                          eviction=EvictionConfig(ttl_seconds=self.ttl_seconds))]

    def features(self):
        return [
            FeatureConfig(name="user_id", table="sparse", max_length=1,
                          combiner="sum"),
            FeatureConfig(name="item_id", table="sparse", max_length=1,
                          combiner="sum"),
            FeatureConfig(name="hist_items", table="sparse",
                          max_length=self.history_length, combiner="firstn"),
        ]

    def build_module(self):
        return DINModule(embedding_dim=self.embedding_dim,
                         hidden=tuple(self.hidden),
                         seq_encoder=self.seq_encoder)
