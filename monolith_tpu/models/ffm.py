"""FFM demo model — parity with the reference demo task
(model.py:52 TestFFMModel): per-feature embeddings, GroupInt/FFM crossing of
user-side vs item-side fields, MLP head on [crossed | concatenated]."""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.embedding import initializers, optimizers
from monolith_tpu.embedding.spec import AdmissionConfig, TableSegment, TableSpec
from monolith_tpu.feature import FeatureConfig
from monolith_tpu.layers.feature_cross import GroupInt
from monolith_tpu.layers.mlp import MLP
from monolith_tpu.training.task import RecTask


class FFMModule(nn.Module):
    embedding_dim: int = 8
    left_features: Sequence[str] = ("user_id",)
    right_features: Sequence[str] = ("item_id", "hist_items")
    hidden: Sequence[int] = (128, 64, 1)
    interaction_type: str = "multiply"

    @nn.compact
    def __call__(self, pooled: Dict[str, jnp.ndarray], batch, training: bool = False):
        left = jnp.concatenate([pooled[f] for f in self.left_features], axis=1)
        right = jnp.concatenate([pooled[f] for f in self.right_features], axis=1)
        crossed = GroupInt(dim_size=self.embedding_dim,
                           interaction_type=self.interaction_type,
                           name="ffm")((left, right))
        deep_in = jnp.concatenate([crossed, left, right], axis=1)
        logits = MLP(output_dims=tuple(self.hidden), name="head")(deep_in)[:, 0]
        return {"logits": logits}


@dataclasses.dataclass
class FFMTask(RecTask):
    name: str = "ffm"
    embedding_dim: int = 8
    capacity_per_shard: int = 1 << 16
    lr: float = 1.0
    admission_threshold: int = 1

    def tables(self):
        seg = TableSegment(
            dim=self.embedding_dim,
            optimizer=optimizers.Adagrad(learning_rate=self.lr,
                                         initial_accumulator_value=0.01),
            initializer=initializers.RandomUniform(-0.3, 0.3))
        admission = (AdmissionConfig(kind="sliding", threshold=self.admission_threshold)
                     if self.admission_threshold > 1 else AdmissionConfig())
        return [TableSpec(name="sparse", capacity_per_shard=self.capacity_per_shard,
                          segments=(seg,), admission=admission)]

    def features(self):
        return [
            FeatureConfig(name="user_id", table="sparse", max_length=1, combiner="sum"),
            FeatureConfig(name="item_id", table="sparse", max_length=1, combiner="sum"),
            FeatureConfig(name="hist_items", table="sparse", max_length=10,
                          combiner="mean"),
        ]

    def build_module(self):
        return FFMModule(embedding_dim=self.embedding_dim)
