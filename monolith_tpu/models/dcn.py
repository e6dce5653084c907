"""DCN demo model — Deep & Cross Network over per-feature embeddings
(reference layer parity: monolith/native_training/layers/dcn.py Dcn /
GroupInt-style crossing used by the reference model zoo). Cross tower
(explicit bounded-degree feature crosses) and deep tower (MLP) run in
parallel off the same concatenated embedding vector; head is a linear
logit on [cross | deep]."""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.embedding import initializers, optimizers
from monolith_tpu.embedding.spec import AdmissionConfig, TableSegment, TableSpec
from monolith_tpu.feature import FeatureConfig
from monolith_tpu.layers.cross import CrossNet
from monolith_tpu.layers.mlp import MLP
from monolith_tpu.training.task import RecTask


class DCNModule(nn.Module):
    feature_names: Sequence[str] = ("user_id", "item_id", "hist_items")
    cross_layers: int = 3
    hidden: Sequence[int] = (128, 64)

    @nn.compact
    def __call__(self, pooled: Dict[str, jnp.ndarray], batch,
                 training: bool = False):
        x0 = jnp.concatenate([pooled[f] for f in self.feature_names], axis=1)
        cross = CrossNet(num_layers=self.cross_layers, name="cross")(x0)
        deep = MLP(output_dims=tuple(self.hidden), activate_last=True,
                   name="deep")(x0)
        logits = nn.Dense(1, name="head")(
            jnp.concatenate([cross, deep], axis=1))[:, 0]
        return {"logits": logits}


@dataclasses.dataclass
class DCNTask(RecTask):
    name: str = "dcn"
    embedding_dim: int = 8
    cross_layers: int = 3
    capacity_per_shard: int = 1 << 16
    lr: float = 1.0
    admission_threshold: int = 1

    def tables(self):
        seg = TableSegment(
            dim=self.embedding_dim,
            optimizer=optimizers.Adagrad(learning_rate=self.lr,
                                         initial_accumulator_value=0.01),
            initializer=initializers.RandomUniform(-0.3, 0.3))
        admission = (AdmissionConfig(kind="sliding",
                                     threshold=self.admission_threshold)
                     if self.admission_threshold > 1 else AdmissionConfig())
        return [TableSpec(name="sparse",
                          capacity_per_shard=self.capacity_per_shard,
                          segments=(seg,), admission=admission)]

    def features(self):
        return [
            FeatureConfig(name="user_id", table="sparse", max_length=1,
                          combiner="sum"),
            FeatureConfig(name="item_id", table="sparse", max_length=1,
                          combiner="sum"),
            FeatureConfig(name="hist_items", table="sparse", max_length=10,
                          combiner="mean"),
        ]

    def build_module(self):
        return DCNModule(cross_layers=self.cross_layers)
