"""AutoInt demo model — multi-head-free self-attention feature interaction
(reference layer parity: monolith/native_training/layers/feature_trans.py:31
AutoInt). Per-feature embeddings are stacked on a field axis [B, F, D];
`layer_num` rounds of softmax(X X^T) X mix the fields; the flattened
output plus a deep MLP feed the logit head."""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.embedding import initializers, optimizers
from monolith_tpu.embedding.spec import AdmissionConfig, TableSegment, TableSpec
from monolith_tpu.feature import FeatureConfig
from monolith_tpu.layers.feature_trans import AutoInt
from monolith_tpu.layers.mlp import MLP
from monolith_tpu.training.task import RecTask


class AutoIntModule(nn.Module):
    feature_names: Sequence[str] = ("user_id", "item_id", "hist_items")
    layer_num: int = 2
    hidden: Sequence[int] = (64,)

    @nn.compact
    def __call__(self, pooled: Dict[str, jnp.ndarray], batch,
                 training: bool = False):
        fields = jnp.stack([pooled[f] for f in self.feature_names], axis=1)
        attn = AutoInt(layer_num=self.layer_num, flatten=True,
                       name="autoint")(fields)  # [B, F*D]
        flat = fields.reshape(fields.shape[0], -1)
        deep = MLP(output_dims=tuple(self.hidden), activate_last=True,
                   name="deep")(flat)
        logits = nn.Dense(1, name="head")(
            jnp.concatenate([attn, deep], axis=1))[:, 0]
        return {"logits": logits}


@dataclasses.dataclass
class AutoIntTask(RecTask):
    name: str = "autoint"
    embedding_dim: int = 8
    layer_num: int = 2
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
        return AutoIntModule(layer_num=self.layer_num)
