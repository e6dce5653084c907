"""Multi-task CTR/CVR model using MMoE — covers the reference's multi-head
usage (native_model.py multi-head metrics + MMoE layer)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from monolith_tpu.embedding import initializers, optimizers
from monolith_tpu.embedding.spec import TableSegment, TableSpec
from monolith_tpu.feature import FeatureConfig
from monolith_tpu.layers.mlp import MLP
from monolith_tpu.layers.multi_task import MMoE
from monolith_tpu.losses import bce_with_logits
from monolith_tpu.training.task import RecTask


class MMoEModule(nn.Module):
    embedding_dim: int = 8
    num_tasks: int = 2
    num_experts: int = 4
    expert_dims: Sequence[int] = (64, 32)
    feature_names: Sequence[str] = ("user_id", "item_id", "hist_items")

    @nn.compact
    def __call__(self, pooled: Dict[str, jnp.ndarray], batch, training: bool = False):
        x = jnp.concatenate([pooled[f] for f in self.feature_names], axis=1)
        task_reprs, aux = MMoE(num_tasks=self.num_tasks,
                               num_experts=self.num_experts,
                               expert_output_dims=tuple(self.expert_dims),
                               name="mmoe")(x)
        logits = [MLP(output_dims=(16, 1), name=f"head_{t}")(r)[:, 0]
                  for t, r in enumerate(task_reprs)]
        return {"logits": logits[0], "task_logits": jnp.stack(logits, axis=1),
                "aux_loss": aux}


@dataclasses.dataclass
class MMoETask(RecTask):
    """labels expected in batch["labels"] with shape [B, num_tasks]."""
    name: str = "mmoe"
    embedding_dim: int = 8
    num_tasks: int = 2
    capacity_per_shard: int = 1 << 16

    def tables(self):
        seg = TableSegment(
            dim=self.embedding_dim,
            optimizer=optimizers.Adagrad(learning_rate=1.0,
                                         initial_accumulator_value=0.01),
            initializer=initializers.RandomUniform(-0.3, 0.3))
        return [TableSpec(name="sparse", capacity_per_shard=self.capacity_per_shard,
                          segments=(seg,))]

    def features(self):
        return [
            FeatureConfig(name="user_id", table="sparse", max_length=1, combiner="sum"),
            FeatureConfig(name="item_id", table="sparse", max_length=1, combiner="sum"),
            FeatureConfig(name="hist_items", table="sparse", max_length=10,
                          combiner="mean"),
        ]

    def build_module(self):
        return MMoEModule(embedding_dim=self.embedding_dim,
                          num_tasks=self.num_tasks)

    def loss(self, outputs, batch):
        labels = batch.get("labels")
        if labels is None:
            labels = batch["label"][:, None]
        per_task = [bce_with_logits(outputs["task_logits"][:, t], labels[:, t])
                    for t in range(outputs["task_logits"].shape[1])]
        loss = sum(per_task) + outputs.get("aux_loss", 0.0)
        return loss, {f"loss_task{t}": l for t, l in enumerate(per_task)}

    def predictions(self, outputs):
        return jax.nn.sigmoid(outputs["logits"])
