"""MovieRanking — the reference demo model, tpu-native.

Re-expression of the reference's MovieLens demo (ref
markdown/demo/demo_model.py:40-77 MovieRankingModelBase): one embedding
table per sparse feature (create_embedding_feature_column per name), a
32-dim 'vec' slice each (lookup_embedding_slice), concatenated and fed
to Dense(256, relu) -> Dense(64, relu) -> Dense(1), dense tower trained
with Adagrad(0.05) (demo_model.py:64). Embedding slices use the
reference feature.py:86-88 defaults: RandomUniform init + Adagrad with
initial_accumulator_value=1.0.

Heads:
  'ctr'    sigmoid + BCE (the reference EstimatorSpec classification
           path) — used for the AUC parity head-to-head against the
           plain-TF twin (monolith_tpu/parity.py) on binary-label
           streams like the frozen north-star dataset.
  'rating' the demo's own regression head: raw logit prediction + MSE
           (demo_model.py:62, classification=False).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.embedding import initializers, optimizers
from monolith_tpu.embedding.spec import TableSegment, TableSpec
from monolith_tpu.feature import FeatureConfig
from monolith_tpu.layers.mlp import MLP
from monolith_tpu.training.task import RecTask


class MovieRankingModule(nn.Module):
    """concat(embeddings) -> MLP tower (ref demo_model.py:52-60)."""
    hidden: Sequence[int] = (256, 64)
    feature_names: Sequence[str] = ("user_id", "item_id")

    @nn.compact
    def __call__(self, pooled: Dict[str, jnp.ndarray], batch,
                 training: bool = False):
        x = jnp.concatenate([pooled[n] for n in self.feature_names], axis=1)
        logits = MLP(output_dims=(*self.hidden, 1), name="ratings")(x)[:, 0]
        return {"logits": logits}


@dataclasses.dataclass
class MovieRankingTask(RecTask):
    name: str = "movie_ranking"
    embedding_dim: int = 32
    capacity_per_shard: int = 1 << 17
    hidden: Sequence[int] = (256, 64)
    head: str = "ctr"  # 'ctr' (BCE/AUC) | 'rating' (the demo's MSE head)
    embedding_lr: float = 0.05
    dense_lr: float = 0.05
    init_scale: float = 0.05
    # (uid, mov) roles; defaults match the synthetic CTR stream's keys
    feature_names: Sequence[str] = ("user_id", "item_id")

    def tables(self):
        # one table per sparse feature, like the reference demo's
        # create_embedding_feature_column("mov") / ("uid")
        return [
            TableSpec(
                name=f"emb_{f}",
                capacity_per_shard=self.capacity_per_shard,
                segments=(TableSegment(
                    dim=self.embedding_dim,
                    optimizer=optimizers.Adagrad(
                        learning_rate=self.embedding_lr,
                        initial_accumulator_value=1.0),
                    initializer=initializers.RandomUniform(
                        -self.init_scale, self.init_scale)),))
            for f in self.feature_names]

    def features(self):
        return [FeatureConfig(name=f, table=f"emb_{f}", max_length=1,
                              combiner="sum")
                for f in self.feature_names]

    def build_module(self):
        return MovieRankingModule(hidden=tuple(self.hidden),
                                  feature_names=tuple(self.feature_names))

    def dense_optimizer(self):
        import optax
        return optax.adagrad(learning_rate=self.dense_lr)

    def loss(self, outputs, batch) -> Tuple[jnp.ndarray, Dict]:
        if self.head == "rating":
            err = outputs["logits"] - batch["label"]
            return jnp.mean(err * err), {}
        return super().loss(outputs, batch)

    def predictions(self, outputs):
        if self.head == "rating":
            return outputs["logits"]
        return super().predictions(outputs)
