"""DeepFM CTR model — the flagship demo task.

Parity target: the reference demo models (model.py:52 TestFFMModel,
markdown/demo/demo_model.py MovieLens DeepFM): sparse embeddings per feature,
first-order (linear) terms from a 1-dim table segment, FM second-order
interaction, and a deep MLP tower; logits = linear + fm + deep.
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
from monolith_tpu.layers.mlp import MLP
from monolith_tpu.ops.interactions import fm_interaction
from monolith_tpu.training.task import RecTask


class DeepFMModule(nn.Module):
    """Dense tower. Pooled embeddings carry [bias(1) | vector(dim)] segments."""
    embedding_dim: int = 16
    hidden: Sequence[int] = (256, 128, 64)
    feature_names: Sequence[str] = ("user_id", "item_id", "hist_items")
    dense_dtype: jnp.dtype = None  # bf16 runs the tower matmuls on the MXU

    @nn.compact
    def __call__(self, pooled: Dict[str, jnp.ndarray], batch, training: bool = False):
        d = self.embedding_dim
        bias_terms = []
        vecs = []
        for name in self.feature_names:
            e = pooled[name]
            bias_terms.append(e[:, 0])        # 1-dim linear segment
            vecs.append(e[:, 1:1 + d])        # FM/deep vector segment
        stack = jnp.stack(vecs, axis=1)       # [B, F, D]
        linear = sum(bias_terms)
        fm = jnp.sum(fm_interaction(stack), axis=-1)
        deep_in = stack.reshape(stack.shape[0], -1)
        deep = MLP(output_dims=(*self.hidden, 1),
                   compute_dtype=self.dense_dtype, name="deep")(deep_in)[:, 0]
        logits = linear + fm + deep
        return {"logits": logits}


@dataclasses.dataclass
class DeepFMTask(RecTask):
    """DeepFM over the synthetic CTR stream (or any source with the same
    features). Each table row = [bias segment (1, SGD) | vector segment
    (dim, Adagrad)] — mirroring the reference demo's multi-slice slots."""
    name: str = "deepfm"
    embedding_dim: int = 16
    capacity_per_shard: int = 1 << 17
    # per-ID learning rates are sized for mean-reduced BCE, where a single
    # occurrence contributes grad ~ (pred-label)/batch_size
    vector_lr: float = 1.0
    bias_lr: float = 1.0
    init_scale: float = 0.3
    accumulator_init: float = 0.01
    admission_threshold: int = 1
    ttl_seconds: int = 0
    hidden: Sequence[int] = (256, 128, 64)
    # bf16 halves HBM bytes/row (2x ids per chip); pair with
    # stochastic_rounding so sub-ulp updates accumulate (PERF.md)
    table_dtype: jnp.dtype = jnp.float32
    stochastic_rounding: bool = False
    dense_dtype: jnp.dtype = None  # bf16: tower matmuls on the MXU

    def tables(self):
        segs = (
            TableSegment(dim=1,
                         optimizer=optimizers.SGD(learning_rate=self.bias_lr),
                         initializer=initializers.Zeros()),
            TableSegment(dim=self.embedding_dim,
                         optimizer=optimizers.Adagrad(
                             learning_rate=self.vector_lr,
                             initial_accumulator_value=self.accumulator_init),
                         initializer=initializers.RandomUniform(
                             -self.init_scale, self.init_scale)),
        )
        admission = (AdmissionConfig(kind="sliding", threshold=self.admission_threshold)
                     if self.admission_threshold > 1 else AdmissionConfig())
        return [TableSpec(name="sparse", capacity_per_shard=self.capacity_per_shard,
                          segments=segs, admission=admission,
                          eviction=EvictionConfig(ttl_seconds=self.ttl_seconds),
                          dtype=self.table_dtype,
                          stochastic_rounding=self.stochastic_rounding)]

    def features(self):
        return [
            FeatureConfig(name="user_id", table="sparse", max_length=1, combiner="sum"),
            FeatureConfig(name="item_id", table="sparse", max_length=1, combiner="sum"),
            FeatureConfig(name="hist_items", table="sparse", max_length=10, combiner="mean"),
        ]

    def build_module(self):
        return DeepFMModule(embedding_dim=self.embedding_dim,
                            hidden=tuple(self.hidden),
                            dense_dtype=self.dense_dtype)
