"""User-facing task API.

TPU-native rebuild of the reference user API (NativeTask native_task.py:92,
MonolithModel native_model.py:851): a task declares its embedding tables,
sparse features, the dense flax module, the loss, and the dense optimizer.
Unlike the reference (which dry-runs the model graph to collect slot configs,
cpu_training.py:955), everything here is declared statically so the train
step traces once.
"""

from __future__ import annotations

import abc
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from monolith_tpu.embedding.spec import TableSpec
from monolith_tpu.feature import FeatureConfig


class RecTask(abc.ABC):
    """A recommendation training task."""

    name: str = "task"

    @abc.abstractmethod
    def tables(self) -> Sequence[TableSpec]:
        ...

    @abc.abstractmethod
    def features(self) -> Sequence[FeatureConfig]:
        ...

    @abc.abstractmethod
    def build_module(self) -> nn.Module:
        """flax module: __call__(pooled: dict[str, array], batch: dict,
        training: bool) -> dict with at least {"logits": [B]}."""
        ...

    def loss(self, outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Default: sigmoid cross-entropy against batch["label"]."""
        from monolith_tpu.losses import bce_with_logits
        loss = bce_with_logits(outputs["logits"], batch["label"])
        return loss, {}

    def dense_optimizer(self) -> optax.GradientTransformation:
        """Dense-tower optimizer (ref: feature_utils.apply_gradients_with_
        var_optimizer feature_utils.py:120 — defaults to Adagrad there)."""
        return optax.adagrad(learning_rate=0.01)

    def predictions(self, outputs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return jax.nn.sigmoid(outputs["logits"])
