"""Feature API: feature -> table mapping and embedding combiners.

TPU-native rebuild of ref feature.py (FeatureSlot :102 / FeatureColumn :176)
and embedding_combiners.py (ReduceSum :41, ReduceMean :57, FirstN :73).
The reference collects per-slot slice configs by dry-running the model with a
DummyFeatureFactory; here features are declared ahead of time as frozen
dataclasses, giving the step function a static structure to trace.

A `FeatureConfig` names one sparse feature, the merged `TableSpec` it reads,
and how its (variable number of) ids per example are pooled:
  - "sum" / "mean": pooled [B, dim]
  - "firstn": unpooled sequence [B, max_length, dim] for DIN/DIEN-style layers
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    name: str
    table: str                 # TableSpec.name
    max_length: int            # ids per example (static pad length)
    combiner: str = "sum"      # sum | mean | firstn
    slice_dims: Optional[Tuple[int, ...]] = None  # optional per-slice split view

    def output_dim(self, table_dim: int) -> int:
        return table_dim


def combine(emb: jnp.ndarray, valid: jnp.ndarray, combiner: str) -> jnp.ndarray:
    """Pool per-example id embeddings.

    emb: [B, L, D] (invalid slots already zero), valid: [B, L] bool.
    """
    if combiner == "sum":
        return jnp.sum(emb, axis=1)
    if combiner == "mean":
        denom = jnp.maximum(jnp.sum(valid.astype(emb.dtype), axis=1, keepdims=True), 1.0)
        return jnp.sum(emb, axis=1) / denom
    if combiner == "firstn":
        return emb  # [B, L, D]; mask available to the model via batch
    raise ValueError(f"unknown combiner: {combiner}")
