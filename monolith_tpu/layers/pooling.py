"""Pooling layers over [B, T, D] sequences with optional masks
(ref layers/pooling.py SumPooling/AvgPooling/MaxPooling)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def sum_pooling(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is not None:
        x = x * mask[..., None]
    return jnp.sum(x, axis=1)


def avg_pooling(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=1)
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return jnp.sum(x * mask[..., None], axis=1) / denom


def max_pooling(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is not None:
        x = jnp.where(mask[..., None] > 0, x, -jnp.inf)
    out = jnp.max(x, axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)


class SumPooling:
    def __call__(self, x, mask=None):
        return sum_pooling(x, mask)


class AvgPooling:
    def __call__(self, x, mask=None):
        return avg_pooling(x, mask)


class MaxPooling:
    def __call__(self, x, mask=None):
        return max_pooling(x, mask)
