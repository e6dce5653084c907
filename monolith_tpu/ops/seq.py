"""Sequence mask op (ref: gen_seq_mask.py + runtime/ops/gen_seq_mask.cc)."""

from __future__ import annotations

import jax.numpy as jnp


def gen_seq_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """lengths [B] -> bool mask [B, max_length]."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]
