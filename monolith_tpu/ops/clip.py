"""Global-norm gradient clipping over pytrees.

TPU-native rebuild of ref clip_ops.py + the fused CUDA kernels
(runtime/ops/clip_by_global_norm*.cu.cc): on TPU the norm reduction and the
scale apply fuse in XLA, so this is a pure-jnp tree op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return jnp.float32(0)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def clip_by_global_norm(tree, clip_norm: float, use_norm=None):
    """Scale the whole tree so its global norm is <= clip_norm.

    Returns (clipped_tree, norm). Matches tf.clip_by_global_norm semantics
    (ref clip_ops.py wraps the same contract)."""
    norm = global_norm(tree) if use_norm is None else use_norm
    scale = jnp.minimum(1.0, clip_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda x: (x * scale).astype(x.dtype), tree), norm
