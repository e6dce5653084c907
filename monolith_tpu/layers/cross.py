"""Feature-cross layers: DCN CrossNet and xDeepFM CIN
(ref: layers/dcn.py / layers/cin.py in the reference's dense-layer zoo)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class CrossNet(nn.Module):
    """Deep & Cross network cross layers: x_{l+1} = x0 * (W x_l + b) + x_l."""
    num_layers: int = 3

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        x = x0
        d = x0.shape[-1]
        for i in range(self.num_layers):
            xw = nn.Dense(d, name=f"cross_{i}")(x)
            x = x0 * xw + x
        return x


class CIN(nn.Module):
    """Compressed Interaction Network (xDeepFM): field-wise outer products
    compressed by 1x1 convs; input [B, F, D] -> pooled [B, sum(layer_sizes)]."""
    layer_sizes: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        b, f0, d = x0.shape
        xk = x0
        outs = []
        for i, h in enumerate(self.layer_sizes):
            # pairwise products along fields: [B, Fk*F0, D]
            z = (xk[:, :, None, :] * x0[:, None, :, :]).reshape(b, -1, d)
            # compress with a learned [Fk*F0 -> h] map applied per dim slot
            w = self.param(f"cin_w_{i}", nn.initializers.glorot_uniform(),
                           (z.shape[1], h))
            xk = jnp.einsum("bzd,zh->bhd", z, w,
                            preferred_element_type=jnp.float32)
            outs.append(jnp.sum(xk, axis=-1))  # [B, h]
        return jnp.concatenate(outs, axis=-1)
