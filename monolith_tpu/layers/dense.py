"""Dense layer with optional kernel (weight) normalization
(ref layers/dense.py Dense with allow_kernel_norm) and AddBias
(ref layers/add_bias.py)."""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    allow_kernel_norm: bool = False
    kernel_norm_trainable: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (x.shape[-1], self.features))
        if self.allow_kernel_norm:
            # weight normalization: direction from kernel, magnitude learned
            norm = jnp.sqrt(jnp.sum(jnp.square(kernel), axis=0, keepdims=True) + 1e-12)
            direction = kernel / norm
            if self.kernel_norm_trainable:
                g = self.param("kernel_norm", nn.initializers.ones, (self.features,))
                kernel = direction * g
            else:
                kernel = direction
        y = x @ kernel
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        if self.activation is not None:
            y = self.activation(y)
        return y


class AddBias(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x + self.param("bias", nn.initializers.zeros, (x.shape[-1],))
