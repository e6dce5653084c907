"""Activation registry + advanced activations.

TPU-native rebuild of ref layers/advanced_activations.py (a get/serialize
registry over activations). Includes PReLU and Dice (the DIN paper's
data-adaptive activation) as flax modules.
"""

from __future__ import annotations

from typing import Callable, Union

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k, s: jnp.full(s, self.init_alpha),
                           (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


class Dice(nn.Module):
    """Data-adaptive activation from the DIN paper: p(x)*x + (1-p(x))*alpha*x
    with p(x) = sigmoid(batchnormed x)."""
    epsilon: float = 1e-9

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        mean = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
        x_norm = (x - mean) / jnp.sqrt(var + self.epsilon)
        p = nn.sigmoid(x_norm)
        return p * x + (1 - p) * alpha * x


_REGISTRY = {
    "relu": nn.relu,
    "relu6": nn.relu6,
    "leaky_relu": nn.leaky_relu,
    "elu": nn.elu,
    "selu": nn.selu,
    "gelu": nn.gelu,
    "sigmoid": nn.sigmoid,
    "tanh": nn.tanh,
    "softmax": nn.softmax,
    "softplus": nn.softplus,
    "swish": nn.swish,
    "silu": nn.silu,
    "linear": lambda x: x,
    "none": lambda x: x,
}


def get(identifier: Union[str, Callable, None]) -> Callable:
    """Resolve an activation by name (ref advanced_activations.py:102)."""
    if identifier is None:
        return lambda x: x
    if callable(identifier):
        return identifier
    name = identifier.lower()
    if name in _REGISTRY:
        return _REGISTRY[name]
    if name == "prelu":
        return PReLU()
    if name == "dice":
        return Dice()
    raise ValueError(f"unknown activation: {identifier}")
