"""LHUC tower (ref layers/lhuc.py:37 LHUCTower): each dense layer's output is
elementwise-scaled by a per-layer gate tower driven by personalization
features (Learning Hidden Unit Contributions)."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.layers.mlp import MLP


class LHUCTower(nn.Module):
    output_dims: Sequence[int]
    lhuc_hidden: Sequence[int] = (32,)
    activation: str = "relu"

    @nn.compact
    def __call__(self, dense_input: jnp.ndarray,
                 lhuc_input: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        from monolith_tpu.layers import activations as acts
        if lhuc_input is None:
            lhuc_input = dense_input
        act = acts.get(self.activation)
        x = dense_input
        for i, dim in enumerate(self.output_dims):
            x = nn.Dense(dim, name=f"dense_{i}")(x)
            is_last = i == len(self.output_dims) - 1
            if not is_last:
                x = act(x)
            # LHUC gate in [0, 2] (2*sigmoid), one per hidden unit
            gate = MLP(output_dims=(*self.lhuc_hidden, dim),
                       name=f"lhuc_{i}")(lhuc_input)
            x = x * 2.0 * nn.sigmoid(gate)
        return x
