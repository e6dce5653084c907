"""Dense tower MLP (ref: layers/mlp.py MLP). flax.linen module; runs
data-parallel replicated under pjit — the MXU does the work here, so the
layer is a plain chain of Dense+activation (+ optional LayerNorm/BatchNorm
handled by dedicated layers)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """`compute_dtype=jnp.bfloat16` runs the matmuls in bf16 on the MXU
    (params stay f32, activations cast per layer, output upcast to f32) —
    ~2x matmul throughput and half the activation HBM traffic; standard
    for CTR towers where the logit is robust to bf16."""
    output_dims: Sequence[int]
    activation: Callable = nn.relu
    activate_last: bool = False
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.glorot_uniform()
    use_layer_norm: bool = False
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, dim in enumerate(self.output_dims):
            x = nn.Dense(dim, use_bias=self.use_bias,
                         kernel_init=self.kernel_init,
                         dtype=self.compute_dtype, name=f"dense_{i}")(x)
            is_last = i == len(self.output_dims) - 1
            if self.use_layer_norm and not is_last:
                x = nn.LayerNorm(name=f"ln_{i}", dtype=self.compute_dtype)(x)
            if not is_last or self.activate_last:
                x = self.activation(x)
        return x.astype(jnp.float32)
