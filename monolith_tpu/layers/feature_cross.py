"""Feature-cross layers.

TPU-native rebuild of ref layers/feature_cross.py: GroupInt/FFM (:37),
AllInt (:151), CDot (:242), CAN (:345), DCN vector/matrix/mixed (:445),
CIN (:694). All are flax modules over [B, F, D] stacked or [B, F*D] flat
field embeddings; the heavy products map onto the MXU via einsum/matmul.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.layers.mlp import MLP
from monolith_tpu.ops.interactions import ffm_interaction


class GroupInt(nn.Module):
    """Pairwise interaction of grouped (sum-pooled) field embeddings, with
    optional AFM-style attention over the crossed products (ref :37).

    __call__((left [B, F1*D], right [B, F2*D])) ->
      multiply: [B, F1*F2*D] (attention-weighted if use_attention)
      dot:      [B, F1*F2]
    """
    dim_size: int
    interaction_type: str = "multiply"
    use_attention: bool = False
    attention_units: Sequence[int] = (8, 1)

    @nn.compact
    def __call__(self, inputs):
        left, right = inputs
        out = ffm_interaction(left, right, self.dim_size, self.interaction_type)
        if self.interaction_type == "multiply" and self.use_attention:
            assert self.attention_units[-1] == 1
            b = out.shape[0]
            num_feature = out.shape[1] // self.dim_size
            stacked = out.reshape(b, num_feature, self.dim_size)
            attn = MLP(output_dims=tuple(self.attention_units),
                       name="groupint_attention_mlp")(stacked)  # [B, nf, 1]
            out = (stacked * attn).reshape(b, num_feature * self.dim_size)
        return out


FFM = GroupInt


class AllInt(nn.Module):
    """All-interaction with a learned compression matrix (ref :151):
    O = X @ (X^T C), X: [B, F, D], C: [F, cmp_dim] -> [B, F, cmp_dim]."""
    cmp_dim: int
    use_bias: bool = True
    flatten: bool = True

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        b, f, d = embeddings.shape
        kernel = self.param("allint_kernel", nn.initializers.glorot_normal(),
                            (f, self.cmp_dim))
        comp = jnp.einsum("bfd,fc->bdc", embeddings, kernel,
                          preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("allint_bias", nn.initializers.zeros, (self.cmp_dim,))
            comp = comp + bias
        inter = jnp.einsum("bfd,bdc->bfc", embeddings, comp,
                           preferred_element_type=jnp.float32)
        return inter.reshape(b, f * self.cmp_dim) if self.flatten else inter


class CDot(nn.Module):
    """Data-dependent compression cross (ref :242): project fields with a
    learned [F, P] map, compress through an MLP conditioned on the input,
    cross back, output [B, F*P + D*P] (crossed + compressed mid-features)."""
    project_dim: int
    compress_units: Sequence[int] = (64,)
    activation: str = "relu"

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        b, f, d = inputs.shape
        w = self.param("project_weight", nn.initializers.glorot_normal(),
                       (f, self.project_dim))
        projected = jnp.einsum("bfd,fp->bdp", inputs, w,
                               preferred_element_type=jnp.float32)
        flat = projected.reshape(b, d * self.project_dim)
        compressed = MLP(output_dims=(*self.compress_units, d * self.project_dim),
                         name="compress_tower")(flat)
        crossed = jnp.einsum("bfd,bdp->bfp", inputs,
                             compressed.reshape(b, d, self.project_dim),
                             preferred_element_type=jnp.float32)
        return jnp.concatenate([crossed.reshape(b, f * self.project_dim),
                                compressed], axis=1)


class CAN(nn.Module):
    """Co-Action Network unit (ref :345): the item embedding is reshaped
    into per-example MLP weights applied to the user embedding.

    user: [B, U] (or [B, T, U] if is_seq); item: [B, layer_num*(U*U + U)].
    """
    layer_num: int = 2
    activation: str = "tanh"
    is_seq: bool = False

    @nn.compact
    def __call__(self, inputs):
        from monolith_tpu.layers import activations as acts
        user, item = inputs
        u = user.shape[-1]
        assert item.shape[-1] == self.layer_num * (u * u + u), \
            f"item dim {item.shape[-1]} != layer_num*(U^2+U) = {self.layer_num * (u * u + u)}"
        act = acts.get(self.activation)
        x = user if self.is_seq else user[:, None, :]  # [B, T, U]
        off = 0
        for _ in range(self.layer_num):
            w = item[:, off:off + u * u].reshape(-1, u, u)
            off += u * u
            bias = item[:, off:off + u].reshape(-1, 1, u)
            off += u
            x = act(jnp.einsum("btu,buv->btv", x, w,
                               preferred_element_type=jnp.float32) + bias)
        return jnp.sum(x, axis=1) if self.is_seq else x[:, 0, :]


class DCN(nn.Module):
    """Deep & Cross v1/v2/mixed (ref :445, dcn_type vector|matrix|mixed):
      vector: x' = x0 * (x.w) + b + x          (w: [D,1])
      matrix: x' = x0 * (W x + b) + x          (W: [D,D])
      mixed:  low-rank experts with softmax gates (DCN-V2 mixed)."""
    layer_num: int = 1
    dcn_type: str = "matrix"
    num_experts: int = 1
    low_rank: int = 0
    use_dropout: bool = False
    keep_prob: float = 0.95

    @nn.compact
    def __call__(self, x0: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        d = x0.shape[-1]
        x = x0
        for i in range(self.layer_num):
            if self.dcn_type == "vector":
                w = self.param(f"kernel_{i}", nn.initializers.glorot_normal(), (d, 1))
                b = self.param(f"bias_{i}", nn.initializers.zeros, (d,))
                x = x0 * (x @ w) + b + x
            elif self.dcn_type == "matrix":
                w = self.param(f"kernel_{i}", nn.initializers.glorot_normal(), (d, d))
                b = self.param(f"bias_{i}", nn.initializers.zeros, (d,))
                x = x0 * (x @ w + b) + x
            elif self.dcn_type == "mixed":
                assert self.low_rank > 0
                outs = []
                for j in range(self.num_experts):
                    u = self.param(f"U_{i}_{j}", nn.initializers.glorot_normal(),
                                   (d, self.low_rank))
                    v = self.param(f"V_{i}_{j}", nn.initializers.glorot_normal(),
                                   (d, self.low_rank))
                    outs.append(x0 * ((x @ v) @ u.T))
                gate_w = self.param(f"gate_{i}", nn.initializers.glorot_normal(),
                                    (d, self.num_experts))
                gates = nn.softmax(x @ gate_w, axis=-1)  # [B, E]
                stacked = jnp.stack(outs, axis=-1)       # [B, D, E]
                x = jnp.einsum("bde,be->bd", stacked, gates) + x
            else:
                raise ValueError(f"unknown dcn_type {self.dcn_type}")
            if self.use_dropout and training:
                x = nn.Dropout(rate=1 - self.keep_prob, deterministic=False)(x)
        return x
