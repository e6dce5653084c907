"""Feature-transform layers.

TPU-native rebuild of ref layers/feature_trans.py: AutoInt (:31),
iRazor (:97), SeNet (:232).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.layers.mlp import MLP


class AutoInt(nn.Module):
    """Self-attention feature interaction (ref :31): layer_num rounds of
    softmax(X X^T) X over the field axis. Input/output [B, F, D]."""
    layer_num: int = 1
    flatten: bool = False

    @nn.compact
    def __call__(self, embeds: jnp.ndarray) -> jnp.ndarray:
        x = embeds
        for _ in range(self.layer_num):
            attn = nn.softmax(jnp.einsum("bfd,bgd->bfg", x, x,
                                         preferred_element_type=jnp.float32),
                              axis=-1)
            x = jnp.einsum("bfg,bgd->bfd", attn, x,
                           preferred_element_type=jnp.float32)
        return x.reshape(x.shape[0], -1) if self.flatten else x


class SeNet(nn.Module):
    """Squeeze-and-excitation over fields (ref :232): squeeze = per-field
    mean, excitation = 2-layer MLP -> per-field scale. [B, F, D] -> [B, F*D]."""
    reduction_ratio: int = 4
    flatten: bool = True

    @nn.compact
    def __call__(self, embeds: jnp.ndarray) -> jnp.ndarray:
        b, f, d = embeds.shape
        squeeze = jnp.mean(embeds, axis=2)  # [B, F]
        hidden = max(1, f // self.reduction_ratio)
        scale = MLP(output_dims=(hidden, f), activate_last=True,
                    name="excitation")(squeeze)  # [B, F]
        out = embeds * scale[:, :, None]
        return out.reshape(b, f * d) if self.flatten else out


class iRazor(nn.Module):
    """Soft embedding-dimension NAS (ref :97): each field learns a softmax
    over nested dimension prefixes {0..max}; the soft mask scales embedding
    columns, and an L1-ish regularizer (returned as aux loss) pressures
    toward small dims. Input [B, F, D] -> (out [B, F, D], nas_loss)."""
    nas_space: Sequence[int] = (0, 1, 2, 4, 8)
    temperature: float = 1.0
    penalty_weight: float = 0.0

    @nn.compact
    def __call__(self, embeds: jnp.ndarray):
        b, f, d = embeds.shape
        assert max(self.nas_space) == d, "nas_space max must equal emb dim"
        n_choice = len(self.nas_space)
        logits = self.param("nas_logits", nn.initializers.zeros, (f, n_choice))
        w = nn.softmax(logits / self.temperature, axis=1)  # [F, C]
        # rigid mask: choice c enables first nas_space[c] dims
        cols = jnp.arange(d)[None, :]  # [1, D]
        rigid = (cols < jnp.asarray(self.nas_space)[:, None]).astype(jnp.float32)  # [C, D]
        soft_mask = w @ rigid  # [F, D]
        out = embeds * soft_mask[None, :, :]
        nas_loss = self.penalty_weight * jnp.sum(soft_mask)
        return out, nas_loss
