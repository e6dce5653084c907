"""Sequence-feature layers.

TPU-native rebuild of ref layers/feature_seq.py: DIN (:33), DIEN (:154),
DMR_U2I (:267). Sequences are the bounded "firstn" combiner outputs
[B, T, D]; masks come from gen_seq_mask.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from monolith_tpu.layers.agru import AUGRU, GRU
from monolith_tpu.layers.mlp import MLP


class DIN(nn.Module):
    """Deep Interest Network attention (ref :33): attention weight per history
    item from MLP([q, k, q-k, q*k]); mode "sum" pools to [B, H], else scales
    keys [B, T, H]."""
    hidden_units: Optional[Sequence[int]] = None
    mode: str = "sum"
    decay: bool = False

    @nn.compact
    def __call__(self, queries: jnp.ndarray, keys: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, t, h = keys.shape
        units = tuple(self.hidden_units) if self.hidden_units else (t, 1)
        assert units[-1] == 1
        q = jnp.broadcast_to(queries[:, None, :], (b, t, h))
        din_all = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)
        w = MLP(output_dims=units, name="dense_tower")(din_all)  # [B, T, 1]
        if self.decay:
            w = w / (h ** 0.5)
        if mask is not None:
            w = jnp.where(mask[..., None] > 0, w, 0.0)
        if self.mode == "sum":
            return jnp.einsum("btl,bth->bh", w, keys,
                              preferred_element_type=jnp.float32)
        return keys * w


class DIEN(nn.Module):
    """Deep Interest Evolution Network (ref :154): GRU over history, dot/MLP
    attention against the query, AUGRU evolution; returns final state [B, U]."""
    num_units: int
    att_type: str = "dot"  # dot | mlp

    @nn.compact
    def __call__(self, queries: jnp.ndarray, keys: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        outs, _ = GRU(self.num_units, name="interest_gru")(keys, mask)
        if self.att_type == "dot":
            q = nn.Dense(self.num_units, name="query_proj")(queries)
            logits = jnp.einsum("bu,btu->bt", q, outs,
                                preferred_element_type=jnp.float32)
        else:
            b, t, u = outs.shape
            q = jnp.broadcast_to(
                nn.Dense(self.num_units, name="query_proj")(queries)[:, None, :],
                (b, t, u))
            feat = jnp.concatenate([q, outs, q - outs, q * outs], axis=-1)
            logits = MLP(output_dims=(u, 1), name="att_mlp")(feat)[..., 0]
        if mask is not None:
            logits = jnp.where(mask > 0, logits, -1e9)
        scores = nn.softmax(logits, axis=1)  # [B, T]
        return AUGRU(self.num_units, name="evolution")(outs, scores)


class DMR_U2I(nn.Module):
    """Deep Match to Rank user-to-item relevance (ref :267): positional
    attention pools the user sequence, a linear maps it to item space, output
    is the elementwise product with the item embedding [B, I]."""
    cmp_dim: int

    @nn.compact
    def __call__(self, items: jnp.ndarray, user_seq: jnp.ndarray) -> jnp.ndarray:
        b, t, u = user_seq.shape
        emb_w = self.param("emb_weight", nn.initializers.glorot_normal(),
                           (u, self.cmp_dim))
        pos = self.param("pos_emb", nn.initializers.normal(0.02), (t, self.cmp_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.cmp_dim,))
        comped = user_seq @ emb_w + pos[None] + bias  # [B, T, C]
        zw = self.param("z_weight", nn.initializers.glorot_normal(), (self.cmp_dim, 1))
        alpha = nn.softmax(comped @ zw, axis=1)  # [B, T, 1]
        merged = jnp.einsum("btu,btl->bu", user_seq, alpha,
                            preferred_element_type=jnp.float32)
        merged = nn.Dense(items.shape[-1], name="linear")(merged)
        return merged * items
