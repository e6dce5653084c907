"""GRU / attention-gated GRU cells and scans.

TPU-native rebuild of ref layers/agru.py (AGRUCell :51,
dynamic_rnn_with_attention): recurrences run as lax.scan over the time axis
(static length + mask), which XLA pipelines on-chip.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRUCell(nn.Module):
    units: int

    @nn.compact
    def __call__(self, h, x):
        wz = nn.Dense(self.units, name="z")(jnp.concatenate([x, h], -1))
        wr = nn.Dense(self.units, name="r")(jnp.concatenate([x, h], -1))
        z = nn.sigmoid(wz)
        r = nn.sigmoid(wr)
        hh = nn.tanh(nn.Dense(self.units, name="h")(jnp.concatenate([x, r * h], -1)))
        return (1 - z) * h + z * hh


class AGRUCell(nn.Module):
    """Attention-gated GRU (AUGRU, ref agru.py:51): the update gate is scaled
    by the per-step attention score."""
    units: int

    @nn.compact
    def __call__(self, h, x, att_score):
        wz = nn.Dense(self.units, name="z")(jnp.concatenate([x, h], -1))
        wr = nn.Dense(self.units, name="r")(jnp.concatenate([x, h], -1))
        z = nn.sigmoid(wz) * att_score[..., None]
        r = nn.sigmoid(wr)
        hh = nn.tanh(nn.Dense(self.units, name="h")(jnp.concatenate([x, r * h], -1)))
        return (1 - z) * h + z * hh


class GRU(nn.Module):
    """Run GRUCell over [B, T, D] -> outputs [B, T, units], final [B, units]."""
    units: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray, mask: jnp.ndarray = None):
        class _Wrap(nn.Module):
            units: int

            @nn.compact
            def __call__(self, h, x):
                new_h = GRUCell(self.units, name="cell")(h, x)
                return new_h, new_h

        scan = nn.scan(_Wrap, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1,
                       length=xs.shape[1])
        h0 = jnp.zeros((xs.shape[0], self.units), xs.dtype)
        final, outs = scan(self.units, name="gru")(h0, xs)
        if mask is not None:
            outs = outs * mask[..., None]
        return outs, final


class AUGRU(nn.Module):
    """AGRUCell over [B, T, D] with attention scores [B, T] -> final [B, units]."""
    units: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray, att_scores: jnp.ndarray):
        class _Wrap(nn.Module):
            units: int

            @nn.compact
            def __call__(self, h, xa):
                x, a = xa
                new_h = AGRUCell(self.units, name="cell")(h, x, a)
                return new_h, new_h

        scan = nn.scan(_Wrap, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1,
                       length=xs.shape[1])
        h0 = jnp.zeros((xs.shape[0], self.units), xs.dtype)
        final, _ = scan(self.units, name="augru")(h0, (xs, att_scores))
        return final
