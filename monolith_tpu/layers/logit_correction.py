"""Logit correction for negative-sampled training
(ref layers/logit_correction.py:29): corrected = log_sigmoid(logit) [if
sample_bias] - log(sample_rate) [if given], matching
LogitCorrection.get_sample_logits."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


def logit_correction(logits: jnp.ndarray,
                     sample_rate: Optional[jnp.ndarray] = None,
                     sample_bias: bool = False) -> jnp.ndarray:
    out = logits
    if sample_bias:
        out = nn.log_sigmoid(logits)
    if sample_rate is not None:
        out = out - jnp.log(jnp.maximum(sample_rate, 1e-20))
    return out


class LogitCorrection(nn.Module):
    sample_bias: bool = False

    def __call__(self, logits, sample_rate=None):
        return logit_correction(logits, sample_rate, self.sample_bias)
