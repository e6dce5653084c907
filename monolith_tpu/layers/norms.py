"""Normalization layers + GradNorm multi-task loss balancing.

TPU-native rebuild of ref layers/norms.py (BatchNorm :27, LayerNorm :194,
GradNorm :247). BatchNorm/LayerNorm wrap flax's; GradNorm is expressed
JAX-style: the caller supplies per-task losses and per-task gradient norms
w.r.t. the shared representation (one jax.grad per task on the shared
activation), and GradNorm returns (weighted_loss, gnorm_aux_loss).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BatchNorm = nn.BatchNorm
LayerNorm = nn.LayerNorm


class GradNorm(nn.Module):
    """ref :247: task weights w = softmax(learned); wgnorms = w * gnorms;
    gnorm_loss = scale * sum(((wgnorms - avg)/ (avg+eps))^pow) [relative] or
    scale * sum((wgnorms - avg)^pow); weighted_loss = sum(w * losses)."""
    num_tasks: int
    scale: float = 1.0
    loss_pow: float = 2.0
    relative_diff: bool = False
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, losses: jnp.ndarray, gnorms: jnp.ndarray):
        w_raw = self.param("grad_norm_weights", nn.initializers.zeros,
                           (self.num_tasks,))
        w = nn.softmax(w_raw)
        wgnorms = w * gnorms
        avg = jnp.mean(wgnorms)
        if self.relative_diff:
            diff = (wgnorms - avg) / (avg + self.epsilon)
        else:
            diff = wgnorms - avg
        gnorm_loss = self.scale * jnp.sum(jnp.abs(diff) ** self.loss_pow)
        weighted_loss = jnp.sum(w * losses)
        return weighted_loss, gnorm_loss


def grad_norms_wrt(shared: jnp.ndarray, task_losses_fn, *args):
    """Helper: per-task gradient norms w.r.t. a shared activation.

    task_losses_fn(shared, *args) -> [num_tasks] losses. Returns
    (losses [T], gnorms [T])."""
    losses = task_losses_fn(shared, *args)

    def one(i):
        g = jax.grad(lambda s: task_losses_fn(s, *args)[i])(shared)
        return jnp.sqrt(jnp.sum(g * g))

    gnorms = jnp.stack([one(i) for i in range(losses.shape[0])])
    return losses, gnorms
