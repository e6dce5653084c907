"""Ranking / CTR losses.

TPU-native rebuild of ref losses/ (inbatch_auc_loss.py + the C++ op
runtime/ops/inbatch_auc_loss.cc, batch softmax loss). Pairwise losses are
expressed as dense [B, B] comparisons — tiny batches of logits, so an O(B^2)
VPU-friendly formulation beats the reference's gather-based pair loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                    sample_weight=None) -> jnp.ndarray:
    """Numerically-stable sigmoid cross-entropy, mean-reduced."""
    loss = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if sample_weight is not None:
        loss = loss * sample_weight
        return jnp.sum(loss) / jnp.maximum(jnp.sum(sample_weight), 1e-12)
    return jnp.mean(loss)


def inbatch_auc_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                     negative_weight: float = 1.0) -> jnp.ndarray:
    """Pairwise AUC surrogate over in-batch (pos, neg) pairs
    (ref: runtime/ops/inbatch_auc_loss.cc, losses/inbatch_auc_loss.py):
    -mean over pairs of log sigmoid(logit_pos - logit_neg)."""
    labels = labels.astype(jnp.float32)
    pos = labels[:, None]          # [B, 1]
    neg = (1.0 - labels)[None, :]  # [1, B]
    pair_w = pos * neg             # 1 where (i pos, j neg)
    diff = logits[:, None] - logits[None, :]
    pair_loss = jnp.log1p(jnp.exp(-diff))  # -log sigmoid(diff), stable enough for logits
    total_w = jnp.maximum(jnp.sum(pair_w), 1.0)
    return negative_weight * jnp.sum(pair_loss * pair_w) / total_w


def batch_softmax_loss(user_emb: jnp.ndarray, item_emb: jnp.ndarray,
                       item_log_q: jnp.ndarray = None,
                       temperature: float = 1.0) -> jnp.ndarray:
    """Sampled in-batch softmax for retrieval towers with optional logQ
    correction (the reference pairs this with the BatchSoftmax per-ID
    optimizer that estimates item frequency)."""
    logits = user_emb @ item_emb.T / temperature  # [B, B]
    if item_log_q is not None:
        logits = logits - item_log_q[None, :]
    logits = logits - jax.nn.logsumexp(logits, axis=1, keepdims=True)
    return -jnp.mean(jnp.diagonal(logits))
