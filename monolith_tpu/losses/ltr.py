"""Learning-to-rank losses.

TPU-native rebuild of the reference's LTR loss family
(ref: losses/ltr_losses.py — RankingLossKey :253, make_loss_fn :266,
pairwise template :781, softmax :967, sigmoid CE :1025, MSE :1067,
ListMLE :1107, ApproxNDCG :1177). Inputs follow the reference convention:

  labels  [B, L]  graded relevance; entries < 0 are INVALID (padding)
  logits  [B, L]  ranking scores
  weights None | scalar | [B, 1] listwise | [B, L] itemwise

The reference masks invalid entries with `boolean_mask` (dynamic shapes);
here everything is static-shape masking — invalid items contribute zero
weight, and "SUM_BY_NONZERO_WEIGHTS" reduction divides by the nonzero-weight
count — the XLA-friendly equivalent.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

_EPSILON = 1e-10


def _valid(labels):
    return labels >= 0.0  # ref label_valid_fn (ltr_losses.py:51)


def _item_weights(labels, weights):
    if weights is None:
        return jnp.ones_like(labels)
    w = jnp.asarray(weights, jnp.float32)
    return jnp.broadcast_to(w, labels.shape)


def _reduce_by_nonzero(losses, weights):
    """tf.losses Reduction.SUM_BY_NONZERO_WEIGHTS with static shapes."""
    num = jnp.sum(losses * weights)
    den = jnp.maximum(jnp.sum((weights != 0).astype(jnp.float32)), 1.0)
    return num / den


def _pairwise(loss_of_logits: Callable, labels, logits, weights=None):
    """Pairwise template (ref _pairwise_comparison :715, _pairwise_loss :781):
    pairs (i, j) with l_i > l_j get weight w_i * |l_i - l_j|."""
    labels = jnp.asarray(labels, jnp.float32)
    logits = jnp.asarray(logits, jnp.float32)
    w = _item_weights(labels, weights)
    ld = labels[:, :, None] - labels[:, None, :]          # [B, L, L]
    sd = logits[:, :, None] - logits[:, None, :]
    pair_valid = (_valid(labels)[:, :, None]
                  & _valid(labels)[:, None, :]).astype(jnp.float32)
    pw = (ld > 0).astype(jnp.float32) * pair_valid
    pw = pw * w[:, :, None] * jnp.abs(ld)
    pw = jax.lax.stop_gradient(pw)
    return _reduce_by_nonzero(loss_of_logits(sd), pw)


def pairwise_hinge_loss(labels, logits, weights=None):
    """Hinge(l_i > l_j) = max(0, 1 - (s_i - s_j)) (ref :823)."""
    return _pairwise(lambda s: jax.nn.relu(1.0 - s), labels, logits, weights)


def pairwise_logistic_loss(labels, logits, weights=None):
    """log(1 + exp(-(s_i - s_j))) for l_i > l_j (ref :870)."""
    return _pairwise(
        lambda s: jax.nn.relu(-s) + jnp.log1p(jnp.exp(-jnp.abs(s))),
        labels, logits, weights)


def pairwise_soft_zero_one_loss(labels, logits, weights=None):
    """1 - P(l_i > l_j), P = sigmoid(s_i - s_j) (ref :918)."""
    return _pairwise(
        lambda s: jnp.where(s > 0, 1.0 - jax.nn.sigmoid(s),
                            jax.nn.sigmoid(-s)),
        labels, logits, weights)


def softmax_loss(labels, logits, weights=None):
    """Listwise softmax cross entropy over valid items (ref :967): lists are
    weighted by their (weighted) label sum; zero-label lists drop out."""
    labels = jnp.asarray(labels, jnp.float32)
    logits = jnp.asarray(logits, jnp.float32)
    valid = _valid(labels)
    w = _item_weights(labels, weights)
    labels = jnp.where(valid, labels, 0.0) * w
    logits = jnp.where(valid, logits, jnp.log(_EPSILON))
    label_sum = labels.sum(axis=1, keepdims=True)           # [B, 1]
    safe_sum = jnp.maximum(label_sum, _EPSILON)
    target = labels / safe_sum
    ce = -jnp.sum(target * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    list_w = label_sum[:, 0]                                # weight = label_sum
    return _reduce_by_nonzero(ce, list_w)


def sigmoid_cross_entropy_loss(labels, logits, weights=None):
    """Per-item sigmoid CE over valid items (ref :1025)."""
    labels = jnp.asarray(labels, jnp.float32)
    logits = jnp.asarray(logits, jnp.float32)
    w = _item_weights(labels, weights) * _valid(labels)
    safe_labels = jnp.where(_valid(labels), labels, 0.0)
    ce = (jax.nn.relu(logits) - logits * safe_labels
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return _reduce_by_nonzero(ce, w)


def mean_squared_loss(labels, logits, weights=None):
    """Per-item squared error over valid items (ref :1067)."""
    labels = jnp.asarray(labels, jnp.float32)
    logits = jnp.asarray(logits, jnp.float32)
    w = _item_weights(labels, weights) * _valid(labels)
    safe_labels = jnp.where(_valid(labels), labels, 0.0)
    return _reduce_by_nonzero((safe_labels - logits) ** 2, w)


def list_mle_loss(labels, logits, weights=None,
                  key: Optional[jax.Array] = None):
    """ListMLE [Xia et al. 2008] (ref :1107): negative log-likelihood of the
    label-sorted permutation under the Plackett-Luce model. `key` adds the
    reference's random tie-shuffle; None keeps it deterministic."""
    labels = jnp.asarray(labels, jnp.float32)
    logits = jnp.asarray(logits, jnp.float32)
    valid = _valid(labels)
    labels = jnp.where(valid, labels, 0.0)
    logits = jnp.where(valid, logits, jnp.log(_EPSILON))
    if key is not None:
        # random keys break ties in the descending label sort (ref
        # shuffle_valid_indices :133)
        noise = jax.random.uniform(key, labels.shape, minval=0.0, maxval=1e-3)
        sort_keys = labels + noise
    else:
        sort_keys = labels
    order = jnp.argsort(-sort_keys, axis=1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=1)
    raw_max = sorted_logits.max(axis=1, keepdims=True)
    sorted_logits = sorted_logits - raw_max
    # reverse cumulative logsumexp
    rev = jnp.flip(sorted_logits, axis=1)
    sums = jnp.log(jnp.cumsum(jnp.exp(rev), axis=1))
    sums = jnp.flip(sums, axis=1) - sorted_logits
    nll = sums.sum(axis=1)                                   # [B]
    if weights is None:
        list_w = jnp.ones_like(nll)
    else:
        w = jnp.asarray(weights, jnp.float32)
        list_w = jnp.broadcast_to(w, labels.shape[:1] + (1,))[:, 0] \
            if w.ndim else jnp.full_like(nll, w)
    return _reduce_by_nonzero(nll, list_w)


def approx_ranks(logits, alpha: float = 10.0):
    """rank_i ~= 0.5 + sum_j sigmoid(alpha * (s_j - s_i)) (ref :160)."""
    pairs = jax.nn.sigmoid(alpha * (logits[:, None, :] - logits[:, :, None]))
    return pairs.sum(axis=-1) + 0.5


def inverse_max_dcg(labels):
    """1 / DCG of the ideal ordering, 0 for all-zero lists (ref :193)."""
    ideal = -jnp.sort(-labels, axis=1)
    rank = jnp.arange(1, labels.shape[1] + 1, dtype=jnp.float32)
    dg = ((2.0 ** ideal - 1.0) / jnp.log1p(rank)).sum(axis=1, keepdims=True)
    return jnp.where(dg > 0, 1.0 / jnp.maximum(dg, _EPSILON),
                     jnp.zeros_like(dg))


def approx_ndcg_loss(labels, logits, weights=None, alpha: float = 10.0):
    """ApproxNDCG [Qin et al.] (ref :1177): -NDCG with sigmoid-approximated
    ranks. Reduction is SUM like the reference default; zero-label lists get
    weight 0."""
    labels = jnp.asarray(labels, jnp.float32)
    logits = jnp.asarray(logits, jnp.float32)
    valid = _valid(labels)
    labels = jnp.where(valid, labels, 0.0)
    logits = jnp.where(
        valid, logits,
        -1e3 + logits.min(axis=-1, keepdims=True) * jnp.ones_like(logits))
    label_sum = labels.sum(axis=1)
    if weights is None:
        list_w = jnp.ones_like(label_sum)
    else:
        w = jnp.asarray(weights, jnp.float32)
        list_w = (jnp.broadcast_to(w, labels.shape)[:, 0] if w.ndim
                  else jnp.full_like(label_sum, w))
    list_w = jnp.where(label_sum > 0, list_w, 0.0)
    gains = 2.0 ** labels - 1.0
    discounts = 1.0 / jnp.log1p(approx_ranks(logits, alpha=alpha))
    dcg = (gains * discounts).sum(axis=-1)
    cost = -dcg * inverse_max_dcg(labels)[:, 0]
    return jnp.sum(cost * list_w)


class RankingLossKey:
    """Ranking loss key strings (ref ltr_losses.py:253)."""
    PAIRWISE_HINGE_LOSS = "pairwise_hinge_loss"
    PAIRWISE_LOGISTIC_LOSS = "pairwise_logistic_loss"
    PAIRWISE_SOFT_ZERO_ONE_LOSS = "pairwise_soft_zero_one_loss"
    SOFTMAX_LOSS = "softmax_loss"
    SIGMOID_CROSS_ENTROPY_LOSS = "sigmoid_cross_entropy_loss"
    MEAN_SQUARED_LOSS = "mean_squared_loss"
    LIST_MLE_LOSS = "list_mle_loss"
    APPROX_NDCG_LOSS = "approx_ndcg_loss"


_LOSS_FNS = {
    RankingLossKey.PAIRWISE_HINGE_LOSS: pairwise_hinge_loss,
    RankingLossKey.PAIRWISE_LOGISTIC_LOSS: pairwise_logistic_loss,
    RankingLossKey.PAIRWISE_SOFT_ZERO_ONE_LOSS: pairwise_soft_zero_one_loss,
    RankingLossKey.SOFTMAX_LOSS: softmax_loss,
    RankingLossKey.SIGMOID_CROSS_ENTROPY_LOSS: sigmoid_cross_entropy_loss,
    RankingLossKey.MEAN_SQUARED_LOSS: mean_squared_loss,
    RankingLossKey.LIST_MLE_LOSS: list_mle_loss,
    RankingLossKey.APPROX_NDCG_LOSS: approx_ndcg_loss,
}


def make_loss_fn(loss_keys,
                 loss_weights: Optional[Sequence[float]] = None,
                 extra_args: Optional[Dict[str, Dict]] = None) -> Callable:
    """Weighted combination of named ranking losses (ref :266).

    `extra_args` maps loss key -> kwargs for that loss (e.g.
    {"approx_ndcg_loss": {"alpha": 5.0}}). Returns
    fn(labels, logits, weights=None) -> scalar loss.
    """
    if isinstance(loss_keys, str):
        loss_keys = [loss_keys]
    for k in loss_keys:
        if k not in _LOSS_FNS:
            raise ValueError(f"unknown ranking loss '{k}'")
    if loss_weights is not None and len(loss_weights) != len(loss_keys):
        raise ValueError("loss_weights must match loss_keys")
    lw = list(loss_weights) if loss_weights else [1.0] * len(loss_keys)
    kw = extra_args or {}

    def _loss_fn(labels, logits, weights=None):
        total = 0.0
        for k, w in zip(loss_keys, lw):
            total = total + w * _LOSS_FNS[k](labels, logits, weights,
                                             **kw.get(k, {}))
        return total

    return _loss_fn
