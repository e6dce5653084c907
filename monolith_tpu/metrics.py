"""Training metrics.

The reference auto-attaches per-head AUC/MSE metrics through tf.metrics
(native_model.py:579-617). Here `StreamingAUC` is a host-side fixed-bucket
accumulator (the same thresholded-confusion-matrix estimator tf.metrics.auc
uses), fed with device outputs once per step, plus simple streaming mean
helpers."""

from __future__ import annotations

import numpy as np


def device_metrics_init(num_thresholds: int = 200):
    """Zeroed ON-DEVICE metric state: AUC histograms + loss accumulator.

    The round-1 design kept per-step loss/preds references on the host and
    drained them with np.asarray every `metrics_every` steps — on tunnel-
    attached chips the FIRST device->host readback permanently degrades
    dispatch ~3.5x (PERF.md readback cliff), so metrics_enabled=True forced
    every real user into the slow mode. Instead the step now updates this
    tiny pytree INSIDE the jitted program (ref: metric hooks run off the
    critical path, metric/metric_hook.py:44); the host reads it back only
    when results are actually wanted (log prints / end of train), and each
    drain resets it, which also keeps the f32 bucket counts exact (f32
    holds integers exactly to 2^24 per bucket per drain interval)."""
    import jax.numpy as jnp
    return {"pos": jnp.zeros(num_thresholds, jnp.float32),
            "neg": jnp.zeros(num_thresholds, jnp.float32),
            "loss_sum": jnp.zeros((), jnp.float32),
            "loss_weight": jnp.zeros((), jnp.float32)}


def device_metrics_update(state, loss, preds=None, labels=None):
    """Pure jittable update: bucket preds into the AUC histograms and
    accumulate loss. `loss` may be a scalar or a [K] block of per-step
    losses; preds/labels any matching shapes (flattened), or None to
    accumulate loss only."""
    import jax.numpy as jnp
    loss = jnp.asarray(loss)
    out = dict(state)
    out["loss_sum"] = state["loss_sum"] + loss.sum().astype(jnp.float32)
    out["loss_weight"] = state["loss_weight"] + float(max(loss.size, 1))
    if preds is not None and labels is not None:
        T = state["pos"].shape[0]
        p = jnp.clip(preds.reshape(-1).astype(jnp.float32), 0.0, 1.0)
        y = labels.reshape(-1).astype(jnp.float32)
        b = jnp.minimum((p * T).astype(jnp.int32), T - 1)
        out["pos"] = state["pos"].at[b].add(y)
        out["neg"] = state["neg"].at[b].add(1.0 - y)
    return out


class StreamingAUC:
    """Thresholded ROC-AUC accumulator over minibatches."""

    def __init__(self, num_thresholds: int = 200):
        self.num_thresholds = num_thresholds
        # bucket b counts predictions in [b/N, (b+1)/N)
        self.pos_hist = np.zeros(num_thresholds, dtype=np.float64)
        self.neg_hist = np.zeros(num_thresholds, dtype=np.float64)

    def update(self, preds, labels, weights=None) -> None:
        preds = np.clip(np.asarray(preds, dtype=np.float64).ravel(), 0.0, 1.0)
        labels = np.asarray(labels, dtype=np.float64).ravel()
        w = np.ones_like(labels) if weights is None else np.asarray(weights, np.float64).ravel()
        buckets = np.minimum((preds * self.num_thresholds).astype(np.int64),
                             self.num_thresholds - 1)
        np.add.at(self.pos_hist, buckets, labels * w)
        np.add.at(self.neg_hist, buckets, (1.0 - labels) * w)

    def update_histograms(self, pos_hist, neg_hist) -> None:
        """Fold in already-bucketed counts (the device-metrics drain path)."""
        pos_hist = np.asarray(pos_hist, np.float64)
        assert pos_hist.shape == self.pos_hist.shape
        self.pos_hist += pos_hist
        self.neg_hist += np.asarray(neg_hist, np.float64)

    def result(self) -> float:
        total_pos = self.pos_hist.sum()
        total_neg = self.neg_hist.sum()
        if total_pos == 0 or total_neg == 0:
            return 0.5
        # sweep threshold from high to low: TPR/FPR curve, trapezoid rule
        tp = np.cumsum(self.pos_hist[::-1])
        fp = np.cumsum(self.neg_hist[::-1])
        tpr = np.concatenate([[0.0], tp / total_pos])
        fpr = np.concatenate([[0.0], fp / total_neg])
        return float(np.trapezoid(tpr, fpr))

    def reset(self) -> None:
        self.pos_hist[:] = 0
        self.neg_hist[:] = 0


class StreamingMean:
    def __init__(self):
        self.total = 0.0
        self.count = 0.0

    def update(self, value, weight: float = 1.0) -> None:
        self.total += float(value) * weight
        self.count += weight

    def result(self) -> float:
        return self.total / self.count if self.count else 0.0

    def reset(self) -> None:
        self.total = self.count = 0.0


def auc(preds, labels) -> float:
    """One-shot exact AUC (rank statistic) for tests/eval."""
    preds = np.asarray(preds).ravel()
    labels = np.asarray(labels).ravel()
    order = np.argsort(preds, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(preds) + 1)
    # average ranks for ties
    sorted_preds = preds[order]
    i = 0
    while i < len(sorted_preds):
        j = i
        while j + 1 < len(sorted_preds) and sorted_preds[j + 1] == sorted_preds[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[labels > 0.5].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))
