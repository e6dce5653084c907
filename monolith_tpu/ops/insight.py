"""Feature-insight and fid-counter ops.

TPU-native rebuild of the reference's feature-analysis layer ops
(ref: layers/kernels/feature_insight_kernels.cc, fid_counter_kernel.cc,
python wrappers layers/layer_ops.py:49-130):

- feature_insight: per-feature-segment projection. The reference hand-rolls
  a CPU triple loop computing, for each feature f owning a contiguous slice
  of embedding columns, out[b, f*K+k] = sum_{j in seg_f} in[b,j] * w[j,k].
  On TPU this is F statically-sliced matmuls (MXU) concatenated — XLA tiles
  each onto the systolic array and autodiff reproduces the reference's
  FeatureInsightGrad exactly (it is the plain matmul gradient per segment).
- fid_counter: an occurrence counter smuggled through an embedding slot.
  Forward is min(counter + step, threshold); the registered gradient
  IGNORES the upstream gradient and emits -step (0 once the threshold is
  reached) so that SgdOptimizer(1.0) on the slot applies
  counter -= lr * (-step) = counter + step per occurrence. The
  upstream-ignoring semantics require jax.custom_vjp (plain autodiff would
  zero the gradient on the clipped branch).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


def feature_insight(input_embedding: jnp.ndarray, weight: jnp.ndarray,
                    segment_sizes: Sequence[int],
                    aggregate: bool = False) -> jnp.ndarray:
    """Per-feature projection of a concatenated embedding.

    input_embedding: [B, sum(segment_sizes)] concatenation of per-feature
      embedding slices. weight: [sum(segment_sizes), K].
    Returns [B, F*K] (feature-major) — or, with aggregate=True, the
    reference's insight score sum_k out[b,f,k]^2 as [B, F]
    (layer_ops.py:57-70 segment_sum of the squared projection).
    """
    assert len(segment_sizes) > 0
    assert input_embedding.shape[-1] == weight.shape[0], (
        input_embedding.shape, weight.shape)
    outs = []
    start = 0
    for size in segment_sizes:
        outs.append(input_embedding[:, start:start + size]
                    @ weight[start:start + size, :])
        start += size
    out = jnp.concatenate(outs, axis=1)  # [B, F*K]
    if aggregate:
        b = out.shape[0]
        k = weight.shape[1]
        sq = out * out
        return sq.reshape(b, len(segment_sizes), k).sum(axis=2)
    return out


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fid_counter_core(counter: jnp.ndarray, step: float,
                      counter_threshold: float) -> jnp.ndarray:
    # Identity forward, like the reference MonolithFidCounter op; the whole
    # point is the custom backward below.
    return counter


def _fid_counter_fwd(counter, step, counter_threshold):
    return counter, counter


def _fid_counter_bwd(step, counter_threshold, counter, g):
    # ref layer_ops.py:124-131 _fid_counter_grad: upstream grad is DISCARDED;
    # emit -step, masked to 0 where the counter has saturated.
    del g
    grad = jnp.where(counter >= counter_threshold,
                     jnp.zeros_like(counter),
                     jnp.full_like(counter, -step))
    return (grad,)


_fid_counter_core.defvjp(_fid_counter_fwd, _fid_counter_bwd)


def fid_counter(counter: jnp.ndarray, counter_threshold: int,
                step: float = 1.0) -> jnp.ndarray:
    """Occurrence counter through an embedding slot (ref layer_ops.py:90).

    The slot's optimizer must be SGD(1.0) (ref docstring): each train step
    the gradient -step bumps the stored counter by +step until it saturates
    at counter_threshold. Returns the post-bump counter value for use in
    the model (e.g. freshness-weighted item scores).
    """
    c = _fid_counter_core(counter, float(step), float(counter_threshold))
    c = c + jnp.asarray(step, dtype=c.dtype)
    return jnp.minimum(c, jnp.asarray(counter_threshold, dtype=c.dtype))
