"""Feature-interaction compute ops.

TPU-native rebuild of the reference's interaction kernels: the FFM CPU/CUDA
kernel (ref: layers/kernels/ffm_kernels.{cc,cu.cc}, python layers/layer_ops.py
ffm()) and the FM/dot interactions used by the demo models (model.py:52
TestFFMModel). On TPU these are pure jnp expressions: XLA maps the batched
pairwise products onto the MXU/VPU and fuses them with neighbors, so no
hand-written kernel is needed at these sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def fm_interaction(embs: jnp.ndarray) -> jnp.ndarray:
    """Second-order factorization-machine interaction (sum-square trick).

    embs: [B, F, D] per-field embeddings -> [B, D]:
      0.5 * ((sum_f e_f)^2 - sum_f e_f^2)
    """
    sum_sq = jnp.square(jnp.sum(embs, axis=1))
    sq_sum = jnp.sum(jnp.square(embs), axis=1)
    return 0.5 * (sum_sq - sq_sum)


def ffm_interaction(left: jnp.ndarray, right: jnp.ndarray,
                    dim_size: int, int_type: str = "multiply") -> jnp.ndarray:
    """Field-aware FM interaction (ref layers/layer_ops.py ffm(), kernels
    ffm_kernels.cc): cross every left field with every right field.

    left:  [B, F1 * dim_size]
    right: [B, F2 * dim_size]
    int_type "multiply": elementwise products -> [B, F1*F2*dim_size]
    int_type "dot":      dot products         -> [B, F1*F2]
    """
    b = left.shape[0]
    f1 = left.shape[1] // dim_size
    f2 = right.shape[1] // dim_size
    l = left.reshape(b, f1, 1, dim_size)
    r = right.reshape(b, 1, f2, dim_size)
    prod = l * r  # [B, F1, F2, D]
    if int_type == "multiply":
        return prod.reshape(b, f1 * f2 * dim_size)
    if int_type == "dot":
        return jnp.sum(prod, axis=-1).reshape(b, f1 * f2)
    raise ValueError(f"unknown int_type: {int_type}")


def dot_interaction(embs: jnp.ndarray, self_interaction: bool = False,
                    keep_diag: bool = False) -> jnp.ndarray:
    """DLRM-style pairwise dot interaction: [B, F, D] -> [B, F*(F-1)/2]
    (upper triangle of the F x F gram matrix, MXU matmul)."""
    gram = jnp.einsum("bfd,bgd->bfg", embs, embs,
                      preferred_element_type=jnp.float32)
    f = embs.shape[1]
    rows, cols = jnp.triu_indices(f, k=0 if self_interaction else 1)
    return gram[:, rows, cols]
