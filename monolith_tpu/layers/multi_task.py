"""Multi-task layers.

TPU-native rebuild of ref layers/multi_task.py: MMoE (:34) and SNR (:308).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from monolith_tpu.layers.mlp import MLP


class MMoE(nn.Module):
    """Multi-gate mixture of experts (ref :34): per-task softmax gates over
    shared expert MLPs. Returns (task outputs list, aux_loss). With
    gate_type != softmax the reference adds a load-balance CV^2 loss; here
    topk/noise gating uses the same auxiliary."""
    num_tasks: int
    num_experts: int
    expert_output_dims: Sequence[int]
    gate_type: str = "softmax"  # softmax | topk
    top_k: int = 2

    @nn.compact
    def __call__(self, expert_input: jnp.ndarray,
                 gate_input: Optional[jnp.ndarray] = None
                 ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        gate_input = expert_input if gate_input is None else gate_input
        experts = jnp.stack(
            [MLP(output_dims=tuple(self.expert_output_dims), activate_last=True,
                 name=f"expert_{i}")(expert_input)
             for i in range(self.num_experts)], axis=2)  # [B, D, E]
        aux_loss = jnp.float32(0)
        outs = []
        for t in range(self.num_tasks):
            logits = nn.Dense(self.num_experts, name=f"gate_{t}")(gate_input)
            if self.gate_type == "topk":
                thresh = jnp.sort(logits, axis=-1)[:, -self.top_k][:, None]
                logits = jnp.where(logits >= thresh, logits, -1e9)
            gates = nn.softmax(logits, axis=-1)  # [B, E]
            if self.gate_type != "softmax":
                importance = jnp.sum(gates, axis=0)
                mean = jnp.mean(importance)
                var = jnp.var(importance)
                aux_loss = aux_loss + var / jnp.square(mean + 1e-9)
            outs.append(jnp.einsum("bde,be->bd", experts, gates,
                                   preferred_element_type=jnp.float32))
        return outs, aux_loss


class SNR(nn.Module):
    """Sub-Network Routing (ref :308): learned stochastic binary (hard
    concrete) connections between input sub-networks and output sub-networks.
    __call__(inputs: list of [B, in_dim]) -> list of [B, out_dim]."""
    num_out_subnet: int
    out_subnet_dim: int
    snr_type: str = "trans"   # trans | aver
    zeta: float = 1.1
    gamma: float = -0.1
    beta: float = 0.667
    training: bool = True

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        n_in = len(inputs)
        in_dim = inputs[0].shape[-1]
        n_out = self.num_out_subnet
        # connection log-alpha per (in, out) pair
        log_alpha = self.param("snr_log_alpha", nn.initializers.zeros,
                               (n_in * n_out,))
        if self.training:
            u = jax.random.uniform(self.make_rng("snr"), (n_in * n_out,),
                                   minval=1e-6, maxval=1 - 1e-6)
            s = nn.sigmoid((jnp.log(u) - jnp.log(1 - u) + log_alpha) / self.beta)
        else:
            s = nn.sigmoid(log_alpha)
        z = jnp.clip(s * (self.zeta - self.gamma) + self.gamma, 0.0, 1.0)

        if self.snr_type == "aver":
            # averaging connections: out_j = sum_i z_ij * in_i (dims must match)
            assert in_dim == self.out_subnet_dim
            zmat = z.reshape(n_in, n_out)
            outs = []
            for j in range(n_out):
                outs.append(sum(zmat[i, j] * inputs[i] for i in range(n_in)))
            return outs
        # trans: per-(i,j) weight matrices gated by z
        w = self.param("snr_weight", nn.initializers.glorot_normal(),
                       (n_in * n_out, in_dim, self.out_subnet_dim))
        w = w * z[:, None, None]
        x = jnp.stack(inputs, axis=1)  # [B, n_in, in_dim]
        w4 = w.reshape(n_in, n_out, in_dim, self.out_subnet_dim)
        out = jnp.einsum("bni,niod->bod", x, w4.transpose(0, 2, 1, 3),
                         preferred_element_type=jnp.float32)
        return [out[:, j] for j in range(n_out)]
