"""Training-time quantization-aware retrieval of embedding rows.

TPU-native rebuild of the reference's retriever stack
(ref: runtime/hash_table/retriever/{raw,fake_quant,hash_net}_retriever.cc,
compressor/fake_quantizer.h, compressor/hash_net_quantizer.h). In the
reference, a retriever is bound into the entry accessor: every training
Lookup returns a transformed view of the raw stored floats, and Backward
rewrites the gradient before Optimize sees it. Here a retriever is a pure
differentiable transform applied to the looked-up unique-row buffer INSIDE
the loss function, so JAX autodiff produces the reference's Backward for
free:

  - FakeQuant: forward snaps each float to an int8 grid (fake_quantizer.h:28
    QuantizeToInteger: round-half-away-from-zero, clip to [-128, 127]);
    backward is straight-through (fake_quant_retriever.cc Backward is a
    no-op), expressed with jax.custom_vjp.
  - HashNet: forward = amplitude * tanh(scale * x) with scale following the
    reference's schedule scale = init * (1 + gamma*step)^power, capped at
    max_scale, updated every `step_size` steps (hash_net_quantizer.h:47-58);
    backward = grad * amplitude * scale * (1 - tanh^2) comes from autodiff,
    matching HashNetQuantizer::Backward exactly.

Retrievers are configured per TableSegment (`TableSegment.retriever`); raw
(None) segments pass through untouched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Retriever:
    name: str = "raw"

    def retrieve(self, x: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
        return x


@jax.custom_vjp
def _fake_quant_ste(x, step_size):
    # round-half-away-from-zero, like fake_quantizer.h:38-46 (f +/- half_step
    # then truncate), then clip to the int8 slot range [-128, 127]
    n = jnp.trunc(x / step_size + jnp.sign(x) * 0.5)
    n = jnp.clip(n, -128.0, 127.0)
    return n * step_size


def _fq_fwd(x, step_size):
    return _fake_quant_ste(x, step_size), None


def _fq_bwd(_, g):
    return (g, None)  # straight-through: ref fake_quant_retriever.cc Backward


_fake_quant_ste.defvjp(_fq_fwd, _fq_bwd)


@dataclasses.dataclass(frozen=True)
class FakeQuant(Retriever):
    """Quantization-aware training to an int8 grid over [-r, r]
    (ref fake_quantizer.h: step = r / 128, slots [-128, 127])."""
    name: str = "fake_quant"
    r: float = 1.0

    @property
    def step_size(self) -> float:
        return self.r / 128.0

    def retrieve(self, x, step):
        return _fake_quant_ste(x, self.step_size)


@dataclasses.dataclass(frozen=True)
class HashNet(Retriever):
    """HashNet continuation quantization: amplitude * tanh(scale * x)
    (ref hash_net_quantizer.h; gamma/power constants :65-66)."""
    name: str = "hash_net"
    amplitude: float = 1.0
    init_scale: float = 1.0
    max_scale: float = 10.0
    step_size: int = 1000
    gamma: float = 0.005
    power: float = 0.5

    def scale(self, step) -> jnp.ndarray:
        # the reference recomputes scale only at step_size multiples and
        # holds it in between (hash_net_quantizer.h:47-52)
        step = jnp.asarray(step, jnp.float32)
        eff = jnp.floor(step / self.step_size) * self.step_size
        s = self.init_scale * (1.0 + self.gamma * eff) ** self.power
        return jnp.minimum(s, self.max_scale)

    def retrieve(self, x, step):
        return self.amplitude * jnp.tanh(self.scale(step) * x)


NAMED_RETRIEVERS = {
    "raw": Retriever,
    "fake_quant": FakeQuant,
    "hash_net": HashNet,
}
