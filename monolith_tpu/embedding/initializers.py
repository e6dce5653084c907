"""Row initializers for newly-admitted embedding IDs.

TPU-native rebuild of ref runtime/hash_table/initializer/ (zeros / constants /
random-uniform, initializer_config.proto). The reference initializes one
entry blob on insert; here initialization is a vectorized device op over the
batch of rows admitted this step, seeded from the step's PRNG key so results
are reproducible under jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Initializer:
    def init(self, key: jax.Array, shape) -> jnp.ndarray:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Zeros(Initializer):
    def init(self, key, shape):
        return jnp.zeros(shape, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class Constants(Initializer):
    value: float = 0.0

    def init(self, key, shape):
        return jnp.full(shape, self.value, dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class RandomUniform(Initializer):
    minval: float = -0.05
    maxval: float = 0.05

    def init(self, key, shape):
        return jax.random.uniform(key, shape, dtype=jnp.float32,
                                  minval=self.minval, maxval=self.maxval)


@dataclasses.dataclass(frozen=True)
class RandomNormal(Initializer):
    mean: float = 0.0
    stddev: float = 0.05

    def init(self, key, shape):
        return self.mean + self.stddev * jax.random.normal(key, shape, dtype=jnp.float32)


NAMED_INITIALIZERS = {
    "zeros": Zeros,
    "constants": Constants,
    "random_uniform": RandomUniform,
    "random_normal": RandomNormal,
}
