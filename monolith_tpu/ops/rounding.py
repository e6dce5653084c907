"""Stochastic rounding to low-precision storage dtypes.

TPU-native rebuild of ref runtime/hash_table/optimizer/stochastic_rounding.cc
(the `stochastic_rounding_float16` optimizer decorator, optimizer.proto:229):
embedding rows are stored in 16-bit floats, and the fp32->16-bit store after
each optimize rounds stochastically so tiny updates don't vanish under
round-to-nearest.

On TPU the hot path is a Pallas kernel using the on-core PRNG
(pltpu.prng_random_bits + pltpu.stochastic_round); elsewhere a pure-jnp
bit-twiddling fallback implements the same mantissa-probability rounding for
bfloat16 (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _stochastic_round_bf16_jnp(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """fp32 -> bf16 with P(round up) = frac(mantissa): add uniform noise in
    [0, 2^-16 ulp) to the fp32 bits then truncate to bf16."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    noise = jax.random.randint(key, x.shape, 0, 1 << 16, dtype=jnp.uint32)
    rounded = bits + noise
    truncated = rounded & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(truncated, jnp.float32).astype(jnp.bfloat16)


def _stochastic_round_bf16_pallas(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, x_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.prng_random_bits(x_ref.shape)
        out_ref[:] = pltpu.stochastic_round(
            x_ref[:], pltpu.bitcast(bits, jnp.uint32),
            target_dtype=jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(seed.reshape(1).astype(jnp.int32), x.astype(jnp.float32))


def stochastic_round_bf16(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Stochastically round fp32 values to bfloat16 (any shape)."""
    if jax.default_backend() == "tpu":
        seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        # Mosaic requires >= 2D operands; run the kernel over a padded
        # (rows, 128) view and slice back.
        shape = x.shape
        flat = x.reshape(-1)
        n = flat.shape[0]
        cols = 128
        rows = -(-n // cols)
        padded = jnp.zeros((rows * cols,), jnp.float32).at[:n].set(flat)
        out = _stochastic_round_bf16_pallas(padded.reshape(rows, cols), seed)
        return out.reshape(-1)[:n].reshape(shape)
    return _stochastic_round_bf16_jnp(x, key)
