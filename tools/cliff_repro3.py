"""Sanity: verify the DMA scatter in the repro2 harness executes, and
cross-check the U=32768 single-table case against PERF.md's 1.14 ms."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.ops.scatter import scatter_rows

P = 128


def bench(cap, U, n_iter=30, verify=False):
    rng = np.random.default_rng(0)
    pool = jnp.zeros((cap, P), jnp.float32)
    rows = jnp.asarray(rng.permutation(cap)[:U].astype(np.int32))
    # values depend on iteration so repeated scatters are observable
    vals = jnp.arange(U * P, dtype=jnp.float32).reshape(U, P) % 1000

    step = jax.jit(lambda p, r, v: scatter_rows(p, r, v),
                   donate_argnums=(0,))
    pool = step(pool, rows, vals)
    jax.block_until_ready(pool)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pool = step(pool, rows, vals)
    jax.block_until_ready(pool)
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    print(f"cap=2^{int(np.log2(cap))} U={U}: {dt:.3f} ms/scatter "
          f"({dt/U*1e6:.1f} ns/row)", flush=True)
    if verify:
        got = np.asarray(pool)[np.asarray(rows)]
        want = np.asarray(vals)
        print("verify:", "OK" if np.array_equal(got, want) else "MISMATCH",
              flush=True)


if __name__ == "__main__":
    bench(1 << 21, 32768)
    bench(1 << 18, 8192)
    bench(1 << 18, 8192, n_iter=200)
    bench(1 << 18, 8192, verify=True)
