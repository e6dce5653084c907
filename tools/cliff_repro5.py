"""Decisive cliff probe: each iteration's values DEPEND on the pool
(vals = pool[rows] + 1), so no scatter can be elided; final pool[rows]
== n_iter proves every iteration executed. Measures the gather+scatter
pair per iteration — exactly the train step's pool access pattern."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.ops.scatter import scatter_rows, gather_rows

P = 128


def bench(cap, U, n_iter=30, pallas=True):
    rng = np.random.default_rng(0)
    pool = jnp.zeros((cap, P), jnp.float32)
    rows = jnp.asarray(rng.permutation(cap)[:U].astype(np.int32))

    if pallas:
        @jax.jit
        def step(pool):
            vals = gather_rows(pool, rows) + 1.0
            return scatter_rows(pool, rows, vals)
    else:
        @jax.jit
        def step(pool):
            vals = pool.at[rows].get(mode="fill", fill_value=0) + 1.0
            return pool.at[rows].set(vals, mode="drop", unique_indices=True)

    step_d = jax.jit(step, donate_argnums=(0,))
    pool = step_d(pool)
    jax.block_until_ready(pool)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pool = step_d(pool)
    jax.block_until_ready(pool)
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    got = np.asarray(pool[rows[:8]])[:, 0]
    ok = np.all(got == n_iter + 1)
    gb = cap * P * 4 / (1 << 30)
    print(f"cap=2^{int(np.log2(cap))} ({gb:4.2f}GB) U={U} "
          f"{'pallas' if pallas else 'xla':6s}: {dt:8.3f} ms/iter "
          f"({dt/U*1e6:5.1f} ns/row)  verify={'OK' if ok else 'FAIL '+str(got)}",
          flush=True)


if __name__ == "__main__":
    for cap_l2 in [18, 20, 21, 22]:
        for pallas in (True, False):
            bench(1 << cap_l2, 32768, pallas=pallas)
