"""Cliff repro, round 2: N donated pools scattered in ONE jit program,
called in a chain — the multislot shape. Sweep N and cap.

Usage: python tools/cliff_repro2.py [pallas|xla] [n_tables] [cap_log2]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.ops.scatter import scatter_rows

P = 128
U = 8192


def bench(n_tables: int, cap: int, use_pallas: bool, n_iter=30):
    rng = np.random.default_rng(0)
    pools = [jnp.zeros((cap, P), jnp.float32) for _ in range(n_tables)]
    rows = [jnp.asarray(rng.permutation(cap)[:U].astype(np.int32))
            for _ in range(n_tables)]
    vals = [jnp.ones((U, P), jnp.float32) for _ in range(n_tables)]
    jax.block_until_ready(pools)

    if use_pallas:
        def one(pool, r, v):
            return scatter_rows(pool, r, v)
    else:
        def one(pool, r, v):
            return pool.at[r].set(v, mode="drop", unique_indices=True)

    @jax.jit
    def step(pools, rows, vals):
        return [one(p, r, v) for p, r, v in zip(pools, rows, vals)]

    step_d = jax.jit(lambda pools, rows, vals:
                     [one(p, r, v) for p, r, v in zip(pools, rows, vals)],
                     donate_argnums=(0,))
    pools = step_d(pools, rows, vals)
    jax.block_until_ready(pools)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pools = step_d(pools, rows, vals)
    jax.block_until_ready(pools)
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    gb = n_tables * cap * P * 4 / (1 << 30)
    print(f"tables={n_tables:3d} cap=2^{int(np.log2(cap)):2d} "
          f"state={gb:5.2f}GB {'pallas' if use_pallas else 'xla':6s} "
          f"{dt:8.2f} ms/call ({dt/n_tables*1000:6.0f} us/table)",
          flush=True)
    del pools, rows, vals


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    use_pallas = mode == "pallas"
    if len(sys.argv) > 3:
        bench(int(sys.argv[2]), 1 << int(sys.argv[3]), use_pallas)
        return
    for n_tables, cap_l2 in [(1, 18), (4, 18), (8, 18), (12, 18), (16, 18),
                             (17, 18), (17, 17), (17, 16), (8, 19), (4, 20)]:
        bench(n_tables, 1 << cap_l2, use_pallas)


if __name__ == "__main__":
    main()
