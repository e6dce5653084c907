"""Minimal repro for the Pallas DMA memory-pressure cliff (PERF.md).

Measures the row-DMA scatter kernel's per-call time while total live HBM
state grows via ballast arrays. No device->host readbacks (readback cliff);
timing is block_until_ready-only.

Usage: python tools/cliff_repro.py [n_ballast_gb ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.ops.scatter import scatter_rows, gather_rows

CAP = 1 << 18          # 256k rows
P = 128                # 512 B/row -> pool = 134 MB
U = 8192


def bench_one(ballast_gb: float, use_pallas=True, n_iter=50):
    ballast = []
    nbytes = int(ballast_gb * (1 << 30))
    chunk = 256 * (1 << 20)  # 256 MB chunks
    while nbytes > 0:
        n = min(chunk, nbytes)
        ballast.append(jnp.zeros((n // 4,), jnp.float32))
        nbytes -= n
    jax.block_until_ready(ballast)

    pool = jnp.zeros((CAP, P), jnp.float32)
    rows = jnp.asarray(np.random.default_rng(0).permutation(CAP)[:U]
                       .astype(np.int32))
    vals = jnp.ones((U, P), jnp.float32)

    if use_pallas:
        @jax.jit
        def step(pool):
            return scatter_rows(pool, rows, vals)
    else:
        @jax.jit
        def step(pool):
            safe = rows.astype(jnp.int32)
            return pool.at[safe].set(vals, mode="drop", unique_indices=True)

    pool = step(pool)  # compile
    jax.block_until_ready(pool)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pool = step(pool)
    jax.block_until_ready(pool)
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    del pool, ballast
    return dt


def main():
    gbs = [float(x) for x in sys.argv[1:]] or [0, 0.5, 1.0, 1.5, 2.0, 2.5,
                                               3.0, 4.0]
    print(f"{'ballast_gb':>10} {'pallas_ms':>10} {'xla_ms':>10}")
    for gb in gbs:
        p = bench_one(gb, use_pallas=True)
        x = bench_one(gb, use_pallas=False)
        print(f"{gb:>10.1f} {p:>10.3f} {x:>10.3f}", flush=True)


if __name__ == "__main__":
    main()
