"""Cliff probe #7: is the >2GB Pallas DMA cliff about the pool's BASE
ADDRESS rather than its size?

Method: bench the DMA gather+scatter pair on a SMALL (256 MB) pool three
ways in one process:
  a) alone                      — low base address, the fast baseline
  b) after pinning a 2.5 GB dummy allocation (kept alive) — the pool is
     forced above the first ~2.5 GB of HBM
  c) dummy freed, pool reallocated — should recover (a)

If (b) is slow while the pool itself is tiny, the cliff tracks buffer
placement (e.g. a 32-bit address/offset field in Mosaic DMA descriptors
going dynamic above 2^31), and no program-level chunking helps — only
footprint reduction (bf16) or allocator ordering (allocate pools first).
If (b) stays fast, the cliff is per-buffer size and pool segmentation
(cliff_repro6) is a valid f32 escape.

Values depend on the pool each iteration (vals = pool[rows] + 1) so no
work can be elided; verification checks pool[rows] advanced by n_iter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.ops.scatter import gather_rows, scatter_rows

P = 128


def bench(tag, cap=1 << 19, U=32768, n_iter=30, pallas=True):
    rng = np.random.default_rng(0)
    pool = jnp.zeros((cap, P), jnp.float32)  # 256 MB at cap 2^19
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
    got = np.asarray(pool[rows[:4]])[:, 0]
    ok = np.all(got == n_iter + 1)
    print(f"{tag:28s} cap=2^{int(np.log2(cap))} "
          f"({cap * P * 4 / (1 << 30):4.2f}GB) "
          f"{'pallas' if pallas else 'xla':6s}: {dt:8.3f} ms/iter "
          f"verify={'OK' if ok else 'FAIL ' + str(got)}", flush=True)
    del pool


if __name__ == "__main__":
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    bench("a) alone (low address)")
    # 2.5 GB dummy pinned first -> the pool allocates above it
    dummy = jax.device_put(jnp.zeros((5 << 20, P), jnp.float32))
    jax.block_until_ready(dummy)
    bench("b) above 2.5GB pin")
    bench("b2) above pin, xla", pallas=False)
    del dummy
    bench("c) pin freed")
