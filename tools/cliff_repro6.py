"""Cliff probe #6: does SEGMENTING the pool dodge the >2GB Pallas DMA cliff?

Fixed total state (~2.5 GB), split into N row-segments with the DMA
gather/scatter issued per segment (rows routed by high bits, the same
masked-OOB trick the engine's sharded path uses). If the cliff tracks
PER-ARRAY size, N=2/4 should recover small-pool cost and the engine can
adopt segment routing for big f32 pools; if it tracks TOTAL live state,
all N stay slow and bf16 (or host tiering) is the only escape.

Every iteration's values depend on the pool (vals = pool[rows] + 1) so
nothing can be elided; final pool[rows] == n_iter verifies execution.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.ops.scatter import scatter_rows, gather_rows

P = 128


def bench(total_cap, n_seg, U, n_iter=30, pallas=True):
    rng = np.random.default_rng(0)
    seg_cap = total_cap // n_seg
    pools = [jnp.zeros((seg_cap, P), jnp.float32) for _ in range(n_seg)]
    rows_g = rng.permutation(total_cap)[:U].astype(np.int32)
    # per-segment row lists, padded with -1 (OOB -> dropped/zero-filled)
    seg_rows = []
    pad = int(np.ceil(U / n_seg / 256) * 256) if n_seg > 1 else U
    for s in range(n_seg):
        mine = rows_g[(rows_g // seg_cap) == s] % seg_cap
        r = np.full(max(pad, mine.size), -1, np.int32)
        r[:mine.size] = mine
        seg_rows.append(jnp.asarray(r))

    if pallas:
        g, sc = gather_rows, scatter_rows
    else:
        def g(pool, rows):
            return pool.at[rows].get(mode="fill", fill_value=0)

        def sc(pool, rows, vals):
            return pool.at[rows].set(vals, mode="drop", unique_indices=True)

    @jax.jit
    def step(*pools):
        out = []
        for s in range(n_seg):
            vals = g(pools[s], seg_rows[s]) + 1.0
            out.append(sc(pools[s], seg_rows[s], vals))
        return tuple(out)

    step_d = jax.jit(step, donate_argnums=tuple(range(n_seg)))
    pools = step_d(*pools)
    jax.block_until_ready(pools)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pools = step_d(*pools)
    jax.block_until_ready(pools)
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    s0 = int(rows_g[0] // seg_cap)
    got = np.asarray(pools[s0][rows_g[0] % seg_cap])[0]
    gb = total_cap * P * 4 / (1 << 30)
    print(f"total={gb:4.2f}GB segs={n_seg} U={U} "
          f"{'pallas' if pallas else 'xla':6s}: {dt:8.3f} ms/iter "
          f"verify={'OK' if got == n_iter + 1 else 'FAIL ' + str(got)}",
          flush=True)


if __name__ == "__main__":
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    # control: 1 GB, comfortably below the cliff
    bench(1 << 21, 1, 32768, pallas=True)
    # 2.5 GB total, segmented 1/2/4 ways
    for n_seg in (1, 2, 4):
        bench(5 << 20, n_seg, 32768, pallas=True)
    bench(5 << 20, 1, 32768, pallas=False)  # XLA reference point
