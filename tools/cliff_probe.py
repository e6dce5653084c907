"""Pallas row-DMA memory-cliff probe (parameterized).

One probe replacing the round-2..4 cliff_repro1-7 series; the cliff was
resolved as environment-specific in the round-4 device window (PERF.md
"Device window 2026-08-18": no cliff to 2 GB; 2-segment binning is the
slow configuration; not address-triggered) — this stays as the retest
harness for future device windows.

Every iteration's values DEPEND on the pool (vals = pool[rows] + 1) so
no scatter can be elided; final pool[rows] == n_iter proves execution.
The gather+scatter pair is exactly the train step's pool access pattern.

Usage:
  python tools/cliff_probe.py sweep      # pool-size sweep, pallas vs xla
  python tools/cliff_probe.py segments   # fixed 2.5 GB split 1/2/4 ways
  python tools/cliff_probe.py address    # base-address discriminator
  python tools/cliff_probe.py all        # everything (default)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.ops.scatter import gather_rows, scatter_rows

P = 128  # padded row width (floats)


def _gs(pallas):
    if pallas:
        return gather_rows, scatter_rows

    def g(pool, r):
        return pool.at[r].get(mode="fill", fill_value=0)

    def sc(pool, r, vals):
        return pool.at[r].set(vals, mode="drop", unique_indices=True)
    return g, sc


def _make_step(pallas, seg_rows):
    """Tuple-of-pools step: gather+1+scatter per segment (n_seg >= 1)."""
    g, sc = _gs(pallas)

    def step(*pools):
        return tuple(sc(pools[s], seg_rows[s], g(pools[s], seg_rows[s]) + 1.0)
                     for s in range(len(seg_rows)))
    return jax.jit(step, donate_argnums=tuple(range(len(seg_rows))))


def bench_single(tag, cap, U=32768, n_iter=30, pallas=True):
    rng = np.random.default_rng(0)
    pool = jnp.zeros((cap, P), jnp.float32)
    rows = jnp.asarray(rng.permutation(cap)[:U].astype(np.int32))
    step = _make_step(pallas, [rows])
    (pool,) = step(pool)
    jax.block_until_ready(pool)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        (pool,) = step(pool)
    jax.block_until_ready(pool)
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    got = np.asarray(pool[rows[:8]])[:, 0]
    ok = np.all(got == n_iter + 1)
    gb = cap * P * 4 / (1 << 30)
    print(f"{tag:28s} cap=2^{int(np.log2(cap))} ({gb:4.2f}GB) U={U} "
          f"{'pallas' if pallas else 'xla':6s}: {dt:8.3f} ms/iter "
          f"({dt / U * 1e6:5.1f} ns/row) "
          f"verify={'OK' if ok else 'FAIL ' + str(got)}", flush=True)
    del pool


def bench_segments(total_cap, n_seg, U=32768, n_iter=30, pallas=True):
    """Fixed total state split into n_seg row-segments, DMA per segment
    (rows routed by high bits — the engine's merge_max_bytes binning
    access pattern)."""
    rng = np.random.default_rng(0)
    seg_cap = total_cap // n_seg
    pools = [jnp.zeros((seg_cap, P), jnp.float32) for _ in range(n_seg)]
    rows_g = rng.permutation(total_cap)[:U].astype(np.int32)
    seg_rows = []
    pad = int(np.ceil(U / n_seg / 256) * 256) if n_seg > 1 else U
    for s in range(n_seg):
        mine = rows_g[(rows_g // seg_cap) == s] % seg_cap
        r = np.full(max(pad, mine.size), -1, np.int32)
        r[:mine.size] = mine
        seg_rows.append(jnp.asarray(r))
    step = _make_step(pallas, seg_rows)
    pools = step(*pools)
    jax.block_until_ready(pools)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        pools = step(*pools)
    jax.block_until_ready(pools)
    dt = (time.perf_counter() - t0) / n_iter * 1e3
    s0 = int(rows_g[0] // seg_cap)
    got = np.asarray(pools[s0][rows_g[0] % seg_cap])[0]
    gb = total_cap * P * 4 / (1 << 30)
    print(f"total={gb:4.2f}GB segs={n_seg} U={U} "
          f"{'pallas' if pallas else 'xla':6s}: {dt:8.3f} ms/iter "
          f"verify={'OK' if got == n_iter + 1 else 'FAIL ' + str(got)}",
          flush=True)


def run_sweep():
    for cap_l2 in [18, 20, 21, 22]:
        for pallas in (True, False):
            bench_single("sweep", 1 << cap_l2, pallas=pallas)


def run_segments():
    bench_segments(1 << 21, 1)          # control: 1 GB
    for n_seg in (1, 2, 4):             # 2.5 GB total
        bench_segments(5 << 20, n_seg)
    bench_segments(5 << 20, 1, pallas=False)


def run_address():
    """Is slowness about the pool's BASE ADDRESS? Bench a small pool
    alone, above a pinned 2.5 GB dummy, and after the pin is freed."""
    cap = 1 << 19  # 256 MB
    bench_single("a) alone (low address)", cap)
    dummy = jax.device_put(jnp.zeros((5 << 20, P), jnp.float32))
    jax.block_until_ready(dummy)
    bench_single("b) above 2.5GB pin", cap)
    bench_single("b2) above pin, xla", cap, pallas=False)
    del dummy
    bench_single("c) pin freed", cap)


if __name__ == "__main__":
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("sweep", "all"):
        run_sweep()
    if mode in ("segments", "all"):
        run_segments()
    if mode in ("address", "all"):
        run_address()
