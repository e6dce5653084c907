"""h2d transfer probe: what does the tunnel/PCIe wire actually deliver?

Decision data for the multislot wire work (VERDICT r4 #3): the multislot
step is h2d-bound (~1.2 MB/step at an effective 12-25 MB/s). Before
shrinking bytes, measure:
  1. bandwidth vs transfer size (fixed cost vs slope)
  2. parallel-stream scaling: N concurrent device_puts of size/N chunks —
     if the tunnel is per-stream limited (gRPC windowing), chunked
     uploads could recover 2-4x without touching the wire format
  3. dtype neutrality (int32 vs float32 vs int16 view)

Usage: python tools/h2d_probe.py [reps]
"""

import concurrent.futures as cf
import sys
import time

import jax
import numpy as np


def put_one(arr, reps):
    # warm
    jax.block_until_ready(jax.device_put(arr))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(jax.device_put(arr))
    dt = (time.perf_counter() - t0) / reps
    return dt


def put_chunked(chunks, reps, pool=None):
    """device_put all chunks, block on all — issued from one thread
    (JAX dispatch is async, so transfers may already overlap)."""
    jax.block_until_ready([jax.device_put(c) for c in chunks])
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready([jax.device_put(c) for c in chunks])
    return (time.perf_counter() - t0) / reps


def put_threaded(chunks, reps, pool):
    """device_put each chunk from its own thread (true client-side
    concurrency even if dispatch serializes)."""
    def one(c):
        return jax.device_put(c)
    jax.block_until_ready(list(pool.map(one, chunks)))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(list(pool.map(one, chunks)))
    return (time.perf_counter() - t0) / reps


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          flush=True)
    rng = np.random.default_rng(0)

    print("\n-- bandwidth vs size (single array, int32) --", flush=True)
    for kb in (16, 64, 256, 1024, 2048, 4096, 8192):
        arr = rng.integers(0, 1 << 30, size=kb * 256, dtype=np.int32)
        dt = put_one(arr, reps)
        print(f"  {kb:5d} KB: {dt * 1e3:8.2f} ms  "
              f"{arr.nbytes / 1e6 / dt:7.1f} MB/s", flush=True)

    print("\n-- parallel streams (2 MB total, int32) --", flush=True)
    total = (2 << 20) // 4
    base = rng.integers(0, 1 << 30, size=total, dtype=np.int32)
    dt1 = put_one(base, reps)
    print(f"  1 stream : {dt1 * 1e3:8.2f} ms  "
          f"{base.nbytes / 1e6 / dt1:7.1f} MB/s", flush=True)
    for n in (2, 4, 8):
        chunks = [np.ascontiguousarray(c) for c in np.array_split(base, n)]
        dt = put_chunked(chunks, reps)
        with cf.ThreadPoolExecutor(n) as pool:
            dtt = put_threaded(chunks, reps, pool)
        print(f"  {n} chunks : async-issue {dt * 1e3:8.2f} ms "
              f"({base.nbytes / 1e6 / dt:7.1f} MB/s)   "
              f"threaded {dtt * 1e3:8.2f} ms "
              f"({base.nbytes / 1e6 / dtt:7.1f} MB/s)", flush=True)

    print("\n-- dtype (2 MB) --", flush=True)
    for dt_name, a in (("int32", base),
                       ("float32", base.view(np.float32)),
                       ("int16", base.view(np.int16)),
                       ("uint8", base.view(np.uint8))):
        d = put_one(a, reps)
        print(f"  {dt_name:8s}: {d * 1e3:8.2f} ms  "
              f"{a.nbytes / 1e6 / d:7.1f} MB/s", flush=True)

    print("\n-- d2h readback (2 MB) --", flush=True)
    dev_arr = jax.device_put(base)
    jax.block_until_ready(dev_arr)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(dev_arr)
    d = (time.perf_counter() - t0) / reps
    print(f"  readback: {d * 1e3:8.2f} ms  "
          f"{base.nbytes / 1e6 / d:7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
