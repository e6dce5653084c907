"""Component microbenchmarks — the rebuild's counterpart of the reference's
benchmark harnesses (hash_table_ops_benchmark.py:31-52 lookup 10k ids dim 32
/ :76+ optimize 1M ids; runtime/hash_table/hash_table_benchmark.cc;
distribution_ops_benchmark.py). BASELINE.md tracks "embedding lookups/sec/
chip — measured & tracked; no reference number exists": this is the tracker.

Each benchmark prints one `name: value unit` line and the suite ends with a
single JSON object, so results can be diffed round-over-round. Runs on the
default backend (TPU when the tunnel is up); --cpu forces the host platform.

Usage: python tools/microbench.py [--cpu] [names...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp

from monolith_tpu.embedding import table as tbl
from monolith_tpu.embedding.host_store import Batcher, HostStore, prepare_wire
from monolith_tpu.embedding.optimizers import Adagrad
from monolith_tpu.embedding.spec import TableSegment, TableSpec

RESULTS = {}


def record(name, value, unit):
    RESULTS[name] = {"value": round(value, 1), "unit": unit}
    print(f"{name}: {value:,.1f} {unit}", flush=True)


def _time(fn, iters):
    fn()  # compile / warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out) if out is not None else None
    return (time.perf_counter() - t0) / iters


def make_spec(cap=1 << 20, dim=32):
    return TableSpec(name="bench", capacity_per_shard=cap,
                     segments=(TableSegment(dim=dim, optimizer=Adagrad()),))


def bench_lookup(n_ids=10_000, dim=32, iters=100):
    """Device row gather, the serving/forward hot op (ref
    hash_table_ops_benchmark.py:31-52: 10k ids, dim 32, 100 iters)."""
    spec = make_spec(dim=dim)
    state = tbl.create_state(spec)
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.integers(0, spec.capacity_per_shard, n_ids, dtype=np.int32))
    gather = jax.jit(lambda st, r: tbl.gather_packed(spec, st, r))
    dt = _time(lambda: gather(state, rows), iters)
    record("lookup_rows_per_sec", n_ids / dt, "rows/s")
    record("lookup_10k_dim32_us", dt * 1e6, "us")


def bench_optimize(n_ids=1 << 20, dim=32, iters=20):
    """Full device optimize cycle: gather -> adagrad row math -> scatter
    (ref hash_table_ops_benchmark.py:76+: 1M ids, dim 32)."""
    spec = make_spec(cap=1 << 21, dim=dim)
    state = tbl.create_state(spec)
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.permutation(spec.capacity_per_shard)[:n_ids].astype(np.int32))

    @jax.jit
    def step(st, rows, g, i):
        packed = tbl.gather_packed(spec, st, rows)
        new = tbl.optimize_packed(spec, packed, g, i)
        return tbl.scatter_packed(spec, st, rows, new)

    g = jnp.ones((n_ids, dim), jnp.float32) * 0.01
    i = jnp.int32(1)
    # state is re-donated each call in real training; keep it simple here
    dt = _time(lambda: step(state, rows, g, i), iters)
    record("optimize_rows_per_sec", n_ids / dt, "rows/s")
    record("optimize_1m_dim32_ms", dt * 1e3, "ms")


def bench_host_map(n_fids=1 << 20, iters=10):
    """Host fid->row map throughput, the cuckoo-table equivalent (ref
    runtime/hash_table/hash_table_benchmark.cc)."""
    store = HostStore(row_capacity=1 << 22)
    rng = np.random.default_rng(0)
    fids = rng.integers(0, 1 << 40, n_fids, dtype=np.int64)
    store.map_train(fids, ts=0)  # populate
    t0 = time.perf_counter()
    for _ in range(iters):
        rows, _, _ = store.map_train(fids, ts=0)
    dt = (time.perf_counter() - t0) / iters
    assert rows.min() >= 0
    record("host_map_probes_per_sec", n_fids / dt, "probes/s")


def bench_dedup(n_pos=413_000, n_unique=40_000, iters=10):
    """Host dedup+shard of a production-shaped stream (ref
    distribution_ops_benchmark.py unique/split fused op)."""
    batcher = Batcher(expected_unique=65536)
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 1 << 40, n_unique, dtype=np.int64)
    fids = pool[rng.integers(0, n_unique, n_pos)]
    t0 = time.perf_counter()
    for _ in range(iters):
        uniq, idx, counts, overflow = batcher.dedup(fids, num_shards=1,
                                                    shard_cap=65536)
    dt = (time.perf_counter() - t0) / iters
    assert overflow == 0
    record("dedup_positions_per_sec", n_pos / dt, "pos/s")


def bench_wire(n_pos=100_000, iters=10):
    """prepare_wire: dedup + map + pack in one native call — the whole
    host side of a training step for one stream."""
    store = HostStore(row_capacity=1 << 22)
    batcher = Batcher(expected_unique=65536)
    rng = np.random.default_rng(0)
    fids = rng.integers(0, 1 << 40, n_pos, dtype=np.int64)
    streams = [fids]
    ucap = 1 << 17
    wire = np.empty(ucap + (n_pos + 1) // 2, dtype=np.int32)
    prepare_wire(batcher, store, streams, ts=0, unique_cap=ucap,
                 new_cap=ucap, record_touch=False, wire_out=wire)
    t0 = time.perf_counter()
    for _ in range(iters):
        stats = prepare_wire(batcher, store, streams, ts=0, unique_cap=ucap,
                             new_cap=ucap, record_touch=False, wire_out=wire)
    dt = (time.perf_counter() - t0) / iters
    assert stats[0] == 0  # no overflow
    record("prepare_wire_positions_per_sec", n_pos / dt, "pos/s")


ALL = {
    "lookup": bench_lookup,
    "optimize": bench_optimize,
    "host_map": bench_host_map,
    "dedup": bench_dedup,
    "wire": bench_wire,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print(f"backend: {jax.default_backend()}", flush=True)
    for n in names:
        ALL[n]()
    print(json.dumps({"backend": jax.default_backend(), **RESULTS}))
