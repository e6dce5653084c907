"""Multislot merged-table A/B on the real chip: {f32, bf16} x {pallas, xla}
scatter, one process, ABCD-ABCD interleaved rounds so tunnel drift cancels.
Each cell reports host-pack / device-only / e2e ms-per-step medians.

The f32 merged pool is 2.28 GB (above the Pallas DMA memory cliff);
bf16 is 1.14 GB (below it) — this is the cliff x dtype experiment that
decides the production default (PERF.md).

Usage: python tools/ms_ab2.py [variants...]   e.g. f32-xla bf16-pallas
"""

import os
import sys
import time

import jax
import numpy as np

VARIANTS = ["f32-xla", "f32-pallas", "bf16-xla", "bf16-pallas",
            "f32bin-pallas"]  # binned: merge_max_bytes=1.2GB pools


def build(dtype: str, pallas: bool):
    os.environ["MT_PALLAS_SCATTER"] = "1" if pallas else "0"
    import jax.numpy as jnp

    from monolith_tpu.data.synthetic import SyntheticMultiSlot
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.multislot import MultiSlotTask
    from monolith_tpu.training.trainer import Trainer, TrainerConfig

    bf16 = dtype == "bf16"
    binned = dtype.endswith("bin")
    task = MultiSlotTask(num_tables=16, num_slots=40, embedding_dim=16,
                         capacity_per_shard=1 << 18, history_length=20,
                         hidden=(256, 128, 64), merge=True,
                         merge_max_bytes=int(1.2 * (1 << 30)) if binned else 0,
                         table_dtype=jnp.bfloat16 if bf16 else jnp.float32,
                         stochastic_rounding=bf16,
                         dense_dtype=jnp.bfloat16 if bf16 else None)
    trainer = Trainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=1, unique_cap=49152, new_cap=49152),
        log_every=0, metrics_enabled=False))
    data = SyntheticMultiSlot(num_slots=40, vocab_per_slot=100_000,
                              history_length=20, batch_size=8192, seed=0)
    return trainer, data


def measure(trainer, data, K=8, steps=64):
    from monolith_tpu.training.trainer import Trainer
    it = iter(data)
    for _ in range(4):
        fb, b = next(it)
        out = trainer.train_step(fb, b)
    jax.block_until_ready(out["loss"])
    batches = [next(it) for _ in range(K)]
    out = trainer.train_step_block(batches)
    jax.block_until_ready(out["loss"])

    layout = Trainer._batch_layout(batches[0][1])
    W = trainer._full_wire_words(layout)
    wires = np.empty((K, W), dtype=np.int32)
    t0 = time.perf_counter()
    for i, (fb, b) in enumerate(batches):
        trainer._pack_full_wire(fb, b, layout, 0, i, out=wires[i])
    host_ms = (time.perf_counter() - t0) / K * 1e3

    t0 = time.perf_counter()
    for _ in range(steps // K):
        (trainer.table_states, trainer.params, trainer.model_state,
         trainer.opt_state, trainer._dev_metrics, losses, _p, _a
         ) = trainer._jit_step_block(
            trainer.table_states, trainer.params, trainer.model_state,
            trainer.opt_state, trainer._dev_metrics, wires,
            trainer._base_key)
    jax.block_until_ready(losses)
    dev_ms = (time.perf_counter() - t0) / steps * 1e3

    t0 = time.perf_counter()
    for _ in range(steps // K):
        out = trainer.train_step_block(batches)
    jax.block_until_ready(out["loss"])
    e2e_ms = (time.perf_counter() - t0) / steps * 1e3

    # H2D transfer cost of the wires alone (the only per-step transfer)
    t0 = time.perf_counter()
    for _ in range(steps // K):
        w = jax.device_put(wires)
    jax.block_until_ready(w)
    h2d_ms = (time.perf_counter() - t0) / steps * 1e3
    return host_ms, dev_ms, e2e_ms, h2d_ms


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    variants = sys.argv[1:] or VARIANTS
    results = {v: [] for v in variants}
    for rnd in range(2):
        for v in variants:
            dtype, kern = v.split("-")
            try:
                trainer, data = build(dtype, kern == "pallas")
                r = measure(trainer, data)
            except Exception as e:  # keep the A/B alive if one cell dies
                print(f"round{rnd} {v}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:200]}", flush=True)
                continue
            results[v].append(r)
            print(f"round{rnd} {v}: host={r[0]:.2f} dev={r[1]:.2f} "
                  f"e2e={r[2]:.2f} h2d={r[3]:.2f} ms/step "
                  f"({8192 / r[2] * 1e3 / 1e3:.0f}k ex/s)", flush=True)
            del trainer
    print("---- medians over rounds ----")
    for v, rs in results.items():
        if not rs:
            continue
        h = sorted(x[0] for x in rs)[len(rs) // 2]
        d = sorted(x[1] for x in rs)[len(rs) // 2]
        e = sorted(x[2] for x in rs)[len(rs) // 2]
        print(f"{v}: host={h:.2f} dev={d:.2f} e2e={e:.2f} ms/step "
              f"({8192 / e * 1e3 / 1e3:.0f}k ex/s)")


if __name__ == "__main__":
    main()
