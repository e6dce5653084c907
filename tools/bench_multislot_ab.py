"""A/B: multislot bench config, merged (one physical table, one
gather/scatter per step) vs unmerged (17 tables), same process so tunnel
variance cancels. Also A/Bs MT_PALLAS_SCATTER on the merged pool.

Usage: python tools/bench_multislot_ab.py [merged|unmerged|both]
"""

import os
import sys
import time

import jax


def build(merge: bool):
    from monolith_tpu.data.synthetic import SyntheticMultiSlot
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.multislot import MultiSlotTask
    from monolith_tpu.training.trainer import Trainer, TrainerConfig

    batch_size = 8192
    task = MultiSlotTask(num_tables=16, num_slots=40, embedding_dim=16,
                         capacity_per_shard=1 << 18, history_length=20,
                         hidden=(256, 128, 64), merge=merge)
    if merge:
        # measured: ~39k merged uniques/step (40 zipf slots + history)
        eng = EngineConfig(num_shards=1, unique_cap=49152, new_cap=49152)
    else:
        eng = EngineConfig(num_shards=1, unique_cap=6144, new_cap=6144,
                           unique_caps=(("table_hist", 16384),),
                           new_caps=(("table_hist", 16384),))
    trainer = Trainer(task, TrainerConfig(engine=eng, log_every=0,
                                          metrics_enabled=False))
    data = SyntheticMultiSlot(num_slots=40, vocab_per_slot=100_000,
                              history_length=20, batch_size=batch_size,
                              seed=0)
    return trainer, data, batch_size


def run(trainer, data, batch_size, tag, n_runs=6, steps_per_run=96, K=8):
    it = iter(data)
    for _ in range(8):
        fb, b = next(it)
        out = trainer.train_step(fb, b)
    jax.block_until_ready(out["loss"])
    batches = [next(it) for _ in range(16)]
    out = trainer.train_step_block(batches[:K])
    jax.block_until_ready(out["loss"])
    rates = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        for blk in range(steps_per_run // K):
            s = (blk * K) % len(batches)
            out = trainer.train_step_block(batches[s:s + K])
        jax.block_until_ready(out["loss"])
        rates.append(steps_per_run * batch_size / (time.perf_counter() - t0))
    print(f"{tag}: best {max(rates):,.0f} ex/s  "
          f"median {sorted(rates)[len(rates)//2]:,.0f}  "
          f"all {[f'{r/1e3:.0f}k' for r in rates]}", flush=True)
    return max(rates)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    if mode in ("unmerged", "both"):
        os.environ["MT_PALLAS_SCATTER"] = "0"
        tr, d, bs = build(merge=False)
        run(tr, d, bs, "unmerged xla-scatter")
        del tr
    if mode in ("merged", "both"):
        for pallas in ("0", "1"):
            os.environ["MT_PALLAS_SCATTER"] = pallas
            tr, d, bs = build(merge=True)
            run(tr, d, bs, f"merged pallas={pallas}")
            del tr
