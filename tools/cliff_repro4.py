"""Reproduce the multislot Pallas cliff with the real trainer, same-process
A/B: pallas kernels ON vs OFF at growing capacity.

Usage: python tools/cliff_repro4.py [cap_log2 ...]
"""

import os
import sys
import time

import jax
import numpy as np


def build(cap_l2, pallas):
    os.environ["MT_PALLAS_SCATTER"] = "1" if pallas else "0"
    from monolith_tpu.data.synthetic import SyntheticMultiSlot
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.multislot import MultiSlotTask
    from monolith_tpu.training.trainer import Trainer, TrainerConfig

    task = MultiSlotTask(num_tables=16, num_slots=40, embedding_dim=16,
                         capacity_per_shard=1 << cap_l2, history_length=20,
                         hidden=(256, 128, 64))
    trainer = Trainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=1, unique_cap=6144, new_cap=6144,
                            unique_caps=(("table_hist", 16384),),
                            new_caps=(("table_hist", 16384),)),
        log_every=0, metrics_enabled=False))
    data = SyntheticMultiSlot(num_slots=40, vocab_per_slot=100_000,
                              history_length=20, batch_size=8192, seed=0)
    it = iter(data)
    for _ in range(4):
        fb, b = next(it)
        out = trainer.train_step(fb, b)
    jax.block_until_ready(out["loss"])
    batches = [next(it) for _ in range(16)]
    return trainer, batches


def run(trainer, batches, K=8, n_blocks=6):
    out = trainer.train_step_block(batches[:K])
    jax.block_until_ready(out["loss"])
    t0 = time.perf_counter()
    for i in range(n_blocks):
        s = (i * K) % len(batches)
        out = trainer.train_step_block(batches[s:s + K])
    jax.block_until_ready(out["loss"])
    return (time.perf_counter() - t0) / (n_blocks * K) * 1e3


def main():
    caps = [int(x) for x in sys.argv[1:]] or [16, 17, 18]
    for cap_l2 in caps:
        res = {}
        for pallas in (True, False):
            trainer, batches = build(cap_l2, pallas)
            res[pallas] = run(trainer, batches)
            del trainer, batches
        gb = 17 * (1 << cap_l2) * 128 * 4 / (1 << 30)
        print(f"cap=2^{cap_l2} state={gb:.2f}GB: pallas {res[True]:7.2f} "
              f"ms/step  xla {res[False]:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
