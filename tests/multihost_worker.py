"""Worker binary for the multi-host training test (ref
cpu_training_distributed_test_binary.py): one JAX process per invocation,
gloo CPU collectives, MultiHostTrainer over the global mesh."""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 20

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    import numpy as np
    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.multihost import MultiHostTrainer
    from monolith_tpu.training.trainer import TrainerConfig

    task = DeepFMTask(embedding_dim=8, capacity_per_shard=4096, hidden=(16, 8))
    cfg = TrainerConfig(engine=EngineConfig(num_shards=nproc, unique_cap=512,
                                            new_cap=512, bucket_cap=256),
                        log_every=0, metrics_enabled=False)
    trainer = MultiHostTrainer(task, cfg)

    # ONE logical stream sharded across processes: all processes share the
    # generator (same ground truth); each consumes its own interleaved slice
    data = SyntheticCTR(num_users=100, num_items=60, batch_size=64, seed=1000)
    it = iter(data)
    losses = []
    for i in range(steps):
        batches = [next(it) for _ in range(nproc)]
        fb, b = batches[pid]
        out = trainer.train_step(fb, b, ts=i)
        losses.append(float(np.asarray(out["loss"])))
    sizes = {t: [s.size() for s in stores]
             for t, stores in trainer.engine.stores.items()}
    print(f"RESULT {pid} first={np.mean(losses[:5]):.5f} "
          f"last={np.mean(losses[-5:]):.5f} "
          f"local_store_sizes={sizes['sparse']}", flush=True)


if __name__ == "__main__":
    main()
