"""Serving-path throughput/latency bench (ref: the reference serves through
TensorFlow Serving babysat by agent_service; its perf surface is TFS's —
here the agent IS the model server, serving/agent.py, so its throughput is
ours to track).

Measures, on an exported DeepFM model:
  1. in-process predict (model.predict)  — device + host glue, no RPC
  2. gRPC predict via ServingClient      — the full request path
  3. gRPC predict, C concurrent clients  — agent thread-pool scaling
Emits one JSON object (BENCH-style) for round-over-round diffing.

Usage: python tools/serving_bench.py [--cpu] [batch_size]
"""

import json
import os
import sys
import time
from concurrent import futures

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np

from monolith_tpu.data.synthetic import SyntheticCTR
from monolith_tpu.embedding.engine import EngineConfig
from monolith_tpu.models.deepfm import DeepFMTask
from monolith_tpu.serving import (ServingAgent, ServingClient, ServingModel,
                                  export_model)
from monolith_tpu.training.trainer import Trainer, TrainerConfig

RESULTS = {}


def record(name, value, unit):
    RESULTS[name] = {"value": round(value, 1), "unit": unit}
    print(f"{name}: {value:,.1f} {unit}", flush=True)


def main(batch_size=512):
    import tempfile
    task = DeepFMTask(embedding_dim=16, capacity_per_shard=1 << 18,
                      hidden=(128, 64))
    trainer = Trainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=1, unique_cap=8192, new_cap=8192),
        log_every=0))
    data = SyntheticCTR(num_users=100_000, num_items=20_000,
                        batch_size=batch_size, seed=9)
    it = iter(data)
    for _ in range(20):
        fb, b = next(it)
        trainer.train_step(fb, b)
    out_dir = tempfile.mkdtemp(prefix="mt_serving_bench_")
    path = export_model(trainer, out_dir)
    model = ServingModel(task, path)

    reqs = [next(it) for _ in range(8)]

    # 1. in-process predict
    preds = model.predict(*reqs[0])
    np.asarray(preds)
    iters = 50
    t0 = time.perf_counter()
    for i in range(iters):
        fb, b = reqs[i % len(reqs)]
        preds = model.predict(fb, b)
    np.asarray(preds)
    dt = (time.perf_counter() - t0) / iters
    record("predict_inproc_examples_per_sec", batch_size / dt, "ex/s")
    record("predict_inproc_ms", dt * 1e3, "ms")

    # 2. single-client gRPC
    agent = ServingAgent(model, port=0)
    addr = agent.start()
    client = ServingClient(addr)
    client.predict(*reqs[0])
    t0 = time.perf_counter()
    for i in range(iters):
        fb, b = reqs[i % len(reqs)]
        client.predict(fb, b)
    dt = (time.perf_counter() - t0) / iters
    record("predict_rpc_examples_per_sec", batch_size / dt, "ex/s")
    record("predict_rpc_ms", dt * 1e3, "ms")

    # 3. concurrent clients
    C = 4
    per_client = 16
    clients = [ServingClient(addr) for _ in range(C)]

    def worker(c):
        for i in range(per_client):
            fb, b = reqs[i % len(reqs)]
            c.predict(fb, b)

    t0 = time.perf_counter()
    with futures.ThreadPoolExecutor(C) as ex:
        list(ex.map(worker, clients))
    dt = time.perf_counter() - t0
    total = C * per_client * batch_size
    record(f"predict_rpc_{C}clients_examples_per_sec", total / dt, "ex/s")

    # 4. hot-swap latency (VERDICT r4 #7): train on, export v2, measure
    # reload_export wall time (the version watcher's swap step — the
    # window in which the replica serves the old version; requests are
    # never dropped, the swap is an atomic model-state replace)
    for _ in range(5):
        fb, b = next(it)
        trainer.train_step(fb, b)
    path2 = export_model(trainer, out_dir)
    t0 = time.perf_counter()
    new_step = model.reload_export(path2)
    dt = time.perf_counter() - t0
    record("hot_swap_ms", dt * 1e3, "ms")
    # the swapped model serves immediately
    preds2 = np.asarray(client.predict(*reqs[0]))
    assert preds2.shape[0] == batch_size and np.isfinite(preds2).all(), \
        (new_step, preds2.shape)

    agent.stop()
    print(json.dumps({"backend": jax.default_backend(),
                      "batch_size": batch_size, **RESULTS}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
