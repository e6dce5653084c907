"""Device-trace the multislot train step (merged path) and print the
per-op cost table from the trace — the ground truth for where the
device 29.5 ms/step goes.

Usage: python tools/profile_multislot.py [trace_dir]
Env: MT_PALLAS_SCATTER, MT_MERGE=0/1, MT_CAP_LOG2 (default 18).
"""

import glob
import gzip
import json
import os
import sys
import time

import jax
import numpy as np


def build():
    from monolith_tpu.data.synthetic import SyntheticMultiSlot
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.multislot import MultiSlotTask
    from monolith_tpu.training.trainer import Trainer, TrainerConfig

    cap = 1 << int(os.environ.get("MT_CAP_LOG2", "18"))
    merge = os.environ.get("MT_MERGE", "1") == "1"
    task = MultiSlotTask(num_tables=16, num_slots=40, embedding_dim=16,
                         capacity_per_shard=cap, history_length=20,
                         hidden=(256, 128, 64), merge=merge)
    trainer = Trainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=1, unique_cap=49152, new_cap=49152),
        log_every=0, metrics_enabled=False))
    data = SyntheticMultiSlot(num_slots=40, vocab_per_slot=100_000,
                              history_length=20, batch_size=8192, seed=0)
    return trainer, data


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mt_trace"
    trainer, data = build()
    it = iter(data)
    for _ in range(8):
        fb, b = next(it)
        out = trainer.train_step(fb, b)
    jax.block_until_ready(out["loss"])
    batches = [next(it) for _ in range(8)]
    out = trainer.train_step_block(batches)  # compile block program
    jax.block_until_ready(out["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = trainer.train_step_block(batches)
        jax.block_until_ready(out["loss"])

    # find the trace and aggregate device-op durations
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep only TPU-device lanes (pid names containing 'TPU' / 'device')
    pid_names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "evice" in n or "XLA" in n}
    agg = {}
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e["name"]
        a = agg.setdefault(name, [0, 0.0])
        a[0] += 1
        a[1] += e["dur"] / 1e3  # us -> ms
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]
    total = sum(v[1] for _, v in rows)
    print(f"{'op':<60} {'count':>6} {'total_ms':>9}")
    for name, (cnt, ms) in rows:
        print(f"{name[:60]:<60} {cnt:>6} {ms:>9.3f}")
    print(f"(top-40 total {total:.1f} ms over 3 blocks of 8 steps -> "
          f"{total / 24:.2f} ms/step)")


if __name__ == "__main__":
    main()
