"""Training hooks.

TPU-native rebuild of the reference hook set (metric/metric_hook.py:44
ThroughputMetricHook, :143 Tf2ProfilerHook; deep-insight emission
native_model.py:619-655; machine_info logging_ops.py:31 + MachineInfoHook).
Hooks are callables `hook(trainer, step_output)` invoked by Trainer.train
after every step."""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from monolith_tpu.utils.deep_insight import DeepInsightClient
from monolith_tpu.utils.metrics_client import MetricClient, get_metric_client


class ThroughputHook:
    """Emits examples/sec and step latency (ref ThroughputMetricHook)."""

    def __init__(self, every: int = 100, client: Optional[MetricClient] = None):
        self.every = every
        self.client = client or get_metric_client()
        self._t0 = None
        self._examples = 0

    def __call__(self, trainer, out):
        bsz = len(np.asarray(out["preds"]))
        self._examples += bsz
        if self._t0 is None:
            self._t0 = time.perf_counter()
            self._examples = 0
            return
        if trainer.step % self.every == 0:
            dt = time.perf_counter() - self._t0
            eps = self._examples / max(dt, 1e-9)
            self.client.emit_store("throughput.examples_per_sec", eps)
            self.client.emit_store("throughput.steps_per_sec",
                                   self.every / max(dt, 1e-9))
            self._t0 = time.perf_counter()
            self._examples = 0


class ProfilerHook:
    """jax.profiler trace over a step window (ref Tf2ProfilerHook:143 —
    profile_some_steps_from)."""

    def __init__(self, logdir: str, start_step: int, end_step: int):
        self.logdir = logdir
        self.start_step = start_step
        self.end_step = end_step
        self._active = False

    def __call__(self, trainer, out):
        import jax
        if not self._active and trainer.step >= self.start_step \
                and trainer.step < self.end_step:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._active and trainer.step >= self.end_step:
            jax.profiler.stop_trace()
            self._active = False


class DeepInsightHook:
    """Per-example quality emission (ref deep_insight_ops.py:43)."""

    def __init__(self, client: DeepInsightClient):
        self.client = client

    def __call__(self, trainer, out):
        labels = out.get("labels")
        if labels is None:
            return
        self.client.emit(labels, np.asarray(out["preds"]))


class CheckpointHook:
    """Periodic checkpoints (ref NoFirstSaveCheckpointSaverHook
    save_utils.py:248 — also skips the step-0 save)."""

    def __init__(self, directory: str, every_steps: int,
                 evict_before_save: bool = False):
        self.directory = directory
        self.every = every_steps
        self.evict = evict_before_save

    def __call__(self, trainer, out):
        from monolith_tpu.training import checkpoint
        if trainer.step > 0 and trainer.step % self.every == 0:
            checkpoint.save(trainer, self.directory,
                            evict_before_save=self.evict)


def machine_info() -> dict:
    """Host health snapshot (ref logging_ops.cc machine_info)."""
    info = {"ts": time.time()}
    try:
        load1, load5, load15 = os.getloadavg()
        info.update(load1=load1, load5=load5, load15=load15)
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            mem = {}
            for line in f:
                k, _, rest = line.partition(":")
                mem[k] = int(rest.strip().split()[0])
        info["mem_total_kb"] = mem.get("MemTotal", 0)
        info["mem_available_kb"] = mem.get("MemAvailable", 0)
    except (OSError, ValueError):
        pass
    return info


class MachineInfoHook:
    """Emits host health to metrics (ref hooks/ps_check_hooks.py)."""

    def __init__(self, every: int = 500, client: Optional[MetricClient] = None):
        self.every = every
        self.client = client or get_metric_client()

    def __call__(self, trainer, out):
        if trainer.step % self.every == 0:
            info = machine_info()
            for k in ("load1", "mem_available_kb"):
                if k in info:
                    self.client.emit_store(f"machine.{k}", info[k])
