"""Estimator facade.

TPU-native rebuild of ref estimator.py:250 Estimator — the high-level
train / evaluate / predict / export_saved_model entry points over a task,
plus RunnerConfig (ref runner_utils.py:148) collapsed to the knobs that
matter here. Wraps Trainer / ShardedTrainer / StreamingTrainer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

from monolith_tpu.embedding.engine import EngineConfig
from monolith_tpu.training import checkpoint as ckpt_lib
from monolith_tpu.training.task import RecTask
from monolith_tpu.training.trainer import Trainer, TrainerConfig


@dataclasses.dataclass
class RunnerConfig:
    """ref runner_utils.py:148 RunnerConfig (subset that applies)."""
    model_dir: str = ""
    num_shards: int = 1            # table shards == devices in sharded mode
    unique_cap: int = 8192
    new_cap: int = 8192
    clip_norm: float = 0.0
    seed: int = 0
    log_every: int = 100
    save_checkpoints_steps: int = 0
    enable_realtime_training: bool = False
    record_touch: bool = False
    # K steps per device dispatch (lax.scan over stacked step wires);
    # bit-identical to sequential steps — the TPU-native software pipeline
    # (ref enable_pipelined_fwda2a/bwda2a, cpu_training.py:471-489)
    steps_per_dispatch: int = 1


class Estimator:
    def __init__(self, task: RecTask, config: RunnerConfig = RunnerConfig()):
        self.task = task
        self.config = config
        tc = TrainerConfig(
            engine=EngineConfig(num_shards=config.num_shards,
                                unique_cap=config.unique_cap,
                                new_cap=config.new_cap,
                                record_touch=(config.record_touch
                                              or config.enable_realtime_training)),
            clip_norm=config.clip_norm, seed=config.seed,
            log_every=config.log_every,
            steps_per_dispatch=config.steps_per_dispatch)
        # trainer factory (ref distributed_ps_factory.py role): multi-process
        # runs get the 3-a2a MultiHostTrainer, single-process multi-device
        # the shard_map ShardedTrainer, else the single-chip Trainer
        import jax
        if jax.process_count() > 1:
            import dataclasses as _dc
            from monolith_tpu.parallel.multihost import MultiHostTrainer
            n = len(jax.devices())
            if tc.engine.num_shards != n:  # shards == global devices
                tc = _dc.replace(tc, engine=_dc.replace(tc.engine,
                                                        num_shards=n))
            self.trainer = MultiHostTrainer(task, tc)
        elif config.num_shards > 1:
            from monolith_tpu.parallel import ShardedTrainer, make_mesh
            self.trainer = ShardedTrainer(task, tc, make_mesh(config.num_shards))
        else:
            self.trainer = Trainer(task, tc)
        if config.model_dir and ckpt_lib.latest_step(config.model_dir) is not None:
            self._restore_pending = True
        else:
            self._restore_pending = False

    def _maybe_restore(self, fid_batch, batch):
        if not self._restore_pending:
            return
        if hasattr(self.trainer, "_prepare_local"):  # MultiHostTrainer
            inputs, _ = self.trainer._prepare_local(fid_batch)
            ginputs = self.trainer._lift_inputs(inputs)
            self.trainer._input_template = ginputs
            self.trainer._maybe_init_global(ginputs, batch)
        else:
            inputs, _ = self.trainer.engine.prepare_batch(fid_batch, ts=0)
            self.trainer._maybe_init(inputs, batch)
        ckpt_lib.restore(self.trainer, self.config.model_dir)
        self._restore_pending = False

    def train(self, data: Iterable, steps: Optional[int] = None,
              hooks: Sequence = ()) -> Dict[str, float]:
        hooks = list(hooks)
        if self.config.model_dir and self.config.save_checkpoints_steps:
            from monolith_tpu.training.hooks import CheckpointHook
            hooks.append(CheckpointHook(self.config.model_dir,
                                        self.config.save_checkpoints_steps))
        it = iter(data)
        first = next(it)
        self._maybe_restore(*first)

        def chain():
            yield first
            yield from it

        result = self.trainer.train(chain(), steps=steps, hooks=hooks)
        if self.config.model_dir:
            ckpt_lib.save(self.trainer, self.config.model_dir)
        return result

    def evaluate(self, data: Iterable, steps: Optional[int] = None) -> Dict[str, float]:
        it = iter(data)
        first = next(it)
        self._maybe_restore(*first)

        def chain():
            yield first
            yield from it

        return self.trainer.evaluate(chain(), max_steps=steps)

    def predict(self, data: Iterable, steps: Optional[int] = None):
        """Yields prediction arrays per batch."""
        import jax.numpy as jnp
        for i, (fid_batch, batch) in enumerate(data):
            if steps is not None and i >= steps:
                return
            self._maybe_restore(fid_batch, batch)
            inputs, _ = self.trainer.engine.prepare_batch(fid_batch, ts=0)
            self.trainer._input_template = inputs
            self.trainer._maybe_init(inputs, batch)
            if self.trainer._jit_eval is None:
                self.trainer._jit_eval = self.trainer._build_eval()
            _, preds, _ = self.trainer._jit_eval(
                self.trainer.table_states, self.trainer.params,
                self.trainer.model_state, inputs,
                {k: jnp.asarray(v) for k, v in batch.items()},
                np.int32(self.trainer.step))
            yield np.asarray(preds)

    def export_saved_model(self, export_dir: str) -> str:
        from monolith_tpu.serving.export import export_model
        return export_model(self.trainer, export_dir)
