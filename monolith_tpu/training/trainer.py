"""Single-host trainer: the `local_train` equivalent.

TPU-native rebuild of the reference's orchestration layer (CpuTraining
cpu_training.py:587, local_train :2420). The per-step pipeline is:

  host:   parse batch -> EmbeddingEngine.prepare_batch (C++ dedup/shard/map)
  device: ONE jitted program = admit new rows -> lookup unique -> pool ->
          dense fwd/bwd -> dense optax update (+ global-norm clip,
          ref feature_utils.py:120) -> per-row sparse optimize

Asynchrony: while the device executes step N (JAX dispatch is async), the
host prepares step N+1 — the TPU analogue of the reference's prefetch-queue
software pipeline (prefetch_queue.py:291).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from monolith_tpu.embedding.engine import EmbeddingEngine, EngineConfig
from monolith_tpu.metrics import StreamingAUC, StreamingMean
from monolith_tpu.ops.clip import clip_by_global_norm
from monolith_tpu.training.task import RecTask


@dataclasses.dataclass
class TrainerConfig:
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)
    clip_norm: float = 0.0          # 0 = no dense grad clipping
    seed: int = 0
    log_every: int = 100
    metrics_enabled: bool = True
    metrics_every: int = 20  # steps between metric syncs (each sync blocks)


class Trainer:
    """Owns engine host state, dense params/opt state, and the jitted step."""

    def __init__(self, task: RecTask, config: TrainerConfig = TrainerConfig()):
        self.task = task
        self.config = config
        self.engine = EmbeddingEngine(task.tables(), task.features(),
                                      config.engine, seed=config.seed)
        self.module = task.build_module()
        self.tx = task.dense_optimizer()
        self.table_states = self.engine.create_states()
        self.params = None
        self.model_state = {}  # non-param flax collections (batch_stats, ...)
        self.opt_state = None
        self.step = 0
        self._jit_step = None
        self._jit_eval = None
        self.auc = StreamingAUC()
        self.loss_mean = StreamingMean()
        self._base_key = None
        self._pending_metrics = []

    # ------------------------------------------------------------------

    def _maybe_init(self, inputs, batch):
        if self.params is not None:
            return
        key = jax.random.PRNGKey(self.config.seed)
        pooled, _ = self.engine.embed(self.table_states, inputs)
        variables = self.module.init(key, pooled, batch, training=True)
        variables = dict(variables)
        self.params = variables.pop("params")
        self.model_state = variables  # e.g. {"batch_stats": ...}
        self.opt_state = self.tx.init(self.params)

    def _apply(self, params, model_state, pooled, batch, training):
        """module.apply threading non-param collections (BatchNorm etc.).
        Returns (outputs, new_model_state)."""
        variables = {"params": params, **model_state}
        if model_state and training:
            return self.module.apply(variables, pooled, batch, training=True,
                                     mutable=list(model_state))
        out = self.module.apply(variables, pooled, batch, training=training)
        return out, model_state

    def _build_step(self):
        engine, module, task, cfg = self.engine, self.module, self.task, self.config

        def step_fn(table_states, params, model_state, opt_state, inputs,
                    batch, base_key, stepno):
            if "__wire__" in inputs:
                bsz = jax.tree.leaves(batch)[0].shape[0]
                inputs = engine.decode_wire(inputs["__wire__"], bsz)
            key = jax.random.fold_in(base_key, stepno)
            if engine.packed:
                # fused path (PERF.md): one gather per table; new-row init is
                # a select over the gathered rows, not a scatter
                prows, unique = engine.fused_lookup(table_states, inputs,
                                                    base_key, stepno)
            else:
                table_states = engine.admit_rows(table_states, inputs, key)
                unique = engine.lookup_unique(table_states, inputs)

            def loss_fn(params, unique):
                retrieved = engine.retrieve_unique(unique, stepno)
                pooled = engine.pool_features(retrieved, inputs)
                out, new_ms = self._apply(params, model_state, pooled, batch,
                                          training=True)
                loss, aux = task.loss(out, batch)
                return loss, (out, aux, new_ms)

            (loss, (out, aux, new_ms)), (gp, gu) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, unique)
            if cfg.clip_norm > 0:
                gp, _ = clip_by_global_norm(gp, cfg.clip_norm)
            updates, opt_state = self.tx.update(gp, opt_state, params)
            params = optax.apply_updates(params, updates)
            if engine.packed:
                # one scatter per table: init'd + optimized rows together
                table_states = engine.fused_apply(table_states, inputs, prows,
                                                  gu, stepno)
            else:
                table_states = engine.apply_gradients(table_states, inputs,
                                                      gu, stepno)
            preds = task.predictions(out)
            return table_states, params, new_ms, opt_state, loss, preds, aux

        return jax.jit(step_fn, donate_argnums=(0, 1, 2, 3))

    def _build_eval(self):
        engine, module, task = self.engine, self.module, self.task

        def eval_fn(table_states, params, model_state, inputs, batch, stepno):
            if "__wire__" in inputs:
                bsz = jax.tree.leaves(batch)[0].shape[0]
                inputs = engine.decode_wire(inputs["__wire__"], bsz)
            pooled, _ = engine.embed(table_states, inputs, step=stepno)
            out, _ = self._apply(params, model_state, pooled, batch,
                                 training=False)
            loss, aux = task.loss(out, batch)
            return loss, task.predictions(out), aux

        return jax.jit(eval_fn)

    # ------------------------------------------------------------------

    def train_step(self, fid_batch: Dict[str, np.ndarray],
                   batch: Dict[str, np.ndarray],
                   ts: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Run one training step. fid_batch: {feature: int64 [B, L] pad -1};
        batch: dense-side arrays incl. "label"."""
        ts = int(time.time()) if ts is None else ts
        if self.engine.fuse_wire and self.params is not None:
            # fused C++ prepare writes the wire buffer directly (PERF.md)
            wire, stats = self.engine.prepare_wire(fid_batch, ts=ts)
            inputs = {"__wire__": wire}
        else:
            inputs, stats = self.engine.prepare_batch(fid_batch, ts=ts)
            self._maybe_init(inputs, batch)
            if self.engine.fuse_wire:
                inputs = {"__wire__": self.engine.pack_wire(inputs)}
        if self._jit_step is None:
            self._jit_step = self._build_step()
        if self._base_key is None:
            self._base_key = jax.random.PRNGKey(self.config.seed)
        # exactly ONE device dispatch per step: the key fold happens inside
        # the jitted program, batch/inputs are numpy (transferred as call
        # args), and metric syncs are deferred — small host-side ops each
        # cost a full dispatch round trip on remote-attached TPUs.
        (self.table_states, self.params, self.model_state, self.opt_state,
         loss, preds, aux
         ) = self._jit_step(self.table_states, self.params, self.model_state,
                            self.opt_state, inputs, batch, self._base_key,
                            np.int32(self.step))
        self.step += 1
        if self.config.metrics_enabled and "label" in batch:
            self._pending_metrics.append((loss, preds, batch["label"]))
            if len(self._pending_metrics) >= self.config.metrics_every:
                self._drain_metrics()
        return {"loss": loss, "preds": preds, "stats": stats, "aux": aux}

    def spill_expired(self, expire_before: int) -> Dict[str, int]:
        """Two-tier eviction: read expiring rows' full state from the device
        pools into the host archive, then free the HBM rows (engine must be
        configured with tiered=True). Returns spilled counts per table."""
        if not self.config.engine.tiered:
            raise ValueError("spill_expired requires EngineConfig(tiered=True)")
        from monolith_tpu.embedding.tiered import pack_rows
        out = {}
        for tname, spec in self.engine.tables.items():
            state = jax.device_get(self.table_states[tname])
            n = 0
            for s, store in enumerate(self.engine.stores[tname]):
                rows, fids = store.evict_expired(expire_before, return_fids=True)
                if len(rows) == 0:
                    continue
                shard_state = jax.tree.map(lambda x: x[s], state)
                values = pack_rows(spec, shard_state, rows)
                n += self.engine.archives[tname][s].spill(fids, values,
                                                          ts=expire_before)
            out[tname] = n
        return out

    def _drain_metrics(self):
        for loss, preds, labels in self._pending_metrics:
            self.auc.update(np.asarray(preds), labels)
            self.loss_mean.update(float(loss))
        self._pending_metrics = []

    def evaluate(self, data: Iterator, max_steps: Optional[int] = None) -> Dict[str, float]:
        """data yields (fid_batch, batch). Returns {"auc":…, "loss":…}."""
        if self._jit_eval is None:
            self._jit_eval = self._build_eval()
        auc, loss_mean = StreamingAUC(), StreamingMean()
        for i, (fid_batch, batch) in enumerate(data):
            if max_steps is not None and i >= max_steps:
                break
            if self.engine.fuse_wire and self.params is not None:
                wire, _ = self.engine.prepare_wire(fid_batch, ts=0)
                inputs = {"__wire__": wire}
            else:
                inputs, _ = self.engine.prepare_batch(fid_batch, ts=0)
                self._maybe_init(inputs, batch)
                if self.engine.fuse_wire:
                    inputs = {"__wire__": self.engine.pack_wire(inputs)}
            batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
            loss, preds, _ = self._jit_eval(self.table_states, self.params,
                                            self.model_state, inputs, batch_j,
                                            np.int32(self.step))
            auc.update(np.asarray(preds), batch["label"])
            loss_mean.update(float(loss))
        return {"auc": auc.result(), "loss": loss_mean.result()}

    def train(self, data: Iterator, steps: Optional[int] = None,
              hooks=()) -> Dict[str, float]:
        """Run the training loop over `data` (yields (fid_batch, batch))."""
        t0 = time.time()
        examples = 0
        for i, (fid_batch, batch) in enumerate(data):
            if steps is not None and i >= steps:
                break
            out = self.train_step(fid_batch, batch)
            examples += len(next(iter(batch.values())))
            stop = False
            for h in hooks:
                try:
                    h(self, out)
                except StopIteration:
                    stop = True  # hook requested a clean exit (e.g. TideHook)
            if stop:
                break
            if self.config.log_every and (self.step % self.config.log_every == 0):
                self._drain_metrics()
                dt = time.time() - t0
                print(f"step {self.step}: loss={self.loss_mean.result():.4f} "
                      f"auc={self.auc.result():.4f} "
                      f"ex/s={examples / max(dt, 1e-9):.0f}")
        self._drain_metrics()
        return {"auc": self.auc.result(), "loss": self.loss_mean.result(),
                "examples_per_sec": examples / max(time.time() - t0, 1e-9)}
