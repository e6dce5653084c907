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
from monolith_tpu.metrics import (StreamingAUC, StreamingMean,
                                  device_metrics_init, device_metrics_update)
from monolith_tpu.ops.clip import clip_by_global_norm
from monolith_tpu.training.task import RecTask


@dataclasses.dataclass
class TrainerConfig:
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)
    clip_norm: float = 0.0          # 0 = no dense grad clipping
    seed: int = 0
    log_every: int = 100
    # Loss/AUC accumulate ON DEVICE inside the jitted step (tiny histogram
    # pytree in the carry); the host reads them back only at log prints /
    # end of train, so enabling metrics costs no per-step readback — on
    # tunnel-attached chips the first device->host readback permanently
    # degrades dispatch ~3.5x (PERF.md readback cliff).
    metrics_enabled: bool = True
    # >1: scan this many steps per device dispatch (train_step_block) —
    # amortizes the fixed dispatch/transfer cost on tunnel/PCIe-attached
    # chips; bit-identical to sequential steps. Requires the fuse_wire path.
    steps_per_dispatch: int = 1


class Trainer:
    """Owns engine host state, dense params/opt state, and the jitted step."""

    def __init__(self, task: RecTask, config: TrainerConfig = TrainerConfig()):
        self.task = task
        self.config = config
        self.engine = EmbeddingEngine(task.tables(), task.features(),
                                      config.engine, seed=config.seed)
        self.module = task.build_module()
        self.tx = task.dense_optimizer()
        self.table_states = self._create_table_states()
        self.params = None
        self.model_state = {}  # non-param flax collections (batch_stats, ...)
        self.opt_state = None
        self.step = 0
        self._jit_step = None
        self._jit_eval = None
        self._jit_step_full = None
        self._full_layout = None
        self._jit_step_block = None
        self._block_key = None
        self._jit_eval_full = None
        self._full_eval_layout = None
        self.auc = StreamingAUC()
        self.loss_mean = StreamingMean()
        self._base_key = None
        # on-device metric accumulator (see TrainerConfig.metrics_enabled);
        # None when metrics are off
        self._dev_metrics = None

    def _metrics_init(self):
        if self.config.metrics_enabled and self._dev_metrics is None:
            self._dev_metrics = device_metrics_init(self.auc.num_thresholds)

    def _metrics_step(self, metrics, loss, preds, batch):
        """In-jit metric accumulation; static no-op when metrics are off
        (metrics is None). Skips AUC when the task has no scalar preds."""
        if metrics is None:
            return None
        label = batch.get("label") if hasattr(batch, "get") else None
        if label is not None and not isinstance(preds, dict):
            return device_metrics_update(metrics, loss, preds, label)
        return device_metrics_update(metrics, loss)

    # ------------------------------------------------------------------

    def _create_table_states(self):
        """Allocate device table state; multi-process trainers override to
        build globally-sharded arrays without materializing remote shards."""
        return self.engine.create_states()

    def _maybe_init(self, inputs, batch):
        if self.params is not None:
            return
        key = jax.random.PRNGKey(self.config.seed)

        # ONE jitted program for the whole init: with table_states sharded
        # over N devices, running this eagerly compiles a separate tiny
        # multi-device program (with collectives) per op — on an
        # oversubscribed host a half-joined collective rendezvous can then
        # time out against the next op's compile and abort the process.
        def init_fn(table_states, inputs, batch):
            pooled, _ = self.engine.embed(table_states, inputs)
            return self.module.init(key, pooled, batch, training=True)

        variables = jax.jit(init_fn)(self.table_states, inputs, batch)
        variables = dict(variables)
        # a purely-sparse model (all signal through embeddings) has no dense
        # params; optax handles an empty tree fine
        self.params = variables.pop("params", {})
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

    def _step_core(self):
        """The jittable train-step body, shared by the multi-array and
        full-wire entry points."""
        engine, task, cfg = self.engine, self.task, self.config

        def core(table_states, params, model_state, opt_state, inputs,
                 batch, base_key, stepno):
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

        return core

    def _build_step(self):
        engine = self.engine
        core = self._step_core()

        def step_fn(table_states, params, model_state, opt_state, metrics,
                    inputs, batch, base_key, stepno):
            if "__wire__" in inputs:
                bsz = jax.tree.leaves(batch)[0].shape[0]
                inputs = engine.decode_wire(inputs["__wire__"], bsz)
            ts_, p_, ms_, os_, loss, preds, aux = core(
                table_states, params, model_state, opt_state, inputs,
                batch, base_key, stepno)
            metrics = self._metrics_step(metrics, loss, preds, batch)
            return ts_, p_, ms_, os_, metrics, loss, preds, aux

        return jax.jit(step_fn, donate_argnums=(0, 1, 2, 3, 4))

    @staticmethod
    def _decode_full_wire(engine, wire, layout, engine_words):
        """Device-side split of the single-transfer step input: engine wire
        region, then each batch array's raw 4-byte words (bitcast), then the
        step number as the final word."""
        bsz = layout[0][2][0]
        inputs = engine.decode_wire(wire[:engine_words], bsz)
        off = engine_words
        batch = {}
        for k, dstr, shape in layout:
            n = int(np.prod(shape))
            chunk = wire[off:off + n]
            off += n
            dt = np.dtype(dstr)
            if dt != np.int32:
                chunk = jax.lax.bitcast_convert_type(chunk, dt)
            batch[k] = chunk.reshape(shape)
        stepno = wire[off]
        return inputs, batch, stepno

    def _build_step_full(self, layout, engine_words):
        """Single-transfer step: ALL per-step inputs (engine wire + batch
        arrays + step number) arrive as one int32 array — each separate
        host->device transfer costs ~1ms fixed on tunnel-attached chips."""
        engine = self.engine
        core = self._step_core()

        def step_fn(table_states, params, model_state, opt_state, metrics,
                    wire, base_key):
            inputs, batch, stepno = Trainer._decode_full_wire(
                engine, wire, layout, engine_words)
            ts_, p_, ms_, os_, loss, preds, aux = core(
                table_states, params, model_state, opt_state, inputs,
                batch, base_key, stepno)
            metrics = self._metrics_step(metrics, loss, preds, batch)
            return ts_, p_, ms_, os_, metrics, loss, preds, aux

        return jax.jit(step_fn, donate_argnums=(0, 1, 2, 3, 4))

    def _full_wire_words(self, layout):
        return (self.engine.wire_words(layout[0][2][0])
                + sum(int(np.prod(s)) for _, _, s in layout) + 1)

    def _pack_full_wire(self, fid_batch, batch, layout, ts, stepno,
                        out=None):
        """Host-side counterpart of _decode_full_wire: one int32 buffer."""
        ew = self.engine.wire_words(layout[0][2][0])
        total = ew + sum(int(np.prod(s)) for _, _, s in layout) + 1
        wire = np.empty(total, dtype=np.int32) if out is None else out
        _, stats = self.engine.prepare_wire(fid_batch, ts=ts, out=wire[:ew])
        off = ew
        for k, dstr, shape in layout:
            n = int(np.prod(shape))
            v = np.ascontiguousarray(batch[k])
            wire[off:off + n] = v.view(np.int32).ravel()
            off += n
        wire[off] = stepno
        return wire, stats

    def _build_step_block(self, layout, engine_words, K):
        """K training steps per device dispatch: the host packs K consecutive
        batches as stacked full wires [K, W]; the jitted program lax.scans
        the step core over them. Host id->row mapping never depends on device
        values, so the result is bit-identical to K sequential dispatches —
        only the fixed per-dispatch cost (significant on tunnel/PCIe-attached
        chips) is amortized K-fold. The TPU-native form of the reference's
        software pipelining (ref prefetch_queue.py:291,
        cpu_training.py:471-489 enable_pipelined_fwda2a/bwda2a)."""
        if self.config.engine.async_optimize and self.engine.packed:
            return self._build_step_block_async(layout, engine_words, K)
        engine = self.engine
        core = self._step_core()

        def block_fn(table_states, params, model_state, opt_state, metrics,
                     wires, base_key):
            def body(carry, wire):
                ts_, p_, ms_, os_, m_ = carry
                inputs, batch, stepno = Trainer._decode_full_wire(
                    engine, wire, layout, engine_words)
                ts_, p_, ms_, os_, loss, preds, aux = core(
                    ts_, p_, ms_, os_, inputs, batch, base_key, stepno)
                m_ = self._metrics_step(m_, loss, preds, batch)
                return (ts_, p_, ms_, os_, m_), (loss, preds, aux)
            carry = (table_states, params, model_state, opt_state, metrics)
            (ts_, p_, ms_, os_, metrics), (losses, preds, auxes) = \
                jax.lax.scan(body, carry, wires)
            return ts_, p_, ms_, os_, metrics, losses, preds, auxes

        return jax.jit(block_fn, donate_argnums=(0, 1, 2, 3, 4))

    def _build_step_block_async(self, layout, engine_words, K):
        """Block dispatch with 1-step-stale pipelined embeddings (ref
        enable_async_optimize, cpu_training.py:488). Schedule per scan
        iteration i:

          1. gather step i's rows        (STALE: step i-1's write-back has
                                          not landed — no data dependency,
                                          so XLA overlaps 2 with fwd/bwd)
          2. scatter step i-1's pending write-back
          3. forward/backward on the stale rows; dense update
          4. re-gather step i's rows     (fresh: includes step i-1's update)
          5. optimize the FRESH rows — updates are never lost; DC segments
             receive the stale rows to compensate the gradient
             (dc_optimizer.cc:30-44) — and defer the scatter to i+1

        The final pending scatter lands after the scan. Numerics differ
        from the synchronous block only for ids read in consecutive steps
        (their forward saw 1-step-stale values)."""
        import jax.numpy as jnp

        from monolith_tpu.embedding import table as table_lib
        engine, task, cfg = self.engine, self.task, self.config
        S, U = cfg.engine.num_shards, cfg.engine.unique_cap
        specs = engine.tables

        def zero_pending():
            return {t: (jnp.full((S, cfg.engine.ucap(t)), -1, jnp.int32),
                        jnp.zeros((S, cfg.engine.ucap(t),
                                   table_lib.packed_padded_width(sp)),
                                  jnp.float32))
                    for t, sp in specs.items() if engine.table_features[t]}

        def block_fn(table_states, params, model_state, opt_state, metrics,
                     wires, base_key):
            def body(carry, wire):
                ts_, p_, ms_, os_, m_, pending = carry
                inputs, batch, stepno = Trainer._decode_full_wire(
                    engine, wire, layout, engine_words)
                prows_stale, unique_stale = engine.fused_lookup(
                    ts_, inputs, base_key, stepno)
                ts_ = engine.scatter_rows(
                    ts_, {t: r for t, (r, _) in pending.items()},
                    {t: v for t, (_, v) in pending.items()}, stepno)

                def loss_fn(params, unique):
                    retrieved = engine.retrieve_unique(unique, stepno)
                    pooled = engine.pool_features(retrieved, inputs)
                    out, new_ms = self._apply(params, ms_, pooled, batch,
                                              training=True)
                    loss, aux = task.loss(out, batch)
                    return loss, (out, aux, new_ms)

                (loss, (out, aux, new_ms)), (gp, gu) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(p_, unique_stale)
                if cfg.clip_norm > 0:
                    gp, _ = clip_by_global_norm(gp, cfg.clip_norm)
                updates, os_ = self.tx.update(gp, os_, p_)
                p_ = optax.apply_updates(p_, updates)

                prows_latest, _ = engine.fused_lookup(ts_, inputs, base_key,
                                                      stepno)
                new_p = engine.optimize_rows(inputs, prows_latest, gu,
                                             stepno, prows_stale=prows_stale)
                pending = {t: (jnp.asarray(inputs[t]["rows"]), new_p[t])
                           for t in new_p}
                preds = task.predictions(out)
                m_ = self._metrics_step(m_, loss, preds, batch)
                return (ts_, p_, new_ms, os_, m_, pending), (loss, preds,
                                                             aux)

            carry = (table_states, params, model_state, opt_state, metrics,
                     zero_pending())
            (ts_, p_, ms_, os_, metrics, pending), (losses, preds, auxes) = \
                jax.lax.scan(body, carry, wires)
            # the last step's write-back lands after the scan
            ts_ = engine.scatter_rows(
                ts_, {t: r for t, (r, _) in pending.items()},
                {t: v for t, (_, v) in pending.items()}, jnp.int32(0))
            return ts_, p_, ms_, os_, metrics, losses, preds, auxes

        return jax.jit(block_fn, donate_argnums=(0, 1, 2, 3, 4))

    def _pack_block(self, pairs, ts: int):
        """Pack K consecutive batches into one stacked [K, W] wire buffer.
        Mutates the host store (admission, row assignment) exactly like K
        sequential packs; stepnos are self.step..self.step+K-1, so the
        result must be dispatched before any other step runs."""
        K = len(pairs)
        layout = self._batch_layout(pairs[0][1])
        assert layout is not None and self.engine.fuse_wire
        key = (layout, K)
        if self._block_key != key:
            ew = self.engine.wire_words(layout[0][2][0])
            self._jit_step_block = self._build_step_block(layout, ew, K)
            self._block_key = key
        W = self._full_wire_words(layout)
        wires = np.empty((K, W), dtype=np.int32)
        stats = []
        for i, (fid_batch, batch) in enumerate(pairs):
            _, st = self._pack_full_wire(fid_batch, batch, layout, ts,
                                         self.step + i, out=wires[i])
            stats.append(st)
        return wires, stats

    def stage_block(self, pairs, ts: Optional[int] = None):
        """Pack the NEXT block and start its host->device upload now.

        jax.device_put returns immediately with the transfer in flight, so
        calling this right after dispatching block k overlaps block k+1's
        wire upload with block k's device execution — on tunnel/PCIe-
        attached chips the upload is comparable to the compute
        (PERF.md round-4) and this hides it. Host id->row mapping never
        depends on device values, so packing ahead is safe; but the staged
        block bakes in stepnos and admissions, so it MUST be the next
        thing dispatched (train_step_block asserts this)."""
        ts = int(time.time()) if ts is None else ts
        wires, stats = self._pack_block(pairs, ts)
        return {"wires": jax.device_put(wires), "stats": stats,
                "base_step": self.step, "K": len(pairs)}

    def train_step_block(self, pairs, ts: Optional[int] = None,
                         staged=None) -> Dict:
        """Run len(pairs) training steps in ONE device dispatch (see
        _build_step_block). Requires the fuse_wire path and initialized
        params. pairs: list of (fid_batch, batch). staged: the result of
        stage_block(pairs) — skips packing and uses the pre-uploaded
        wires."""
        ts = int(time.time()) if ts is None else ts
        if self._base_key is None:
            self._base_key = jax.random.PRNGKey(self.config.seed)
        assert self.params is not None, "run one train_step first to init"
        if staged is not None:
            assert staged["base_step"] == self.step and \
                staged["K"] == len(pairs), "staged block is not the next " \
                "dispatch (stage_block must be followed by its own dispatch)"
            wires, stats = staged["wires"], staged["stats"]
        else:
            wires, stats = self._pack_block(pairs, ts)
        self._metrics_init()
        (self.table_states, self.params, self.model_state, self.opt_state,
         self._dev_metrics, losses, preds, auxes) = self._jit_step_block(
            self.table_states, self.params, self.model_state, self.opt_state,
            self._dev_metrics, wires, self._base_key)
        self.step += len(pairs)
        return {"loss": losses, "preds": preds, "stats": stats,
                "aux": auxes}

    def _block_capable(self) -> bool:
        """Whether train() may use K-steps-per-dispatch blocks at all."""
        return self.engine.fuse_wire

    def _stage_capable(self) -> bool:
        """Whether this trainer implements stage_block() (pack + start the
        host->device upload of the NEXT block while the current one runs).

        Explicit contract for _train_blocked's lookahead: a subclass that
        overrides train_step_block MUST either implement its own
        stage_block/_stage_capable pair or inherit this and return the
        right answer — the round-4 regression (sharded trainers inheriting
        the single-shard stage_block) is exactly what this hook prevents.
        Every train_step_block override must accept staged=None."""
        return self.engine.fuse_wire

    def _block_eligible(self, batch) -> bool:
        """Whether this batch's dtype layout supports the block path."""
        return self.engine.fuse_wire and self._batch_layout(batch) is not None

    @staticmethod
    def _batch_layout(batch):
        """Static (key, dtype, shape) tuple; None if any array isn't 4-byte
        (the full-wire path bitcasts through int32 words)."""
        items = []
        for k in sorted(batch):
            v = batch[k]
            if v.dtype.itemsize != 4:
                return None
            items.append((k, v.dtype.str, v.shape))
        return tuple(items)

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

    def _build_eval_full(self, layout, engine_words):
        engine, task = self.engine, self.task

        def eval_fn(table_states, params, model_state, wire):
            inputs, batch, stepno = Trainer._decode_full_wire(
                engine, wire, layout, engine_words)
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
        if self._base_key is None:
            self._base_key = jax.random.PRNGKey(self.config.seed)
        if self.engine.fuse_wire and self.params is not None:
            layout = self._batch_layout(batch)
        else:
            layout = None
        if layout is not None:
            # single-transfer path: fused C++ prepare + batch arrays + step
            # number ride ONE int32 array (PERF.md — each separate transfer
            # costs ~1ms fixed on tunnel-attached chips)
            if layout != self._full_layout:
                ew = self.engine.wire_words(layout[0][2][0])
                self._jit_step_full = self._build_step_full(layout, ew)
                self._full_layout = layout
            wire, stats = self._pack_full_wire(fid_batch, batch, layout, ts,
                                               self.step)
            self._metrics_init()
            (self.table_states, self.params, self.model_state, self.opt_state,
             self._dev_metrics, loss, preds, aux
             ) = self._jit_step_full(self.table_states, self.params,
                                     self.model_state, self.opt_state,
                                     self._dev_metrics, wire, self._base_key)
        else:
            inputs, stats = self.engine.prepare_batch(fid_batch, ts=ts)
            self._maybe_init(inputs, batch)
            if self.engine.fuse_wire:
                inputs = {"__wire__": self.engine.pack_wire(inputs)}
            if self._jit_step is None:
                self._jit_step = self._build_step()
            self._metrics_init()
            # exactly ONE device dispatch per step: the key fold and metric
            # accumulation happen inside the jitted program, batch/inputs are
            # numpy (transferred as call args) — small host-side ops each
            # cost a full dispatch round trip on remote TPUs.
            (self.table_states, self.params, self.model_state, self.opt_state,
             self._dev_metrics, loss, preds, aux
             ) = self._jit_step(self.table_states, self.params,
                                self.model_state, self.opt_state,
                                self._dev_metrics, inputs, batch,
                                self._base_key, np.int32(self.step))
        self.step += 1
        return {"loss": loss, "preds": preds, "stats": stats, "aux": aux}

    def evict_expired(self, expire_before: int) -> Dict[str, np.ndarray]:
        """Evict expired ids from the host stores AND zero their device rows
        (engine.zero_rows) so no stale params/slots survive the free — ref
        hash tables clear entry memory on evict
        (entry_accessor.cc Evict -> ClearEntry)."""
        freed = self.engine.evict_expired(expire_before)
        if self.table_states is not None:
            self.table_states = self.engine.zero_rows(self.table_states,
                                                      freed)
        return freed

    def spill_expired(self, expire_before: int) -> Dict[str, int]:
        """Two-tier eviction: read expiring rows' full state from the device
        pools into the host archive, then free the HBM rows (engine must be
        configured with tiered=True). Returns spilled counts per table."""
        if not self.config.engine.tiered:
            raise ValueError("spill_expired requires EngineConfig(tiered=True)")
        from monolith_tpu.embedding.tiered import pack_rows
        out = {}
        freed = {}
        for tname, spec in self.engine.tables.items():
            state = jax.device_get(self.table_states[tname])
            n = 0
            freed_rows = []
            for s, store in enumerate(self.engine.stores[tname]):
                rows, fids = store.evict_expired(expire_before, return_fids=True)
                if len(rows) == 0:
                    continue
                shard_state = jax.tree.map(lambda x: x[s], state)
                values = pack_rows(spec, shard_state, rows)
                n += self.engine.archives[tname][s].spill(fids, values,
                                                          ts=expire_before)
                freed_rows.append(rows.astype(np.int64)
                                  + s * spec.capacity_per_shard)
            out[tname] = n
            freed[tname] = (np.concatenate(freed_rows) if freed_rows
                            else np.empty(0, np.int64))
        # zero the spilled HBM rows (same stale-state hazard as evict)
        self.table_states = self.engine.zero_rows(self.table_states, freed)
        return out

    def _drain_metrics(self):
        """Read back and reset the on-device metric accumulator. This is the
        ONLY metric readback; it runs at log prints and end-of-train, never
        per step (PERF.md readback cliff)."""
        if self._dev_metrics is None:
            return
        m = jax.device_get(self._dev_metrics)
        self.auc.update_histograms(m["pos"], m["neg"])
        w = float(m["loss_weight"])
        if w > 0:
            self.loss_mean.update(float(m["loss_sum"]) / w, weight=w)
        self._dev_metrics = device_metrics_init(self.auc.num_thresholds)

    def evaluate(self, data: Iterator, max_steps: Optional[int] = None) -> Dict[str, float]:
        """data yields (fid_batch, batch). Returns {"auc":…, "loss":…}."""
        if self._jit_eval is None:
            self._jit_eval = self._build_eval()
        auc, loss_mean = StreamingAUC(), StreamingMean()
        for i, (fid_batch, batch) in enumerate(data):
            if max_steps is not None and i >= max_steps:
                break
            layout = (self._batch_layout(batch)
                      if self.engine.fuse_wire and self.params is not None
                      else None)
            if layout is not None:
                if layout != self._full_eval_layout:
                    ew = self.engine.wire_words(layout[0][2][0])
                    self._jit_eval_full = self._build_eval_full(layout, ew)
                    self._full_eval_layout = layout
                wire, _ = self._pack_full_wire(fid_batch, batch, layout,
                                               ts=0, stepno=self.step)
                loss, preds, _ = self._jit_eval_full(
                    self.table_states, self.params, self.model_state, wire)
            else:
                inputs, _ = self.engine.prepare_batch(fid_batch, ts=0)
                self._maybe_init(inputs, batch)
                if self.engine.fuse_wire:
                    inputs = {"__wire__": self.engine.pack_wire(inputs)}
                batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
                loss, preds, _ = self._jit_eval(self.table_states, self.params,
                                                self.model_state, inputs,
                                                batch_j, np.int32(self.step))
            auc.update(np.asarray(preds), batch["label"])
            loss_mean.update(float(loss))
        return {"auc": auc.result(), "loss": loss_mean.result()}

    def train(self, data: Iterator, steps: Optional[int] = None,
              hooks=()) -> Dict[str, float]:
        """Run the training loop over `data` (yields (fid_batch, batch)).

        With config.steps_per_dispatch > 1 (and the fuse_wire path), steps
        run in blocks of K per device dispatch; hooks fire once per block."""
        K = max(1, self.config.steps_per_dispatch)
        if K > 1 and self._block_capable():
            return self._train_blocked(data, steps, hooks, K)
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

    def _train_blocked(self, data: Iterator, steps: Optional[int],
                       hooks, K: int) -> Dict[str, float]:
        """Block-dispatch training loop (see train_step_block)."""
        t0 = time.time()
        examples = 0
        done = 0
        it = iter(data)
        stop = False

        def fetch(want):
            pairs = []
            for _ in range(want):
                try:
                    pairs.append(next(it))
                except StopIteration:
                    break
            return pairs

        pairs = fetch(K if steps is None else min(K, steps))
        staged = None
        while pairs:
            blockable = (len(pairs) > 1 and self.params is not None
                         and self._block_eligible(pairs[0][1]))
            if blockable:
                out = self.train_step_block(pairs, staged=staged)
            else:
                for fb, b in pairs:
                    out = self.train_step(fb, b)
            staged = None
            done += len(pairs)
            examples += sum(len(next(iter(b.values()))) for _, b in pairs)
            for h in hooks:
                try:
                    h(self, out)
                except StopIteration:
                    stop = True
            log_now = self.config.log_every and (
                self.step % self.config.log_every < len(pairs))
            if stop or (steps is not None and done >= steps):
                pairs = []
            else:
                pairs = fetch(K if steps is None else min(K, steps - done))
                # lookahead: pack + upload the next block while this one is
                # still executing on the device (hooks above are host work
                # that already overlapped). Only a full block that will
                # dispatch as a block may be staged — the pack bakes in
                # stepnos and host-store admissions. _stage_capable gates
                # trainers that implement staging (see its docstring).
                if (len(pairs) > 1 and self.params is not None
                        and self._block_eligible(pairs[0][1])
                        and self._stage_capable()):
                    staged = self.stage_block(pairs)
            if log_now:
                self._drain_metrics()
                dt = time.time() - t0
                print(f"step {self.step}: loss={self.loss_mean.result():.4f} "
                      f"auc={self.auc.result():.4f} "
                      f"ex/s={examples / max(dt, 1e-9):.0f}")
        self._drain_metrics()
        return {"auc": self.auc.result(), "loss": self.loss_mean.result(),
                "examples_per_sec": examples / max(time.time() - t0, 1e-9)}
