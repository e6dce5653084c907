"""Multi-device sharded trainer: SPMD embedding + data-parallel dense tower.

TPU-native rebuild of the reference's sync training mode
(DistributedMultiTypeHashTableMpi distributed_ps_sync.py:69 and
distributed_sync_train cpu_training.py:2160). Mapping of the reference's
3-alltoall step (SURVEY §3.3) onto XLA collectives over a 1-axis mesh "d":

  reference                          here
  ---------                          ----
  fid alltoall (a2a#1)               host batcher buckets ids by shard and
                                     feeds each device its shard's rows
                                     directly (ids never cross devices)
  local fused_lookup                 per-device gather from its pool shard
  embedding alltoall (a2a#2)         jax.lax.all_gather of the per-shard
                                     unique embeddings over "d"
  fused_gather_embeddings_by_input   per-feature gather+pool on the local
                                     batch shard (autodiff'd)
  grad alltoall (a2a#3)              jax.lax.psum_scatter of unique-row grads
  local fused_apply_gradient         per-device per-segment optimize
  hvd allreduce (dense)              jax.lax.pmean of dense grads

all_gather/psum_scatter (rather than pairwise a2a of per-destination buckets)
trades bandwidth for simplicity: each step moves S*U*D floats per device both
ways over ICI. A2A bucketing is a planned optimization (needs per-(src,dst)
bucket capacities from the host batcher).

Embedding tables are row-sharded over "d": state arrays [S, cap, ...] with
sharding P("d"). The dense tower and optimizer state are replicated; the
batch (feature index matrices + labels) is sharded on the batch axis.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from monolith_tpu.ops.clip import clip_by_global_norm
from monolith_tpu.training.task import RecTask
from monolith_tpu.training.trainer import Trainer, TrainerConfig
from monolith_tpu.embedding import table as table_lib


def _shard_lookup_overlay(spec, st, tin, key):
    """Per-shard packed gather + new-row init select (+ tiered revive).

    Returns (packed rows, overlay): overlay is the init-select/revive
    function applied to the gather — the pipelined (async_optimize) block
    re-applies the SAME overlay (same init values) to its fresh re-gather
    so newly admitted ids see identical init on both reads."""
    rows = jnp.asarray(tin["rows"])[0]
    mask = jnp.asarray(tin["new_mask"])[0]
    def overlay(p):
        ini = table_lib.init_packed(spec, key, rows.shape[0])
        p = jnp.where((mask > 0)[:, None], ini, p)
        if "revive_pos" in tin:
            pos = jnp.asarray(tin["revive_pos"])[0]
            vals = jnp.asarray(tin["revive_values"])[0]
            safe = jnp.where(pos < 0, jnp.int32(p.shape[0]),
                             pos.astype(jnp.int32))
            full = jnp.zeros((vals.shape[0], p.shape[1]), jnp.float32
                             ).at[:, :vals.shape[1]].set(vals)
            p = p.at[safe].set(full, mode="drop", unique_indices=True)
        return p

    return overlay(table_lib.gather_packed(spec, st, rows)), overlay


def _fused_shard_lookup(spec, st, tin, key):
    """Per-shard packed gather + new-row init select (+ tiered revive)."""
    p, _ = _shard_lookup_overlay(spec, st, tin, key)
    return p


class ShardedTrainer(Trainer):
    """Trainer whose step runs under shard_map over a 1-axis mesh.

    Requires config.engine.num_shards == mesh size; the host engine already
    produces per-shard row buffers, so only the device step changes."""

    def __init__(self, task: RecTask, config: TrainerConfig, mesh: Mesh):
        super().__init__(task, config)
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        n = mesh.devices.size
        if config.engine.num_shards != n:
            raise ValueError(
                f"engine.num_shards ({config.engine.num_shards}) must equal "
                f"mesh size ({n})")
        # place table pools sharded over the mesh
        shard = NamedSharding(mesh, P(self.axis))
        self.table_states = jax.tree.map(
            lambda x: jax.device_put(x, shard), self.table_states)
        self._local_step_raw = None
        self._sharded_block_K = None

    # -- sharding specs ------------------------------------------------

    def _build_step(self):
        if self.config.engine.exchange == "a2a":
            return self._build_step_a2a()
        engine, module, task, cfg = self.engine, self.module, self.task, self.config
        ax = self.axis
        mesh = self.mesh
        n = mesh.devices.size
        specs = {t: engine.tables[t] for t in engine.tables}
        U = cfg.engine.unique_cap

        def local_step(table_states, params, model_state, opt_state, inputs,
                       batch, base_key, stepno, pending=None):
            # Everything here is per-device: table_states arrays [1, cap, ...],
            # inputs rows [1, U], index/batch sharded on batch axis.
            # pending (pipelined/async_optimize block only): step i-1's
            # deferred write-back {table: (rows, packed_vals)} — see
            # _build_step_block_sharded.
            my = jax.lax.axis_index(ax)
            key = jax.random.fold_in(jax.random.fold_in(base_key, stepno), my)

            # admit new rows into the local shard (+ tiered revive); packed
            # mode defers the write to the single end-of-step scatter
            new_states, prows, overlays = {}, {}, {}
            for ti, (tname, tin) in enumerate(sorted(inputs.items())):
                spec = specs[tname]
                st = jax.tree.map(lambda x: x[0], table_states[tname])
                if engine.packed:
                    # stale gather FIRST (no data dependency on step i-1's
                    # pending scatter, so XLA overlaps that scatter with
                    # this step's fwd/bwd), THEN land the pending write-back
                    prows[tname], overlays[tname] = _shard_lookup_overlay(
                        spec, st, tin, key)
                    if pending is not None:
                        pr, pv = pending[tname]
                        pkey = jax.random.fold_in(jax.random.fold_in(
                            jax.random.fold_in(jax.random.PRNGKey(2),
                                               stepno), ti), my)
                        st = table_lib.scatter_packed(spec, st, pr, pv,
                                                      key=pkey)
                else:
                    nr = engine.new_rows_from(tin["rows"], tin)[0]
                    st = table_lib.init_rows(spec, st, nr, key)
                    if "revive_rows" in tin:
                        st = table_lib.restore_packed_rows(
                            spec, st, tin["revive_rows"][0],
                            tin["revive_values"][0])
                new_states[tname] = st

            # local lookup + all_gather (fwd "alltoall")
            gathered = {}
            for tname, tin in inputs.items():
                spec = specs[tname]
                if engine.packed:
                    emb_local = table_lib.params_of(spec, prows[tname])
                else:
                    emb_local = table_lib.lookup(spec, new_states[tname],
                                                 tin["rows"][0])
                emb_all = jax.lax.all_gather(emb_local, ax)  # [S, U, D]
                gathered[tname] = emb_all.reshape(n * U, spec.dim)

            def loss_fn(params, gathered):
                retrieved = engine.retrieve_unique(gathered, stepno)
                pooled = {}
                for tname, tin in inputs.items():
                    buf = retrieved[tname]
                    nn_ = buf.shape[0]
                    for fname, idx in tin["index"].items():
                        f = engine.features[fname]
                        safe = jnp.where(idx < 0, jnp.int32(nn_), idx.astype(jnp.int32))
                        emb = buf.at[safe].get(mode="fill", fill_value=0)
                        from monolith_tpu.feature import combine
                        pooled[fname] = combine(emb, idx >= 0, f.combiner)
                out, new_ms = self._apply(params, model_state, pooled, batch,
                                          training=True)
                loss, aux = task.loss(out, batch)
                return loss, (out, aux, new_ms)

            (loss, (out, aux, new_ms)), (gp, gemb) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, gathered)
            new_ms = jax.tree.map(lambda x: jax.lax.pmean(x, ax), new_ms)

            # dense: data-parallel mean of local-mean grads == global mean
            gp = jax.lax.pmean(gp, ax)
            loss = jax.lax.pmean(loss, ax)
            if cfg.clip_norm > 0:
                gp, _ = clip_by_global_norm(gp, cfg.clip_norm)
            updates, opt_state = self.tx.update(gp, opt_state, params)
            params = optax.apply_updates(params, updates)

            # sparse: reduce-scatter grads back to owning shards (bwd "alltoall");
            # divide by n to match global-mean loss semantics
            out_states = {}
            new_pending = {}
            for ti, (tname, tin) in enumerate(sorted(inputs.items())):
                spec = specs[tname]
                g_all = gemb[tname].reshape(n, U, spec.dim)
                g_local = jax.lax.psum_scatter(g_all, ax, scatter_dimension=0,
                                               tiled=False) / n
                if pending is not None:
                    # pipelined: re-gather the FRESH rows (step i-1's
                    # write-back landed above) and optimize those — updates
                    # are never lost; the stale rows the forward used feed
                    # DC compensation (ref dc_optimizer.cc:30-44); defer
                    # this step's scatter to step i+1
                    p_latest = overlays[tname](table_lib.gather_packed(
                        spec, new_states[tname], tin["rows"][0]))
                    new_p = table_lib.optimize_packed(
                        spec, p_latest, g_local, stepno, stale=prows[tname])
                    new_pending[tname] = (tin["rows"][0], new_p)
                    st = new_states[tname]
                elif engine.packed:
                    new_p = table_lib.optimize_packed(spec, prows[tname],
                                                      g_local, stepno)
                    # per-(step, table, shard) key for stochastic bf16 store
                    skey = jax.random.fold_in(jax.random.fold_in(
                        jax.random.fold_in(jax.random.PRNGKey(1), stepno), ti),
                        jax.lax.axis_index(ax))
                    st = table_lib.scatter_packed(spec, new_states[tname],
                                                  tin["rows"][0], new_p,
                                                  key=skey)
                else:
                    st = table_lib.apply_gradients(spec, new_states[tname],
                                                   tin["rows"][0], g_local,
                                                   stepno)
                out_states[tname] = jax.tree.map(lambda x: x[None], st)

            preds = task.predictions(out)
            if pending is not None:
                return (out_states, params, new_ms, opt_state, loss, preds,
                        aux, new_pending)
            return out_states, params, new_ms, opt_state, loss, preds, aux

        self._local_step_raw = local_step
        return self._wrap_local_step(local_step)

    def _input_specs_pytree(self):
        ax = self.axis
        return jax.tree.map(lambda _: P(ax), self._input_template,
                            is_leaf=lambda x: hasattr(x, "shape"))

    def _state_specs(self):
        ax = self.axis
        return jax.tree.map(lambda _: P(ax), self.table_states,
                            is_leaf=lambda x: hasattr(x, "shape"))

    def _wrap_local_step(self, local_step):
        state_specs = self._state_specs()
        ax = self.axis
        in_specs = (state_specs, P(), P(), P(), self._input_specs_pytree(),
                    P(ax), P(), P())
        out_specs = (state_specs, P(), P(), P(), P(), P(ax), P())
        fn = jax.shard_map(local_step, mesh=self.mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)

        # device-metric accumulation runs OUTSIDE shard_map on the (sharded)
        # global preds/labels — replicated histogram state, one scatter-add
        def step_fn(table_states, params, model_state, opt_state, metrics,
                    inputs, batch, base_key, stepno):
            ts_, p_, ms_, os_, loss, preds, aux = fn(
                table_states, params, model_state, opt_state, inputs, batch,
                base_key, stepno)
            metrics = self._metrics_step(metrics, loss, preds, batch)
            return ts_, p_, ms_, os_, metrics, loss, preds, aux

        return jax.jit(step_fn, donate_argnums=(0, 1, 2, 3, 4))

    def _build_step_block_sharded(self, K):
        """K sharded steps per dispatch: lax.scan of the per-device step over
        K stacked input/batch pytrees inside ONE shard_map program — all
        fwd/bwd collectives for the K steps compile into one executable.
        Bit-identical to K sequential dispatches (host id->row mapping never
        depends on device values); the per-dispatch overhead and K-1 jit
        boundaries are eliminated. TPU-native form of the reference's
        pipelined sync training (ref prefetch_queue.py:291,
        distributed_ps_sync.py:199,270,341,485).

        With EngineConfig(async_optimize=True) (packed tables) the scanned
        step runs the 1-step-stale pipelined schedule (the partial-sync
        mode, ref enable_partial_sync_training cpu_training.py:476,536 +
        enable_async_optimize :488): the DENSE update stays synchronous
        every step (pmean) while each step's sparse write-back scatter is
        deferred one iteration so XLA overlaps it with the next step's
        fwd/bwd; the last pending scatter lands after the scan. Numerics
        differ from the synchronous block only for ids read in consecutive
        steps (their forward saw 1-step-stale values)."""
        pipelined = (self.config.engine.async_optimize and self.engine.packed)
        if self._local_step_raw is None:
            if self._jit_step is None:
                self._jit_step = self._build_step()
        local_step = self._local_step_raw
        ax = self.axis
        cfg = self.config

        def zero_pending():
            return {t: (jnp.full((cfg.engine.ucap(t),), -1, jnp.int32),
                        jnp.zeros((cfg.engine.ucap(t),
                                   table_lib.packed_padded_width(sp)),
                                  jnp.float32))
                    for t, sp in self.engine.tables.items()
                    if self.engine.table_features[t]}

        def local_block(table_states, params, model_state, opt_state,
                        inputs_k, batch_k, base_key, step0):
            def body(carry, xs):
                if pipelined:
                    ts_, p_, ms_, os_, i, pend = carry
                    inp, bat = xs
                    (ts_, p_, ms_, os_, loss, preds, aux, pend
                     ) = local_step(ts_, p_, ms_, os_, inp, bat, base_key,
                                    step0 + i, pending=pend)
                    return (ts_, p_, ms_, os_, i + jnp.int32(1), pend), (
                        loss, preds, aux)
                ts_, p_, ms_, os_, i = carry
                inp, bat = xs
                ts_, p_, ms_, os_, loss, preds, aux = local_step(
                    ts_, p_, ms_, os_, inp, bat, base_key, step0 + i)
                return (ts_, p_, ms_, os_, i + jnp.int32(1)), (loss, preds,
                                                               aux)

            carry = (table_states, params, model_state, opt_state,
                     jnp.int32(0))
            if pipelined:
                carry = carry + (zero_pending(),)
                (ts_, p_, ms_, os_, _, pend), (losses, preds, auxes) = \
                    jax.lax.scan(body, carry, (inputs_k, batch_k))
                # the final iteration's write-back lands after the scan
                my = jax.lax.axis_index(ax)
                for ti, tname in enumerate(sorted(pend)):
                    spec = self.engine.tables[tname]
                    pr, pv = pend[tname]
                    pkey = jax.random.fold_in(jax.random.fold_in(
                        jax.random.fold_in(jax.random.PRNGKey(2),
                                           step0 + jnp.int32(K)), ti), my)
                    st = jax.tree.map(lambda x: x[0], ts_[tname])
                    st = table_lib.scatter_packed(spec, st, pr, pv, key=pkey)
                    ts_[tname] = jax.tree.map(lambda x: x[None], st)
                return ts_, p_, ms_, os_, losses, preds, auxes
            (ts_, p_, ms_, os_, _), (losses, preds, auxes) = jax.lax.scan(
                body, carry, (inputs_k, batch_k))
            return ts_, p_, ms_, os_, losses, preds, auxes

        state_specs = self._state_specs()
        stacked = lambda tmpl: jax.tree.map(  # noqa: E731
            lambda _: P(None, ax), tmpl,
            is_leaf=lambda x: hasattr(x, "shape"))
        in_specs = (state_specs, P(), P(), P(),
                    stacked(self._input_template), P(None, ax), P(), P())
        out_specs = (state_specs, P(), P(), P(), P(), P(None, ax), P())
        fn = jax.shard_map(local_block, mesh=self.mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)

        def block_fn(table_states, params, model_state, opt_state, metrics,
                     inputs_k, batch_k, base_key, step0):
            ts_, p_, ms_, os_, losses, preds, auxes = fn(
                table_states, params, model_state, opt_state, inputs_k,
                batch_k, base_key, step0)
            metrics = self._metrics_step(metrics, losses, preds, batch_k)
            return ts_, p_, ms_, os_, metrics, losses, preds, auxes

        return jax.jit(block_fn, donate_argnums=(0, 1, 2, 3, 4))

    def _block_capable(self) -> bool:
        return True

    def _block_eligible(self, batch) -> bool:
        return True  # no wire-layout constraint in sharded mode

    def _stage_capable(self) -> bool:
        return True

    def _pack_block_sharded(self, pairs, ts: int):
        """Host-side prep of a K-step block: per-step shard bucketing
        (mutates the host stores exactly like K sequential preps — the
        result must be the next dispatch) + K-stacking. Returns
        (template, inputs_k, batch_k, stats) as host numpy."""
        a2a = self.config.engine.exchange == "a2a"
        inputs_list, stats = [], []
        for fb, b in pairs:
            if a2a:
                inputs, st = self.engine.prepare_batch_a2a(fb, ts=ts)
            else:
                inputs, st = self.engine.prepare_batch(fb, ts=ts)
            inputs_list.append(inputs)
            stats.append(st)
        inputs_k = jax.tree.map(lambda *xs: np.stack(xs), *inputs_list)
        batch_k = {k: np.stack([b[k] for _, b in pairs])
                   for k in pairs[0][1]}
        return inputs_list[0], inputs_k, batch_k, stats

    def stage_block(self, pairs, ts: Optional[int] = None):
        """Pack the NEXT block and start its (sharded) host->device upload.

        jax.device_put with the block in_specs' NamedSharding returns with
        the transfer in flight, giving the same upload/compute overlap as
        the single-shard wire staging (trainer.py stage_block). The pack
        bakes in stepnos and host-store admissions, so the staged block
        MUST be the next dispatch (train_step_block asserts this)."""
        ts = int(time.time()) if ts is None else ts
        template, inputs_k, batch_k, stats = self._pack_block_sharded(
            pairs, ts)
        shard = NamedSharding(self.mesh, P(None, self.axis))
        inputs_k = jax.tree.map(
            lambda x: jax.device_put(x, shard), inputs_k,
            is_leaf=lambda x: isinstance(x, np.ndarray))
        batch_k = {k: jax.device_put(v, shard) for k, v in batch_k.items()}
        return {"template": template, "inputs_k": inputs_k,
                "batch_k": batch_k, "stats": stats,
                "base_step": self.step, "K": len(pairs)}

    def train_step_block(self, pairs, ts: Optional[int] = None,
                         staged=None):
        """Run len(pairs) sharded steps in ONE dispatch (see
        _build_step_block_sharded). staged: the result of
        stage_block(pairs) — skips host prep and uses the pre-uploaded
        stacked inputs."""
        ts = int(time.time()) if ts is None else ts
        if self._base_key is None:
            self._base_key = jax.random.PRNGKey(self.config.seed)
        assert self.params is not None, "run one train_step first to init"
        K = len(pairs)
        if staged is not None:
            assert staged["base_step"] == self.step and staged["K"] == K, \
                "staged block is not the next dispatch (stage_block must " \
                "be followed by its own dispatch)"
            template, inputs_k, batch_k, stats = (
                staged["template"], staged["inputs_k"], staged["batch_k"],
                staged["stats"])
        else:
            template, inputs_k, batch_k, stats = self._pack_block_sharded(
                pairs, ts)
        self._input_template = template
        if self._sharded_block_K != K:
            self._jit_step_block = self._build_step_block_sharded(K)
            self._sharded_block_K = K
        self._metrics_init()
        (self.table_states, self.params, self.model_state, self.opt_state,
         self._dev_metrics, losses, preds, auxes) = self._jit_step_block(
            self.table_states, self.params, self.model_state, self.opt_state,
            self._dev_metrics, inputs_k, batch_k, self._base_key,
            np.int32(self.step))
        self.step += K
        return {"loss": losses, "preds": preds, "stats": stats,
                "aux": auxes}

    def _build_step_a2a(self):
        """Bucketed all-to-all exchange (ref distributed_ps_sync.py:95):
        each table shard gathers only the rows each batch shard asked for
        (per-destination buckets) and all_to_alls them — traffic
        S*bucket_cap*D instead of all_gather's S*U*D. Gradients reverse
        through the same a2a via autodiff."""
        engine, module, task, cfg = self.engine, self.module, self.task, self.config
        ax, mesh = self.axis, self.mesh
        n = mesh.devices.size
        specs = {t: engine.tables[t] for t in engine.tables}
        U = cfg.engine.unique_cap
        cap = cfg.engine.effective_bucket_cap

        def local_step(table_states, params, model_state, opt_state, inputs,
                       batch, base_key, stepno, pending=None):
            my = jax.lax.axis_index(ax)
            key = jax.random.fold_in(jax.random.fold_in(base_key, stepno), my)

            new_states, prows, overlays = {}, {}, {}
            for ti, (tname, tin) in enumerate(sorted(inputs.items())):
                spec = specs[tname]
                st = jax.tree.map(lambda x: x[0], table_states[tname])
                if engine.packed:
                    # pipelined: stale gather first, then land step i-1's
                    # pending write-back (see the allgather local_step)
                    prows[tname], overlays[tname] = _shard_lookup_overlay(
                        spec, st, tin, key)
                    if pending is not None:
                        pr, pv = pending[tname]
                        pkey = jax.random.fold_in(jax.random.fold_in(
                            jax.random.fold_in(jax.random.PRNGKey(2),
                                               stepno), ti), my)
                        st = table_lib.scatter_packed(spec, st, pr, pv,
                                                      key=pkey)
                else:
                    nr = engine.new_rows_from(tin["rows"], tin)[0]
                    st = table_lib.init_rows(spec, st, nr, key)
                    if "revive_rows" in tin:
                        st = table_lib.restore_packed_rows(
                            spec, st, tin["revive_rows"][0],
                            tin["revive_values"][0])
                new_states[tname] = st

            # local unique rows per shard (not exchanged)
            uniques = {}
            for tname, tin in inputs.items():
                spec = specs[tname]
                if engine.packed:
                    uniques[tname] = table_lib.params_of(spec, prows[tname])
                else:
                    uniques[tname] = table_lib.lookup(spec, new_states[tname],
                                                      tin["rows"][0])  # [U, D]

            def loss_fn(params, uniques):
                retrieved = engine.retrieve_unique(uniques, stepno)
                pooled = {}
                for tname, tin in inputs.items():
                    spec = specs[tname]
                    emb_unique = retrieved[tname]
                    bidx = tin["bucket_idx"][0]  # [D, cap]
                    safe_b = jnp.where(bidx < 0, jnp.int32(U),
                                       bidx.astype(jnp.int32))
                    buckets = emb_unique.at[safe_b].get(
                        mode="fill", fill_value=0)  # [D, cap, dim]
                    recv = jax.lax.all_to_all(buckets, ax, split_axis=0,
                                              concat_axis=0)  # [S, cap, dim]
                    flat = recv.reshape(n * cap, spec.dim)
                    for fname, idx in tin["index"].items():
                        f = engine.features[fname]
                        safe = jnp.where(idx < 0, jnp.int32(n * cap),
                                         idx.astype(jnp.int32))
                        emb = flat.at[safe].get(mode="fill", fill_value=0)
                        from monolith_tpu.feature import combine
                        pooled[fname] = combine(emb, idx >= 0, f.combiner)
                out, new_ms = self._apply(params, model_state, pooled, batch,
                                          training=True)
                loss, aux = task.loss(out, batch)
                return loss, (out, aux, new_ms)

            (loss, (out, aux, new_ms)), (gp, gu) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, uniques)
            new_ms = jax.tree.map(lambda x: jax.lax.pmean(x, ax), new_ms)

            gp = jax.lax.pmean(gp, ax)
            loss = jax.lax.pmean(loss, ax)
            if cfg.clip_norm > 0:
                gp, _ = clip_by_global_norm(gp, cfg.clip_norm)
            updates, opt_state = self.tx.update(gp, opt_state, params)
            params = optax.apply_updates(params, updates)

            out_states = {}
            new_pending = {}
            for ti, (tname, tin) in enumerate(sorted(inputs.items())):
                spec = specs[tname]
                # gu already holds the summed grads per local unique row
                # (reverse a2a + scatter-add generated by autodiff); divide by
                # n for global-mean loss semantics
                if pending is not None:
                    p_latest = overlays[tname](table_lib.gather_packed(
                        spec, new_states[tname], tin["rows"][0]))
                    new_p = table_lib.optimize_packed(
                        spec, p_latest, gu[tname] / n, stepno,
                        stale=prows[tname])
                    new_pending[tname] = (tin["rows"][0], new_p)
                    st = new_states[tname]
                elif engine.packed:
                    new_p = table_lib.optimize_packed(spec, prows[tname],
                                                      gu[tname] / n, stepno)
                    # per-(step, table, shard) key for stochastic bf16 store
                    skey = jax.random.fold_in(jax.random.fold_in(
                        jax.random.fold_in(jax.random.PRNGKey(1), stepno), ti),
                        jax.lax.axis_index(ax))
                    st = table_lib.scatter_packed(spec, new_states[tname],
                                                  tin["rows"][0], new_p,
                                                  key=skey)
                else:
                    st = table_lib.apply_gradients(spec, new_states[tname],
                                                   tin["rows"][0],
                                                   gu[tname] / n, stepno)
                out_states[tname] = jax.tree.map(lambda x: x[None], st)

            preds = task.predictions(out)
            if pending is not None:
                return (out_states, params, new_ms, opt_state, loss, preds,
                        aux, new_pending)
            return out_states, params, new_ms, opt_state, loss, preds, aux

        self._local_step_raw = local_step
        return self._wrap_local_step(local_step)

    def _build_eval(self):
        engine, module, task = self.engine, self.module, self.task
        ax, mesh, n = self.axis, self.mesh, self.mesh.devices.size
        specs = {t: engine.tables[t] for t in engine.tables}
        U = self.config.engine.unique_cap

        def local_eval(table_states, params, model_state, inputs, batch,
                       stepno):
            pooled = {}
            bufs = {}
            for tname, tin in inputs.items():
                spec = specs[tname]
                st = jax.tree.map(lambda x: x[0], table_states[tname])
                emb_local = table_lib.lookup(spec, st, tin["rows"][0])
                bufs[tname] = jax.lax.all_gather(emb_local, ax).reshape(
                    n * U, spec.dim)
            bufs = engine.retrieve_unique(bufs, stepno)
            for tname, tin in inputs.items():
                buf = bufs[tname]
                for fname, idx in tin["index"].items():
                    f = engine.features[fname]
                    safe = jnp.where(idx < 0, jnp.int32(buf.shape[0]), idx.astype(jnp.int32))
                    emb = buf.at[safe].get(mode="fill", fill_value=0)
                    from monolith_tpu.feature import combine
                    pooled[fname] = combine(emb, idx >= 0, f.combiner)
            out, _ = self._apply(params, model_state, pooled, batch,
                                 training=False)
            loss, aux = task.loss(out, batch)
            return jax.lax.pmean(loss, ax), task.predictions(out), aux

        state_specs = jax.tree.map(lambda _: P(ax), self.table_states,
                                   is_leaf=lambda x: hasattr(x, "shape"))
        fn = jax.shard_map(local_eval, mesh=mesh,
                           in_specs=(state_specs, P(), P(),
                                     self._input_specs_pytree(), P(ax), P()),
                           out_specs=(P(), P(ax), P()), check_vma=False)
        return jax.jit(fn)

    # -- host plumbing --------------------------------------------------

    def train_step(self, fid_batch, batch, ts: Optional[int] = None):
        ts = int(time.time()) if ts is None else ts
        if self.config.engine.exchange == "a2a":
            inputs, stats = self.engine.prepare_batch_a2a(fid_batch, ts=ts)
        else:
            inputs, stats = self.engine.prepare_batch(fid_batch, ts=ts)
        self._input_template = inputs
        self._maybe_init(inputs, batch)
        if self._jit_step is None:
            self._jit_step = self._build_step()
        if self._base_key is None:
            self._base_key = jax.random.PRNGKey(self.config.seed)
        self._metrics_init()
        (self.table_states, self.params, self.model_state, self.opt_state,
         self._dev_metrics, loss, preds, aux
         ) = self._jit_step(self.table_states, self.params, self.model_state,
                            self.opt_state, self._dev_metrics, inputs, batch,
                            self._base_key, np.int32(self.step))
        self.step += 1
        return {"loss": loss, "preds": preds, "stats": stats, "aux": aux}

    def evaluate(self, data, max_steps=None):
        from monolith_tpu.metrics import StreamingAUC, StreamingMean
        auc, loss_mean = StreamingAUC(), StreamingMean()
        for i, (fid_batch, batch) in enumerate(data):
            if max_steps is not None and i >= max_steps:
                break
            inputs, _ = self.engine.prepare_batch(fid_batch, ts=0)
            self._input_template = inputs
            self._maybe_init(inputs, batch)
            if self._jit_eval is None:
                self._jit_eval = self._build_eval()
            batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
            loss, preds, _ = self._jit_eval(self.table_states, self.params,
                                            self.model_state, inputs, batch_j,
                                            np.int32(self.step))
            auc.update(np.asarray(preds), batch["label"])
            loss_mean.update(float(loss))
        return {"auc": auc.result(), "loss": loss_mean.result()}
