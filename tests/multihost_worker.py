"""Worker binary for the multi-host training tests (ref
cpu_training_distributed_test_binary.py): one JAX process per invocation,
gloo CPU collectives, each process driving SEVERAL local virtual devices
(mirroring a v5e host with 4 chips) under MultiHostTrainer.

Modes:
  train:   train `steps` steps (singles then one K=4 block), save a
           distributed checkpoint, print per-shard sizes/checksums.
  restore: restore the distributed checkpoint (same topology), verify the
           host maps and pools match, train 2 more steps.
"""

import os
import sys


def checksum(trainer, tname="sparse"):
    """Per-local-shard (store_size, pool_sum) fingerprints."""
    import numpy as np
    from monolith_tpu.training.checkpoint import _shard_data
    out = []
    state = trainer.table_states[tname]
    for s in trainer.local_device_ids:
        store = trainer.engine.stores[tname][s]
        leaf = list(state.values())[0]
        data = _shard_data(leaf, s)
        out.append((store.size(), float(np.abs(np.asarray(data)).sum())))
    return out


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    steps = int(sys.argv[4])
    local_devices = int(sys.argv[5])
    mode = sys.argv[6]
    ckpt_dir = sys.argv[7]

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("MT_TEST_COMPILE_CACHE",
                       "/tmp/monolith_tpu_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)

    import numpy as np
    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.multihost import MultiHostTrainer
    from monolith_tpu.training import checkpoint
    from monolith_tpu.training.trainer import TrainerConfig

    S = nproc * local_devices
    if mode == "multislot":
        # multi-TABLE smoke (3 physical tables, merge=False): exercises the
        # fused all-tables exchange (one id a2a + one callback + one
        # embedding a2a per step regardless of table count) at T > 1 —
        # every other multihost test uses the single-table DeepFM
        from monolith_tpu.data.synthetic import SyntheticMultiSlot
        from monolith_tpu.models.multislot import MultiSlotTask
        task = MultiSlotTask(num_tables=2, num_slots=4, embedding_dim=8,
                             capacity_per_shard=1024, history_length=6,
                             hidden=(16,), merge=False)
        data = SyntheticMultiSlot(num_slots=4, vocab_per_slot=60,
                                  history_length=6, batch_size=64, seed=1000)
    else:
        task = DeepFMTask(embedding_dim=8, capacity_per_shard=4096,
                          hidden=(16, 8), init_scale=0.0,
                          ttl_seconds=1 if mode in ("evictzero",
                                                    "evictsave") else 0)
        data = SyntheticCTR(num_users=100, num_items=60, batch_size=64,
                            seed=1000)
    cfg = TrainerConfig(engine=EngineConfig(num_shards=S, unique_cap=512,
                                            new_cap=512, bucket_cap=128,
                                            record_touch=(mode == "streaming"),
                                            tiered=(mode == "tiered")),
                        log_every=0, metrics_enabled=True)
    trainer = MultiHostTrainer(task, cfg)
    assert trainer.local_device_ids == list(
        range(pid * local_devices, (pid + 1) * local_devices))

    # ONE logical stream sharded across processes: all processes share the
    # generator (same ground truth); each consumes its own interleaved slice
    it = iter(data)

    def next_local():
        batches = [next(it) for _ in range(nproc)]
        return batches[pid]

    losses = []
    if mode == "train":
        K = 4
        single = steps - K if steps > K else steps
        for i in range(single):
            fb, b = next_local()
            out = trainer.train_step(fb, b, ts=i)
            losses.append(float(np.asarray(out["loss"])))
        if steps > K:
            pairs = [next_local() for _ in range(K)]
            out = trainer.train_step_block(pairs, ts=single)
            losses.extend(np.asarray(out["loss"]).tolist())
        trainer._drain_metrics()
        checkpoint.save_distributed(trainer, ckpt_dir)
        sizes = [c[0] for c in checksum(trainer)]
        sums = [round(c[1], 3) for c in checksum(trainer)]
        print(f"RESULT {pid} first={np.mean(losses[:3]):.5f} "
              f"last={np.mean(losses[-3:]):.5f} "
              f"auc={trainer.auc.result():.4f} "
              f"sizes={sizes} sums={sums}", flush=True)
    elif mode == "restore":
        # one warmup step initializes dense params (required before restore)
        fb, b = next_local()
        trainer.train_step(fb, b, ts=0)
        step = checkpoint.restore_distributed(trainer, ckpt_dir)
        sizes = [c[0] for c in checksum(trainer)]
        sums = [round(c[1], 3) for c in checksum(trainer)]
        # training continues from the restored state
        post = []
        for i in range(2):
            fb, b = next_local()
            out = trainer.train_step(fb, b, ts=100 + i)
            post.append(float(np.asarray(out["loss"])))
        assert all(np.isfinite(post)), post
        print(f"RESULT {pid} step={step} sizes={sizes} sums={sums} "
              f"post={np.mean(post):.5f}", flush=True)
    elif mode == "estimator":
        # Estimator facade in a multi-process run: auto-selects
        # MultiHostTrainer, transparently routes checkpoint save/restore to
        # the distributed paths, resumes from model_dir on the second run
        from monolith_tpu.estimator import Estimator, RunnerConfig
        est = Estimator(task, RunnerConfig(model_dir=ckpt_dir,
                                           unique_cap=512, new_cap=512,
                                           log_every=0))
        assert type(est.trainer).__name__ == "MultiHostTrainer"

        def stream():
            while True:
                yield next_local()

        res = est.train(stream(), steps=steps)
        print(f"RESULT {pid} step={est.trainer.step} "
              f"loss={res['loss']:.5f} auc={res['auc']:.4f}", flush=True)
    elif mode == "eval":
        # train, then a distributed eval: AUC histograms psum across the
        # WHOLE mesh, so both processes must report the identical global
        # AUC (each once saw only its local slice)
        for i in range(steps):
            fb, b = next_local()
            trainer.train_step(fb, b, ts=i)
        res = trainer.evaluate(iter([next_local() for _ in range(3)]))
        print(f"RESULT {pid} auc={res['auc']:.6f} loss={res['loss']:.6f}",
              flush=True)
    elif mode == "tiered":
        # two-tier storage on the multi-host topology (VERDICT r2 #6):
        # train -> spill EVERY live row to the per-shard host archives
        # (each process reads only its addressable pool shards) -> keep
        # training the same id universe so spilled ids re-admit and
        # revive OWNER-SIDE through the map callback. The test checks
        # loss parity against the single-host sharded tiered path — a
        # fresh-init instead of an exact revive would diverge it.
        losses = []
        for i in range(steps):
            fb, b = next_local()
            out = trainer.train_step(fb, b, ts=i)
            losses.append(float(np.asarray(out["loss"])))
        sizes_mid = sum(trainer.engine.stores["sparse"][s].size()
                        for s in trainer.local_device_ids)
        spilled = trainer.spill_expired(expire_before=10 ** 9)
        sizes_post = sum(trainer.engine.stores["sparse"][s].size()
                         for s in trainer.local_device_ids)
        assert sizes_post == 0, sizes_post
        for i in range(steps):
            fb, b = next_local()
            out = trainer.train_step(fb, b, ts=steps + i)
            losses.append(float(np.asarray(out["loss"])))
        revived = sum(trainer.engine.archives["sparse"][s].revived
                      for s in trainer.local_device_ids)
        arch_left = sum(trainer.engine.archives["sparse"][s].size()
                        for s in trainer.local_device_ids)
        print(f"RESULT {pid} spilled={spilled['sparse']} revived={revived} "
              f"sizes_mid={sizes_mid} arch_left={arch_left} "
              f"first={np.mean(losses[:3]):.5f} "
              f"last={np.mean(losses[-3:]):.5f}", flush=True)
    elif mode == "streaming":
        # Realtime sync on the multi-host topology (VERDICT r2 #3; ref
        # per-PS sync thread cpu_training.py:1736-1767): every process
        # drains ITS local shards' touched fids, device-gathers just those
        # rows, and pushes the delta to a shared serving replica. The
        # replica must end up holding each shard's exact trained values.
        import time as _time
        from jax.experimental import multihost_utils
        from monolith_tpu.embedding import table as table_lib
        from monolith_tpu.serving.agent import ServingAgent, ServingClient
        from monolith_tpu.serving.engine import ServingModel
        from monolith_tpu.serving.export import export_model
        from monolith_tpu.serving.param_sync import SyncClientManager
        from monolith_tpu.training.streaming import (StreamingConfig,
                                                     StreamingTrainer)

        for i in range(4):  # warm start before the cold export
            trainer.train_step(*next_local(), ts=i)
        path = export_model(trainer, ckpt_dir)  # distributed per-shard dump

        addr_file = os.path.join(ckpt_dir, "agent_addr")
        agent = None
        if pid == 0:
            model = ServingModel(task, path)
            agent = ServingAgent(model, port=0)
            addr = agent.start()
            with open(addr_file + ".tmp", "w") as f:
                f.write(addr)
            os.replace(addr_file + ".tmp", addr_file)
        else:
            for _ in range(600):
                if os.path.exists(addr_file):
                    break
                _time.sleep(0.1)
            with open(addr_file) as f:
                addr = f.read()

        sync = SyncClientManager("m", static_targets=[addr])
        st = StreamingTrainer(trainer, sync,
                              StreamingConfig(sync_interval_steps=5))

        def stream():
            for i in range(steps):
                yield next_local()

        res = st.run(stream())
        # verify: every LOCAL shard's live fids must read back from the
        # replica with the exact trained values (both processes pushed)
        client = ServingClient(addr)
        matched = checked = 0
        state = trainer.table_states["sparse"]
        spec = trainer.engine.tables["sparse"]
        for s in trainer.local_device_ids:
            store = trainer.engine.stores["sparse"][s]
            fids, rows, _, _ = store.save()
            take = min(len(fids), 64)
            if take == 0:
                continue
            fids, rows = fids[:take], rows[:take]
            shard_state = StreamingTrainer._shard_state(state, s)
            expected = np.asarray(table_lib.lookup(
                spec, shard_state, np.asarray(rows, np.int32)))
            got = client.lookup("sparse", fids)
            m = np.isclose(got, expected, rtol=1e-5).all(axis=1)
            matched += int(m.sum())
            checked += take
        client.close()
        multihost_utils.sync_global_devices("streaming_checked")
        if agent is not None:
            replica_size = agent.model.stores["sparse"].size()
            agent.stop()
        else:
            replica_size = -1
        local_size = sum(trainer.engine.stores["sparse"][s].size()
                         for s in trainer.local_device_ids)
        print(f"RESULT {pid} pushed={res['pushed_rows']} "
              f"rounds={res['sync_rounds']} matched={matched} "
              f"checked={checked} local_size={local_size} "
              f"replica_size={replica_size}", flush=True)
    elif mode == "evictzero":
        # Recycled-row zeroing (VERDICT r3 #5): eviction frees host rows but
        # the globally-sharded pools can't be zeroed eagerly from the host;
        # freed rows queue in _pending_zero, drain through the map callback,
        # and the jitted step zeroes them BEFORE any gather. Prove (a) the
        # stale content really was still on device right after evict (the
        # hazard), (b) one step later every drained row that wasn't
        # re-allocated reads zeros, (c) the queue fully drained.
        from monolith_tpu.training.checkpoint import _shard_data
        spec = trainer.engine.tables["sparse"]
        cap = spec.capacity_per_shard
        for i in range(steps):
            fb, b = next_local()
            trainer.train_step(fb, b, ts=i)
        freed = trainer.evict_expired(expire_before=10 ** 9)["sparse"]
        assert all(trainer.engine.stores["sparse"][s].size() == 0
                   for s in trainer.local_device_ids)
        freed_by_shard = {
            s: set((freed[(freed // cap) == s] % cap).tolist())
            for s in trainer.local_device_ids}
        leaf = list(trainer.table_states["sparse"].values())[0]
        stale = 0  # freed rows whose device content is still nonzero
        for s in trainer.local_device_ids:
            d = np.asarray(_shard_data(leaf, s))
            rows = sorted(freed_by_shard[s])
            stale += int((np.abs(d[rows]).sum(axis=1) > 0).sum())
        # one more step: re-admits ids onto recycled rows AND drains the
        # pending-zero queue through the map callback
        fb, b = next_local()
        trainer.train_step(fb, b, ts=100)
        # the dispatch is async: block before reading stores/pend — the map
        # callback (admission + drain) runs during device execution
        jax.block_until_ready(
            jax.tree.leaves(trainer.table_states["sparse"]))
        pend = sum(len(p) for p in trainer._pending_zero["sparse"].values())
        leaf = list(trainer.table_states["sparse"].values())[0]
        checked = bad = 0
        for s in trainer.local_device_ids:
            live = set(trainer.engine.stores["sparse"][s].save()[1].tolist())
            d = np.asarray(_shard_data(leaf, s))
            rows = sorted(freed_by_shard[s] - live)
            checked += len(rows)
            bad += int((np.abs(d[rows]).sum(axis=1) > 0).sum())
        print(f"RESULT {pid} stale={stale} checked={checked} bad={bad} "
              f"pend={pend}", flush=True)
    elif mode == "evictsave":
        # save-with-pending-zeros: evict fills the pending-zero queue, then
        # a distributed save runs BEFORE any step drains it. The saved pool
        # must hold zeros at the freed rows (save_distributed zeroes the
        # saved copy), and a restore must clear the queue — otherwise the
        # next step would zero rows the restored store maps to live fids.
        from monolith_tpu.training.checkpoint import _shard_data
        spec = trainer.engine.tables["sparse"]
        cap = spec.capacity_per_shard
        for i in range(steps):
            fb, b = next_local()
            trainer.train_step(fb, b, ts=i)
        freed = trainer.evict_expired(expire_before=10 ** 9)["sparse"]
        fbs = {s: sorted((freed[(freed // cap) == s] % cap).tolist())
               for s in trainer.local_device_ids}
        checkpoint.save_distributed(trainer, ckpt_dir)
        pend = sum(len(p) for p in trainer._pending_zero["sparse"].values())
        # re-admit the universe so pools hold live data again
        fb, b = next_local()
        trainer.train_step(fb, b, ts=100)
        jax.block_until_ready(
            jax.tree.leaves(trainer.table_states["sparse"]))
        step = checkpoint.restore_distributed(trainer, ckpt_dir)
        pend_after = sum(len(p)
                         for p in trainer._pending_zero["sparse"].values())
        # freed rows must carry NO state from the evicted ids: params
        # exactly zero, optimizer slots exactly their fresh-create init
        # values (live-prefix checkpoints don't store freed rows at all;
        # restore pads them back to create_state semantics — slot init,
        # not whole-row zeros)
        from monolith_tpu.embedding import table as table_lib
        from monolith_tpu.training.checkpoint import _slot_init_values
        spec_t = trainer.engine.tables["sparse"]
        init_of = _slot_init_values(spec_t)
        saved_nonzero = 0
        checked = 0
        state_t = trainer.table_states["sparse"]
        for s in trainer.local_device_ids:
            sh = jax.tree.map(lambda x: _shard_data(x, s), state_t)
            rows = fbs[s]
            checked += len(rows)
            bad_rows = (
                np.abs(table_lib.params_np(spec_t, sh)[rows]).sum(axis=1) > 0)
            for name, arr in table_lib.slot_items_np(spec_t, sh):
                bad_rows |= (np.abs(arr[rows] - init_of.get(name, 0.0))
                             .sum(axis=1) > 0)
            saved_nonzero += int(bad_rows.sum())
        out = trainer.train_step(*next_local(), ts=200)
        post = float(np.asarray(out["loss"]))
        print(f"RESULT {pid} step={step} pend={pend} pend_after={pend_after} "
              f"checked={checked} saved_nonzero={saved_nonzero} "
              f"post={post:.5f}", flush=True)
    elif mode == "multislot":
        for i in range(steps):
            fb, b = next_local()
            out = trainer.train_step(fb, b, ts=i)
            losses.append(float(np.asarray(out["loss"])))
        pairs = [next_local() for _ in range(2)]  # block path, T=3 tables
        out = trainer.train_step_block(pairs, ts=steps)
        losses.extend(np.asarray(out["loss"]).tolist())
        assert all(np.isfinite(losses)), losses
        sizes = {t: sum(trainer.engine.stores[t][s].size()
                        for s in trainer.local_device_ids)
                 for t in sorted(trainer.engine.tables)}
        assert all(v > 0 for v in sizes.values()), sizes
        print(f"RESULT {pid} first={np.mean(losses[:3]):.5f} "
              f"last={np.mean(losses[-3:]):.5f} sizes={sizes}", flush=True)
    else:
        raise ValueError(mode)


if __name__ == "__main__":
    main()
