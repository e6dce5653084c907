"""Serving stack tests: export/load parity, gRPC agent, parameter sync,
discovery, streaming realtime loop. Covers the reference's serving tests
(agent_v3_test, replica_manager_test, distributed_serving_ops_test) with the
in-process stand-ins."""

import time

import numpy as np
import pytest

from monolith_tpu.data.synthetic import SyntheticCTR
from monolith_tpu.embedding.engine import EngineConfig
from monolith_tpu.models.deepfm import DeepFMTask
from monolith_tpu.serving import (FileDiscovery, ParameterSyncClient,
                                  ServingAgent, ServingClient, ServingModel,
                                  SyncClientManager, export_model)
from monolith_tpu.serving import codec
from monolith_tpu.training.streaming import StreamingConfig, StreamingTrainer
from monolith_tpu.training.trainer import Trainer, TrainerConfig


def make_task():
    return DeepFMTask(embedding_dim=8, capacity_per_shard=4096, hidden=(16, 8))


def make_trainer(record_touch=False, seed=51):
    cfg = TrainerConfig(engine=EngineConfig(num_shards=1, unique_cap=512,
                                            new_cap=512,
                                            record_touch=record_touch),
                        log_every=0, seed=seed)
    return Trainer(make_task(), cfg)


def train_some(trainer, steps=30, seed=51, batch_size=128):
    data = SyntheticCTR(num_users=80, num_items=40, batch_size=batch_size,
                        seed=seed)
    it = iter(data)
    for _ in range(steps):
        fb, b = next(it)
        trainer.train_step(fb, b)
    return data


class TestCodec:
    def test_roundtrip(self):
        d = {"a": np.arange(6, dtype=np.int64).reshape(2, 3),
             "s": "hello", "i": 42, "f": 2.5, "b": b"\x00\x01"}
        out = codec.unpack(codec.pack(d))
        np.testing.assert_array_equal(out["a"], d["a"])
        assert out["s"] == "hello" and out["i"] == 42
        assert out["f"] == 2.5 and out["b"] == b"\x00\x01"


class TestExportServe:
    def test_export_and_predict_parity(self, tmp_path):
        trainer = make_trainer()
        data = train_some(trainer)
        path = export_model(trainer, str(tmp_path))
        model = ServingModel(make_task(), path)

        fb, b = data.batch()
        serving_preds = model.predict(fb, b)
        # trainer-side eval on the identical batch
        inputs, _ = trainer.engine.prepare_batch(fb, ts=0)
        if trainer._jit_eval is None:
            trainer._jit_eval = trainer._build_eval()
        import jax.numpy as jnp
        _, train_preds, _ = trainer._jit_eval(
            trainer.table_states, trainer.params, trainer.model_state, inputs,
            {k: jnp.asarray(v) for k, v in b.items()}, np.int32(trainer.step))
        np.testing.assert_allclose(serving_preds, np.asarray(train_preds),
                                   rtol=1e-4, atol=1e-5)

    def test_missing_ids_predict_cold(self, tmp_path):
        trainer = make_trainer()
        train_some(trainer, steps=5)
        path = export_model(trainer, str(tmp_path))
        model = ServingModel(make_task(), path)
        fb = {"user_id": np.array([[999_999_999]], np.int64),
              "item_id": np.array([[888_888_888]], np.int64),
              "hist_items": np.full((1, 10), -1, np.int64)}
        preds = model.predict(fb, {"label": np.zeros(1, np.float32)})
        assert np.isfinite(preds).all()

    def test_apply_delta_changes_prediction(self, tmp_path):
        trainer = make_trainer()
        data = train_some(trainer, steps=10)
        path = export_model(trainer, str(tmp_path))
        model = ServingModel(make_task(), path)
        fb, b = data.batch()
        before = model.predict(fb, b)
        # push a big delta for the batch's user ids
        uid = np.unique(fb["user_id"].ravel())
        dim = make_task().tables()[0].dim
        model.apply_delta("sparse", uid, np.full((len(uid), dim), 5.0, np.float32))
        after = model.predict(fb, b)
        assert not np.allclose(before, after)


class TestAgentRpc:
    def test_predict_and_push_over_grpc(self, tmp_path):
        trainer = make_trainer()
        data = train_some(trainer, steps=10)
        path = export_model(trainer, str(tmp_path))
        model = ServingModel(make_task(), path)
        agent = ServingAgent(model, port=0)
        addr = agent.start()
        try:
            client = ServingClient(addr)
            fb, b = data.batch()
            preds = client.predict(fb, {"label": b["label"]})
            assert preds.shape == (len(b["label"]),)
            local = model.predict(fb, {"label": b["label"]})
            np.testing.assert_allclose(preds, local, rtol=1e-5)

            sync_client = ParameterSyncClient(addr)
            fids = np.array([123456789], np.int64)
            dim = make_task().tables()[0].dim
            acked = sync_client.push("m", "sparse", fids,
                                     np.ones((1, dim), np.float32))
            assert acked == 1
            assert model.stores["sparse"].lookup(fids)[0] >= 0
        finally:
            agent.stop()


class TestDiscovery:
    def test_register_query_ttl(self, tmp_path):
        d = FileDiscovery(str(tmp_path), ttl_seconds=0.2)
        d.register("serving", 0, "host:1")
        d.register("serving", 1, "host:2")
        assert d.query("serving") == {0: "host:1", 1: "host:2"}
        time.sleep(0.3)
        assert d.query("serving") == {}
        d.register("serving", 0, "host:1")
        d.deregister("serving", 0, "host:1")
        assert d.query("serving") == {}


class TestRealtime:
    def test_streaming_sync_converges_serving_to_trainer(self, tmp_path):
        # export a cold model, serve it, stream-train with sync, and check
        # the serving replica's predictions track the trainer's
        trainer = make_trainer(record_touch=True)
        data = train_some(trainer, steps=5, seed=52)
        path = export_model(trainer, str(tmp_path))
        model = ServingModel(make_task(), path)
        agent = ServingAgent(model, port=0,
                             discovery=FileDiscovery(str(tmp_path / "disc")),
                             replica_index=0)
        addr = agent.start()
        try:
            sync = SyncClientManager("m", static_targets=[addr])
            st = StreamingTrainer(trainer, sync,
                                  StreamingConfig(sync_interval_steps=10))

            def stream():
                it = iter(data)
                for _ in range(40):
                    yield next(it)

            res = st.run(stream())
            assert res["pushed_rows"] > 0 and res["sync_rounds"] >= 4

            fb, b = data.batch()
            serving_preds = model.predict(fb, b)
            inputs, _ = trainer.engine.prepare_batch(fb, ts=0)
            if trainer._jit_eval is None:
                trainer._jit_eval = trainer._build_eval()
            import jax.numpy as jnp
            _, train_preds, _ = trainer._jit_eval(
                trainer.table_states, trainer.params, trainer.model_state,
                inputs, {k: jnp.asarray(v) for k, v in b.items()},
                np.int32(trainer.step))
            # dense params differ (serving has the export-time tower), but
            # sparse rows are synced: correlation must be high
            corr = np.corrcoef(serving_preds, np.asarray(train_preds))[0, 1]
            assert corr > 0.8, f"serving does not track trainer: corr={corr}"
        finally:
            agent.stop()

    def test_dense_reload_over_grpc(self, tmp_path):
        from flax import serialization
        import jax
        trainer = make_trainer()
        data = train_some(trainer, steps=5)
        path = export_model(trainer, str(tmp_path))
        model = ServingModel(make_task(), path)
        agent = ServingAgent(model, port=0)
        addr = agent.start()
        try:
            client = ServingClient(addr)
            fb, b = data.batch()
            before = client.predict(fb, {"label": b["label"]})
            train_some(trainer, steps=20)  # dense tower moves
            dense_bytes = serialization.to_bytes(jax.device_get(trainer.params))
            client.reload_dense(dense_bytes)
            after = client.predict(fb, {"label": b["label"]})
            assert not np.allclose(before, after)
        finally:
            agent.stop()


class TestShardedServing:
    """Row-sharded serving (ref DistributedExporter entry + ps_i graphs):
    N replicas each hold a row shard; an entry router fans lookups out and
    merges. Predictions must match the single-replica model bit-for-bit."""

    def test_two_replica_router_matches_single(self, tmp_path):
        from monolith_tpu.serving.router import ShardedServingRouter

        trainer = make_trainer()
        data = train_some(trainer, steps=20)
        path = export_model(trainer, str(tmp_path))

        single = ServingModel(make_task(), path)
        shards = {s: ServingModel(make_task(), path, shard_index=s,
                                  num_row_shards=2) for s in range(2)}
        # the row split is a partition: shard sizes sum to the single total
        total = sum(m.table_sizes()["sparse"] for m in shards.values())
        assert total == single.table_sizes()["sparse"]
        assert all(m.table_sizes()["sparse"] > 0 for m in shards.values())

        router = ShardedServingRouter(make_task(), path, shards)
        for _ in range(3):
            fb, b = data.batch()
            np.testing.assert_array_equal(router.predict(fb, b),
                                          single.predict(fb, b))

    def test_router_over_grpc_replicas(self, tmp_path):
        from monolith_tpu.serving.router import ShardedServingRouter

        trainer = make_trainer()
        data = train_some(trainer, steps=10)
        path = export_model(trainer, str(tmp_path))
        single = ServingModel(make_task(), path)

        agents = []
        clients = {}
        try:
            for s in range(2):
                m = ServingModel(make_task(), path, shard_index=s,
                                 num_row_shards=2)
                a = ServingAgent(m, port=0)
                a.start()
                agents.append(a)
                clients[s] = ServingClient(a.addr)
            router = ShardedServingRouter(make_task(), path, clients)
            fb, b = data.batch()
            np.testing.assert_array_equal(router.predict(fb, b),
                                          single.predict(fb, b))
        finally:
            for a in agents:
                a.stop()

    def test_routed_push_lands_on_owning_shard(self, tmp_path):
        from monolith_tpu.embedding.host_store import shard_of
        from monolith_tpu.serving.router import ShardedServingRouter

        trainer = make_trainer()
        train_some(trainer, steps=5)
        path = export_model(trainer, str(tmp_path))
        dim = make_task().tables()[0].dim

        agents, targets, models = [], [], []
        try:
            for s in range(2):
                m = ServingModel(make_task(), path, shard_index=s,
                                 num_row_shards=2)
                a = ServingAgent(m, port=0)
                a.start()
                models.append(m)
                agents.append(a)
                targets.append(a.addr)
            mgr = SyncClientManager("demo", static_targets=targets)
            fids = np.arange(10_000, 10_064, dtype=np.int64)
            vals = np.random.default_rng(0).normal(
                size=(len(fids), dim)).astype(np.float32)
            acks = mgr.push_routed("sparse", fids, vals, num_row_shards=2)
            # every pushed row applied exactly once, on its owning shard
            assert sum(acks.values()) == len(fids)
            for s, m in enumerate(models):
                mine = np.array([f for f in fids if shard_of(int(f), 2) == s])
                got = m.lookup_rows("sparse", mine)
                np.testing.assert_allclose(
                    got, vals[[int(np.where(fids == f)[0][0]) for f in mine]],
                    rtol=1e-6)
                other = np.array([f for f in fids
                                  if shard_of(int(f), 2) != s])
                np.testing.assert_array_equal(
                    m.lookup_rows("sparse", other), 0.0)
        finally:
            for a in agents:
                a.stop()


class TestVersionHotSwap:
    def test_reload_export_swaps_to_new_version(self, tmp_path):
        """ServingModel.reload_export + VersionWatcher: the reference's
        agent/TFS version loop (tfs_monitor + replica_manager — watch the
        model dir, load the new version, swap). Predictions after the swap
        must match a fresh load of the new export; realtime delta pushes
        keep applying to the swapped state."""
        from monolith_tpu.serving.agent import VersionWatcher

        trainer = make_trainer()
        data = train_some(trainer, steps=20)
        base = str(tmp_path)
        path_a = export_model(trainer, base)
        model = ServingModel(make_task(), path_a)
        watcher = VersionWatcher(model, base, poll_s=999)  # manual polls
        assert not watcher.poll_once()  # already on the latest version

        fb, b = next(iter(data))
        preds_a = model.predict(fb, b)

        # train further and export version B
        train_some(trainer, steps=25, seed=52)
        path_b = export_model(trainer, base)
        assert path_b != path_a
        assert watcher.poll_once()  # pointer advanced -> hot swap
        assert watcher.swaps == 1 and model.step > 0

        preds_b = model.predict(fb, b)
        fresh = ServingModel(make_task(), path_b)
        np.testing.assert_allclose(preds_b, fresh.predict(fb, b),
                                   rtol=1e-6, atol=1e-6)
        assert not np.allclose(preds_a, preds_b)  # really a new version

        # delta pushes still apply post-swap
        tname = next(iter(model.tables))
        dim = model.tables[tname].dim
        applied = model.apply_delta(tname, np.array([999999], np.int64),
                                    np.ones((1, dim), np.float32))
        assert applied == 1
        vals = model.lookup_rows(tname, np.array([999999], np.int64))
        np.testing.assert_array_equal(vals, np.ones((1, dim), np.float32))


class TestBinnedMergeServing:
    def test_binned_merge_export_serving_roundtrip(self, tmp_path):
        """VERDICT r3 #8: a model trained with merge_max_bytes binning
        (the f32 escape for the >2GB Pallas DMA cliff, PERF.md) must
        export and SERVE identically to the single-pool merged model —
        the serving engine loads per-(physical-)table dumps, so binning
        must be invisible end-to-end, not just in training losses."""
        from monolith_tpu.data.synthetic import SyntheticMultiSlot
        from monolith_tpu.models.multislot import MultiSlotTask

        preds = {}
        for cap_bytes in (0, 3 * 8192 * 512):  # 0 = one pool; else ~2 bins
            task = MultiSlotTask(num_tables=4, num_slots=10, embedding_dim=8,
                                 capacity_per_shard=8192, history_length=6,
                                 hidden=(32,), init_scale=0.0, merge=True,
                                 merge_max_bytes=cap_bytes)
            if cap_bytes:
                assert len([s.name for s in task.tables()]) > 1
            tr = Trainer(task, TrainerConfig(
                engine=EngineConfig(unique_cap=4096, new_cap=4096),
                log_every=0))
            data = SyntheticMultiSlot(num_slots=10, vocab_per_slot=300,
                                      history_length=6, batch_size=256,
                                      seed=3)
            it = iter(data)
            for _ in range(10):
                fb, b = next(it)
                tr.train_step(fb, b)
            path = export_model(tr, str(tmp_path / f"bin{cap_bytes}"))
            model = ServingModel(task, path)
            fb, b = next(it)  # a batch with ids both seen and unseen
            preds[cap_bytes] = np.asarray(model.predict(fb, b))
        vals = list(preds.values())
        assert np.isfinite(vals[0]).all()
        np.testing.assert_array_equal(vals[0], vals[1])
