"""End-to-end local training test: DeepFM on synthetic CTR.

Parity gate vs reference cpu_training_test.py (local_train end-to-end with
features, admission, expiry, save/restore — :297-418)."""

import itertools

import jax
import numpy as np
import pytest

from monolith_tpu.data.synthetic import SyntheticCTR
from monolith_tpu.embedding.engine import EngineConfig
from monolith_tpu.models.deepfm import DeepFMTask
from monolith_tpu.training import checkpoint
from monolith_tpu.training.trainer import Trainer, TrainerConfig


def small_task(**kw):
    defaults = dict(embedding_dim=8, capacity_per_shard=8192, hidden=(32, 16))
    defaults.update(kw)
    return DeepFMTask(**defaults)


def small_trainer(task=None, **cfg_kw):
    cfg = TrainerConfig(engine=EngineConfig(num_shards=1, unique_cap=2048,
                                            new_cap=2048),
                        log_every=0, **cfg_kw)
    return Trainer(task or small_task(), cfg)


class TestLocalTrain:
    def test_auc_improves_over_training(self):
        data = SyntheticCTR(num_users=100, num_items=60, batch_size=512, seed=3)
        trainer = small_trainer()
        it = iter(data)
        trainer.train(it, steps=150)
        trainer.auc.reset()
        trainer.loss_mean.reset()
        trainer.train(it, steps=50)
        trained_auc = trainer.auc.result()
        assert trained_auc > 0.60, f"AUC too low: {trained_auc}"

    def test_eval_matches_training_distribution(self):
        data = SyntheticCTR(num_users=100, num_items=60, batch_size=512, seed=4)
        trainer = small_trainer()
        trainer.train(iter(data), steps=120)
        result = trainer.evaluate(iter(data), max_steps=20)
        assert result["auc"] > 0.58

    def test_admission_threshold_limits_table_growth(self):
        data = SyntheticCTR(num_users=2000, num_items=1000, batch_size=128, seed=5)
        t_all = small_trainer(small_task(admission_threshold=1))
        t_filt = small_trainer(small_task(admission_threshold=3))
        t_all.train(iter(data), steps=10)
        data2 = SyntheticCTR(num_users=2000, num_items=1000, batch_size=128, seed=5)
        t_filt.train(iter(data2), steps=10)
        size_all = t_all.engine.stores["sparse"][0].size()
        size_filt = t_filt.engine.stores["sparse"][0].size()
        assert size_filt < size_all * 0.8


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        data = SyntheticCTR(num_users=200, num_items=100, batch_size=64, seed=6)
        trainer = small_trainer()
        it = iter(data)
        trainer.train(it, steps=30)
        eval_before = trainer.evaluate(iter(SyntheticCTR(
            num_users=200, num_items=100, batch_size=64, seed=6)), max_steps=10)
        path = checkpoint.save(trainer, str(tmp_path))
        assert checkpoint.latest_step(str(tmp_path)) == 30

        # fresh trainer, restore, same eval
        trainer2 = small_trainer()
        fid_batch, batch = data.batch()
        inputs, _ = trainer2.engine.prepare_batch(fid_batch, ts=0)
        trainer2._maybe_init(inputs, batch)
        checkpoint.restore(trainer2, str(tmp_path))
        assert trainer2.step == 30
        eval_after = trainer2.evaluate(iter(SyntheticCTR(
            num_users=200, num_items=100, batch_size=64, seed=6)), max_steps=10)
        np.testing.assert_allclose(eval_after["auc"], eval_before["auc"], atol=1e-6)
        np.testing.assert_allclose(eval_after["loss"], eval_before["loss"], rtol=1e-5)

    def test_save_is_live_prefix_not_full_capacity(self, tmp_path):
        """Table files store pool[:high_water], not the full capacity pool
        (the reference dumps only live entries, EntryDump; a full-capacity
        readback costs minutes over tunnel/PCIe, PERF.md round-4). Restore
        pads back: params zero, slots at optimizer init — bit-identical
        training afterwards is covered by the roundtrip test above."""
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=8)
        trainer = small_trainer()
        trainer.train(iter(data), steps=5)
        path = checkpoint.save(trainer, str(tmp_path))
        spec = trainer.engine.tables["sparse"]
        store = trainer.engine.stores["sparse"][0]
        _, rows, _, _ = store.save()
        hw = int(rows.max()) + 1
        assert hw < spec.capacity_per_shard  # test is vacuous otherwise
        import os as _os
        z = np.load(_os.path.join(path, "tables", "sparse-s0.npz"))
        assert z["pool"].shape[0] == hw
        for k in z.files:
            if k.startswith("slot:"):
                assert z[k].shape[0] == hw

    def test_restore_resharded_1_to_8(self, tmp_path):
        """Save from a 1-shard trainer, restore into an 8-shard sharded
        trainer: every entry must be re-routed to its hash shard with exact
        params + optimizer slots (same eval results)."""
        from monolith_tpu.parallel import ShardedTrainer, make_mesh

        data = SyntheticCTR(num_users=200, num_items=100, batch_size=64, seed=6)
        trainer = small_trainer()
        trainer.train(iter(data), steps=20)
        eval_before = trainer.evaluate(iter(SyntheticCTR(
            num_users=200, num_items=100, batch_size=64, seed=6)), max_steps=8)
        checkpoint.save(trainer, str(tmp_path))

        task8 = small_task(capacity_per_shard=2048)
        cfg8 = TrainerConfig(engine=EngineConfig(num_shards=8, unique_cap=512,
                                                 new_cap=512), log_every=0)
        tr8 = ShardedTrainer(task8, cfg8, make_mesh(8))
        fid_batch, batch = data.batch()
        inputs, _ = tr8.engine.prepare_batch(fid_batch, ts=0)
        tr8._maybe_init(inputs, batch)
        checkpoint.restore(tr8, str(tmp_path))
        assert tr8.step == 20
        # host maps agree with the original: same fids live, same total count
        n_total = sum(s.size() for s in tr8.engine.stores["sparse"])
        assert n_total == trainer.engine.stores["sparse"][0].size()
        eval_after = tr8.evaluate(iter(SyntheticCTR(
            num_users=200, num_items=100, batch_size=64, seed=6)), max_steps=8)
        np.testing.assert_allclose(eval_after["auc"], eval_before["auc"],
                                   atol=1e-5)
        np.testing.assert_allclose(eval_after["loss"], eval_before["loss"],
                                   rtol=1e-4)
        # training continues after a resharded restore
        out = tr8.train_step(fid_batch, batch)
        assert np.isfinite(float(out["loss"]))

    def test_restore_resharded_8_to_1(self, tmp_path):
        """Scale DOWN: 8-shard checkpoint into a single-device trainer."""
        from monolith_tpu.parallel import ShardedTrainer, make_mesh

        data = SyntheticCTR(num_users=150, num_items=80, batch_size=64, seed=9)
        task8 = small_task(capacity_per_shard=2048)
        cfg8 = TrainerConfig(engine=EngineConfig(num_shards=8, unique_cap=512,
                                                 new_cap=512), log_every=0)
        tr8 = ShardedTrainer(task8, cfg8, make_mesh(8))
        for _ in range(15):
            fb, b = next(iter(data))
            tr8.train_step(fb, b)
        eval_before = tr8.evaluate(iter(SyntheticCTR(
            num_users=150, num_items=80, batch_size=64, seed=9)), max_steps=8)
        checkpoint.save(tr8, str(tmp_path))

        tr1 = small_trainer()
        fid_batch, batch = data.batch()
        inputs, _ = tr1.engine.prepare_batch(fid_batch, ts=0)
        tr1._maybe_init(inputs, batch)
        checkpoint.restore(tr1, str(tmp_path))
        eval_after = tr1.evaluate(iter(SyntheticCTR(
            num_users=150, num_items=80, batch_size=64, seed=9)), max_steps=8)
        np.testing.assert_allclose(eval_after["auc"], eval_before["auc"],
                                   atol=1e-5)

    def test_reshard_capacity_overflow_raises(self, tmp_path):
        data = SyntheticCTR(num_users=400, num_items=200, batch_size=128, seed=6)
        trainer = small_trainer()
        trainer.train(iter(data), steps=10)
        checkpoint.save(trainer, str(tmp_path))
        tiny = small_task(capacity_per_shard=4)  # cannot hold the entries
        cfg = TrainerConfig(engine=EngineConfig(num_shards=2, unique_cap=64,
                                                new_cap=64), log_every=0)
        tr2 = Trainer(tiny, cfg)
        fid_batch, batch = data.batch()
        inputs, _ = tr2.engine.prepare_batch(fid_batch, ts=0)
        tr2._maybe_init(inputs, batch)
        with pytest.raises(ValueError, match="capacity_per_shard"):
            checkpoint.restore(tr2, str(tmp_path))

    def test_training_continues_after_restore(self, tmp_path):
        data = SyntheticCTR(num_users=200, num_items=100, batch_size=64, seed=7)
        trainer = small_trainer()
        it = iter(data)
        trainer.train(it, steps=20)
        checkpoint.save(trainer, str(tmp_path))

        trainer2 = small_trainer()
        fid_batch, batch = data.batch()
        inputs, _ = trainer2.engine.prepare_batch(fid_batch, ts=0)
        trainer2._maybe_init(inputs, batch)
        checkpoint.restore(trainer2, str(tmp_path))
        trainer2.train(it, steps=20)
        assert trainer2.step == 40

    def test_dense_only_checkpoint(self, tmp_path):
        trainer = small_trainer()
        data = SyntheticCTR(num_users=100, num_items=50, batch_size=32, seed=8)
        trainer.train(iter(data), steps=5)
        checkpoint.save(trainer, str(tmp_path), dense_only=True)
        import json, os
        with open(os.path.join(str(tmp_path), "ckpt-5", "meta.json")) as f:
            assert json.load(f)["dense_only"]


class TestDeviceMetrics:
    """metrics_enabled must accumulate loss/AUC ON DEVICE (no per-step
    host readback) and match host-side metric computation on drain."""

    def test_device_metrics_match_host(self):
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.metrics import StreamingAUC, StreamingMean
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = DeepFMTask(embedding_dim=8, capacity_per_shard=2048,
                          hidden=(16,))
        tr = Trainer(task, TrainerConfig(log_every=0, metrics_enabled=True,
                                         seed=3))
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=3)
        ref_auc, ref_loss = StreamingAUC(), StreamingMean()
        it = iter(data)
        for _ in range(10):
            fb, b = next(it)
            out = tr.train_step(fb, b)
            ref_auc.update(np.asarray(out["preds"]), b["label"])
            ref_loss.update(float(out["loss"]))
        tr._drain_metrics()
        assert abs(tr.auc.result() - ref_auc.result()) < 1e-3
        assert abs(tr.loss_mean.result() - ref_loss.result()) < 1e-5
        # drain resets the device state: second drain adds nothing
        a = tr.auc.result()
        tr._drain_metrics()
        assert tr.auc.result() == a

    def test_block_mode_metrics(self):
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = DeepFMTask(embedding_dim=8, capacity_per_shard=2048,
                          hidden=(16,), init_scale=0.0)
        tr = Trainer(task, TrainerConfig(log_every=0, metrics_enabled=True,
                                         steps_per_dispatch=4, seed=5))
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=5)
        res = tr.train(iter(data), steps=9)
        assert 0.0 < res["auc"] < 1.0
        assert res["loss"] > 0
        assert tr.loss_mean.count == 9  # every step counted exactly once


class TestAsyncOptimize:
    """1-step-stale pipelined embeddings (EngineConfig.async_optimize, ref
    enable_async_optimize cpu_training.py:488): the forward reads rows
    before the previous step's write-back lands; the optimize runs on the
    fresh rows so updates are never lost; DC compensates stale gradients."""

    def _run(self, pairs, async_mode, dc_lambda=None, seed=9):
        import dataclasses as dc

        from monolith_tpu.embedding import optimizers
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = DeepFMTask(embedding_dim=8, capacity_per_shard=2048,
                          hidden=(16,), init_scale=0.0)
        if dc_lambda is not None:
            base_tables = task.tables()

            class DCTask(DeepFMTask):
                def tables(self):
                    t = base_tables[0]
                    segs = tuple(
                        dc.replace(s, optimizer=optimizers.DC(
                            lambda_=dc_lambda, base=s.optimizer))
                        for s in t.segments)
                    return [dc.replace(t, segments=segs)]

            task = DCTask(embedding_dim=8, capacity_per_shard=2048,
                          hidden=(16,), init_scale=0.0)
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(unique_cap=256, new_cap=256,
                                async_optimize=async_mode),
            log_every=0, seed=seed, steps_per_dispatch=len(pairs)))
        tr.train_step(*pairs[0])           # init (single, synchronous)
        tr.train_step_block(pairs[1:])
        return tr

    @staticmethod
    def _pairs(id_sets, batch=16):
        rng = np.random.default_rng(0)
        pairs = []
        for ids in id_sets:
            uid = rng.choice(ids, size=(batch, 1))
            iid = rng.choice(ids, size=(batch, 1))
            hist = rng.choice(ids, size=(batch, 10))
            fb = {"user_id": uid.astype(np.int64),
                  "item_id": iid.astype(np.int64),
                  "hist_items": hist.astype(np.int64)}
            b = {"label": rng.integers(0, 2, batch).astype(np.float32)}
            pairs.append((fb, b))
        return pairs

    def test_disjoint_steps_match_sync_exactly(self):
        # no id appears in two consecutive steps -> zero staleness -> the
        # async pipeline must be bit-identical to the synchronous block
        sets = [np.arange(100 * k, 100 * k + 50) for k in range(5)]
        pairs = self._pairs(sets)
        t_sync = self._run(pairs, async_mode=False)
        t_async = self._run(pairs, async_mode=True)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            t_sync.table_states, t_async.table_states)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                     t_sync.params, t_async.params)

    def test_overlap_never_loses_updates_and_dc_engages(self):
        # same ids every step: forward is stale but optimize must see the
        # previous step's update (no lost writes), and DC(lambda>0) must
        # change the trajectory vs lambda=0
        sets = [np.arange(0, 50)] * 5
        pairs = self._pairs(sets)
        t_sync = self._run(pairs, async_mode=False)
        t0 = self._run(pairs, async_mode=True, dc_lambda=0.0)
        # lambda large enough that the second-order correction term
        # (lambda * g^2 * (stale - latest)) is visible in f32
        t1 = self._run(pairs, async_mode=True, dc_lambda=1e4)

        def pool(tr):
            return np.asarray(tr.table_states["sparse"]["data"])

        # updates accumulated across all steps (not clobbered): the async
        # run's pool differs from sync only via staleness, not lost steps —
        # magnitudes stay comparable
        moved_sync = np.abs(pool(t_sync)).sum()
        moved_async = np.abs(pool(t0)).sum()
        assert moved_async > 0.5 * moved_sync
        # DC compensation engaged
        assert not np.allclose(pool(t0), pool(t1))
        assert np.isfinite(pool(t1)).all()


    def test_dc_stale_apply_formula(self):
        """optimize_packed with stale rows applies the reference DC formula
        g' = g + lambda*g^2*(stale - latest) (dc_optimizer.cc:38-40)."""
        import jax.numpy as jnp

        from monolith_tpu.embedding import initializers, optimizers
        from monolith_tpu.embedding import table as table_lib
        from monolith_tpu.embedding.spec import TableSegment, TableSpec

        lam, lr = 0.5, 1.0
        spec = TableSpec(
            name="t", capacity_per_shard=8,
            segments=(TableSegment(
                dim=4, optimizer=optimizers.DC(
                    learning_rate=lr, lambda_=lam,
                    base=optimizers.SGD(learning_rate=lr)),
                initializer=initializers.Zeros()),))
        P = table_lib.packed_padded_width(spec)
        rng = np.random.default_rng(0)
        latest = jnp.asarray(rng.normal(size=(3, P)).astype(np.float32))
        stale = jnp.asarray(rng.normal(size=(3, P)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
        out = table_lib.optimize_packed(spec, latest, g, jnp.int32(0),
                                        stale=stale)
        g_comp = g + lam * g * g * (stale[:, :4] - latest[:, :4])
        np.testing.assert_allclose(np.asarray(out[:, :4]),
                                   np.asarray(latest[:, :4] - lr * g_comp),
                                   rtol=1e-5)
        # without stale, DC degenerates to its base optimizer
        out2 = table_lib.optimize_packed(spec, latest, g, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(out2[:, :4]),
                                   np.asarray(latest[:, :4] - lr * g),
                                   rtol=1e-5)


def test_async_optimize_with_per_table_caps():
    """async block dispatch must carry per-table pending shapes (regression:
    zero_pending once used the global unique_cap for every table)."""
    from monolith_tpu.data.synthetic import SyntheticMultiSlot
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.multislot import MultiSlotTask
    from monolith_tpu.training.trainer import Trainer, TrainerConfig

    task = MultiSlotTask(num_tables=2, num_slots=4, embedding_dim=8,
                         capacity_per_shard=4096, history_length=6,
                         hidden=(16,))
    tr = Trainer(task, TrainerConfig(
        engine=EngineConfig(unique_cap=128, new_cap=128,
                            unique_caps=(("table_hist", 512),),
                            new_caps=(("table_hist", 512),),
                            async_optimize=True),
        log_every=0, steps_per_dispatch=3))
    data = SyntheticMultiSlot(num_slots=4, vocab_per_slot=300,
                              history_length=6, batch_size=64, seed=6)
    res = tr.train(iter(data), steps=7)
    assert np.isfinite(res["loss"])
