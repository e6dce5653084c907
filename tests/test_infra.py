"""Infra tests: metrics client, deep insight, hooks, controller service,
config system, dense optimizers, estimator facade, model dump."""

import json
import time

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from monolith_tpu.config import InstantiableParams, Params, extract_flags, parse_into
from monolith_tpu.data.synthetic import SyntheticCTR
from monolith_tpu.embedding.engine import EngineConfig
from monolith_tpu.estimator import Estimator, RunnerConfig
from monolith_tpu.model_dump import dump_model
from monolith_tpu.models.deepfm import DeepFMTask
from monolith_tpu.optimizers import adamom, adamom_v2, rmsprop_v2, shampoo
from monolith_tpu.training.controller import ControllerClient, TrainingController
from monolith_tpu.training.hooks import (ExchangeMetricsHook, MachineInfoHook,
                                         ThroughputHook, machine_info)
from monolith_tpu.training.trainer import Trainer, TrainerConfig
from monolith_tpu.utils.deep_insight import DeepInsightClient
from monolith_tpu.utils.metrics_client import MetricClient


def small_task():
    return DeepFMTask(embedding_dim=8, capacity_per_shard=4096, hidden=(16, 8))


def small_trainer():
    return Trainer(small_task(), TrainerConfig(
        engine=EngineConfig(num_shards=1, unique_cap=512, new_cap=512),
        log_every=0))


class TestMetrics:
    def test_counters_timers_stores(self):
        m = MetricClient(prefix="t")
        m.emit_counter("reqs", 1, tags={"ps": "0"})
        m.emit_counter("reqs", 2, tags={"ps": "0"})
        m.emit_store("qsize", 7.0)
        with m.timing("lat"):
            pass
        snap = m.snapshot()
        assert snap["counters"]["t.reqs|ps=0"] == 3
        assert snap["stores"]["t.qsize"] == 7.0
        assert snap["timers"]["t.lat"]["count"] == 1


class TestDeepInsight:
    def test_sampled_emission(self):
        c = DeepInsightClient("m", sample_rate=1.0)
        n = c.emit(np.array([1.0, 0.0]), np.array([0.9, 0.2]),
                   uids=np.array([5, 6]))
        assert n == 2
        assert c.buffer[0]["label"] == 1.0 and c.buffer[0]["uid"] == 5

    def test_downsampling(self):
        c = DeepInsightClient("m", sample_rate=0.1, seed=1)
        n = c.emit(np.ones(10000), np.ones(10000))
        assert abs(n / 10000 - 0.1) < 0.03


class TestHooksAndController:
    def test_hooks_run(self):
        tr = small_trainer()
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=71)
        m = MetricClient()
        tr.train(iter(data), steps=6,
                 hooks=[ThroughputHook(every=2, client=m),
                        MachineInfoHook(every=2, client=m),
                        ExchangeMetricsHook(every=2, client=m)])
        stores = m.snapshot()["stores"]
        assert any("throughput" in k for k in stores)
        # exchange-size metrics (ref --enable_alltoall_metrics histograms)
        assert any(k.startswith("exchange.unique") for k in stores), stores

    def test_machine_info(self):
        info = machine_info()
        assert "ts" in info and info.get("mem_total_kb", 0) > 0

    def test_controller_status_save_pause(self, tmp_path):
        tr = small_trainer()
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=72)
        ctl = TrainingController(tr, ckpt_dir=str(tmp_path))
        addr = ctl.start()
        try:
            client = ControllerClient(addr)
            tr.train(iter(data), steps=5, hooks=[ctl.hook])
            status = client.get_status()
            assert status["step"] == 5
            assert status["table:sparse:s0:size"] > 0
            client.save_checkpoint()
            tr.train(iter(data), steps=2, hooks=[ctl.hook])
            from monolith_tpu.training import checkpoint
            assert checkpoint.latest_step(str(tmp_path)) is not None
        finally:
            ctl.stop()


class TestConfig:
    def test_params_define_set_get(self):
        p = Params()
        p.define("lr", 0.1)
        child = Params()
        child.define("dim", 8)
        p.define("model", child)
        p.set(lr=0.5, **{"model.dim": 16})
        assert p.lr == 0.5 and p.get("model.dim") == 16
        with pytest.raises(AttributeError):
            p.undefined = 1
        p.freeze()
        with pytest.raises(AttributeError):
            p.lr = 0.9

    def test_instantiable(self):
        class Model:
            def __init__(self, params):
                self.dim = params.dim

        p = InstantiableParams(Model)
        p.define("dim", 32)
        m = p.instantiate()
        assert m.dim == 32

    def test_flags_bridge(self):
        import dataclasses

        @dataclasses.dataclass
        class Cfg:
            lr: float = 0.1
            steps: int = 10
            name: str = "x"
            flag: bool = False

        cfg = parse_into(Cfg, ["--lr", "0.5", "--flag", "true", "--junk", "1"])
        assert cfg.lr == 0.5 and cfg.steps == 10 and cfg.flag is True


class TestDenseOptimizers:
    def _fit(self, tx, steps=200):
        params = {"w": jnp.array([5.0, -3.0])}
        state = tx.init(params)

        def loss(p):
            return jnp.sum(p["w"] ** 2)

        import jax
        for _ in range(steps):
            g = jax.grad(loss)(params)
            upd, state = tx.update(g, state, params)
            params = optax.apply_updates(params, upd)
        return float(loss(params))

    def test_adamom_converges(self):
        # adamom takes near-constant lr-sized steps (sign-like); settle
        # amplitude scales with lr
        assert self._fit(adamom(learning_rate=0.02), steps=800) < 0.3

    def test_adamom_v2_converges(self):
        assert self._fit(adamom_v2(learning_rate=0.02), steps=800) < 0.3

    def test_rmsprop_v2_converges(self):
        assert self._fit(rmsprop_v2(learning_rate=0.1)) < 0.1

    @pytest.mark.slow
    def test_shampoo_matrix_converges(self):
        import jax
        tx = shampoo(learning_rate=0.3, update_preconditioner_every=5)
        params = {"w": jnp.ones((4, 3)) * 2.0}
        state = tx.init(params)

        def loss(p):
            return jnp.sum(p["w"] ** 2)

        for _ in range(150):
            g = jax.grad(loss)(params)
            upd, state = tx.update(g, state, params)
            params = optax.apply_updates(params, upd)
        assert float(loss(params)) < 0.1


class TestEstimator:
    def test_train_eval_predict_export(self, tmp_path):
        data = SyntheticCTR(num_users=60, num_items=30, batch_size=128, seed=73)
        est = Estimator(small_task(), RunnerConfig(model_dir=str(tmp_path / "m"),
                                                   unique_cap=512, new_cap=512,
                                                   log_every=0))
        res = est.train(iter(data), steps=20)
        assert "auc" in res
        ev = est.evaluate(iter(data), steps=5)
        assert 0 <= ev["auc"] <= 1
        preds = list(est.predict(iter(data), steps=2))
        assert len(preds) == 2 and preds[0].shape == (128,)
        path = est.export_saved_model(str(tmp_path / "exp"))
        import os
        assert os.path.exists(os.path.join(path, "meta.json"))

    def test_estimator_restores_from_model_dir(self, tmp_path):
        data = SyntheticCTR(num_users=60, num_items=30, batch_size=128, seed=74)
        est = Estimator(small_task(), RunnerConfig(model_dir=str(tmp_path),
                                                   unique_cap=512, new_cap=512,
                                                   log_every=0))
        est.train(iter(data), steps=10)
        est2 = Estimator(small_task(), RunnerConfig(model_dir=str(tmp_path),
                                                    unique_cap=512, new_cap=512,
                                                    log_every=0))
        est2.train(iter(data), steps=5)
        assert est2.trainer.step == 15


class TestModelDump:
    def test_dump_is_json_serializable(self):
        tr = small_trainer()
        data = SyntheticCTR(num_users=20, num_items=10, batch_size=32, seed=75)
        fb, b = data.batch()
        tr.train_step(fb, b)
        d = dump_model(tr)
        s = json.dumps(d, default=repr)
        assert "sparse" in d["tables"]
        assert d["dense_param_count"] > 0
        assert "Adagrad" in s

    def test_graph_dump_is_stablehlo(self):
        from monolith_tpu.model_dump import dump_graph
        tr = small_trainer()
        data = SyntheticCTR(num_users=20, num_items=10, batch_size=32,
                            seed=75)
        fb, b = data.batch()
        tr.train_step(fb, b)
        txt = dump_graph(tr, fb, b)
        # the archived artifact is the real compiler input
        assert "module @" in txt and "stablehlo" in txt
        assert "gather" in txt  # the embedding lookup is in the graph


class TestBatchNormSupport:
    """Models with mutable flax collections (BatchNorm batch_stats) must work
    in train/eval/ckpt (the reference's layers/norms.py BatchNorm usage)."""

    def test_batchnorm_model_trains_and_checkpoints(self, tmp_path):
        import dataclasses
        import flax.linen as nn

        class BNModule(nn.Module):
            @nn.compact
            def __call__(self, pooled, batch, training=False):
                import jax.numpy as jnp
                x = jnp.concatenate([pooled["user_id"], pooled["item_id"],
                                     pooled["hist_items"]], axis=1)
                x = nn.Dense(16)(x)
                x = nn.BatchNorm(use_running_average=not training)(x)
                x = nn.relu(x)
                return {"logits": nn.Dense(1)(x)[:, 0]}

        @dataclasses.dataclass
        class BNTask(DeepFMTask):
            def build_module(self):
                return BNModule()

        task = BNTask(embedding_dim=8, capacity_per_shard=2048)
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(num_shards=1, unique_cap=512, new_cap=512),
            log_every=0))
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=128, seed=77)
        it = iter(data)
        for _ in range(10):
            fb, b = next(it)
            out = tr.train_step(fb, b)
        assert "batch_stats" in tr.model_state
        import jax
        stats = jax.device_get(tr.model_state["batch_stats"])
        mean_leaf = jax.tree.leaves(stats)[0]
        assert np.abs(mean_leaf).sum() > 0  # running stats updated

        ev = tr.evaluate(iter(data), max_steps=3)
        assert np.isfinite(ev["loss"])

        # checkpoint roundtrip carries batch_stats
        from monolith_tpu.training import checkpoint
        checkpoint.save(tr, str(tmp_path))
        tr2 = Trainer(task, TrainerConfig(
            engine=EngineConfig(num_shards=1, unique_cap=512, new_cap=512),
            log_every=0))
        fb, b = data.batch()
        inputs, _ = tr2.engine.prepare_batch(fb, ts=0)
        tr2._maybe_init(inputs, b)
        checkpoint.restore(tr2, str(tmp_path))
        stats2 = jax.device_get(tr2.model_state["batch_stats"])
        np.testing.assert_allclose(jax.tree.leaves(stats2)[0], mean_leaf,
                                   rtol=1e-6)


class TestAlertManager:
    def test_checks_fire_and_emit(self, tmp_path):
        import json
        from monolith_tpu.utils.alerts import (AlertManager, FileEmitter,
                                               SourceLagCheck,
                                               TrainingProgressCheck)

        class FakeTrainer:
            step = 5

        t = FakeTrainer()
        path = str(tmp_path / "alerts.jsonl")
        mgr = AlertManager(emitter=FileEmitter(path))
        mgr.add_check(TrainingProgressCheck(t))
        lag = {"v": 0.0}
        mgr.add_check(SourceLagCheck(lambda: lag["v"], max_lag=100))

        assert mgr.run_checks_once() == []  # first progress check primes
        # stalled step + high lag -> two alerts
        lag["v"] = 500
        fired = mgr.run_checks_once()
        assert {a.name for a in fired} == {"training_progress", "source_lag"}
        # progressing step clears the progress alert
        t.step = 6
        lag["v"] = 0
        assert mgr.run_checks_once() == []
        lines = [json.loads(l) for l in open(path)]
        assert len(lines) == 2

    def test_broken_check_does_not_raise(self):
        from monolith_tpu.utils.alerts import AlertManager

        class Boom:
            name = "boom"

            def __call__(self):
                raise RuntimeError("nope")

        mgr = AlertManager(checks=[Boom()])
        fired = mgr.run_checks_once()
        assert len(fired) == 1 and "raised" in fired[0].message

    def test_thread_start_stop(self):
        from monolith_tpu.utils.alerts import AlertManager
        hits = []

        class C:
            name = "c"

            def __call__(self):
                hits.append(1)
                return "always"

        mgr = AlertManager(checks=[C()], check_interval_sec=0.05,
                           start_delay_sec=0.0)
        mgr.start()
        import time
        time.sleep(0.3)
        mgr.stop()
        assert len(hits) >= 2


class TestTideAndSlowStart:
    def test_tide_inside_window_noop(self):
        from monolith_tpu.training.hooks import TideHook
        # clock pinned to 12:00 UTC; window 10:00-14:00 -> no-op
        h = TideHook(10, 14, clock=lambda: 12 * 3600)
        h(None, None)  # must not block or raise

    def test_tide_outside_window_stops_loop(self, tmp_path):
        from monolith_tpu.training.hooks import TideHook
        tr = small_trainer()
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=73)
        # clock pinned to 02:00 UTC; window 10:00-14:00 -> outside
        h = TideHook(10, 14, block=False, ckpt_dir=str(tmp_path),
                     clock=lambda: 2 * 3600)
        res = tr.train(iter(data), steps=10, hooks=[h])
        assert tr.step == 1  # stopped after first step
        from monolith_tpu.training import checkpoint
        assert checkpoint.latest_step(str(tmp_path)) == 1

    def test_tide_window_wraps_midnight(self):
        from monolith_tpu.training.hooks import TideHook
        h = TideHook(22, 4, clock=lambda: 23 * 3600)   # 23:00 inside 22->04
        assert h._in_window()
        h.clock = lambda: 2 * 3600                      # 02:00 inside
        assert h._in_window()
        h.clock = lambda: 12 * 3600                     # 12:00 outside
        assert not h._in_window()

    def test_slow_start_waits_for_global_step(self):
        from monolith_tpu.training.hooks import SlowStartHook
        steps = iter([0, 1, 2, 3, 4, 5])
        h = SlowStartHook(wait_until_step=3, step_fn=lambda: next(steps),
                          poll_sec=0.0)
        h(None, None)
        assert h.started
        h(None, None)  # second call is a no-op (already started)

    def test_slow_start_timeout(self):
        from monolith_tpu.training.hooks import SlowStartHook
        h = SlowStartHook(wait_until_step=10**9, step_fn=lambda: 0,
                          max_wait_sec=0.0, poll_sec=0.0)
        h(None, None)
        assert h.started


class TestCompatAPI:
    """Reference-style FeatureSlot/FeatureColumn user API (compat.py) must
    build the same declarative specs and train end to end — the line-by-line
    port path for reference model code (native_model.py:911-1086)."""

    def test_builds_specs_and_trains(self):
        import flax.linen as nn
        import jax.numpy as jnp

        from monolith_tpu import compat
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.training.task import RecTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        fm = compat.FeatureFactory(default_capacity=4096)
        fc_user = fm.create_embedding_feature_column(
            "user_id", occurrence_threshold=0, has_bias=True)
        fc_item = fm.create_embedding_feature_column("item_id")
        # shared embedding: hist ids share the item slot (ref share_slot)
        fc_hist = fm.create_embedding_feature_column(
            "hist_items", shared_name="item_id", combiner="reduce_mean",
            max_seq_length=10)
        u_vec = fc_user.feature_slot.add_feature_slice(8)
        u_bias = fc_user.feature_slot.get_bias_slice()
        i_vec = fc_item.feature_slot.add_feature_slice(8)
        tables, features = fm.build()

        assert {t.name for t in tables} == {"user_id", "item_id"}
        assert fc_hist.feature_slot is fc_item.feature_slot
        user_tbl = next(t for t in tables if t.name == "user_id")
        assert user_tbl.dim == 9  # bias(1) + vec(8)
        assert u_bias.start == 0 and u_vec.start == 1

        class M(nn.Module):
            @nn.compact
            def __call__(self, pooled, batch, training=False):
                uv = compat.lookup_embedding_slice(pooled, fc_user, u_vec)
                ub = fc_user.embedding_lookup(pooled, u_bias)[:, 0]
                iv = fc_item.embedding_lookup(pooled, i_vec)
                hv = fc_hist.embedding_lookup(pooled, i_vec)  # mean pooled
                x = jnp.concatenate([uv * iv, uv * hv], axis=-1)
                logits = nn.Dense(1)(x)[:, 0] + ub
                return {"logits": logits}

        class T(RecTask):
            def tables(self):
                return tables

            def features(self):
                return features

            def build_module(self):
                return M()

        tr = Trainer(T(), TrainerConfig(
            engine=EngineConfig(unique_cap=512, new_cap=512), log_every=0))
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=64,
                            seed=9)
        it = iter(data)
        losses = []
        for i in range(15):
            out = tr.train_step(*next(it), ts=i)
            losses.append(float(np.asarray(out["loss"])))
        assert losses[-1] < losses[0]
        # shared slot: hist ids landed in the item table
        assert tr.engine.stores["item_id"][0].size() > 30


class TestCapTuning:
    def test_suggest_caps_covers_measured_uniques(self):
        from monolith_tpu.utils.tuning import (measure_unique_counts,
                                               suggest_caps)
        rng = np.random.default_rng(0)
        batches = [{"a": rng.integers(-1, 500, size=(64, 3)).astype(np.int64),
                    "b": rng.integers(0, 200, size=(64, 1)).astype(np.int64)}
                   for _ in range(4)]
        tf = {"t1": ["a"], "t2": ["b"]}
        m = measure_unique_counts(batches, tf)
        assert 0 < m["t2"] <= 64
        caps = suggest_caps(batches, tf, headroom=1.25)
        for t in tf:
            assert caps[t] >= m[t]
            assert caps[t] % 128 == 0
        # the caps must actually hold every sampled batch without overflow
        from monolith_tpu.embedding.engine import EmbeddingEngine, EngineConfig
        from monolith_tpu.embedding.spec import TableSegment, TableSpec
        from monolith_tpu.feature import FeatureConfig
        tables = [TableSpec(name=t, capacity_per_shard=4096,
                            segments=(TableSegment(dim=4),)) for t in tf]
        feats = [FeatureConfig(name="a", table="t1", max_length=3),
                 FeatureConfig(name="b", table="t2", max_length=1)]
        eng = EmbeddingEngine(tables, feats, EngineConfig(
            num_shards=1, unique_cap=128,
            unique_caps=tuple(caps.items()), new_cap=4096))
        for fb in batches:
            _, stats = eng.prepare_batch(fb, ts=1)
            assert all(v == 0 for v in stats["overflow"].values())

    def test_suggest_caps_flags_compact_wire_overflow(self):
        from monolith_tpu.utils.tuning import suggest_caps
        big = {"a": np.arange(70000, dtype=np.int64).reshape(-1, 1)}
        with pytest.raises(ValueError):
            suggest_caps([big], {"t": ["a"]})
        caps = suggest_caps([big], {"t": ["a"]}, compact_wire_limit=None)
        assert caps["t"] >= 70000


class TestCliFlagIsolation:
    def test_unknown_flag_does_not_prefix_match_config_field(self):
        """--mode must NOT expand to --model_dir via argparse abbreviation
        (it once trained into a directory literally named after the mode
        value); unknown flags are ignored by the config bridge."""
        from monolith_tpu.config import parse_into
        from monolith_tpu.estimator import RunnerConfig

        cfg = parse_into(RunnerConfig,
                         ["--mode", "train_and_eval", "--steps", "5"])
        assert cfg.model_dir != "train_and_eval"
        cfg2 = parse_into(RunnerConfig, ["--model_dir", "/tmp/x"])
        assert cfg2.model_dir == "/tmp/x"
