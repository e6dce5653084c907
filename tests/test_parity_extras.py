"""Tests for parity extras: merged tables, bf16 + stochastic rounding,
prefetch, iterator checkpoint state, failure recovery."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monolith_tpu.data.datasets import FileSource
from monolith_tpu.data.framing import write_example_file
from monolith_tpu.data.prefetch import prefetch
from monolith_tpu.data.synthetic import SyntheticCTR
from monolith_tpu.embedding import initializers, optimizers, table
from monolith_tpu.embedding.merge import merge_table_specs
from monolith_tpu.embedding.spec import TableSegment, TableSpec
from monolith_tpu.feature import FeatureConfig
from monolith_tpu.ops.rounding import stochastic_round_bf16
from monolith_tpu.training.recovery import run_with_recovery


def seg(lr=0.1):
    return TableSegment(dim=4, optimizer=optimizers.SGD(learning_rate=lr),
                        initializer=initializers.Zeros())


class TestMergeTables:
    def test_same_config_merges(self):
        specs = [TableSpec("a", 100, (seg(),)), TableSpec("b", 200, (seg(),)),
                 TableSpec("c", 50, (seg(0.5),))]
        feats = [FeatureConfig("fa", "a", 1), FeatureConfig("fb", "b", 1),
                 FeatureConfig("fc", "c", 1)]
        merged, new_feats, mapping = merge_table_specs(specs, feats)
        assert len(merged) == 2
        assert mapping["a"] == mapping["b"] != mapping["c"]
        m = next(s for s in merged if s.name.startswith("merged_"))
        assert m.capacity_per_shard == 300
        assert {f.table for f in new_feats} == {mapping["a"], "c"}

    def test_different_admission_not_merged(self):
        from monolith_tpu.embedding.spec import AdmissionConfig
        specs = [TableSpec("a", 100, (seg(),)),
                 TableSpec("b", 100, (seg(),),
                           admission=AdmissionConfig(kind="sliding", threshold=3))]
        merged, _, mapping = merge_table_specs(specs, [])
        assert len(merged) == 2 and mapping["a"] != mapping["b"]

    def test_two_segment_gb_binning_warns(self):
        # cliff_repro6 pathology guard (VERDICT r4 #5): binning into 2-3
        # GB-scale segments is a measured 12x-slow configuration; the
        # binning must warn so capacity users don't land on it silently.
        from monolith_tpu.embedding.table import packed_padded_width
        row_bytes = packed_padded_width(
            TableSpec("x", 1, (seg(),))) * 4
        cap = (1 << 30) // row_bytes  # ~1 GiB per table
        specs = [TableSpec(f"t{i}", cap, (seg(),)) for i in range(2)]
        with pytest.warns(UserWarning, match="measured slow"):
            merged, _, _ = merge_table_specs(
                specs, [], max_group_bytes=int(1.3 * (1 << 30)))
        assert len(merged) == 2  # the binning itself still happens

    def test_many_segment_binning_does_not_warn(self):
        # FOUR+ segments measured fast (cliff_repro6: 3.02 ms) -> no warning
        import warnings as _w
        from monolith_tpu.embedding.table import packed_padded_width
        row_bytes = packed_padded_width(
            TableSpec("x", 1, (seg(),))) * 4
        cap = (1 << 30) // row_bytes
        specs = [TableSpec(f"t{i}", cap, (seg(),)) for i in range(4)]
        with _w.catch_warnings():
            _w.simplefilter("error")
            merged, _, _ = merge_table_specs(
                specs, [], max_group_bytes=int(1.3 * (1 << 30)))
        assert len(merged) == 4

    def test_small_binning_does_not_warn(self):
        # sub-GB segments are outside the measured-slow band -> no warning
        import warnings as _w
        specs = [TableSpec(f"t{i}", 1000, (seg(),)) for i in range(4)]
        with _w.catch_warnings():
            _w.simplefilter("error")
            merged, _, _ = merge_table_specs(
                specs, [], max_group_bytes=1000 * 32 * 2)
        assert len(merged) >= 2


class TestStochasticRounding:
    def test_unbiased_rounding(self):
        # bf16 ulp at 1.0 is 2^-7; a quarter-point value must round up ~25%
        # of the time and the ensemble mean must be preserved
        x = jnp.full((4096,), 1.0 + 2 ** -9, dtype=jnp.float32)
        out = stochastic_round_bf16(x, jax.random.PRNGKey(0))
        vals = np.asarray(out.astype(jnp.float32))
        frac_up = (vals > 1.0).mean()
        assert 0.2 < frac_up < 0.3
        assert abs(vals.mean() - (1.0 + 2 ** -9)) < 2 ** -10
        # midpoint rounds up ~50%
        x2 = jnp.full((4096,), 1.0 + 2 ** -8, dtype=jnp.float32)
        vals2 = np.asarray(stochastic_round_bf16(x2, jax.random.PRNGKey(1))
                           .astype(jnp.float32))
        assert 0.45 < (vals2 > 1.0).mean() < 0.55

    def test_bf16_table_with_stochastic_rounding_learns_small_updates(self):
        spec = TableSpec("t", 64, (seg(lr=1.0),), dtype=jnp.bfloat16,
                         stochastic_rounding=True)
        st = table.create_state(spec)
        rows = jnp.array([0], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        # update smaller than bf16 ulp at 1.0: deterministic bf16 would stall
        st = table.assign_rows(spec, st, rows, jnp.ones((1, 4)))
        tiny = 2.0 ** -10
        for i in range(200):
            st = table.apply_gradients(spec, st, rows,
                                       jnp.full((1, 4), tiny), jnp.int32(i))
        val = float(np.asarray(table.lookup(spec, st, rows)).mean())
        # expected drift: 200 * 2^-10 ~ 0.195
        assert val < 0.95, f"stochastic rounding failed to accumulate: {val}"

    def test_plain_bf16_stalls_on_tiny_updates(self):
        # control: without stochastic rounding the same updates vanish
        spec = TableSpec("t", 64, (seg(lr=1.0),), dtype=jnp.bfloat16,
                         stochastic_rounding=False)
        st = table.create_state(spec)
        rows = jnp.array([0], dtype=jnp.int32)
        st = table.assign_rows(spec, st, rows, jnp.ones((1, 4)))
        tiny = 2.0 ** -10
        for i in range(50):
            st = table.apply_gradients(spec, st, rows,
                                       jnp.full((1, 4), tiny), jnp.int32(i))
        val = float(np.asarray(table.lookup(spec, st, rows)).mean())
        assert val > 0.99  # stuck at 1.0


class TestPrefetch:
    def test_order_preserved(self):
        assert list(prefetch(range(100), size=4)) == list(range(100))

    def test_error_propagates(self):
        def bad():
            yield 1
            raise RuntimeError("boom")

        it = prefetch(bad(), size=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            list(it)


class TestIteratorState:
    def test_resume_from_state(self, tmp_path):
        from monolith_tpu.data.example import Example
        exs = [Example(features={"f": np.array([i], np.int64)}) for i in range(10)]
        write_example_file(str(tmp_path / "a.rec"), exs[:5])
        write_example_file(str(tmp_path / "b.rec"), exs[5:])
        src = FileSource([str(tmp_path / "a.rec"), str(tmp_path / "b.rec")])
        it = iter(src)
        seen = [int(next(it).features["f"][0]) for _ in range(7)]
        state = src.state()
        # new source resumes where the old one stopped
        src2 = FileSource([str(tmp_path / "a.rec"), str(tmp_path / "b.rec")])
        src2.set_state(state)
        rest = [int(e.features["f"][0]) for e in src2]
        assert seen + rest == list(range(10))

    def test_resume_legacy_state(self, tmp_path):
        # pre-round-3 states counted examples in record_idx (no example_idx)
        from monolith_tpu.data.example import Example
        exs = [Example(features={"f": np.array([i], np.int64)}) for i in range(8)]
        write_example_file(str(tmp_path / "a.rec"), exs)
        src = FileSource([str(tmp_path / "a.rec")])
        src.set_state({"epoch": 0, "file_idx": 0, "record_idx": 3})
        rest = [int(e.features["f"][0]) for e in src]
        assert rest == [3, 4, 5, 6, 7]

    def test_resume_mid_example_batch(self, tmp_path):
        # pb_example_batch records hold many examples; resume must land
        # mid-record AND frame-skip earlier records without decoding them
        from monolith_tpu.data import pb_compat
        from monolith_tpu.data.example import Example
        from monolith_tpu.data.framing import RecordWriter

        def batch(lo, hi):
            return pb_compat.encode_example_batch(
                [Example(features={"f": np.array([i], np.int64)})
                 for i in range(lo, hi)])

        p = str(tmp_path / "eb.rec")
        with open(p, "wb") as f:
            w = RecordWriter(f)
            w.write(batch(0, 4))
            w.write(batch(4, 8))
            w.write(batch(8, 12))
        src = FileSource([p], fmt="pb_example_batch")
        it = iter(src)
        seen = [int(next(it).features["f"][0]) for _ in range(6)]  # mid record 1
        state = src.state()
        assert state["record_idx"] == 1 and state["example_idx"] == 2
        decoded = []
        orig = pb_compat.parse_example_batch

        def spy(data):
            out = orig(data)
            decoded.append(len(out))
            return out

        src2 = FileSource([p], fmt="pb_example_batch")
        src2.set_state(state)
        import unittest.mock as mock
        with mock.patch.object(pb_compat, "parse_example_batch", spy):
            rest = [int(e.features["f"][0]) for e in src2]
        assert seen + rest == list(range(12))
        assert len(decoded) == 2  # records 1 and 2 only; record 0 frame-skipped


class TestRecovery:
    def test_retries_then_succeeds(self):
        calls = []

        def fn():
            calls.append(1)
            if len(calls) < 3:
                raise RuntimeError("transient")
            return {"ok": True}

        out = run_with_recovery(fn, max_retries=5, backoff_s=0.0)
        assert out["ok"] and len(calls) == 3

    def test_gives_up(self):
        def fn():
            raise RuntimeError("always")

        with pytest.raises(RuntimeError):
            run_with_recovery(fn, max_retries=2, backoff_s=0.0)

    def test_restores_trainer_between_attempts(self, tmp_path):
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training import checkpoint
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        tr = Trainer(DeepFMTask(embedding_dim=8, capacity_per_shard=1024,
                                hidden=(8,)),
                     TrainerConfig(engine=EngineConfig(num_shards=1,
                                                       unique_cap=256,
                                                       new_cap=256),
                                   log_every=0))
        data = SyntheticCTR(num_users=30, num_items=20, batch_size=32, seed=91)
        it = iter(data)
        for _ in range(4):
            fb, b = next(it)
            tr.train_step(fb, b)
        checkpoint.save(tr, str(tmp_path))
        attempts = []

        def fn():
            attempts.append(1)
            fb, b = next(it)
            tr.train_step(fb, b)
            if len(attempts) == 1:
                tr.step = 9999  # corrupt, then fail
                raise RuntimeError("boom")
            return {"step": tr.step}

        out = run_with_recovery(fn, trainer=tr, ckpt_dir=str(tmp_path),
                                max_retries=2, backoff_s=0.0)
        assert out["step"] == 5  # restored to 4, then +1


class TestDeltaCheckpoint:
    def test_delta_roundtrip(self, tmp_path):
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training import checkpoint
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        def mk():
            return Trainer(DeepFMTask(embedding_dim=8, capacity_per_shard=1024,
                                      hidden=(8,)),
                           TrainerConfig(engine=EngineConfig(num_shards=1,
                                                             unique_cap=256,
                                                             new_cap=256),
                                         log_every=0))

        tr = mk()
        data = SyntheticCTR(num_users=40, num_items=20, batch_size=64, seed=95)
        it = iter(data)
        for i in range(5):
            fb, b = next(it)
            tr.train_step(fb, b, ts=100 + i)
        checkpoint.save(tr, str(tmp_path))
        # more training past the full save
        for i in range(5):
            fb, b = next(it)
            tr.train_step(fb, b, ts=200 + i)
        delta = checkpoint.save_delta(tr, str(tmp_path), since_ts=200)

        # fresh trainer: full restore + delta apply == live trainer rows
        tr2 = mk()
        fb, b = data.batch()
        inputs, _ = tr2.engine.prepare_batch(fb, ts=0)
        tr2._maybe_init(inputs, b)
        checkpoint.restore(tr2, str(tmp_path))
        applied = checkpoint.restore_delta(tr2, delta)
        assert applied > 0
        assert tr2.step == 10

        # every live id's embedding must match
        import jax
        fids, _, _, _ = tr.engine.stores["sparse"][0].save()
        r1 = tr.engine.stores["sparse"][0].lookup(fids)
        r2 = tr2.engine.stores["sparse"][0].lookup(fids)
        assert (r2 >= 0).all()
        p1 = table.params_np(tr.engine.tables["sparse"], jax.tree.map(lambda x: x[0], jax.device_get(tr.table_states["sparse"])))[r1]
        p2 = table.params_np(tr2.engine.tables["sparse"], jax.tree.map(lambda x: x[0], jax.device_get(tr2.table_states["sparse"])))[r2]
        np.testing.assert_allclose(p1, p2, rtol=1e-6)

    def test_delta_smaller_than_full(self, tmp_path):
        import os
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training import checkpoint
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        tr = Trainer(DeepFMTask(embedding_dim=8, capacity_per_shard=8192,
                                hidden=(8,)),
                     TrainerConfig(engine=EngineConfig(num_shards=1,
                                                       unique_cap=2048,
                                                       new_cap=2048),
                                   log_every=0))
        big = SyntheticCTR(num_users=2000, num_items=1000, batch_size=256, seed=96)
        it = iter(big)
        for i in range(20):
            fb, b = next(it)
            tr.train_step(fb, b, ts=100)
        # touch only a few ids afterwards
        small = SyntheticCTR(num_users=10, num_items=5, batch_size=32, seed=97)
        fb, b = small.batch()
        tr.train_step(fb, b, ts=500)
        full = checkpoint.save(tr, str(tmp_path))
        delta = checkpoint.save_delta(tr, str(tmp_path), since_ts=500)

        def dir_size(p):
            return sum(os.path.getsize(os.path.join(dp, f))
                       for dp, _, fs in os.walk(p) for f in fs)

        assert dir_size(delta) < dir_size(full) / 10


class TestWarmupData:
    def test_warmup_roundtrip(self, tmp_path):
        from monolith_tpu.serving.export import read_warmup_data, write_warmup_data
        d = str(tmp_path)
        fb = {"user_id": np.array([[1], [2]], np.int64)}
        b = {"label": np.zeros(2, np.float32)}
        write_warmup_data(d, [fb], [b])
        out = list(read_warmup_data(d))
        assert len(out) == 1
        np.testing.assert_array_equal(out[0][0]["user_id"], fb["user_id"])


class TestRetrievers:
    """Quantization-aware retrieval (ref retriever/fake_quant_retriever.cc,
    hash_net_retriever.cc, compressor/{fake_quantizer,hash_net_quantizer}.h)."""

    def test_fake_quant_forward_matches_reference_semantics(self):
        import jax.numpy as jnp
        from monolith_tpu.embedding.retrievers import FakeQuant
        fq = FakeQuant(r=1.0)  # step = 1/128
        step_ = 1.0 / 128.0
        x = jnp.array([0.0, step_ * 3.6, -step_ * 3.6, 0.49 * step_,
                       0.51 * step_, 10.0, -10.0])
        y = np.asarray(fq.retrieve(x, 0))
        # round-half-away-from-zero to the grid, clipped to [-128, 127] slots
        np.testing.assert_allclose(
            y, [0.0, 4 * step_, -4 * step_, 0.0, step_, 127 * step_,
                -128 * step_], rtol=1e-6)

    def test_fake_quant_gradient_is_straight_through(self):
        import jax
        import jax.numpy as jnp
        from monolith_tpu.embedding.retrievers import FakeQuant
        fq = FakeQuant(r=2.0)
        g = jax.grad(lambda x: jnp.sum(fq.retrieve(x, 0) ** 2))(
            jnp.array([0.3, -0.7]))
        # d/dx sum(q(x)^2) with straight-through q' = 1 -> 2*q(x)
        q = np.asarray(fq.retrieve(jnp.array([0.3, -0.7]), 0))
        np.testing.assert_allclose(np.asarray(g), 2 * q, rtol=1e-5)

    def test_hash_net_scale_schedule_and_backward(self):
        import jax
        import jax.numpy as jnp
        from monolith_tpu.embedding.retrievers import HashNet
        hn = HashNet(amplitude=2.0, init_scale=1.0, max_scale=3.0,
                     step_size=100)
        # scale holds between step_size multiples
        assert float(hn.scale(0)) == pytest.approx(1.0)
        assert float(hn.scale(99)) == pytest.approx(1.0)
        s100 = 1.0 * (1 + 0.005 * 100) ** 0.5
        assert float(hn.scale(100)) == pytest.approx(s100, rel=1e-6)
        assert float(hn.scale(150)) == pytest.approx(s100, rel=1e-6)
        # cap at max_scale
        assert float(hn.scale(10_000_000)) == pytest.approx(3.0)
        # backward = amplitude * scale * (1 - tanh^2), ref Backward
        x = jnp.array([0.4])
        g = jax.grad(lambda v: hn.retrieve(v, 100).sum())(x)
        y = np.tanh(s100 * 0.4)
        np.testing.assert_allclose(np.asarray(g), [2.0 * s100 * (1 - y * y)],
                                   rtol=1e-5)

    def test_training_with_retrievers_end_to_end(self):
        """A table with fake-quant on one segment and hash-net on another
        trains, and the exported values are the retrieved view."""
        import jax.numpy as jnp
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.embedding import initializers, optimizers
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.embedding.retrievers import FakeQuant, HashNet
        from monolith_tpu.embedding.spec import TableSegment, TableSpec
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        class QATTask(DeepFMTask):
            def tables(self):
                (base,) = super().tables()
                segs = (
                    dataclasses.replace(base.segments[0],
                                        retriever=FakeQuant(r=4.0)),
                ) + tuple(dataclasses.replace(s, retriever=HashNet())
                          for s in base.segments[1:])
                return (dataclasses.replace(base, segments=segs),)

        task = QATTask(embedding_dim=8, capacity_per_shard=4096, hidden=(16,))
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(num_shards=1, unique_cap=512, new_cap=512),
            log_every=0))
        data = SyntheticCTR(num_users=100, num_items=60, batch_size=256, seed=5)
        it = iter(data)
        losses = []
        for _ in range(30):
            fb, b = next(it)
            out = tr.train_step(fb, b)
            losses.append(float(out["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

        # export bakes the retrieved values
        import tempfile
        from monolith_tpu.serving.export import export_model
        d = tempfile.mkdtemp()
        path = export_model(tr, d)
        spec = tr.engine.tables["sparse"]
        z = np.load(os.path.join(path, "tables", "sparse-s0.npz"))
        store = tr.engine.stores["sparse"][0]
        fids, rows, _, _ = store.save()
        from monolith_tpu.embedding import table as table_mod
        raw = table_mod.params_np(spec, jax.tree.map(
            lambda x: x[0], jax.device_get(tr.table_states["sparse"])))[rows]
        seg0 = spec.segments[0]
        expect = np.asarray(seg0.retriever.retrieve(
            jnp.asarray(raw[:, :seg0.dim]), tr.step))
        np.testing.assert_allclose(z["seg0:data"], expect, rtol=1e-5)


class TestBf16PackedPool:
    """bf16 packed rows: same one-gather/one-scatter step, half the HBM
    bytes per row (pool dtype bf16), stochastic-rounded write-back."""

    def test_state_is_bf16_and_packed(self):
        spec = TableSpec("t", 64, (seg(lr=1.0),), dtype=jnp.bfloat16,
                         stochastic_rounding=True)
        st = table.create_state(spec)
        assert "data" in st and st["data"].dtype == jnp.bfloat16

    def test_sr_accumulates_through_packed_path(self):
        spec = TableSpec("t", 64, (seg(lr=1.0),), dtype=jnp.bfloat16,
                         stochastic_rounding=True)
        st = table.create_state(spec)
        rows = jnp.array([0], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        st = table.assign_rows(spec, st, rows, jnp.ones((1, 4)))
        tiny = 2.0 ** -10
        for i in range(200):
            st = table.apply_gradients(spec, st, rows,
                                       jnp.full((1, 4), tiny), jnp.int32(i))
        val = float(np.asarray(table.lookup(spec, st, rows)).mean())
        assert val < 0.95, f"SR failed to accumulate in packed path: {val}"

    def test_engine_fused_step_trains_bf16(self):
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = DeepFMTask(embedding_dim=8, capacity_per_shard=8192,
                          hidden=(32, 16), table_dtype=jnp.bfloat16,
                          stochastic_rounding=True)
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(num_shards=1, unique_cap=1024, new_cap=1024),
            log_every=0, seed=3))
        assert tr.engine.packed and tr.engine.fuse_wire
        data = SyntheticCTR(num_users=100, num_items=60, batch_size=512,
                            seed=3)
        tr.train(iter(data), steps=120)
        for st in tr.table_states.values():
            assert st["data"].dtype == jnp.bfloat16
        # eval on the SAME generator (same latent preference vectors)
        ev = tr.evaluate(iter(data), max_steps=10)
        assert ev["auc"] > 0.58, ev

    @pytest.mark.slow
    def test_checkpoint_roundtrip_bf16(self, tmp_path):
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig
        from monolith_tpu.training import checkpoint

        def mk():
            task = DeepFMTask(embedding_dim=8, capacity_per_shard=2048,
                              hidden=(16,), table_dtype=jnp.bfloat16,
                              stochastic_rounding=True)
            return Trainer(task, TrainerConfig(
                engine=EngineConfig(num_shards=1, unique_cap=512,
                                    new_cap=512), log_every=0, seed=5))
        tr = mk()
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=5)
        tr.train(iter(data), steps=5)
        checkpoint.save(tr, str(tmp_path))
        tr2 = mk()
        # dense restore needs initialized params: run one step first
        data2 = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=9)
        tr2.train(iter(data2), steps=1)
        checkpoint.restore(tr2, str(tmp_path))
        for tname in tr.engine.tables:
            a = np.asarray(tr.table_states[tname]["data"], np.float32)
            b = np.asarray(tr2.table_states[tname]["data"], np.float32)
            np.testing.assert_allclose(a, b, atol=0)
        assert tr2.table_states[tname]["data"].dtype == jnp.bfloat16


class TestTrainCLI:
    def test_cli_train_eval_on_files(self, tmp_path):
        """python -m monolith_tpu.train (the rebuild's local_train binary):
        task from the zoo + JSON overrides, framed-file data, train+eval,
        checkpoint under --model_dir."""
        from monolith_tpu import train as cli
        from monolith_tpu.data.example import Example
        from monolith_tpu.data.framing import write_example_file
        from monolith_tpu.data.synthetic import SyntheticCTR

        gen = SyntheticCTR(num_users=50, num_items=30, batch_size=32, seed=4)
        exs = []
        for _ in range(12):
            fb, b = gen.batch()
            for i in range(32):
                exs.append(Example(
                    features={k: v[i][v[i] >= 0] for k, v in fb.items()},
                    labels=np.asarray([b["label"][i]], np.float32)))
        write_example_file(str(tmp_path / "part-0.rec"), exs)
        out = cli.main([
            "--task", "deepfm",
            "--task_args", '{"embedding_dim": 8, "capacity_per_shard": 2048,'
                           ' "hidden": [16]}',
            "--data", f"files:{tmp_path}/part-*.rec",
            "--steps", "8", "--eval_steps", "3", "--batch_size", "32",
            "--mode", "train_and_eval", "--log_every", "0",
            "--model_dir", str(tmp_path / "model")])
        assert np.isfinite(out["train"]["loss"])
        assert np.isfinite(out["eval"]["loss"])
        assert (tmp_path / "model" / "CHECKPOINT").exists()
