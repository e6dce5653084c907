"""End-to-end embedding-engine tests: host prepare -> device embed ->
autodiff grads -> per-row optimize, on a single device."""

import jax
import jax.numpy as jnp
import numpy as np

from monolith_tpu.embedding import initializers, optimizers
from monolith_tpu.embedding.engine import EmbeddingEngine, EngineConfig
from monolith_tpu.embedding.spec import (AdmissionConfig, EvictionConfig,
                                         TableSegment, TableSpec)
from monolith_tpu.feature import FeatureConfig


def make_engine(combiner="sum", admission=None, num_shards=1, dim=4):
    tables = [TableSpec(
        name="user", capacity_per_shard=256,
        segments=(TableSegment(dim=dim,
                               optimizer=optimizers.SGD(learning_rate=0.5),
                               initializer=initializers.Constants(1.0)),),
        admission=admission or AdmissionConfig(),
        eviction=EvictionConfig(ttl_seconds=3600))]
    features = [FeatureConfig(name="uid", table="user", max_length=3,
                              combiner=combiner)]
    return EmbeddingEngine(tables, features,
                           EngineConfig(num_shards=num_shards, unique_cap=64,
                                        new_cap=32))


class TestPrepareBatch:
    def test_shapes_and_index_validity(self):
        eng = make_engine()
        fids = np.array([[1, 2, -1], [2, 3, 3]], dtype=np.int64)
        inputs, stats = eng.prepare_batch({"uid": fids}, ts=1)
        tin = inputs["user"]
        assert tin["rows"].shape == (1, 64)
        # packed mode ships a new-id MASK (select-based admit, PERF.md)
        assert tin["new_mask"].shape == (1, 64)
        assert tin["new_mask"].sum() == 3
        assert tin["index"]["uid"].shape == (2, 3)
        assert tin["index"]["uid"].dtype == np.int16
        assert stats["unique"]["user"] == 3
        assert stats["new"]["user"] == 3
        # padding -> -1 index
        assert tin["index"]["uid"][0, 2] == -1

    def test_dedup_same_id_same_slot(self):
        eng = make_engine()
        fids = np.array([[7, 7, 7]], dtype=np.int64)
        inputs, stats = eng.prepare_batch({"uid": fids}, ts=1)
        idx = inputs["user"]["index"]["uid"][0]
        assert idx[0] == idx[1] == idx[2] >= 0
        assert stats["unique"]["user"] == 1


class TestEmbedForward:
    def test_sum_and_mean_pooling(self):
        for combiner, expect in [("sum", 2.0), ("mean", 1.0)]:
            eng = make_engine(combiner=combiner)
            states = eng.create_states()
            fids = np.array([[1, 2, -1]], dtype=np.int64)
            inputs, _ = eng.prepare_batch({"uid": fids}, ts=1)
            states = eng.admit_rows(states, inputs, jax.random.PRNGKey(0))
            pooled, _ = eng.embed(states, inputs)
            np.testing.assert_allclose(np.asarray(pooled["uid"]),
                                       expect, rtol=1e-6)

    def test_firstn_returns_sequence(self):
        eng = make_engine(combiner="firstn")
        states = eng.create_states()
        fids = np.array([[5, -1, -1]], dtype=np.int64)
        inputs, _ = eng.prepare_batch({"uid": fids}, ts=1)
        states = eng.admit_rows(states, inputs, jax.random.PRNGKey(0))
        pooled, _ = eng.embed(states, inputs)
        assert pooled["uid"].shape == (1, 3, 4)
        np.testing.assert_allclose(np.asarray(pooled["uid"][0, 0]), 1.0)
        np.testing.assert_allclose(np.asarray(pooled["uid"][0, 1:]), 0.0)

    def test_filtered_ids_read_zero(self):
        eng = make_engine(admission=AdmissionConfig(kind="sliding", threshold=5))
        states = eng.create_states()
        fids = np.array([[9, -1, -1]], dtype=np.int64)
        inputs, _ = eng.prepare_batch({"uid": fids}, ts=1)
        states = eng.admit_rows(states, inputs, jax.random.PRNGKey(0))
        pooled, _ = eng.embed(states, inputs)
        np.testing.assert_allclose(np.asarray(pooled["uid"]), 0.0)


class TestTrainLoop:
    def test_gradients_flow_and_update(self):
        eng = make_engine()
        states = eng.create_states()
        fids = np.array([[1, -1, -1]], dtype=np.int64)
        inputs, _ = eng.prepare_batch({"uid": fids}, ts=1)
        states = eng.admit_rows(states, inputs, jax.random.PRNGKey(0))

        def loss_fn(unique, inputs):
            pooled = eng.pool_features(unique, inputs)
            return jnp.sum(pooled["uid"] ** 2)

        unique = eng.lookup_unique(states, inputs)
        g = jax.grad(loss_fn)(unique, inputs)
        states = eng.apply_gradients(states, inputs, g, jnp.int32(0))
        # row had value 1 (dim 4): d/dx sum(x^2)=2x=2; sgd lr .5 -> 1-1=0
        pooled, _ = eng.embed(states, inputs)
        np.testing.assert_allclose(np.asarray(pooled["uid"]), 0.0, atol=1e-6)

    def test_duplicate_id_grads_sum(self):
        eng = make_engine()
        states = eng.create_states()
        fids = np.array([[3, 3, -1]], dtype=np.int64)
        inputs, _ = eng.prepare_batch({"uid": fids}, ts=1)
        states = eng.admit_rows(states, inputs, jax.random.PRNGKey(0))

        def loss_fn(unique, inputs):
            pooled = eng.pool_features(unique, inputs)  # sum: 2*e
            return jnp.sum(pooled["uid"])  # grad wrt e = 2

        unique = eng.lookup_unique(states, inputs)
        g = jax.grad(loss_fn)(unique, inputs)
        row_idx = int(inputs["user"]["index"]["uid"][0, 0])
        np.testing.assert_allclose(np.asarray(g["user"][row_idx]), 2.0)

    def test_jitted_multi_step_converges(self):
        eng = make_engine()
        states = eng.create_states()
        target = 0.7

        @jax.jit
        def step(states, inputs, key, stepno):
            states = eng.admit_rows(states, inputs, key)

            def loss_fn(unique):
                pooled = eng.pool_features(unique, inputs)
                pred = jnp.mean(pooled["uid"], axis=-1)
                return jnp.mean((pred - target) ** 2)

            unique = eng.lookup_unique(states, inputs)
            loss, g = jax.value_and_grad(loss_fn)(unique)
            states = eng.apply_gradients(states, inputs, g, stepno)
            return states, loss

        rng = np.random.default_rng(0)
        losses = []
        for i in range(30):
            fids = rng.integers(1, 20, size=(8, 3)).astype(np.int64)
            inputs, _ = eng.prepare_batch({"uid": fids}, ts=i)
            states, loss = step(states, inputs, jax.random.PRNGKey(i), jnp.int32(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.1

    def test_eviction_roundtrip(self):
        eng = make_engine()
        states = eng.create_states()
        fids = np.array([[1, 2, 3]], dtype=np.int64)
        inputs, _ = eng.prepare_batch({"uid": fids}, ts=100)
        states = eng.admit_rows(states, inputs, jax.random.PRNGKey(0))
        freed = eng.evict_expired(expire_before=200)
        assert len(freed["user"]) == 3
        assert eng.stores["user"][0].size() == 0

    def test_zero_rows_clears_evicted_state(self):
        """zero_rows wipes freed device rows (params AND optimizer slots) so
        no stale state can leak through a future non-init-select mapping;
        untouched rows keep their values (ref evict clears entry memory)."""
        eng = make_engine()
        states = eng.create_states()
        fids = np.array([[1, 2, 3, 4]], dtype=np.int64)
        inputs, _ = eng.prepare_batch({"uid": fids}, ts=100)
        states = eng.admit_rows(states, inputs, jax.random.PRNGKey(0))
        rows = eng.stores["user"][0].lookup(np.array([1, 2], np.int64))
        keep_rows = eng.stores["user"][0].lookup(np.array([3, 4], np.int64))
        # make the rows visibly dirty
        leaf = next(iter(jax.tree.leaves(states["user"])))
        before_keep = np.asarray(leaf[0, keep_rows])
        freed = {"user": np.asarray(rows, np.int64)}
        states2 = eng.zero_rows(states, freed)
        for x in jax.tree.leaves(states2["user"]):
            arr = np.asarray(x)
            assert np.all(arr[0, rows] == 0)
        leaf2 = next(iter(jax.tree.leaves(states2["user"])))
        np.testing.assert_array_equal(np.asarray(leaf2[0, keep_rows]),
                                      before_keep)
        # empty + zero-length freed lists are no-ops
        states3 = eng.zero_rows(states2, {"user": np.empty(0, np.int64)})
        assert states3["user"] is states2["user"]


class TestMultiShardHost:
    def test_prepare_with_4_shards(self):
        eng = make_engine(num_shards=4)
        states = eng.create_states()
        fids = np.arange(1, 25, dtype=np.int64).reshape(8, 3)
        inputs, stats = eng.prepare_batch({"uid": fids}, ts=1)
        assert inputs["user"]["rows"].shape == (4, 64)
        assert stats["unique"]["user"] == 24
        states = eng.admit_rows(states, inputs, jax.random.PRNGKey(0))
        pooled, _ = eng.embed(states, inputs)
        np.testing.assert_allclose(np.asarray(pooled["uid"]), 3.0, rtol=1e-6)


class TestCompactWire:
    def test_compact_matches_legacy_wire(self):
        """compact_wire=True must produce identical training behavior to the
        legacy int32 new_rows wire (same admitted rows, same embeddings)."""
        import jax.numpy as jnp
        from monolith_tpu.embedding.engine import EmbeddingEngine, EngineConfig
        from monolith_tpu.embedding.spec import TableSegment, TableSpec
        from monolith_tpu.embedding import initializers, optimizers
        from monolith_tpu.feature import FeatureConfig

        def build(compact):
            tables = [TableSpec(
                name="t", capacity_per_shard=256,
                segments=(TableSegment(dim=4,
                                       optimizer=optimizers.Adagrad(0.1),
                                       initializer=initializers.Constants(0.5)),))]
            feats = [FeatureConfig(name="f", table="t", max_length=3,
                                   combiner="sum")]
            # packed="off": this test exercises the legacy new_pos/new_rows
            # wire; the packed wire ships new_mask instead
            return EmbeddingEngine(tables, feats,
                                   EngineConfig(num_shards=2, unique_cap=32,
                                                new_cap=16, packed="off",
                                                compact_wire=compact))

        e1, e2 = build(True), build(False)
        fids = np.array([[5, 9, -1], [9, 13, 5], [21, -1, -1]], np.int64)
        in1, s1 = e1.prepare_batch({"f": fids}, ts=1)
        in2, s2 = e2.prepare_batch({"f": fids}, ts=1)
        assert s1["new"] == s2["new"] and s1["unique"] == s2["unique"]
        # reconstructed new_rows == legacy new_rows
        nr1 = np.asarray(e1.new_rows_from(jnp.asarray(in1["t"]["rows"]),
                                          in1["t"]))
        np.testing.assert_array_equal(nr1, in2["t"]["new_rows"])
        # end-to-end embed equality
        st1, st2 = e1.create_states(), e2.create_states()
        st1 = e1.admit_rows(st1, in1, jax.random.PRNGKey(0))
        st2 = e2.admit_rows(st2, in2, jax.random.PRNGKey(0))
        p1, _ = e1.embed(st1, in1)
        p2, _ = e2.embed(st2, in2)
        np.testing.assert_allclose(np.asarray(p1["f"]), np.asarray(p2["f"]))

    def test_int32_fallback_when_caps_large(self):
        from monolith_tpu.embedding.engine import EngineConfig
        cfg = EngineConfig(num_shards=4, unique_cap=16384)  # 4*16384 > 32768
        assert cfg.index_dtype == np.int32
        assert cfg.pos_dtype == np.int16
        cfg2 = EngineConfig(num_shards=1, unique_cap=65536)
        assert cfg2.index_dtype == np.int32
        assert cfg2.pos_dtype == np.int32


class TestWireFusion:
    def test_pack_decode_roundtrip(self):
        eng = make_engine()
        assert eng.fuse_wire
        fids = np.array([[1, 2, -1], [2, 3, 3]], dtype=np.int64)
        inputs, _ = eng.prepare_batch({"uid": fids}, ts=1)
        wire = eng.pack_wire(inputs)
        assert wire.dtype == np.int32 and wire.ndim == 1
        dec = eng.decode_wire(jnp.asarray(wire), batch_size=2)
        tin, din = inputs["user"], dec["user"]
        np.testing.assert_array_equal(np.asarray(din["rows"]), tin["rows"])
        np.testing.assert_array_equal(np.asarray(din["new_mask"]),
                                      tin["new_mask"])
        np.testing.assert_array_equal(np.asarray(din["index"]["uid"]),
                                      tin["index"]["uid"])

    def test_fused_trainer_matches_unfused(self):
        """Training through the wire must produce identical results to the
        multi-array path."""
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        def run(fuse):
            task = DeepFMTask(embedding_dim=8, capacity_per_shard=2048,
                              hidden=(16,), init_scale=0.0)
            tr = Trainer(task, TrainerConfig(
                engine=EngineConfig(num_shards=1, unique_cap=512, new_cap=512),
                log_every=0, seed=7))
            if not fuse:
                # monkeypatch off
                tr.engine.__class__ = type(
                    "E", (tr.engine.__class__,),
                    {"fuse_wire": property(lambda s: False)})
            data = SyntheticCTR(num_users=60, num_items=40, batch_size=128,
                                seed=7)
            it = iter(data)
            losses = []
            for _ in range(12):
                fb, b = next(it)
                out = tr.train_step(fb, b)
                losses.append(float(out["loss"]))
            return losses

        np.testing.assert_allclose(run(True), run(False), rtol=1e-5)


class TestPrepareWire:
    def _two_table_engine(self, seed=0, **cfg_kw):
        tables = [
            TableSpec(name="user", capacity_per_shard=256,
                      segments=(TableSegment(
                          dim=4, optimizer=optimizers.SGD(learning_rate=0.5),
                          initializer=initializers.Constants(1.0)),)),
            TableSpec(name="item", capacity_per_shard=256,
                      segments=(TableSegment(
                          dim=4, optimizer=optimizers.Adagrad(learning_rate=0.1),
                          initializer=initializers.RandomUniform(0.1)),)),
        ]
        features = [
            FeatureConfig(name="uid", table="user", max_length=3),
            FeatureConfig(name="uhist", table="user", max_length=5),
            FeatureConfig(name="iid", table="item", max_length=2),
        ]
        return EmbeddingEngine(
            tables, features,
            EngineConfig(num_shards=1, unique_cap=64, new_cap=32, **cfg_kw),
            seed=seed)

    def _batch(self, rng, B):
        return {
            "uid": rng.integers(-1, 40, size=(B, 3)).astype(np.int64),
            "uhist": rng.integers(-1, 40, size=(B, 5)).astype(np.int64),
            "iid": rng.integers(-1, 25, size=(B, 2)).astype(np.int64),
        }

    def test_matches_pack_wire_bytes(self):
        """prepare_wire must produce the exact bytes of
        prepare_batch + pack_wire on an identically-seeded engine."""
        e1 = self._two_table_engine(seed=3)
        e2 = self._two_table_engine(seed=3)
        rng1, rng2 = np.random.default_rng(9), np.random.default_rng(9)
        for step in range(5):
            fb1, fb2 = self._batch(rng1, 16), self._batch(rng2, 16)
            inputs, s1 = e1.prepare_batch(fb1, ts=step)
            ref = e1.pack_wire(inputs)
            wire, s2 = e2.prepare_wire(fb2, ts=step)
            np.testing.assert_array_equal(wire, ref)
            for k in ("overflow", "new", "unique"):
                assert s1[k] == s2[k], (step, k, s1[k], s2[k])

    def test_matches_with_admission_filter_and_touch(self):
        tables = [TableSpec(
            name="user", capacity_per_shard=256,
            segments=(TableSegment(
                dim=4, optimizer=optimizers.SGD(learning_rate=0.5),
                initializer=initializers.Constants(1.0)),),
            admission=AdmissionConfig(kind="sliding", threshold=2))]
        features = [FeatureConfig(name="uid", table="user", max_length=3)]

        def mk():
            return EmbeddingEngine(
                tables, features,
                EngineConfig(num_shards=1, unique_cap=64, new_cap=32,
                             record_touch=True), seed=5)
        e1, e2 = mk(), mk()
        rng1, rng2 = np.random.default_rng(4), np.random.default_rng(4)
        for step in range(6):
            fb1 = {"uid": rng1.integers(-1, 30, size=(8, 3)).astype(np.int64)}
            fb2 = {"uid": rng2.integers(-1, 30, size=(8, 3)).astype(np.int64)}
            inputs, _ = e1.prepare_batch(fb1, ts=step)
            ref = e1.pack_wire(inputs)
            wire, _ = e2.prepare_wire(fb2, ts=step)
            np.testing.assert_array_equal(wire, ref)
        t1 = e1.stores["user"][0].drain_touched()
        t2 = e2.stores["user"][0].drain_touched()
        np.testing.assert_array_equal(np.sort(t1), np.sort(t2))


class TestBlockDispatch:
    def test_block_matches_sequential(self):
        """steps_per_dispatch=4 must produce identical training results to
        sequential single-step dispatches."""
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.models.deepfm import DeepFMTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        def run(block):
            task = DeepFMTask(embedding_dim=8, capacity_per_shard=2048,
                              hidden=(16,), init_scale=0.0)
            tr = Trainer(task, TrainerConfig(
                engine=EngineConfig(num_shards=1, unique_cap=512, new_cap=512),
                log_every=0, seed=7,
                steps_per_dispatch=4 if block else 1))
            data = SyntheticCTR(num_users=60, num_items=40, batch_size=128,
                                seed=7)
            res = tr.train(iter(data), steps=13)  # 1 init + 4+4+4 blocks
            return res, tr

        r1, t1 = run(True)
        r2, t2 = run(False)
        assert t1.step == t2.step == 13
        np.testing.assert_allclose(r1["loss"], r2["loss"], rtol=1e-6)
        np.testing.assert_allclose(r1["auc"], r2["auc"], rtol=1e-6)
        for tname in t1.engine.tables:
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                t1.table_states[tname], t2.table_states[tname])
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                     t1.params, t2.params)


class TestNewCapBudget:
    """The per-step admission budget must REJECT over-budget new ids rather
    than silently mapping them to uninitialized (possibly recycled) rows —
    the round-1 correctness hazard. Reference behavior: the C++ table
    initializes on insert (entry_accessor.cc Init), so it cannot lose init;
    here init happens on device, so admission is capped to what the device
    will initialize."""

    def test_store_rejects_over_budget(self):
        from monolith_tpu.embedding.host_store import HostStore
        st = HostStore(row_capacity=64)
        fids = np.arange(1, 11, dtype=np.int64)
        rows, nr, nf = st.map_train(fids, ts=1, new_cap=4)
        assert len(nr) == 4
        assert st.last_rejected == 6
        assert (rows[:4] >= 0).all() and (rows[4:] == -1).all()
        # rejected ids admit on a later call (budget refreshes per call)
        rows2, nr2, _ = st.map_train(fids, ts=2, new_cap=16)
        assert (rows2 >= 0).all()
        assert len(nr2) == 6
        assert st.last_rejected == 0
        np.testing.assert_array_equal(rows[:4], rows2[:4])

    def test_recycled_rows_never_leak_stale_state(self):
        """Evict a table, recycle its rows, overflow new_cap: over-budget ids
        must read zeros (not stale rows), be counted in stats, and — once
        admitted on a later step — read initializer values with RESET
        optimizer accumulators."""
        from monolith_tpu.embedding import table as table_lib

        spec = TableSpec(
            name="user", capacity_per_shard=64,
            segments=(TableSegment(dim=4,
                                   optimizer=optimizers.Adagrad(
                                       learning_rate=0.5,
                                       initial_accumulator_value=0.1),
                                   initializer=initializers.Constants(1.0)),),
            eviction=EvictionConfig(ttl_seconds=100))
        feats = [FeatureConfig(name="uid", table="user", max_length=1,
                               combiner="sum")]
        eng = EmbeddingEngine([spec], feats,
                              EngineConfig(num_shards=1, unique_cap=16,
                                           new_cap=4))
        assert eng.packed
        states = eng.create_states()
        key = jax.random.PRNGKey(0)

        def train_ids(states, ids, ts, step, grad=1.0):
            fb = {"uid": np.asarray(ids, np.int64).reshape(-1, 1)}
            inputs, stats = eng.prepare_batch(fb, ts=ts)
            prows, unique = eng.fused_lookup(states, inputs, key, step)
            g = {"user": jnp.full_like(unique["user"], grad)}
            states = eng.fused_apply(states, inputs, prows, g, jnp.int32(step))
            return states, inputs, stats, unique

        # step 1: train ids 1..4 so their rows carry dirty params+accums
        states, _, _, _ = train_ids(states, [1, 2, 3, 4], ts=10, step=0)
        dirty_rows = eng.stores["user"][0].lookup(
            np.array([1, 2, 3, 4], np.int64))
        assert (dirty_rows >= 0).all()
        row_data = np.asarray(states["user"]["data"][0])
        assert not np.allclose(row_data[dirty_rows[0], :4], 1.0)   # params moved
        assert not np.allclose(row_data[dirty_rows[0], 4:8], 0.1)  # accums moved

        # evict: rows go to the free list, device rows NOT zeroed
        freed = eng.evict_expired(expire_before=50)
        assert len(freed["user"]) == 4

        # step 2: 10 new ids vs budget 4 -> 6 rejected, counted, read zero
        # (grad 0 so every admitted row should hold exactly the init values)
        new_ids = list(range(11, 21))
        states, inputs, stats, unique = train_ids(states, new_ids, ts=60,
                                                  step=1, grad=0.0)
        assert stats["new"]["user"] == 4
        assert stats["new_rejected"]["user"] == 6
        rows = inputs["user"]["rows"][0]
        assert (rows[:4] >= 0).all() and (rows[4:10] == -1).all()
        u = np.asarray(unique["user"])
        np.testing.assert_allclose(u[:4], 1.0)   # admitted: initializer
        np.testing.assert_allclose(u[4:10], 0.0)  # rejected: zeros, no leak

        # step 3: rejected ids retry; each admitted id (some on recycled
        # rows) must read initializer params with reset accumulators
        states, inputs2, stats2, unique2 = train_ids(states, new_ids, ts=61,
                                                     step=2, grad=0.0)
        assert stats2["new"]["user"] == 4 and stats2["new_rejected"]["user"] == 2
        store = eng.stores["user"][0]
        admitted = store.lookup(np.asarray(new_ids, np.int64))
        recycled = set(dirty_rows.tolist()) & set(
            admitted[admitted >= 0].tolist())
        assert recycled, "free-list rows must have been recycled"
        row_data = np.asarray(states["user"]["data"][0])
        for r in sorted(recycled):
            np.testing.assert_allclose(row_data[r, :4], 1.0, rtol=1e-6,
                                       err_msg="recycled row leaked params")
            np.testing.assert_allclose(row_data[r, 4:8], 0.1, rtol=1e-6,
                                       err_msg="recycled row leaked accums")

    def test_prepare_wire_rejects_oversized_cap(self):
        import pytest
        tables = [TableSpec(name="t", capacity_per_shard=256,
                            segments=(TableSegment(dim=4),))]
        feats = [FeatureConfig(name="f", table="t", max_length=2,
                               combiner="sum")]
        eng = EmbeddingEngine(tables, feats,
                              EngineConfig(num_shards=1, unique_cap=81920))
        # 16-bit wire indices (unsigned, 0xFFFF sentinel) cannot address
        # >65535 uniques: the fused wire path must be OFF, and a direct
        # prepare_wire call must fail loudly
        assert not eng.fuse_wire
        with pytest.raises(ValueError):
            eng.prepare_wire({"f": np.zeros((2, 2), np.int64)}, ts=1)
        # caps in (32768, 65535] ride the unsigned decode (merged tables)
        eng_u = EmbeddingEngine(tables, feats,
                                EngineConfig(num_shards=1, unique_cap=40960))
        assert eng_u.fuse_wire
        eng2 = EmbeddingEngine(tables, feats,
                               EngineConfig(num_shards=1, unique_cap=1024,
                                            compact_wire=False))
        assert not eng2.fuse_wire  # user's int32 opt-out is honored

    def test_shard_of_batch_matches_scalar(self):
        from monolith_tpu.embedding.host_store import shard_of, shard_of_batch
        rng = np.random.default_rng(0)
        fids = rng.integers(0, 2**62, size=1000, dtype=np.int64)
        batch = shard_of_batch(fids, 8)
        scalar = np.array([shard_of(int(f), 8) for f in fids[:100]])
        np.testing.assert_array_equal(batch[:100], scalar)


class TestPerTableCaps:
    """Per-table unique_cap/new_cap overrides (EngineConfig.unique_caps):
    a history table needs a far larger per-step unique budget than scalar
    slots; global caps either pad every table or silently drop ids."""

    def _engine(self, caps=None):
        tables = [
            TableSpec(name="small", capacity_per_shard=256,
                      segments=(TableSegment(
                          dim=4, initializer=initializers.Constants(1.0)),)),
            TableSpec(name="big", capacity_per_shard=4096,
                      segments=(TableSegment(
                          dim=4, initializer=initializers.Constants(2.0)),)),
        ]
        feats = [FeatureConfig(name="f_small", table="small", max_length=1,
                               combiner="sum"),
                 FeatureConfig(name="f_big", table="big", max_length=8,
                               combiner="sum")]
        cfg = EngineConfig(unique_cap=32, new_cap=32,
                           unique_caps=caps, new_caps=caps)
        return EmbeddingEngine(tables, feats, cfg)

    def test_caps_respected_and_wire_roundtrip(self):
        eng = self._engine(caps=(("big", 512),))
        assert eng.config.ucap("small") == 32
        assert eng.config.ucap("big") == 512
        rng = np.random.default_rng(0)
        fb = {"f_small": rng.integers(0, 20, (16, 1)).astype(np.int64),
              "f_big": rng.integers(0, 400, (16, 8)).astype(np.int64)}
        inputs, stats = eng.prepare_batch(fb, ts=1)
        assert inputs["small"]["rows"].shape == (1, 32)
        assert inputs["big"]["rows"].shape == (1, 512)
        assert stats["overflow"]["big"] == 0  # would overflow at cap 32
        # fused wire path: prepare_wire matches prepare_batch + pack_wire
        eng2 = self._engine(caps=(("big", 512),))
        wire, st2 = eng2.prepare_wire(fb, ts=1)
        ref = eng.pack_wire(inputs)  # eng's stores already admitted at ts=1
        assert wire.size == eng.wire_words(16)
        import jax.numpy as jnp
        dec = eng.decode_wire(jnp.asarray(wire), 16)
        np.testing.assert_array_equal(np.asarray(dec["big"]["rows"]),
                                      inputs["big"]["rows"])
        np.testing.assert_array_equal(np.asarray(dec["small"]["index"]["f_small"]),
                                      inputs["small"]["index"]["f_small"])

    def test_trains_end_to_end_with_per_table_caps(self):
        from monolith_tpu.data.synthetic import SyntheticMultiSlot
        from monolith_tpu.models.multislot import MultiSlotTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = MultiSlotTask(num_tables=2, num_slots=4, embedding_dim=8,
                             capacity_per_shard=8192, history_length=8,
                             hidden=(16,))
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(unique_cap=256, new_cap=256,
                                unique_caps=(("table_hist", 1024),),
                                new_caps=(("table_hist", 1024),)),
            log_every=0, steps_per_dispatch=3))
        data = SyntheticMultiSlot(num_slots=4, vocab_per_slot=800,
                                  history_length=8, batch_size=128, seed=2)
        res = tr.train(iter(data), steps=7)
        assert np.isfinite(res["loss"])
        assert tr.engine.stores["table_hist"][0].size() > \
            tr.engine.stores["table_0"][0].size()

    def test_sharded_rejects_per_table_caps(self):
        import pytest
        with pytest.raises(ValueError):
            EmbeddingEngine(
                [TableSpec(name="t", capacity_per_shard=64,
                           segments=(TableSegment(dim=4),))],
                [FeatureConfig(name="f", table="t", max_length=1,
                               combiner="sum")],
                EngineConfig(num_shards=2, unique_caps=(("t", 64),)))


class TestTwoLevelDedupParity:
    """The stream-local dedup (cpp LocalAddStream) must be bit-identical to
    the single-level path in every regime: shared fids ACROSS streams,
    unique_cap overflow mid-merge, occurrence-count admission."""

    def test_overflow_and_shared_fids_equal_bytes(self):
        from monolith_tpu.embedding.spec import TableSegment, TableSpec
        from monolith_tpu.embedding import initializers, optimizers
        tables = [TableSpec(name="t", capacity_per_shard=256,
                            segments=(TableSegment(
                                dim=4,
                                optimizer=optimizers.SGD(learning_rate=0.5),
                                initializer=initializers.Constants(1.0)),))]
        features = [FeatureConfig(name="a", table="t", max_length=2),
                    FeatureConfig(name="b", table="t", max_length=3)]

        def build():
            return EmbeddingEngine(
                tables, features,
                EngineConfig(num_shards=1, unique_cap=16, new_cap=16),
                seed=5)

        e1, e2 = build(), build()
        rng1, rng2 = np.random.default_rng(3), np.random.default_rng(3)

        def batch(rng):
            # 24 possible fids vs unique_cap 16 -> overflow; ranges overlap
            # so the same fid appears in BOTH streams (cross-stream dedup)
            return {"a": rng.integers(-1, 24, size=(16, 2)).astype(np.int64),
                    "b": rng.integers(-1, 24, size=(16, 3)).astype(np.int64)}

        for step in range(6):
            inputs, s1 = e1.prepare_batch(batch(rng1), ts=step)
            ref = e1.pack_wire(inputs)
            wire, s2 = e2.prepare_wire(batch(rng2), ts=step)
            np.testing.assert_array_equal(wire, ref)
            assert s1["overflow"] == s2["overflow"]
            assert s1["unique"] == s2["unique"]
            assert s2["overflow"]["t"] > 0, "test must exercise overflow"
