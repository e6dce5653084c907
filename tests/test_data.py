"""Data pipeline tests: codec roundtrip, framing, sources, transforms,
item pool / negative generation. Mirrors the coverage of the reference's
data/*_test.py suite."""

import io

import numpy as np
import pytest

from monolith_tpu.data import (BatchedDataset, Example, FileSource, ItemPool,
                               LineId, ParquetSource, QueueSource,
                               batch_examples, merge_flow, negative_gen,
                               read_example_file, split_flow, transforms,
                               write_example_file)
from monolith_tpu.data.example import make_fid_v1, make_fid_v2, slot_of_fid_v1
from monolith_tpu.data.framing import RecordReader, RecordWriter


def ex(fids=(1, 2), label=1.0, actions=(), chnid=0, dense=None, item=()):
    feats = {"f": np.asarray(fids, np.int64)}
    if item:
        feats["item"] = np.asarray(item, np.int64)
    return Example(features=feats,
                   dense={k: np.asarray(v, np.float32) for k, v in (dense or {}).items()},
                   labels=np.asarray([label], np.float32),
                   line_id=LineId(actions=list(actions), chnid=chnid))


class TestCodec:
    def test_roundtrip(self):
        e = Example(features={"a": np.array([5, 6], np.int64),
                              "b": np.array([], np.int64)},
                    dense={"ctx": np.array([1.5, 2.5], np.float32)},
                    labels=np.array([1.0, 0.0], np.float32),
                    instance_weight=2.0,
                    line_id=LineId(uid=42, item_id=7, req_time=1000,
                                   sample_rate=0.5, chnid=3, actions=[1, 2],
                                   user_id="u42", data_source_name="ds"))
        e2 = Example.from_bytes(e.to_bytes())
        np.testing.assert_array_equal(e2.features["a"], [5, 6])
        assert e2.features["b"].size == 0
        np.testing.assert_allclose(e2.dense["ctx"], [1.5, 2.5])
        np.testing.assert_allclose(e2.labels, [1.0, 0.0])
        assert e2.instance_weight == 2.0
        assert e2.line_id.uid == 42 and e2.line_id.user_id == "u42"
        assert e2.line_id.actions == [1, 2]

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError):
            Example.from_bytes(b"XXXX" + b"\x00" * 10)

    def test_fid_encoding(self):
        f = make_fid_v1(slot=5, signature=12345)
        assert slot_of_fid_v1(f) == 5
        f2 = make_fid_v2(slot=300, signature=999)
        from monolith_tpu.data.example import slot_of_fid_v2
        assert slot_of_fid_v2(f2) == 300


class TestFraming:
    def test_writer_reader_roundtrip(self, tmp_path):
        p = str(tmp_path / "f.rec")
        n = write_example_file(p, [ex(fids=[i]) for i in range(10)])
        assert n == 10
        out = list(read_example_file(p))
        assert len(out) == 10
        assert out[3].features["f"][0] == 3

    def test_sort_id_framing(self):
        buf = io.BytesIO()
        w = RecordWriter(buf, has_sort_id=True)
        w.write(b"payload1", sort_id=b"k1")
        w.write(b"payload2", sort_id=b"k2")
        buf.seek(0)
        recs = list(RecordReader(buf, has_sort_id=True))
        assert recs == [(b"k1", b"payload1"), (b"k2", b"payload2")]

    def test_truncated_tail_dropped(self):
        buf = io.BytesIO()
        w = RecordWriter(buf)
        w.write(b"good")
        buf.write(b"\xff\xff")  # garbage tail
        buf.seek(0)
        recs = list(RecordReader(buf))
        assert recs == [(b"", b"good")]


class TestSources:
    def test_file_source_glob_and_repeat(self, tmp_path):
        for k in range(2):
            write_example_file(str(tmp_path / f"part-{k}.rec"), [ex(fids=[k])])
        src = FileSource(str(tmp_path / "part-*.rec"))
        assert len(list(src)) == 2
        src_r = FileSource(str(tmp_path / "part-*.rec"), repeat=True)
        it = iter(src_r)
        assert len([next(it) for _ in range(6)]) == 6

    def test_queue_source(self):
        q = QueueSource()
        for i in range(3):
            q.push(ex(fids=[i]))
        q.close()
        assert len(list(q)) == 3

    def test_parquet_source(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pa.table({"uid": pa.array([1, 2, 3], pa.int64()),
                      "items": pa.array([[10, 11], [12], []], pa.list_(pa.int64())),
                      "label": pa.array([1.0, 0.0, 1.0], pa.float32())})
        p = str(tmp_path / "d.parquet")
        pq.write_table(t, p)
        src = ParquetSource(p, fid_columns={"uid": "uid", "items": "items"},
                            label_column="label")
        out = list(src)
        assert len(out) == 3
        np.testing.assert_array_equal(out[0].features["items"], [10, 11])
        assert out[2].features["items"].size == 0
        assert out[1].labels[0] == 0.0

    def test_batched_dataset(self):
        src = [ex(fids=[i, i + 1]) for i in range(10)]
        bd = BatchedDataset(src, batch_size=4, feature_lengths={"f": 3})
        batches = list(bd)
        assert len(batches) == 2  # drop remainder
        fid_batch, batch = batches[0]
        assert fid_batch["f"].shape == (4, 3)
        assert (fid_batch["f"][:, 2] == -1).all()
        assert batch["label"].shape == (4,)

    def test_split_merge_flow(self):
        src = [ex(fids=[i], chnid=i % 2) for i in range(10)]
        flows = split_flow(src, 2, lambda e: int(e.line_id.chnid))
        merged = list(merge_flow(flows))
        assert len(merged) == 10


class TestTransforms:
    def test_filter_by_fids(self):
        src = [ex(fids=[1, 2]), ex(fids=[3])]
        assert len(list(transforms.filter_by_fids(src, has_fids=[1]))) == 1
        src = [ex(fids=[1, 2]), ex(fids=[3])]
        assert len(list(transforms.filter_by_fids(src, filter_fids=[3]))) == 1
        src = [ex(fids=[1, 2]), ex(fids=[1])]
        assert len(list(transforms.filter_by_fids(src, select_fids=[1, 2]))) == 1

    def test_filter_by_feature_value(self):
        src = [ex(dense={"x": [5.0]}), ex(dense={"x": [1.0]})]
        out = list(transforms.filter_by_feature_value(src, "x", "gt", 2.0))
        assert len(out) == 1 and out[0].dense["x"][0] == 5.0

    def test_filter_by_label(self):
        src = [ex(label=1.0), ex(label=0.0)]
        assert len(list(transforms.filter_by_label(src, [0.5]))) == 1

    def test_negative_sample_reweights(self):
        src = [ex(label=0.0) for _ in range(2000)] + [ex(label=1.0)]
        out = list(transforms.negative_sample(src, drop_rate=0.75, seed=1))
        negs = [e for e in out if e.labels[0] == 0.0]
        assert abs(len(negs) / 2000 - 0.25) < 0.05
        assert all(abs(e.instance_weight - 4.0) < 1e-6 for e in negs)
        assert sum(1 for e in out if e.labels[0] == 1.0) == 1

    def test_add_label_from_actions(self):
        src = [ex(actions=[2]), ex(actions=[5]), ex(actions=[9])]
        out = list(transforms.add_label(src, ["2|3:5"], sample_rate=1.0))
        assert [e.labels[0] for e in out] == [1.0, 0.0, 0.0]

    def test_scatter_label(self):
        src = [ex(actions=[7, 8])]
        out = list(transforms.scatter_label(src, {7: 0, 8: 2}, num_heads=3))
        np.testing.assert_array_equal(out[0].labels, [1, 0, 1])

    def test_switch_slot(self):
        f = make_fid_v1(slot=3, signature=100)
        src = [ex(fids=[f])]
        out = list(transforms.switch_slot(src, "f", slot=9))
        assert slot_of_fid_v1(int(out[0].features["f"][0])) == 9

    def test_feature_combine(self):
        src = [Example(features={"a": np.array([1, 2], np.int64),
                                 "b": np.array([10], np.int64)})]
        out = list(transforms.feature_combine(src, "a", "b", "ab", slot=7))
        assert out[0].features["ab"].shape == (2,)
        assert all(slot_of_fid_v1(int(x)) == 7 for x in out[0].features["ab"])

    def test_map_id(self):
        src = [ex(fids=[1, 2, 3])]
        out = list(transforms.map_id(src, "f", {1: 100, 2: 200}))
        np.testing.assert_array_equal(out[0].features["f"], [100, 200, -1])

    def test_instance_reweight(self):
        src = [ex(actions=[1]), ex(actions=[2]), ex(actions=[])]
        out = list(transforms.instance_reweight(src, {1: 3, 2: 0}))
        assert len(out) == 4  # 3 copies + 0 + default 1

    def test_label_transforms(self):
        src = [ex(label=5.0)]
        out = list(transforms.label_upper_bound(src, [2.0]))
        assert out[0].labels[0] == 2.0
        src = [ex(label=4.0)]
        out = list(transforms.label_normalization(src, lambda y: np.log1p(y)))
        np.testing.assert_allclose(out[0].labels[0], np.log1p(4.0), rtol=1e-6)
        src = [ex(label=0.0, dense={"rating": [3.5]})]
        out = list(transforms.use_field_as_label(src, "rating"))
        assert out[0].labels[0] == 3.5


class TestItemPool:
    def test_negative_gen_emits_negatives(self):
        pool = ItemPool(max_items_per_channel=64, seed=0)
        src = [ex(label=1.0, item=[100 + i]) for i in range(20)]
        out = list(negative_gen(src, pool, ["item"], neg_num=2))
        pos = [e for e in out if e.labels[0] == 1.0]
        neg = [e for e in out if e.labels[0] == 0.0]
        assert len(pos) == 20
        assert len(neg) == 2 * 20  # each positive feeds the pool before sampling
        assert all(e.features["item"][0] >= 100 for e in neg)

    def test_pool_save_restore(self, tmp_path):
        pool = ItemPool(max_items_per_channel=8, seed=0)
        for i in range(5):
            pool.add(0, {"item": np.array([i], np.int64)})
        pool.save(str(tmp_path / "pool"))
        pool2 = ItemPool()
        pool2.restore(str(tmp_path / "pool"))
        assert pool2.size(0) == 5
        s = pool2.sample(0, 3)
        assert len(s) == 3

    def test_reservoir_bounded(self):
        pool = ItemPool(max_items_per_channel=4, seed=0)
        for i in range(100):
            pool.add(1, {"item": np.array([i], np.int64)})
        assert pool.size(1) == 4


class TestActionTransforms:
    def _ex(self, chnid=0, actions=(), label=0.5):
        from monolith_tpu.data.example import Example, LineId
        import numpy as np
        return Example(features={"f": np.array([1], np.int64)},
                       labels=np.array([label], np.float32),
                       line_id=LineId(chnid=chnid, actions=list(actions)))

    def test_add_action_ops(self):
        from monolith_tpu.data import transforms as T
        exs = [self._ex(chnid=5), self._ex(chnid=9)]
        out = list(T.add_action(iter(exs), "chnid", "ge", 6, action=77))
        assert 77 not in out[0].line_id.actions
        assert 77 in out[1].line_id.actions
        out = list(T.add_action(iter([self._ex(chnid=5)]), "chnid",
                                "between", [4, 6], action=3))
        assert 3 in out[0].line_id.actions
        out = list(T.add_action(iter([self._ex(chnid=5)]), "chnid",
                                "in", [1, 5], action=4))
        assert 4 in out[0].line_id.actions

    def test_multi_label_gen_heads(self):
        from monolith_tpu.data import transforms as T
        import numpy as np
        exs = [self._ex(chnid=1, actions=[10]),   # head 0, positive
               self._ex(chnid=2, actions=[99]),   # head 1, negative
               self._ex(chnid=7, actions=[10])]   # unknown head
        out = list(T.multi_label_gen(iter(exs), {1: 0, 2: 1},
                                     pos_actions=[10]))
        np.testing.assert_allclose(out[0].labels, [1.0, -1.0])
        np.testing.assert_allclose(out[1].labels, [-1.0, 0.0])
        np.testing.assert_allclose(out[2].labels, [-1.0, -1.0])

    def test_multi_label_gen_origin_label(self):
        from monolith_tpu.data import transforms as T
        import numpy as np
        out = list(T.multi_label_gen(iter([self._ex(chnid=1, label=0.25)]),
                                     {1: 0}, use_origin_label=True))
        np.testing.assert_allclose(out[0].labels, [0.25])

    def test_gen_fid_mask(self):
        from monolith_tpu.data.transforms import gen_fid_mask
        import numpy as np
        fids = np.array([[1, 2, -1], [3, 4, -1]], np.int64)
        np.testing.assert_allclose(gen_fid_mask(fids, 2), [1.0, 0.0])


class TestFeatureList:
    def _write(self, tmp_path):
        content = """\
# demo feature list
column_name: user, item, context
cache_column: uid_cache
feature_name=f_uid slot=1 method=DirectString depend=user occurrence_threshold=3
feature_name=fc_clicks slot=200 method=Seq depend=user,item max_seq_len=20 shared=true
feature_name=fc_a-fc_b slot=201 method=Combine depend=a,b args=x, y
"""
        p = tmp_path / "fl.conf"
        p.write_text(content)
        return str(p)

    def test_parse_and_lookup(self, tmp_path):
        from monolith_tpu.data.feature_list import FeatureList
        fl = FeatureList.parse(self._write(tmp_path))
        assert len(fl) == 3
        assert fl.column_name == {"user", "item", "context"}
        assert fl.cache_columns == ["uid_cache"]
        # lookup by bare name, prefixed name, and slot
        assert fl["uid"].slot == 1
        assert fl["f_uid"].occurrence_threshold == 3
        assert fl[200].name == "clicks"
        assert fl["a-b"].depend == ["a", "b"]
        assert fl["clicks"].shared is True
        assert fl["clicks"].max_seq_len == 20
        assert "uid" in fl and "nope" not in fl
        assert fl.get("nope") is None

    def test_to_feature_configs(self, tmp_path):
        from monolith_tpu.data.feature_list import FeatureList
        fl = FeatureList.parse(self._write(tmp_path))
        cfgs = {c.name: c for c in fl.to_feature_configs(table="t")}
        assert cfgs["clicks"].combiner == "firstn"
        assert cfgs["clicks"].max_length == 20
        assert cfgs["uid"].combiner == "sum"
        assert cfgs["uid"].table == "t"


def test_batcher_rehash_mid_stream():
    """Dedup scratch grows lazily by LIVE unique count (mid-epoch rehash);
    correctness must hold when one stream's uniques exceed the initial
    scratch capacity several times over."""
    import numpy as np
    from monolith_tpu.embedding.host_store import Batcher
    b = Batcher(expected_unique=64)  # tiny initial scratch (128 slots)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 5000, size=20000).astype(np.int64)
    vals[rng.random(20000) < 0.05] = -1  # sprinkle padding
    unique, index, counts, overflow = b.dedup(vals, num_shards=1,
                                              shard_cap=8192)
    c = int(counts[0])
    assert c == len(set(int(v) for v in vals if v != -1))
    assert overflow == 0
    # every index must point at its own fid
    flat_u = unique.ravel()
    for i in range(0, 20000, 37):
        if vals[i] == -1:
            assert index[i] == -1
        else:
            assert flat_u[index[i]] == vals[i]
    # second epoch after growth still correct
    unique2, index2, counts2, _ = b.dedup(vals[:500], 1, 8192)
    u2 = unique2.ravel()
    for i in range(0, 500, 11):
        if vals[i] != -1:
            assert u2[index2[i]] == vals[i]


class TestKafkaSourceContract:
    """Contract test against a fake consumer (the reference fakes Kafka in
    its dataset tests too — data/kernels/kafka_kernels.cc test strategy):
    subscribe -> poll loop -> payload decode -> close, with error messages
    skipped and idle stop honored."""

    class FakeMessage:
        def __init__(self, value=None, error=None):
            self._value, self._error = value, error

        def value(self):
            return self._value

        def error(self):
            return self._error

    class FakeConsumer:
        def __init__(self, conf, messages):
            self.conf = conf
            self.messages = list(messages)
            self.subscribed = None
            self.closed = False

        def subscribe(self, topics):
            self.subscribed = topics

        def poll(self, timeout):
            if self.messages:
                return self.messages.pop(0)
            return None  # idle

        def close(self):
            self.closed = True

    def _examples(self, n):
        from monolith_tpu.data.example import Example
        return [Example(features={"u": np.array([100 + i], np.int64)},
                        labels=np.array([float(i % 2)], np.float32))
                for i in range(n)]

    def test_native_payloads(self):
        from monolith_tpu.data.datasets import KafkaSource
        exs = self._examples(4)
        msgs = [self.FakeMessage(value=e.to_bytes()) for e in exs]
        msgs.insert(2, self.FakeMessage(error="broker hiccup"))  # skipped
        holder = {}

        def factory(conf):
            holder["c"] = self.FakeConsumer(conf, msgs)
            return holder["c"]

        src = KafkaSource(["topic-a"], group_id="g", brokers="b:9092",
                          poll_timeout_s=0.01, stop_on_idle_s=0.02,
                          consumer_factory=factory)
        got = list(src)
        assert len(got) == 4
        np.testing.assert_array_equal(got[3].features["u"], [103])
        assert holder["c"].subscribed == ["topic-a"]
        assert holder["c"].closed
        assert holder["c"].conf["bootstrap.servers"] == "b:9092"
        assert holder["c"].conf["group.id"] == "g"

    def test_reference_pb_payloads(self):
        """Messages in the reference Example wire format stream straight
        into Examples (a monolith Kafka topic needs no conversion)."""
        from monolith_tpu.data import pb_compat
        from monolith_tpu.data.datasets import KafkaSource
        exs = self._examples(3)
        msgs = [self.FakeMessage(value=pb_compat.encode_example(e))
                for e in exs]
        src = KafkaSource(["t"], group_id="g", brokers="b",
                          poll_timeout_s=0.01, stop_on_idle_s=0.02,
                          fmt="pb_example",
                          consumer_factory=lambda conf:
                          self.FakeConsumer(conf, list(msgs)))
        got = list(src)
        assert len(got) == 3
        for i, ex in enumerate(got):
            np.testing.assert_array_equal(ex.features["u"], [100 + i])
            np.testing.assert_allclose(ex.labels, [float(i % 2)])


class TestMovieLens:
    """ratings.dat / u.data ingestion (ref markdown/demo/ml_dataset.py)."""

    def test_parses_both_formats_and_splits(self, tmp_path):
        from monolith_tpu.data.movielens import (MovieLensRatings,
                                                 load_ratings)
        ml1m = tmp_path / "ratings.dat"
        ml1m.write_text("1::10::5::978300760\n2::20::3::978302109\n"
                        "1::20::4::978301968\n2::10::1::978300275\n")
        ml100k = tmp_path / "u.data"
        ml100k.write_text("userId\titemId\trating\tts\n"  # header skipped
                          "1\t10\t5\t881250949\n2\t20\t2\t891717742\n")
        c = load_ratings(str(ml1m))
        assert list(c["user"]) == [1, 2, 1, 2]
        assert list(c["rating"]) == [5.0, 3.0, 4.0, 1.0]
        c2 = load_ratings(str(ml100k))
        assert list(c2["item"]) == [10, 20]

        ds = MovieLensRatings(path=str(ml1m), batch_size=2, epochs=1,
                              eval_fraction=0.5, shuffle=False)
        (fb, b), = list(iter(ds))
        assert fb["user_id"].shape == (2, 1)
        # rating>=4 binarization: rows [5,3] -> [1,0]
        assert list(b["label"]) == [1.0, 0.0]
        ev = MovieLensRatings(path=str(ml1m), batch_size=2, epochs=1,
                              split="eval", eval_fraction=0.5)
        (_, be), = list(iter(ev))
        assert list(be["label"]) == [1.0, 0.0]  # rows [4,1]

    def test_vendored_sample_loads(self):
        import os

        from monolith_tpu.data.movielens import load_ratings
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples", "movielens",
            "ratings.dat")
        c = load_ratings(path)
        assert len(c["user"]) == 80_000
        r = c["rating"]
        assert 0.5 < (r >= 4).mean() < 0.65  # MovieLens-like positive rate
