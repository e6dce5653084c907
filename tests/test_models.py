"""Model-zoo tasks train end-to-end (FFM parity model, MMoE multitask)."""

import numpy as np
import pytest

from monolith_tpu.data.synthetic import SyntheticCTR
from monolith_tpu.embedding.engine import EngineConfig
from monolith_tpu.models import FFMTask, MMoETask
from monolith_tpu.training.trainer import Trainer, TrainerConfig


def cfg():
    return TrainerConfig(engine=EngineConfig(num_shards=1, unique_cap=1024,
                                             new_cap=1024), log_every=0)


class TestFFM:
    def test_ffm_learns(self):
        data = SyntheticCTR(num_users=100, num_items=60, batch_size=256, seed=31)
        tr = Trainer(FFMTask(capacity_per_shard=8192), cfg())
        it = iter(data)
        losses = []
        for i in range(80):
            fb, b = next(it)
            losses.append(float(tr.train_step(fb, b)["loss"]))
        assert np.mean(losses[-10:]) < np.mean(losses[:10])


class TestMMoE:
    def test_multitask_trains(self):
        data = SyntheticCTR(num_users=80, num_items=40, batch_size=128, seed=32)
        tr = Trainer(MMoETask(capacity_per_shard=8192, num_tasks=2), cfg())
        it = iter(data)
        losses = []
        for i in range(40):
            fb, b = next(it)
            # synthesize a second label head
            b = dict(b)
            b["labels"] = np.stack([b["label"], 1.0 - b["label"]], axis=1)
            out = tr.train_step(fb, b)
            losses.append(float(out["loss"]))
            assert "loss_task0" in out["aux"]
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


class TestDIN:
    def test_din_task_learns(self):
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.din import DINTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = DINTask(embedding_dim=8, capacity_per_shard=4096,
                       hidden=(32, 16))
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(num_shards=1, unique_cap=1024, new_cap=1024),
            log_every=0))
        data = SyntheticCTR(num_users=100, num_items=60, batch_size=256,
                            seed=21)
        it = iter(data)
        losses = []
        for _ in range(90):
            fb, b = next(it)
            out = tr.train_step(fb, b)
            losses.append(float(out["loss"]))
        assert np.isfinite(losses).all()
        ev = tr.evaluate(iter(SyntheticCTR(num_users=100, num_items=60,
                                           batch_size=256, seed=21)),
                         max_steps=10)
        assert ev["auc"] > 0.53, ev

    def test_dien_encoder_variant_runs(self):
        from monolith_tpu.data.synthetic import SyntheticCTR
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.din import DINTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = DINTask(embedding_dim=8, capacity_per_shard=2048,
                       hidden=(16,), seq_encoder="dien", history_length=6)
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(num_shards=1, unique_cap=512, new_cap=512),
            log_every=0))
        data = SyntheticCTR(num_users=50, num_items=30, batch_size=128, seed=3)
        fb, b = data.batch()
        fb = {k: (v[:, :6] if k == "hist_items" else v) for k, v in fb.items()}
        out = tr.train_step(fb, b)
        assert np.isfinite(float(out["loss"]))


class TestMultiSlot:
    """Production-shaped many-slot task (16 tables / 40 slots + DIN seq in
    the bench config; scaled down here)."""

    @pytest.mark.slow
    def test_trains_and_learns(self):
        from monolith_tpu.data.synthetic import SyntheticMultiSlot
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.multislot import MultiSlotTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = MultiSlotTask(num_tables=4, num_slots=10, embedding_dim=8,
                             capacity_per_shard=8192, history_length=6,
                             hidden=(32,))
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(unique_cap=2048, new_cap=2048),
            log_every=0, steps_per_dispatch=4))
        data = SyntheticMultiSlot(num_slots=10, vocab_per_slot=300,
                                  history_length=6, batch_size=256, seed=1)
        res = tr.train(iter(data), steps=41)
        assert res["auc"] > 0.515, res  # latent structure is learnable
        # all 5 tables saw traffic
        for t, stores in tr.engine.stores.items():
            assert stores[0].size() > 0, t

    def test_bf16_merged_bench_config_trains(self):
        """The exact bench-variant shape (MT_BENCH_DTYPE=bf16, scaled down):
        merged tables, bf16 pools + stochastic rounding, bf16 dense tower.
        Guards the cliff-escape configuration the driver bench leans on."""
        import jax.numpy as jnp

        from monolith_tpu.data.synthetic import SyntheticMultiSlot
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.multislot import MultiSlotTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        task = MultiSlotTask(num_tables=4, num_slots=10, embedding_dim=8,
                             capacity_per_shard=8192, history_length=6,
                             hidden=(32,), merge=True,
                             table_dtype=jnp.bfloat16,
                             stochastic_rounding=True,
                             dense_dtype=jnp.bfloat16)
        tr = Trainer(task, TrainerConfig(
            engine=EngineConfig(unique_cap=2048, new_cap=2048),
            log_every=0, steps_per_dispatch=4))
        data = SyntheticMultiSlot(num_slots=10, vocab_per_slot=300,
                                  history_length=6, batch_size=256, seed=1)
        res = tr.train(iter(data), steps=41)
        assert np.isfinite(res["loss"])
        assert res["auc"] > 0.515, res
        for st in tr.table_states.values():
            assert st["data"].dtype == jnp.bfloat16

    def test_merged_matches_unmerged_bitwise(self):
        """merge=True collapses the 5 same-config tables into one physical
        table (ref MergedMultiTypeHashTable, multi_type_hash_table.py:253).
        Slot-encoded fids are disjoint, so per-row state and updates are
        independent of which pool hosts the row: with deterministic init
        (init_scale=0 -> zeros) the merged run must match the unmerged run
        loss-for-loss, step-for-step."""
        from monolith_tpu.data.synthetic import SyntheticMultiSlot
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.multislot import MultiSlotTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        losses = {}
        for merge in (False, True):
            task = MultiSlotTask(num_tables=4, num_slots=10, embedding_dim=8,
                                 capacity_per_shard=8192, history_length=6,
                                 hidden=(32,), init_scale=0.0, merge=merge)
            if merge:
                assert [s.name for s in task.tables()] == ["table_all"]
            tr = Trainer(task, TrainerConfig(
                engine=EngineConfig(unique_cap=4096, new_cap=4096),
                log_every=0))
            data = SyntheticMultiSlot(num_slots=10, vocab_per_slot=300,
                                      history_length=6, batch_size=256,
                                      seed=3)
            it = iter(data)
            ls = []
            for _ in range(12):
                fb, b = next(it)
                ls.append(float(tr.train_step(fb, b)["loss"]))
            losses[merge] = ls
        np.testing.assert_array_equal(losses[False], losses[True])

    def test_merge_max_bytes_bins_match_full_merge(self):
        """merge_max_bytes first-fit-bins the merged pool into capped
        sub-pools (the f32 escape for the Pallas >2GB DMA cliff, PERF.md):
        same disjoint-fid argument, so binned training must match the
        single-pool merged run loss-for-loss."""
        from monolith_tpu.data.synthetic import SyntheticMultiSlot
        from monolith_tpu.embedding.engine import EngineConfig
        from monolith_tpu.models.multislot import MultiSlotTask
        from monolith_tpu.training.trainer import Trainer, TrainerConfig

        losses = {}
        for cap_bytes in (0, 3 * 8192 * 512):  # 0 = one pool; else ~2 bins
            task = MultiSlotTask(num_tables=4, num_slots=10, embedding_dim=8,
                                 capacity_per_shard=8192, history_length=6,
                                 hidden=(32,), init_scale=0.0, merge=True,
                                 merge_max_bytes=cap_bytes)
            names = [s.name for s in task.tables()]
            if cap_bytes:
                assert len(names) > 1, names  # really split
            tr = Trainer(task, TrainerConfig(
                engine=EngineConfig(unique_cap=4096, new_cap=4096),
                log_every=0))
            data = SyntheticMultiSlot(num_slots=10, vocab_per_slot=300,
                                      history_length=6, batch_size=256,
                                      seed=3)
            it = iter(data)
            ls = []
            for _ in range(12):
                fb, b = next(it)
                ls.append(float(tr.train_step(fb, b)["loss"]))
            losses[cap_bytes] = ls
        vals = list(losses.values())
        np.testing.assert_array_equal(vals[0], vals[1])


class TestDCNAutoInt:
    def test_dcn_learns(self):
        from monolith_tpu.models.dcn import DCNTask

        data = SyntheticCTR(num_users=100, num_items=60, batch_size=256,
                            seed=33)
        tr = Trainer(DCNTask(capacity_per_shard=8192), cfg())
        it = iter(data)
        losses = []
        for _ in range(80):
            fb, b = next(it)
            losses.append(float(tr.train_step(fb, b)["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < np.mean(losses[:10])

    def test_autoint_learns(self):
        from monolith_tpu.models.autoint import AutoIntTask

        data = SyntheticCTR(num_users=100, num_items=60, batch_size=256,
                            seed=34)
        tr = Trainer(AutoIntTask(capacity_per_shard=8192), cfg())
        it = iter(data)
        losses = []
        for _ in range(80):
            fb, b = next(it)
            losses.append(float(tr.train_step(fb, b)["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < np.mean(losses[:10])
