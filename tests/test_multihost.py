"""Multi-process (multi-host) training tests.

Mirrors the reference's clusterless distributed tests
(cpu_training_distributed_test_binary.py + estimator_dist_test.py): spawn
one JAX process per "host", each driving 4 local virtual devices (the v5e
4-chips/host topology), with gloo CPU collectives. Covers: training with
the 3-a2a step, the K-steps-per-dispatch block path, distributed
checkpoint save -> restore at the SAME topology, restore at a DIFFERENT
shard count (8 -> 4 reshard through the single-host path), and loss parity
against ShardedTrainer on the same stream.
"""

import ast
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")

# every test here either spawns 2 gloo worker processes or compiles 8-device
# shard_map programs: the slow tier (see pytest.ini; run fast tier with -m "not slow")
pytestmark = pytest.mark.slow


def run_workers(nproc, steps, local_devices, mode, ckpt_dir):
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=ROOT)
    env.pop("XLA_FLAGS", None)  # workers manage their own device config
    # CPU-only workers: skip the axon TPU-plugin registration that the
    # image's sitecustomize runs at interpreter start — it dials the TPU
    # tunnel and can hang python startup when the tunnel is flaky
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), str(steps),
         str(local_devices), mode, ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(nproc)]
    outs = [p.communicate(timeout=550)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outs


def parse_results(outs, pattern):
    results = {}
    for out in outs:
        m = re.search(pattern, out)
        assert m, f"worker output missing RESULT line:\n{out[-2000:]}"
        results[int(m.group(1))] = m
    return results


@pytest.mark.timeout(600)
def test_two_process_four_device_training(tmp_path):
    """2 processes x 4 devices = 8 shards: train (singles + block), save a
    distributed checkpoint, verify shard ownership and loss agreement."""
    outs = run_workers(2, 8, 4, "train", str(tmp_path))
    pat = (r"RESULT (\d) first=([\d.]+) last=([\d.]+) auc=([\d.]+) "
           r"sizes=(\[[^\]]*\]) sums=(\[[^\]]*\])")
    res = parse_results(outs, pat)
    first = {p: float(m.group(2)) for p, m in res.items()}
    last = {p: float(m.group(3)) for p, m in res.items()}
    sizes = {p: ast.literal_eval(m.group(5)) for p, m in res.items()}
    # pmean'd losses agree across processes and decrease
    assert abs(first[0] - first[1]) < 1e-6
    assert abs(last[0] - last[1]) < 1e-6
    assert last[0] < first[0]
    # each process owns 4 shards and trained ids landed in all of them
    assert len(sizes[0]) == 4 and len(sizes[1]) == 4
    assert all(s > 0 for s in sizes[0] + sizes[1])
    # checkpoint files: one per (table, shard), written by the owning process
    files = sorted(os.listdir(os.path.join(tmp_path, f"ckpt-8", "tables")))
    assert files == [f"sparse-s{s}.npz" for s in range(8)]

    # same topology restore: sizes and pool checksums must match exactly
    outs2 = run_workers(2, 0, 4, "restore", str(tmp_path))
    pat2 = (r"RESULT (\d) step=(\d+) sizes=(\[[^\]]*\]) sums=(\[[^\]]*\]) "
            r"post=([\d.]+)")
    res2 = parse_results(outs2, pat2)
    for p in (0, 1):
        assert int(res2[p].group(2)) == 8
        assert ast.literal_eval(res2[p].group(3)) == sizes[p]
        np.testing.assert_allclose(
            ast.literal_eval(res2[p].group(4)),
            ast.literal_eval(res[p].group(6)), rtol=1e-6)


@pytest.mark.timeout(600)
def test_multihost_ckpt_reshards_to_single_process(tmp_path):
    """A distributed checkpoint written by 2 processes restores into a
    single-process trainer at HALF the shard count (8 -> 4 reshard) with
    every entry preserved."""
    outs = run_workers(2, 4, 4, "train", str(tmp_path))
    pat = (r"RESULT (\d) first=([\d.]+) last=([\d.]+) auc=([\d.]+) "
           r"sizes=(\[[^\]]*\]) sums=(\[[^\]]*\])")
    res = parse_results(outs, pat)
    total_saved = sum(sum(ast.literal_eval(m.group(5)))
                      for m in res.values())

    import jax
    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.mesh import make_mesh
    from monolith_tpu.parallel.sharded import ShardedTrainer
    from monolith_tpu.training import checkpoint
    from monolith_tpu.training.trainer import TrainerConfig

    task = DeepFMTask(embedding_dim=8, capacity_per_shard=4096,
                      hidden=(16, 8), init_scale=0.0)
    mesh = make_mesh(4)
    tr = ShardedTrainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=4, unique_cap=512, new_cap=512),
        log_every=0), mesh=mesh)
    data = SyntheticCTR(num_users=100, num_items=60, batch_size=128,
                        seed=77)
    it = iter(data)
    fb, b = next(it)
    tr.train_step(fb, b)  # init dense params before restore
    step = checkpoint.restore(tr, str(tmp_path))
    assert step == 4
    total = sum(st.size() for st in tr.engine.stores["sparse"])
    assert total == total_saved
    out = tr.train_step(*next(it))
    assert np.isfinite(np.asarray(out["loss"])).all()


@pytest.mark.timeout(600)
def test_multihost_matches_sharded_losses(tmp_path):
    """The multi-host 3-a2a step must train the same model the single-host
    ShardedTrainer does: same synthetic stream, same shard count, same
    (deterministic) init -> same loss trajectory within float tolerance."""
    outs = run_workers(2, 8, 4, "train", str(tmp_path / "mh"))
    pat = (r"RESULT (\d) first=([\d.]+) last=([\d.]+) auc=([\d.]+)")
    res = parse_results(outs, pat)
    mh_first, mh_last = float(res[0].group(2)), float(res[0].group(3))

    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.mesh import make_mesh
    from monolith_tpu.parallel.sharded import ShardedTrainer
    from monolith_tpu.training.trainer import TrainerConfig

    task = DeepFMTask(embedding_dim=8, capacity_per_shard=4096,
                      hidden=(16, 8), init_scale=0.0)
    tr = ShardedTrainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=8, unique_cap=512, new_cap=512,
                            bucket_cap=128, exchange="a2a"),
        log_every=0), mesh=make_mesh(8))
    # reassemble the same global stream the two workers consumed
    data = SyntheticCTR(num_users=100, num_items=60, batch_size=64,
                        seed=1000)
    it = iter(data)
    losses = []
    for i in range(8):
        b0, b1 = next(it), next(it)
        fb = {k: np.concatenate([b0[0][k], b1[0][k]]) for k in b0[0]}
        bb = {k: np.concatenate([b0[1][k], b1[1][k]]) for k in b0[1]}
        out = tr.train_step(fb, bb, ts=i)
        losses.append(float(np.asarray(out["loss"])))
    sh_first, sh_last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert abs(sh_first - mh_first) < 2e-3, (sh_first, mh_first)
    assert abs(sh_last - mh_last) < 2e-3, (sh_last, mh_last)


def test_multihost_evaluate_single_process():
    """evaluate(): lookup-only (no admission), loss pmean'd, AUC over the
    local slice. Runs the same program a multi-process job compiles."""
    import jax
    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.multihost import MultiHostTrainer
    from monolith_tpu.training.trainer import TrainerConfig

    task = DeepFMTask(embedding_dim=8, capacity_per_shard=4096,
                      hidden=(16,), init_scale=0.0)
    tr = MultiHostTrainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=len(jax.devices()), unique_cap=256,
                            new_cap=256, bucket_cap=64), log_every=0))
    data = SyntheticCTR(num_users=60, num_items=40,
                        batch_size=8 * len(jax.devices()), seed=3)
    it = iter(data)
    for i in range(10):
        tr.train_step(*next(it), ts=i)
    sizes_before = [s.size() for s in tr.engine.stores["sparse"]]
    res = tr.evaluate(iter([next(it) for _ in range(3)]))
    assert np.isfinite(res["loss"]) and 0.0 < res["auc"] < 1.0
    # eval admits nothing
    assert [s.size() for s in tr.engine.stores["sparse"]] == sizes_before


@pytest.mark.timeout(600)
def test_two_process_global_eval_auc(tmp_path):
    """evaluate() psums the AUC histograms across the mesh: both processes
    must report the IDENTICAL global AUC/loss, and it must match a
    single-process run over the concatenated stream within the same
    tolerance the loss-parity test uses (training trajectories agree to
    ~1e-3, so eval metrics do too)."""
    outs = run_workers(2, 8, 2, "eval", str(tmp_path))
    pat = r"RESULT (\d) auc=([\d.]+) loss=([\d.]+)"
    res = parse_results(outs, pat)
    auc = {p: float(m.group(2)) for p, m in res.items()}
    loss = {p: float(m.group(3)) for p, m in res.items()}
    assert auc[0] == auc[1], "global AUC differs across processes"
    assert loss[0] == loss[1]
    assert 0.0 < auc[0] < 1.0

    # single-process reference over the SAME concatenated stream
    import jax
    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.multihost import MultiHostTrainer
    from monolith_tpu.training.trainer import TrainerConfig

    task = DeepFMTask(embedding_dim=8, capacity_per_shard=4096,
                      hidden=(16, 8), init_scale=0.0)
    tr = MultiHostTrainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=len(jax.devices()), unique_cap=512,
                            new_cap=512, bucket_cap=128),
        log_every=0, metrics_enabled=True))
    data = SyntheticCTR(num_users=100, num_items=60, batch_size=64,
                        seed=1000)
    it = iter(data)

    def next_global():
        b0, b1 = next(it), next(it)
        fb = {k: np.concatenate([b0[0][k], b1[0][k]]) for k in b0[0]}
        bb = {k: np.concatenate([b0[1][k], b1[1][k]]) for k in b0[1]}
        return fb, bb

    for i in range(8):
        tr.train_step(*next_global(), ts=i)
    ref = tr.evaluate(iter([next_global() for _ in range(3)]))
    assert abs(ref["auc"] - auc[0]) < 2e-2, (ref["auc"], auc[0])
    assert abs(ref["loss"] - loss[0]) < 2e-3, (ref["loss"], loss[0])


@pytest.mark.timeout(600)
def test_two_process_tiered_spill_revive(tmp_path):
    """Two-tier (HBM + host archive) storage under MultiHostTrainer
    (VERDICT r2 #6): train, spill every live row to the local host
    archives, keep training the same id universe so spilled ids re-admit
    and revive owner-side inside the map callback. Loss parity against
    the single-host ShardedTrainer tiered path on the concatenated
    stream proves the revived state overlays EXACTLY — a fresh init at
    re-admission would diverge the post-spill trajectory."""
    outs = run_workers(2, 6, 4, "tiered", str(tmp_path))
    pat = (r"RESULT (\d) spilled=(\d+) revived=(\d+) sizes_mid=(\d+) "
           r"arch_left=(\d+) first=([\d.]+) last=([\d.]+)")
    res = parse_results(outs, pat)
    for p in (0, 1):
        spilled = int(res[p].group(2))
        revived = int(res[p].group(3))
        sizes_mid = int(res[p].group(4))
        assert spilled == sizes_mid > 0
        assert 0 < revived <= spilled
    # pmean'd losses agree across processes
    assert abs(float(res[0].group(6)) - float(res[1].group(6))) < 1e-6
    assert abs(float(res[0].group(7)) - float(res[1].group(7))) < 1e-6
    mh_first, mh_last = float(res[0].group(6)), float(res[0].group(7))

    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.mesh import make_mesh
    from monolith_tpu.parallel.sharded import ShardedTrainer
    from monolith_tpu.training.trainer import TrainerConfig

    task = DeepFMTask(embedding_dim=8, capacity_per_shard=4096,
                      hidden=(16, 8), init_scale=0.0)
    tr = ShardedTrainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=8, unique_cap=512, new_cap=512,
                            bucket_cap=128, exchange="a2a", tiered=True),
        log_every=0), mesh=make_mesh(8))
    data = SyntheticCTR(num_users=100, num_items=60, batch_size=64,
                        seed=1000)
    it = iter(data)

    def next_global():
        b0, b1 = next(it), next(it)
        fb = {k: np.concatenate([b0[0][k], b1[0][k]]) for k in b0[0]}
        bb = {k: np.concatenate([b0[1][k], b1[1][k]]) for k in b0[1]}
        return fb, bb

    losses = []
    for i in range(6):
        out = tr.train_step(*next_global(), ts=i)
        losses.append(float(np.asarray(out["loss"])))
    tr.spill_expired(expire_before=10 ** 9)
    for i in range(6):
        out = tr.train_step(*next_global(), ts=6 + i)
        losses.append(float(np.asarray(out["loss"])))
    sh_first, sh_last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert abs(sh_first - mh_first) < 2e-3, (sh_first, mh_first)
    assert abs(sh_last - mh_last) < 2e-3, (sh_last, mh_last)


@pytest.mark.timeout(600)
def test_two_process_streaming_sync(tmp_path):
    """Realtime parameter sync on the multi-host topology (ref per-PS sync
    thread, cpu_training.py:1736-1767): 2 processes x 2 devices train under
    MultiHostTrainer with record_touch, export a distributed per-shard
    model, process 0 serves it, and BOTH processes push their local shards'
    touched-row deltas. Every live fid in every shard must read back from
    the replica with its exact final trained value, and the replica must
    hold the union of both processes' shards."""
    outs = run_workers(2, 15, 2, "streaming", str(tmp_path))
    pat = (r"RESULT (\d) pushed=(\d+) rounds=(\d+) matched=(\d+) "
           r"checked=(\d+) local_size=(\d+) replica_size=(-?\d+)")
    res = parse_results(outs, pat)
    for p in (0, 1):
        assert int(res[p].group(2)) > 0, "no rows pushed"
        assert int(res[p].group(3)) >= 3, "expected >=3 sync rounds"
        checked = int(res[p].group(5))
        assert checked > 0
        # every checked fid matches its trained value exactly
        assert int(res[p].group(4)) == checked
    # replica holds at least the union of both processes' live ids (it may
    # hold more: rows pushed for ids later evicted locally)
    total = int(res[0].group(6)) + int(res[1].group(6))
    assert int(res[0].group(7)) >= total > 0


@pytest.mark.timeout(600)
def test_estimator_multiprocess_resume(tmp_path):
    """Estimator in a 2-process run: picks MultiHostTrainer, saves a
    distributed checkpoint at the end of train(), and a SECOND 2-process
    run restores from model_dir and continues from the saved step."""
    outs = run_workers(2, 5, 2, "estimator", str(tmp_path))
    pat = r"RESULT (\d) step=(\d+) loss=([\d.]+) auc=([\d.]+)"
    res = parse_results(outs, pat)
    assert all(int(m.group(2)) == 5 for m in res.values())
    outs2 = run_workers(2, 4, 2, "estimator", str(tmp_path))
    res2 = parse_results(outs2, pat)
    # resumed at 5, trained 4 more
    assert all(int(m.group(2)) == 9 for m in res2.values())


@pytest.mark.timeout(600)
def test_fused_exchange_launch_census():
    """Structural check of the fused exchange (VERDICT r2 #10): the number
    of all_to_all and io_callback ops in the multihost step program is
    INDEPENDENT of table count (ref distributed_ps_sync.py:130-159 — one
    alltoall exchanges the fused fid tensor for all tables). Counted at
    trace time by wrapping the primitives during the first train_step."""
    import unittest.mock as mock

    import jax
    import jax.experimental

    from monolith_tpu.data.synthetic import SyntheticMultiSlot
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.multislot import MultiSlotTask
    from monolith_tpu.parallel.multihost import MultiHostTrainer
    from monolith_tpu.training.trainer import TrainerConfig

    counts = {}
    orig_a2a = jax.lax.all_to_all
    orig_cb = jax.experimental.io_callback
    for n_tables in (1, 3):
        task = MultiSlotTask(num_tables=n_tables, num_slots=4,
                             embedding_dim=8, capacity_per_shard=1024,
                             history_length=6, hidden=(16,), merge=False)
        n_physical = n_tables + 1  # + history table
        assert len(task.tables()) == n_physical
        cfg = TrainerConfig(engine=EngineConfig(num_shards=8, unique_cap=256,
                                                new_cap=256, bucket_cap=64),
                            log_every=0)
        trainer = MultiHostTrainer(task, cfg)
        data = SyntheticMultiSlot(num_slots=4, vocab_per_slot=60,
                                  history_length=6, batch_size=64, seed=7)
        fb, b = next(iter(data))
        c = {"a2a": 0, "cb": 0}

        def count_a2a(*a, **k):
            c["a2a"] += 1
            return orig_a2a(*a, **k)

        def count_cb(*a, **k):
            c["cb"] += 1
            return orig_cb(*a, **k)

        with mock.patch.object(jax.lax, "all_to_all", count_a2a), \
                mock.patch.object(jax.experimental, "io_callback", count_cb):
            out = trainer.train_step(fb, b)  # first call traces the program
        assert np.isfinite(float(out["loss"]))
        counts[n_tables] = dict(c)
    assert counts[1]["a2a"] > 0 and counts[1]["cb"] > 0
    assert counts[1] == counts[3], counts  # table-count independent


@pytest.mark.timeout(600)
def test_bf16_tables_exchange_in_bf16():
    """bf16 tables' embedding exchange must ride the a2a in bf16 (lossless
    forward — the rows came from a bf16 pool; halves a2a#2/a2a#3 bytes),
    while f32 tables keep f32: with a mixed model both dtype groups appear,
    and training stays finite."""
    import unittest.mock as mock

    import jax
    import jax.numpy as jnp

    from monolith_tpu.data.synthetic import SyntheticMultiSlot
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.multislot import MultiSlotTask
    from monolith_tpu.parallel.multihost import MultiHostTrainer
    from monolith_tpu.training.trainer import TrainerConfig

    task = MultiSlotTask(num_tables=2, num_slots=4, embedding_dim=8,
                         capacity_per_shard=1024, history_length=6,
                         hidden=(16,), merge=False,
                         table_dtype=jnp.bfloat16, stochastic_rounding=True)
    cfg = TrainerConfig(engine=EngineConfig(num_shards=8, unique_cap=256,
                                            new_cap=256, bucket_cap=64),
                        log_every=0)
    trainer = MultiHostTrainer(task, cfg)
    data = SyntheticMultiSlot(num_slots=4, vocab_per_slot=60,
                              history_length=6, batch_size=64, seed=5)
    it = iter(data)
    a2a_dtypes = []
    orig_a2a = jax.lax.all_to_all

    def spy(x, *a, **k):
        a2a_dtypes.append(x.dtype)
        return orig_a2a(x, *a, **k)

    with mock.patch.object(jax.lax, "all_to_all", spy):
        fb, b = next(it)
        out = trainer.train_step(fb, b)
    assert np.isfinite(float(out["loss"]))
    # all tables are bf16 here: the embedding exchange must be bf16
    assert jnp.bfloat16 in a2a_dtypes, a2a_dtypes
    for _ in range(5):
        fb, b = next(it)
        out = trainer.train_step(fb, b)
    assert np.isfinite(float(out["loss"]))


@pytest.mark.timeout(600)
def test_two_process_multislot_smoke(tmp_path):
    """Multi-TABLE multihost smoke (VERDICT r2 #10 done-criterion): 3
    physical tables (2 scalar + history, merge=False) train under the fused
    exchange — one id a2a + one host callback + one embedding a2a per step
    regardless of table count — including the block path; losses finite and
    decreasing, every table populated on its owning shards."""
    outs = run_workers(2, 12, 2, "multislot", str(tmp_path))
    pat = r"RESULT (\d) first=([\d.]+) last=([\d.]+)"
    res = parse_results(outs, pat)
    # the step loss is the GLOBAL psum'd mean: both processes must report
    # bit-identical trajectories (the decisive multi-table exchange check;
    # a per-table routing/count bug would diverge them immediately)
    vals = {p: (m.group(2), m.group(3)) for p, m in res.items()}
    assert vals[0] == vals[1], vals
    assert 0.0 < float(vals[0][0]) < 1.0


@pytest.mark.timeout(600)
def test_two_process_evict_zeroes_recycled_rows(tmp_path):
    """Recycled-row zeroing at the multi-host topology (VERDICT r3 #5):
    eviction frees host rows, the freed DEVICE rows queue host-side and
    drain through the map callback, and the jitted step zeroes them before
    any gather. The worker proves the hazard existed (stale nonzero content
    on device right after evict), then that one step later every drained
    row that wasn't re-allocated reads zeros and the queue is empty — so an
    async_optimize stale-forward can never read an evicted id's state."""
    outs = run_workers(2, 6, 2, "evictzero", str(tmp_path))
    pat = r"RESULT (\d) stale=(\d+) checked=(\d+) bad=(\d+) pend=(\d+)"
    res = parse_results(outs, pat)
    for p, m in res.items():
        stale, checked, bad, pend = (int(m.group(i)) for i in range(2, 6))
        assert stale > 0, f"proc {p}: evicted rows were already clean"
        assert checked > 0, f"proc {p}: nothing to check"
        assert bad == 0, f"proc {p}: {bad}/{checked} recycled rows stale"
        assert pend == 0, f"proc {p}: pending-zero queue not drained"


@pytest.mark.timeout(600)
def test_two_process_save_with_pending_zeros(tmp_path):
    """A distributed checkpoint taken BETWEEN evict and the draining step
    must still be stale-free: save_distributed zeroes queued rows in the
    saved copy, and restore clears the queue (the queued rows belong to the
    pre-restore mapping — draining them after restore would wipe rows the
    restored store maps to live fids)."""
    outs = run_workers(2, 6, 2, "evictsave", str(tmp_path))
    pat = (r"RESULT (\d) step=(\d+) pend=(\d+) pend_after=(\d+) "
           r"checked=(\d+) saved_nonzero=(\d+) post=([\d.]+)")
    res = parse_results(outs, pat)
    for p, m in res.items():
        pend, pend_after = int(m.group(3)), int(m.group(4))
        checked, saved_nonzero = int(m.group(5)), int(m.group(6))
        assert pend > 0, f"proc {p}: nothing was pending at save"
        assert checked > 0, f"proc {p}: nothing checked"
        assert saved_nonzero == 0, \
            f"proc {p}: {saved_nonzero}/{checked} freed rows stale in ckpt"
        assert pend_after == 0, f"proc {p}: restore left the queue populated"
        assert float(m.group(7)) < 1.0, m.group(7)


def test_multihost_async_optimize_block_no_lost_updates():
    """Pipelined (1-step-stale) multihost block (EngineConfig.async_optimize,
    ref enable_async_optimize cpu_training.py:488): same ids every step —
    the forward is stale but the optimize re-gathers AFTER the previous
    step's deferred scatter lands, so no update is lost; pool movement must
    be comparable to the synchronous block, and losses finite/decreasing."""
    import numpy as np

    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.multihost import MultiHostTrainer
    from monolith_tpu.training.trainer import TrainerConfig

    data = SyntheticCTR(num_users=50, num_items=30, batch_size=64, seed=3)
    pairs = [data.batch() for _ in range(7)]

    def run(async_mode):
        task = DeepFMTask(embedding_dim=8, capacity_per_shard=2048,
                          hidden=(16, 8))
        cfg = TrainerConfig(engine=EngineConfig(
            num_shards=8, unique_cap=256, new_cap=256, bucket_cap=64,
            async_optimize=async_mode), log_every=0)
        tr = MultiHostTrainer(task, cfg)
        tr.train_step(*pairs[0], ts=0)  # init + admissions
        out = tr.train_step_block(pairs[1:], ts=1)
        losses = np.asarray(out["loss"])
        assert np.isfinite(losses).all(), losses
        return tr, losses

    t_sync, l_sync = run(False)
    t_async, l_async = run(True)

    def pool(tr):
        import jax
        return np.asarray(jax.device_get(
            tr.table_states["sparse"]["data"]))

    moved_sync = np.abs(pool(t_sync)).sum()
    moved_async = np.abs(pool(t_async)).sum()
    # updates accumulate across all scanned steps (not clobbered): async
    # differs from sync only via 1-step forward staleness, not lost writes
    assert moved_async > 0.5 * moved_sync, (moved_async, moved_sync)
    assert moved_async < 2.0 * moved_sync, (moved_async, moved_sync)
    # still learns on the same stream
    assert l_async[-1] < l_async[0] + 0.05, l_async


def test_live_prefix_checkpoint_into_distributed_restore(tmp_path):
    """ADVICE r4 (high): checkpoints store pool[:high_water] (live-prefix);
    restore_distributed's same-shard-count path must pad back to capacity
    instead of building tables with capacity == high-water mark. Covers the
    documented "works from single-host save" path (ShardedTrainer.save ->
    MultiHostTrainer restore) AND the save_distributed -> restore_distributed
    roundtrip (save_distributed now also writes live-prefix, ADVICE r4 low)."""
    import glob

    import jax

    from monolith_tpu.data.synthetic import SyntheticCTR
    from monolith_tpu.embedding.engine import EngineConfig
    from monolith_tpu.models.deepfm import DeepFMTask
    from monolith_tpu.parallel.mesh import make_mesh
    from monolith_tpu.parallel.multihost import MultiHostTrainer
    from monolith_tpu.parallel.sharded import ShardedTrainer
    from monolith_tpu.training import checkpoint
    from monolith_tpu.training.trainer import TrainerConfig

    cap = 1024

    def make_mh():
        task = DeepFMTask(embedding_dim=8, capacity_per_shard=cap,
                          hidden=(16,), init_scale=0.0)
        return MultiHostTrainer(task, TrainerConfig(
            engine=EngineConfig(num_shards=8, unique_cap=128, new_cap=128,
                                bucket_cap=64), log_every=0, seed=5))

    data = SyntheticCTR(num_users=60, num_items=40, batch_size=64, seed=5)
    it = iter(data)

    # --- path 1: single-host (ShardedTrainer) live-prefix save ---------
    task = DeepFMTask(embedding_dim=8, capacity_per_shard=cap,
                      hidden=(16,), init_scale=0.0)
    src = ShardedTrainer(task, TrainerConfig(
        engine=EngineConfig(num_shards=8, unique_cap=128, new_cap=128),
        log_every=0, seed=5), make_mesh(8))
    for _ in range(4):
        src.train_step(*next(it), ts=1)
    p1 = checkpoint.save(src, str(tmp_path / "single"))
    # the files must actually BE live-prefix (smaller than capacity),
    # otherwise this test stops covering the pad path
    pools = [np.load(f)["pool"] for f in
             glob.glob(os.path.join(p1, "tables", "*.npz"))]
    assert all(p.shape[0] < cap for p in pools), \
        [p.shape for p in pools]

    dst = make_mh()
    dst.train_step(*next(iter(SyntheticCTR(num_users=60, num_items=40,
                                           batch_size=64, seed=99))), ts=1)
    checkpoint.restore_distributed(dst, str(tmp_path / "single"))
    for tname in src.engine.tables:
        for leaf_a, leaf_b in zip(
                jax.tree.leaves(jax.device_get(src.table_states[tname])),
                jax.tree.leaves(jax.device_get(dst.table_states[tname]))):
            assert leaf_a.shape == leaf_b.shape, (leaf_a.shape, leaf_b.shape)
            np.testing.assert_allclose(
                np.asarray(leaf_a, np.float32),
                np.asarray(leaf_b, np.float32), rtol=1e-6)

    # --- path 2: save_distributed live-prefix roundtrip ----------------
    mh = make_mh()
    it2 = iter(SyntheticCTR(num_users=60, num_items=40, batch_size=64,
                            seed=7))
    for i in range(4):
        mh.train_step(*next(it2), ts=1)
    p2 = checkpoint.save_distributed(mh, str(tmp_path / "dist"))
    pools = [np.load(f)["pool"] for f in
             glob.glob(os.path.join(p2, "tables", "*.npz"))]
    assert all(p.shape[0] < cap for p in pools), \
        [p.shape for p in pools]

    mh2 = make_mh()
    mh2.train_step(*next(iter(SyntheticCTR(num_users=60, num_items=40,
                                           batch_size=64, seed=98))), ts=1)
    checkpoint.restore_distributed(mh2, str(tmp_path / "dist"))
    for tname in mh.engine.tables:
        for leaf_a, leaf_b in zip(
                jax.tree.leaves(jax.device_get(mh.table_states[tname])),
                jax.tree.leaves(jax.device_get(mh2.table_states[tname]))):
            assert leaf_a.shape == leaf_b.shape
            np.testing.assert_allclose(
                np.asarray(leaf_a, np.float32),
                np.asarray(leaf_b, np.float32), rtol=1e-6)
    # training continues from the restored state without error
    out = mh2.train_step(*next(it2), ts=2)
    assert np.isfinite(float(np.asarray(out["loss"])))
