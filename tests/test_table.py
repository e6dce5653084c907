"""Device embedding-table tests: row pool init/lookup/update, per-segment
optimizers, sentinel handling. Mirrors the numeric coverage of the reference's
optimizer *_test.cc and hash_table_ops_test.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monolith_tpu.embedding import initializers, optimizers, table
from monolith_tpu.embedding.spec import (Constant, PolynomialDecay,
                                         TableSegment, TableSpec,
                                         WarmupSchedule)


def make_spec(name="t", cap=32, segs=None):
    if segs is None:
        segs = (TableSegment(dim=4, optimizer=optimizers.SGD(learning_rate=0.5),
                             initializer=initializers.Constants(value=1.0)),)
    return TableSpec(name=name, capacity_per_shard=cap, segments=segs)


class TestTableBasics:
    def test_create_and_lookup_empty(self):
        spec = make_spec()
        st = table.create_state(spec)
        emb = table.lookup(spec, st, jnp.array([0, 5, -1], dtype=jnp.int32))
        np.testing.assert_allclose(emb, 0.0)

    def test_init_rows_writes_initializer(self):
        spec = make_spec()
        st = table.create_state(spec)
        rows = jnp.array([3, 7, -1], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        emb = table.lookup(spec, st, jnp.array([3, 7, 0], dtype=jnp.int32))
        np.testing.assert_allclose(emb[:2], 1.0)
        np.testing.assert_allclose(emb[2], 0.0)  # untouched row stays zero

    def test_minus_one_never_aliases_rows(self):
        # regression: jnp wraps negative indices before mode='fill'/'drop'
        spec = make_spec(cap=8)
        st = table.create_state(spec)
        st = table.init_rows(spec, st, jnp.array([7], dtype=jnp.int32),
                             jax.random.PRNGKey(0))
        # lookup of -1 must NOT return row 7
        emb = table.lookup(spec, st, jnp.array([-1], dtype=jnp.int32))
        np.testing.assert_allclose(emb, 0.0)
        # update at -1 must NOT touch row 7
        st2 = table.apply_gradients(spec, st, jnp.array([-1], dtype=jnp.int32),
                                    jnp.ones((1, 4)), jnp.int32(0))
        np.testing.assert_allclose(np.asarray(table.params_view(spec, st2)[7]),
                                   np.asarray(table.params_view(spec, st)[7]))

    def test_sgd_update(self):
        spec = make_spec()
        st = table.create_state(spec)
        rows = jnp.array([2], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        g = jnp.full((1, 4), 0.1)
        st = table.apply_gradients(spec, st, rows, g, jnp.int32(0))
        np.testing.assert_allclose(
            np.asarray(table.lookup(spec, st, rows)), 1.0 - 0.5 * 0.1, rtol=1e-6)

    def test_multi_segment_distinct_optimizers(self):
        segs = (
            TableSegment(dim=2, optimizer=optimizers.SGD(learning_rate=1.0),
                         initializer=initializers.Zeros()),
            TableSegment(dim=3, optimizer=optimizers.Adagrad(
                learning_rate=1.0, initial_accumulator_value=1.0),
                initializer=initializers.Zeros()),
        )
        spec = make_spec(segs=segs)
        assert spec.dim == 5
        st = table.create_state(spec)
        rows = jnp.array([0], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        g = jnp.ones((1, 5))
        st = table.apply_gradients(spec, st, rows, g, jnp.int32(0))
        emb = np.asarray(table.lookup(spec, st, rows))[0]
        np.testing.assert_allclose(emb[:2], -1.0, rtol=1e-6)  # sgd: -lr*g
        # adagrad: norm=1+1=2, p = -1/sqrt(2)
        np.testing.assert_allclose(emb[2:], -1.0 / np.sqrt(2.0), rtol=1e-6)

    def test_recycled_row_resets_optimizer_state(self):
        segs = (TableSegment(dim=2, optimizer=optimizers.Adagrad(
            learning_rate=1.0, initial_accumulator_value=1.0),
            initializer=initializers.Zeros()),)
        spec = make_spec(segs=segs)
        st = table.create_state(spec)
        rows = jnp.array([0], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        for _ in range(5):  # accumulate norm
            st = table.apply_gradients(spec, st, rows, jnp.ones((1, 2)), jnp.int32(0))
        norm_before = float(np.asarray(table.slot_view(spec, st, 0, "norm")[0, 0]))
        assert norm_before > 5.0
        # row recycled for a new id -> init_rows must reset the accumulator
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(table.slot_view(spec, st, 0, "norm")[0]), 1.0)

    def test_assign_rows(self):
        spec = make_spec()
        st = table.create_state(spec)
        vals = jnp.arange(8, dtype=jnp.float32).reshape(2, 4)
        st = table.assign_rows(spec, st, jnp.array([1, 3], dtype=jnp.int32), vals)
        out = np.asarray(table.lookup(spec, st, jnp.array([1, 3], dtype=jnp.int32)))
        np.testing.assert_allclose(out, np.asarray(vals))


def one_step(opt, p0, g, dim=2, lr=None, step=0, n_steps=1):
    """Run n optimizer steps on a 1-row table, return params + slots."""
    seg = TableSegment(dim=dim, optimizer=opt, initializer=initializers.Constants(p0))
    spec = make_spec(segs=(seg,))
    st = table.create_state(spec)
    rows = jnp.array([0], dtype=jnp.int32)
    st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
    for i in range(n_steps):
        st = table.apply_gradients(spec, st, rows,
                                   jnp.full((1, dim), g), jnp.int32(step + i))
    slots = {name.split("/", 1)[1]: arr[0]
             for name, arr in table.slot_items_np(spec, st)}
    return (np.asarray(table.params_view(spec, st)[0]), slots)


class TestOptimizerNumerics:
    """Hand-computed single-step expectations matching the reference update
    rules (runtime/hash_table/optimizer/*.cc)."""

    def test_adagrad(self):
        p, s = one_step(optimizers.Adagrad(learning_rate=0.1,
                                           initial_accumulator_value=0.1), 1.0, 0.5)
        norm = 0.1 + 0.25
        np.testing.assert_allclose(p, 1.0 - 0.1 * 0.5 / np.sqrt(norm), rtol=1e-6)
        np.testing.assert_allclose(s["norm"], norm, rtol=1e-6)

    def test_adam_bias_correction_and_powers(self):
        opt = optimizers.Adam(learning_rate=0.1, beta1=0.9, beta2=0.99, epsilon=0.01)
        p, s = one_step(opt, 1.0, 0.5)
        lr_t = 0.1 * np.sqrt(1 - 0.99) / (1 - 0.9)
        m = 0.5 * (1 - 0.9)
        v = 0.25 * (1 - 0.99)
        np.testing.assert_allclose(p, 1.0 - m * lr_t / (np.sqrt(v) + 0.01), rtol=1e-5)
        np.testing.assert_allclose(s["beta1_power"], 0.9 * 0.9, rtol=1e-6)
        np.testing.assert_allclose(s["beta2_power"], 0.99 * 0.99, rtol=1e-6)

    def test_amsgrad_vhat_monotone(self):
        opt = optimizers.AMSGrad(learning_rate=0.1)
        _, s1 = one_step(opt, 1.0, 1.0, n_steps=1)
        _, s2 = one_step(opt, 1.0, 1.0, n_steps=5)
        assert (s2["vhat"] >= s1["vhat"]).all()

    def test_momentum(self):
        p, s = one_step(optimizers.Momentum(learning_rate=0.1, momentum=0.9), 1.0, 0.5)
        np.testing.assert_allclose(s["n"], 0.1 * 0.5, rtol=1e-6)
        np.testing.assert_allclose(p, 1.0 - 0.1 * 0.5, rtol=1e-6)

    def test_moving_average(self):
        p, _ = one_step(optimizers.MovingAverage(momentum=0.9), 1.0, 0.5)
        np.testing.assert_allclose(p, 0.9 * 1.0 + 0.1 * 0.5, rtol=1e-6)

    def test_rmsprop_vs_v2(self):
        # v1: n = mom*n + (1-mom)*dx^2 ; v2: n = mom*n + dx^2
        p1, s1 = one_step(optimizers.RMSprop(learning_rate=0.1, momentum=0.9), 1.0, 0.5)
        p2, s2 = one_step(optimizers.RMSpropV2(learning_rate=0.1, momentum=0.9), 1.0, 0.5)
        np.testing.assert_allclose(s1["n"], 0.1 * 0.25, rtol=1e-6)
        np.testing.assert_allclose(s2["n"], 0.25, rtol=1e-6)
        np.testing.assert_allclose(p1, 1.0 - 0.1 * 0.5 / (np.sqrt(0.025) + 1), rtol=1e-6)
        np.testing.assert_allclose(p2, 1.0 - 0.1 * 0.5 / (np.sqrt(0.25) + 1), rtol=1e-6)

    def test_ftrl_l1_sparsifies(self):
        opt = optimizers.Ftrl(learning_rate=0.1, l1_regularization_strength=100.0)
        p, _ = one_step(opt, 1.0, 0.5)
        np.testing.assert_allclose(p, 0.0)  # |z| << l1 -> exact zero

    def test_ftrl_converges_towards_minimum(self):
        # minimize (w-2)^2/2 -> grad = w-2; ftrl should move toward 2
        seg = TableSegment(dim=1, optimizer=optimizers.Ftrl(learning_rate=0.5),
                           initializer=initializers.Zeros())
        spec = make_spec(segs=(seg,))
        st = table.create_state(spec)
        rows = jnp.array([0], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        for i in range(200):
            w = float(np.asarray(table.params_view(spec, st)[0, 0]))
            st = table.apply_gradients(spec, st, rows,
                                       jnp.array([[w - 2.0]]), jnp.int32(i))
        assert abs(float(np.asarray(table.params_view(spec, st)[0, 0])) - 2.0) < 0.1

    def test_group_ftrl_zeroes_whole_row(self):
        opt = optimizers.GroupFtrl(learning_rate=0.1,
                                   l1_regularization_strength=1e6)
        p, _ = one_step(opt, 1.0, 0.5, dim=4)
        np.testing.assert_allclose(p, 0.0)

    def test_group_adagrad_scalar_accumulator(self):
        opt = optimizers.GroupAdagrad(learning_rate=0.1,
                                      initial_accumulator_value=0.1)
        p, s = one_step(opt, 1.0, 0.5, dim=4)
        assert s["grad_square_sum"].shape == (1,)
        np.testing.assert_allclose(s["grad_square_sum"], 0.1 + 0.25, rtol=1e-6)

    def test_batch_softmax_tracks_step_gap(self):
        seg = TableSegment(dim=1, optimizer=optimizers.BatchSoftmax(learning_rate=0.5),
                           initializer=initializers.Zeros())
        spec = make_spec(segs=(seg,))
        st = table.create_state(spec)
        rows = jnp.array([0], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        st = table.apply_gradients(spec, st, rows, jnp.zeros((1, 1)), jnp.int32(10))
        # value = (1-0.5)*0 + 0.5*(10-0) = 5 ; last_step = 10
        np.testing.assert_allclose(np.asarray(table.params_view(spec, st)[0]), 5.0)
        np.testing.assert_allclose(np.asarray(table.slot_view(spec, st, 0, "last_step")[0]), 10.0)
        st = table.apply_gradients(spec, st, rows, jnp.zeros((1, 1)), jnp.int32(14))
        np.testing.assert_allclose(np.asarray(table.params_view(spec, st)[0]), 0.5 * 5 + 0.5 * 4)

    def test_adadelta_runs(self):
        p, s = one_step(optimizers.Adadelta(learning_rate=0.1), 1.0, 0.5)
        assert p[0] < 1.0 and s["accum"][0] > 0

    def test_dynamic_wd_adagrad_decoupled(self):
        coupled = optimizers.DynamicWdAdagrad(
            learning_rate=0.1, weight_decay_factor=0.1, decouple_weight_decay=False)
        decoupled = optimizers.DynamicWdAdagrad(
            learning_rate=0.1, weight_decay_factor=0.1, decouple_weight_decay=True)
        p1, _ = one_step(coupled, 1.0, 0.5)
        p2, _ = one_step(decoupled, 1.0, 0.5)
        assert not np.allclose(p1, p2)


class TestSchedules:
    def test_polynomial_decay(self):
        sched = PolynomialDecay(initial_learning_rate=1.0, decay_steps=100,
                                end_learning_rate=0.0, power=1.0)
        np.testing.assert_allclose(float(sched(jnp.int32(0))), 1.0)
        np.testing.assert_allclose(float(sched(jnp.int32(50))), 0.5)
        np.testing.assert_allclose(float(sched(jnp.int32(200))), 0.0)

    def test_warmup(self):
        sched = WarmupSchedule(base=Constant(1.0), warmup_steps=10)
        assert float(sched(jnp.int32(0))) == pytest.approx(0.1)
        assert float(sched(jnp.int32(9))) == pytest.approx(1.0)
        assert float(sched(jnp.int32(100))) == pytest.approx(1.0)

    def test_schedule_wired_into_segment(self):
        seg = TableSegment(dim=1, optimizer=optimizers.SGD(learning_rate=123.0),
                           initializer=initializers.Zeros(),
                           lr_schedule=Constant(0.5))
        spec = make_spec(segs=(seg,))
        st = table.create_state(spec)
        rows = jnp.array([0], dtype=jnp.int32)
        st = table.init_rows(spec, st, rows, jax.random.PRNGKey(0))
        st = table.apply_gradients(spec, st, rows, jnp.ones((1, 1)), jnp.int32(0))
        # schedule overrides optimizer's own lr
        np.testing.assert_allclose(np.asarray(table.params_view(spec, st)[0]), -0.5, rtol=1e-6)


class TestJitted:
    def test_full_cycle_under_jit(self):
        spec = make_spec()

        @jax.jit
        def train_step(st, rows, new_rows, grads, key, step):
            st = table.init_rows(spec, st, new_rows, key)
            emb = table.lookup(spec, st, rows)
            st = table.apply_gradients(spec, st, rows, grads, step)
            return st, emb

        st = table.create_state(spec)
        rows = jnp.array([0, 1, -1], dtype=jnp.int32)
        new_rows = jnp.array([0, 1, -1], dtype=jnp.int32)
        st, emb = train_step(st, rows, new_rows, jnp.ones((3, 4)),
                             jax.random.PRNGKey(0), jnp.int32(0))
        np.testing.assert_allclose(np.asarray(emb[:2]), 1.0)
        np.testing.assert_allclose(np.asarray(emb[2]), 0.0)


class TestPallasRowDMA:
    """DMA gather/scatter kernels (ops/scatter.py). The CI mesh is CPU-only
    (kernels disabled there — XLA paths cover numerics); these run when the
    suite executes on a real TPU, and the bench/verify flow exercises them
    in the full train step."""

    @pytest.mark.skipif(jax.default_backend() == "cpu",
                        reason="pallas TPU kernels; CPU uses the XLA path")
    def test_scatter_gather_match_xla(self):
        from monolith_tpu.ops.scatter import gather_rows, scatter_rows
        rng = np.random.default_rng(0)
        cap, P, U = 4096, 128, 512
        rows_np = rng.choice(cap, size=U, replace=False).astype(np.int32)
        rows_np[::5] = -1
        rows = jnp.asarray(rows_np)
        values = jnp.asarray(rng.normal(size=(U, P)).astype(np.float32))
        pool = jnp.asarray(rng.normal(size=(cap, P)).astype(np.float32))
        safe = jnp.where(rows < 0, cap, rows)
        ref = pool.at[safe].set(values, mode="drop", unique_indices=True)
        out = scatter_rows(pool, rows, values)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        g = gather_rows(out, jnp.maximum(rows, 0))
        np.testing.assert_array_equal(
            np.asarray(jnp.where((rows >= 0)[:, None], g, 0)),
            np.asarray(ref.at[safe].get(mode="fill", fill_value=0)))

    def test_int32_view_helpers_match_numpy_byte_view(self):
        """The bf16 kernel path runs on an int32 view of the pool bytes
        (Mosaic rejects single-row HBM slices of 16-bit arrays). The view
        must be exactly numpy's byte-level view, both directions."""
        from monolith_tpu.ops.scatter import _as_int32_rows, _from_int32_rows
        rng = np.random.default_rng(2)
        x_np = rng.normal(size=(16, 32)).astype(np.float32)
        x = jnp.asarray(x_np, dtype=jnp.bfloat16)
        v = _as_int32_rows(x)
        assert v.shape == (16, 16) and v.dtype == jnp.int32
        np.testing.assert_array_equal(
            np.asarray(v),
            np.asarray(x).view(np.int32))
        back = _from_int32_rows(v, jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_row_dma_supported_predicate(self):
        from monolith_tpu.ops.scatter import row_dma_supported
        assert row_dma_supported(jnp.float32, 128)       # 512 B rows
        assert row_dma_supported(jnp.bfloat16, 256)      # int32 view: 128
        assert not row_dma_supported(jnp.bfloat16, 128)  # 256 B rows
        assert not row_dma_supported(jnp.float32, 64)

    @pytest.mark.skipif(jax.default_backend() == "cpu",
                        reason="pallas TPU kernels; CPU uses the XLA path")
    @pytest.mark.parametrize("P", [128, 256])
    def test_scatter_gather_bf16_match_xla(self, P):
        """bf16 rows of 512-byte multiples take the int32-view kernel
        (direct 16-bit row slices fail Mosaic tiling, PERF.md round-4);
        narrower bf16 rows fall back to the XLA path inside
        scatter_rows/gather_rows — both must be bit-exact."""
        from monolith_tpu.ops.scatter import gather_rows, scatter_rows
        rng = np.random.default_rng(3)
        cap, U = 4096, 512
        rows_np = rng.choice(cap, size=U, replace=False).astype(np.int32)
        rows_np[::5] = -1
        rows = jnp.asarray(rows_np)
        values = jnp.asarray(rng.normal(size=(U, P)), dtype=jnp.bfloat16)
        pool = jnp.asarray(rng.normal(size=(cap, P)), dtype=jnp.bfloat16)
        safe = jnp.where(rows < 0, cap, rows)
        ref = pool.at[safe].set(values, mode="drop", unique_indices=True)
        out = scatter_rows(pool, rows, values)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        g = gather_rows(out, jnp.maximum(rows, 0))
        np.testing.assert_array_equal(
            np.asarray(jnp.where((rows >= 0)[:, None], g,
                                 jnp.zeros((), jnp.bfloat16))),
            np.asarray(ref.at[safe].get(mode="fill", fill_value=0)))

    @pytest.mark.skipif(jax.default_backend() == "cpu",
                        reason="pallas TPU kernels; CPU uses the XLA path")
    def test_chunked_above_smem_budget(self, monkeypatch):
        """Indices are a scalar-prefetch (SMEM) operand; above
        _MAX_PREFETCH_ROWS the call must split into chunked launches with
        identical results (shrink the threshold so the split runs fast)."""
        from monolith_tpu.ops import scatter as sc
        monkeypatch.setattr(sc, "_MAX_PREFETCH_ROWS", 100)
        rng = np.random.default_rng(1)
        cap, P, U = 1024, 128, 357  # 4 chunks, ragged tail
        rows_np = rng.choice(cap, size=U, replace=False).astype(np.int32)
        rows_np[::7] = -1
        rows = jnp.asarray(rows_np)
        values = jnp.asarray(rng.normal(size=(U, P)).astype(np.float32))
        pool = jnp.asarray(rng.normal(size=(cap, P)).astype(np.float32))
        safe = jnp.where(rows < 0, cap, rows)
        ref = pool.at[safe].set(values, mode="drop", unique_indices=True)
        out = sc.scatter_rows(pool, rows, values)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        g = sc.gather_rows(out, jnp.maximum(rows, 0))
        np.testing.assert_array_equal(
            np.asarray(jnp.where((rows >= 0)[:, None], g, 0)),
            np.asarray(ref.at[safe].get(mode="fill", fill_value=0)))
