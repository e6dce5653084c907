"""Layer zoo tests: shapes, gradients, and key semantics for every layer
(parity coverage for ref layers/*_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monolith_tpu import layers
from monolith_tpu.layers import activations


KEY = jax.random.PRNGKey(0)


def init_apply(module, *args, rngs=None, **kwargs):
    variables = module.init(rngs or KEY, *args, **kwargs)
    out = module.apply(variables, *args, **kwargs,
                       rngs=rngs if isinstance(rngs, dict) else None)
    return variables, out


class TestCross:
    def test_groupint_multiply_and_dot(self):
        left = jnp.ones((4, 2 * 8))   # 2 fields of dim 8
        right = jnp.ones((4, 3 * 8))  # 3 fields
        _, out = init_apply(layers.GroupInt(dim_size=8, interaction_type="multiply"),
                            (left, right))
        assert out.shape == (4, 2 * 3 * 8)
        _, out = init_apply(layers.GroupInt(dim_size=8, interaction_type="dot"),
                            (left, right))
        assert out.shape == (4, 6)
        np.testing.assert_allclose(out, 8.0)  # ones dot ones over dim 8

    def test_groupint_attention(self):
        left = jax.random.normal(KEY, (4, 2 * 8))
        right = jax.random.normal(jax.random.PRNGKey(1), (4, 3 * 8))
        _, out = init_apply(layers.GroupInt(dim_size=8, use_attention=True,
                                            attention_units=(4, 1)), (left, right))
        assert out.shape == (4, 48)

    def test_allint(self):
        x = jax.random.normal(KEY, (4, 6, 8))
        _, out = init_apply(layers.AllInt(cmp_dim=3), x)
        assert out.shape == (4, 18)

    def test_cdot(self):
        x = jax.random.normal(KEY, (4, 6, 8))
        _, out = init_apply(layers.CDot(project_dim=4, compress_units=(16,)), x)
        assert out.shape == (4, 6 * 4 + 8 * 4)

    def test_can(self):
        u = jax.random.normal(KEY, (4, 6))
        item = jax.random.normal(jax.random.PRNGKey(1), (4, 2 * (36 + 6)))
        _, out = init_apply(layers.CAN(layer_num=2), (u, item))
        assert out.shape == (4, 6)

    def test_dcn_variants(self):
        x = jax.random.normal(KEY, (4, 16))
        for kw in [dict(dcn_type="vector", layer_num=2),
                   dict(dcn_type="matrix", layer_num=2),
                   dict(dcn_type="mixed", layer_num=2, num_experts=3, low_rank=4)]:
            _, out = init_apply(layers.DCN(**kw), x)
            assert out.shape == (4, 16), kw

    def test_cin(self):
        x = jax.random.normal(KEY, (4, 5, 8))
        _, out = init_apply(layers.CIN(layer_sizes=(6, 4)), x)
        assert out.shape == (4, 10)


class TestTrans:
    def test_autoint(self):
        x = jax.random.normal(KEY, (4, 5, 8))
        _, out = init_apply(layers.AutoInt(layer_num=2), x)
        assert out.shape == (4, 5, 8)

    def test_senet_scales_fields(self):
        x = jax.random.normal(KEY, (4, 6, 8))
        _, out = init_apply(layers.SeNet(reduction_ratio=2), x)
        assert out.shape == (4, 48)

    def test_irazor_mask_and_loss(self):
        x = jax.random.normal(KEY, (4, 5, 8))
        m = layers.iRazor(nas_space=(0, 2, 4, 8), penalty_weight=0.1)
        _, (out, loss) = init_apply(m, x)
        assert out.shape == (4, 5, 8)
        assert float(loss) > 0


class TestSeq:
    def test_din_sum_and_scale(self):
        q = jax.random.normal(KEY, (4, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 8))
        mask = jnp.ones((4, 10))
        _, out = init_apply(layers.DIN(mode="sum"), q, k, mask)
        assert out.shape == (4, 8)
        _, out = init_apply(layers.DIN(mode="scale"), q, k, mask)
        assert out.shape == (4, 10, 8)

    def test_din_mask_zeroes_padding(self):
        q = jnp.ones((2, 4))
        k = jnp.ones((2, 3, 4))
        mask0 = jnp.zeros((2, 3))
        _, out = init_apply(layers.DIN(mode="sum"), q, k, mask0)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_dien(self):
        q = jax.random.normal(KEY, (4, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 8))
        mask = jnp.ones((4, 6))
        for att in ("dot", "mlp"):
            _, out = init_apply(layers.DIEN(num_units=8, att_type=att), q, k, mask)
            assert out.shape == (4, 8)

    def test_dmr(self):
        items = jax.random.normal(KEY, (4, 12))
        seq = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 8))
        _, out = init_apply(layers.DMR_U2I(cmp_dim=4), items, seq)
        assert out.shape == (4, 12)

    def test_gru_augru(self):
        xs = jax.random.normal(KEY, (4, 6, 8))
        m = layers.GRU(16)
        v = m.init(KEY, xs)
        outs, final = m.apply(v, xs)
        assert outs.shape == (4, 6, 16) and final.shape == (4, 16)
        scores = jnp.ones((4, 6)) / 6
        m2 = layers.AUGRU(16)
        v2 = m2.init(KEY, xs, scores)
        out = m2.apply(v2, xs, scores)
        assert out.shape == (4, 16)


class TestMultiTask:
    def test_mmoe(self):
        x = jax.random.normal(KEY, (4, 16))
        m = layers.MMoE(num_tasks=3, num_experts=4, expert_output_dims=(8,))
        _, (outs, aux) = init_apply(m, x)
        assert len(outs) == 3 and outs[0].shape == (4, 8)

    def test_mmoe_topk_aux_loss(self):
        x = jax.random.normal(KEY, (4, 16))
        m = layers.MMoE(num_tasks=2, num_experts=4, expert_output_dims=(8,),
                        gate_type="topk", top_k=2)
        _, (outs, aux) = init_apply(m, x)
        assert float(aux) >= 0

    def test_snr_trans_and_aver(self):
        xs = [jax.random.normal(jax.random.PRNGKey(i), (4, 8)) for i in range(3)]
        m = layers.SNR(num_out_subnet=2, out_subnet_dim=5, training=True)
        v = m.init({"params": KEY, "snr": jax.random.PRNGKey(9)}, xs)
        outs = m.apply(v, xs, rngs={"snr": jax.random.PRNGKey(10)})
        assert len(outs) == 2 and outs[0].shape == (4, 5)
        m2 = layers.SNR(num_out_subnet=2, out_subnet_dim=8, snr_type="aver",
                        training=False)
        v2 = m2.init({"params": KEY}, xs)
        outs2 = m2.apply(v2, xs)
        assert outs2[0].shape == (4, 8)


class TestMisc:
    def test_lhuc(self):
        x = jax.random.normal(KEY, (4, 16))
        p = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        _, out = init_apply(layers.LHUCTower(output_dims=(32, 1)), x, p)
        assert out.shape == (4, 1)

    def test_logit_correction_matches_reference_rule(self):
        logits = jnp.array([0.5, -1.0])
        rate = jnp.array([0.1, 0.5])
        out = layers.logit_correction(logits, rate, sample_bias=True)
        expected = np.log(1 / (1 + np.exp(-np.array([0.5, -1.0])))) - np.log([0.1, 0.5])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
        out2 = layers.logit_correction(logits, None, sample_bias=False)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(logits))

    def test_gradnorm(self):
        m = layers.GradNorm(num_tasks=2, relative_diff=True)
        losses = jnp.array([1.0, 2.0])
        gnorms = jnp.array([0.5, 1.5])
        _, (wl, gl) = init_apply(m, losses, gnorms)
        np.testing.assert_allclose(float(wl), 1.5, rtol=1e-5)  # softmax(0,0)=.5,.5
        assert float(gl) > 0

    def test_pooling_masks(self):
        x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
        mask = jnp.array([[1, 1, 0], [1, 0, 0]], dtype=jnp.float32)
        s = layers.sum_pooling(x, mask)
        np.testing.assert_allclose(np.asarray(s[0]), np.asarray(x[0, 0] + x[0, 1]))
        a = layers.avg_pooling(x, mask)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(x[1, 0]))
        mx = layers.max_pooling(x, mask)
        np.testing.assert_allclose(np.asarray(mx[0]), np.asarray(x[0, 1]))

    def test_dense_kernel_norm(self):
        x = jax.random.normal(KEY, (4, 8))
        m = layers.Dense(6, allow_kernel_norm=True)
        v, out = init_apply(m, x)
        assert out.shape == (4, 6)
        k = v["params"]["kernel"]
        g = v["params"]["kernel_norm"]
        assert g.shape == (6,)

    def test_activations_registry(self):
        x = jnp.array([-1.0, 0.0, 2.0])
        assert activations.get("relu")(x)[0] == 0
        assert callable(activations.get(None))
        with pytest.raises(ValueError):
            activations.get("nope")
        # prelu/dice are modules
        m = activations.get("prelu")
        v = m.init(KEY, x)
        out = m.apply(v, x)
        assert out.shape == x.shape

    def test_add_bias(self):
        x = jnp.zeros((2, 3))
        _, out = init_apply(layers.AddBias(), x)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_grad_flows_through_all(self):
        # sanity: every module is differentiable
        x = jax.random.normal(KEY, (4, 5, 8))
        m = layers.AutoInt(layer_num=1)
        v = m.init(KEY, x)

        def loss(v):
            return jnp.sum(m.apply(v, x) ** 2)

        g = jax.grad(loss)(v)
        assert np.isfinite(jax.tree.reduce(lambda a, b: a + jnp.sum(b), g, 0.0))


class TestInsightOps:
    """feature_insight / fid_counter parity with ref layers/layer_ops_test.py
    (test_feature_insight:117, test_feature_insight_grad:158,
    test_fid_counter_grad:200)."""

    SEG = [3, 2, 4]
    INP = jnp.array(
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.1, 1.2, 1.3, 1.4,
         1.5, 1.6, 1.7, 1.8, 1.9, 2.1, 2.2, 2.3, 2.4, 2.5, 2.6, 2.7, 2.8,
         2.9], dtype=jnp.float32).reshape(3, 9)
    W = jnp.array(
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.4, 0.3, 0.2, 0.1, 0.9, 0.8, 0.7, 0.6,
         0.5, 0.6, 0.7, 0.8, 0.9], dtype=jnp.float32).reshape(9, 2)

    def _expected(self):
        outs, s = [], 0
        for sz in self.SEG:
            outs.append(np.asarray(self.INP)[:, s:s + sz]
                        @ np.asarray(self.W)[s:s + sz])
            s += sz
        return np.concatenate(outs, axis=1)

    def test_feature_insight(self):
        from monolith_tpu.ops import feature_insight
        exp = self._expected()
        out = feature_insight(self.INP, self.W, self.SEG)
        np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5)
        # aggregate=True: per-feature sum of squared projections [B, F]
        agg = feature_insight(self.INP, self.W, self.SEG, aggregate=True)
        exp_agg = (exp * exp).reshape(3, 3, 2).sum(axis=2)
        np.testing.assert_allclose(np.asarray(agg), exp_agg, rtol=1e-5)

    def test_feature_insight_grad(self):
        from monolith_tpu.ops import feature_insight

        def loss(inp, w):
            return jnp.sum(feature_insight(inp, w, self.SEG))

        gi, gw = jax.grad(loss, argnums=(0, 1))(self.INP, self.W)
        # reference grad == plain per-segment matmul grad: compare against
        # autodiff of the explicit split/matmul/concat expression
        def loss_explicit(inp, w):
            outs, s = [], 0
            for sz in self.SEG:
                outs.append(inp[:, s:s + sz] @ w[s:s + sz])
                s += sz
            return jnp.sum(jnp.concatenate(outs, axis=1))

        gi2, gw2 = jax.grad(loss_explicit, argnums=(0, 1))(self.INP, self.W)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gi2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw2), rtol=1e-5)

    def test_fid_counter_grad(self):
        from monolith_tpu.ops import fid_counter
        # ref test_fid_counter_grad: value bumps by step, grad is -step,
        # both saturate at the threshold
        for start, step, want_val, want_grad in [
                (1.0, 1.0, 2.0, -1.0),
                (1.0, 0.01, 1.01, -0.01),
                (1000.0, 1.0, 1000.0, 0.0)]:
            alpha = jnp.array([start], dtype=jnp.float32)
            val, grad = jax.value_and_grad(
                lambda a: jnp.sum(fid_counter(a, counter_threshold=1000,
                                              step=step)))(alpha)
            np.testing.assert_allclose(float(val), want_val, rtol=1e-6)
            np.testing.assert_allclose(np.asarray(grad), [want_grad],
                                       rtol=1e-6)
