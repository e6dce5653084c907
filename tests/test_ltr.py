"""LTR ranking-loss tests (parity with ref losses/ltr_losses.py semantics:
pairwise pair construction, invalid-label masking, reductions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monolith_tpu.losses import ltr


def simple_case():
    # one list: labels [2, 1, 0], logits favor the wrong order
    labels = jnp.array([[2.0, 1.0, 0.0]])
    logits = jnp.array([[0.0, 1.0, 2.0]])
    return labels, logits


class TestPairwise:
    def test_hinge_manual(self):
        labels, logits = simple_case()
        # pairs with l_i > l_j: (0,1) w=1, (0,2) w=2, (1,2) w=1
        # s diffs: -1, -2, -1 -> hinge 2, 3, 2; weighted sum = 2+6+2 = 10
        # nonzero weights = 3 -> loss = 10/3
        loss = float(ltr.pairwise_hinge_loss(labels, logits))
        assert loss == pytest.approx(10.0 / 3.0, rel=1e-5)

    def test_logistic_manual(self):
        labels, logits = simple_case()
        l = lambda s: np.log1p(np.exp(-s))
        expect = (1 * l(-1) + 2 * l(-2) + 1 * l(-1)) / 3
        assert float(ltr.pairwise_logistic_loss(labels, logits)) == \
            pytest.approx(expect, rel=1e-5)

    def test_soft_zero_one_manual(self):
        labels, logits = simple_case()
        sig = lambda s: 1.0 / (1.0 + np.exp(-s))
        # terms are 1 - sigmoid(s_i - s_j); weights 1, 2, 1 (|label diff|)
        expect = (1 * sig(1) + 2 * sig(2) + 1 * sig(1)) / 3
        assert float(ltr.pairwise_soft_zero_one_loss(labels, logits)) == \
            pytest.approx(expect, rel=1e-5)

    def test_invalid_labels_drop_pairs(self):
        labels = jnp.array([[2.0, 1.0, -1.0]])  # 3rd item padded
        logits = jnp.array([[0.0, 1.0, 99.0]])
        # only pair (0,1) remains; hinge(1 - (0-1)) = 2, weight |2-1|=1
        assert float(ltr.pairwise_hinge_loss(labels, logits)) == \
            pytest.approx(2.0, rel=1e-5)

    def test_itemwise_weights(self):
        labels, logits = simple_case()
        w = jnp.array([[2.0, 1.0, 1.0]])  # boosts pairs led by item 0
        # weighted: (0,1): 2*1*2=4, (0,2): 2*2*3=12, (1,2): 1*1*2=2 -> 18/3
        assert float(ltr.pairwise_hinge_loss(labels, logits, w)) == \
            pytest.approx(6.0, rel=1e-5)


class TestListwise:
    def test_softmax_perfect_ordering_lower(self):
        labels = jnp.array([[1.0, 0.0]])
        good = jnp.array([[5.0, -5.0]])
        bad = jnp.array([[-5.0, 5.0]])
        assert float(ltr.softmax_loss(labels, good)) < \
            float(ltr.softmax_loss(labels, bad))

    def test_softmax_zero_label_list_drops(self):
        labels = jnp.array([[0.0, 0.0], [1.0, 0.0]])
        logits = jnp.array([[1.0, 2.0], [3.0, 0.0]])
        only_second = ltr.softmax_loss(labels[1:], logits[1:])
        both = ltr.softmax_loss(labels, logits)
        np.testing.assert_allclose(float(both), float(only_second), rtol=1e-5)

    def test_sigmoid_ce_matches_elementwise(self):
        labels = jnp.array([[1.0, 0.0, -1.0]])
        logits = jnp.array([[0.5, -0.3, 9.0]])
        l = np.asarray(logits)[0, :2]
        y = np.asarray(labels)[0, :2]
        ce = np.maximum(l, 0) - l * y + np.log1p(np.exp(-np.abs(l)))
        assert float(ltr.sigmoid_cross_entropy_loss(labels, logits)) == \
            pytest.approx(ce.mean(), rel=1e-5)

    def test_mse_ignores_invalid(self):
        labels = jnp.array([[1.0, -1.0]])
        logits = jnp.array([[0.0, 123.0]])
        assert float(ltr.mean_squared_loss(labels, logits)) == \
            pytest.approx(1.0, rel=1e-6)

    def test_list_mle_prefers_correct_order(self):
        labels = jnp.array([[2.0, 1.0, 0.0]])
        good = jnp.array([[3.0, 2.0, 1.0]])
        bad = jnp.array([[1.0, 2.0, 3.0]])
        assert float(ltr.list_mle_loss(labels, good)) < \
            float(ltr.list_mle_loss(labels, bad))

    def test_approx_ndcg_favors_correct_order(self):
        labels = jnp.array([[3.0, 1.0, 0.0]])
        good = jnp.array([[5.0, 2.0, -1.0]])
        bad = jnp.array([[-1.0, 2.0, 5.0]])
        # loss = -NDCG (sum reduction): more negative is better
        assert float(ltr.approx_ndcg_loss(labels, good)) < \
            float(ltr.approx_ndcg_loss(labels, bad))
        # perfect ordering with sharp alpha -> NDCG ~ 1
        assert float(ltr.approx_ndcg_loss(labels, good, alpha=100.0)) == \
            pytest.approx(-1.0, abs=1e-3)

    def test_approx_ranks(self):
        logits = jnp.array([[3.0, 1.0, 2.0]])
        r = np.asarray(ltr.approx_ranks(logits, alpha=100.0))
        np.testing.assert_allclose(r[0], [1.0, 3.0, 2.0], atol=1e-3)


class TestMakeLossFn:
    def test_combination_and_weights(self):
        labels, logits = simple_case()
        fn = ltr.make_loss_fn(
            [ltr.RankingLossKey.PAIRWISE_HINGE_LOSS,
             ltr.RankingLossKey.SIGMOID_CROSS_ENTROPY_LOSS],
            loss_weights=[2.0, 0.5])
        expect = (2.0 * float(ltr.pairwise_hinge_loss(labels, logits))
                  + 0.5 * float(ltr.sigmoid_cross_entropy_loss(labels, logits)))
        assert float(fn(labels, logits)) == pytest.approx(expect, rel=1e-6)

    def test_extra_args_routed_per_key(self):
        labels, logits = simple_case()
        fn = ltr.make_loss_fn(ltr.RankingLossKey.APPROX_NDCG_LOSS,
                              extra_args={"approx_ndcg_loss": {"alpha": 5.0}})
        assert float(fn(labels, logits)) == pytest.approx(
            float(ltr.approx_ndcg_loss(labels, logits, alpha=5.0)), rel=1e-6)

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError):
            ltr.make_loss_fn("nope")

    def test_jit_and_grad(self):
        labels, logits = simple_case()
        fn = ltr.make_loss_fn([ltr.RankingLossKey.PAIRWISE_LOGISTIC_LOSS,
                               ltr.RankingLossKey.SOFTMAX_LOSS])
        g = jax.jit(jax.grad(lambda s: fn(labels, s)))(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
