"""Metric numerics vs sklearn/torch oracles."""

import numpy as np
import pytest

from tmgcn_tpu.tasks import metrics as M


class TestF1:
    def test_basic(self):
        guess = np.array([0, 0, 1, 1, 0])
        target = np.array([0, 1, 0, 1, 0])
        p, r, f1 = M.precision_recall_f1(guess, target)
        assert p == pytest.approx(2 / 3)
        assert r == pytest.approx(2 / 3)
        assert f1 == pytest.approx(2 / 3)

    def test_all_wrong_is_nan(self):
        p, r, f1 = M.precision_recall_f1(np.array([1, 1]), np.array([1, 1]))
        assert np.isnan(p) or p == 0  # 0/0 division


class TestAveragePrecision:
    def test_matches_sklearn(self):
        from sklearn.metrics import average_precision_score

        rng = np.random.default_rng(0)
        for _ in range(10):
            scores = rng.random(50)
            target = rng.integers(0, 2, 50)
            ours = M.average_precision_pos0(scores, target)
            ref = average_precision_score(target, scores, pos_label=0)
            assert ours == pytest.approx(ref, abs=1e-12)

    def test_ties(self):
        from sklearn.metrics import average_precision_score

        scores = np.array([0.5, 0.5, 0.5, 0.2, 0.2])
        target = np.array([0, 1, 0, 0, 1])
        ours = M.average_precision_pos0(scores, target)
        ref = average_precision_score(target, scores, pos_label=0)
        assert ours == pytest.approx(ref, abs=1e-12)


class TestMRR:
    def test_row_mrr_simple(self):
        # Existing edges have probs 0.9 and 0.7 -> ranks 1 and 2.
        probs = np.array([0.9, 0.5, 0.7])
        true = np.array([0, 1, 0])
        assert M.row_mrr(probs, true) == pytest.approx((1 + 1 / 2) / 2)
        # And with the existing edge ranked last: (1/1 + 1/3)/2.
        probs2 = np.array([0.9, 0.7, 0.5])
        assert M.row_mrr(probs2, np.array([0, 1, 0])) == pytest.approx((1 + 1 / 3) / 2)

    def test_sparse_mrr_matches_dense_oracle(self):
        """mrr_from_edges == the reference-literal dense construction,
        including ties, duplicate (i, j) pairs, exact zeros, and
        negative raw-logit scores."""
        rng = np.random.default_rng(5)
        for _ in range(25):
            R, C = rng.integers(3, 30), rng.integers(3, 40)
            E = rng.integers(5, 200)
            adj = np.stack([rng.integers(0, R, E), rng.integers(0, C, E)])
            probs = rng.choice([-1.5, -0.25, 0.0, 0.0, 0.3, 0.3, 1.2], E)
            trues = rng.choice([0.0, 1.0], E, p=[0.7, 0.3])
            a = M._mrr_from_edges_dense(probs, trues, adj)
            b = M.mrr_from_edges(probs, trues, adj)
            if np.isnan(a):
                assert np.isnan(b)
            else:
                assert b == pytest.approx(a, abs=1e-12)

    def test_sparse_mrr_degenerate_row_is_nan(self):
        """A kept row whose every column is explicit with no label-0
        position: 0/0 -> nan, matching the dense construction."""
        # 2 columns total; row 0 fully explicit, both label-1.
        adj = np.stack([[0, 0, 1, 1], [0, 1, 0, 1]])
        probs = np.array([0.5, -0.5, 0.1, 0.2])
        trues = np.array([1.0, 1.0, 0.0, 1.0])
        a = M._mrr_from_edges_dense(probs, trues, adj)
        b = M.mrr_from_edges(probs, trues, adj)
        assert np.isnan(a) and np.isnan(b)

    def test_map_mrr_bounds(self):
        rng = np.random.default_rng(1)
        E = 200
        logits = rng.standard_normal((E, 2))
        target = rng.integers(0, 2, E)
        edges = np.stack(
            [rng.integers(0, 4, E), rng.integers(0, 20, E), rng.integers(0, 20, E)]
        )
        mp, mr = M.map_mrr(logits, target, edges)
        assert 0.0 <= mp <= 1.0
        assert 0.0 <= mr <= 1.0


class TestWeightedCE:
    def test_matches_torch(self):
        import torch

        rng = np.random.default_rng(2)
        logits = rng.standard_normal((30, 3))
        target = rng.integers(0, 3, 30)
        w = np.array([0.7, 0.2, 0.1])
        ours = M.weighted_ce_loss_np(logits, target, w)
        ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
            torch.tensor(logits), torch.tensor(target)
        ).item()
        assert ours == pytest.approx(ref, abs=1e-10)

    def test_jax_matches_numpy(self):
        import jax.numpy as jnp

        from tmgcn_tpu.train.losses import weighted_cross_entropy

        rng = np.random.default_rng(3)
        logits = rng.standard_normal((30, 2))
        target = rng.integers(0, 2, 30)
        w = np.array([0.9, 0.1])
        ours = float(
            weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(target), jnp.asarray(w))
        )
        assert ours == pytest.approx(M.weighted_ce_loss_np(logits, target, w), abs=1e-10)

    def test_mask(self):
        import jax.numpy as jnp

        from tmgcn_tpu.train.losses import weighted_cross_entropy

        rng = np.random.default_rng(4)
        logits = rng.standard_normal((20, 2))
        target = rng.integers(0, 2, 20)
        w = np.array([0.6, 0.4])
        mask = np.zeros(20, dtype=bool)
        mask[:12] = True
        masked = float(
            weighted_cross_entropy(
                jnp.asarray(logits), jnp.asarray(target), jnp.asarray(w), jnp.asarray(mask)
            )
        )
        assert masked == pytest.approx(
            M.weighted_ce_loss_np(logits[:12], target[:12], w), abs=1e-10
        )


class TestL1Ratio:
    def test_values(self):
        pred = np.array([[1.0, 2.0], [3.0, 4.0]])
        truth = np.array([[1.0, 1.0], [2.0, 2.0]])
        l1, ratio = M.l1_and_ratio(pred, truth)
        assert l1 == pytest.approx((1.0 + 3.0) / 2)
        assert ratio == pytest.approx((1 / 2 + 3 / 4) / 2)
