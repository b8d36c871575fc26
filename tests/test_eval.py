"""Evaluation stack tests: metric math golden values + the GT-as-model
pipeline test (the reference's configs/gt.py sanity pattern: GT predictions
must give FID ~ 0 and high R-precision)."""

import numpy as np
import pytest

from motioncraft_tpu.eval import (build_evaluator, calculate_frechet_distance,
                                  calculate_top_k, euclidean_distance_matrix,
                                  get_metric_statistics)
from motioncraft_tpu.eval.models import T2MContrastiveModel_SMPLX


class TestMetricMath:
    def test_fid_identical_is_zero(self, rng):
        x = rng.randn(500, 8)
        mu, cov = x.mean(0), np.cov(x, rowvar=False)
        assert calculate_frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-6)

    def test_fid_mean_shift_analytic(self, rng):
        """Equal covariances: FID = ||mu1 - mu2||^2 exactly."""
        x = rng.randn(2000, 6)
        cov = np.cov(x, rowvar=False)
        mu1 = np.zeros(6)
        mu2 = np.full(6, 0.5)
        got = calculate_frechet_distance(mu1, cov, mu2, cov)
        assert got == pytest.approx(6 * 0.25, rel=1e-4)

    def test_euclidean_distance_matrix(self, rng):
        a, b = rng.randn(5, 3), rng.randn(7, 3)
        got = euclidean_distance_matrix(a, b)
        want = np.linalg.norm(a[:, None] - b[None], axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_top_k_counting(self):
        # row i's correct answer is i; build argsort with known ranks
        argsort = np.array([[0, 1, 2], [1, 0, 2], [2, 0, 1]])  # ranks: 0 -> 1st, 1 -> 1st, 2 -> 1st? row2: idx2 first
        mat = calculate_top_k(argsort, 3)
        # row0: hit at k=1; row1: idx1 first -> hit at k=1; row2: idx2 first -> hit k=1
        assert mat[:, 0].sum() == 3

    def test_top_k_exceeds_batch(self):
        # a --limit smoke run can leave a replication slice smaller than
        # top_k; columns past N saturate at 1 instead of raising
        argsort = np.array([[1, 0], [0, 1]])  # both rows hit at k=2
        mat = calculate_top_k(argsort, 3)
        assert mat.shape == (2, 3)
        assert mat[:, 0].sum() == 0 and mat[:, 1].all() and mat[:, 2].all()

    def test_fid_rank_deficient_smoke(self, rng):
        # 2 samples x 8 dims: rank-1 covariances make the unregularized
        # sqrtm heavily complex; the eps-offset retry must yield a finite
        # value instead of raising (the --limit smoke-run path)
        from motioncraft_tpu.eval.metrics import (
            calculate_activation_statistics, calculate_frechet_distance)
        a, b = rng.randn(2, 8), rng.randn(2, 8)
        fid = calculate_frechet_distance(*calculate_activation_statistics(a),
                                         *calculate_activation_statistics(b))
        assert np.isfinite(fid)

    def test_metric_statistics(self):
        vals = np.array([1.0, 2.0, 3.0, 4.0])
        mean, conf = get_metric_statistics(vals, 4)
        assert mean == pytest.approx(2.5)
        assert conf == pytest.approx(1.96 * vals.std() / 2)


@pytest.fixture(scope="module")
def eval_model():
    return T2MContrastiveModel_SMPLX(
        motion_encoder=dict(nfeats=16, vae=True, num_layers=1, latent_dim=32,
                            ff_size=32, num_heads=2),
        text_encoder=dict(num_layers=1, latent_dim=32, ff_size=32, num_heads=2,
                          bert_cfg=dict(dim=32, n_layers=1, n_heads=2,
                                        hidden_dim=64)))


class TestEvaluatorPipeline:
    def _results(self, model, n=24, T=12, D=16, reps=2, seed=0):
        rng = np.random.RandomState(seed)
        results = []
        base = [rng.randn(T, D).astype(np.float32) for _ in range(n)]
        texts = [f"action {i} with words {i}" for i in range(n)]
        for _ in range(reps):
            for i in range(n):
                results.append({
                    "motion": base[i], "pred_motion": base[i].copy(),
                    "motion_mask": np.ones(T, np.float32),
                    "pred_motion_mask": np.ones(T, np.float32),
                    "motion_length": np.array([T]), "pred_motion_length": np.array([T]),
                    "text": texts[i], "token": None,
                })
        return results

    def test_gt_as_model_fid_zero(self, eval_model):
        eval_cfg = dict(replication_times=2, replication_reduction="statistics",
                        evaluator_model=eval_model)
        evaluator, _ = build_evaluator(dict(type="FID", emb_scale=1.0), eval_cfg,
                                       data_len=24, eval_indexes=[np.arange(24)] * 2)
        metrics = evaluator.evaluate(self._results(eval_model))
        assert metrics["FID (mean)"] == pytest.approx(0.0, abs=1e-3)

    def test_gt_as_model_precision_high(self, eval_model):
        eval_cfg = dict(replication_times=2, replication_reduction="statistics",
                        evaluator_model=eval_model)
        evaluator, _ = build_evaluator(dict(type="R Precision", top_k=3, batch_size=8),
                                       eval_cfg, data_len=24,
                                       eval_indexes=[np.arange(24)] * 2)
        metrics = evaluator.evaluate(self._results(eval_model))
        assert 0.0 <= metrics["R_precision Top 1 (mean)"] <= 1.0
        assert metrics["R_precision Top 3 (mean)"] >= metrics["R_precision Top 1 (mean)"]

    def test_matching_and_diversity_run(self, eval_model):
        eval_cfg = dict(replication_times=2, replication_reduction="statistics",
                        evaluator_model=eval_model)
        results = self._results(eval_model)
        ev1, _ = build_evaluator(dict(type="Matching Score", batch_size=8), eval_cfg,
                                 24, [np.arange(24)] * 2)
        m1 = ev1.evaluate(results)
        assert np.isfinite(m1["Matching Score (mean)"])
        ev2, _ = build_evaluator(dict(type="Diversity", num_samples=10), eval_cfg,
                                 24, [np.arange(24)] * 2)
        m2 = ev2.evaluate(results)
        assert np.isfinite(m2["Diversity (mean)"])

    def test_multimodality_appends_indexes(self, eval_model):
        eval_cfg = dict(replication_times=2, replication_reduction="statistics",
                        evaluator_model=eval_model)
        idxs = [np.arange(24), np.arange(24)]
        ev, idxs = build_evaluator(dict(type="MultiModality", num_samples=4,
                                        num_repeats=3, num_picks=2), eval_cfg, 24, idxs)
        assert len(idxs[0]) == 24 + 12
