"""Evaluation subsystem tests."""

import numpy as np
import pytest

from tpu_deer.eval import (
    CalibrationAnalyzer,
    CrossValidationEvaluator,
    DEERModelEvaluator,
    StatisticalValidator,
    UncertaintyAnalyzer,
    bootstrap_ccc_ci,
    sparsification_curve,
)


@pytest.fixture
def good_predictions(rng):
    n = 400
    targets = np.tanh(rng.normal(size=(n, 3))).astype(np.float32)
    noise_scale = np.abs(rng.normal(size=(n, 1))) * 0.2
    preds = (targets + noise_scale * rng.normal(size=(n, 3))).astype(np.float32)
    unc = (noise_scale * np.ones((1, 3))).astype(np.float32)  # informative
    return preds, targets, unc


class TestEvaluator:
    def test_full_bundle(self, good_predictions):
        preds, targets, unc = good_predictions
        res = DEERModelEvaluator(n_bootstrap=100).evaluate_arrays(
            preds, targets, unc
        )
        assert res.ccc_average > 0.7
        assert set(res.ccc) == {"valence", "arousal", "dominance"}
        assert 0 <= res.ece <= 1
        assert res.uncertainty_error_correlation > 0.3
        d = res.to_dict()
        assert "confidence_intervals" in d
        lo, hi = res.confidence_intervals["valence"]
        assert lo < res.ccc["valence"] < hi


class TestBootstrap:
    def test_ci_brackets_point_estimate(self, rng):
        x = rng.normal(size=300)
        y = 0.9 * x + 0.1 * rng.normal(size=300)
        from tpu_deer.core.metrics import concordance_correlation_coefficient

        point = float(concordance_correlation_coefficient(x, y))
        lo, hi = bootstrap_ccc_ci(x, y, n_resamples=500, seed=1)
        assert lo < point < hi
        assert hi - lo < 0.2  # reasonably tight at n=300

    def test_deterministic(self, rng):
        x = rng.normal(size=100)
        y = x + rng.normal(size=100)
        assert bootstrap_ccc_ci(x, y, seed=3) == bootstrap_ccc_ci(x, y, seed=3)


class TestUncertaintyAnalysis:
    def test_sparsification_oracle_dominates(self, rng):
        errors = np.abs(rng.normal(size=500))
        # informative uncertainty = noisy copy of error
        unc = errors + 0.1 * np.abs(rng.normal(size=500))
        out = sparsification_curve(errors, unc)
        assert np.all(out["oracle"] <= out["sparsification"] + 1e-9)
        assert out["ause"] >= 0

    def test_informative_beats_random_ause(self, rng):
        errors = np.abs(rng.normal(size=1000))
        informative = errors + 0.05 * np.abs(rng.normal(size=1000))
        random_unc = np.abs(rng.normal(size=1000))
        ause_inf = sparsification_curve(errors, informative)["ause"]
        ause_rand = sparsification_curve(errors, random_unc)["ause"]
        assert ause_inf < ause_rand

    def test_analyzer_bundle(self, good_predictions):
        preds, targets, unc = good_predictions
        out = UncertaintyAnalyzer().analyze(
            preds, targets, unc, aleatoric=unc * 0.7, epistemic=unc * 0.3
        )
        assert out["uncertainty_error_correlation"] > 0.3
        assert "ause" in out
        assert abs(
            out["decomposition"]["aleatoric_fraction"] - 0.7
        ) < 1e-5


class TestCalibration:
    def test_reliability_bins(self, good_predictions):
        preds, targets, unc = good_predictions
        out = CalibrationAnalyzer().analyze(preds, targets, unc)
        assert 0 <= out["ece"] <= 1
        assert out["reliability_score"] == pytest.approx(1 - out["ece"])
        assert len(out["reliability"]["bin_confidence"]) > 0


class TestStatisticalValidator:
    def test_per_dim_stats(self, good_predictions):
        preds, targets, _ = good_predictions
        out = StatisticalValidator(n_bootstrap=100).validate(preds, targets)
        for dim in ("valence", "arousal", "dominance"):
            assert out[dim]["pearson_r"] > 0.5
            assert out[dim]["pearson_p"] < 0.01
            lo, hi = out[dim]["ccc_ci"]
            assert lo < out[dim]["ccc"] < hi

    def test_compare_models(self, rng):
        targets = rng.normal(size=(200, 3))
        good = targets + 0.05 * rng.normal(size=(200, 3))
        bad = targets + 0.5 * rng.normal(size=(200, 3))
        out = StatisticalValidator().compare_models(bad, good, targets)
        assert out["significant"]


class TestCrossValidation:
    def test_kfold_runs(self):
        from tpu_deer.data.pipeline import ArrayDataset
        from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
        from tpu_deer.models.deer_model import DEERModelConfig
        from tpu_deer.train.trainer import TrainingConfig

        cfg = SyntheticConfig(
            n_train=200, n_val=10, n_test=10, audio_dim=8, video_dim=8, text_dim=8,
            hard_fraction=0.0,
        )
        ds = ArrayDataset(make_synthetic_splits(cfg)["train"], "synthetic")
        cv = CrossValidationEvaluator(
            DEERModelConfig(
                audio_dim=8, video_dim=8, text_dim=8, encoder_dim=16,
                fusion_dim=32, attention_heads=2, encoder_layers=1,
            ),
            TrainingConfig(
                batch_size=32, num_epochs=2, warmup_epochs=0,
                scheduler="constant", learning_rate=3e-3,
            ),
            n_folds=3,
        )
        out = cv.run(ds, epochs_per_fold=2)
        assert len(out["folds"]) == 3
        assert np.isfinite(out["ccc_mean"])
        assert out["ccc_ci"][0] <= out["ccc_mean"] <= out["ccc_ci"][1]
