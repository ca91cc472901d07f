"""Metric unit tests against closed-form values and scipy/numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.core import metrics


def _numpy_ccc(x, y):
    mx, my = np.mean(x), np.mean(y)
    vx, vy = np.var(x), np.var(y)
    r = np.corrcoef(x, y)[0, 1]
    return 2 * r * np.sqrt(vx) * np.sqrt(vy) / (vx + vy + (mx - my) ** 2)


class TestCCC:
    def test_perfect_agreement(self, rng):
        x = rng.normal(size=200)
        assert np.isclose(
            float(metrics.concordance_correlation_coefficient(x, x)), 1.0, atol=1e-5
        )

    def test_matches_numpy_reference(self, rng):
        x = rng.normal(size=500)
        y = 0.8 * x + 0.2 * rng.normal(size=500) + 0.1
        got = float(metrics.concordance_correlation_coefficient(x, y))
        assert np.isclose(got, _numpy_ccc(x, y), rtol=1e-5)

    def test_nan_masking(self, rng):
        x = rng.normal(size=100)
        y = x.copy()
        x_nan, y_nan = x.copy(), y.copy()
        x_nan[::10] = np.nan
        got = float(metrics.concordance_correlation_coefficient(x_nan, y_nan))
        mask = ~np.isnan(x_nan)
        expected = _numpy_ccc(x[mask], y[mask])
        assert np.isclose(got, expected, rtol=1e-5)

    def test_anticorrelated_negative(self, rng):
        x = rng.normal(size=200)
        assert float(metrics.concordance_correlation_coefficient(x, -x)) < -0.9

    def test_sufficient_stats_shardable(self, rng):
        """Summing per-shard stats must give the global CCC (the DP recipe)."""
        x = rng.normal(size=512)
        y = 0.7 * x + 0.3 * rng.normal(size=512)
        full = metrics.ccc_sufficient_stats(jnp.asarray(x), jnp.asarray(y))
        shard_stats = [
            metrics.ccc_sufficient_stats(
                jnp.asarray(x[i * 64 : (i + 1) * 64]),
                jnp.asarray(y[i * 64 : (i + 1) * 64]),
            )
            for i in range(8)
        ]
        summed = metrics.CCCStats(
            *[sum(float(s[i]) for s in shard_stats) for i in range(6)]
        )
        got = float(
            metrics.ccc_from_stats(
                metrics.CCCStats(*[jnp.asarray(v) for v in summed])
            )
        )
        assert np.isclose(got, float(metrics.ccc_from_stats(full)), rtol=1e-5)


class TestBasicMetrics:
    def test_mae_rmse(self, rng):
        x = rng.normal(size=300)
        y = x + rng.normal(size=300) * 0.1
        assert np.isclose(
            float(metrics.mean_absolute_error(x, y)), np.mean(np.abs(x - y)), rtol=1e-5
        )
        assert np.isclose(
            float(metrics.root_mean_squared_error(x, y)),
            np.sqrt(np.mean((x - y) ** 2)),
            rtol=1e-5,
        )

    def test_pearson_matches_numpy(self, rng):
        x = rng.normal(size=400)
        y = 0.5 * x + rng.normal(size=400)
        assert np.isclose(
            float(metrics.pearson_correlation(x, y)),
            np.corrcoef(x, y)[0, 1],
            rtol=1e-4,
        )


class TestECE:
    def test_well_calibrated_low_ece(self, rng):
        """Uncertainty that tracks |error| closely should give low ECE."""
        n = 2000
        errs = np.abs(rng.normal(size=n) * 0.1)
        preds = rng.normal(size=n)
        targets = preds + errs * np.sign(rng.normal(size=n))
        unc = errs  # perfectly informative uncertainty
        ece = float(metrics.uncertainty_calibration_error(preds, targets, unc))
        assert ece < 0.05

    def test_miscalibrated_high_ece(self, rng):
        n = 2000
        preds = rng.normal(size=n)
        targets = preds + rng.normal(size=n)  # large errors
        unc = np.full(n, 1e-4)  # claims near-certainty
        ece = float(metrics.uncertainty_calibration_error(preds, targets, unc))
        assert ece > 0.3

    def test_too_few_samples_returns_one(self):
        ece = float(
            metrics.uncertainty_calibration_error(
                np.ones(3), np.ones(3), np.ones(3), n_bins=10
            )
        )
        assert ece == 1.0

    def test_multidim_averaged(self, rng):
        preds = rng.normal(size=(200, 3))
        targets = preds + rng.normal(size=(200, 3)) * 0.1
        unc = np.abs(rng.normal(size=(200, 3)))
        ece = float(metrics.uncertainty_calibration_error(preds, targets, unc))
        assert 0.0 <= ece <= 1.0


class TestBundlesAndStats:
    def test_evaluate_predictions_keys(self, rng):
        preds = rng.normal(size=(100, 3))
        targets = preds + 0.1 * rng.normal(size=(100, 3))
        unc = np.abs(rng.normal(size=(100, 3)))
        out = metrics.evaluate_predictions(preds, targets, unc)
        for key in (
            "ccc_valence",
            "ccc_arousal",
            "ccc_dominance",
            "ccc_average",
            "mae_average",
            "rmse_average",
            "ece",
            "uncertainty_error_correlation",
        ):
            assert key in out, key
        assert out["ccc_average"] > 0.9

    def test_significance_test(self, rng):
        targets = rng.normal(size=(200, 3))
        good = targets + 0.05 * rng.normal(size=(200, 3))
        bad = targets + 0.5 * rng.normal(size=(200, 3))
        out = metrics.statistical_significance_test(bad, targets, good)
        assert out["significant"]
        assert out["cohens_d"] > 0.8
        assert out["effect_size"] == "large"

    def test_transfer_effectiveness(self):
        assert metrics.cross_dataset_transfer_effectiveness(0.8, 0.72) == pytest.approx(
            0.9
        )
        assert metrics.cross_dataset_transfer_effectiveness(0.0, 0.5) == 0.0
        assert metrics.cross_dataset_transfer_effectiveness(0.5, 0.9) == 1.0


class TestNumpyTwins:
    """The host-facing numpy fast paths must equal the jnp implementations."""

    def test_ccc_np_matches_jnp(self, rng):
        x = rng.normal(size=400)
        y = 0.6 * x + 0.4 * rng.normal(size=400)
        assert np.isclose(
            metrics.ccc_np(x, y),
            float(metrics.concordance_correlation_coefficient(x, y)),
            rtol=1e-5,
        )

    def test_pearson_np_matches_jnp(self, rng):
        x = rng.normal(size=300)
        y = x + rng.normal(size=300)
        assert np.isclose(
            metrics.pearson_np(x, y),
            float(metrics.pearson_correlation(x, y)),
            rtol=1e-5,
        )

    def test_ece_np_matches_jnp(self, rng):
        preds = rng.normal(size=(300, 3))
        targets = preds + 0.2 * rng.normal(size=(300, 3))
        unc = np.abs(rng.normal(size=(300, 3))) + 0.01
        assert np.isclose(
            metrics.ece_np(preds, targets, unc),
            float(metrics.uncertainty_calibration_error(preds, targets, unc)),
            rtol=1e-3,
            atol=1e-5,
        )

    def test_ece_np_too_few_samples(self):
        assert metrics.ece_np(np.ones(3), np.ones(3), np.ones(3)) == 1.0
