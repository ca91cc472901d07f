"""Split conformal intervals: coverage guarantee and adaptivity."""

import numpy as np
import pytest

from tpu_deer.eval.conformal import (
    ConformalCalibrator,
    conformal_quantile,
)


@pytest.fixture
def heteroscedastic():
    """Gaussian data whose noise scale varies 4x across samples, with a
    model that knows mu exactly and sigma up to a misspecification factor."""
    rng = np.random.default_rng(0)
    n = 4000
    mu = rng.normal(size=(n, 3))
    sigma_true = 0.1 + 0.4 * rng.random((n, 3))
    y = mu + sigma_true * rng.normal(size=(n, 3))
    # model's sigma is miscalibrated (0.7x) but correctly *ranked*
    sigma_model = 0.7 * sigma_true
    half = n // 2
    return dict(
        mu_cal=mu[:half], sig_cal=sigma_model[:half], y_cal=y[:half],
        mu_tst=mu[half:], sig_tst=sigma_model[half:], y_tst=y[half:],
        sig_true_tst=sigma_true[half:],
    )


class TestQuantile:
    def test_finite_sample_correction(self):
        # n=9, alpha=0.1 -> rank ceil(10*0.9)=9 -> max of the scores
        scores = np.arange(1.0, 10.0)
        assert conformal_quantile(scores, 0.1) == 9.0

    def test_insufficient_n_gives_inf(self):
        assert conformal_quantile(np.array([1.0, 2.0]), 0.05) == float("inf")

    def test_rejects_bad_alpha(self):
        with pytest.raises(ValueError):
            conformal_quantile(np.array([1.0]), 0.0)
        with pytest.raises(ValueError):
            conformal_quantile(np.array([]), 0.1)


class TestCoverage:
    @pytest.mark.parametrize("normalized", [False, True])
    @pytest.mark.parametrize("alpha", [0.1, 0.2])
    def test_marginal_coverage(self, heteroscedastic, normalized, alpha):
        d = heteroscedastic
        cal = ConformalCalibrator(alpha=alpha, normalized=normalized)
        cal.fit(d["mu_cal"], d["sig_cal"], d["y_cal"])
        cov = cal.intervals(d["mu_tst"], d["sig_tst"]).coverage(d["y_tst"])
        # guarantee is >= 1-alpha in expectation; allow finite-sample slack
        assert np.all(cov >= 1.0 - alpha - 0.03), cov
        # and not absurdly over-covering
        assert np.all(cov <= 1.0 - alpha + 0.06), cov

    def test_normalized_intervals_are_adaptive_and_shorter(self, heteroscedastic):
        """With correctly-ranked sigma, normalized conformal tracks the
        local noise scale; absolute conformal must pay the worst case."""
        d = heteroscedastic
        abs_cal = ConformalCalibrator(alpha=0.1, normalized=False).fit(
            d["mu_cal"], None, d["y_cal"])
        nrm_cal = ConformalCalibrator(alpha=0.1, normalized=True).fit(
            d["mu_cal"], d["sig_cal"], d["y_cal"])
        iv_abs = abs_cal.intervals(d["mu_tst"])
        iv_nrm = nrm_cal.intervals(d["mu_tst"], d["sig_tst"])
        # same coverage...
        assert np.all(iv_nrm.coverage(d["y_tst"]) >= 0.87)
        # ...but adaptive widths correlate with the true noise scale
        w = (iv_nrm.upper - iv_nrm.lower)[:, 0]
        r = np.corrcoef(w, d["sig_true_tst"][:, 0])[0, 1]
        assert r > 0.95
        # and are shorter on the easy (low-noise) half of samples
        easy = d["sig_true_tst"][:, 0] < np.median(d["sig_true_tst"][:, 0])
        assert w[easy].mean() < iv_abs.mean_width()[0]

    def test_miscalibrated_sigma_still_covers(self, heteroscedastic):
        """The guarantee must not depend on sigma being well-scaled."""
        d = heteroscedastic
        cal = ConformalCalibrator(alpha=0.1, normalized=True)
        cal.fit(d["mu_cal"], 5.0 * d["sig_cal"], d["y_cal"])  # 5x off
        cov = cal.intervals(d["mu_tst"], 5.0 * d["sig_tst"]).coverage(d["y_tst"])
        assert np.all(cov >= 0.87)


class TestAPI:
    def test_1d_inputs(self):
        rng = np.random.default_rng(1)
        mu = rng.normal(size=200)
        y = mu + 0.1 * rng.normal(size=200)
        cal = ConformalCalibrator(alpha=0.1, normalized=False).fit(mu, None, y)
        iv = cal.intervals(mu)
        assert iv.lower.shape == (200, 1)

    def test_fit_required(self):
        with pytest.raises(RuntimeError):
            ConformalCalibrator().intervals(np.zeros((4, 3)), np.ones((4, 3)))

    def test_report_is_json_ready(self, heteroscedastic):
        import json

        d = heteroscedastic
        cal = ConformalCalibrator(alpha=0.1).fit(
            d["mu_cal"], d["sig_cal"], d["y_cal"])
        rep = cal.report(d["mu_tst"], d["sig_tst"], d["y_tst"])
        json.dumps(rep)
        assert rep["nominal_coverage"] == 0.9
