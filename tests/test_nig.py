"""Unit tests for NIG evidential math against hand-computed / closed-form values."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special, stats

from tpu_deer.core import nig


def _params(mu, nu, alpha, beta):
    as_arr = lambda v: jnp.asarray(np.atleast_2d(v), dtype=jnp.float32)
    return nig.NIGParams(as_arr(mu), as_arr(nu), as_arr(alpha), as_arr(beta))


class TestParamExtraction:
    def test_constraints(self, rng):
        evidence = jnp.asarray(rng.normal(size=(16, 3, 4)), dtype=jnp.float32)
        p = nig.nig_params_from_evidence(evidence)
        assert p.mu.shape == (16, 3)
        assert np.all(np.asarray(p.nu) > 0)
        assert np.all(np.asarray(p.alpha) > 1)
        assert np.all(np.asarray(p.beta) > 0)

    def test_flat_layout(self, rng):
        evidence = rng.normal(size=(8, 12)).astype(np.float32)
        p_flat = nig.nig_params_from_evidence(jnp.asarray(evidence))
        p_3d = nig.nig_params_from_evidence(jnp.asarray(evidence.reshape(8, 3, 4)))
        np.testing.assert_allclose(np.asarray(p_flat.mu), np.asarray(p_3d.mu))

    def test_softplus_values(self):
        # softplus(0) = log 2; check each constraint formula exactly.
        evidence = jnp.zeros((1, 1, 4))
        p = nig.nig_params_from_evidence(evidence)
        sp0 = math.log(2.0)
        assert np.isclose(float(p.mu[0, 0]), 0.0)
        assert np.isclose(float(p.nu[0, 0]), sp0 + 1e-6)
        assert np.isclose(float(p.alpha[0, 0]), sp0 + 1.0)
        assert np.isclose(float(p.beta[0, 0]), sp0 + 1e-6)


class TestUncertainties:
    def test_closed_form(self):
        p = _params(mu=0.3, nu=2.0, alpha=3.0, beta=4.0)
        u = nig.nig_uncertainties(p)
        # aleatoric = beta/(alpha-1) = 2; epistemic = beta/(nu(alpha-1)) = 1
        assert np.isclose(float(u["aleatoric"][0, 0]), 2.0)
        assert np.isclose(float(u["epistemic"][0, 0]), 1.0)
        assert np.isclose(float(u["total"][0, 0]), 3.0)


class TestNLL:
    def test_v1_hand_computed(self):
        """Check the v1 NLL formula term-by-term on fixed numbers."""
        mu, nu, alpha, beta, y = 0.5, 2.0, 3.0, 1.5, 1.0
        p = _params(mu, nu, alpha, beta)
        sq = (y - mu) ** 2
        expected = (
            0.5 * math.log(math.pi / nu)
            - alpha * math.log(2 * beta)
            + special.gammaln(alpha)
            - special.gammaln(alpha + 0.5)
            + (alpha + 0.5) * math.log(beta + 0.5 * nu * sq)
        )
        got = float(nig.nig_nll(p, jnp.asarray([[y]]))[0, 0])
        assert np.isclose(got, expected, rtol=1e-5)

    def test_v1_matches_student_t_identity(self):
        """v1 NLL equals a Student-t NLL up to a known alpha-dependent offset.

        The reference's v1 formula (deer.py:150-158) is NOT the exact NIG
        marginal (it drops the (1+nu) factors of Amini et al.); algebraically
        it satisfies

            v1_nll = StudentT_NLL(df=2a, loc=mu, scale^2=b/(n*a)) - (a+0.5)*ln 2

        which this test verifies against scipy — pinning the implementation
        to a closed form while documenting the quirk.
        """
        rng = np.random.default_rng(0)
        for _ in range(20):
            mu = float(rng.normal())
            nu = float(rng.uniform(0.1, 5.0))
            alpha = float(rng.uniform(1.1, 6.0))
            beta = float(rng.uniform(0.1, 5.0))
            y = float(rng.normal())
            p = _params(mu, nu, alpha, beta)
            got = float(nig.nig_nll(p, jnp.asarray([[y]]))[0, 0])
            scale = math.sqrt(beta / (nu * alpha))
            expected = -stats.t.logpdf(y, df=2 * alpha, loc=mu, scale=scale) - (
                alpha + 0.5
            ) * math.log(2.0)
            assert np.isclose(got, expected, rtol=1e-4), (mu, nu, alpha, beta, y)

    def test_v2_hand_computed(self):
        mu, nu, alpha, beta, y = -0.2, 1.0, 2.0, 0.5, 0.4
        eps = 1e-6
        p = _params(mu, nu, alpha, beta)
        err2 = (y - mu) ** 2
        expected = -(
            0.5 * math.log(nu / (2 * math.pi + eps))
            + alpha * math.log(beta + eps)
            - special.gammaln(alpha + eps)
            - (alpha + 0.5) * math.log(beta + 0.5 * nu * err2 + eps)
        )
        got = float(nig.nig_nll_v2(p, jnp.asarray([[y]]))[0, 0])
        assert np.isclose(got, expected, rtol=1e-5)

    def test_nll_decreases_when_prediction_improves(self):
        y = jnp.asarray([[1.0]])
        bad = _params(mu=-1.0, nu=1.0, alpha=2.0, beta=1.0)
        good = _params(mu=1.0, nu=1.0, alpha=2.0, beta=1.0)
        assert float(nig.nig_nll(good, y)[0, 0]) < float(nig.nig_nll(bad, y)[0, 0])

    def test_gradients_finite(self, rng):
        evidence = jnp.asarray(rng.normal(size=(4, 3, 4)), dtype=jnp.float32)
        y = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)

        def loss(e):
            p = nig.nig_params_from_evidence(e)
            return jnp.mean(nig.nig_nll(p, y))

        g = jax.grad(loss)(evidence)
        assert np.all(np.isfinite(np.asarray(g)))


class TestRegularizers:
    def test_evidence_reg_v1_value(self):
        mu, nu, alpha, beta, y = 0.0, 2.0, 3.0, 1.0, 1.0
        p = _params(mu, nu, alpha, beta)
        expected = (nu * 1.0 + 2 * beta * (1 + nu)) / (2 * nu * (1 + nu))
        got = float(nig.evidence_regularizer(p, jnp.asarray([[y]]))[0, 0])
        assert np.isclose(got, expected, rtol=1e-6)

    def test_evidence_reg_v2_value(self):
        mu, nu, alpha, beta, y = 0.0, 2.0, 3.0, 1.0, 2.0
        p = _params(mu, nu, alpha, beta)
        err2 = 4.0
        expected = err2 * (2 * beta + nu * err2)
        got = float(nig.evidence_regularizer_v2(p, jnp.asarray([[y]]))[0, 0])
        assert np.isclose(got, expected, rtol=1e-6)

    def test_evidence_reg_penalizes_confident_errors(self):
        """v2 reg must grow with evidence (nu) at fixed error."""
        y = jnp.asarray([[1.0]])
        lo = _params(mu=0.0, nu=0.5, alpha=2.0, beta=1.0)
        hi = _params(mu=0.0, nu=5.0, alpha=2.0, beta=1.0)
        assert float(nig.evidence_regularizer_v2(hi, y).sum()) > float(
            nig.evidence_regularizer_v2(lo, y).sum()
        )

    def test_kl_v1_clamped_nonnegative(self, rng):
        evidence = jnp.asarray(rng.normal(size=(32, 3, 4)) * 3, dtype=jnp.float32)
        p = nig.nig_params_from_evidence(evidence)
        assert np.all(np.asarray(nig.kl_regularizer(p)) >= 0)

    def test_kl_v2_minimum_at_prior(self):
        at_prior = _params(mu=0.0, nu=1.0, alpha=1.0, beta=1.0)
        off_prior = _params(mu=0.0, nu=1.0, alpha=3.0, beta=5.0)
        assert float(nig.kl_regularizer_v2(at_prior).sum()) < float(
            nig.kl_regularizer_v2(off_prior).sum()
        )


class TestPredictiveInterval:
    def test_interval_contains_mean_and_widens_with_beta(self):
        narrow = _params(mu=0.0, nu=2.0, alpha=3.0, beta=0.5)
        wide = _params(mu=0.0, nu=2.0, alpha=3.0, beta=5.0)
        lo_n, hi_n = nig.nig_predictive_interval(narrow)
        lo_w, hi_w = nig.nig_predictive_interval(wide)
        assert float(lo_n[0, 0]) < 0 < float(hi_n[0, 0])
        assert float(hi_w[0, 0]) > float(hi_n[0, 0])


class TestExpectedAbsError:
    def test_matches_monte_carlo(self):
        """E|y-mu| closed form vs sampling from the NIG generative model."""
        rng = np.random.default_rng(0)
        for nu_v, al_v, be_v in [(1.0, 1.5, 0.5), (0.3, 1.05, 2.0), (10.0, 4.0, 0.2)]:
            p = nig.NIGParams(
                mu=jnp.zeros(()), nu=jnp.array(nu_v),
                alpha=jnp.array(al_v), beta=jnp.array(be_v),
            )
            n = 400_000
            sigma2 = 1.0 / rng.gamma(al_v, 1.0 / be_v, n)
            mu_s = rng.normal(0.0, np.sqrt(sigma2 / nu_v))
            y = rng.normal(mu_s, np.sqrt(sigma2))
            mc = float(np.abs(y).mean())
            cf = float(nig.nig_expected_abs_error(p))
            assert abs(cf - mc) / mc < 0.02, (nu_v, al_v, be_v, cf, mc)

    def test_finite_as_alpha_approaches_one(self):
        """The moment channel beta/(alpha-1) diverges as alpha->1+; the
        t-marginal E|err| must stay finite and modest (df=2a>2 always)."""
        p = nig.NIGParams(
            mu=jnp.zeros(4), nu=jnp.ones(4),
            alpha=jnp.array([1.0001, 1.01, 1.5, 4.0]), beta=jnp.ones(4),
        )
        moment = nig.nig_uncertainties(p)["total"]
        eabs = nig.nig_expected_abs_error(p)
        assert float(moment[0]) > 1e3  # the divergence being replaced
        assert np.all(np.isfinite(np.asarray(eabs)))
        assert float(eabs[0]) < 100.0
        # monotone in beta at fixed alpha, nu
        p2 = p._replace(beta=2.0 * p.beta)
        assert np.all(np.asarray(nig.nig_expected_abs_error(p2)) > np.asarray(eabs))
