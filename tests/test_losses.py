"""Unit tests for DEER losses: finiteness, gradient flow, reference behaviors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.core import losses, nig


def _random_params(rng, batch=16, dims=1, scale=1.0):
    evidence = jnp.asarray(
        rng.normal(size=(batch, dims, 4)) * scale, dtype=jnp.float32
    )
    return nig.nig_params_from_evidence(evidence)


class TestDEERLoss:
    @pytest.mark.parametrize("variant", ["v1", "v2"])
    def test_components_finite(self, rng, variant):
        p = _random_params(rng)
        y = jnp.asarray(rng.normal(size=(16, 1)), dtype=jnp.float32)
        out = losses.deer_loss(p, y, losses.DEERLossConfig(variant=variant))
        for k, v in out.items():
            assert np.isfinite(float(v)), k

    def test_v1_weights_compose(self, rng):
        p = _random_params(rng)
        y = jnp.asarray(rng.normal(size=(16, 1)), dtype=jnp.float32)
        cfg = losses.DEERLossConfig(variant="v1", evidence_weight=2.0, kl_weight=0.5)
        out = losses.deer_loss(p, y, cfg)
        expected = (
            float(out["nll_loss"])
            + 2.0 * float(out["evidence_reg"])
            + 0.5 * float(out["kl_reg"])
        )
        assert np.isclose(float(out["total_loss"]), expected, rtol=1e-5)

    def test_v2_weights_compose(self, rng):
        p = _random_params(rng)
        y = jnp.asarray(rng.normal(size=(16, 1)), dtype=jnp.float32)
        cfg = losses.DEERLossConfig(variant="v2")
        out = losses.deer_loss(p, y, cfg)
        expected = (
            float(out["nll_loss"])
            + cfg.reg_weight * float(out["reg_loss"])
            + cfg.kl_weight_v2 * float(out["kl_loss"])
            + cfg.ece_weight * float(out["ece_loss"])
        )
        assert np.isclose(float(out["total_loss"]), expected, rtol=1e-5)

    def test_gradient_descends(self, rng):
        """A few SGD steps on the loss must reduce it (sanity: trainable)."""
        y = jnp.asarray(rng.normal(size=(32, 1)), dtype=jnp.float32)
        evidence = jnp.asarray(rng.normal(size=(32, 1, 4)), dtype=jnp.float32)

        def f(e):
            return losses.deer_loss(
                nig.nig_params_from_evidence(e), y, losses.DEERLossConfig("v2")
            )["total_loss"]

        val0 = float(f(evidence))
        g = jax.grad(f)
        e = evidence
        for _ in range(25):
            e = e - 0.05 * g(e)
        assert float(f(e)) < val0


class TestBinnedECELoss:
    def test_zero_for_perfectly_calibrated(self):
        # confidence == accuracy in every bin -> ECE 0 is hard to construct
        # exactly; instead check range and monotonicity properties.
        rng = np.random.default_rng(1)
        p = _random_params(rng, batch=256)
        y = jnp.asarray(rng.normal(size=(256, 1)), dtype=jnp.float32)
        ece = float(losses.binned_ece_loss(p, y))
        assert 0.0 <= ece <= 2.0

    def test_differentiable(self, rng):
        y = jnp.asarray(rng.normal(size=(64, 1)), dtype=jnp.float32)
        evidence = jnp.asarray(rng.normal(size=(64, 1, 4)), dtype=jnp.float32)

        def f(e):
            return losses.binned_ece_loss(nig.nig_params_from_evidence(e), y)

        g = jax.grad(f)(evidence)
        assert np.all(np.isfinite(np.asarray(g)))


class TestMultiTaskLoss:
    def test_three_dims(self, rng):
        ps = [_random_params(rng, batch=16, dims=1) for _ in range(3)]
        y = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
        out = losses.multi_task_deer_loss(ps, y)
        assert np.isfinite(float(out["total_loss"]))
        assert "valence_total_loss" in out
        assert "cross_dim_loss" in out

    def test_task_weights_change_total(self, rng):
        ps = [_random_params(rng, batch=16, dims=1) for _ in range(3)]
        y = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
        a = losses.multi_task_deer_loss(ps, y, task_weights=[1.0, 1.0, 1.0])
        b = losses.multi_task_deer_loss(ps, y, task_weights=[2.0, 1.0, 1.0])
        assert float(a["total_loss"]) != float(b["total_loss"])

    def test_cross_dim_consistency_zero_when_identical(self, rng):
        p = _random_params(rng, batch=16, dims=1)
        y = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
        out = losses.multi_task_deer_loss([p, p, p], y)
        assert np.isclose(float(out["cross_dim_loss"]), 0.0, atol=1e-6)


class TestAuxLosses:
    def test_uncertainty_regularization(self, rng):
        p = _random_params(rng, batch=64, dims=3)
        out = losses.uncertainty_regularization_loss(p)
        assert np.isfinite(float(out["reg_loss"]))
        assert float(out["sparsity_loss"]) > 0  # uncertainties are positive

    @pytest.mark.parametrize("strategy", ["uniform", "quantile"])
    def test_calibration_loss_bounds(self, rng, strategy):
        p = _random_params(rng, batch=128, dims=3)
        y = jnp.asarray(rng.normal(size=(128, 3)), dtype=jnp.float32)
        cal = float(losses.calibration_loss(p, y, bin_strategy=strategy))
        assert 0.0 <= cal <= 1.0

    def test_combined_loss(self, rng):
        ps = [_random_params(rng, batch=32, dims=1) for _ in range(3)]
        y = jnp.asarray(
            np.tanh(rng.normal(size=(32, 3))), dtype=jnp.float32
        )
        out = losses.combined_deer_loss(ps, y)
        assert np.isfinite(float(out["total_loss"]))
        assert "uncertainty_reg_loss" in out
        assert "calibration_loss" in out

    def test_combined_loss_jittable(self, rng):
        ps = [_random_params(rng, batch=32, dims=1) for _ in range(3)]
        y = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)

        @jax.jit
        def f(ps, y):
            return losses.combined_deer_loss(ps, y)["total_loss"]

        assert np.isfinite(float(f(ps, y)))
