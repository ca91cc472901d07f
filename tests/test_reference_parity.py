"""Numerical parity against the reference implementation itself.

These tests import the reference's torch modules (read-only, from
/root/reference — never copied into this repo) and evaluate them on the same
inputs as our jnp implementations, asserting numerical agreement. They skip
cleanly when the reference checkout isn't present.

This pins the capability claim "same math" to machine-checked evidence:
  * NIG NLL v1 + evidence reg + KL  — reference deer.py DEERLoss
  * NIG NLL v2 + reg + KL + ECE     — reference losses.py DEERLoss
  * CCC                              — reference metrics.py DEERMetrics
  * ECE                              — reference metrics.py
    uncertainty_calibration_error
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REF, "src", "models"))
    sys.path.insert(0, os.path.join(REF, "src", "utils"))
    import deer as ref_deer  # noqa: E402
    import losses as ref_losses  # noqa: E402
    import metrics as ref_metrics  # noqa: E402

    return torch, ref_deer, ref_losses, ref_metrics


@pytest.fixture
def nig_inputs(rng):
    """Positive, constrained NIG params + targets as plain numpy."""
    n = 64
    return {
        "mu": rng.normal(size=(n, 1)).astype(np.float32),
        "nu": (0.1 + np.abs(rng.normal(size=(n, 1)))).astype(np.float32),
        "alpha": (1.1 + np.abs(rng.normal(size=(n, 1)))).astype(np.float32),
        "beta": (0.1 + np.abs(rng.normal(size=(n, 1)))).astype(np.float32),
        "y": rng.normal(size=(n, 1)).astype(np.float32),
    }


def _our_params(d):
    import jax.numpy as jnp

    from tpu_deer.core.nig import NIGParams

    return NIGParams(
        jnp.asarray(d["mu"]), jnp.asarray(d["nu"]),
        jnp.asarray(d["alpha"]), jnp.asarray(d["beta"]),
    )


class TestLossParityV1:
    def test_deer_loss_v1_matches_reference(self, ref_modules, nig_inputs):
        torch, ref_deer, _, _ = ref_modules

        from tpu_deer.core.losses import DEERLossConfig, deer_loss

        ref_loss = ref_deer.DEERLoss(evidence_weight=1.0, kl_weight=1.0)
        t = lambda k: torch.tensor(nig_inputs[k])
        ref_out = ref_loss(
            {"mu": t("mu"), "nu": t("nu"), "alpha": t("alpha"), "beta": t("beta")},
            torch.tensor(nig_inputs["y"]),
        )

        ours = deer_loss(
            _our_params(nig_inputs),
            nig_inputs["y"],
            DEERLossConfig(variant="v1", evidence_weight=1.0, kl_weight=1.0),
        )
        for ref_key, our_key in (
            ("nll_loss", "nll_loss"),
            ("evidence_reg", "evidence_reg"),
            ("kl_reg", "kl_reg"),
            ("total_loss", "total_loss"),
            ("mse", "mse"),
        ):
            assert np.isclose(
                float(ref_out[ref_key]), float(ours[our_key]), rtol=1e-4
            ), (ref_key, float(ref_out[ref_key]), float(ours[our_key]))


class TestLossParityV2:
    def test_deer_loss_v2_matches_reference(self, ref_modules, nig_inputs):
        torch, _, ref_losses, _ = ref_modules

        from tpu_deer.core.losses import DEERLossConfig, deer_loss

        ref_loss = ref_losses.DEERLoss()
        t = lambda k: torch.tensor(nig_inputs[k])
        ref_out = ref_loss(
            {
                "gamma": t("mu"), "nu": t("nu"),
                "alpha": t("alpha"), "beta": t("beta"),
            },
            torch.tensor(nig_inputs["y"]),
        )
        ours = deer_loss(
            _our_params(nig_inputs), nig_inputs["y"], DEERLossConfig(variant="v2")
        )
        for ref_key, our_key in (
            ("nll_loss", "nll_loss"),
            ("reg_loss", "reg_loss"),
            ("kl_loss", "kl_loss"),
            ("ece_loss", "ece_loss"),
            ("total_loss", "total_loss"),
        ):
            assert np.isclose(
                float(ref_out[ref_key]), float(ours[our_key]), rtol=1e-3, atol=1e-4
            ), (ref_key, float(ref_out[ref_key]), float(ours[our_key]))


class TestMetricParity:
    def test_ccc_matches_reference(self, ref_modules, rng):
        _, _, _, ref_metrics = ref_modules
        x = rng.normal(size=500)
        y = 0.7 * x + 0.3 * rng.normal(size=500) + 0.1

        from tpu_deer.core.metrics import concordance_correlation_coefficient

        ref = ref_metrics.DEERMetrics().concordance_correlation_coefficient(x, y)
        ours = float(concordance_correlation_coefficient(x, y))
        assert np.isclose(ours, ref, rtol=1e-5)

    def test_ece_matches_reference(self, ref_modules, rng):
        _, _, _, ref_metrics = ref_modules
        n = 400
        preds = rng.normal(size=(n, 3))
        targets = preds + 0.2 * rng.normal(size=(n, 3))
        unc = np.abs(rng.normal(size=(n, 3))) + 0.01

        from tpu_deer.core.metrics import uncertainty_calibration_error

        ref = ref_metrics.uncertainty_calibration_error(preds, targets, unc)
        ours = float(uncertainty_calibration_error(preds, targets, unc))
        assert np.isclose(ours, ref, rtol=1e-3, atol=1e-4), (ours, ref)

    def test_significance_matches_reference(self, ref_modules, rng):
        _, _, _, ref_metrics = ref_modules
        targets = rng.normal(size=(200, 3))
        p1 = targets + 0.3 * rng.normal(size=(200, 3))
        p2 = targets + 0.1 * rng.normal(size=(200, 3))

        from tpu_deer.core.metrics import statistical_significance_test

        ref = ref_metrics.statistical_significance_test(p1, targets, p2)
        ours = statistical_significance_test(p1, targets, p2)
        assert np.isclose(ours["t_statistic"], ref["t_statistic"], rtol=1e-6)
        assert np.isclose(ours["cohens_d"], ref["cohens_d"], rtol=1e-6)
        assert ours["significant"] == ref["significant"]
