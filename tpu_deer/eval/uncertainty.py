"""Uncertainty-quality analysis: error correlation, sparsification/AUSE, stats.

Parity with reference UncertaintyAnalyzer (evaluation.py:358-482).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from tpu_deer.core import metrics as metrics_lib


def sparsification_curve(
    errors: np.ndarray, uncertainties: np.ndarray, n_steps: int = 20
) -> dict[str, np.ndarray]:
    """Sparsification analysis (evaluation.py:427-464).

    Remove the most-uncertain x% of samples and track mean error of the rest;
    compare with the oracle (remove by true error). AUSE = area between the
    uncertainty-ordered and oracle curves (lower is better).
    """
    errors = np.asarray(errors).ravel()
    uncertainties = np.asarray(uncertainties).ravel()
    n = len(errors)
    by_unc = np.argsort(-uncertainties)  # most uncertain first
    by_err = np.argsort(-errors)  # oracle: largest error first

    fractions = np.linspace(0.0, 0.99, n_steps)
    curve, oracle = [], []
    for f in fractions:
        k = int(f * n)
        curve.append(errors[by_unc[k:]].mean())
        oracle.append(errors[by_err[k:]].mean())
    curve = np.asarray(curve)
    oracle = np.asarray(oracle)
    base = curve[0] if curve[0] > 0 else 1.0
    ause = float(np.trapezoid(curve - oracle, fractions) / base)
    return {
        "fractions": fractions,
        "sparsification": curve,
        "oracle": oracle,
        "ause": ause,
    }


class UncertaintyAnalyzer:
    """Bundles uncertainty-error correlation, AUSE, and distribution stats."""

    def analyze(
        self,
        predictions: np.ndarray,
        targets: np.ndarray,
        uncertainties: np.ndarray,
        aleatoric: Optional[np.ndarray] = None,
        epistemic: Optional[np.ndarray] = None,
    ) -> dict:
        predictions = np.asarray(predictions)
        targets = np.asarray(targets)
        uncertainties = np.asarray(uncertainties)
        errors = np.abs(predictions - targets)

        per_dim_corr = {}
        dims = ("valence", "arousal", "dominance")
        for i in range(predictions.shape[1]):
            per_dim_corr[dims[i] if i < 3 else f"dim_{i}"] = metrics_lib.pearson_np(
                errors[:, i], uncertainties[:, i]
            )

        spars = sparsification_curve(errors.mean(axis=1), uncertainties.mean(axis=1))

        out = {
            "uncertainty_error_correlation": metrics_lib.pearson_np(
                errors.mean(axis=1), uncertainties.mean(axis=1)
            ),
            "per_dim_correlation": per_dim_corr,
            "ause": spars["ause"],
            "sparsification": spars,
            "uncertainty_stats": {
                "mean": float(uncertainties.mean()),
                "std": float(uncertainties.std()),
                "min": float(uncertainties.min()),
                "max": float(uncertainties.max()),
                "median": float(np.median(uncertainties)),
            },
        }
        if aleatoric is not None and epistemic is not None:
            total = np.asarray(aleatoric) + np.asarray(epistemic)
            out["decomposition"] = {
                "aleatoric_fraction": float(
                    np.mean(np.asarray(aleatoric) / np.maximum(total, 1e-8))
                ),
                "epistemic_fraction": float(
                    np.mean(np.asarray(epistemic) / np.maximum(total, 1e-8))
                ),
            }
        return out
