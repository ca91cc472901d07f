"""Regression + uncertainty metrics — jnp-native, distribution-aware.

Capability parity with reference `src/utils/metrics.py` (formulas re-derived):
  * concordance_correlation_coefficient — metrics.py:59-103 (Lin's CCC,
    NaN-masked)
  * MAE / RMSE                          — metrics.py:105-135
  * uncertainty_calibration_error (ECE) — metrics.py:214-279
    (uncertainty-quantile bins, confidence = 1-u, accuracy = 1-|err|)
  * statistical_significance_test       — metrics.py:282-327
  * cross_dataset_transfer_effectiveness — metrics.py:330-346
  * evaluate_predictions bundle         — metrics.py:137-188

TPU-first additions beyond the reference:
  * `ccc_sufficient_stats` / `ccc_from_stats` — CCC decomposed into
    psum-able sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) so global CCC
    can be computed under data parallelism with one small collective instead
    of gathering predictions to the host.
  * on-device, maskable implementations of every metric (static shapes; NaN
    handling via `jnp.where` masks instead of boolean indexing).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-8


def _valid_mask(*arrays: jax.Array) -> jax.Array:
    mask = jnp.ones_like(arrays[0], dtype=bool)
    for a in arrays:
        mask = mask & jnp.isfinite(a)
    return mask


class CCCStats(NamedTuple):
    """Sufficient statistics for CCC — additive across shards (psum-able)."""

    n: jax.Array
    sum_x: jax.Array
    sum_y: jax.Array
    sum_x2: jax.Array
    sum_y2: jax.Array
    sum_xy: jax.Array


def ccc_sufficient_stats(
    y_true: jax.Array, y_pred: jax.Array, mask: Optional[jax.Array] = None
) -> CCCStats:
    """Accumulate the six sufficient statistics for Lin's CCC.

    Under a data-parallel mesh these are reduced with `jax.lax.psum` (or by
    simply summing per-shard stats on host) before `ccc_from_stats`.
    """
    if mask is None:
        mask = _valid_mask(y_true, y_pred)
    m = mask.astype(jnp.float32)
    x = jnp.where(mask, y_true, 0.0).astype(jnp.float32)
    y = jnp.where(mask, y_pred, 0.0).astype(jnp.float32)
    return CCCStats(
        n=jnp.sum(m),
        sum_x=jnp.sum(x),
        sum_y=jnp.sum(y),
        sum_x2=jnp.sum(x * x),
        sum_y2=jnp.sum(y * y),
        sum_xy=jnp.sum(x * y),
    )


def ccc_from_stats(s: CCCStats) -> jax.Array:
    """Lin's CCC from sufficient statistics.

    CCC = 2*cov(x,y) / (var(x) + var(y) + (mean(x)-mean(y))^2)
    (population variances, matching np.var in the reference metrics.py:87-89).
    """
    n = jnp.maximum(s.n, 1.0)
    mean_x = s.sum_x / n
    mean_y = s.sum_y / n
    var_x = s.sum_x2 / n - mean_x**2
    var_y = s.sum_y2 / n - mean_y**2
    cov = s.sum_xy / n - mean_x * mean_y
    denom = var_x + var_y + jnp.square(mean_x - mean_y)
    ccc = jnp.where(jnp.abs(denom) > EPS, 2.0 * cov / denom, 0.0)
    return jnp.where(s.n > 0, ccc, 0.0)


def concordance_correlation_coefficient(
    y_true: jax.Array, y_pred: jax.Array
) -> jax.Array:
    """Lin's CCC with NaN masking (reference metrics.py:59-103)."""
    y_true = jnp.ravel(jnp.asarray(y_true))
    y_pred = jnp.ravel(jnp.asarray(y_pred))
    return ccc_from_stats(ccc_sufficient_stats(y_true, y_pred))


def pearson_correlation(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Masked Pearson r."""
    y_true = jnp.ravel(jnp.asarray(y_true))
    y_pred = jnp.ravel(jnp.asarray(y_pred))
    s = ccc_sufficient_stats(y_true, y_pred)
    n = jnp.maximum(s.n, 1.0)
    mean_x, mean_y = s.sum_x / n, s.sum_y / n
    var_x = s.sum_x2 / n - mean_x**2
    var_y = s.sum_y2 / n - mean_y**2
    cov = s.sum_xy / n - mean_x * mean_y
    denom = jnp.sqrt(jnp.maximum(var_x * var_y, EPS * EPS))
    return jnp.where(denom > EPS, cov / denom, 0.0)


def mean_absolute_error(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Masked MAE (reference metrics.py:105-119)."""
    y_true = jnp.ravel(jnp.asarray(y_true))
    y_pred = jnp.ravel(jnp.asarray(y_pred))
    mask = _valid_mask(y_true, y_pred)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    err = jnp.where(mask, jnp.abs(y_true - y_pred), 0.0)
    return jnp.sum(err) / n


def root_mean_squared_error(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Masked RMSE (reference metrics.py:121-135)."""
    y_true = jnp.ravel(jnp.asarray(y_true))
    y_pred = jnp.ravel(jnp.asarray(y_pred))
    mask = _valid_mask(y_true, y_pred)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    err = jnp.where(mask, jnp.square(y_true - y_pred), 0.0)
    return jnp.sqrt(jnp.sum(err) / n)


def uncertainty_calibration_error(
    predictions: jax.Array,
    targets: jax.Array,
    uncertainties: jax.Array,
    n_bins: int = 10,
) -> jax.Array:
    """Expected Calibration Error with uncertainty-quantile bins.

    Behavior of reference metrics.py:214-279: errors/uncertainties are
    averaged across output dims, bins are uncertainty quantiles, confidence
    = 1 - u and accuracy = 1 - |err| per bin, ECE = Σ_b w_b |conf_b - acc_b|.
    Vectorized with mask matrices so it stays jittable.
    """
    predictions = jnp.asarray(predictions)
    targets = jnp.asarray(targets)
    uncertainties = jnp.asarray(uncertainties)

    errors = jnp.abs(predictions - targets)
    if errors.ndim > 1:
        errors = jnp.mean(errors, axis=tuple(range(1, errors.ndim)))
        uncertainties = jnp.mean(
            uncertainties, axis=tuple(range(1, uncertainties.ndim))
        )
    errors = jnp.ravel(errors)
    uncertainties = jnp.ravel(uncertainties)

    mask = _valid_mask(errors, uncertainties)
    # Push invalid entries to +inf so they land outside every bin.
    u = jnp.where(mask, uncertainties, jnp.inf)
    e = jnp.where(mask, errors, 0.0)

    q = jnp.linspace(0.0, 1.0, n_bins + 1)
    finite_u = jnp.where(mask, uncertainties, jnp.nan)
    edges = jnp.nanquantile(finite_u, q)
    edges = edges.at[0].set(0.0)
    edges = edges.at[-1].set(jnp.nanmax(finite_u) + 1e-6)

    in_bin = (u[None, :] >= edges[:-1, None]) & (u[None, :] < edges[1:, None])
    in_bin = in_bin.astype(jnp.float32)
    counts = in_bin.sum(axis=1)
    safe = jnp.maximum(counts, 1.0)
    avg_conf = 1.0 - (in_bin * u[None, :]).sum(axis=1) / safe
    avg_acc = 1.0 - (in_bin * e[None, :]).sum(axis=1) / safe
    total = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    weights = counts / total
    per_bin = jnp.where(counts > 0, jnp.abs(avg_conf - avg_acc), 0.0)
    ece = jnp.sum(weights * per_bin)
    # Reference returns 1.0 when there are fewer valid samples than bins.
    return jnp.where(jnp.sum(mask) < n_bins, 1.0, ece)


# ---------------------------------------------------------------------------
# Host-facing numpy fast paths.
#
# The jnp functions above run eagerly when called from host code: every op is
# a separate device dispatch, which is slow through a remote-TPU tunnel. The
# _np twins compute identical values in pure numpy and back the convenience
# bundles; the jnp versions remain the in-graph (jit/psum) implementations.
# ---------------------------------------------------------------------------
def ccc_np(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    x = np.asarray(y_true, dtype=np.float64).ravel()
    y = np.asarray(y_pred, dtype=np.float64).ravel()
    mask = np.isfinite(x) & np.isfinite(y)
    if mask.sum() == 0:
        return 0.0
    x, y = x[mask], y[mask]
    mx, my = x.mean(), y.mean()
    vx, vy = x.var(), y.var()
    cov = (x * y).mean() - mx * my
    denom = vx + vy + (mx - my) ** 2
    return float(2.0 * cov / denom) if abs(denom) > EPS else 0.0


def pearson_np(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    mask = np.isfinite(a) & np.isfinite(b)
    if mask.sum() < 2:
        return 0.0
    a, b = a[mask], b[mask]
    denom = a.std() * b.std()
    return float(((a - a.mean()) * (b - b.mean())).mean() / denom) if denom > EPS else 0.0


def reliability_np(
    predictions: np.ndarray,
    targets: np.ndarray,
    uncertainties: np.ndarray,
    n_bins: int = 10,
) -> dict:
    """Reliability-curve data under the SAME definition as ece_np
    (uncertainty-quantile bins, confidence = 1-u, accuracy = 1-|err|), so a
    plotted curve is directly consistent with the reported headline ECE.
    Returns {bin_confidence, bin_accuracy, bin_count, ece}."""
    errors = np.abs(np.asarray(predictions) - np.asarray(targets))
    unc = np.asarray(uncertainties, dtype=np.float64)
    if errors.ndim > 1:
        errors = errors.mean(axis=tuple(range(1, errors.ndim)))
        unc = unc.mean(axis=tuple(range(1, unc.ndim)))
    errors = errors.ravel()
    unc = unc.ravel()
    mask = np.isfinite(errors) & np.isfinite(unc)
    empty = {
        "bin_confidence": [], "bin_accuracy": [], "bin_count": [], "ece": 1.0
    }
    if mask.sum() < n_bins:
        return empty
    errors, unc = errors[mask], unc[mask]
    edges = np.quantile(unc, np.linspace(0, 1, n_bins + 1))
    edges[0] = 0.0
    edges[-1] = unc.max() + 1e-6
    ece = 0.0
    total = len(errors)
    bin_conf, bin_acc, bin_count = [], [], []
    for i in range(n_bins):
        sel = (unc >= edges[i]) & (unc < edges[i + 1])
        if sel.sum() == 0:
            continue
        avg_conf = 1.0 - unc[sel].mean()
        avg_acc = 1.0 - errors[sel].mean()
        ece += (sel.sum() / total) * abs(avg_conf - avg_acc)
        bin_conf.append(float(avg_conf))
        bin_acc.append(float(avg_acc))
        bin_count.append(int(sel.sum()))
    return {
        "bin_confidence": bin_conf,
        "bin_accuracy": bin_acc,
        "bin_count": bin_count,
        "ece": float(ece),
    }


def ece_np(
    predictions: np.ndarray,
    targets: np.ndarray,
    uncertainties: np.ndarray,
    n_bins: int = 10,
) -> float:
    """Numpy twin of uncertainty_calibration_error (same binning/values)."""
    return reliability_np(predictions, targets, uncertainties, n_bins)["ece"]


def evaluate_predictions(
    predictions: np.ndarray,
    targets: np.ndarray,
    uncertainties: Optional[np.ndarray] = None,
    dim_names: tuple[str, ...] = ("valence", "arousal", "dominance"),
) -> dict[str, float]:
    """Full per-dimension metric bundle (reference metrics.py:137-188).

    Host-facing convenience: accepts numpy, returns plain floats. Pure numpy
    (no device dispatch) — values match the jnp implementations (tested).
    """
    predictions = np.asarray(predictions)
    targets = np.asarray(targets)
    if predictions.ndim == 1:
        predictions = predictions[:, None]
        targets = targets[:, None]

    results: dict[str, float] = {}
    cccs, maes, rmses = [], [], []
    for i, name in enumerate(dim_names[: predictions.shape[1]]):
        t, p = targets[:, i], predictions[:, i]
        valid = np.isfinite(t) & np.isfinite(p)
        err = np.abs(t[valid] - p[valid])
        ccc = ccc_np(t, p)
        mae = float(err.mean()) if err.size else float("inf")
        rmse = float(np.sqrt((err**2).mean())) if err.size else float("inf")
        results[f"ccc_{name}"] = ccc
        results[f"mae_{name}"] = mae
        results[f"rmse_{name}"] = rmse
        cccs.append(ccc)
        maes.append(mae)
        rmses.append(rmse)
    results["ccc_average"] = float(np.mean(cccs))
    results["mae_average"] = float(np.mean(maes))
    results["rmse_average"] = float(np.mean(rmses))

    if uncertainties is not None:
        results["ece"] = ece_np(predictions, targets, uncertainties)
        # Uncertainty-error correlation (reference evaluation.py:407-425).
        err = np.abs(predictions - targets).mean(axis=1)
        unc = np.asarray(uncertainties)
        if unc.ndim > 1:
            unc = unc.mean(axis=1)
        results["uncertainty_error_correlation"] = pearson_np(err, unc)
    return results


def statistical_significance_test(
    predictions1: np.ndarray,
    targets: np.ndarray,
    predictions2: np.ndarray,
    alpha: float = 0.05,
) -> dict[str, float]:
    """Paired t-test + Cohen's d between two models' absolute errors.

    Behavior of reference metrics.py:282-327. Host-side (scipy).
    """
    from scipy import stats as sp_stats

    errors1 = np.abs(np.asarray(predictions1) - np.asarray(targets))
    errors2 = np.abs(np.asarray(predictions2) - np.asarray(targets))
    if errors1.ndim > 1:
        errors1 = errors1.mean(axis=1)
        errors2 = errors2.mean(axis=1)

    t_stat, p_value = sp_stats.ttest_rel(errors1, errors2)
    pooled_std = np.sqrt((np.var(errors1) + np.var(errors2)) / 2.0)
    cohens_d = float(
        (np.mean(errors1) - np.mean(errors2)) / pooled_std if pooled_std > 0 else 0.0
    )
    effect = "small"
    if abs(cohens_d) > 0.5:
        effect = "medium"
    if abs(cohens_d) > 0.8:
        effect = "large"
    return {
        "t_statistic": float(t_stat),
        "p_value": float(p_value),
        "cohens_d": cohens_d,
        "effect_size": effect,
        "significant": bool(p_value < alpha),
        "alpha": alpha,
    }


def cross_dataset_transfer_effectiveness(
    source_performance: float, target_performance: float
) -> float:
    """target/source performance ratio clamped to [0, 1].

    Behavior of reference metrics.py:330-346 — but in this framework it is
    fed *real* transfer evaluations, not random placeholders.
    """
    if source_performance <= 0:
        return 0.0
    return max(0.0, min(1.0, target_performance / source_performance))
