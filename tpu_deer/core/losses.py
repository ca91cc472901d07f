"""DEER loss functions — pure jnp, fully jittable, TPU-friendly.

Capability parity with reference `src/utils/losses.py` and
`src/models/deer.py` (re-derived; binning is done with vectorized masks
instead of boolean indexing so everything stays static-shaped for XLA):

  * deer_loss                       — losses.py:40-226 / deer.py:111-195
  * binned_ece_loss                 — losses.py:187-226
  * multi_task_deer_loss            — losses.py:229-348
  * uncertainty_regularization_loss — losses.py:351-416
  * calibration_loss                — losses.py:419-497
  * combined_deer_loss              — losses.py:500-577
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from tpu_deer.core import nig as nig_lib
from tpu_deer.core.nig import NIGParams

EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class DEERLossConfig:
    """Static configuration for the DEER loss (hashable; safe as a jit static arg).

    variant "v1" follows reference deer.py:111-195 (NLL + evidence reg + KL,
    weights evidence/kl); variant "v2" follows losses.py:40-226 (NLL + reg +
    KL-to-prior + differentiable binned ECE).
    """

    variant: str = "v2"
    evidence_weight: float = 1.0  # v1 weight (deer.py ctor default 1.0)
    kl_weight: float = 1.0  # v1 weight
    reg_weight: float = 0.1  # v2 weight (losses.py defaults)
    kl_weight_v2: float = 0.01
    ece_weight: float = 0.05
    ece_bins: int = 10


def binned_ece_loss(
    p: NIGParams, targets: jax.Array, n_bins: int = 10
) -> jax.Array:
    """Differentiable binned expected-calibration-error loss.

    Behavior of reference losses.py:187-226: confidence = 1/(1+u) with
    u = beta/(alpha-1); accuracy = 1 - |err|; uniform bins over (0, 1];
    ECE = sum_b w_b * |conf_b - acc_b|. Vectorized with one-hot bin masks
    (static shapes — no boolean indexing).
    """
    errors = jnp.abs(targets - p.mu).reshape(-1)
    uncertainty = p.beta / (p.alpha - 1.0 + EPS)
    confidence = (1.0 / (1.0 + uncertainty)).reshape(-1)

    edges = jnp.linspace(0.0, 1.0, n_bins + 1)
    # in_bin[b, i]: edges[b] < conf[i] <= edges[b+1]
    in_bin = (confidence[None, :] > edges[:-1, None]) & (
        confidence[None, :] <= edges[1:, None]
    )
    in_bin = in_bin.astype(confidence.dtype)
    counts = in_bin.sum(axis=1)
    safe = jnp.maximum(counts, 1.0)
    avg_conf = (in_bin * confidence[None, :]).sum(axis=1) / safe
    avg_acc = 1.0 - (in_bin * errors[None, :]).sum(axis=1) / safe
    weights = counts / confidence.shape[0]
    per_bin = jnp.where(counts > 0, jnp.abs(avg_conf - avg_acc), 0.0)
    return jnp.sum(weights * per_bin)


def deer_loss(
    p: NIGParams,
    targets: jax.Array,
    config: DEERLossConfig = DEERLossConfig(),
) -> dict[str, jax.Array]:
    """Single-head DEER loss. Returns a dict of scalar loss components."""
    targets = jnp.broadcast_to(targets.reshape(targets.shape[0], -1), p.mu.shape)
    sq_err = jnp.square(targets - p.mu)
    out: dict[str, jax.Array] = {"mse": jnp.mean(sq_err)}

    if config.variant == "v1":
        nll = jnp.mean(nig_lib.nig_nll(p, targets))
        reg = jnp.mean(nig_lib.evidence_regularizer(p, targets))
        kl = jnp.mean(nig_lib.kl_regularizer(p))
        total = nll + config.evidence_weight * reg + config.kl_weight * kl
        out.update(nll_loss=nll, evidence_reg=reg, kl_reg=kl, total_loss=total)
    elif config.variant == "v2":
        nll = jnp.mean(nig_lib.nig_nll_v2(p, targets))
        reg = jnp.mean(nig_lib.evidence_regularizer_v2(p, targets))
        kl = jnp.mean(nig_lib.kl_regularizer_v2(p))
        ece = binned_ece_loss(p, targets, config.ece_bins)
        total = (
            nll
            + config.reg_weight * reg
            + config.kl_weight_v2 * kl
            + config.ece_weight * ece
        )
        out.update(
            nll_loss=nll, reg_loss=reg, kl_loss=kl, ece_loss=ece, total_loss=total
        )
    else:
        raise ValueError(f"unknown DEER loss variant: {config.variant!r}")
    return out


def multi_task_deer_loss(
    params_per_dim: Sequence[NIGParams],
    targets: jax.Array,
    config: DEERLossConfig = DEERLossConfig(),
    task_weights: Optional[Sequence[float]] = None,
    cross_dim_weight: float = 0.05,
    dim_names: Sequence[str] = ("valence", "arousal", "dominance"),
) -> dict[str, jax.Array]:
    """Multi-task (VAD) DEER loss with cross-dimensional consistency.

    Behavior of reference losses.py:229-348: per-dim weighted DEER loss
    averaged over dims, plus pairwise MSE between batch-mean uncertainties of
    each dimension pair (encourages consistent uncertainty scales across
    correlated emotion dims).
    """
    n = len(params_per_dim)
    if task_weights is None:
        task_weights = [1.0] * n
    out: dict[str, jax.Array] = {}
    total = jnp.asarray(0.0)
    for i, (p, name) in enumerate(zip(params_per_dim, dim_names)):
        dim_losses = deer_loss(p, targets[:, i : i + 1], config)
        total = total + task_weights[i] * dim_losses["total_loss"]
        for k, v in dim_losses.items():
            out[f"{name}_{k}"] = v

    if cross_dim_weight > 0 and n > 1:
        mean_unc = [
            jnp.mean(p.beta / (p.alpha - 1.0 + EPS), axis=0) for p in params_per_dim
        ]
        consistency = jnp.asarray(0.0)
        n_pairs = 0
        for i in range(n):
            for j in range(i + 1, n):
                consistency = consistency + jnp.mean(
                    jnp.square(mean_unc[i] - mean_unc[j])
                )
                n_pairs += 1
        consistency = consistency / n_pairs
        total = total + cross_dim_weight * consistency
        out["cross_dim_loss"] = consistency

    out["total_loss"] = total / n
    return out


def uncertainty_regularization_loss(
    p: NIGParams,
    diversity_weight: float = 0.1,
    sparsity_weight: float = 0.01,
) -> dict[str, jax.Array]:
    """Diversity (-log batch variance of u) + sparsity (mean u) regularizers.

    Behavior of reference losses.py:351-416.
    """
    uncertainty = p.beta / (p.alpha - 1.0 + EPS)
    diversity = -jnp.log(jnp.mean(jnp.var(uncertainty, axis=0)) + EPS)
    sparsity = jnp.mean(uncertainty)
    return {
        "reg_loss": diversity_weight * diversity + sparsity_weight * sparsity,
        "diversity_loss": diversity,
        "sparsity_loss": sparsity,
    }


def calibration_loss(
    p: NIGParams,
    targets: jax.Array,
    n_bins: int = 15,
    bin_strategy: str = "uniform",
    max_error: float = 2.0,
) -> jax.Array:
    """Reliability-diagram calibration loss (reference losses.py:419-497).

    accuracy = 1 - clip(|err|/max_error, 0, 1); confidence = 1/(1+u).
    Bins are uniform over [0,1] or confidence quantiles.
    """
    targets = jnp.broadcast_to(targets.reshape(targets.shape[0], -1), p.mu.shape)
    errors = jnp.abs(targets - p.mu).reshape(-1)
    uncertainty = p.beta / (p.alpha - 1.0 + EPS)
    confidence = (1.0 / (1.0 + uncertainty)).reshape(-1)
    accuracy = 1.0 - jnp.clip(errors / max_error, 0.0, 1.0)

    if bin_strategy == "uniform":
        edges = jnp.linspace(0.0, 1.0, n_bins + 1)
    else:
        edges = jnp.quantile(confidence, jnp.linspace(0.0, 1.0, n_bins + 1))

    lower = confidence[None, :] >= edges[:-1, None]
    upper = confidence[None, :] < edges[1:, None]
    # Last bin includes its upper boundary.
    last_inclusive = jnp.arange(n_bins)[:, None] == n_bins - 1
    upper = jnp.where(last_inclusive, confidence[None, :] <= edges[1:, None], upper)
    in_bin = (lower & upper).astype(confidence.dtype)

    counts = in_bin.sum(axis=1)
    safe = jnp.maximum(counts, 1.0)
    avg_conf = (in_bin * confidence[None, :]).sum(axis=1) / safe
    avg_acc = (in_bin * accuracy[None, :]).sum(axis=1) / safe
    weights = counts / confidence.shape[0]
    per_bin = jnp.where(counts > 0, jnp.abs(avg_conf - avg_acc), 0.0)
    return jnp.sum(weights * per_bin)


def combined_deer_loss(
    params_per_dim: Sequence[NIGParams],
    targets: jax.Array,
    config: DEERLossConfig = DEERLossConfig(),
    task_weights: Optional[Sequence[float]] = None,
    cross_dim_weight: float = 0.05,
    uncertainty_reg_weight: float = 1.0,
    calibration_weight: float = 0.1,
) -> dict[str, jax.Array]:
    """The complete production loss (reference losses.py:500-577):

    multi-task DEER + uncertainty regularization + 0.1 * calibration loss.
    """
    out = multi_task_deer_loss(
        params_per_dim, targets, config, task_weights, cross_dim_weight
    )
    total = out["total_loss"]

    stacked = NIGParams(
        mu=jnp.concatenate([p.mu for p in params_per_dim], axis=-1),
        nu=jnp.concatenate([p.nu for p in params_per_dim], axis=-1),
        alpha=jnp.concatenate([p.alpha for p in params_per_dim], axis=-1),
        beta=jnp.concatenate([p.beta for p in params_per_dim], axis=-1),
    )
    unc_reg = uncertainty_regularization_loss(stacked)
    out["uncertainty_reg_loss"] = unc_reg["reg_loss"]
    total = total + uncertainty_reg_weight * unc_reg["reg_loss"]

    cal = calibration_loss(stacked, targets)
    out["calibration_loss"] = cal
    total = total + calibration_weight * cal

    out["total_loss"] = total
    return out
