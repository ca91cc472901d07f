"""Normal-Inverse-Gamma (NIG) evidential distribution math.

Pure-jnp, shape-polymorphic, fully jittable. This is the numerical core of
DEER (Deep Evidential Emotion Regression): a network head emits 4 raw
"evidence" logits per regression target, which parameterize an NIG
distribution NIG(mu, nu, alpha, beta) over the (mean, variance) of a
Gaussian predictive distribution.

Capability parity with the reference (formulas re-derived, not copied):
  * parameter constraints        — reference src/models/deer.py:90-98
  * uncertainty decomposition    — reference src/models/deer.py:96-98
  * NIG NLL (v1, deer.py form)   — reference src/models/deer.py:150-158
  * NIG NLL (v2, losses.py form) — reference src/utils/losses.py:132-153
  * evidence regularizers        — reference src/models/deer.py:161-163 and
                                   src/utils/losses.py:155-169
  * KL regularizers              — reference src/models/deer.py:183-195 and
                                   src/utils/losses.py:171-185

The two NLL/regularizer variants exist because the reference ships two
independent loss implementations with different math; both are provided so
either training recipe can be reproduced. The v1 NLL is the standard
Amini et al. (2020) "Deep Evidential Regression" marginal t-distribution NLL
up to an additive constant.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-8


class NIGParams(NamedTuple):
    """NIG parameters; each leaf has identical shape [..., output_dim].

    mu:    predicted mean (gamma in some papers)
    nu:    virtual observation count for the mean (> 0)
    alpha: inverse-gamma shape (> 1 so the variance mean beta/(alpha-1) exists)
    beta:  inverse-gamma rate (> 0)
    """

    mu: jax.Array
    nu: jax.Array
    alpha: jax.Array
    beta: jax.Array


def nig_params_from_evidence(evidence: jax.Array) -> NIGParams:
    """Map raw network outputs [..., 4*D] or [..., D, 4] to constrained NIG params.

    Constraints match reference deer.py:90-98: nu = softplus + 1e-6,
    alpha = softplus + 1, beta = softplus + 1e-6; mu unconstrained.
    """
    if evidence.shape[-1] % 4 == 0 and evidence.ndim >= 1 and evidence.shape[-1] != 4:
        # [..., 4*D] layout -> [..., D, 4]
        d = evidence.shape[-1] // 4
        evidence = evidence.reshape(evidence.shape[:-1] + (d, 4))
    mu = evidence[..., 0]
    nu = jax.nn.softplus(evidence[..., 1]) + 1e-6
    alpha = jax.nn.softplus(evidence[..., 2]) + 1.0
    beta = jax.nn.softplus(evidence[..., 3]) + 1e-6
    return NIGParams(mu=mu, nu=nu, alpha=alpha, beta=beta)


def nig_uncertainties(p: NIGParams) -> dict[str, jax.Array]:
    """Aleatoric / epistemic / total uncertainty decomposition.

    aleatoric  = E[sigma^2]        = beta / (alpha - 1)
    epistemic  = Var[mu]           = beta / (nu * (alpha - 1))
    (reference deer.py:96-98; alpha > 1 is guaranteed by the +1.0 constraint,
    the epsilon guards the limit alpha -> 1+.)
    """
    denom = jnp.maximum(p.alpha - 1.0, EPS)
    aleatoric = p.beta / denom
    epistemic = p.beta / (p.nu * denom)
    return {
        "aleatoric": aleatoric,
        "epistemic": epistemic,
        "total": aleatoric + epistemic,
    }


def nig_nll(p: NIGParams, targets: jax.Array) -> jax.Array:
    """NIG negative log-likelihood, v1 form (reference deer.py:150-158).

    nll = 0.5*log(pi/nu) - alpha*log(2*beta) + lgamma(alpha)
          - lgamma(alpha + 0.5) + (alpha + 0.5)*log(beta + nu*(y-mu)^2/2)

    Elementwise; reduce with mean outside. Note this is not the exact Amini
    et al. NIG marginal (the reference drops the (1+nu) factors); it equals
    StudentT_NLL(df=2*alpha, loc=mu, scale^2=beta/(nu*alpha)) - (alpha+0.5)*ln 2
    (verified against scipy in tests/test_nig.py).
    """
    sq_err = jnp.square(targets - p.mu)
    return (
        0.5 * jnp.log(jnp.pi / p.nu)
        - p.alpha * jnp.log(2.0 * p.beta)
        + jax.lax.lgamma(p.alpha)
        - jax.lax.lgamma(p.alpha + 0.5)
        + (p.alpha + 0.5) * jnp.log(p.beta + 0.5 * p.nu * sq_err)
    )


def nig_nll_v2(p: NIGParams, targets: jax.Array, eps: float = 1e-6) -> jax.Array:
    """NIG NLL, v2 form (reference losses.py:132-153).

    -log p = -0.5*log(nu/(2*pi)) - alpha*log(beta) + lgamma(alpha)
             + (alpha + 0.5)*log(beta + 0.5*nu*(y-mu)^2)

    Note: the reference adds `eps` inside several logs (and, faithfully
    reproduced here, adds it to 2*pi); differences from v1 are the
    lgamma(alpha+0.5) term and log(2 beta) vs log(beta) arrangement — both
    shift the optimum, so each variant is kept behind its own function.
    """
    err2 = jnp.square(targets - p.mu)
    log_prob = (
        0.5 * jnp.log(p.nu / (2.0 * math.pi + eps))
        + p.alpha * jnp.log(p.beta + eps)
        - jax.lax.lgamma(p.alpha + eps)
        - (p.alpha + 0.5) * jnp.log(p.beta + 0.5 * p.nu * err2 + eps)
    )
    return -log_prob


def evidence_regularizer(p: NIGParams, targets: jax.Array) -> jax.Array:
    """Evidence regularizer, v1 form (reference deer.py:161-163).

    reg = (nu*(y-mu)^2 + 2*beta*(1+nu)) / (2*nu*(1+nu))

    This is the expected squared error under the posterior predictive —
    penalizes confident (high-nu) wrong predictions.
    """
    sq_err = jnp.square(targets - p.mu)
    return (p.nu * sq_err + 2.0 * p.beta * (1.0 + p.nu)) / (2.0 * p.nu * (1.0 + p.nu))


def evidence_regularizer_v2(p: NIGParams, targets: jax.Array) -> jax.Array:
    """Evidence regularizer, v2 form (reference losses.py:155-169).

    reg = (y-mu)^2 * (2*beta + nu*(y-mu)^2)
    """
    err2 = jnp.square(targets - p.mu)
    return err2 * (2.0 * p.beta + p.nu * err2)


def kl_regularizer(p: NIGParams) -> jax.Array:
    """KL-style regularizer, v1 form (reference deer.py:183-195), clamped >= 0.

    kl = 0.5*(nu-1) + alpha*log(beta) - lgamma(alpha) + lgamma(alpha+0.5)
         - 0.5*log(2*pi*beta), clamped at 0.
    """
    kl = (
        0.5 * (p.nu - 1.0)
        + p.alpha * jnp.log(p.beta)
        - jax.lax.lgamma(p.alpha)
        + jax.lax.lgamma(p.alpha + 0.5)
        - 0.5 * jnp.log(2.0 * jnp.pi * p.beta)
    )
    return jnp.maximum(kl, 0.0)


def kl_regularizer_v2(p: NIGParams, eps: float = 1e-6) -> jax.Array:
    """KL-style regularizer, v2 form (reference losses.py:171-185).

    Pulls alpha toward 1 and log(beta) toward 0:
    kl = (alpha-1)^2 + 0.1*(log(beta) - log(1))^2, elementwise.
    """
    kl_alpha = jnp.square(p.alpha - 1.0)
    kl_beta = jnp.square(jnp.log(p.beta + eps))
    return kl_alpha + 0.1 * kl_beta


def nig_expected_abs_error(p: NIGParams) -> jax.Array:
    """Closed-form E|y - mu| under the NIG's Student-t posterior predictive.

    The marginal over y is St(mu, s^2, df) with df = 2*alpha and
    s^2 = beta*(1+nu)/(nu*alpha). The mean absolute deviation of a standard
    Student-t with df > 1 is

        E|T_df| = 2*sqrt(df)*Gamma((df+1)/2) / (sqrt(pi)*(df-1)*Gamma(df/2))

    so E|y - mu| = s * E|T_df|. This is the statistically correct "predicted
    absolute error" channel for quantile-bin ECE (metrics.py compares mean
    uncertainty against mean |err| per bin — a quantity in |error| units,
    not variance units). Unlike the moment decomposition E[sigma^2] =
    beta/(alpha-1) (reference src/models/deer.py:96-98), whose 1/(alpha-1)
    diverges as the v2 KL regularizer pulls alpha toward 1, the t-marginal
    scale divides by alpha, so this channel stays finite and well-scaled for
    every reachable parameter value (df = 2*alpha > 2 by construction).
    Diagnosed in experiments/nig_calibration_study.py.
    """
    df = 2.0 * p.alpha
    scale = jnp.sqrt(p.beta * (1.0 + p.nu) / (p.nu * p.alpha))
    log_mad = (
        0.5 * jnp.log(df)
        + jax.lax.lgamma(0.5 * (df + 1.0))
        - jax.lax.lgamma(0.5 * df)
        - jnp.log(df - 1.0)
    )
    mad_std_t = 2.0 / math.sqrt(math.pi) * jnp.exp(log_mad)
    return scale * mad_std_t


def nig_predictive_interval(
    p: NIGParams, coverage: float = 0.95
) -> tuple[jax.Array, jax.Array]:
    """Symmetric predictive interval from the Student-t marginal.

    The NIG marginal over y is St(mu, beta*(1+nu)/(nu*alpha), 2*alpha).
    Uses a normal approximation to the t quantile for TPU friendliness
    (exact enough for alpha buffered above 1; used for reporting only).
    """
    df = 2.0 * p.alpha
    scale2 = p.beta * (1.0 + p.nu) / (p.nu * p.alpha)
    # Variance of t with df>2 is df/(df-2) * scale^2
    var = jnp.where(df > 2.0, df / jnp.maximum(df - 2.0, EPS) * scale2, scale2 * 10.0)
    std = jnp.sqrt(var)
    # Normal quantile for the requested two-sided coverage.
    z = math.sqrt(2.0) * _erfinv_scalar(coverage)
    return p.mu - z * std, p.mu + z * std


def _erfinv_scalar(x: float) -> float:
    """Host-side inverse error function for a static coverage constant."""
    # Winitzki approximation — plenty for reporting intervals.
    a = 0.147
    ln1mx2 = math.log(1.0 - x * x)
    term = 2.0 / (math.pi * a) + ln1mx2 / 2.0
    return math.copysign(math.sqrt(math.sqrt(term * term - ln1mx2 / a) - term), x)
