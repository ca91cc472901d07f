"""DEER prediction heads and uncertainty calibration.

Behavioral parity:
  * DEERPredictionHead          — complete_project.py:369-417 (per-dim 3-layer
    evidence MLP → NIG params) and deer.py:30-108 (DEERLayer)
  * MultiDimensionalDEER        — deer.py:198-266 (shared feature processor +
    per-dim heads)
  * UncertaintyCalibrationLayer — complete_project.py:420-459 (learned per-dim
    temperature + shared MLP-sigmoid map; the per-dim Python loop of the
    reference is vectorized into one batched pass here)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_deer.core.nig import nig_params_from_evidence, nig_uncertainties
from tpu_deer.models.layers import MLP

Dtype = Any


class DEERPredictionHead(nn.Module):
    """Evidence network for one emotion dimension → NIG params + uncertainties."""

    hidden_dim: int = 256
    dropout: float = 0.3
    output_dim: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        evidence = MLP(
            [self.hidden_dim, self.hidden_dim // 2, 4 * self.output_dim],
            dropout=self.dropout,
            dtype=self.dtype,
            name="evidence_network",
        )(x, deterministic=deterministic)
        # Cast up for the constrained params: NIG math is precision-sensitive.
        evidence = evidence.astype(jnp.float32).reshape(
            evidence.shape[:-1] + (self.output_dim, 4)
        )
        params = nig_params_from_evidence(evidence)
        unc = nig_uncertainties(params)
        return {
            "params": params,
            "mu": params.mu,
            "nu": params.nu,
            "alpha": params.alpha,
            "beta": params.beta,
            "aleatoric_uncertainty": unc["aleatoric"],
            "epistemic_uncertainty": unc["epistemic"],
            "uncertainty": unc["total"],
        }


class MultiDimensionalDEER(nn.Module):
    """Shared 2-layer feature processor + one DEER head per emotion dim
    (deer.py:198-266)."""

    input_dim: int
    hidden_dim: int = 256
    dim_names: Sequence[str] = ("valence", "arousal", "dominance")
    dropout: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = MLP(
            [self.hidden_dim, self.hidden_dim],
            dropout=self.dropout,
            final_activation="relu",
            dtype=self.dtype,
            name="feature_processor",
        )(x, deterministic=deterministic)

        out: dict = {}
        mus, totals = [], []
        for name in self.dim_names:
            head = DEERPredictionHead(
                self.hidden_dim, self.dropout, dtype=self.dtype, name=f"head_{name}"
            )(h, deterministic=deterministic)
            for k, v in head.items():
                if k != "params":
                    out[f"{name}_{k}"] = v
            out[f"{name}_params"] = head["params"]
            mus.append(head["mu"])
            totals.append(head["uncertainty"])
        out["mu_all"] = jnp.concatenate(mus, axis=-1)
        out["uncertainty_all"] = jnp.concatenate(totals, axis=-1)
        return out


class UncertaintyCalibrationLayer(nn.Module):
    """Learned temperature + shared monotone MLP-sigmoid calibration map.

    The reference loops over dims calling a shared 1→32→16→1 net
    (complete_project.py:439-459); here all dims go through in one batched
    pass ([B, D] → [B*D, 1] → [B, D]).

    Two hardening changes over the reference (which defines but never trains
    this layer, so its pathologies go unobserved there):
      * the per-dim temperature is positive by construction (softplus) — an
        unconstrained temperature trained via the alignment loss could go
        negative, flipping the sign of the map's input and thereby the
        RANKING of calibrated uncertainty (observed in round-2 sweeps:
        r(calibrated) == -r(raw));
      * the scalar map is monotone nondecreasing by construction (non-negative
        kernels via abs, monotone activations), so calibration can only
        rescale uncertainty, never invert its ordering;
      * the input is stop-gradiented: calibration is post-hoc and must not
        push the evidence heads around through the alignment loss.

    Checkpoint compatibility: this rewrite changed the parameter tree
    (nn.Dense "cal1/kernel" -> flat "cal1_kernel", and "temperature" is now
    the PRE-softplus value). Checkpoints saved before 2026-08-17 restore
    with a tree-structure error rather than silently misbehaving.
    """

    num_dimensions: int = 3
    dtype: Dtype = jnp.float32

    def _monotone_dense(self, name, x, features):
        kernel = self.param(
            name + "_kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], features), self.dtype,
        )
        bias = self.param(name + "_bias", nn.initializers.zeros, (features,),
                          self.dtype)
        return x @ jnp.abs(kernel) + bias

    @nn.compact
    def __call__(self, uncertainties):
        uncertainties = jax.lax.stop_gradient(uncertainties)
        raw_t = self.param(
            "temperature",
            nn.initializers.constant(0.5413248),  # softplus(0.5413) = 1.0
            (self.num_dimensions,),
        )
        temperature = jax.nn.softplus(raw_t) + 1e-3
        scaled = uncertainties / temperature[None, :]
        b, d = scaled.shape
        flat = scaled.reshape(b * d, 1)
        h = nn.relu(self._monotone_dense("cal1", flat, 32))
        h = nn.relu(self._monotone_dense("cal2", h, 16))
        cal = nn.sigmoid(self._monotone_dense("cal3", h, 1))
        return cal.reshape(b, d)
