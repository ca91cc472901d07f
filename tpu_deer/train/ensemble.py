"""Deep-ensemble training via vmap — K models train in ONE XLA program.

Capability beyond the reference, which ships exactly one uncertainty
estimator (the NIG evidential head, reference src/models/deer.py:30-108)
yet motivates it against "ensemble methods" in its module docstring
(src/models/deer.py:1-20). This module provides that baseline, built the
TPU way: member parameters are STACKED on a leading axis, the per-member
loss-and-grad is vmapped over the stack, and one elementwise optimizer
updates the whole stacked tree. The entire K-member train step compiles to
a single XLA program whose matmuls are K-times batched (MXU-friendly: the
flagship's [B, in]x[in, out] GEMMs become [K, B, in]x[K, in, out] batched
GEMMs with no extra dispatches), and per-member gradients never interact —
a K-member run reproduces K independent single-model runs to float32
accumulation-order tolerance (rtol 2e-5; batched GEMMs tile differently
than single-model ones — pinned by tests/test_ensemble.py).

Scaling: the member axis is embarrassingly parallel. With
TrainingConfig(param_sharding="ensemble") under a ('data','model') mesh the
stack is sharded over 'model' (parallel/mesh.py:ensemble_sharding_rules),
so K members train on K devices with zero cross-member collectives while
the batch still shards over 'data'.

Member independence is enforced in three places:
  * gradients: the differentiated total is the SUM of member losses, so
    d(total)/d(params_k) is exactly member k's own gradient;
  * clipping: the global-norm clip runs per member (vmapped), not over the
    stacked tree (whose joint norm is ~sqrt(K) larger and would couple
    members);
  * randomness: each member draws its own dropout key per step. (Exact
    bitwise equality with K separate runs holds under
    rng_impl="threefry2x32", whose streams are vmap-invariant; the default
    "rbg" hardware PRNG draws different — still deterministic — mask bits
    under vmap, a documented JAX property of the rbg implementations.)

Ensemble prediction combines members by moment matching (Lakshminarayanan
et al., 2017, adapted to NIG members): mu = mean of member means;
aleatoric = mean of member aleatoric variances; epistemic = mean of member
(NIG) epistemic variances + variance of member means (the cross-member
disagreement — the term a single evidential model cannot express).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from tpu_deer.models.deer_model import (
    CompleteDEERModel,
    DEERModelConfig,
)
from tpu_deer.train.trainer import DEERTrainer, TrainingConfig


def create_deer_ensemble(
    config: DEERModelConfig | None = None,
    n_members: int = 4,
    seed: int = 0,
) -> tuple[CompleteDEERModel, Any]:
    """Build the flagship module + a stacked K-member parameter tree.

    Members differ by their init keys (fold of `seed` and the member index);
    the stack is materialized by vmapping `model.init`, so one compiled
    program initializes all members.
    """
    if n_members < 1:
        raise ValueError(f"n_members must be >= 1, got {n_members}")
    config = config or DEERModelConfig()
    model = CompleteDEERModel(config)
    dummy = (
        jnp.zeros((2, config.audio_dim)),
        jnp.zeros((2, config.video_dim)),
        jnp.zeros((2, config.text_dim)),
    )
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
        jax.random.PRNGKey(seed), jnp.arange(n_members)
    )
    init_one = lambda key: model.init(key, *dummy, deterministic=True)["params"]
    params = jax.jit(jax.vmap(init_one))(keys)
    return model, params


def _per_member_clip(max_norm: float) -> optax.GradientTransformation:
    """optax.clip_by_global_norm applied independently to each member slice
    of a stacked gradient tree (same trigger semantics as optax's)."""

    def update_fn(updates, state, params=None):
        del params

        def clip_one(g):
            norm = optax.global_norm(g)
            # trigger semantics match optax.clip_by_global_norm: scale only
            # when the norm exceeds the threshold (norm==0 hits the 1.0 arm).
            scale = jnp.where(norm < max_norm, 1.0, max_norm / (norm + 1e-12))
            return jax.tree_util.tree_map(lambda x: x * scale, g)

        return jax.vmap(clip_one)(updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


class EnsembleTrainer(DEERTrainer):
    """DEERTrainer over a stacked K-member parameter tree.

    Everything else — schedulers, curriculum sampling, device-resident
    staging, fused epochs, checkpointing (the stacked tree serializes like
    any pytree), EMA, non-finite containment — is inherited unchanged: the
    stack has the same tree STRUCTURE as a single model, only the leaves
    carry a leading member axis.

    Eval-side outputs (`predict`, `validate_epoch`) are the combined
    ensemble prediction in single-model shapes, so evaluators, calibration
    fitting, and conformal intervals work on an ensemble transparently.

    Caveats (documented, deliberate): the reported train `grad_norm` is the
    joint norm over all members (monitoring only — clipping is per-member);
    `skip_nonfinite_updates` gates the whole stacked step, so one member's
    NaN skips the step for all K (containment is about surviving poisoned
    batches, which hit every member anyway); and the host-side lr
    controllers (spike backoff, plateau) watch the member-MEAN train loss /
    combined val CCC, so they scale every member's lr together.
    """

    def __init__(
        self,
        model: CompleteDEERModel,
        stacked_params,
        config: TrainingConfig = TrainingConfig(),
        steps_per_epoch: int = 100,
        mesh=None,
        runtime=None,
    ):
        leaves = jax.tree_util.tree_leaves(stacked_params)
        if not leaves:
            raise ValueError("empty parameter tree")
        self.n_members = int(leaves[0].shape[0])
        mismatched = [l.shape for l in leaves if l.shape[0] != self.n_members]
        if mismatched:
            raise ValueError(
                "stacked params must share a leading member axis; got "
                f"leading sizes {{{self.n_members}, {mismatched[0][0]}}} — "
                "build the stack with create_deer_ensemble()"
            )
        super().__init__(
            model, stacked_params, config,
            steps_per_epoch=steps_per_epoch, mesh=mesh, runtime=runtime,
        )

    # -- training ----------------------------------------------------------
    def _clip_transform(self) -> optax.GradientTransformation:
        return _per_member_clip(self.config.gradient_clip)

    def _loss_fn(self, params, batch, dropout_rng, dataset_weight):
        member_rngs = jax.random.split(dropout_rng, self.n_members)
        losses, auxes = jax.vmap(
            super()._loss_fn, in_axes=(0, None, 0, None)
        )(params, batch, member_rngs, dataset_weight)
        # SUM keeps d(total)/d(params_k) == member k's own gradient (a mean
        # would shrink every member's effective gradient by 1/K); the
        # monitored loss is the member mean.
        total = jnp.sum(losses)
        aux = {k: jnp.mean(v, axis=0) for k, v in auxes.items()}
        aux["loss"] = jnp.mean(losses)
        return total, aux

    # -- ensemble prediction -------------------------------------------------
    def _eval_step_impl(self, params, batch):
        member = jax.vmap(
            super()._eval_step_impl, in_axes=(0, None)
        )(params, batch)
        mu = jnp.mean(member["mu"], axis=0)
        aleatoric = jnp.mean(member["aleatoric"], axis=0)
        # Within-member epistemic (NIG) + cross-member disagreement.
        disagreement = jnp.var(member["mu"], axis=0)
        epistemic = jnp.mean(member["epistemic"], axis=0) + disagreement
        return {
            "mu": mu,
            "aleatoric": aleatoric,
            "epistemic": epistemic,
            "uncertainty": aleatoric + epistemic,
            # Per-member calibration layers each track their member's
            # |error|; their mean plus the disagreement keeps the calibrated
            # channel sensitive to what single members cannot see.
            "calibrated_uncertainty": (
                jnp.mean(member["calibrated_uncertainty"], axis=0) + disagreement
            ),
            # Variance-space combination of the member E|err| forecasts with
            # the disagreement scaled to |error| units (MADs don't add
            # linearly for independent spread — same formula as serve.py).
            "eabs": jnp.sqrt(
                jnp.mean(member["eabs"], axis=0) ** 2
                + 2.0 / jnp.pi * disagreement
            ),
            "loss": jnp.mean(member["loss"]),
        }

    def predict(self, dataset, batch_size=None, use_ema=False,
                return_fused=False, return_nig=False):
        """Combined-ensemble prediction (moment matching; includes the
        variance-space `eabs` channel). The raw-NIG and fused-feature
        variants are member-level concepts — refuse them loudly instead of
        the opaque TypeError the inherited jitted variants would raise."""
        if return_nig:
            raise NotImplementedError(
                "return_nig over a stacked ensemble is not defined — a "
                "mixture of K NIG posteriors is not NIG, so there are no "
                "combined (nu, alpha, beta) to return. Inspect one member "
                "via DEERTrainer(model, ensemble_trainer.member_params(k), "
                "...) .predict(return_nig=True); the combined closed-form "
                "E|err| channel is already in predict()'s 'eabs' key."
            )
        if return_fused:
            raise NotImplementedError(
                "return_fused over a stacked ensemble is ambiguous (fused "
                "features are per-member). Fit feature-space detectors on "
                "a single member (member_params(k)) or serve through "
                "serve.InferenceEngine(ensemble=True), which exposes the "
                "member-mean fused representation for OOD fitting."
            )
        return super().predict(
            dataset, batch_size=batch_size, use_ema=use_ema
        )

    def predict_mc_dropout(self, *args, **kwargs):
        raise NotImplementedError(
            "MC dropout over a stacked ensemble is not supported — the "
            "ensemble's cross-member disagreement already provides the "
            "sampling-based epistemic signal. Run predict_mc_dropout on a "
            "single member via DEERTrainer(model, member_params(k), ...)."
        )

    # -- member access -------------------------------------------------------
    def member_params(self, k: int):
        """Parameter tree of member `k` (e.g. to serve one member, or to
        export the stack member-by-member)."""
        if not 0 <= k < self.n_members:
            raise IndexError(f"member {k} out of range [0, {self.n_members})")
        return jax.tree_util.tree_map(lambda x: x[k], self.state.params)
