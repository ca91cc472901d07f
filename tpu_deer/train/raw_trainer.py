"""Raw-media trainer: waveform → Pallas front-end → sequence model, one
XLA program per step.

The reference's raw-media path extracts features in a per-sample Python/
librosa loop OUTSIDE the model (encoders.py:144-172) and never trains
end-to-end. Here the audio front-end (ops.audio_frontend — Pallas kernel on
TPU, fused XLA elsewhere) runs IN-GRAPH inside the jitted train step: the
step consumes raw signals [B, L], frames+featurizes them on the MXU, runs
the BiLSTM/CNN/transformer encoders, computes the evidential loss, and
applies AdamW — no host round trip between waveform and gradient.

Data is staged device-resident once; per-step host traffic is a [B] index
vector (same discipline as train.trainer.DEERTrainer).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpu_deer.core import losses as loss_lib
from tpu_deer.core import metrics as metrics_lib
from tpu_deer.models.hierarchical_deer import RawSequenceDEERModel
from tpu_deer.ops.audio_frontend import AudioFrontendConfig, audio_frame_features


@dataclasses.dataclass(frozen=True)
class RawTrainingConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    gradient_clip: float = 1.0
    batch_size: int = 16
    num_epochs: int = 20
    loss_variant: str = "v2"
    # None → Pallas on TPU, fused XLA elsewhere (ops.audio_frontend default).
    use_pallas_frontend: Optional[bool] = None
    frozen_prefixes: tuple = ()
    seed: int = 0


class RawSequenceTrainer:
    """End-to-end trainer for RawSequenceDEERModel on raw-media arrays.

    `splits` arrays (from data.raw_corpus.load_raw_corpus): signal [N, L],
    video_frames [N, T, H, W, 3], token_ids/token_mask [N, Tt], labels [N, 3].
    """

    def __init__(
        self,
        model: RawSequenceDEERModel,
        params,
        config: RawTrainingConfig = RawTrainingConfig(),
        frontend_config: AudioFrontendConfig = AudioFrontendConfig(),
    ):
        self.model = model
        self.config = config
        self.frontend_config = frontend_config
        from tpu_deer.train.trainer import _encoder_label_fn

        tx = optax.multi_transform(
            {
                "frozen": optax.set_to_zero(),
                "encoder": optax.adamw(
                    config.learning_rate, weight_decay=config.weight_decay
                ),
                "main": optax.adamw(
                    config.learning_rate, weight_decay=config.weight_decay
                ),
            },
            _encoder_label_fn(params, tuple(config.frozen_prefixes)),
        )
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.gradient_clip), tx
        )
        self.params = params
        self.opt_state = self.optimizer.init(params)
        self.rng = jax.random.PRNGKey(config.seed)
        self.history: dict[str, list] = {"train_loss": [], "val_ccc": []}
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0, 1))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._staged: dict[int, dict] = {}

    # -- in-graph front-end --------------------------------------------------
    def _frames(self, signals):
        """[B, L] raw signals → [B, T, 84] frame features, inside the graph."""
        cfg = self.frontend_config
        return jax.vmap(
            lambda s: audio_frame_features(
                s, cfg, use_pallas=self.config.use_pallas_frontend
            )
        )(signals)

    def _forward(self, params, batch, *, deterministic, rngs=None):
        audio_frames = self._frames(batch["signal"])
        return self.model.apply(
            {"params": params},
            audio_frames,
            batch["video_frames"],
            batch["token_ids"],
            batch["token_mask"],
            deterministic=deterministic,
            rngs=rngs,
        )

    # -- steps ---------------------------------------------------------------
    def _train_step_impl(self, params, opt_state, batch, rng):
        step_rng, next_rng = jax.random.split(rng)

        def loss_fn(p):
            out = self._forward(
                p, batch, deterministic=False, rngs={"dropout": step_rng}
            )
            ps = [out[f"{n}_params"] for n in self.model.dim_names]
            loss_out = loss_lib.multi_task_deer_loss(
                ps, batch["labels"],
                loss_lib.DEERLossConfig(variant=self.config.loss_variant),
            )
            return loss_out["total_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, next_rng, loss

    def _eval_step_impl(self, params, batch):
        out = self._forward(params, batch, deterministic=True)
        return out["mu_all"], out["uncertainty_all"]

    # -- data ------------------------------------------------------------
    def _stage(self, arrays: dict) -> dict:
        key = id(arrays)
        if key not in self._staged:
            self._staged[key] = {
                k: jax.device_put(v)
                for k, v in arrays.items()
                if k in ("signal", "video_frames", "token_ids", "token_mask",
                         "labels")
            }
        return self._staged[key]

    @staticmethod
    def _gather(staged: dict, idx) -> dict:
        return {k: jnp.take(v, idx, axis=0) for k, v in staged.items()}

    # -- loops -------------------------------------------------------------
    def train(
        self,
        train_arrays: dict,
        val_arrays: Optional[dict] = None,
        num_epochs: Optional[int] = None,
    ) -> dict:
        cfg = self.config
        num_epochs = num_epochs or cfg.num_epochs
        staged = self._stage(train_arrays)
        n = len(train_arrays["labels"])
        bs = min(cfg.batch_size, n)
        host_rng = np.random.default_rng(cfg.seed)
        t0 = time.time()
        best_ccc = -np.inf
        for epoch in range(num_epochs):
            order = host_rng.permutation(n)
            losses = []
            for start in range(0, n - bs + 1, bs):
                idx = jnp.asarray(order[start : start + bs])
                batch = self._gather(staged, idx)
                self.params, self.opt_state, self.rng, loss = self._train_step(
                    self.params, self.opt_state, batch, self.rng
                )
                losses.append(loss)
            self.history["train_loss"].append(
                float(np.mean(jax.device_get(losses)))
            )
            if val_arrays is not None:
                pred = self.predict(val_arrays)
                ccc = float(
                    np.mean(
                        [
                            metrics_lib.ccc_np(
                                val_arrays["labels"][:, i], pred["mu"][:, i]
                            )
                            for i in range(pred["mu"].shape[1])
                        ]
                    )
                )
                self.history["val_ccc"].append(ccc)
                best_ccc = max(best_ccc, ccc)
        return {
            "history": self.history,
            "best_val_ccc": float(best_ccc),
            "training_time_s": time.time() - t0,
        }

    def predict(self, arrays: dict) -> dict:
        staged = self._stage(arrays)
        n = len(arrays["labels"])
        bs = min(self.config.batch_size, n)
        mus, uncs = [], []
        for start in range(0, n, bs):
            idx = np.arange(start, min(start + bs, n))
            # Pad the tail to the compiled batch shape; mask after.
            pad = np.resize(idx, bs)
            batch = self._gather(staged, jnp.asarray(pad))
            mu, unc = self._eval_step(self.params, batch)
            mus.append(np.asarray(mu)[: len(idx)])
            uncs.append(np.asarray(unc)[: len(idx)])
        return {"mu": np.concatenate(mus), "uncertainty": np.concatenate(uncs)}
