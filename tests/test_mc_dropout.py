"""MC-dropout predictive uncertainty (DEERTrainer.predict_mc_dropout).

Load-bearing properties: the vmapped S-sample pass equals an explicit
host loop over the same dropout keys (under threefry, whose streams are
vmap-invariant), the combination is moment matching, and S=1 degenerates
to a single stochastic forward with zero disagreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.data.pipeline import ArrayDataset
from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

SMALL = DEERModelConfig(
    audio_dim=12, video_dim=16, text_dim=20, encoder_dim=24, fusion_dim=32,
    encoder_layers=1, attention_heads=2, dropout=0.2,
)


@pytest.fixture(scope="module")
def trainer_and_test():
    splits = make_synthetic_splits(SyntheticConfig(
        n_train=128, n_val=64, n_test=64,
        audio_dim=SMALL.audio_dim, video_dim=SMALL.video_dim,
        text_dim=SMALL.text_dim,
    ))
    model, params = create_complete_deer_model(SMALL, seed=0)
    tr = DEERTrainer(
        model, params,
        TrainingConfig(batch_size=32, num_epochs=1,
                       rng_impl="threefry2x32", seed=0),
        steps_per_epoch=4,
    )
    return tr, ArrayDataset(splits["test"], "synthetic")


class TestMCDropout:
    def test_shapes_and_identity(self, trainer_and_test):
        tr, test = trainer_and_test
        out = tr.predict_mc_dropout(test, n_samples=4, seed=0)
        assert out["mu"].shape == (64, 3)
        for k in ("uncertainty", "aleatoric", "epistemic",
                  "calibrated_uncertainty"):
            assert out[k].shape == (64, 3)
            assert np.isfinite(out[k]).all()
        np.testing.assert_allclose(
            out["uncertainty"], out["aleatoric"] + out["epistemic"],
            rtol=1e-5, atol=1e-7,
        )

    def test_deterministic_per_seed(self, trainer_and_test):
        tr, test = trainer_and_test
        a = tr.predict_mc_dropout(test, n_samples=3, seed=5)
        b = tr.predict_mc_dropout(test, n_samples=3, seed=5)
        c = tr.predict_mc_dropout(test, n_samples=3, seed=6)
        np.testing.assert_array_equal(a["mu"], b["mu"])
        assert not np.allclose(a["mu"], c["mu"])

    def test_matches_host_loop_moment_matching(self, trainer_and_test):
        """The one-dispatch vmapped pass == an explicit loop over the same
        keys with moment-matched combination (threefry: vmap-invariant)."""
        tr, test = trainer_and_test
        S = 4
        out = tr.predict_mc_dropout(test, n_samples=S, seed=7, batch_size=64)

        keys = jax.random.split(jax.random.PRNGKey(7), S)
        batch = {k: jnp.asarray(v) for k, v in test.arrays.items()}
        mus, aleas, epis = [], [], []
        for s in range(S):
            o = tr.model.apply(
                {"params": tr.state.params},
                batch["audio"], batch["video"], batch["text"],
                deterministic=False, rngs={"dropout": keys[s]},
            )
            mus.append(np.asarray(o["mu_all"]))
            aleas.append(np.concatenate(
                [np.asarray(o[f"{n}_aleatoric_uncertainty"])
                 for n in tr.model.config.dim_names], axis=-1))
            epis.append(np.concatenate(
                [np.asarray(o[f"{n}_epistemic_uncertainty"])
                 for n in tr.model.config.dim_names], axis=-1))
        mu = np.mean(mus, axis=0)
        disagreement = np.var(mus, axis=0)
        np.testing.assert_allclose(out["mu"], mu, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            out["aleatoric"], np.mean(aleas, axis=0), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            out["epistemic"], np.mean(epis, axis=0) + disagreement,
            rtol=2e-4, atol=1e-6)

    def test_single_sample_zero_disagreement(self, trainer_and_test):
        tr, test = trainer_and_test
        out = tr.predict_mc_dropout(test, n_samples=1, seed=0)
        # epistemic == mean NIG epistemic + var over 1 sample (= 0), so
        # uncertainty decomposes exactly into the NIG channels.
        np.testing.assert_allclose(
            out["uncertainty"], out["aleatoric"] + out["epistemic"],
            rtol=1e-6, atol=1e-8,
        )

    def test_rejects_bad_n_samples(self, trainer_and_test):
        tr, test = trainer_and_test
        with pytest.raises(ValueError, match="n_samples"):
            tr.predict_mc_dropout(test, n_samples=0)

    def test_rbg_impl_runs(self):
        """The default hardware-PRNG impl path (wrap_key_data on a batch of
        keys) compiles and runs."""
        splits = make_synthetic_splits(SyntheticConfig(
            n_train=64, n_val=32, n_test=32,
            audio_dim=SMALL.audio_dim, video_dim=SMALL.video_dim,
            text_dim=SMALL.text_dim,
        ))
        model, params = create_complete_deer_model(SMALL, seed=1)
        tr = DEERTrainer(
            model, params,
            TrainingConfig(batch_size=32, num_epochs=1, rng_impl="rbg"),
            steps_per_epoch=2,
        )
        out = tr.predict_mc_dropout(
            ArrayDataset(splits["test"], "synthetic"), n_samples=3)
        assert np.isfinite(out["mu"]).all()

    def test_ensemble_trainer_rejects(self):
        from tpu_deer.train.ensemble import EnsembleTrainer, create_deer_ensemble

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=0)
        tr = EnsembleTrainer(
            model, stacked, TrainingConfig(batch_size=32, num_epochs=1),
            steps_per_epoch=2,
        )
        with pytest.raises(NotImplementedError, match="disagreement"):
            tr.predict_mc_dropout(None)
