"""Deep-ensemble training (train/ensemble.py).

The load-bearing property is member independence: a K-member EnsembleTrainer
step must be exactly K independent single-model DEERTrainer steps (same
optimizer, schedule, clip semantics). Pinned with dropout disabled so the
only RNG difference (per-member dropout keys) is inert.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.data.pipeline import ArrayDataset
from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.parallel.mesh import MeshConfig, create_mesh
from tpu_deer.train.ensemble import EnsembleTrainer, create_deer_ensemble
from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

SMALL = DEERModelConfig(
    audio_dim=12, video_dim=16, text_dim=20, encoder_dim=24, fusion_dim=32,
    encoder_layers=1, attention_heads=2, dropout=0.0,
)


def _splits(n_train=256, n_val=128):
    cfg = SyntheticConfig(
        n_train=n_train, n_val=n_val, n_test=n_val,
        audio_dim=SMALL.audio_dim, video_dim=SMALL.video_dim,
        text_dim=SMALL.text_dim,
    )
    return make_synthetic_splits(cfg)


def _tcfg(**kw):
    base = dict(
        learning_rate=1e-3, batch_size=64, num_epochs=2, warmup_epochs=0,
        scheduler="cosine", val_frequency=1, early_stopping_patience=10**9,
        # spike backoff is a SHARED lr controller keyed off the member-mean
        # loss (documented EnsembleTrainer caveat) — disable it so member
        # trajectories are comparable to independent runs. threefry is the
        # only PRNG whose bit streams are vmap-invariant (rbg's batched
        # draws differ from unbatched ones — documented JAX behavior), so
        # member-vs-independent trajectory equality (float32 batching tolerance) is pinned under threefry.
        spike_backoff=False,
        spike_rollback=False,  # rollback is now detector-independent too
        rng_impl="threefry2x32",
        seed=0,
    )
    base.update(kw)
    return TrainingConfig(**base)


class TestEnsembleBasics:
    def test_stacked_init_shapes_and_diversity(self):
        model, params = create_deer_ensemble(SMALL, n_members=3, seed=0)
        leaves = jax.tree_util.tree_leaves(params)
        assert all(l.shape[0] == 3 for l in leaves)
        # members must differ (independent inits) — check a kernel leaf
        # (biases are zero-init for every member)
        kernel = next(l for l in leaves if l.ndim >= 3)
        assert not np.allclose(kernel[0], kernel[1])

    def test_rejects_unstacked_params(self):
        model, params = create_complete_deer_model(SMALL, seed=0)
        with pytest.raises(ValueError, match="leading member axis"):
            EnsembleTrainer(model, params, _tcfg(), steps_per_epoch=4)

    def test_member_params_roundtrip(self):
        model, params = create_deer_ensemble(SMALL, n_members=2, seed=0)
        tr = EnsembleTrainer(model, params, _tcfg(), steps_per_epoch=4)
        single = tr.member_params(1)
        ref = jax.tree_util.tree_map(lambda x: x[1], params)
        chex_equal = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(jnp.array_equal(a, b)), single, ref
            )
        )
        assert chex_equal
        with pytest.raises(IndexError):
            tr.member_params(2)


def _member_rng_trainer(k: int, n: int):
    """Single-model DEERTrainer that derives its dropout key exactly like
    ensemble member k does (split of the step key into n member keys). The
    flagship's attention block has a hardcoded 0.1 dropout, so trajectory
    equality requires matching the rng assignment, not disabling dropout."""

    class _MemberRNGTrainer(DEERTrainer):
        def _loss_fn(self, params, batch, dropout_rng, dataset_weight):
            dropout_rng = jax.random.split(dropout_rng, n)[k]
            return super()._loss_fn(params, batch, dropout_rng, dataset_weight)

    return _MemberRNGTrainer


class TestMemberIndependence:
    def test_ensemble_step_equals_independent_runs(self):
        """K=2 ensemble training == two single-model trainings, exactly."""
        splits = _splits()
        train = {"synthetic": ArrayDataset(splits["train"], "synthetic")}
        val = {"synthetic": ArrayDataset(splits["val"], "synthetic")}

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=7)
        # snapshot: the jitted train step donates the state buffers
        stacked = jax.tree_util.tree_map(np.asarray, stacked)
        e_tr = EnsembleTrainer(model, stacked, _tcfg(), steps_per_epoch=4)
        e_tr.train(train, val)

        for k in range(2):
            init_k = jax.tree_util.tree_map(lambda x: x[k], stacked)
            cls = _member_rng_trainer(k, 2)
            s_tr = cls(model, init_k, _tcfg(), steps_per_epoch=4)
            s_tr.train(train, val)
            got = e_tr.member_params(k)
            want = s_tr.state.params
            flat_g = jax.tree_util.tree_leaves(got)
            flat_w = jax.tree_util.tree_leaves(want)
            for g, w in zip(flat_g, flat_w):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-6
                )

    def test_per_member_clip_active(self):
        """With a tiny clip threshold the trajectories must STILL match the
        independent runs — i.e. clipping is per member, not joint."""
        splits = _splits(n_train=128, n_val=64)
        train = {"synthetic": ArrayDataset(splits["train"], "synthetic")}
        val = {"synthetic": ArrayDataset(splits["val"], "synthetic")}
        cfg = _tcfg(gradient_clip=0.05, num_epochs=1)

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=3)
        stacked = jax.tree_util.tree_map(np.asarray, stacked)
        e_tr = EnsembleTrainer(model, stacked, cfg, steps_per_epoch=2)
        e_tr.train(train, val)

        init0 = jax.tree_util.tree_map(lambda x: x[0], stacked)
        s_tr = _member_rng_trainer(0, 2)(model, init0, cfg, steps_per_epoch=2)
        s_tr.train(train, val)
        for g, w in zip(
            jax.tree_util.tree_leaves(e_tr.member_params(0)),
            jax.tree_util.tree_leaves(s_tr.state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=2e-5, atol=2e-6
            )


class TestEnsemblePrediction:
    def test_combination_moment_matching(self):
        """Combined outputs follow the moment-matching formulas over the
        per-member eval outputs."""
        model, stacked = create_deer_ensemble(SMALL, n_members=3, seed=1)
        tr = EnsembleTrainer(model, stacked, _tcfg(), steps_per_epoch=4)
        splits = _splits(n_train=128, n_val=64)
        test = ArrayDataset(splits["test"], "synthetic")
        out = tr.predict(test, batch_size=64)

        # recompute per member through single-model eval
        member_mu, member_alea, member_epis = [], [], []
        for k in range(3):
            s_tr = DEERTrainer(
                model, tr.member_params(k), _tcfg(), steps_per_epoch=4
            )
            m_out = s_tr.predict(test, batch_size=64)
            member_mu.append(m_out["mu"])
            member_alea.append(m_out["aleatoric"])
            member_epis.append(m_out["epistemic"])
        mu = np.mean(member_mu, axis=0)
        alea = np.mean(member_alea, axis=0)
        disagreement = np.var(member_mu, axis=0)
        epis = np.mean(member_epis, axis=0) + disagreement
        np.testing.assert_allclose(out["mu"], mu, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out["aleatoric"], alea, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out["epistemic"], epis, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            out["uncertainty"], alea + epis, rtol=1e-4, atol=1e-6
        )

    def test_eabs_combined_in_variance_space(self):
        """The combined E|err| forecast = sqrt(mean_eabs^2 +
        (2/pi)*disagreement) — MADs don't add linearly (same formula as
        serve.py's ensemble engine)."""
        model, stacked = create_deer_ensemble(SMALL, n_members=3, seed=1)
        tr = EnsembleTrainer(model, stacked, _tcfg(), steps_per_epoch=4)
        splits = _splits(n_train=128, n_val=64)
        test = ArrayDataset(splits["test"], "synthetic")
        out = tr.predict(test, batch_size=64)
        member_mu, member_eabs = [], []
        for k in range(3):
            s_tr = DEERTrainer(
                model, tr.member_params(k), _tcfg(), steps_per_epoch=4
            )
            m_out = s_tr.predict(test, batch_size=64)
            member_mu.append(m_out["mu"])
            member_eabs.append(m_out["eabs"])
        expect = np.sqrt(
            np.mean(member_eabs, axis=0) ** 2
            + 2.0 / np.pi * np.var(member_mu, axis=0)
        )
        np.testing.assert_allclose(out["eabs"], expect, rtol=1e-4, atol=1e-6)

    def test_nig_and_fused_variants_refused_loudly(self):
        """return_nig/return_fused over a stacked ensemble must refuse with
        a pointed message, not the inherited jitted variants' TypeError."""
        import pytest

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=0)
        tr = EnsembleTrainer(model, stacked, _tcfg(), steps_per_epoch=4)
        test = ArrayDataset(_splits(n_train=64, n_val=32)["test"], "synthetic")
        with pytest.raises(NotImplementedError, match="mixture of K NIG"):
            tr.predict(test, return_nig=True)
        with pytest.raises(NotImplementedError, match="per-member"):
            tr.predict(test, return_fused=True)

    def test_training_improves_ccc(self):
        from tpu_deer.core import metrics as M

        splits = _splits(n_train=512, n_val=128)
        train = {"synthetic": ArrayDataset(splits["train"], "synthetic")}
        val = {"synthetic": ArrayDataset(splits["val"], "synthetic")}
        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=0)
        tr = EnsembleTrainer(
            model, stacked, _tcfg(num_epochs=6, learning_rate=3e-3),
            steps_per_epoch=8,
        )
        tr.train(train, val)
        test = splits["test"]
        out = tr.predict(ArrayDataset(test, "synthetic"))
        ccc = np.mean([
            M.ccc_np(test["labels"][:, d], out["mu"][:, d]) for d in range(3)
        ])
        assert np.isfinite(ccc) and ccc > 0.2


class TestEnsembleSharding:
    def test_sharded_matches_unsharded(self):
        """param_sharding='ensemble' over the 8-device mesh (members on
        'model', batch on 'data') reproduces the unsharded trajectory."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        splits = _splits(n_train=128, n_val=64)
        train = {"synthetic": ArrayDataset(splits["train"], "synthetic")}
        val = {"synthetic": ArrayDataset(splits["val"], "synthetic")}
        cfg = _tcfg(num_epochs=1, param_sharding="ensemble")

        model, stacked = create_deer_ensemble(SMALL, n_members=4, seed=5)
        stacked = jax.tree_util.tree_map(np.asarray, stacked)
        plain = EnsembleTrainer(model, stacked, cfg, steps_per_epoch=2)
        plain.train(train, val)

        mesh = create_mesh(MeshConfig(data=2, model=4))
        sharded = EnsembleTrainer(
            model, stacked, cfg, steps_per_epoch=2, mesh=mesh
        )
        # member axis (4) must actually be sharded over 'model'
        kernel = jax.tree_util.tree_leaves(sharded.state.params)[0]
        assert "model" in str(kernel.sharding.spec)
        sharded.train(train, val)

        for g, w in zip(
            jax.tree_util.tree_leaves(plain.state.params),
            jax.tree_util.tree_leaves(sharded.state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=5e-5, atol=1e-5
            )


class TestEnsembleFusedEpochs:
    def test_fused_matches_perstep(self):
        """The inherited fused-epoch path (one lax.scan dispatch per epoch)
        reproduces the per-step trajectory for a stacked ensemble too."""
        splits = _splits(n_train=256, n_val=128)
        train = {"synthetic": ArrayDataset(splits["train"], "synthetic")}
        val = {"synthetic": ArrayDataset(splits["val"], "synthetic")}
        base = dict(num_epochs=2)

        model, stacked = create_deer_ensemble(SMALL, n_members=2, seed=4)
        stacked = jax.tree_util.tree_map(np.asarray, stacked)
        t_step = EnsembleTrainer(
            model, stacked, _tcfg(fused_epochs=False, **base),
            steps_per_epoch=4,
        )
        t_fused = EnsembleTrainer(
            model, stacked, _tcfg(fused_epochs=True, **base),
            steps_per_epoch=4,
        )
        r_step = t_step.train(train, val)
        r_fused = t_fused.train(train, val)
        np.testing.assert_allclose(
            r_step["history"]["train_loss"],
            r_fused["history"]["train_loss"], rtol=1e-4,
        )
        np.testing.assert_allclose(
            r_step["history"]["val_ccc"], r_fused["history"]["val_ccc"],
            rtol=1e-3, atol=1e-4,
        )
