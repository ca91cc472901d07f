"""Feature-space OOD detection (eval/ood.py): math, persistence, serving."""

import numpy as np
import pytest

from tpu_deer.eval.ood import (
    MahalanobisOOD,
    input_norm_features,
    mahalanobis_score_device,
    ood_auroc,
)


@pytest.fixture(scope="module")
def clouds():
    """Correlated in-distribution cloud + three probe families."""
    rng = np.random.default_rng(0)
    d = 16
    mix = rng.normal(size=(d, d)) / np.sqrt(d)
    z = rng.normal(size=(2000, d))
    x_in = z @ mix  # correlated Gaussian
    x_test = rng.normal(size=(500, d)) @ mix
    # structure break: same marginals, correlations destroyed
    x_shuf = np.stack(
        [rng.permutation(x_test[:, j]) for j in range(d)], axis=1
    )
    x_shift = x_test + 2.0
    return dict(train=x_in, test=x_test, shuffled=x_shuf, shifted=x_shift)


class TestMahalanobis:
    def test_in_distribution_scores_are_chi2_scaled(self, clouds):
        det = MahalanobisOOD(shrinkage=0.01).fit(clouds["train"])
        s = det.score(clouds["test"])
        # squared Mahalanobis of d-dim Gaussian ~ chi2(d): mean ~= d
        assert abs(s.mean() - 16.0) < 3.0, s.mean()

    def test_detects_structure_and_shift_breaks(self, clouds):
        det = MahalanobisOOD().fit(clouds["train"])
        s_in = det.score(clouds["test"])
        assert ood_auroc(s_in, det.score(clouds["shuffled"])) > 0.9
        assert ood_auroc(s_in, det.score(clouds["shifted"])) > 0.9

    def test_auroc_chance_on_identical_distributions(self, clouds):
        det = MahalanobisOOD().fit(clouds["train"])
        s = det.score(clouds["test"])
        a = ood_auroc(s[:250], s[250:])
        assert 0.4 < a < 0.6, a

    def test_threshold_controls_training_fpr(self, clouds):
        det = MahalanobisOOD().fit(clouds["train"])
        for fpr in (0.01, 0.1):
            thr = det.threshold(fpr)
            actual = float(np.mean(det.score(clouds["train"]) > thr))
            assert actual <= fpr + 1e-9, (fpr, actual)

    def test_calibrate_restores_heldout_fpr(self):
        # N not >> D: in-sample scores are biased low, so the raw fit()
        # threshold over-fires on fresh data; calibrate() on held-out rows
        # restores the guarantee.
        rng = np.random.default_rng(7)
        d = 100
        mix = rng.normal(size=(d, d)) / np.sqrt(d)
        draw = lambda n: rng.normal(size=(n, d)) @ mix
        fit, cal, fresh = draw(800), draw(800), draw(4000)
        det = MahalanobisOOD().fit(fit)
        fpr_insample = float(np.mean(det.score(fresh) > det.threshold(0.05)))
        det.calibrate(cal)
        fpr_cal = float(np.mean(det.score(fresh) > det.threshold(0.05)))
        assert fpr_insample > 0.08  # the bias is real at this N/D
        assert fpr_cal < 0.08, fpr_cal

    def test_is_ood_flags(self, clouds):
        det = MahalanobisOOD().fit(clouds["train"])
        flags = det.is_ood(clouds["shifted"], fpr=0.01)
        assert flags.dtype == bool and flags.mean() > 0.9

    def test_device_score_matches_host(self, clouds):
        import jax.numpy as jnp

        det = MahalanobisOOD().fit(clouds["train"])
        mean, whitener = det.device_arrays
        dev = np.asarray(
            mahalanobis_score_device(
                jnp.asarray(clouds["test"], jnp.float32),
                jnp.asarray(mean), jnp.asarray(whitener),
            )
        )
        np.testing.assert_allclose(dev, det.score(clouds["test"]), rtol=2e-4)

    def test_underdetermined_n_lt_d_still_works(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(8, 32))  # N < D: shrinkage floor kicks in
        det = MahalanobisOOD().fit(x)
        s = det.score(x + 10.0)
        assert np.all(np.isfinite(s)) and np.all(s > det.score(x).mean())

    def test_save_load_roundtrip(self, clouds, tmp_path):
        det = MahalanobisOOD().fit(clouds["train"])
        path = str(tmp_path / "det.npz")
        det.save(path)
        det2 = MahalanobisOOD.load(path)
        np.testing.assert_array_equal(
            det2.score(clouds["test"]), det.score(clouds["test"])
        )
        assert det2.threshold(0.01) == det.threshold(0.01)

    def test_errors(self):
        with pytest.raises(RuntimeError):
            MahalanobisOOD().score(np.zeros((2, 3)))
        with pytest.raises(ValueError):
            MahalanobisOOD(shrinkage=1.5)
        with pytest.raises(ValueError):
            MahalanobisOOD().fit(np.zeros((1, 3)))
        det = MahalanobisOOD().fit(np.random.default_rng(0).normal(size=(16, 4)))
        with pytest.raises(ValueError):
            det.threshold(fpr=0.0)

    def test_report_shape(self, clouds):
        det = MahalanobisOOD().fit(clouds["train"])
        rep = det.report(
            clouds["test"], {"shuffled": clouds["shuffled"]}
        )
        assert set(rep["auroc"]) == {"shuffled"}
        assert rep["threshold_fpr01"] > rep["train_score_p50"]


class TestInputNormSpace:
    """input_norm feature space: gain invariance by construction."""

    @pytest.fixture(scope="class")
    def mods(self):
        rng = np.random.default_rng(3)
        k = rng.normal(size=(2000, 4))
        mk = lambda d: (
            k @ (rng.normal(size=(4, d)) / 2.0) + rng.normal(size=(2000, d))
        ).astype(np.float32)
        return mk(6), mk(10), mk(8)

    def test_gain_invariance_exact(self, mods):
        det = MahalanobisOOD().fit_modalities(*mods)
        assert det.space == "input_norm"
        scaled = tuple(m * 7.5 for m in mods)
        np.testing.assert_allclose(
            det.score_modalities(*scaled), det.score_modalities(*mods),
            rtol=1e-4,
        )

    def test_per_modality_not_global_normalization(self, mods):
        # scaling ONE modality changes the relative geometry only if
        # normalization were global; per-modality it is still invariant.
        det = MahalanobisOOD().fit_modalities(*mods)
        a, v, t = mods
        np.testing.assert_allclose(
            det.score_modalities(a * 100.0, v, t),
            det.score_modalities(a, v, t), rtol=1e-4,
        )

    def test_detects_structure_break_after_normalization(self, mods):
        det = MahalanobisOOD().fit_modalities(*mods)
        a, v, t = mods
        rng = np.random.default_rng(4)
        mis = (a, v[rng.permutation(len(v))], t[rng.permutation(len(t))])
        s_in = det.score_modalities(a, v, t)
        assert ood_auroc(s_in[:1000], det.score_modalities(*mis)[:1000]) > 0.8

    def test_space_survives_save_load(self, mods, tmp_path):
        det = MahalanobisOOD().fit_modalities(*mods)
        p = str(tmp_path / "d.npz")
        det.save(p)
        det2 = MahalanobisOOD.load(p)
        assert det2.space == "input_norm"
        np.testing.assert_array_equal(
            det2.score_modalities(*mods), det.score_modalities(*mods)
        )

    def test_score_modalities_rejects_fused_detector(self, mods):
        det = MahalanobisOOD().fit(np.concatenate(mods, axis=1))
        with pytest.raises(ValueError, match="input_norm"):
            det.score_modalities(*mods)

    def test_device_features_match_host(self, mods):
        import jax.numpy as jnp

        from tpu_deer.eval.ood import input_norm_features_device

        host = input_norm_features(*mods)
        dev = np.asarray(input_norm_features_device(
            *[jnp.asarray(m) for m in mods]
        ))
        np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-6)


class TestLatentStructuredSynthetic:
    """SyntheticConfig(latent_dim=...): the generator variant that makes
    structure-breaking OOD probes non-vacuous (data/synthetic.py)."""

    @pytest.fixture(scope="class")
    def splits(self):
        from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits

        return make_synthetic_splits(SyntheticConfig(
            n_train=4000, n_val=100, n_test=1000,
            audio_dim=24, video_dim=32, text_dim=40,
            latent_dim=8, latent_strength=0.7,
        ))

    def test_marginals_stay_standard(self, splits):
        for k in ("audio", "video", "text"):
            x = splits["train"][k]
            assert abs(x.mean()) < 0.05
            assert abs(x.std() - 1.0) < 0.05

    def test_within_and_cross_modal_correlation_exists(self, splits):
        tr = splits["train"]
        c_a = np.corrcoef(tr["audio"], rowvar=False)
        off = c_a[~np.eye(len(c_a), dtype=bool)]
        assert np.abs(off).max() > 0.2  # within-modality structure
        cross = np.corrcoef(
            np.concatenate([tr["audio"], tr["video"]], axis=1), rowvar=False
        )[: tr["audio"].shape[1], tr["audio"].shape[1]:]
        assert np.abs(cross).max() > 0.2  # cross-modal coupling

    def test_iid_default_has_no_structure(self):
        from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits

        tr = make_synthetic_splits(SyntheticConfig(
            n_train=4000, n_val=100, n_test=100, audio_dim=24,
        ))["train"]
        c = np.corrcoef(tr["audio"], rowvar=False)
        off = c[~np.eye(len(c), dtype=bool)]
        assert np.abs(off).max() < 0.12  # sampling noise only

    def test_structure_probes_become_detectable(self, splits):
        """Column-shuffle and modality-misalignment are REAL covariance
        breaks under the latent generator — Mahalanobis on raw concatenated
        features separates them (on i.i.d. features these AUROCs are 0.5 by
        construction: the probes are measure-preserving there)."""
        tr, te = splits["train"], splits["test"]
        cat = lambda d: np.concatenate([d["audio"], d["video"], d["text"]], 1)
        det = MahalanobisOOD().fit(cat(tr))
        rng = np.random.default_rng(0)
        shuf = {
            k: np.stack(
                [te[k][rng.permutation(len(te[k])), j]
                 for j in range(te[k].shape[1])], axis=1
            )
            for k in ("audio", "video", "text")
        }
        mis = {
            "audio": te["audio"],
            "video": te["video"][rng.permutation(len(te["video"]))],
            "text": te["text"][rng.permutation(len(te["text"]))],
        }
        s_in = det.score(cat(te))
        assert ood_auroc(s_in, det.score(cat(shuf))) > 0.9
        assert ood_auroc(s_in, det.score(cat(mis))) > 0.85

    def test_labels_still_learnable_function_of_features(self, splits):
        # same label function contract as the default generator: a ridge fit
        # on train features predicts test labels well above chance.
        tr, te = splits["train"], splits["test"]
        cat = lambda d: np.concatenate([d["audio"], d["video"], d["text"]], 1)
        x, y = cat(tr), tr["labels"]
        w = np.linalg.solve(
            x.T @ x + 10.0 * np.eye(x.shape[1]), x.T @ y
        )
        pred = cat(te) @ w
        resid = te["labels"] - pred
        assert resid.var() < 0.6 * te["labels"].var()


class TestServingIntegration:
    @pytest.fixture(scope="class")
    def setup(self):
        from tpu_deer.models.deer_model import (
            DEERModelConfig, create_complete_deer_model,
        )

        cfg = DEERModelConfig(
            audio_dim=8, video_dim=8, text_dim=8, encoder_dim=16,
            fusion_dim=32, attention_heads=2, encoder_layers=1,
        )
        model, params = create_complete_deer_model(cfg, seed=0)
        rng = np.random.default_rng(2)
        fit_in = [rng.normal(size=(256, 8)).astype(np.float32) for _ in range(3)]
        fused = model.apply(
            {"params": params}, *fit_in, deterministic=True
        )["fused_features"]
        det = MahalanobisOOD().fit(np.asarray(fused))
        return model, params, det, rng

    def test_engine_ood_score_matches_detector(self, setup):
        from tpu_deer.serve import InferenceEngine

        model, params, det, rng = setup
        eng = InferenceEngine(
            model, params, batch_buckets=(1, 4, 16), ood_detector=det,
            ood_fpr=0.05,
        )
        req = [rng.normal(size=(5, 8)).astype(np.float32) for _ in range(3)]
        out = eng.predict(*req)
        assert out["ood_score"].shape == (5,)
        assert out["is_ood"].shape == (5,) and out["is_ood"].dtype == bool
        fused = np.asarray(model.apply(
            {"params": params}, *req, deterministic=True
        )["fused_features"])
        np.testing.assert_allclose(
            out["ood_score"], det.score(fused), rtol=5e-4
        )
        np.testing.assert_array_equal(
            out["is_ood"], out["ood_score"] > det.threshold(0.05)
        )

    def test_engine_input_norm_detector(self, setup):
        from tpu_deer.serve import InferenceEngine

        model, params, _, rng = setup
        fit = [rng.normal(size=(128, 8)).astype(np.float32) for _ in range(3)]
        det = MahalanobisOOD().fit_modalities(*fit)
        eng = InferenceEngine(
            model, params, batch_buckets=(1, 8), ood_detector=det,
            ood_fpr=0.05,
        )
        req = [rng.normal(size=(3, 8)).astype(np.float32) for _ in range(3)]
        out = eng.predict(*req)
        np.testing.assert_allclose(
            out["ood_score"], det.score_modalities(*req), rtol=5e-4
        )
        # gain invariance end to end through the jitted path
        out_scaled = eng.predict(*[r * 4.0 for r in req])
        np.testing.assert_allclose(
            out_scaled["ood_score"], out["ood_score"], rtol=1e-3
        )

    def test_engine_without_detector_has_no_ood_keys(self, setup):
        from tpu_deer.serve import InferenceEngine

        model, params, _, rng = setup
        eng = InferenceEngine(model, params, batch_buckets=(1, 4))
        out = eng.predict(
            *[rng.normal(size=(2, 8)).astype(np.float32) for _ in range(3)]
        )
        assert "ood_score" not in out and "is_ood" not in out
        assert "fused" not in out  # internal key never leaks

    def test_trainer_predict_exposes_fused(self, setup):
        from tpu_deer.data.pipeline import ArrayDataset
        from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

        model, params, _, rng = setup
        trainer = DEERTrainer(
            model, params,
            TrainingConfig(batch_size=8, num_epochs=1, warmup_epochs=0),
            steps_per_epoch=1,
        )
        ds = ArrayDataset(
            {
                "audio": rng.normal(size=(10, 8)).astype(np.float32),
                "video": rng.normal(size=(10, 8)).astype(np.float32),
                "text": rng.normal(size=(10, 8)).astype(np.float32),
                "labels": np.zeros((10, 3), np.float32),
            },
            "d",
        )
        out = trainer.predict(ds, return_fused=True)
        assert out["fused"].shape == (10, 32)
        out2 = trainer.predict(ds)
        assert "fused" not in out2
