"""Trainer tests: learning on synthetic data, checkpoint/resume, curriculum."""

import numpy as np
import pytest

from tpu_deer.data.pipeline import ArrayDataset, BatchIterator
from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.train.checkpoint import CheckpointManager
from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

SMALL_MODEL = DEERModelConfig(
    audio_dim=16, video_dim=16, text_dim=16, encoder_dim=32, fusion_dim=64,
    attention_heads=4, encoder_layers=1, dropout=0.1,
)
SMALL_DATA = SyntheticConfig(
    n_train=256, n_val=128, n_test=128, audio_dim=16, video_dim=16, text_dim=16,
    label_noise=0.02, hard_fraction=0.0,
)


def _datasets():
    splits = make_synthetic_splits(SMALL_DATA)
    return (
        {"synthetic": ArrayDataset(splits["train"], "synthetic")},
        {"synthetic": ArrayDataset(splits["val"], "synthetic")},
    )


def _trainer(tmp_path=None, **overrides):
    model, params = create_complete_deer_model(SMALL_MODEL, seed=0)
    defaults = dict(
        learning_rate=1e-2, batch_size=64, num_epochs=25, warmup_epochs=1,
        scheduler="constant", early_stopping_patience=50, val_frequency=1, seed=0,
    )
    defaults.update(overrides)
    cfg = TrainingConfig(**defaults)
    return DEERTrainer(model, params, cfg, steps_per_epoch=4), cfg


class TestBatchIterator:
    def test_static_shapes_with_padding(self):
        ds = ArrayDataset({"x": np.arange(10, dtype=np.float32)})
        it = BatchIterator(ds, batch_size=4, shuffle=False)
        batches = list(it.epoch(0))
        assert len(batches) == 3
        assert all(b["x"].shape == (4,) for b in batches)
        assert batches[-1]["mask"].sum() == 2

    def test_drop_last(self):
        ds = ArrayDataset({"x": np.arange(10, dtype=np.float32)})
        it = BatchIterator(ds, batch_size=4, drop_last=True)
        assert len(list(it.epoch(0))) == 2

    def test_shuffle_deterministic_per_epoch(self):
        ds = ArrayDataset({"x": np.arange(32, dtype=np.float32)})
        it = BatchIterator(ds, batch_size=8, shuffle=True, seed=1)
        a = np.concatenate([b["x"] for b in it.epoch(0)])
        b = np.concatenate([b["x"] for b in it.epoch(0)])
        c = np.concatenate([b["x"] for b in it.epoch(1)])
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)


class TestTraining:
    def test_learns_synthetic_data(self):
        """CCC must climb well above 0 on learnable synthetic data — the
        reference's synthetic fallback could never show this (labels were
        independent noise)."""
        train, val = _datasets()
        trainer, _ = _trainer()
        results = trainer.train(train, val)
        assert results["best_val_ccc"] > 0.4, results["best_val_ccc"]
        # Loss went down
        tl = results["history"]["train_loss"]
        assert tl[-1] < tl[0]

    def test_loss_weight_knobs_are_live_under_v2(self):
        """Regression: evidence_weight/kl_weight must change the v2 loss
        (they were silently dead — mapped only onto the v1-only fields)."""
        import jax.numpy as jnp

        train, _ = _datasets()
        losses = {}
        for ew in (0.5, 10.0):
            trainer, _ = _trainer(evidence_weight=ew)
            batch = trainer._put(
                next(iter(
                    BatchIterator(train["synthetic"], 64, shuffle=False).epoch(0)
                ))
            )
            _, aux = trainer._train_step(
                trainer.state, batch, jnp.asarray(1.0), jnp.asarray(1.0)
            )
            losses[ew] = float(aux["loss"])
        assert losses[0.5] != losses[10.0], losses

    def test_aleatoric_moment_knob_is_live(self):
        """aleatoric_moment_weight must change the loss, report its component
        in aux, and be exactly absent when 0. (End-to-end effect is a
        data-regime question — measured in experiments/RESULTS_uncertainty_
        diag*.json — not assertable on a 256-sample fixture.)"""
        import jax.numpy as jnp

        train, _ = _datasets()
        losses, moments = {}, {}
        for w in (0.0, 0.5):
            trainer, _ = _trainer(aleatoric_moment_weight=w)
            # fresh batch per trainer: _train_step donates its input buffers,
            # and the returned state must replace the donated trainer.state
            batch = trainer._put(next(iter(
                BatchIterator(train["synthetic"], 64, shuffle=False).epoch(0)
            )))
            trainer.state, aux = trainer._train_step(
                trainer.state, batch, jnp.asarray(1.0), jnp.asarray(1.0)
            )
            losses[w] = float(aux["loss"])
            moments[w] = float(aux["aleatoric_moment"])
        assert losses[0.0] != losses[0.5]
        assert moments[0.0] == 0.0
        assert moments[0.5] > 0.0
        # identical init params + batch, so the total-loss gap must be
        # exactly the weighted moment term
        np.testing.assert_allclose(
            abs(losses[0.5] - losses[0.0] - 0.5 * moments[0.5]), 0.0, atol=2e-2
        )

    def test_nonfinite_step_is_skipped(self):
        """A poisoned batch (inf labels -> non-finite loss/grads) must leave
        params AND optimizer state untouched; the next clean step must still
        train normally."""
        import jax
        import jax.numpy as jnp

        train, _ = _datasets()
        trainer, _ = _trainer()

        def grab(tree):
            return jax.device_get(jax.tree_util.tree_leaves(tree))

        def make_batch(poison):
            b = next(iter(
                BatchIterator(train["synthetic"], 64, shuffle=False).epoch(0)
            ))
            if poison:
                b["labels"] = np.full_like(b["labels"], np.inf)
            return trainer._put(b)

        params_before = grab(trainer.state.params)
        trainer.state, aux = trainer._train_step(
            trainer.state, make_batch(True), jnp.asarray(1.0), jnp.asarray(1.0)
        )
        assert float(aux["nonfinite_skipped"]) == 1.0
        params_after = grab(trainer.state.params)
        for a, b in zip(params_before, params_after):
            np.testing.assert_array_equal(a, b)

        trainer.state, aux = trainer._train_step(
            trainer.state, make_batch(False), jnp.asarray(1.0), jnp.asarray(1.0)
        )
        assert float(aux["nonfinite_skipped"]) == 0.0
        assert np.isfinite(float(aux["loss"]))
        params_clean = grab(trainer.state.params)
        assert any(
            not np.array_equal(a, b) for a, b in zip(params_after, params_clean)
        )

    def test_validate_reports_all_metrics(self):
        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=1)
        trainer.train(train, val)
        metrics = trainer.validate_epoch(
            {"synthetic": BatchIterator(val["synthetic"], 64)}
        )
        for k in ("ccc_average", "mae_average", "rmse_average", "ece", "val_loss"):
            assert k in metrics

    def test_checkpoint_resume(self, tmp_path):
        train, val = _datasets()
        trainer, cfg = _trainer(num_epochs=3)
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        r1 = trainer.train(train, val, checkpoints=ckpt)
        step_before = r1["final_step"]
        assert ckpt.latest_step() is not None

        # New trainer resumes exactly
        model, params = create_complete_deer_model(SMALL_MODEL, seed=99)
        trainer2 = DEERTrainer(model, params, cfg, steps_per_epoch=4)
        restored = ckpt.restore(trainer2.state)
        assert int(restored.step) == ckpt.latest_step()
        # Restored params match saved trainer's (same tree, same values)
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(trainer.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_serving_channel_from_best_not_latest(self, tmp_path):
        """Every save carries best_serving_channel explicitly (like
        best_ccc): a periodic NON-best save's own "serving_channel" is that
        epoch's selection, and a resume seeded from it would desynchronize
        pipeline_summary.json from the best checkpoint's metadata."""
        train, val = _datasets()
        trainer, cfg = _trainer(num_epochs=2, save_frequency=1)
        # Epoch 0 is best (ccc 0.9) and selects "calibrated"; epoch 1 is a
        # non-best periodic save whose own selection flips to "eabs".
        script = [("calibrated", 0.9), ("eabs", 0.5)]
        orig_validate = trainer.validate_epoch

        def fake_validate(val_iters, use_ema=None):
            res = orig_validate(val_iters, use_ema)
            ch, ccc = script[min(fake_validate.calls, len(script) - 1)]
            fake_validate.calls += 1
            res["serving_channel"] = ch
            res["ccc_average"] = ccc
            return res

        fake_validate.calls = 0
        trainer.validate_epoch = fake_validate
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        r1 = trainer.train(train, val, checkpoints=ckpt)
        assert r1["serving_channel"] == "calibrated"
        assert (
            ckpt.metadata("best")["metrics"]["serving_channel"] == "calibrated"
        )
        # The latest save is the non-best epoch-1 one: its per-epoch channel
        # differs, but it still records the best epoch's selection.
        latest = ckpt.metadata()["metrics"]
        assert latest["serving_channel"] == "eabs"
        assert latest["best_serving_channel"] == "calibrated"
        # Crash-restart resume that finds no new best must report the best
        # checkpoint's channel, not the latest save's.
        model, params = create_complete_deer_model(SMALL_MODEL, seed=7)
        trainer2 = DEERTrainer(model, params, cfg, steps_per_epoch=4)
        r2 = trainer2.train(train, val, checkpoints=ckpt, resume=True)
        assert r2["serving_channel"] == "calibrated"

    def test_best_checkpoint_tracked(self, tmp_path):
        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=4)
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        trainer.train(train, val, checkpoints=ckpt)
        meta = ckpt.metadata("best")
        assert "ccc_average" in meta["metrics"]

    def test_async_checkpoint_identical_to_sync(self, tmp_path):
        """async_save must be observationally identical: same files, same
        restored values; the snapshot is taken at save() time, so later
        (donating) train steps can't corrupt an in-flight write."""
        train, val = _datasets()
        trainer, cfg = _trainer(num_epochs=3)
        ckpt = CheckpointManager(str(tmp_path / "a"), async_save=True)
        trainer.train(train, val, checkpoints=ckpt)  # train() drains writes
        assert ckpt.latest_step() is not None
        meta = ckpt.metadata("best")
        assert "ccc_average" in meta["metrics"]

        restored = ckpt.restore(trainer.state)
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(trainer.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ckpt.wait()  # idempotent on a drained queue

    def test_predict_shapes(self):
        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=1)
        trainer.train(train, val)
        out = trainer.predict(val["synthetic"])
        n = len(val["synthetic"])
        assert out["mu"].shape == (n, 3)
        assert out["uncertainty"].shape == (n, 3)
        assert out["aleatoric"].shape == (n, 3)

    def test_predict_return_nig(self):
        """return_nig exposes the raw NIG params and the closed-form
        expected-|error| channel; eabs must equal nig_expected_abs_error
        applied to the returned (nu, alpha, beta) and respect constraints."""
        from tpu_deer.core.nig import NIGParams, nig_expected_abs_error

        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=1)
        trainer.train(train, val)
        out = trainer.predict(val["synthetic"], return_nig=True)
        n = len(val["synthetic"])
        for k in ("nu", "alpha", "beta", "eabs"):
            assert out[k].shape == (n, 3), k
        assert np.all(out["alpha"] > 1.0)
        assert np.all(out["nu"] > 0.0) and np.all(out["beta"] > 0.0)
        expect = nig_expected_abs_error(NIGParams(
            mu=out["mu"], nu=out["nu"], alpha=out["alpha"], beta=out["beta"]
        ))
        np.testing.assert_allclose(out["eabs"], np.asarray(expect), rtol=1e-4)

    def test_serving_channel_selected_by_validation_ece(self):
        """The trainer must pick the channel with the LOWER validation ECE
        (tie → the training-free eabs channel) and report it in both
        validate_epoch and train() results — the VERDICT r4 weak-#2 fix:
        an undertrained calibration layer can no longer reach deployment."""
        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=2)
        results = trainer.train(train, val)
        it = {
            "synthetic": BatchIterator(
                val["synthetic"], 64, shuffle=False
            )
        }
        metrics = trainer.validate_epoch(it)
        assert set(("ece_calibrated", "ece_eabs", "serving_channel")) <= set(
            metrics
        )
        expect = (
            "calibrated"
            if metrics["ece_calibrated"] < metrics["ece_eabs"]
            else "eabs"
        )
        assert metrics["serving_channel"] == expect
        assert results["serving_channel"] in ("calibrated", "eabs")

    def test_shipped_channel_never_loses_on_validation(self):
        """The pin for VERDICT r4 weak #2: whatever the schedule length (here
        a deliberately short one where the calibration layer is
        undertrained), the channel train() reports for serving must be the
        validation-ECE winner at the best-CCC epoch — the shipped channel
        can never lose to the free closed-form one by more than a tie."""
        captured = []

        class _Capture:
            def scalar(self, *a, **k):
                pass

            def scalars(self, metrics, step, prefix=""):
                if prefix == "val/":
                    captured.append(dict(metrics))

        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=3)
        results = trainer.train(train, val, logger=_Capture())
        best = max(captured, key=lambda m: m["ccc_average"])
        assert results["serving_channel"] == best["serving_channel"]
        shipped_ece = best[f"ece_{best['serving_channel']}"]
        assert shipped_ece <= min(best["ece_calibrated"], best["ece_eabs"])

    def test_predict_rejects_fused_plus_nig(self):
        """Both flags at once would silently drop the NIG keys (each flag
        selects its own jitted eval step) — must refuse loudly."""
        trainer, _ = _trainer(num_epochs=1)
        train, val = _datasets()
        with pytest.raises(ValueError, match="return_fused"):
            trainer.predict(
                val["synthetic"], return_fused=True, return_nig=True
            )

    def test_early_stopping(self):
        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=40, early_stopping_patience=2,
                              learning_rate=0.0)
        results = trainer.train(train, val)
        # lr=0 → no improvement → stops after ~1+patience evals
        assert results["epochs_run"] < 10


class TestCurriculum:
    def test_probabilities_shift_over_time(self):
        trainer, _ = _trainer(
            num_epochs=10,
            dataset_weights={"a": 1.0, "b": 0.5},
            curriculum_learning=True,
        )
        early = trainer._curriculum_probabilities(["a", "b"], epoch=0)
        late = trainer._curriculum_probabilities(["a", "b"], epoch=9)
        assert early[0] > late[0]  # primary emphasized early
        np.testing.assert_allclose(late, [1 / 1.5, 0.5 / 1.5], rtol=1e-6)

    def test_multi_dataset_interleave_counts(self):
        splits = make_synthetic_splits(SMALL_DATA)
        ds = ArrayDataset(splits["train"], "synthetic")
        trainer, cfg = _trainer(dataset_weights={"a": 1.0, "b": 1.0})
        iters = {
            "a": BatchIterator(ds, 64, drop_last=True, seed=0),
            "b": BatchIterator(ds, 64, drop_last=True, seed=1),
        }
        batches = list(trainer._multi_dataset_iterator(iters, epoch=0))
        names = [n for n, _, _ in batches]
        assert len(batches) == 8  # 4 + 4
        assert set(names) == {"a", "b"}


class TestSchedulers:
    @pytest.mark.parametrize("sched", ["cosine", "exponential", "plateau", "constant"])
    def test_all_schedulers_run(self, sched):
        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=2, scheduler=sched)
        results = trainer.train(train, val)
        assert np.isfinite(results["history"]["train_loss"][-1])

    def test_plateau_reduces_scale(self):
        trainer, _ = _trainer(scheduler="plateau")
        for _ in range(12):
            trainer._plateau_update(0.0)  # never improves
        assert trainer._plateau_scale < 1.0


class TestSpikeBackoff:
    """Auto lr backoff on finite loss collapse (TrainingConfig.spike_backoff)."""

    def test_spike_halves_scale(self):
        trainer, cfg = _trainer()
        for loss in [5.0, 4.0, 3.5, 3.2, 3.0, 2.9]:
            assert not trainer._spike_update(loss)
        assert trainer._spike_scale == 1.0
        assert trainer._spike_update(50.0)  # finite collapse
        assert trainer._spike_scale == pytest.approx(cfg.spike_backoff_factor)
        # The spiked loss must not enter the baseline window.
        assert 50.0 not in trainer._spike_history

    def test_nonfinite_loss_is_a_spike(self):
        trainer, cfg = _trainer()
        for loss in [5.0, 4.0, 3.5]:
            trainer._spike_update(loss)
        assert trainer._spike_update(float("nan"))
        assert trainer._spike_update(float("inf"))
        assert trainer._spike_scale == pytest.approx(
            cfg.spike_backoff_factor**2
        )

    def test_clean_epochs_recover_scale(self):
        trainer, cfg = _trainer()
        for loss in [5.0, 4.0, 3.5, 3.2]:
            trainer._spike_update(loss)
        trainer._spike_update(1e6)
        assert trainer._spike_scale < 1.0
        for _ in range(10):
            trainer._spike_update(3.0)
        assert trainer._spike_scale == 1.0

    def test_nonfinite_fraction_triggers_backoff(self):
        """A finite epoch MEAN with >1% skipped steps is still a spike (the
        skip gate hides collapses from the mean, esp. in fused epochs)."""
        trainer, cfg = _trainer()
        for loss in [5.0, 4.0, 3.5]:
            trainer._spike_update(loss)
        assert trainer._spike_update(3.0, nonfinite_frac=0.05)
        assert trainer._spike_scale == pytest.approx(cfg.spike_backoff_factor)
        assert not trainer._spike_update(3.0, nonfinite_frac=0.0)

    def test_spike_rollback_restores_best_state(self):
        """A large-but-FINITE bad update escapes the non-finite containment
        and permanently collapses the run (observed: headline seed 2, one
        fused-epoch step took val CCC 0.966 → 0.460 forever). With
        spike_rollback the detector's firing restores the best-validation
        snapshot instead of training onward from wreckage."""
        import jax

        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=8, val_frequency=1)
        orig_train_epoch = trainer.train_epoch

        def sabotage(iters, epoch):
            metrics = orig_train_epoch(iters, epoch)
            if epoch == 5:
                # A finite catastrophic update: constant params (kills all
                # signal; LayerNorms can't renormalize it away).
                trainer.state = trainer.state.replace(
                    params=jax.tree_util.tree_map(
                        lambda p: jax.numpy.full_like(p, 0.3),
                        trainer.state.params,
                    )
                )
                metrics = dict(metrics, loss=1e6)
            return metrics

        trainer.train_epoch = sabotage
        results = trainer.train(train, val)
        # The run recovers: final best is from healthy epochs, and the live
        # state's validation matches the pre-spike trajectory, not the
        # constant-params wreck.
        it = {"synthetic": BatchIterator(val["synthetic"], 64, shuffle=False)}
        final = trainer.validate_epoch(it)
        assert final["ccc_average"] > 0.8 * results["best_val_ccc"]
        assert results["best_val_ccc"] > 0.25

    def test_spike_rollback_disabled_keeps_wreckage(self):
        """Control for the rollback test: with spike_rollback=False the
        same sabotage leaves the collapsed params in place."""
        import jax

        train, val = _datasets()
        trainer, _ = _trainer(
            num_epochs=8, val_frequency=1, spike_rollback=False,
            learning_rate=1e-4,  # too small to retrain out of the wreck
        )
        orig_train_epoch = trainer.train_epoch

        def sabotage(iters, epoch):
            metrics = orig_train_epoch(iters, epoch)
            if epoch == 5:
                trainer.state = trainer.state.replace(
                    params=jax.tree_util.tree_map(
                        lambda p: jax.numpy.full_like(p, 0.3),
                        trainer.state.params,
                    )
                )
                metrics = dict(metrics, loss=1e6)
            return metrics

        trainer.train_epoch = sabotage
        trainer.train(train, val)
        it = {"synthetic": BatchIterator(val["synthetic"], 64, shuffle=False)}
        final = trainer.validate_epoch(it)
        assert final["ccc_average"] < 0.2

    def test_negative_losses_supported(self):
        """The DEER NLL can go negative; median+MAD must not misfire there."""
        trainer, _ = _trainer()
        for loss in [-1.0, -1.2, -1.3, -1.35, -1.4]:
            assert not trainer._spike_update(loss)
        assert trainer._spike_scale == 1.0
        assert trainer._spike_update(2.0)  # jump out of the negative basin

    def test_disabled_by_config(self):
        """Both recovery knobs off => the detector never runs."""
        trainer, _ = _trainer(spike_backoff=False, spike_rollback=False)
        for loss in [5.0, 4.0, 3.5, 3.2]:
            trainer._spike_update(loss)
        assert not trainer._spike_update(float("inf"))
        assert trainer._spike_scale == 1.0

    def test_rollback_only_still_detects(self):
        """spike_rollback works WITHOUT spike_backoff: the detector fires
        (so rollback can trigger) while the lr scale stays pinned at 1.0.
        Previously detection was gated on spike_backoff alone, silently
        disabling rollback-only configurations."""
        trainer, _ = _trainer(spike_backoff=False, spike_rollback=True)
        for loss in [5.0, 4.0, 3.5, 3.2]:
            assert not trainer._spike_update(loss)
        assert trainer._spike_update(float("inf"))
        assert trainer._spike_update(50.0)
        assert trainer._spike_scale == 1.0  # no backoff in rollback-only

    def test_rollback_only_takes_snapshots(self):
        """The best-validation snapshot is captured under rollback-only
        configs too (the old gate required spike_backoff as well)."""
        train, val = _datasets()
        trainer, _ = _trainer(
            num_epochs=1, spike_backoff=False, spike_rollback=True
        )
        trainer.train(train, val)
        assert trainer._best_state is not None

    def test_backoff_scale_reaches_the_step(self):
        """train_epoch must fold the spike scale into the jitted step's
        lr_scale operand (zero scale => params frozen)."""
        import jax

        train, _ = _datasets()
        trainer, cfg = _trainer(num_epochs=1)
        from tpu_deer.data.pipeline import BatchIterator

        iters = {
            "synthetic": BatchIterator(
                train["synthetic"], cfg.batch_size, shuffle=True, seed=0
            )
        }
        trainer._spike_scale = 0.0  # fully backed off
        before = jax.device_get(trainer.state.params)
        trainer.train_epoch(iters, 0)
        after = jax.device_get(trainer.state.params)
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
        ):
            np.testing.assert_array_equal(a, b)


class TestEMA:
    """EMA shadow weights (TrainingConfig.ema_decay)."""

    def test_off_by_default(self):
        trainer, _ = _trainer()
        assert trainer.ema_params is None
        with pytest.raises(ValueError, match="ema_decay"):
            train, _ = _datasets()
            trainer.predict(train["synthetic"], use_ema=True)

    def test_tracks_pre_step_params(self):
        """ema_t = d*ema_{t-1} + (1-d)*params_t(pre-step), verified against
        a manual recursion over captured parameter snapshots."""
        import jax
        import jax.numpy as jnp

        train, _ = _datasets()
        trainer, cfg = _trainer(ema_decay=0.5)
        ds = train["synthetic"]
        w = jnp.asarray(1.0)
        s = jnp.asarray(1.0)
        snapshots = []
        for step in range(3):
            snapshots.append(jax.device_get(trainer.state.params))
            idx = np.arange(step * 64, (step + 1) * 64) % len(ds)
            batch = trainer._put(ds.slice(idx))
            trainer.state, _ = trainer._train_step(trainer.state, batch, w, s)
        expected = snapshots[0]
        for snap in snapshots:
            expected = jax.tree_util.tree_map(
                lambda e, p: 0.5 * e + 0.5 * p, expected, snap
            )
        got = jax.device_get(trainer.ema_params)
        for a, b in zip(
            jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(expected)
        ):
            np.testing.assert_allclose(a, b, atol=1e-6)

    def test_predict_with_ema_runs(self):
        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=3, ema_decay=0.9)
        trainer.train(train, val)
        out = trainer.predict(val["synthetic"], use_ema=True)
        assert out["mu"].shape == (128, 3)
        assert np.all(np.isfinite(out["mu"]))
        # Shadow weights differ from the live weights after training.
        live = trainer.predict(val["synthetic"])
        assert not np.allclose(out["mu"], live["mu"])

    def test_ema_eval_validates_on_shadow_weights(self):
        train, val = _datasets()
        trainer, _ = _trainer(num_epochs=3, ema_decay=0.8, ema_eval=True)
        results = trainer.train(train, val)
        assert np.isfinite(results["best_val_ccc"])
        # Explicit live-vs-EMA validation must differ after training.
        from tpu_deer.data.pipeline import BatchIterator

        iters = {
            "synthetic": BatchIterator(val["synthetic"], 64, shuffle=False)
        }
        live = trainer.validate_epoch(iters, use_ema=False)
        ema = trainer.validate_epoch(iters, use_ema=True)
        assert live["ccc_average"] != ema["ccc_average"]

    def test_composes_with_grad_accum(self):
        """Under accumulation the EMA advances once per real update."""
        import jax
        import jax.numpy as jnp

        train, _ = _datasets()
        trainer, _ = _trainer(ema_decay=0.5, grad_accum_steps=2)
        ds = train["synthetic"]
        init = jax.device_get(trainer.state.params)
        w = jnp.asarray(1.0)
        s = jnp.asarray(1.0)
        batch = trainer._put(ds.slice(np.arange(64)))
        trainer.state, _ = trainer._train_step(trainer.state, batch, w, s)
        # Micro-step 1: no real update yet — EMA still equals init.
        got = jax.device_get(trainer.ema_params)
        for a, b in zip(
            jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(init)
        ):
            np.testing.assert_array_equal(a, b)


class TestBF16:
    def test_bf16_compute_trains(self):
        """bfloat16 dense path + float32 NIG math must train stably."""
        import dataclasses

        train, val = _datasets()
        from tpu_deer.models.deer_model import create_complete_deer_model

        cfg_bf16 = dataclasses.replace(SMALL_MODEL, compute_dtype="bfloat16")
        model, params = create_complete_deer_model(cfg_bf16, seed=0)
        # params stay f32 (flax keeps param dtype f32 when dtype= is compute)
        import jax
        import numpy as np

        leaves = jax.tree_util.tree_leaves(params)
        assert all(l.dtype == np.float32 for l in leaves)
        trainer = DEERTrainer(
            model, params,
            TrainingConfig(learning_rate=5e-3, batch_size=64, num_epochs=3,
                           warmup_epochs=0, scheduler="constant", seed=0),
            steps_per_epoch=4,
        )
        results = trainer.train(train, val)
        assert np.isfinite(results["history"]["train_loss"][-1])
        assert results["best_val_ccc"] > -0.5

    def test_bf16_storage_trains(self):
        """storage_dtype="bfloat16" (params + grads + Adam moments in bf16,
        VERDICT r4 HBM study knob): params land in bf16, training still
        learns, and checkpoints round-trip in the stored dtype."""
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        train, val = _datasets()
        from tpu_deer.models.deer_model import create_complete_deer_model

        cfg_bf16 = dataclasses.replace(SMALL_MODEL, compute_dtype="bfloat16")
        model, params = create_complete_deer_model(cfg_bf16, seed=0)
        trainer = DEERTrainer(
            model, params,
            TrainingConfig(learning_rate=5e-3, batch_size=64, num_epochs=3,
                           warmup_epochs=0, scheduler="constant", seed=0,
                           storage_dtype="bfloat16"),
            steps_per_epoch=4,
        )
        leaves = jax.tree_util.tree_leaves(trainer.state.params)
        assert all(l.dtype == jnp.bfloat16 for l in leaves)
        results = trainer.train(train, val)
        assert np.isfinite(results["history"]["train_loss"][-1])
        assert results["best_val_ccc"] > -0.5
        # Adam moments inherited the storage dtype (that's the traffic win).
        moment_dtypes = {
            l.dtype
            for l in jax.tree_util.tree_leaves(trainer.state.opt_state)
            if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        }
        assert jnp.dtype(jnp.bfloat16) in moment_dtypes


class TestRemat:
    def test_remat_step_matches_plain(self):
        """jax.checkpoint must not change the computed loss."""
        import jax.numpy as jnp

        train, _ = _datasets()
        ds = train["synthetic"]
        model, p1 = create_complete_deer_model(SMALL_MODEL, seed=0)
        _, p2 = create_complete_deer_model(SMALL_MODEL, seed=0)
        t_plain = DEERTrainer(
            model, p1, TrainingConfig(batch_size=64, num_epochs=1, seed=0),
            steps_per_epoch=4,
        )
        t_remat = DEERTrainer(
            model, p2,
            TrainingConfig(batch_size=64, num_epochs=1, seed=0, remat=True),
            steps_per_epoch=4,
        )
        idx = np.arange(64)
        b1 = t_plain._batch_from_indices(ds, idx)
        b2 = t_remat._batch_from_indices(ds, idx)
        w = jnp.asarray(1.0)
        s = jnp.asarray(1.0)
        _, aux1 = t_plain._train_step(t_plain.state, b1, w, s)
        _, aux2 = t_remat._train_step(t_remat.state, b2, w, s)
        assert np.isclose(float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5)


class TestFusedEpoch:
    def test_fused_matches_perstep(self):
        """fused_epochs=True must produce the same training trajectory as the
        per-step path (same RNG splits, same batch order)."""
        train, val = _datasets()
        model, p1 = create_complete_deer_model(SMALL_MODEL, seed=0)
        _, p2 = create_complete_deer_model(SMALL_MODEL, seed=0)
        base = dict(
            learning_rate=5e-3, batch_size=64, num_epochs=2, warmup_epochs=0,
            scheduler="constant", seed=0,
        )
        t_step = DEERTrainer(
            model, p1, TrainingConfig(fused_epochs=False, **base),
            steps_per_epoch=4,
        )
        t_fused = DEERTrainer(
            model, p2, TrainingConfig(fused_epochs=True, **base),
            steps_per_epoch=4,
        )
        r_step = t_step.train(train, val)
        r_fused = t_fused.train(train, val)
        np.testing.assert_allclose(
            r_step["history"]["train_loss"],
            r_fused["history"]["train_loss"],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            r_step["history"]["val_ccc"], r_fused["history"]["val_ccc"],
            rtol=1e-3, atol=1e-4,
        )


class TestTinyDatasetPadding:
    def test_dataset_smaller_than_batch(self):
        """Padding must keep static batch shape even when n < batch_size."""
        ds = ArrayDataset({"x": np.arange(3, dtype=np.float32)})
        it = BatchIterator(ds, batch_size=8, shuffle=False)
        (idx, mask), = list(it.epoch_indices(0))
        assert idx.shape == (8,)
        assert mask.sum() == 3
        batches = list(it.epoch(0))
        assert batches[0]["x"].shape == (8,)


class TestFrozenParams:
    def test_frozen_subtree_unchanged(self):
        """Parameters under frozen_prefixes must not move during training
        (reference freezes BERT layers 0-5, encoders.py:629-646)."""
        import jax

        train, val = _datasets()
        trainer, _ = _trainer(
            num_epochs=2, frozen_prefixes=("audio_encoder",)
        )
        before = jax.device_get(trainer.state.params["audio_encoder"])
        before_text = jax.device_get(trainer.state.params["text_encoder"])
        trainer.train(train, val)
        after = jax.device_get(trainer.state.params["audio_encoder"])
        after_text = jax.device_get(trainer.state.params["text_encoder"])
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)
        ):
            np.testing.assert_array_equal(a, b)
        # Unfrozen encoder DID move
        moved = any(
            not np.array_equal(a, b)
            for a, b in zip(
                jax.tree_util.tree_leaves(before_text),
                jax.tree_util.tree_leaves(after_text),
            )
        )
        assert moved


def test_async_checkpoint_wait_drains_after_failure(tmp_path, monkeypatch):
    """A failed async write surfaces once, then the queue is clean — wait()
    must drain everything even when an early future raised."""
    import jax.numpy as jnp

    ckpt = CheckpointManager(str(tmp_path / "c"), async_save=True)
    state = {"w": jnp.ones(4)}
    real_write = ckpt._write
    calls = {"n": 0}

    def flaky_write(path, host_state, step, metrics):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("disk full")
        return real_write(path, host_state, step, metrics)

    monkeypatch.setattr(ckpt, "_write", flaky_write)
    ckpt.save(state, step=1)
    ckpt._pool.submit(lambda: None).result()  # let the flaky write finish
    # The failure surfaces exactly once — at the next save — and the new
    # save is enqueued before the raise, so it is not lost.
    with pytest.raises(OSError, match="disk full"):
        ckpt.save(state, step=2)
    ckpt.wait()  # drained: no stale exception re-raised
    assert ckpt.all_steps() == [2]
