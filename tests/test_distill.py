"""Knowledge distillation: teacher stamping, loss wiring, student benefit."""

import numpy as np
import pytest

from tpu_deer.data.pipeline import ArrayDataset
from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
from tpu_deer.models.deer_model import (
    DEERModelConfig,
    count_parameters,
    create_complete_deer_model,
)
from tpu_deer.train.distill import add_teacher_targets
from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

TEACHER = DEERModelConfig(
    audio_dim=16, video_dim=16, text_dim=16, encoder_dim=48, fusion_dim=96,
    attention_heads=4, encoder_layers=2, dropout=0.1,
)
STUDENT = DEERModelConfig(
    audio_dim=16, video_dim=16, text_dim=16, encoder_dim=16, fusion_dim=32,
    attention_heads=2, encoder_layers=1, dropout=0.1,
)
DATA = SyntheticConfig(
    n_train=384, n_val=128, n_test=128, audio_dim=16, video_dim=16,
    text_dim=16, label_noise=0.02, hard_fraction=0.0,
)


@pytest.fixture(scope="module")
def splits():
    return make_synthetic_splits(DATA)


@pytest.fixture(scope="module")
def teacher(splits):
    model, params = create_complete_deer_model(TEACHER, seed=0)
    tr = DEERTrainer(
        model, params,
        TrainingConfig(learning_rate=1e-2, batch_size=64, num_epochs=12,
                       warmup_epochs=1, scheduler="constant",
                       val_frequency=4, seed=0),
        steps_per_epoch=6,
    )
    tr.train({"syn": ArrayDataset(splits["train"], "syn")},
             {"syn": ArrayDataset(splits["val"], "syn")})
    return model, tr.state.params


class TestTeacherStamping:
    def test_arrays_added_and_originals_untouched(self, teacher, splits):
        model, params = teacher
        ds = ArrayDataset(splits["train"], "syn")
        stamped = add_teacher_targets(model, params, ds, batch_size=100)
        assert set(stamped.arrays) == set(ds.arrays) | {
            "teacher_mu", "teacher_unc"}
        assert stamped.arrays["teacher_mu"].shape == (len(ds), 3)
        assert np.all(stamped.arrays["teacher_unc"] > 0)
        # wrap-padding must not corrupt rows: re-stamp with a different
        # batch size and compare
        again = add_teacher_targets(model, params, ds, batch_size=64)
        np.testing.assert_allclose(
            stamped.arrays["teacher_mu"], again.arrays["teacher_mu"],
            atol=1e-5)

    def test_targets_match_direct_forward(self, teacher, splits):
        model, params = teacher
        ds = ArrayDataset(splits["val"], "syn")
        stamped = add_teacher_targets(model, params, ds, batch_size=128)
        out = model.apply(
            {"params": params}, ds.arrays["audio"], ds.arrays["video"],
            ds.arrays["text"], deterministic=True)
        np.testing.assert_allclose(
            stamped.arrays["teacher_mu"], np.asarray(out["mu_all"]), atol=1e-5)


class TestDistilledStudent:
    def _train_student(self, splits, train_ds, seed=0, **cfg_overrides):
        model, params = create_complete_deer_model(STUDENT, seed=seed)
        cfg = TrainingConfig(
            learning_rate=1e-2, batch_size=64, num_epochs=10,
            warmup_epochs=1, scheduler="constant", val_frequency=5,
            seed=seed, **cfg_overrides)
        tr = DEERTrainer(model, params, cfg, steps_per_epoch=6)
        tr.train({"syn": train_ds},
                 {"syn": ArrayDataset(splits["val"], "syn")})
        return model, tr

    def test_distill_loss_is_wired_and_pulls_toward_teacher(
            self, teacher, splits):
        tmodel, tparams = teacher
        plain_ds = ArrayDataset(splits["train"], "syn")
        stamped = add_teacher_targets(tmodel, tparams, plain_ds)

        _, tr_plain = self._train_student(splits, plain_ds)
        smodel, tr_dist = self._train_student(splits, stamped)

        # aux must report the distillation terms (nonzero under distillation)
        from tpu_deer.data.pipeline import BatchIterator

        def epoch_aux(tr, ds):
            it = {"syn": BatchIterator(ds, 64, shuffle=True, drop_last=True,
                                       seed=0)}
            return tr.train_epoch(it, epoch=0)

        assert epoch_aux(tr_dist, stamped)["distill_mu"] > 0
        assert epoch_aux(tr_plain, plain_ds)["distill_mu"] == 0

        # the distilled student's predictions sit closer to the teacher's
        test = splits["test"]
        t_out = tmodel.apply({"params": tparams}, test["audio"],
                             test["video"], test["text"], deterministic=True)
        t_mu = np.asarray(t_out["mu_all"])

        def student_gap(tr):
            s_out = smodel.apply(
                {"params": tr.state.params}, test["audio"], test["video"],
                test["text"], deterministic=True)
            return float(np.mean(np.square(np.asarray(s_out["mu_all"]) - t_mu)))

        assert student_gap(tr_dist) < student_gap(tr_plain)

    def test_student_is_much_smaller(self, teacher):
        _, tparams = teacher
        smodel, sparams = create_complete_deer_model(STUDENT, seed=0)
        assert count_parameters(sparams) < 0.4 * count_parameters(tparams)


class TestEnsembleTeacher:
    def test_ensemble_stamp_matches_moment_matched_members(self, splits):
        """add_teacher_targets(ensemble=True) == moment matching over the
        per-member stamps (mu mean; unc mean + disagreement)."""
        from tpu_deer.train.ensemble import create_deer_ensemble

        model, stacked = create_deer_ensemble(TEACHER, n_members=3, seed=2)
        ds = ArrayDataset(splits["test"], "syn")
        combined = add_teacher_targets(
            model, stacked, ds, batch_size=64, ensemble=True
        )

        import jax

        member_mu, member_unc = [], []
        for k in range(3):
            pk = jax.tree_util.tree_map(lambda x: x[k], stacked)
            m = add_teacher_targets(model, pk, ds, batch_size=64)
            member_mu.append(m.arrays["teacher_mu"])
            member_unc.append(m.arrays["teacher_unc"])
        mu = np.mean(member_mu, axis=0)
        unc = np.mean(member_unc, axis=0) + np.var(member_mu, axis=0)
        np.testing.assert_allclose(
            combined.arrays["teacher_mu"], mu, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            combined.arrays["teacher_unc"], unc, rtol=1e-4, atol=1e-6
        )

    def test_student_trains_on_ensemble_targets(self, splits):
        """A student picks up ensemble-stamped targets through the normal
        distillation knobs (loss wiring end to end)."""
        from tpu_deer.train.ensemble import create_deer_ensemble

        model, stacked = create_deer_ensemble(TEACHER, n_members=2, seed=3)
        stamped = add_teacher_targets(
            model, stacked, ArrayDataset(splits["train"], "syn"),
            batch_size=64, ensemble=True,
        )
        smodel, sparams = create_complete_deer_model(STUDENT, seed=1)
        tr = DEERTrainer(
            smodel, sparams,
            TrainingConfig(learning_rate=3e-3, batch_size=64, num_epochs=2,
                           warmup_epochs=0, scheduler="constant",
                           distill_mu_weight=1.0, distill_unc_weight=0.5,
                           seed=1),
            steps_per_epoch=6,
        )
        out = tr.train({"syn": stamped},
                       {"syn": ArrayDataset(splits["val"], "syn")})
        assert np.isfinite(out["best_val_ccc"])
