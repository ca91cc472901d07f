"""Inference engine tests: bucketing, checkpoint loading, prediction contract."""

import numpy as np
import pytest

from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.serve import InferenceEngine

CFG = DEERModelConfig(
    audio_dim=8, video_dim=8, text_dim=8, encoder_dim=16, fusion_dim=32,
    attention_heads=2, encoder_layers=1,
)


@pytest.fixture(scope="module")
def engine():
    model, params = create_complete_deer_model(CFG, seed=0)
    return InferenceEngine(model, params, batch_buckets=(1, 4, 16))


def _req(rng, n):
    return (
        rng.normal(size=(n, 8)).astype(np.float32),
        rng.normal(size=(n, 8)).astype(np.float32),
        rng.normal(size=(n, 8)).astype(np.float32),
    )


class TestInferenceEngine:
    def test_single_sample(self, engine, rng):
        out = engine.predict(*_req(rng, 1))
        assert out["mu"].shape == (1, 3)
        assert out["calibrated_uncertainty"].shape == (1, 3)
        assert np.all(out["aleatoric"] > 0)
        assert np.all(out["epistemic"] > 0)
        # closed-form E|err| channel: positive, |error| units — far below
        # the variance-units total for this untrained model
        assert out["expected_abs_error"].shape == (1, 3)
        assert np.all(out["expected_abs_error"] > 0)
        assert np.all(np.isfinite(out["expected_abs_error"]))

    def test_bucket_padding_consistency(self, engine, rng):
        """Padding to a bucket must not change real rows' results."""
        a, v, t = _req(rng, 3)  # pads to bucket 4
        out3 = engine.predict(a, v, t)
        out1 = engine.predict(a[:1], v[:1], t[:1])  # bucket 1
        np.testing.assert_allclose(out3["mu"][0], out1["mu"][0], atol=1e-5)

    def test_oversized_request_chunks(self, engine, rng):
        out = engine.predict(*_req(rng, 40))  # > max bucket 16
        assert out["mu"].shape == (40, 3)

    def test_warmup(self, engine):
        engine.warmup()  # no error; compiles all buckets

    def test_from_checkpoint(self, tmp_path, rng):
        from tpu_deer.data.pipeline import ArrayDataset
        from tpu_deer.data.synthetic import SyntheticConfig, make_synthetic_splits
        from tpu_deer.train.checkpoint import CheckpointManager
        from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

        splits = make_synthetic_splits(
            SyntheticConfig(n_train=64, n_val=32, n_test=0, audio_dim=8,
                            video_dim=8, text_dim=8)
        )
        model, params = create_complete_deer_model(CFG, seed=0)
        trainer = DEERTrainer(
            model, params,
            TrainingConfig(batch_size=32, num_epochs=1, warmup_epochs=0),
            steps_per_epoch=2,
        )
        ckpt = CheckpointManager(str(tmp_path))
        trainer.train(
            {"s": ArrayDataset(splits["train"], "s")},
            {"s": ArrayDataset(splits["val"], "s")},
            checkpoints=ckpt,
        )
        engine = InferenceEngine.from_checkpoint(
            str(tmp_path), CFG, batch_buckets=(1, 4)
        )
        out = engine.predict(*_req(rng, 2))
        assert out["mu"].shape == (2, 3)
        # Engine predictions match the trained trainer's eval path.
        a, v, t = _req(rng, 2)
        eng = engine.predict(a, v, t)
        import jax.numpy as jnp

        direct = trainer.model.apply(
            {"params": trainer.state.params},
            jnp.asarray(a), jnp.asarray(v), jnp.asarray(t),
            deterministic=True,
        )
        np.testing.assert_allclose(
            eng["mu"], np.asarray(direct["mu_all"]), atol=1e-5
        )
        # The engine serves the channel the trainer selected by validation
        # ECE at checkpoint time (recorded in the checkpoint metadata).
        meta = ckpt.metadata(step="best")["metrics"]
        assert meta["serving_channel"] in ("calibrated", "eabs")
        assert engine.serving_channel == meta["serving_channel"]

    def test_serving_channel_validated(self):
        model, params = create_complete_deer_model(CFG, seed=0)
        with pytest.raises(ValueError, match="serving_channel"):
            InferenceEngine(model, params, serving_channel="moment")


class TestQuantizedServing:
    def test_quantized_engine_close_to_float(self, engine, rng):
        model, params = create_complete_deer_model(CFG, seed=0)
        q_engine = InferenceEngine(
            model, params, batch_buckets=(1, 4), quantize_weights=True
        )
        a, v, t = _req(rng, 4)
        ref = engine.predict(a, v, t)
        got = q_engine.predict(a, v, t)
        np.testing.assert_allclose(ref["mu"], got["mu"], atol=0.05)

    def test_quantized_weights_are_int8_on_device(self, rng):
        """The int8 path must hold int8 buffers on device (HBM savings are
        the point) — not dequantized float copies."""
        import jax

        model, params = create_complete_deer_model(CFG, seed=0)
        q_engine = InferenceEngine(
            model, params, batch_buckets=(1,), quantize_weights=True
        )
        assert q_engine.quantized
        q_tree, scale_tree = q_engine.params
        dtypes = {l.dtype for l in jax.tree_util.tree_leaves(q_tree)}
        assert np.dtype(np.int8) in dtypes
        # every quantized kernel has a matching per-channel scale
        for q, s in zip(
            jax.tree_util.tree_leaves(q_tree),
            jax.tree_util.tree_leaves(scale_tree),
        ):
            if q.dtype == np.int8:
                assert s.shape == (q.shape[1],)
        out = q_engine.predict(*_req(rng, 1))
        assert np.all(np.isfinite(out["mu"]))


class TestEnsembleServing:
    @pytest.fixture(scope="class")
    def ens(self):
        from tpu_deer.train.ensemble import create_deer_ensemble

        model, stacked = create_deer_ensemble(CFG, n_members=3, seed=0)
        return model, stacked

    def test_combined_matches_member_moment_matching(self, ens, rng):
        """Served ensemble output == moment matching over K single-member
        engines (same formulas as EnsembleTrainer's eval)."""
        import jax

        model, stacked = ens
        engine = InferenceEngine(
            model, stacked, batch_buckets=(1, 4, 16), ensemble=True
        )
        a, v, t = _req(rng, 4)
        out = engine.predict(a, v, t)
        assert out["mu"].shape == (4, 3)

        member_out = []
        for k in range(3):
            pk = jax.tree_util.tree_map(lambda x: x[k], stacked)
            ek = InferenceEngine(model, pk, batch_buckets=(4,))
            member_out.append(ek.predict(a, v, t))
        mu = np.mean([m["mu"] for m in member_out], axis=0)
        alea = np.mean([m["aleatoric"] for m in member_out], axis=0)
        dis = np.var([m["mu"] for m in member_out], axis=0)
        epi = np.mean([m["epistemic"] for m in member_out], axis=0) + dis
        np.testing.assert_allclose(out["mu"], mu, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out["aleatoric"], alea, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out["epistemic"], epi, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            out["uncertainty"], alea + epi, rtol=1e-4, atol=1e-6
        )
        # Variance-space combination: MADs don't add linearly for
        # independent spread (the linear sum over-forecasts |err|).
        eabs = np.sqrt(
            np.mean([m["expected_abs_error"] for m in member_out], axis=0)
            ** 2
            + 2.0 / np.pi * dis
        )
        np.testing.assert_allclose(
            out["expected_abs_error"], eabs, rtol=1e-4, atol=1e-6
        )

    def test_rejects_unstacked_params(self):
        model, params = create_complete_deer_model(CFG, seed=0)
        with pytest.raises(ValueError, match="stacked member tree"):
            InferenceEngine(model, params, ensemble=True)

    def test_int8_ensemble_close_to_float(self, ens, rng):
        """int8 ensemble serving: per-member per-channel scales keep the
        combined prediction within quantization noise of float serving."""
        model, stacked = ens
        f_eng = InferenceEngine(model, stacked, batch_buckets=(4,),
                                ensemble=True)
        q_eng = InferenceEngine(model, stacked, batch_buckets=(4,),
                                ensemble=True, quantize_weights=True)
        a, v, t = _req(rng, 4)
        f_out = f_eng.predict(a, v, t)
        q_out = q_eng.predict(a, v, t)
        np.testing.assert_allclose(q_out["mu"], f_out["mu"], atol=0.05)
        np.testing.assert_allclose(
            q_out["uncertainty"], f_out["uncertainty"], rtol=0.1, atol=0.05
        )

    def test_from_checkpoint_ensemble(self, ens, tmp_path, rng):
        from tpu_deer.train.checkpoint import CheckpointManager
        from tpu_deer.train.ensemble import EnsembleTrainer
        from tpu_deer.train.trainer import TrainingConfig

        model, stacked = ens
        tr = EnsembleTrainer(
            model, stacked,
            TrainingConfig(batch_size=32, num_epochs=1, warmup_epochs=0),
            steps_per_epoch=2,
        )
        ckpt = CheckpointManager(str(tmp_path))
        ckpt.save(tr.state, step=1)
        engine = InferenceEngine.from_checkpoint(
            str(tmp_path), config=CFG, step=1, ensemble_members=3,
            batch_buckets=(4,),
        )
        assert engine.ensemble
        out = engine.predict(*_req(rng, 4))
        assert out["mu"].shape == (4, 3)
        # restored == the trainer's own stacked params (same combined mu)
        direct = InferenceEngine(
            model, tr.state.params, batch_buckets=(4,), ensemble=True
        )
        a, v, t = _req(rng, 4)
        np.testing.assert_allclose(
            engine.predict(a, v, t)["mu"], direct.predict(a, v, t)["mu"],
            rtol=1e-5, atol=1e-6,
        )
