"""Model tests: shapes, gradient flow, jittability, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.core import losses
from tpu_deer.models import (
    AdaptiveFusionGating,
    AttentionFusion,
    AudioSequenceEncoder,
    BilinearFusion,
    CompleteDEERModel,
    ConcatFusion,
    CrossModalAttention,
    DEERModelConfig,
    HierarchicalFusion,
    HierarchicalMultimodalFusion,
    ModalityEncoder,
    MultiDimensionalDEER,
    MultiHeadAttention,
    TextSequenceEncoder,
    UncertaintyAwareAttention,
    VideoSequenceEncoder,
    count_parameters,
    create_complete_deer_model,
    create_fusion_module,
)

B = 4
CFG = DEERModelConfig()


def _inputs(rng, batch=B):
    return (
        jnp.asarray(rng.normal(size=(batch, CFG.audio_dim)), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(batch, CFG.video_dim)), dtype=jnp.float32),
        jnp.asarray(rng.normal(size=(batch, CFG.text_dim)), dtype=jnp.float32),
    )


@pytest.fixture(scope="module")
def model_and_params():
    return create_complete_deer_model(seed=0)


class TestCompleteModel:
    def test_output_shapes(self, model_and_params, rng):
        model, params = model_and_params
        out = model.apply({"params": params}, *_inputs(rng))
        assert out["mu_all"].shape == (B, 3)
        assert out["uncertainty_all"].shape == (B, 3)
        assert out["calibrated_uncertainty"].shape == (B, 3)
        assert out["attention_weights"].shape == (B, 3)
        assert out["modality_uncertainties"].shape == (B, 3)
        for dim in ("valence", "arousal", "dominance"):
            assert out[f"{dim}_mu"].shape == (B, 1)
            assert np.all(np.asarray(out[f"{dim}_alpha"]) > 1)
            assert np.all(np.asarray(out[f"{dim}_nu"]) > 0)

    def test_attention_weights_normalized(self, model_and_params, rng):
        model, params = model_and_params
        out = model.apply({"params": params}, *_inputs(rng))
        np.testing.assert_allclose(
            np.asarray(out["attention_weights"]).sum(axis=1), 1.0, rtol=1e-5
        )

    def test_uncertainties_in_unit_interval(self, model_and_params, rng):
        model, params = model_and_params
        out = model.apply({"params": params}, *_inputs(rng))
        mu_unc = np.asarray(out["modality_uncertainties"])
        cal = np.asarray(out["calibrated_uncertainty"])
        assert np.all((mu_unc >= 0) & (mu_unc <= 1))
        assert np.all((cal >= 0) & (cal <= 1))

    def test_param_count_near_reference(self, model_and_params):
        """Reference claims ~12M params (README.md:30); same ballpark expected."""
        _, params = model_and_params
        n = count_parameters(params)
        assert 2_000_000 < n < 30_000_000, n

    def test_jit_and_grad(self, model_and_params, rng):
        model, params = model_and_params
        a, v, t = _inputs(rng)
        y = jnp.asarray(np.tanh(rng.normal(size=(B, 3))), dtype=jnp.float32)

        @jax.jit
        def loss_fn(params):
            out = model.apply({"params": params}, a, v, t)
            ps = [out[f"{n}_params"] for n in ("valence", "arousal", "dominance")]
            return losses.multi_task_deer_loss(ps, y)["total_loss"]

        val, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(val))
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        assert all(np.all(np.isfinite(np.asarray(g))) for _, g in flat)
        # Gradient must reach every parameter EXCEPT the mathematically-dead
        # ones: q/k projections under seq-len-1 attention (softmax over one
        # key is constant) and the calibration layer (not in this loss — the
        # trainer adds a calibration-alignment term; see test below).
        for path, g in flat:
            key = jax.tree_util.keystr(path)
            expected_dead = (
                "calibration" in key
                or ("attention" in key and ("q_proj" in key or "k_proj" in key))
            )
            if not expected_dead:
                assert np.any(np.asarray(g) != 0), f"dead gradient at {key}"

    def test_calibration_params_trainable_with_alignment_loss(
        self, model_and_params, rng
    ):
        model, params = model_and_params
        a, v, t = _inputs(rng)
        y = jnp.asarray(np.tanh(rng.normal(size=(B, 3))), dtype=jnp.float32)

        def loss_fn(params):
            out = model.apply({"params": params}, a, v, t)
            err = jnp.abs(out["mu_all"] - y)
            return jnp.mean(jnp.square(out["calibrated_uncertainty"] - err))

        grads = jax.grad(loss_fn)(params)
        cal = grads["calibration"]
        assert any(
            np.any(np.asarray(g) != 0) for g in jax.tree_util.tree_leaves(cal)
        )

    def test_calibration_is_monotone_for_any_params(self, rng):
        # Regression: an unconstrained calibration map learned a DECREASING
        # function of raw uncertainty in round-2 sweeps, inverting the
        # uncertainty ranking (r(calibrated) == -r(raw)). The layer is now
        # monotone nondecreasing by construction — for ANY parameter values.
        from tpu_deer.models.heads import UncertaintyCalibrationLayer

        layer = UncertaintyCalibrationLayer(3)
        u = jnp.asarray(rng.uniform(0.01, 5.0, (64, 3)), jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), u)
        adversarial = jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                np.random.default_rng(1).standard_normal(x.shape), x.dtype
            )
            * 2.0,
            params,
        )
        for p in (params, adversarial):
            cal = layer.apply(p, u)
            for d in range(3):
                order = jnp.argsort(u[:, d])
                assert bool(jnp.all(jnp.diff(cal[order, d]) >= -1e-7))

    def test_calibration_input_is_stop_gradiented(self, model_and_params, rng):
        # The alignment loss trains the calibration layer only; it must not
        # reach back into the evidence heads through the calibrated output.
        model, params = model_and_params
        a, v, t = _inputs(rng)
        y = jnp.asarray(np.tanh(rng.normal(size=(B, 3))), dtype=jnp.float32)

        def cal_only_loss(params):
            out = model.apply({"params": params}, a, v, t)
            err = jax.lax.stop_gradient(jnp.abs(out["mu_all"] - y))
            return jnp.mean(jnp.square(out["calibrated_uncertainty"] - err))

        grads = jax.grad(cal_only_loss)(params)
        for key, sub in grads.items():
            leaves = jax.tree_util.tree_leaves(sub)
            nonzero = any(np.any(np.asarray(g) != 0) for g in leaves)
            if key == "calibration":
                assert nonzero
            else:
                assert not nonzero, f"alignment loss leaked into {key}"

    def test_dropout_train_mode_stochastic(self, model_and_params, rng):
        model, params = model_and_params
        a, v, t = _inputs(rng)
        out1 = model.apply(
            {"params": params}, a, v, t, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        out2 = model.apply(
            {"params": params}, a, v, t, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert not np.allclose(np.asarray(out1["mu_all"]), np.asarray(out2["mu_all"]))

    def test_eval_mode_deterministic(self, model_and_params, rng):
        model, params = model_and_params
        a, v, t = _inputs(rng)
        o1 = model.apply({"params": params}, a, v, t)
        o2 = model.apply({"params": params}, a, v, t)
        np.testing.assert_array_equal(np.asarray(o1["mu_all"]), np.asarray(o2["mu_all"]))


class TestComponents:
    def test_modality_encoder_shape(self, rng):
        enc = ModalityEncoder(output_dim=256)
        x = jnp.asarray(rng.normal(size=(B, 84)), dtype=jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)["params"]
        assert enc.apply({"params": params}, x).shape == (B, 256)

    def test_mha_seq(self, rng):
        mha = MultiHeadAttention(64, num_heads=4)
        x = jnp.asarray(rng.normal(size=(B, 7, 64)), dtype=jnp.float32)
        params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
        out = mha.apply({"params": params}, x, x, x)
        assert out.shape == (B, 7, 64)

    def test_mha_mask(self, rng):
        """Masked positions must not affect the output."""
        mha = MultiHeadAttention(32, num_heads=4, dropout=0.0)
        x = jnp.asarray(rng.normal(size=(1, 5, 32)), dtype=jnp.float32)
        params = mha.init(jax.random.PRNGKey(0), x, x, x)["params"]
        mask = jnp.asarray([[True, True, True, False, False]])[:, None, None, :]
        out1 = mha.apply({"params": params}, x[:, :1], x, x, mask=mask)
        x_perturbed = x.at[:, 3:].set(99.0)
        out2 = mha.apply({"params": params}, x_perturbed[:, :1], x_perturbed, x_perturbed, mask=mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_uncertainty_aware_attention(self, rng):
        mod = UncertaintyAwareAttention(feature_dim=64, num_heads=4)
        a = jnp.asarray(rng.normal(size=(B, 64)), dtype=jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), a, a, a)["params"]
        out = mod.apply({"params": params}, a, a, a)
        assert out["audio"].shape == (B, 64)
        assert out["attention_weights"].shape == (B, 3)

    def test_cross_modal_attention(self, rng):
        mod = CrossModalAttention(feature_dim=64, num_heads=4)
        x = jnp.asarray(rng.normal(size=(B, 64)), dtype=jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x, x, x)["params"]
        a_att, v_att, gate = mod.apply({"params": params}, x, x, x)
        assert a_att.shape == (B, 64)
        np.testing.assert_allclose(np.asarray(gate).sum(axis=1), 1.0, rtol=1e-5)

    def test_multi_dimensional_deer(self, rng):
        mod = MultiDimensionalDEER(input_dim=128, hidden_dim=64)
        x = jnp.asarray(rng.normal(size=(B, 128)), dtype=jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        out = mod.apply({"params": params}, x)
        assert out["mu_all"].shape == (B, 3)
        assert out["valence_params"].mu.shape == (B, 1)


class TestFusionZoo:
    def _mods(self, rng, dims=(64, 64, 64)):
        return [
            jnp.asarray(rng.normal(size=(B, d)), dtype=jnp.float32) for d in dims
        ]

    def test_hierarchical_gated(self, rng):
        mod = HierarchicalFusion(feature_dim=64, fusion_dim=128)
        a, v, t = self._mods(rng)
        params = mod.init(jax.random.PRNGKey(0), a, v, t)["params"]
        assert mod.apply({"params": params}, a, v, t).shape == (B, 128)

    def test_hierarchical_multimodal(self, rng):
        mod = HierarchicalMultimodalFusion(
            audio_dim=64, video_dim=64, text_dim=64, output_dim=128, num_heads=4
        )
        a, v, t = self._mods(rng)
        u = jnp.abs(jnp.asarray(rng.normal(size=(B, 2)), dtype=jnp.float32))
        params = mod.init(jax.random.PRNGKey(0), a, v, t, u)["params"]
        out = mod.apply({"params": params}, a, v, t, u)
        assert out["fused"].shape == (B, 128)
        assert out["av_attention"].shape == (B, 2)

    @pytest.mark.parametrize(
        "cls", [AttentionFusion, BilinearFusion, ConcatFusion, AdaptiveFusionGating]
    )
    def test_simple_fusions(self, rng, cls):
        mods = self._mods(rng)
        mod = cls(input_dims=(64, 64, 64), output_dim=96)
        params = mod.init(jax.random.PRNGKey(0), mods)["params"]
        assert mod.apply({"params": params}, mods).shape == (B, 96)

    @pytest.mark.parametrize(
        "kind", ["hierarchical", "attention", "bilinear", "adaptive", "moe",
                 "concat"]
    )
    def test_factory(self, rng, kind):
        mod = create_fusion_module(kind, (64, 64, 64), 128)
        assert mod is not None


class TestFusionTypeKnob:
    """DEERModelConfig(fusion_type=...) routes the flagship through the
    fusion zoo; default stays the reference-parity hierarchical path."""

    def _cfg(self, **kw):
        from tpu_deer.models.deer_model import DEERModelConfig

        return DEERModelConfig(
            audio_dim=8, video_dim=8, text_dim=8, encoder_dim=16,
            fusion_dim=32, attention_heads=2, encoder_layers=1, **kw
        )

    @pytest.mark.parametrize("kind", ["attention", "bilinear", "moe"])
    def test_zoo_fusion_forward(self, rng, kind):
        from tpu_deer.models.deer_model import create_complete_deer_model

        model, params = create_complete_deer_model(
            self._cfg(fusion_type=kind), seed=0
        )
        a = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
        out = model.apply({"params": params}, a, a, a, deterministic=True)
        assert out["mu_all"].shape == (4, 3)
        assert np.all(np.isfinite(np.asarray(out["mu_all"])))
        if kind == "moe":
            experts = params["fusion"]["experts"]
            for leaf in jax.tree_util.tree_leaves(experts):
                assert leaf.shape[0] == 4  # default moe_experts

    def test_default_param_structure_unchanged(self):
        """fusion_type must default to the parity hierarchical fusion so
        existing checkpoints keep loading."""
        from tpu_deer.models.deer_model import create_complete_deer_model

        _, params = create_complete_deer_model(self._cfg(), seed=0)
        assert "av_fusion_in" in params["fusion"]

    def test_moe_flagship_trains(self, rng):
        """A few DEERTrainer steps on the MoE-fused flagship reduce loss."""
        from tpu_deer.data.pipeline import ArrayDataset
        from tpu_deer.data.synthetic import (
            SyntheticConfig,
            make_synthetic_splits,
        )
        from tpu_deer.models.deer_model import create_complete_deer_model
        from tpu_deer.train.trainer import DEERTrainer, TrainingConfig

        cfg = self._cfg(fusion_type="moe", moe_experts=2, dropout=0.0)
        model, params = create_complete_deer_model(cfg, seed=0)
        splits = make_synthetic_splits(
            SyntheticConfig(
                n_train=256, n_val=32, n_test=32,
                audio_dim=8, video_dim=8, text_dim=8,
            )
        )
        from tpu_deer.data.pipeline import BatchIterator

        ds = ArrayDataset(splits["train"], "syn")
        trainer = DEERTrainer(
            model, params,
            TrainingConfig(
                batch_size=64, num_epochs=6, learning_rate=3e-3,
                scheduler="constant", warmup_epochs=0,
            ),
            steps_per_epoch=4,
        )
        its = {"syn": BatchIterator(ds, 64, shuffle=True, seed=0)}
        first = trainer.train_epoch(its, 0)["loss"]
        for e in range(1, 6):
            last = trainer.train_epoch(its, e)["loss"]
        assert last < first, f"MoE flagship failed to learn: {first}->{last}"


class TestSequenceEncoders:
    def test_audio_encoder(self, rng):
        enc = AudioSequenceEncoder(output_dim=128, lstm_hidden=32, lstm_layers=1)
        x = jnp.asarray(rng.normal(size=(2, 20, 84)), dtype=jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)["params"]
        out, attn = enc.apply({"params": params}, x)
        assert out.shape == (2, 128)
        assert attn.shape == (2, 20)
        np.testing.assert_allclose(np.asarray(attn).sum(axis=1), 1.0, rtol=1e-5)

    def test_video_encoder(self, rng):
        enc = VideoSequenceEncoder(output_dim=64, conv_features=(8, 16))
        x = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), dtype=jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)["params"]
        out, _ = enc.apply({"params": params}, x)
        assert out.shape == (2, 64)

    def test_text_encoder_with_mask(self, rng):
        enc = TextSequenceEncoder(
            vocab_size=100, output_dim=64, model_dim=32, num_layers=1, num_heads=4
        )
        ids = jnp.asarray(rng.integers(0, 100, size=(2, 12)), dtype=jnp.int32)
        mask = jnp.ones((2, 12), dtype=jnp.int32).at[:, 8:].set(0)
        params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
        out, attn = enc.apply({"params": params}, ids, mask)
        assert out.shape == (2, 64)
        # Masked positions get ~zero pooling weight.
        assert np.all(np.asarray(attn)[:, 8:] < 1e-6)
