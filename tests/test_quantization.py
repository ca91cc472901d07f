"""Int8 weight quantization tests: roundtrip, model accuracy, Pallas kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.ops.quantization import (
    dequantize_tree,
    quantize_int8_stochastic,
    quantize_tree,
    quantized_size_bytes,
)

CFG = DEERModelConfig(
    audio_dim=16, video_dim=16, text_dim=16, encoder_dim=32, fusion_dim=64,
    attention_heads=4, encoder_layers=1,
)


class TestQuantizeTree:
    def test_roundtrip_error_small(self, rng):
        _, params = create_complete_deer_model(CFG, seed=0)
        q, scales = quantize_tree(params)
        deq = dequantize_tree(q, scales)
        for orig, rec in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(deq)
        ):
            orig = np.asarray(orig)
            rec = np.asarray(rec)
            if orig.ndim == 2 and orig.shape[0] >= 8:
                scale = np.abs(orig).max(axis=0) / 127.0
                # max error ≤ half a quantization step per channel
                assert np.all(np.abs(orig - rec) <= 0.51 * scale[None, :] + 1e-8)
            else:
                np.testing.assert_array_equal(orig, rec)

    def test_size_reduction(self):
        _, params = create_complete_deer_model(CFG, seed=0)
        q, _ = quantize_tree(params)
        orig = sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(params))
        assert quantized_size_bytes(q) < 0.4 * orig  # most weight is kernels

    def test_model_predictions_survive_quantization(self, rng):
        model, params = create_complete_deer_model(CFG, seed=0)
        a = jnp.asarray(rng.normal(size=(8, 16)), dtype=jnp.float32)
        ref = model.apply({"params": params}, a, a, a)["mu_all"]
        deq = dequantize_tree(*quantize_tree(params))
        got = model.apply({"params": deq}, a, a, a)["mu_all"]
        # int8 per-channel: predictions shift only slightly
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), atol=0.05
        )


class TestStochasticKernel:
    def test_unbiased_and_in_range(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        values, scale = quantize_int8_stochastic(w, seed=1)
        v = np.asarray(values, dtype=np.float32)
        s = float(np.asarray(scale)[0, 0])
        assert v.min() >= -128 and v.max() <= 127
        # Dequantized mean error ~0 (stochastic rounding is unbiased)
        err = v * s - np.asarray(w)
        assert abs(err.mean()) < s * 0.05
        assert np.abs(err).max() <= s * 1.01


class TestStackedQuantization:
    def test_stacked_roundtrip_per_member_scales(self, rng):
        """Ensemble-stacked 3-D kernels quantize with per-member
        per-channel scales ([K, out]) over the contraction axis."""
        from tpu_deer.train.ensemble import create_deer_ensemble

        _, stacked = create_deer_ensemble(CFG, n_members=3, seed=0)
        q, scales = quantize_tree(stacked, member_stacked=True)
        deq = dequantize_tree(q, scales)
        quantized_kernels = 0
        for orig, rec, s in zip(
            jax.tree_util.tree_leaves(stacked),
            jax.tree_util.tree_leaves(deq),
            jax.tree_util.tree_leaves(scales),
        ):
            orig, rec = np.asarray(orig), np.asarray(rec)
            if np.asarray(s).size and orig.ndim == 3:
                quantized_kernels += 1
                assert np.asarray(s).shape == (3, orig.shape[-1])
                step = np.abs(orig).max(axis=-2, keepdims=True) / 127.0
                assert np.all(np.abs(orig - rec) <= 0.51 * step + 1e-8)
        assert quantized_kernels > 0

    def test_stacked_equals_per_member_quantization(self, rng):
        """Quantizing the stack == quantizing each member separately (the
        member axis must not leak into the scales)."""
        from tpu_deer.train.ensemble import create_deer_ensemble

        _, stacked = create_deer_ensemble(CFG, n_members=2, seed=1)
        deq_stacked = dequantize_tree(*quantize_tree(stacked, member_stacked=True))
        for k in range(2):
            member = jax.tree_util.tree_map(lambda x: np.asarray(x)[k], stacked)
            deq_member = dequantize_tree(*quantize_tree(member))
            for a, b in zip(
                jax.tree_util.tree_leaves(deq_member),
                jax.tree_util.tree_leaves(deq_stacked),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b)[k], rtol=1e-6, atol=1e-7
                )

    def test_plain_tree_3d_kernels_pass_through(self):
        """Without member_stacked, 3-D kernels (e.g. BilinearFusion's
        bilinear_kernel, whose contraction axes are NOT -2) must stay
        float — regression for the over-widened _is_quantizable."""
        cfg = DEERModelConfig(
            audio_dim=16, video_dim=16, text_dim=16, encoder_dim=24,
            fusion_dim=32, attention_heads=2, encoder_layers=1,
            fusion_type="bilinear",
        )
        _, params = create_complete_deer_model(cfg, seed=0)
        q, scales = quantize_tree(params)
        found_3d = 0
        for ql, s in zip(
            jax.tree_util.tree_leaves(q), jax.tree_util.tree_leaves(scales)
        ):
            if np.asarray(ql).ndim == 3:
                found_3d += 1
                assert np.asarray(ql).dtype != np.int8
                assert np.asarray(s).size == 0
        assert found_3d > 0, "fixture lost its 3-D bilinear kernel"
