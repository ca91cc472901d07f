"""Streaming recognizer tests: incremental features converge to the offline
extractor, state is exact across resets, multi-stream rows are independent."""

import numpy as np
import pytest

from tpu_deer.models.deer_model import DEERModelConfig, create_complete_deer_model
from tpu_deer.ops.audio_frontend import (
    AudioFrontendConfig,
    extract_utterance_features,
)
from tpu_deer.stream import (
    StreamingConfig,
    StreamingRecognizer,
    init_stream_state,
    streaming_update,
)

FE = AudioFrontendConfig(n_fft=512, hop_length=128)
SC = StreamingConfig(frontend=FE, chunk_samples=2048)


def _speech_like(rng, seconds=2.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    f0 = 140.0 + 40.0 * np.sin(2 * np.pi * 0.7 * t)
    sig = np.zeros_like(t)
    for h in range(1, 5):
        sig += np.sin(2 * np.pi * h * np.cumsum(f0) / sr) / h
    sig *= 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t) ** 2  # energy modulation
    return (sig + 0.05 * rng.normal(size=t.shape)).astype(np.float32)


class TestStreamingFeatures:
    def test_converges_to_offline_extractor(self, rng):
        sig = _speech_like(rng, seconds=2.0)
        n_chunks = len(sig) // SC.chunk_samples
        state = init_stream_state(SC)
        for i in range(n_chunks):
            chunk = sig[i * SC.chunk_samples : (i + 1) * SC.chunk_samples]
            state, feats = streaming_update(state, chunk, SC)
        offline = np.asarray(
            extract_utterance_features(sig[: n_chunks * SC.chunk_samples], FE)
        )
        feats = np.asarray(feats)
        # Normalized 84-d vectors; streaming differs only in edge handling.
        corr = np.corrcoef(feats, offline)[0, 1]
        assert corr > 0.99, corr
        assert np.abs(feats - offline).mean() < 0.1

    def test_chunking_invariance(self, rng):
        """Same audio split into different chunk counts → same final stats."""
        sig = _speech_like(rng, seconds=1.0)
        sig = sig[: 4 * SC.chunk_samples]

        def run(chunk_samples):
            sc = StreamingConfig(frontend=FE, chunk_samples=chunk_samples)
            state = init_stream_state(sc)
            for i in range(len(sig) // chunk_samples):
                state, feats = streaming_update(
                    state, sig[i * chunk_samples : (i + 1) * chunk_samples], sc
                )
            return np.asarray(feats)

        np.testing.assert_allclose(run(2048), run(1024), atol=1e-4)

    def test_config_validation(self):
        with pytest.raises(ValueError):
            StreamingConfig(frontend=FE, chunk_samples=100)  # not hop multiple
        with pytest.raises(ValueError):
            StreamingConfig(frontend=FE, chunk_samples=128)  # < n_fft


CFG = DEERModelConfig(
    audio_dim=84, video_dim=8, text_dim=8, encoder_dim=16, fusion_dim=32,
    attention_heads=2, encoder_layers=1,
)


@pytest.fixture(scope="module")
def recognizer():
    model, params = create_complete_deer_model(CFG, seed=0)
    return StreamingRecognizer(model, params, n_streams=3, cfg=SC)


class TestStreamingRecognizer:
    def test_push_shapes(self, recognizer, rng):
        chunks = rng.normal(size=(3, SC.chunk_samples)).astype(np.float32)
        out = recognizer.push(chunks)
        assert out["mu"].shape == (3, 3)
        assert out["features"].shape == (3, 84)
        assert np.all(np.isfinite(out["mu"]))
        assert np.all(out["calibrated_uncertainty"] >= 0)

    def test_streams_independent_and_reset(self, rng):
        model, params = create_complete_deer_model(CFG, seed=0)
        rec = StreamingRecognizer(model, params, n_streams=3, cfg=SC)
        sig_a = _speech_like(rng, seconds=1.0)[: 2 * SC.chunk_samples]
        sig_b = rng.normal(size=2 * SC.chunk_samples).astype(np.float32)

        # Stream 0 gets A, streams 1,2 get B.
        for i in range(2):
            s = slice(i * SC.chunk_samples, (i + 1) * SC.chunk_samples)
            out = rec.push(np.stack([sig_a[s], sig_b[s], sig_b[s]]))
        # Identical inputs → identical rows; different input → different row.
        np.testing.assert_allclose(
            out["features"][1], out["features"][2], atol=1e-6
        )
        assert np.abs(out["features"][0] - out["features"][1]).max() > 1e-3

        # Reset stream 1 only; replaying A from scratch on it must match
        # stream 0's first-push result computed on a fresh recognizer.
        rec.reset_streams([1])
        fresh = StreamingRecognizer(model, params, n_streams=3, cfg=SC)
        s0 = slice(0, SC.chunk_samples)
        out_fresh = fresh.push(np.stack([sig_a[s0]] * 3))
        out_replay = rec.push(np.stack([sig_b[s0], sig_a[s0], sig_b[s0]]))
        np.testing.assert_allclose(
            out_replay["features"][1], out_fresh["features"][0], atol=1e-5
        )

    def test_bad_shape_raises(self, recognizer):
        with pytest.raises(ValueError):
            recognizer.push(np.zeros((2, SC.chunk_samples), np.float32))


class TestStreamingOOD:
    def test_push_scores_match_host_detector(self, rng):
        from tpu_deer.eval.ood import MahalanobisOOD

        model, params = create_complete_deer_model(CFG, seed=0)
        # Fit on the distribution the sessions will carry: streaming-style
        # 84-d features + zeroed context (audio-only sessions).
        fit_feats = rng.normal(size=(256, 84)).astype(np.float32)
        zeros = np.zeros((256, 8), np.float32)
        det = MahalanobisOOD().fit_modalities(fit_feats, zeros, zeros)
        rec = StreamingRecognizer(
            model, params, n_streams=3, cfg=SC, ood_detector=det,
            ood_fpr=0.05,
        )
        assert rec.ood_threshold == pytest.approx(det.threshold(0.05))
        chunks = rng.normal(size=(3, SC.chunk_samples)).astype(np.float32)
        out = rec.push(chunks)
        assert out["ood_score"].shape == (3,)
        want = det.score_modalities(
            out["features"], np.zeros((3, 8)), np.zeros((3, 8))
        )
        np.testing.assert_allclose(out["ood_score"], want, rtol=5e-4)

    def test_fused_space_detector_rejected(self, rng):
        from tpu_deer.eval.ood import MahalanobisOOD

        model, params = create_complete_deer_model(CFG, seed=0)
        det = MahalanobisOOD().fit(rng.normal(size=(64, 8)))
        with pytest.raises(ValueError, match="input_norm"):
            StreamingRecognizer(
                model, params, n_streams=2, cfg=SC, ood_detector=det
            )

    def test_no_detector_no_key(self, recognizer, rng):
        out = recognizer.push(
            rng.normal(size=(3, SC.chunk_samples)).astype(np.float32)
        )
        assert "ood_score" not in out


class TestMaskedPush:
    def test_inactive_slots_keep_state(self, rng):
        model, params = create_complete_deer_model(CFG, seed=0)
        rec = StreamingRecognizer(model, params, n_streams=3, cfg=SC)
        sig = _speech_like(rng, seconds=1.0)[: 2 * SC.chunk_samples]
        c0 = sig[: SC.chunk_samples]
        c1 = sig[SC.chunk_samples :]

        out0 = rec.push(np.stack([c0, c0, c0]))
        # Tick 2: only stream 0 consumes; 1 and 2 are inactive.
        out1 = rec.push(
            np.stack([c1, c1, c1]),
            active=np.array([True, False, False]),
        )
        # Inactive streams' features are unchanged from tick 1.
        np.testing.assert_allclose(
            out1["features"][1], out0["features"][1], atol=1e-6
        )
        np.testing.assert_allclose(
            out1["features"][2], out0["features"][2], atol=1e-6
        )
        # The active stream advanced.
        assert np.abs(out1["features"][0] - out0["features"][0]).max() > 1e-3
        # Stream 1 consuming c1 later matches what stream 0 got at tick 2
        # (same audio, different arrival ticks).
        out2 = rec.push(
            np.stack([c1, c1, c1]),
            active=np.array([False, True, False]),
        )
        np.testing.assert_allclose(
            out2["features"][1], out1["features"][0], atol=1e-5
        )


class TestMomentStability:
    def test_welford_merge_survives_long_high_offset_streams(self):
        """Running (mean, M2) moments must keep the variance where naive f32
        sum-of-squares catastrophically cancels: mean >> std over ~1e5
        samples (a long-lived session)."""
        import jax.numpy as jnp

        from tpu_deer.stream import _mean_std, _merge_moments

        rng = np.random.default_rng(0)
        F, D, K = 64, 4, 2000  # 128k samples total
        true_mean, true_std = 1000.0, 0.1
        stats = jnp.zeros((2, D), jnp.float32)
        naive = np.zeros((2, D), np.float32)  # f32 sum / sumsq comparison
        n = jnp.zeros(())
        w = np.ones((F, 1), np.float32)
        for _ in range(K):
            x = rng.normal(true_mean, true_std, size=(F, D)).astype(np.float32)
            stats = _merge_moments(stats, n, jnp.asarray(x), jnp.asarray(w),
                                   float(F))
            n = n + F
            naive[0] += x.sum(0)
            naive[1] += (x.astype(np.float32) ** 2).sum(0)
        mean, std = _mean_std(stats, n)
        np.testing.assert_allclose(np.asarray(mean), true_mean, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(std), true_std, rtol=0.05)
        # The naive f32 estimate has already lost the signal: it collapses
        # to 0 or to cancellation noise (>50% relative error everywhere).
        total = float(n)
        naive_var = naive[1] / total - (naive[0] / total) ** 2
        naive_std = np.sqrt(np.maximum(naive_var, 0.0))
        rel_err = np.abs(naive_std - true_std) / true_std
        assert np.all(rel_err > 0.5), naive_std

    def test_empty_voiced_batch_keeps_stats(self):
        import jax.numpy as jnp

        from tpu_deer.stream import _merge_moments

        stats = jnp.asarray([[5.0], [2.0]])
        out = _merge_moments(stats, jnp.asarray(10.0), jnp.zeros((4, 1)),
                             jnp.zeros((4, 1)), jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(stats))
