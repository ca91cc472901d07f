"""Audio front-end tests: DSP bases vs scipy/numpy, Pallas vs XLA equality,
F0 accuracy on known tones, feature-vector contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_deer.ops import dsp
from tpu_deer.ops.audio_frontend import (
    FEATURE_DIM,
    AudioFrontendConfig,
    audio_frame_features,
    deltas,
    extract_utterance_features,
    f0_autocorrelation,
    frame_signal,
    mfcc_frames,
    rms_energy,
    spectral_summaries,
    zero_crossing_rate,
)

CFG = AudioFrontendConfig()


def _tone(freq, duration=1.0, sr=16000, amp=0.5):
    t = np.arange(int(duration * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestDSPBases:
    def test_rdft_matches_numpy_rfft(self, rng):
        n_fft = 512
        cos, sin = dsp.rdft_matrices(n_fft)
        x = rng.normal(size=(4, n_fft))
        re = x @ cos
        im = x @ sin
        ref = np.fft.rfft(x, axis=-1)
        np.testing.assert_allclose(re, ref.real, atol=1e-6 * n_fft)
        np.testing.assert_allclose(im, ref.imag, atol=1e-6 * n_fft)

    def test_power_matches_numpy(self, rng):
        n_fft = 512
        cos, sin = dsp.rdft_matrices(n_fft)
        x = rng.normal(size=(3, n_fft))
        power = (x @ cos) ** 2 + (x @ sin) ** 2
        ref = np.abs(np.fft.rfft(x, axis=-1)) ** 2
        np.testing.assert_allclose(power, ref, rtol=1e-4, atol=1e-5)

    def test_dct_orthonormal(self):
        d = dsp.dct_matrix(40, 40)
        np.testing.assert_allclose(d.T @ d, np.eye(40), atol=1e-10)

    def test_dct_matches_scipy(self, rng):
        from scipy.fft import dct as scipy_dct

        x = rng.normal(size=(5, 40))
        ours = x @ dsp.dct_matrix(40, 13)
        ref = scipy_dct(x, type=2, norm="ortho", axis=-1)[:, :13]
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_mel_filterbank_properties(self):
        fb = dsp.mel_filterbank(16000, 1024, 40)
        assert fb.shape == (513, 40)
        assert np.all(fb >= 0)
        # Every filter has some support
        assert np.all(fb.sum(axis=0) > 0)

    def test_idft_lag_matrix_recovers_autocorr(self, rng):
        """Wiener-Khinchin: power @ idft_lags == circular autocorrelation."""
        n_fft = 256
        x = rng.normal(size=(n_fft,))
        power = np.abs(np.fft.rfft(x)) ** 2
        lagmat = dsp.idft_lag_matrix(n_fft, 64)
        ours = power @ lagmat
        ref = np.fft.irfft(np.abs(np.fft.rfft(x)) ** 2)[:64]
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


class TestFraming:
    def test_frame_count_and_content(self):
        cfg = AudioFrontendConfig(n_fft=8, hop_length=4)
        x = jnp.arange(32, dtype=jnp.float32)
        frames = frame_signal(x, cfg)
        # centered: padded by 4 on each side → (32+8-8)/4+1 = 9 frames
        assert frames.shape == (9, 8)
        # middle frame content: frame i starts at i*hop - pad in signal coords
        np.testing.assert_array_equal(
            np.asarray(frames[2]), np.arange(4, 12, dtype=np.float32)
        )


class TestMFCCPaths:
    def test_xla_vs_pallas_interpret(self, rng):
        """The fused Pallas kernel must equal the XLA path bit-for-bit-ish."""
        frames = jnp.asarray(
            rng.normal(size=(50, CFG.n_fft)).astype(np.float32)
        )
        m1, l1, p1 = mfcc_frames(frames, CFG, use_pallas=False)
        m2, l2, p2 = mfcc_frames(frames, CFG, use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-3, atol=5e-3)

    @pytest.mark.parametrize("block", [16, 128, 256, 512])
    def test_pallas_block_sizes_agree(self, rng, block):
        """Every frame-block size (the kernel_bench sweep values, plus one
        below the old 128 floor) must produce the same features — block
        size is a perf knob, never a semantics knob."""
        frames = jnp.asarray(
            rng.normal(size=(50, CFG.n_fft)).astype(np.float32)
        )
        m1, l1, p1 = mfcc_frames(frames, CFG, use_pallas=False)
        m2, l2, p2 = mfcc_frames(
            frames, CFG, use_pallas=True, interpret=True, block_frames=block
        )
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-3, atol=5e-3)

    def test_auto_block_frames(self):
        from tpu_deer.ops.audio_frontend import _auto_block_frames

        assert _auto_block_frames(16384) == 128
        assert _auto_block_frames(128) == 128
        # short inputs (streaming chunks, per-utterance vmap lanes) round up
        # to one tile-aligned block instead of padding to 128
        assert _auto_block_frames(50) == 56
        assert _auto_block_frames(16) == 16
        assert _auto_block_frames(1) == 8

    def test_mfcc_shapes(self, rng):
        frames = jnp.asarray(rng.normal(size=(30, CFG.n_fft)).astype(np.float32))
        mfcc, logmel, power = mfcc_frames(frames, CFG, use_pallas=False)
        assert mfcc.shape == (30, 13)
        assert logmel.shape == (30, 40)
        assert power.shape == (30, 513)

    def test_tone_energy_in_correct_mel_band(self):
        """A 1 kHz tone's energy must concentrate near the 1 kHz mel bins."""
        sig = jnp.asarray(_tone(1000.0))
        frames = frame_signal(sig, CFG)
        _, logmel, _ = mfcc_frames(frames, CFG, use_pallas=False)
        mean_mel = np.asarray(logmel.mean(axis=0))
        peak_bin = int(np.argmax(mean_mel))
        mel_centers = dsp.mel_to_hz(
            np.linspace(dsp.hz_to_mel(0), dsp.hz_to_mel(8000), 42)
        )[1:-1]
        assert abs(mel_centers[peak_bin] - 1000.0) < 200.0


class TestDeltas:
    def test_delta_of_linear_ramp_is_constant(self):
        """d/dt of a linear ramp = slope, everywhere away from edges."""
        x = jnp.asarray(np.arange(50, dtype=np.float32)[:, None] * 2.0)
        d = deltas(x, width=9)
        np.testing.assert_allclose(np.asarray(d[6:-6, 0]), 2.0, rtol=1e-5)

    def test_matches_librosa_formula(self, rng):
        x = rng.normal(size=(40, 3)).astype(np.float32)
        width, half = 9, 4
        kernel = dsp.delta_kernel(width)
        padded = np.concatenate(
            [np.repeat(x[:1], half, 0), x, np.repeat(x[-1:], half, 0)]
        )
        expected = np.stack(
            [
                sum(kernel[d] * padded[t + d] for d in range(width))
                for t in range(40)
            ]
        )
        got = np.asarray(deltas(jnp.asarray(x), width))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestF0:
    @pytest.mark.parametrize("freq", [100.0, 220.0, 440.0])
    def test_pure_tone_f0(self, freq):
        sig = jnp.asarray(_tone(freq, duration=0.5))
        frames = frame_signal(sig, CFG)
        _, _, power = mfcc_frames(frames, CFG, use_pallas=False)
        f0, voiced = f0_autocorrelation(power, CFG)
        v = np.asarray(voiced)
        assert v.mean() > 0.8  # tone should be detected as voiced
        est = np.asarray(f0)[v].mean()
        assert abs(est - freq) / freq < 0.08, est

    def test_parabolic_refinement_beats_lag_grid(self):
        """At 440 Hz the integer lag grid is ~36.4 samples — pure argmax is
        off by up to ~20 cents; the parabolic vertex must land within 5."""
        sig = jnp.asarray(_tone(440.0, duration=0.5))
        frames = frame_signal(sig, CFG)
        _, _, power = mfcc_frames(frames, CFG, use_pallas=False)
        f0, voiced = f0_autocorrelation(power, CFG)
        v = np.asarray(voiced)
        est = np.asarray(f0)[v]
        cents = 1200.0 * np.abs(np.log2(est / 440.0))
        assert cents.mean() <= 5.0, cents.mean()

    def test_median_voicing_is_majority_vote(self, rng):
        """median_voicing=True must equal a 3-frame majority (edge-
        replicated) of the raw voicing flags; f0 values on frames voiced in
        both must be identical."""
        sig = np.concatenate(
            [_tone(220.0, 0.2), 0.3 * rng.normal(size=1600).astype(np.float32),
             _tone(220.0, 0.2)]
        )
        frames = frame_signal(jnp.asarray(sig), CFG)
        _, _, power = mfcc_frames(frames, CFG, use_pallas=False)
        f0a, va = f0_autocorrelation(power, CFG)
        f0b, vb = f0_autocorrelation(power, CFG, median_voicing=True)
        v = np.asarray(va).astype(np.float32)
        pad = np.concatenate([v[:1], v, v[-1:]])
        expect = (pad[:-2] + pad[1:-1] + pad[2:]) >= 2.0
        np.testing.assert_array_equal(np.asarray(vb), expect)
        both = np.asarray(va) & np.asarray(vb)
        np.testing.assert_array_equal(np.asarray(f0a)[both], np.asarray(f0b)[both])

    def test_noise_is_unvoiced(self, rng):
        sig = jnp.asarray(rng.normal(size=8000).astype(np.float32))
        frames = frame_signal(sig, CFG)
        _, _, power = mfcc_frames(frames, CFG, use_pallas=False)
        _, voiced = f0_autocorrelation(power, CFG)
        assert np.asarray(voiced).mean() < 0.5


class TestScalarFeatures:
    def test_zcr_of_tone_scales_with_freq(self):
        lo = frame_signal(jnp.asarray(_tone(100)), CFG)
        hi = frame_signal(jnp.asarray(_tone(1000)), CFG)
        assert float(zero_crossing_rate(hi).mean()) > float(
            zero_crossing_rate(lo).mean()
        )

    def test_rms_of_known_amplitude(self):
        sig = jnp.ones(CFG.n_fft) * 0.5
        rms = rms_energy(sig[None, :])
        np.testing.assert_allclose(float(rms[0]), 0.5, rtol=1e-6)

    def test_centroid_tracks_tone_frequency(self):
        sig = jnp.asarray(_tone(2000.0))
        frames = frame_signal(sig, CFG)
        _, _, power = mfcc_frames(frames, CFG, use_pallas=False)
        centroid, rolloff, bandwidth = spectral_summaries(power, CFG)
        c = float(np.asarray(centroid).mean())
        assert 1500 < c < 2500, c
        assert float(np.asarray(bandwidth).mean()) < 1500


class TestFeatureVectors:
    def test_utterance_vector_contract(self):
        sig = jnp.asarray(_tone(220.0, duration=1.0))
        vec = extract_utterance_features(sig, CFG, use_pallas=False)
        assert vec.shape == (FEATURE_DIM,)
        v = np.asarray(vec)
        assert np.all(np.isfinite(v))
        # normalized
        assert abs(v.mean()) < 1e-4
        assert abs(v.std() - 1.0) < 1e-3

    def test_frame_features_contract(self):
        sig = jnp.asarray(_tone(220.0, duration=0.5))
        feats = audio_frame_features(sig, CFG, use_pallas=False)
        assert feats.shape[-1] == FEATURE_DIM
        assert np.all(np.isfinite(np.asarray(feats)))

    def test_batchable_via_vmap(self, rng):
        import jax

        sigs = jnp.asarray(rng.normal(size=(4, 8000)).astype(np.float32))
        feats = jax.vmap(
            lambda s: extract_utterance_features(s, CFG, use_pallas=False)
        )(sigs)
        assert feats.shape == (4, FEATURE_DIM)


class TestEnhancedFeatures:
    def test_contract(self):
        from tpu_deer.ops.audio_frontend import extract_enhanced_utterance_features

        sig = jnp.asarray(_tone(220.0, duration=1.0))
        v = extract_enhanced_utterance_features(sig, CFG, use_pallas=False)
        assert v.shape == (84,)
        assert np.all(np.isfinite(np.asarray(v)))
        assert abs(float(v.mean())) < 1e-4

    def test_formant_peaks_find_harmonics(self):
        """A 200 Hz tone + strong harmonics → peaks near multiples of 200."""
        from tpu_deer.ops.audio_frontend import _spectral_peaks, mfcc_frames

        sr = 16000
        t = np.arange(sr) / sr
        sig = sum(
            a * np.sin(2 * np.pi * f * t)
            for f, a in ((200, 0.5), (400, 0.4), (600, 0.3))
        ).astype(np.float32)
        frames = frame_signal(jnp.asarray(sig), CFG)
        _, _, power = mfcc_frames(frames, CFG, use_pallas=False)
        freqs, mags = _spectral_peaks(power.mean(axis=0), CFG, k=5)
        found = np.asarray(freqs)
        found = found[found > 0]
        for target in (200, 400, 600):
            assert np.min(np.abs(found - target)) < 40, (target, found)

    def test_jittable(self):
        import jax

        from tpu_deer.ops.audio_frontend import extract_enhanced_utterance_features

        sig = jnp.asarray(_tone(150.0, duration=0.5))
        f = jax.jit(
            lambda s: extract_enhanced_utterance_features(s, CFG, use_pallas=False)
        )
        v = f(sig)
        assert np.all(np.isfinite(np.asarray(v)))


class TestFusedFromSignal:
    """mfcc_from_signal: all three paths (frames / conv / pallas) must agree,
    and the batched entries must match per-utterance singles."""

    def _mix(self, rng, n=12000):
        sig = 0.4 * _tone(170.0, duration=n / 16000.0)[:n]
        return (sig + 0.05 * rng.normal(size=n)).astype(np.float32)

    def test_conv_matches_frames(self, rng):
        from tpu_deer.ops.audio_frontend import mfcc_from_signal

        sig = jnp.asarray(self._mix(rng))
        m1, l1, p1, t1 = mfcc_from_signal(sig, CFG, path="frames")
        m2, l2, p2, t2 = mfcc_from_signal(sig, CFG, path="conv")
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-4, atol=1e-5)

    def test_pallas_interpret_matches_frames(self, rng):
        from tpu_deer.ops.audio_frontend import mfcc_from_signal

        sig = jnp.asarray(self._mix(rng))
        m1, l1, p1, t1 = mfcc_from_signal(sig, CFG, path="frames")
        m2, l2, p2, t2 = mfcc_from_signal(sig, CFG, path="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("block", [16, 64, 256])
    def test_pallas_block_sizes_agree(self, rng, block):
        from tpu_deer.ops.audio_frontend import mfcc_from_signal

        sig = jnp.asarray(self._mix(rng, n=9000))
        ref = mfcc_from_signal(sig, CFG, path="frames")
        out = mfcc_from_signal(
            sig, CFG, path="pallas", interpret=True, block_frames=block
        )
        for a, b in zip(ref, out):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-3
            )

    def test_frames_path_timefeats_exact(self, rng):
        """The frames path's timefeats must equal the historical
        rms_energy/zero_crossing_rate values bit-for-bit."""
        from tpu_deer.ops.audio_frontend import _bases, mfcc_from_signal

        sig = jnp.asarray(self._mix(rng))
        _, _, _, t = mfcc_from_signal(sig, CFG, path="frames")
        frames = frame_signal(sig, CFG)
        rms = rms_energy(frames * _bases(CFG)["window"])
        zcr = zero_crossing_rate(frames)
        np.testing.assert_array_equal(np.asarray(t[:, 0]), np.asarray(rms))
        np.testing.assert_array_equal(np.asarray(t[:, 1]), np.asarray(zcr))

    def test_batched_matches_single(self, rng):
        from tpu_deer.ops.audio_frontend import mfcc_from_signal

        sigs = np.stack([self._mix(rng), self._mix(rng)[::-1]])
        batch = mfcc_from_signal(jnp.asarray(sigs), CFG, path="conv")
        for i in range(2):
            single = mfcc_from_signal(jnp.asarray(sigs[i]), CFG, path="conv")
            for a, b in zip(batch, single):
                np.testing.assert_allclose(
                    np.asarray(a[i]), np.asarray(b), rtol=1e-5, atol=1e-5
                )

    def test_batched_frame_features_match_legacy(self, rng):
        """audio_frame_features_batch(path='frames') == the historical
        per-utterance audio_frame_features(use_pallas=False)."""
        from tpu_deer.ops.audio_frontend import audio_frame_features_batch

        sigs = np.stack([self._mix(rng), 0.7 * self._mix(rng)])
        batch = audio_frame_features_batch(jnp.asarray(sigs), CFG, path="frames")
        for i in range(2):
            legacy = audio_frame_features(
                jnp.asarray(sigs[i]), CFG, use_pallas=False
            )
            # rtol 1e-4: the vmapped batch and the single-utterance program
            # are separate XLA executables whose fusion choices reassociate
            # float32 sums differently (~1e-6 abs on log-power values).
            np.testing.assert_allclose(
                np.asarray(batch[i]), np.asarray(legacy), rtol=1e-4, atol=1e-5
            )

    def test_batched_utterance_features_match_legacy(self, rng):
        from tpu_deer.ops.audio_frontend import extract_utterance_features_batch

        sigs = np.stack([self._mix(rng), 0.5 * self._mix(rng)])
        batch = extract_utterance_features_batch(
            jnp.asarray(sigs), CFG, path="frames"
        )
        for i in range(2):
            legacy = extract_utterance_features(
                jnp.asarray(sigs[i]), CFG, use_pallas=False
            )
            np.testing.assert_allclose(
                np.asarray(batch[i]), np.asarray(legacy), rtol=1e-6, atol=1e-6
            )

    def test_odd_length_and_jit(self, rng):
        """Non-hop-multiple lengths pad correctly and the conv path jits."""
        from tpu_deer.ops.audio_frontend import mfcc_from_signal

        sig = jnp.asarray(self._mix(rng, n=10007))
        f = jax.jit(lambda s: mfcc_from_signal(s, CFG, path="conv"))
        m, l, p, t = f(sig)
        n_expected = frame_signal(sig, CFG).shape[0]
        assert m.shape == (n_expected, CFG.n_mfcc)
        assert t.shape == (n_expected, 2)
        assert np.all(np.isfinite(np.asarray(m)))


class TestVmapAllPaths:
    """Regression for the round-3 bench crash (BENCH_r03): jax.vmap of EVERY
    public frontend entry point must work on EVERY path. The pallas paths go
    through custom_vmap rules that collapse mapped axes into the kernel's
    native batch axis, so pallas_call's generic batching rule (which Mosaic
    cannot lower for the pl.ANY chunks operand) is never reached — the same
    program structure bench.py dispatches, on any backend."""

    # (path kwarg for mfcc_from_signal, use_pallas flag for extract_*)
    PATHS = [("conv", None), ("frames", False), ("pallas", True)]

    def _sigs(self, rng, b=3, n=9000):
        t = np.arange(n) / 16000.0
        base = np.sin(2 * np.pi * 180.0 * t)
        out = np.stack(
            [(0.3 + 0.2 * i) * base + 0.05 * rng.normal(size=n)
             for i in range(b)]
        )
        return jnp.asarray(out.astype(np.float32))

    @pytest.mark.parametrize("path", ["conv", "frames", "pallas"])
    def test_vmap_mfcc_from_signal_matches_batched(self, rng, path):
        from tpu_deer.ops.audio_frontend import mfcc_from_signal

        sigs = self._sigs(rng)
        interp = path == "pallas"
        fn = lambda s: mfcc_from_signal(s, CFG, path=path, interpret=interp)
        vm = jax.jit(jax.vmap(fn))(sigs)
        batched = mfcc_from_signal(sigs, CFG, path=path, interpret=interp)
        for a, b in zip(vm, batched):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    @pytest.mark.parametrize("path,use_pallas", PATHS)
    def test_vmap_extract_utterance_features(self, rng, path, use_pallas):
        sigs = self._sigs(rng)
        interp = path == "pallas"
        vm = jax.jit(jax.vmap(
            lambda s: extract_utterance_features(
                s, CFG, use_pallas=use_pallas, interpret=interp)
        ))(sigs)
        assert vm.shape == (3, FEATURE_DIM)
        for i in range(3):
            single = extract_utterance_features(
                sigs[i], CFG, use_pallas=use_pallas, interpret=interp
            )
            np.testing.assert_allclose(
                np.asarray(vm[i]), np.asarray(single), rtol=1e-4, atol=1e-4
            )

    @pytest.mark.parametrize("path,use_pallas", PATHS)
    def test_vmap_audio_frame_features(self, rng, path, use_pallas):
        sigs = self._sigs(rng)
        interp = path == "pallas"
        vm = jax.jit(jax.vmap(
            lambda s: audio_frame_features(
                s, CFG, use_pallas=use_pallas, interpret=interp)
        ))(sigs)
        assert vm.shape[0] == 3 and vm.shape[-1] == FEATURE_DIM
        assert np.all(np.isfinite(np.asarray(vm)))

    @pytest.mark.parametrize("path,use_pallas", PATHS)
    def test_vmap_extract_enhanced_features(self, rng, path, use_pallas):
        from tpu_deer.ops.audio_frontend import (
            extract_enhanced_utterance_features,
        )

        sigs = self._sigs(rng)
        interp = path == "pallas"
        vm = jax.jit(jax.vmap(
            lambda s: extract_enhanced_utterance_features(
                s, CFG, use_pallas=use_pallas, interpret=interp)
        ))(sigs)
        assert vm.shape == (3, 84)
        assert np.all(np.isfinite(np.asarray(vm)))

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_vmap_mfcc_frames(self, rng, use_pallas):
        frames = jnp.asarray(
            rng.normal(size=(3, 20, CFG.n_fft)).astype(np.float32)
        )
        vm = jax.jit(jax.vmap(
            lambda f: mfcc_frames(f, CFG, use_pallas=use_pallas,
                                  interpret=use_pallas)
        ))(frames)
        ref = [
            mfcc_frames(frames[i], CFG, use_pallas=False) for i in range(3)
        ]
        for j in range(3):  # mfcc / logmel / power
            for i in range(3):
                np.testing.assert_allclose(
                    np.asarray(vm[j][i]), np.asarray(ref[i][j]),
                    rtol=2e-3, atol=5e-3,
                )

    def test_nested_vmap_pallas(self, rng):
        """Two stacked vmap levels must also collapse cleanly."""
        from tpu_deer.ops.audio_frontend import mfcc_from_signal

        sigs = self._sigs(rng, b=4).reshape(2, 2, -1)
        fn = lambda s: mfcc_from_signal(s, CFG, path="pallas", interpret=True)
        out = jax.vmap(jax.vmap(fn))(sigs)
        flat = mfcc_from_signal(
            sigs.reshape(4, -1), CFG, path="pallas", interpret=True
        )
        for a, b in zip(out, flat):
            np.testing.assert_allclose(
                np.asarray(a).reshape(b.shape), np.asarray(b),
                rtol=1e-5, atol=1e-5,
            )


