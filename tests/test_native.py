"""Native WAV decoder tests: build, decode parity vs scipy, resampling."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from tpu_deer.data.native import get_lib, load_wav_native


def _write(path, sr, data):
    wavfile.write(str(path), sr, data)


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativeWavio:
    def test_builds(self, lib):
        assert lib is not None

    def test_pcm16_roundtrip(self, lib, tmp_path, rng):
        sig = (rng.normal(size=8000) * 0.3 * 32767).astype(np.int16)
        path = tmp_path / "a.wav"
        _write(path, 16000, sig)
        out = load_wav_native(str(path), 16000)
        assert out is not None
        np.testing.assert_allclose(out, sig / 32768.0, atol=1e-4)

    def test_stereo_mixdown(self, lib, tmp_path, rng):
        left = (rng.normal(size=4000) * 0.3 * 32767).astype(np.int16)
        right = (rng.normal(size=4000) * 0.3 * 32767).astype(np.int16)
        path = tmp_path / "st.wav"
        _write(path, 16000, np.stack([left, right], axis=1))
        out = load_wav_native(str(path), 16000)
        expected = (left / 32768.0 + right / 32768.0) / 2
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_float32_format(self, lib, tmp_path, rng):
        sig = rng.normal(size=4000).astype(np.float32) * 0.3
        path = tmp_path / "f32.wav"
        _write(path, 16000, sig)
        out = load_wav_native(str(path), 16000)
        np.testing.assert_allclose(out, sig, atol=1e-6)

    def test_resample_441_to_16k(self, lib, tmp_path):
        sr_in = 44100
        t = np.arange(sr_in) / sr_in
        sig = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
        path = tmp_path / "rs.wav"
        _write(path, sr_in, sig)
        out = load_wav_native(str(path), 16000)
        assert out is not None
        assert abs(len(out) - 16000) <= 2
        # The 440 Hz tone must survive: count zero crossings ≈ 2*440
        crossings = np.sum(np.abs(np.diff(np.sign(out))) > 0)
        assert abs(crossings - 880) < 40

    def test_missing_file_returns_none(self, lib):
        assert load_wav_native("/nonexistent.wav", 16000) is None

    def test_load_wav_uses_native_consistently(self, lib, tmp_path, rng):
        """audio_io.load_wav (native) ≈ pure-scipy decode."""
        from tpu_deer.data import audio_io

        sig = (rng.normal(size=22050) * 0.3 * 32767).astype(np.int16)
        path = tmp_path / "c.wav"
        _write(path, 22050, sig)
        native = audio_io.load_wav(str(path), 16000)
        # Contract: right length, finite, similar energy to the source signal.
        assert abs(len(native) - 16000) <= 2
        assert np.all(np.isfinite(native))
        assert 0.5 < native.std() / (sig / 32768.0).std() < 1.5
