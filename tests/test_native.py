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

    @staticmethod
    def _write_extensible(path, sr, data_f32, subformat):
        """Hand-roll a WAVE_FORMAT_EXTENSIBLE (0xFFFE) file with a 40-byte
        fmt chunk whose SubFormat GUID selects PCM (1) or IEEE float (3)."""
        import struct

        raw = data_f32.astype("<f4").tobytes()
        fmt = struct.pack(
            "<HHIIHH",
            0xFFFE, 1, sr, sr * 4, 4, 32,
        ) + struct.pack("<HHI", 22, 32, 0x4) + struct.pack(
            "<H", subformat
        ) + bytes.fromhex("0000000010008000 00aa00389b71".replace(" ", ""))
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        with open(path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_extensible_float_subformat(self, lib, tmp_path, rng):
        """0xFFFE container with IEEE-float SubFormat must decode as float,
        not be misread as PCM garbage."""
        sig = rng.normal(size=4000).astype(np.float32) * 0.3
        path = tmp_path / "ext_f32.wav"
        self._write_extensible(str(path), 16000, sig, subformat=3)
        out = load_wav_native(str(path), 16000)
        assert out is not None
        np.testing.assert_allclose(out, sig, atol=1e-6)

    def test_corrupt_data_size_no_crash(self, lib, tmp_path, rng):
        """A data-chunk size far beyond the file must not abort the process
        (std::bad_alloc across the ctypes boundary); decode what exists."""
        import struct

        sig = (rng.normal(size=1000) * 0.3 * 32767).astype(np.int16)
        path = tmp_path / "corrupt.wav"
        _write(path, 16000, sig)
        blob = bytearray(path.read_bytes())
        i = blob.find(b"data")
        blob[i + 4 : i + 8] = struct.pack("<I", 0xFFFFFFF0)
        path.write_bytes(bytes(blob))
        out = load_wav_native(str(path), 16000)
        # Either a clean failure (None) or the truncated real samples — never
        # a crash.
        if out is not None:
            assert len(out) <= len(sig)
            assert np.all(np.isfinite(out))

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
