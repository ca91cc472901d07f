"""WAV loading + resampling without librosa/soundfile.

scipy.io.wavfile handles the PCM/float formats IEMOCAP and RAVDESS ship;
resampling is polyphase (scipy.signal.resample_poly), equivalent in quality
to librosa's default for speech-rate conversions.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str, target_sr: int = 16000, mono: bool = True) -> np.ndarray:
    """Load a wav file → float32 in [-1, 1] at target_sr.

    Uses the native C++ decoder (tpu_deer.data.native) when built — it
    releases the GIL and does decode+mixdown+resample in one pass — and
    falls back to scipy otherwise.
    """
    from tpu_deer.data.native import load_wav_native

    native = load_wav_native(path, target_sr)
    if native is not None:
        return native
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if mono and audio.ndim > 1:
        audio = audio.mean(axis=1)
    if sr != target_sr:
        g = math.gcd(sr, target_sr)
        audio = resample_poly(audio, target_sr // g, sr // g).astype(np.float32)
    return audio
