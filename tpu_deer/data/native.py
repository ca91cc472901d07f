"""ctypes bindings for the native WAV decoder (native/wavio.cpp).

Builds the shared library on first use (g++ via the Makefile) and falls back
to the scipy loader transparently if the toolchain or build is unavailable.
The C call releases the GIL, so batch prep can decode wavs on a thread pool.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwavio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        logger.warning(f"native wavio build failed: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.wav_read.restype = ctypes.c_long
            lib.wav_read.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
            ]
            _lib = lib
        except OSError as e:
            logger.warning(f"native wavio load failed: {e}")
            _lib_failed = True
    return _lib


def load_wav_native(path: str, target_sr: int = 16000) -> Optional[np.ndarray]:
    """Decode via the C library; None if the native path is unavailable or
    the file can't be decoded (caller falls back to scipy)."""
    lib = get_lib()
    if lib is None:
        return None
    encoded = os.fsencode(path)
    n = lib.wav_read(encoded, target_sr, None, 0)
    if n < 0:
        return None
    out = np.empty(n, dtype=np.float32)
    written = lib.wav_read(
        encoded, target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
    )
    if written < 0:
        return None
    return out[:written]
