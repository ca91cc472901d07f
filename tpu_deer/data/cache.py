"""On-disk feature cache: one compressed npz per (dataset, split, config-key).

Replaces the reference's pickle cache (preprocessing.py:149-178) with npz
(portable, memory-mappable, no arbitrary-code-execution on load).
"""

from __future__ import annotations

import hashlib
import logging
import os
import tempfile
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def cache_dir_for(root_path: str, explicit: Optional[str] = None) -> str:
    """Prefer a cache next to the dataset; fall back to a tmp/user cache when
    the dataset directory is read-only."""
    if explicit:
        os.makedirs(explicit, exist_ok=True)
        return explicit
    candidate = os.path.join(root_path, "tpu_deer_cache")
    try:
        os.makedirs(candidate, exist_ok=True)
        probe = os.path.join(candidate, ".w")
        with open(probe, "w") as f:
            f.write("")
        os.remove(probe)
        return candidate
    except OSError:
        digest = hashlib.md5(os.path.abspath(root_path).encode()).hexdigest()[:12]
        fallback = os.path.join(
            tempfile.gettempdir(), "tpu_deer_cache", digest
        )
        os.makedirs(fallback, exist_ok=True)
        return fallback


def load_cached(cache_dir: str, key: str) -> Optional[dict[str, np.ndarray]]:
    path = os.path.join(cache_dir, f"{key}.npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    except Exception as e:
        logger.warning(f"cache read failed for {path}: {e}")
        return None


def save_cached(cache_dir: str, key: str, arrays: dict[str, np.ndarray]) -> None:
    path = os.path.join(cache_dir, f"{key}.npz")
    try:
        np.savez_compressed(path, **arrays)
    except OSError as e:
        logger.warning(f"cache write failed for {path}: {e}")
