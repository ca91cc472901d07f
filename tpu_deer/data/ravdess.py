"""RAVDESS parser: filename-coded categorical emotions → VAD + features.

Format contract: files named `MM-VC-EE-II-SS-RR-AA.(wav|mp4)` under
Actor_XX/ dirs, fields = modality, vocal channel, emotion, intensity,
statement, repetition, actor.

The reference maps emotion codes at multi_dataset_framework.py:263-308 with
an INCORRECT table (it has 01=happy; the actual RAVDESS spec is 01=neutral,
02=calm, 03=happy, 04=sad, 05=angry, 06=fearful, 07=disgust, 08=surprised).
This parser uses the correct code table, with VAD targets per emotion
(dominance included — the reference hardcoded dominance 0, which makes the
dominance task degenerate).

Statement text is known from the spec (two fixed sentences), so real text
features exist. Splits are speaker-independent by actor: 1-18 train,
19-21 val, 22-24 test.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

from tpu_deer.data.cache import cache_dir_for, load_cached, save_cached
from tpu_deer.data.pipeline import ArrayDataset

logger = logging.getLogger(__name__)

# code → (valence, arousal, dominance); circumplex-informed targets.
EMOTION_VAD = {
    1: (0.0, 0.0, 0.0),     # neutral
    2: (0.2, -0.5, 0.0),    # calm
    3: (0.8, 0.6, 0.4),     # happy
    4: (-0.6, -0.4, -0.4),  # sad
    5: (-0.7, 0.8, 0.6),    # angry
    6: (-0.5, 0.7, -0.5),   # fearful
    7: (-0.8, 0.2, 0.1),    # disgust
    8: (0.3, 0.8, 0.0),     # surprised
}

STATEMENTS = {
    1: "Kids are talking by the door",
    2: "Dogs are sitting by the door",
}


def parse_filename(stem: str) -> Optional[dict]:
    parts = stem.split("-")
    if len(parts) != 7:
        return None
    try:
        modality, channel, emotion, intensity, statement, repetition, actor = (
            int(p) for p in parts
        )
    except ValueError:
        return None
    if emotion not in EMOTION_VAD:
        return None
    return {
        "modality": modality,  # 01 full-AV, 02 video-only, 03 audio-only
        "channel": channel,
        "emotion": emotion,
        "intensity": intensity,
        "statement": statement,
        "repetition": repetition,
        "actor": actor,
    }


def _split_for_actor(actor: int) -> str:
    if actor <= 18:
        return "train"
    if actor <= 21:
        return "val"
    return "test"


def load_ravdess(
    root_path: str,
    quick: bool = False,
    cache_dir: Optional[str] = None,
    extractor=None,
) -> dict[str, ArrayDataset]:
    from tpu_deer.data.audio_io import load_wav
    from tpu_deer.data.features import MultimodalFeatureExtractor

    root = Path(root_path)
    cdir = cache_dir_for(root_path, cache_dir)
    key = f"ravdess_{'quick' if quick else 'full'}_v1"
    cached = load_cached(cdir, key)
    if cached is not None:
        return _split_arrays(cached)

    wavs = sorted(root.rglob("*.wav"))
    records = []
    for wav in wavs:
        meta = parse_filename(wav.stem)
        if meta is None:
            continue
        # Prefer the audio channel; skip video-only codes for the wav pass.
        if meta["modality"] == 2:
            continue
        mp4 = wav.with_suffix(".mp4")
        # Full-AV sibling: same code but modality 01.
        if not mp4.exists():
            sib = wav.parent / ("01-" + "-".join(wav.stem.split("-")[1:]) + ".mp4")
            mp4 = sib if sib.exists() else None
        records.append({"wav": wav, "mp4": mp4, **meta})
    if not records:
        raise FileNotFoundError(f"no RAVDESS wav files under {root_path}")
    if quick:
        records = records[:200]

    extractor = extractor or MultimodalFeatureExtractor()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        signals = list(pool.map(lambda r: load_wav(str(r["wav"])), records))
    audio_feats = extractor.audio.extract_batch(signals)
    text_feats = extractor.text.extract_batch(
        [STATEMENTS.get(r["statement"], "") for r in records]
    )
    video_feats = np.stack(
        [
            extractor.video.extract(str(r["mp4"]))
            if r["mp4"] is not None
            else np.zeros(256, dtype=np.float32)
            for r in records
        ]
    )

    arrays = {
        "audio": audio_feats.astype(np.float32),
        "video": video_feats.astype(np.float32),
        "text": text_feats.astype(np.float32),
        "labels": np.asarray(
            [EMOTION_VAD[r["emotion"]] for r in records], dtype=np.float32
        ),
        "split_code": np.asarray(
            [
                {"train": 0, "val": 1, "test": 2}[_split_for_actor(r["actor"])]
                for r in records
            ],
            dtype=np.int32,
        ),
        # No MLM bootstrap here: the corpus has exactly two fixed statements
        # (no lexical variation to learn from), so the resolved extractor
        # backend is recorded as-is.
        "text_backend": np.array(extractor.text.backend),
    }
    save_cached(cdir, key, arrays)
    return _split_arrays(arrays)


_META_KEYS = ("split_code", "text_backend")


def _split_arrays(arrays: dict) -> dict[str, ArrayDataset]:
    code = arrays["split_code"]
    out = {}
    for name, c in (("train", 0), ("val", 1), ("test", 2)):
        idx = np.where(code == c)[0]
        out[name] = ArrayDataset(
            {k: v[idx] for k, v in arrays.items() if k not in _META_KEYS},
            name="ravdess",
        )
    out["text_backend"] = str(arrays.get("text_backend", "hashed"))
    return out
