"""MELD parser: conversational utterances with categorical emotions → VAD.

Format contract (reference multi_dataset_framework.py:310-358): CSV files
train_sent_emo.csv / dev_sent_emo.csv / test_sent_emo.csv with at least
`Utterance` and `Emotion` columns; optional video clips under
`train_splits/`, `dev_splits_complete/`, `output_repeated_splits_test/` named
`diaD_uttU.mp4`.

Emotion → VAD mapping extends the reference's 7-class VA table with a
dominance coordinate (the reference hardcodes dominance 0, which makes the
dominance head untrainable on MELD). Text features are real (the dataset is
text-first); audio/video come from the clips when present, zeros otherwise
(loudly logged — the reference silently used np.random noise placeholders at
multi_dataset_framework.py:347-348).

Splits follow MELD's own train/dev/test CSVs.
"""

from __future__ import annotations

import csv
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from tpu_deer.data.cache import cache_dir_for, load_cached, save_cached
from tpu_deer.data.pipeline import ArrayDataset

logger = logging.getLogger(__name__)

EMOTION_VAD = {
    "joy": (0.8, 0.6, 0.4),
    "sadness": (-0.8, -0.4, -0.4),
    "anger": (-0.6, 0.8, 0.6),
    "fear": (-0.5, 0.7, -0.5),
    "surprise": (0.3, 0.8, 0.0),
    "disgust": (-0.8, 0.2, 0.1),
    "neutral": (0.0, 0.0, 0.0),
}

SPLIT_FILES = {
    "train": ("train_sent_emo.csv", "train_splits"),
    "val": ("dev_sent_emo.csv", "dev_splits_complete"),
    "test": ("test_sent_emo.csv", "output_repeated_splits_test"),
}


def _read_csv(path: Path) -> list[dict]:
    with open(path, newline="", encoding="utf-8", errors="replace") as f:
        return list(csv.DictReader(f))


def load_meld(
    root_path: str,
    quick: bool = False,
    cache_dir: Optional[str] = None,
    extractor=None,
    pretrain_text: Optional[bool] = None,
) -> dict[str, ArrayDataset]:
    """pretrain_text=None (default) is AUTO: when the loader builds its own
    extractor and no semantic text backend is configured, MLM-pretrain the
    text featurizer on the TRAIN CSV's utterances (MELD is text-first, so
    this is the highest-leverage channel). Same contract as
    iemocap.load_iemocap (including the resolved-backend cache keying and
    the True-cannot-override-a-semantic-extractor rule); the resolved
    backend is returned under "text_backend"."""
    from tpu_deer.data.features import MultimodalFeatureExtractor

    root = Path(root_path)
    cdir = cache_dir_for(root_path, cache_dir)
    caller_extractor = extractor is not None
    extractor = extractor or MultimodalFeatureExtractor()
    want_mlm = pretrain_text is True or (
        pretrain_text is None
        and not caller_extractor
        and extractor.text.bert is None
        and extractor.text.encoder is None
    )
    base_key = f"meld_{'quick' if quick else 'full'}_v3"
    if not want_mlm:
        key = f"{base_key}_{extractor.text.backend}text"
        cached = load_cached(cdir, key)
        if cached is not None:
            return _unpack(cached)

    any_found = False
    packed: dict[str, np.ndarray] = {}

    split_rows: dict[str, list[dict]] = {}
    for split, (csv_name, _) in SPLIT_FILES.items():
        csv_path = root / csv_name
        if not csv_path.exists():
            continue
        any_found = True
        rows = [
            r for r in _read_csv(csv_path)
            if r.get("Emotion", "").lower() in EMOTION_VAD
        ]
        if quick:
            rows = rows[:100]
        split_rows[split] = rows

    if not any_found:
        raise FileNotFoundError(f"no MELD CSVs under {root_path}")

    if want_mlm and extractor.text.bert is None and extractor.text.encoder is None:
        train_texts = [
            r.get("Utterance", "") for r in split_rows.get("train", [])
            if r.get("Utterance", "")
        ]
        if train_texts:
            from tpu_deer.train.text_pretrain import corpus_text_featurizer

            extractor.text.encoder = corpus_text_featurizer(train_texts, cdir)
        else:
            logger.warning(
                "text bootstrap skipped: MELD train CSV has no utterances — "
                "falling back to hashed text features"
            )
    if want_mlm:
        # Key on the resolved backend (see load_iemocap).
        key = f"{base_key}_{extractor.text.backend}text"
        cached = load_cached(cdir, key)
        if cached is not None:
            return _unpack(cached)

    for split, rows in split_rows.items():
        clip_dir = SPLIT_FILES[split][1]
        texts = [r.get("Utterance", "") for r in rows]
        text_feats = extractor.text.extract_batch(texts) if rows else np.zeros(
            (0, 768), np.float32
        )
        from tpu_deer.data.tokenizer import HashTokenizer

        if rows:
            token_ids, token_mask = HashTokenizer().encode_batch(texts)
        else:
            token_ids = np.zeros((0, 128), np.int32)
            token_mask = np.zeros((0, 128), np.int32)

        video_feats = np.zeros((len(rows), 256), dtype=np.float32)
        audio_feats = np.zeros((len(rows), 84), dtype=np.float32)
        clips_root = root / clip_dir
        n_clips = 0
        if clips_root.is_dir():
            for i, r in enumerate(rows):
                clip = clips_root / (
                    f"dia{r.get('Dialogue_ID', '')}_utt{r.get('Utterance_ID', '')}.mp4"
                )
                if clip.exists():
                    video_feats[i] = extractor.video.extract(str(clip))
                    n_clips += 1
        if n_clips == 0:
            logger.warning(
                f"MELD {split}: no video clips found under {clips_root} — "
                "audio/video features are zeros (text-only training signal)"
            )

        labels = np.asarray(
            [EMOTION_VAD[r["Emotion"].lower()] for r in rows], dtype=np.float32
        )
        packed[f"{split}_audio"] = audio_feats
        packed[f"{split}_video"] = video_feats
        packed[f"{split}_text"] = text_feats.astype(np.float32)
        packed[f"{split}_token_ids"] = token_ids.astype(np.int32)
        packed[f"{split}_token_mask"] = token_mask.astype(np.int32)
        packed[f"{split}_labels"] = labels

    packed["text_backend"] = np.array(extractor.text.backend)
    save_cached(cdir, key, packed)
    return _unpack(packed)


def _unpack(packed: dict) -> dict[str, ArrayDataset]:
    out = {}
    for split in ("train", "val", "test"):
        if f"{split}_labels" in packed:
            arrays = {
                "audio": packed[f"{split}_audio"],
                "video": packed[f"{split}_video"],
                "text": packed[f"{split}_text"],
                "labels": packed[f"{split}_labels"],
            }
            if f"{split}_token_ids" in packed:
                arrays["token_ids"] = packed[f"{split}_token_ids"]
                arrays["token_mask"] = packed[f"{split}_token_mask"]
            out[split] = ArrayDataset(arrays, name="meld")
    out["text_backend"] = str(packed.get("text_backend", "hashed"))
    return out
