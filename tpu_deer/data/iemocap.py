"""IEMOCAP parser: dimensional VAD labels + trimodal features.

Format contract (reference preprocessing.py:183-448 — the richer of the
reference's two IEMOCAP parsers, whose EmoEvaluation regex actually matches
the corpus; the multi_dataset_framework one at :214-261 mis-splits the
bracketed VAD field):

  Session{1..5}/
    dialog/EmoEvaluation/<dialog>.txt
        [6.2901 - 8.2357]\tSes01F_impro01_F000\tneu\t[2.5000, 2.5000, 2.5000]
    dialog/transcriptions/<dialog>.txt
        Ses01F_impro01_F000 [6.2901-8.2357]: Excuse me.
    dialog/avi/DivX/<dialog>.avi                  (optional, dialog video)
    sentences/wav/<dialog>/<utterance>.wav

VAD come on IEMOCAP's 1..5 scale and are normalized to [-1, 1] via
(v - 3) / 2.

Splits are speaker-independent (preprocessing.py:405-448): sessions 1-4
speakers split 80/20 into train/val, session 5 is the test set.
"""

from __future__ import annotations

import logging
import re
from pathlib import Path
from typing import Optional

import numpy as np

from tpu_deer.data.cache import cache_dir_for, load_cached, save_cached
from tpu_deer.data.pipeline import ArrayDataset

logger = logging.getLogger(__name__)

EMO_LINE = re.compile(
    r"\[(\d+\.\d+)\s*-\s*(\d+\.\d+)\]\t(\S+)\t(\S+)\t\[(-?\d+\.?\d*),\s*(-?\d+\.?\d*),\s*(-?\d+\.?\d*)\]"
)
TRANSCRIPT_LINE = re.compile(r"(\S+)\s+\[[\d.]+-[\d.]+\]:\s*(.*)")


def _speaker_id(utt_id: str, session: int) -> str:
    """Ses01F_impro01_F000 → speaker 'Ses01_F' (the F/M of the utterance)."""
    turn = utt_id.split("_")[-1]
    gender = turn[0] if turn and turn[0] in "FM" else "X"
    return f"Ses{session:02d}_{gender}"


def parse_annotations(root: Path) -> list[dict]:
    """Walk all sessions; returns raw sample dicts (no features yet)."""
    samples = []
    for session in range(1, 6):
        sdir = root / f"Session{session}"
        if not sdir.is_dir():
            continue
        emo_dir = sdir / "dialog" / "EmoEvaluation"
        trans_dir = sdir / "dialog" / "transcriptions"
        if not emo_dir.is_dir():
            continue
        for emo_file in sorted(emo_dir.glob("*.txt")):
            dialog = emo_file.stem
            transcripts: dict[str, str] = {}
            tfile = trans_dir / f"{dialog}.txt"
            if tfile.exists():
                for line in tfile.read_text(errors="replace").splitlines():
                    m = TRANSCRIPT_LINE.match(line)
                    if m:
                        transcripts[m.group(1)] = m.group(2)
            for line in emo_file.read_text(errors="replace").splitlines():
                m = EMO_LINE.match(line)
                if not m:
                    continue
                t1, t2, utt_id, emotion = (
                    float(m.group(1)), float(m.group(2)), m.group(3), m.group(4),
                )
                v, a, d = (float(m.group(i)) for i in (5, 6, 7))
                wav = sdir / "sentences" / "wav" / dialog / f"{utt_id}.wav"
                avi = sdir / "dialog" / "avi" / "DivX" / f"{dialog}.avi"
                samples.append(
                    {
                        "utt_id": utt_id,
                        "session": session,
                        "speaker": _speaker_id(utt_id, session),
                        "emotion": emotion,
                        # 1..5 → [-1, 1]
                        "valence": (v - 3.0) / 2.0,
                        "arousal": (a - 3.0) / 2.0,
                        "dominance": (d - 3.0) / 2.0,
                        "wav": str(wav) if wav.exists() else None,
                        "avi": str(avi) if avi.exists() else None,
                        "t1": t1,
                        "t2": t2,
                        "text": transcripts.get(utt_id, ""),
                    }
                )
    return samples


def _assign_split(sample: dict, val_speakers: set[str]) -> str:
    if sample["session"] == 5:
        return "test"
    return "val" if sample["speaker"] in val_speakers else "train"


def _extract_video_segment(avi_path: str, t1: float, t2: float, extractor):
    """Dialog-level video: decode frames inside [t1, t2] and featurize."""
    try:
        import cv2

        cap = cv2.VideoCapture(avi_path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
        frames = []
        for frac in np.linspace(0, 1, 8):
            t = t1 + frac * max(t2 - t1, 0.04)
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(t * fps))
            ok, frame = cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            frames.append(cv2.resize(gray, (64, 64)).astype(np.float32) / 255.0)
        cap.release()
        if frames:
            return extractor.video.extract_from_frames(np.stack(frames))
    except Exception as e:
        logger.warning(f"video segment extraction failed ({avi_path}): {e}")
    return np.zeros(256, dtype=np.float32)


def load_iemocap(
    root_path: str,
    quick: bool = False,
    cache_dir: Optional[str] = None,
    extractor=None,
    pretrain_text: Optional[bool] = None,
) -> dict[str, ArrayDataset]:
    """Parse + featurize IEMOCAP → {"train"/"val"/"test": ArrayDataset}.

    pretrain_text=None (the default) is AUTO: when the loader builds its own
    extractor and no semantic text backend is configured (no local BERT via
    $TPU_DEER_BERT_DIR, no saved encoder dir), the text featurizer is
    MLM-pretrained on the corpus' own TRAIN-split transcripts
    (train.text_pretrain) and cached under the feature cache dir — the
    trained replacement for the reference's BERT features
    (preprocessing.py:702-729) in a zero-egress environment. A caller-
    provided `extractor` is an explicit backend choice and is used as-is
    under AUTO. Pass pretrain_text=False to force the hashed fallback (e.g.
    for ablation baselines), or True to pretrain even with a provided
    extractor. The backend that actually produced the text features is
    recorded in the returned dict under "text_backend". (True cannot
    override an extractor that already has a bert/encoder backend — the
    provided backend wins and True is a no-op there.)

    The feature-cache key carries the RESOLVED text backend (ADVICE r3:
    keying on the *request* cached hashed-fallback or bert features under an
    "mlm" key forever), so when the MLM bootstrap is skipped — no train
    transcripts, or a semantic extractor already present — the cache entry
    names the features it actually holds, and a later run where the
    bootstrap CAN succeed is a cache miss, not a stale hit.
    """
    from tpu_deer.data.features import MultimodalFeatureExtractor
    from tpu_deer.data.audio_io import load_wav

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
    base_key = f"iemocap_{'quick' if quick else 'full'}_v3"
    if not want_mlm:
        # Backend already resolved — cheap cache exit before any parsing.
        key = f"{base_key}_{extractor.text.backend}text"
        cached = load_cached(cdir, key)
        if cached is not None:
            return _split_arrays(cached)

    samples = parse_annotations(root)
    if not samples:
        raise FileNotFoundError(f"no IEMOCAP annotations under {root_path}")
    if quick:
        samples = samples[:200]

    speakers_14 = sorted(
        {s["speaker"] for s in samples if s["session"] < 5}
    )
    n_val = max(1, int(0.2 * len(speakers_14)))
    val_speakers = set(speakers_14[-n_val:])

    if want_mlm and extractor.text.bert is None and extractor.text.encoder is None:
        from tpu_deer.train.text_pretrain import corpus_text_featurizer

        train_texts = [
            s["text"] for s in samples
            if s["text"] and _assign_split(s, val_speakers) == "train"
        ]
        if train_texts:
            extractor.text.encoder = corpus_text_featurizer(train_texts, cdir)
        else:
            logger.warning(
                "text bootstrap skipped: corpus has no train-split "
                "transcripts — falling back to hashed text features"
            )
    if want_mlm:
        # Key on the backend the bootstrap actually resolved to (the
        # corpus-keyed encoder cache makes re-resolution cheap on reruns).
        key = f"{base_key}_{extractor.text.backend}text"
        cached = load_cached(cdir, key)
        if cached is not None:
            return _split_arrays(cached)

    # Threaded decode: the native C++ wav reader releases the GIL, so a small
    # pool parallelizes the host-bound decode+resample across utterances.
    from concurrent.futures import ThreadPoolExecutor

    def _load(s):
        return load_wav(s["wav"]) if s["wav"] else np.zeros(1600, np.float32)

    with ThreadPoolExecutor(max_workers=8) as pool:
        signals = list(pool.map(_load, samples))
    texts = [s["text"] for s in samples]
    audio_feats = extractor.audio.extract_batch(signals)
    text_feats = extractor.text.extract_batch(texts)
    # Token ids for the raw-sequence text path (reference preprocessing.py
    # tokenized inside __getitem__; here they're precomputed once).
    from tpu_deer.data.tokenizer import HashTokenizer

    token_ids, token_mask = HashTokenizer().encode_batch(texts)
    video_feats = np.stack(
        [
            _extract_video_segment(s["avi"], s["t1"], s["t2"], extractor)
            if s["avi"]
            else np.zeros(256, dtype=np.float32)
            for s in samples
        ]
    )

    arrays = {
        "audio": audio_feats.astype(np.float32),
        "video": video_feats.astype(np.float32),
        "text": text_feats.astype(np.float32),
        "token_ids": token_ids.astype(np.int32),
        "token_mask": token_mask.astype(np.int32),
        "labels": np.asarray(
            [[s["valence"], s["arousal"], s["dominance"]] for s in samples],
            dtype=np.float32,
        ),
        "split_code": np.asarray(
            [
                {"train": 0, "val": 1, "test": 2}[_assign_split(s, val_speakers)]
                for s in samples
            ],
            dtype=np.int32,
        ),
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
            name="iemocap",
        )
    out["text_backend"] = str(arrays.get("text_backend", "hashed"))
    return out
