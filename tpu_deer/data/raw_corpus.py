"""Raw-media corpus path: real-format fixtures + loader for end-to-end
raw-sequence training.

The reference sketches a raw-media dataflow (waveforms → librosa features →
BiLSTM, frames → CNN, tokens → BERT; encoders.py:144-172, 418-459) but never
wires it into training. This module makes it real for the TPU stack:

  * `generate_raw_fixture` writes a mini corpus in the IEMOCAP directory
    layout (Session*/dialog/{EmoEvaluation,transcriptions},
    sentences/wav/<dialog>/<utt>.wav) plus per-utterance video frame arrays
    under sentences/video/<dialog>/<utt>.npy. The media is generated so the
    labels are LEARNABLE: pitch/energy track arousal, frame brightness and
    motion track valence/arousal, transcripts carry emotion keywords —
    training to a nonzero CCC is a meaningful check, not luck.
  * `load_raw_corpus` parses the same layout (reusing the IEMOCAP annotation
    parser) into padded raw arrays: signals [N, L], video frames
    [N, T, H, W, 3], token ids from a real corpus vocabulary, VAD labels.
    Split: sessions 1-3 train / session 4 val / session 5 test (documented
    raw-path convention; the feature-level loader keeps the reference's
    speaker-quantile split, preprocessing.py:405-448).

Training consumes these through train.raw_trainer, which runs the Pallas
audio front-end IN-GRAPH — raw signal to loss in one XLA program.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

from tpu_deer.data.iemocap import parse_annotations
from tpu_deer.data.vocab import CorpusVocab

logger = logging.getLogger(__name__)

# Emotion prototypes for the fixture generator: (valence, arousal, dominance).
_FIXTURE_CATEGORIES = {
    "joy": (0.7, 0.5, 0.3),
    "sad": (-0.6, -0.5, -0.4),
    "anger": (-0.5, 0.7, 0.5),
    "calm": (0.4, -0.6, 0.1),
}
_FIXTURE_WORDS = {
    "joy": ["wonderful", "delighted", "great", "cheerful"],
    "sad": ["terrible", "mournful", "awful", "gloomy"],
    "anger": ["furious", "outraged", "livid", "irate"],
    "calm": ["peaceful", "serene", "relaxed", "quiet"],
}


def _write_wav(path: Path, signal: np.ndarray, sr: int = 16000) -> None:
    from scipy.io import wavfile

    wavfile.write(str(path), sr, (np.clip(signal, -1, 1) * 32767).astype(np.int16))


def generate_raw_fixture(
    root: str,
    n_train: int = 96,
    n_val: int = 32,
    n_test: int = 32,
    duration_s: float = 0.8,
    n_frames: int = 4,
    image_size: int = 16,
    sample_rate: int = 16000,
    seed: int = 0,
) -> str:
    """Write a learnable raw-media corpus in the IEMOCAP layout. Returns root."""
    rng = np.random.default_rng(seed)
    root_path = Path(root)
    cats = list(_FIXTURE_CATEGORIES)
    session_plan = [(1, n_train // 2), (2, n_train - n_train // 2),
                    (4, n_val), (5, n_test)]
    t = np.arange(int(duration_s * sample_rate)) / sample_rate
    for session, count in session_plan:
        sdir = root_path / f"Session{session}"
        (sdir / "dialog" / "EmoEvaluation").mkdir(parents=True, exist_ok=True)
        (sdir / "dialog" / "transcriptions").mkdir(parents=True, exist_ok=True)
        dialog = f"Ses0{session}F_impro01"
        wav_dir = sdir / "sentences" / "wav" / dialog
        vid_dir = sdir / "sentences" / "video" / dialog
        wav_dir.mkdir(parents=True, exist_ok=True)
        vid_dir.mkdir(parents=True, exist_ok=True)
        emo_lines, trans_lines = [], []
        for i in range(count):
            utt = f"{dialog}_F{i:03d}"
            cat = cats[int(rng.integers(len(cats)))]
            v, a, d = (
                np.clip(x + rng.normal(0, 0.08), -1, 1)
                for x in _FIXTURE_CATEGORIES[cat]
            )
            v01, a01, d01 = (v + 1) / 2, (a + 1) / 2, (d + 1) / 2
            # Audio: pitch + energy track arousal; 2nd harmonic tracks
            # dominance.
            f0 = 140.0 + 220.0 * a01
            amp = 0.15 + 0.4 * a01
            sig = amp * np.sin(2 * np.pi * f0 * t)
            sig += (0.05 + 0.25 * d01) * np.sin(2 * np.pi * 2 * f0 * t)
            sig += 0.02 * rng.standard_normal(len(t))
            _write_wav(wav_dir / f"{utt}.wav", sig, sample_rate)
            # Video: brightness tracks valence, inter-frame motion tracks
            # arousal.
            base = 0.2 + 0.6 * v01
            frames = np.empty((n_frames, image_size, image_size, 3), np.float32)
            phase = rng.random() * 2 * np.pi
            yy = np.linspace(0, 2 * np.pi, image_size)[:, None, None]
            for fidx in range(n_frames):
                motion = 0.15 * a01 * np.sin(yy + phase + fidx * (0.5 + 2.0 * a01))
                frames[fidx] = np.clip(
                    base + motion + 0.03 * rng.standard_normal(
                        (image_size, image_size, 3)
                    ),
                    0.0, 1.0,
                )
            np.save(vid_dir / f"{utt}.npy", frames)
            # Text: two same-category emotion keywords in a template.
            w1, w2 = rng.choice(_FIXTURE_WORDS[cat], size=2, replace=False)
            text = f"that felt {w1} and {w2} to everyone"
            t1, t2 = float(i), float(i) + duration_s
            # Labels written on IEMOCAP's 1..5 scale (parser maps to [-1,1]).
            emo_lines.append(
                f"[{t1:.4f} - {t2:.4f}]\t{utt}\t{cat[:3]}\t"
                f"[{v * 2 + 3:.4f}, {a * 2 + 3:.4f}, {d * 2 + 3:.4f}]"
            )
            trans_lines.append(f"{utt} [{t1:.4f}-{t2:.4f}]: {text}")
        (sdir / "dialog" / "EmoEvaluation" / f"{dialog}.txt").write_text(
            "\n".join(emo_lines)
        )
        (sdir / "dialog" / "transcriptions" / f"{dialog}.txt").write_text(
            "\n".join(trans_lines)
        )
    logger.info(f"raw fixture corpus written under {root}")
    return root


def _video_path_for(sample: dict) -> Optional[Path]:
    if not sample["wav"]:
        return None
    wav = Path(sample["wav"])
    # .../sentences/wav/<dialog>/<utt>.wav → .../sentences/video/<dialog>/<utt>.npy
    return wav.parent.parent.parent / "video" / wav.parent.name / (
        wav.stem + ".npy"
    )


def load_raw_corpus(
    root: str,
    vocab: Optional[CorpusVocab] = None,
    max_audio_s: float = 1.0,
    sample_rate: int = 16000,
    max_video_frames: int = 4,
    image_size: int = 16,
    max_tokens: int = 16,
) -> tuple[dict[str, dict[str, np.ndarray]], CorpusVocab]:
    """Parse an IEMOCAP-layout corpus into raw arrays for sequence training.

    Returns ({"train"/"val"/"test": {signal, video_frames, token_ids,
    token_mask, labels}}, vocab). The vocabulary is built from TRAIN
    transcripts when not supplied.
    """
    from tpu_deer.data.audio_io import load_wav

    samples = parse_annotations(Path(root))
    if not samples:
        raise FileNotFoundError(f"no annotations under {root}")

    def split_of(s) -> str:
        if s["session"] == 5:
            return "test"
        if s["session"] == 4:
            return "val"
        return "train"

    if vocab is None:
        vocab = CorpusVocab.build(
            (s["text"] for s in samples if split_of(s) == "train"),
            max_length=max_tokens,
        )

    n_audio = int(max_audio_s * sample_rate)
    # Threaded decode up front: the native C++ wav reader releases the GIL,
    # so a small pool parallelizes decode+resample across utterances (same
    # pattern as ravdess.py / iemocap.py).
    from concurrent.futures import ThreadPoolExecutor

    def _load(s):
        return (
            load_wav(s["wav"], target_sr=sample_rate)
            if s["wav"]
            else np.zeros(n_audio, np.float32)
        )

    with ThreadPoolExecutor(max_workers=8) as pool:
        signals = list(pool.map(_load, samples))

    splits: dict[str, dict[str, list]] = {}
    for s, sig in zip(samples, signals):
        padded = np.zeros(n_audio, np.float32)
        padded[: min(len(sig), n_audio)] = sig[:n_audio]

        vpath = _video_path_for(s)
        if vpath is not None and vpath.exists():
            frames = np.load(vpath).astype(np.float32)
        else:
            frames = np.zeros(
                (max_video_frames, image_size, image_size, 3), np.float32
            )
        vid = np.zeros((max_video_frames, image_size, image_size, 3), np.float32)
        tt = min(frames.shape[0], max_video_frames)
        vid[:tt] = frames[:tt, :image_size, :image_size, :3]

        ids, mask = vocab.encode(s["text"])
        bucket = splits.setdefault(
            split_of(s),
            {"signal": [], "video_frames": [], "token_ids": [],
             "token_mask": [], "labels": []},
        )
        bucket["signal"].append(padded)
        bucket["video_frames"].append(vid)
        bucket["token_ids"].append(ids)
        bucket["token_mask"].append(mask)
        bucket["labels"].append(
            [s["valence"], s["arousal"], s["dominance"]]
        )

    out = {
        name: {
            "signal": np.stack(b["signal"]).astype(np.float32),
            "video_frames": np.stack(b["video_frames"]).astype(np.float32),
            "token_ids": np.stack(b["token_ids"]).astype(np.int32),
            "token_mask": np.stack(b["token_mask"]).astype(np.int32),
            "labels": np.asarray(b["labels"], np.float32),
        }
        for name, b in splits.items()
    }
    return out, vocab
