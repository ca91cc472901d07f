"""Multimodal feature extraction for the offline data pipeline.

Capability parity with reference MultimodalFeatureExtractor
(preprocessing.py:494-738), rebuilt for the TPU-native stack:

  * audio — the Pallas/XLA front-end (tpu_deer.ops.audio_frontend) replaces
    the per-sample librosa loop. Utterances are processed in device batches:
    signals are padded to a few fixed length buckets so the jitted extractor
    compiles a handful of times, then streams batches through the MXU.
  * video — cv2 frame decoding + spatial-grid statistics pooled over time
    into a 256-d vector (the reference pooled grayscale stats into an
    ad-hoc 512 padding, preprocessing.py:617-700; here the layout exactly
    fills the model's 256-d video input: 8x8 grid x {frame-mean, frame-std,
    |Δframe|-mean, |Δframe|-std}).
  * text — a deterministic hashed word/bigram projection into 768-d. The
    reference embeds BERT [CLS] inside the Dataset (preprocessing.py:702-729);
    this image has no BERT weights cached and zero egress, so hashing is the
    default and a local BERT (torch, offline dir) is used when available.

Failures produce zero vectors with a LOUD warning (the reference zeroed
silently — preprocessing.py:731-738).
"""

from __future__ import annotations

import hashlib
import logging
import os
import re
from typing import Optional, Sequence

import numpy as np

from tpu_deer.ops.audio_frontend import (
    FEATURE_DIM,
    AudioFrontendConfig,
    extract_utterance_features,
)

logger = logging.getLogger(__name__)

AUDIO_DIM = FEATURE_DIM  # 84
VIDEO_DIM = 256
TEXT_DIM = 768

# Pad audio to these second-bucket lengths so jit compiles once per bucket.
LENGTH_BUCKETS_S = (2.0, 4.0, 8.0, 16.0)


class AudioFeatureExtractor:
    def __init__(self, cfg: AudioFrontendConfig = AudioFrontendConfig()):
        self.cfg = cfg
        self._jitted = {}

    def _fn_for_length(self, n: int):
        import jax

        if n not in self._jitted:
            cfg = self.cfg

            @jax.jit
            def batch_fn(signals):
                return jax.vmap(lambda s: extract_utterance_features(s, cfg))(
                    signals
                )

            self._jitted[n] = batch_fn
        return self._jitted[n]

    def _bucket_length(self, n: int) -> int:
        sr = self.cfg.sample_rate
        for sec in LENGTH_BUCKETS_S:
            if n <= int(sec * sr):
                return int(sec * sr)
        return int(LENGTH_BUCKETS_S[-1] * sr)

    def extract_batch(self, signals: Sequence[np.ndarray]) -> np.ndarray:
        """List of 1-D float32 signals → [N, 84] feature matrix.

        Groups signals by padded length bucket and runs each bucket as one
        vmapped+jitted device batch.
        """
        out = np.zeros((len(signals), AUDIO_DIM), dtype=np.float32)
        buckets: dict[int, list[int]] = {}
        for i, s in enumerate(signals):
            n = self._bucket_length(len(s))
            buckets.setdefault(n, []).append(i)
        for n, idxs in buckets.items():
            batch = np.zeros((len(idxs), n), dtype=np.float32)
            for row, i in enumerate(idxs):
                s = np.asarray(signals[i], dtype=np.float32)[:n]
                batch[row, : len(s)] = s
            feats = np.asarray(self._fn_for_length(n)(batch))
            out[idxs] = feats
        return out

    def extract(self, signal: np.ndarray) -> np.ndarray:
        return self.extract_batch([signal])[0]


class VideoFeatureExtractor:
    """cv2-based 256-d video features: 8x8 spatial grid statistics."""

    def __init__(self, max_frames: int = 32, grid: int = 8):
        self.max_frames = max_frames
        self.grid = grid

    def extract_from_frames(self, frames: np.ndarray) -> np.ndarray:
        """frames [T, H, W] grayscale float → 256-d."""
        g = self.grid
        t, h, w = frames.shape
        hh, ww = h - h % g, w - w % g
        cells = frames[:, :hh, :ww].reshape(t, g, hh // g, g, ww // g)
        cell_means = cells.mean(axis=(2, 4))  # [T, g, g]
        diffs = np.abs(np.diff(cell_means, axis=0)) if t > 1 else np.zeros((1, g, g))
        feat = np.concatenate(
            [
                cell_means.mean(axis=0).ravel(),
                cell_means.std(axis=0).ravel(),
                diffs.mean(axis=0).ravel(),
                diffs.std(axis=0).ravel(),
            ]
        ).astype(np.float32)
        assert feat.shape == (VIDEO_DIM,)
        std = feat.std()
        return (feat - feat.mean()) / (std + 1e-8)

    def extract(self, video_path: str) -> np.ndarray:
        try:
            import cv2

            cap = cv2.VideoCapture(video_path)
            n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 0
            take = np.linspace(0, max(n - 1, 0), min(self.max_frames, max(n, 1)))
            frames = []
            for idx in take.astype(int):
                cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
                ok, frame = cap.read()
                if not ok:
                    break
                gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
                frames.append(cv2.resize(gray, (64, 64)).astype(np.float32) / 255.0)
            cap.release()
            if not frames:
                raise ValueError("no decodable frames")
            return self.extract_from_frames(np.stack(frames))
        except Exception as e:
            logger.warning(f"video feature extraction FAILED for {video_path}: {e} "
                           "— emitting zeros")
            return np.zeros(VIDEO_DIM, dtype=np.float32)


_TOKEN_RE = re.compile(r"[a-z']+")


class TextFeatureExtractor:
    """768-d text features, best available semantic backend first:

    1. local pretrained BERT (torch, offline dir via `bert_dir` or
       $TPU_DEER_BERT_DIR) — the reference's path (preprocessing.py:702-729);
    2. a corpus-MLM-pretrained TextSequenceEncoder (directory saved by
       train.text_pretrain.TextEncoderFeaturizer, via `encoder_dir` or
       $TPU_DEER_TEXT_ENCODER_DIR) — the trained replacement when no BERT
       weights exist (zero-egress image);
    3. hashed projection fallback: signed feature hashing of words + bigrams
       into 768 bins, l2-normalized — deterministic and zero-dependency, but
       it cannot generalize across surface forms (see
       tests/test_text_pretrain.py for the measured gap).
    """

    def __init__(
        self,
        bert_dir: Optional[str] = None,
        encoder_dir: Optional[str] = None,
    ):
        self.bert = None
        self.tokenizer = None
        self.encoder = None
        bert_dir = bert_dir or os.environ.get("TPU_DEER_BERT_DIR")
        if bert_dir and os.path.isdir(bert_dir):
            try:
                import torch  # noqa: F401
                from transformers import AutoModel, AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(bert_dir)
                self.bert = AutoModel.from_pretrained(bert_dir)
                self.bert.eval()
                logger.info(f"text features: BERT from {bert_dir}")
            except Exception as e:
                logger.warning(f"local BERT unavailable ({e}); trying next backend")
        if self.bert is None:
            encoder_dir = encoder_dir or os.environ.get("TPU_DEER_TEXT_ENCODER_DIR")
            if encoder_dir and os.path.isdir(encoder_dir):
                try:
                    from tpu_deer.train.text_pretrain import TextEncoderFeaturizer

                    self.encoder = TextEncoderFeaturizer.load(encoder_dir)
                    logger.info(
                        f"text features: MLM-pretrained encoder from {encoder_dir}"
                    )
                except Exception as e:
                    logger.warning(
                        f"pretrained text encoder unavailable ({e}); "
                        "using hashed features"
                    )

    @property
    def backend(self) -> str:
        """Which semantic backend is live: 'bert' | 'mlm' | 'hashed'.

        Recorded by corpus loaders into their feature caches and surfaced in
        pipeline artifacts so a run's text path is auditable (the reference
        always silently assumed BERT; preprocessing.py:702-729)."""
        if self.bert is not None:
            return "bert"
        if self.encoder is not None:
            return "mlm"
        return "hashed"

    @staticmethod
    def _hash_token(token: str) -> tuple[int, float]:
        digest = hashlib.md5(token.encode()).digest()
        idx = int.from_bytes(digest[:4], "little") % TEXT_DIM
        sign = 1.0 if digest[4] % 2 == 0 else -1.0
        return idx, sign

    def _hashed(self, text: str) -> np.ndarray:
        vec = np.zeros(TEXT_DIM, dtype=np.float32)
        tokens = _TOKEN_RE.findall(text.lower())
        for tok in tokens:
            i, s = self._hash_token(tok)
            vec[i] += s
        for a, b in zip(tokens, tokens[1:]):
            i, s = self._hash_token(a + "_" + b)
            vec[i] += 0.5 * s
        norm = np.linalg.norm(vec)
        return vec / norm if norm > 0 else vec

    @staticmethod
    def _fit_dim(vec: np.ndarray) -> np.ndarray:
        """Pad/truncate a backend's feature width to TEXT_DIM (a non-base
        BERT variant may not be 768-wide)."""
        if vec.shape[-1] == TEXT_DIM:
            return vec
        out = np.zeros(TEXT_DIM, dtype=np.float32)
        n = min(TEXT_DIM, vec.shape[-1])
        out[:n] = vec[:n]
        return out

    def extract(self, text: str) -> np.ndarray:
        if not text:
            return np.zeros(TEXT_DIM, dtype=np.float32)
        if self.bert is not None:
            import torch

            with torch.no_grad():
                enc = self.tokenizer(
                    text, return_tensors="pt", truncation=True, max_length=128
                )
                out = self.bert(**enc)
            return self._fit_dim(
                out.last_hidden_state[0, 0].numpy().astype(np.float32)
            )
        if self.encoder is not None:
            return self._fit_dim(self.encoder.extract(text))
        return self._hashed(text)

    def extract_batch(self, texts: Sequence[str]) -> np.ndarray:
        if self.bert is None and self.encoder is not None:
            feats = self.encoder.extract_batch(list(texts))
            if feats.shape[-1] != TEXT_DIM:
                feats = np.stack([self._fit_dim(v) for v in feats])
            # Preserve the empty-text convention of extract().
            for i, t in enumerate(texts):
                if not t:
                    feats[i] = 0.0
            return feats
        return np.stack([self.extract(t) for t in texts])


class MultimodalFeatureExtractor:
    """Bundles the three extractors behind one interface
    (reference preprocessing.py:494-738)."""

    def __init__(
        self,
        audio_cfg: AudioFrontendConfig = AudioFrontendConfig(),
        bert_dir: Optional[str] = None,
    ):
        self.audio = AudioFeatureExtractor(audio_cfg)
        self.video = VideoFeatureExtractor()
        self.text = TextFeatureExtractor(bert_dir)
