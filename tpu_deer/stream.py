"""Streaming real-time emotion recognition over live audio.

The reference is strictly offline — it extracts features from a complete
utterance file, so its 47 ms/sample "inference latency" claim has no
real-time story at all (reference preprocessing.py:510-615 loads whole .wav
files through librosa). This module makes live streaming a first-class
capability, designed TPU-first:

  * **Fixed chunk size, static shapes.** Audio arrives in fixed-size chunks
    (`chunk_samples`, a multiple of the frontend hop). Every push is ONE
    jitted dispatch — framing, the fused MFCC frontend, delta regression,
    running-statistics update, and the flagship model forward all compile
    into a single XLA program that never recompiles.
  * **O(chunk) incremental features.** The 84-d utterance vector
    (`ops/audio_frontend.py:extract_utterance_features` layout) is a set of
    means/stds over frame-level features, so the stream state carries
    *running moments* (count / mean / M2, Welford-merged per chunk —
    numerically stable for unbounded session lengths, unlike raw f32
    sum-of-squares which loses the variance after ~1e7 frames) plus
    tiny carry buffers: the last `n_fft - hop` raw samples (framing overlap)
    and the last `delta_width - 1` MFCC / Δ frames (delta context). Each
    push costs work proportional to the chunk, not to the stream history.
  * **Many concurrent streams per chip.** State is stored with a leading
    stream axis and the whole update is `jax.vmap`-ed, so a serving host
    pushes one [S, chunk] batch per tick and gets S emotion estimates back
    in a single dispatch — the MXU sees batched matmuls, not S tiny ones.

Streaming semantics vs the offline extractor: the offline path
center-pads the full signal by reflection on both ends; a live stream has
no future samples, so the stream starts from silence (a zero carry — the
first ~`n_fft` samples see a startup transient) and simply does not emit
the final-edge frames until the audio for them arrives. Delta statistics
skip the first `delta_width-1` frame centers whose regression window would
touch pre-stream silence. After a few chunks the running features converge
to the offline extractor's output on the same audio (tested in
tests/test_stream.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_deer.core.nig import nig_expected_abs_error
from tpu_deer.ops import dsp
from tpu_deer.ops.audio_frontend import (
    AudioFrontendConfig,
    FEATURE_DIM,
    _bases,
    f0_autocorrelation,
    mfcc_frames,
    rms_energy,
    spectral_summaries,
    zero_crossing_rate,
)


@dataclasses.dataclass(frozen=True)
class StreamingConfig:
    """Static configuration for a streaming session.

    `chunk_samples` must be a positive multiple of the frontend hop length
    so every push yields a whole number of frames (static shapes: the jitted
    update never recompiles).
    """

    frontend: AudioFrontendConfig = AudioFrontendConfig()
    chunk_samples: int = 4096

    def __post_init__(self):
        hop = self.frontend.hop_length
        if self.chunk_samples <= 0 or self.chunk_samples % hop:
            raise ValueError(
                f"chunk_samples={self.chunk_samples} must be a positive "
                f"multiple of hop_length={hop}"
            )
        if self.chunk_samples < self.frontend.n_fft:
            raise ValueError(
                f"chunk_samples={self.chunk_samples} must cover one FFT "
                f"window (n_fft={self.frontend.n_fft})"
            )
        # The per-update delta context (mfcc_tail/d1_tail) is refilled from
        # this update's frames alone, so each chunk must produce at least
        # delta_width-1 frames or the carried tail shapes break.
        min_frames = self.frontend.delta_width - 1
        if self.chunk_samples // hop < min_frames:
            raise ValueError(
                f"chunk_samples={self.chunk_samples} yields "
                f"{self.chunk_samples // hop} frames/chunk; need >= "
                f"delta_width-1 = {min_frames} (raise chunk_samples or "
                f"lower delta_width)"
            )

    @property
    def frames_per_chunk(self) -> int:
        return self.chunk_samples // self.frontend.hop_length

    @property
    def sample_carry(self) -> int:
        return self.frontend.n_fft - self.frontend.hop_length


class StreamState(NamedTuple):
    """Per-stream carry (all arrays; leading stream axis when batched)."""

    sample_tail: jax.Array  # [n_fft - hop] raw-sample framing overlap
    mfcc_tail: jax.Array  # [delta_width - 1, n_mfcc] Δ context
    d1_tail: jax.Array  # [delta_width - 1, n_mfcc] ΔΔ context
    n_frames: jax.Array  # scalar f32: frames accumulated
    mfcc_stats: jax.Array  # [2, n_mfcc]: running mean, M2 (Welford)
    d1_n: jax.Array
    d1_stats: jax.Array  # [2, n_mfcc]
    d2_n: jax.Array
    d2_stats: jax.Array  # [2, n_mfcc]
    f0_n: jax.Array  # voiced-frame count
    f0_stats: jax.Array  # [2]
    rms_stats: jax.Array  # [2]
    zcr_mean: jax.Array
    centroid_mean: jax.Array


def init_stream_state(cfg: StreamingConfig) -> StreamState:
    fe = cfg.frontend
    w = fe.delta_width - 1
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return StreamState(
        sample_tail=z(cfg.sample_carry),
        mfcc_tail=z(w, fe.n_mfcc),
        d1_tail=z(w, fe.n_mfcc),
        n_frames=z(),
        mfcc_stats=z(2, fe.n_mfcc),
        d1_n=z(),
        d1_stats=z(2, fe.n_mfcc),
        d2_n=z(),
        d2_stats=z(2, fe.n_mfcc),
        f0_n=z(),
        f0_stats=z(2),
        rms_stats=z(2),
        zcr_mean=z(),
        centroid_mean=z(),
    )


def _valid_deltas(tail: jax.Array, new: jax.Array, width: int):
    """Un-padded regression deltas over [tail; new].

    With |tail| = width-1 and |new| = F this yields exactly F outputs whose
    centers lag `width//2` frames behind the newest frame — the interior
    (edge-effect-free) deltas, identical to the offline `deltas()` away from
    signal edges.
    """
    x = jnp.concatenate([tail, new], axis=0)
    kernel = jnp.asarray(dsp.delta_kernel(width), dtype=x.dtype)
    n_out = new.shape[0]
    windows = jnp.stack([x[i : i + n_out] for i in range(width)], axis=0)
    return jnp.einsum("w,wnf->nf", kernel, windows)


def streaming_update(
    state: StreamState, chunk: jax.Array, cfg: StreamingConfig
) -> tuple[StreamState, jax.Array]:
    """One stream, one chunk [chunk_samples] → (new state, 84-d features).

    Pure and jit/vmap-safe; all shapes static. The emitted vector follows
    the canonical layout of `extract_utterance_features` (audio_frontend
    docstring), normalized to zero mean / unit variance.
    """
    fe = cfg.frontend
    half = fe.delta_width // 2
    F = cfg.frames_per_chunk

    signal = jnp.concatenate([state.sample_tail, chunk.astype(jnp.float32)])
    # Framing without center padding: frame k covers samples [k*hop, k*hop+n_fft).
    starts = jnp.arange(F) * fe.hop_length
    idx = starts[:, None] + jnp.arange(fe.n_fft)[None, :]
    frames = jnp.take(signal, idx, axis=0)

    mfcc, _, power = mfcc_frames(frames, fe)
    d1 = _valid_deltas(state.mfcc_tail, mfcc, fe.delta_width)
    d2 = _valid_deltas(state.d1_tail, d1, fe.delta_width)

    # Global frame indices of this update's outputs. Delta centers lag the
    # newest MFCC frame; centers whose window touches pre-stream silence
    # (index < width-1) are masked out of the running statistics.
    n0 = state.n_frames
    d1_centers = n0 - half + jnp.arange(F, dtype=jnp.float32)
    d2_centers = n0 - 2 * half + jnp.arange(F, dtype=jnp.float32)
    d1_mask = (d1_centers >= fe.delta_width - 1).astype(jnp.float32)[:, None]
    d2_mask = (d2_centers >= 2 * (fe.delta_width - 1)).astype(jnp.float32)[:, None]

    f0, voiced = f0_autocorrelation(power, fe)
    v = voiced.astype(jnp.float32)
    rms = rms_energy(frames * jnp.asarray(_bases(fe)["window"]))
    zcr = zero_crossing_rate(frames)
    centroid, _, _ = spectral_summaries(power, fe)

    ones = jnp.ones((F, 1), jnp.float32)
    new_state = StreamState(
        sample_tail=signal[-cfg.sample_carry :],
        mfcc_tail=mfcc[-(fe.delta_width - 1) :],
        d1_tail=d1[-(fe.delta_width - 1) :],
        n_frames=n0 + F,
        mfcc_stats=_merge_moments(state.mfcc_stats, n0, mfcc, ones, float(F)),
        d1_n=state.d1_n + d1_mask.sum(),
        d1_stats=_merge_moments(
            state.d1_stats, state.d1_n, d1, d1_mask, d1_mask.sum()
        ),
        d2_n=state.d2_n + d2_mask.sum(),
        d2_stats=_merge_moments(
            state.d2_stats, state.d2_n, d2, d2_mask, d2_mask.sum()
        ),
        f0_n=state.f0_n + v.sum(),
        f0_stats=_merge_moments(state.f0_stats, state.f0_n, f0, v, v.sum()),
        rms_stats=_merge_moments(
            state.rms_stats, n0, rms, ones[:, 0], float(F)
        ),
        zcr_mean=state.zcr_mean
        + (zcr.mean() - state.zcr_mean) * (F / (n0 + F)),
        centroid_mean=state.centroid_mean
        + (centroid.mean() - state.centroid_mean) * (F / (n0 + F)),
    )
    return new_state, _features_from_state(new_state)


def _merge_moments(
    stats: jax.Array, n_old: jax.Array, x: jax.Array, w: jax.Array,
    n_new: jax.Array,
) -> jax.Array:
    """Chan's parallel (mean, M2) merge of a weighted batch into running
    moments. `stats` is [2, ...] (mean, M2); `x` the batch values with `w`
    0/1 weights summing to `n_new` (broadcastable to x).

    Why not plain sum / sum-of-squares: for a long-lived stream the f32
    sum-of-squares grows without bound and the variance (E[x^2] - E[x]^2
    catastrophic cancellation) is lost after ~1e7 frames (~2 days of
    continuous audio). Welford-style moments keep full precision for
    unbounded session lengths at the same state size."""
    nb = jnp.maximum(n_new, 1.0)
    bm = (x * w).sum(axis=0) / nb
    bM2 = (((x - bm) ** 2) * w).sum(axis=0)
    n_tot = jnp.maximum(n_old + n_new, 1.0)
    delta = bm - stats[0]
    mean = stats[0] + delta * (n_new / n_tot)
    M2 = stats[1] + bM2 + delta * delta * (n_old * n_new / n_tot)
    # An empty batch (n_new == 0, e.g. no voiced frames) changes nothing.
    return jnp.where(n_new > 0, jnp.stack([mean, M2]), stats)


def _mean_std(stats: jax.Array, n: jax.Array):
    """(mean, M2) running moments → (mean, population std)."""
    n = jnp.maximum(n, 1.0)
    return stats[0], jnp.sqrt(jnp.maximum(stats[1] / n, 0.0))


def _features_from_state(s: StreamState) -> jax.Array:
    m_mean, m_std = _mean_std(s.mfcc_stats, s.n_frames)
    d1_mean, d1_std = _mean_std(s.d1_stats, s.d1_n)
    d2_mean, d2_std = _mean_std(s.d2_stats, s.d2_n)
    f0_mean, f0_std = _mean_std(s.f0_stats, s.f0_n)
    rms_mean, rms_std = _mean_std(s.rms_stats, s.n_frames)
    vec = jnp.concatenate(
        [
            m_mean, m_std, d1_mean, d1_std, d2_mean, d2_std,
            jnp.stack(
                [
                    f0_mean, f0_std, rms_mean, rms_std,
                    s.zcr_mean, s.centroid_mean,
                ]
            ),
        ]
    )
    assert vec.shape == (FEATURE_DIM,)
    return (vec - vec.mean()) / (vec.std() + 1e-8)


class StreamingRecognizer:
    """Multi-stream real-time emotion recognition service.

    Holds `n_streams` independent audio sessions. Every `push` processes one
    fixed-size chunk for ALL streams and runs the flagship model on the
    updated per-stream features — a single jitted dispatch per tick.

    Video/text context features (for A+V+T prediction) are supplied per
    push and may update at any cadence; pass zeros for audio-only streams
    (the model was trained with modality dropout-free fusion, so zero
    context degrades gracefully — see the ablation study for A-only CCC).
    """

    def __init__(
        self,
        model,
        params,
        n_streams: int = 8,
        cfg: StreamingConfig = StreamingConfig(),
        ood_detector=None,
        ood_fpr: float = 0.01,
    ):
        self.model = model
        self.cfg = cfg
        self.n_streams = n_streams
        self.params = jax.device_put(params)
        # ood_detector: a fitted eval/ood.py:MahalanobisOOD in "input_norm"
        # space. The score is computed inside the tick program from the
        # SAME (features, video, text) triple the model sees — fit the
        # detector on the context distribution the sessions will carry
        # (zeros for audio-only sessions count as values: fit with zeroed
        # video/text then). Each push gains "ood_score"; `ood_threshold`
        # is exposed for callers that flag at the fitted FPR.
        self._ood = None
        self.ood_threshold = None
        if ood_detector is not None:
            if ood_detector.space != "input_norm":
                raise ValueError(
                    "streaming OOD needs an 'input_norm'-space detector; "
                    f"got space={ood_detector.space!r}"
                )
            mean, whitener = ood_detector.device_arrays
            self._ood = (jax.device_put(mean), jax.device_put(whitener))
            self.ood_threshold = float(ood_detector.threshold(ood_fpr))
        self._init_one = init_stream_state(cfg)
        self.state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape), self._init_one
        )

        def step(params, state, chunks, video, text, active):
            new_state, feats = jax.vmap(
                lambda s, c: streaming_update(s, c, cfg)
            )(state, chunks)
            # Inactive slots pass through untouched (their chunk input is
            # ignored) — sessions advance independently even though every
            # dispatch carries all S slots.
            sel = lambda old, new: jnp.where(
                active.reshape((n_streams,) + (1,) * (old.ndim - 1)), new, old
            )
            state = jax.tree_util.tree_map(sel, state, new_state)
            feats = jax.vmap(_features_from_state)(state)
            out = model.apply(
                {"params": params}, feats, video, text, deterministic=True
            )
            res = {
                "features": feats,
                "mu": out["mu_all"],
                "uncertainty": out["uncertainty_all"],
                "calibrated_uncertainty": out["calibrated_uncertainty"],
                # Raw-NIG error forecast in |error| units (core/nig.py:
                # nig_expected_abs_error; calibrated without a learned layer).
                "expected_abs_error": jnp.concatenate(
                    [
                        nig_expected_abs_error(out[f"{n}_params"])
                        for n in model.config.dim_names
                    ],
                    axis=-1,
                ),
            }
            if self._ood is not None:
                from tpu_deer.eval.ood import (
                    input_norm_features_device,
                    mahalanobis_score_device,
                )

                res["ood_score"] = mahalanobis_score_device(
                    input_norm_features_device(feats, video, text),
                    self._ood[0], self._ood[1],
                )
            return state, res

        self._step = jax.jit(step)

        def reset(state, mask):
            fresh = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape),
                self._init_one,
            )
            pick = lambda old, new: jnp.where(
                mask.reshape((n_streams,) + (1,) * (old.ndim - 1)), new, old
            )
            return jax.tree_util.tree_map(pick, state, fresh)

        self._reset = jax.jit(reset)

    def reset_streams(self, stream_ids) -> None:
        """End the given sessions; their slots restart from silence."""
        ids = np.asarray(stream_ids, dtype=np.int64)
        if ids.size == 0:
            return
        mask = np.zeros(self.n_streams, bool)
        mask[ids] = True
        self.state = self._reset(self.state, jnp.asarray(mask))

    def push(
        self,
        chunks: np.ndarray,
        video: Optional[np.ndarray] = None,
        text: Optional[np.ndarray] = None,
        active: Optional[np.ndarray] = None,
    ) -> dict[str, np.ndarray]:
        """chunks [n_streams, chunk_samples] → per-stream predictions.

        `active` ([S] bool, default all-true) selects which slots consume
        their chunk this tick; inactive slots keep their state (their
        outputs are still returned, computed from the unchanged state).
        Returns features [S, 84], mu [S, 3], raw + calibrated uncertainty.
        """
        S = self.n_streams
        mcfg = self.model.config
        if chunks.shape != (S, self.cfg.chunk_samples):
            raise ValueError(
                f"chunks must be [{S}, {self.cfg.chunk_samples}], "
                f"got {chunks.shape}"
            )
        if video is None:
            video = np.zeros((S, mcfg.video_dim), np.float32)
        if text is None:
            text = np.zeros((S, mcfg.text_dim), np.float32)
        if active is None:
            active = np.ones(S, bool)
        self.state, out = self._step(
            self.params,
            self.state,
            jnp.asarray(chunks, jnp.float32),
            jnp.asarray(video, jnp.float32),
            jnp.asarray(text, jnp.float32),
            jnp.asarray(active, bool),
        )
        return {k: np.asarray(v) for k, v in out.items()}
