"""Seeded synthetic multimodal dataset — the dataset-free CI/quick-mode fixture.

Parity with the reference's synthetic fallback (run_multimodal_deer.py:329-351)
with one deliberate fix: the reference draws labels independently of features
(unlearnable — CCC can never rise above 0), whereas here the VAD labels are a
deterministic nonlinear function of the features plus controllable noise, so
training curves and CCC actually measure learning. Set `label_noise=1e9` to
recover unlearnable-noise behavior if needed.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SyntheticConfig:
    n_train: int = 1000
    n_val: int = 200
    n_test: int = 200
    audio_dim: int = 84
    video_dim: int = 256
    text_dim: int = 768
    emotion_dims: int = 3
    label_noise: float = 0.05
    # Per-sample difficulty heterogeneity: fraction of samples with extra
    # label noise, so uncertainty estimation has real signal to learn.
    hard_fraction: float = 0.3
    hard_noise: float = 0.4
    # Whether hardness is a FUNCTION OF THE FEATURES (a fixed audio-feature
    # projection above its quantile) or independent coin flips. Independent
    # hardness is unlearnable by construction — no model can rank
    # uncertainty by a label the features don't carry — which capped
    # uncertainty-error correlation at ~0.5 (the tanh-squash side signal)
    # in round-1 results. Feature-dependent hardness makes the benchmark
    # actually test uncertainty learning.
    hard_from_features: bool = True
    # Shared cross-modal latent: when set, every modality's features are a
    # mixing of `latent_dim` per-sample latent factors plus independent
    # noise, so the inputs carry the within-modality correlations and
    # cross-modal coupling real multimodal data has (the premise fusion
    # models exist for). With the default (None) the features are i.i.d.
    # N(0,1) — which makes structure-breaking OOD probes (column shuffling,
    # modality misalignment) DISTRIBUTIONALLY VACUOUS: permuting i.i.d.
    # columns is a measure-preserving map, so no detector can or should fire
    # on them. experiments/ood_study.py uses latent_dim to make those probes
    # genuine distribution shifts.
    latent_dim: int | None = None
    # Fraction of each feature's variance carried by the latent (the rest is
    # independent noise). Marginals stay ~N(0,1) either way.
    latent_strength: float = 0.7
    seed: int = 42
    # Seed for the label-generating projections; defaults to `seed`. Give two
    # configs the same label_seed (and different seeds) to create distinct
    # datasets that share a label function — the cross-dataset-transfer
    # fixture.
    label_seed: int | None = None


def _make_split(cfg: SyntheticConfig, n: int, rng: np.random.Generator) -> dict:
    # Fixed random projections (drawn from a seed-derived generator so every
    # split shares the same label function).
    label_seed = cfg.label_seed if cfg.label_seed is not None else cfg.seed
    proj_rng = np.random.default_rng(label_seed + 7919)

    if cfg.latent_dim:
        # x_m = sqrt(s)·z A_m + sqrt(1-s)·eps with unit-norm mixing columns:
        # each feature keeps an ~N(0,1) marginal, but features within a
        # modality are correlated through z and modalities are coupled by
        # sharing it. The mixing matrices come from proj_rng so every split
        # (and any config sharing label_seed) lives on the same manifold.
        z = rng.standard_normal((n, cfg.latent_dim))
        s = float(np.clip(cfg.latent_strength, 0.0, 1.0))

        def mix(dim: int) -> np.ndarray:
            a = proj_rng.standard_normal((cfg.latent_dim, dim))
            a /= np.linalg.norm(a, axis=0, keepdims=True)
            return np.sqrt(s) * (z @ a) + np.sqrt(1.0 - s) * rng.standard_normal(
                (n, dim)
            )

        audio = mix(cfg.audio_dim).astype(np.float32)
        video = mix(cfg.video_dim).astype(np.float32)
        text = mix(cfg.text_dim).astype(np.float32)
    else:
        audio = rng.standard_normal((n, cfg.audio_dim)).astype(np.float32)
        video = rng.standard_normal((n, cfg.video_dim)).astype(np.float32)
        text = rng.standard_normal((n, cfg.text_dim)).astype(np.float32)
    w_a = proj_rng.standard_normal((cfg.audio_dim, cfg.emotion_dims)) / np.sqrt(
        cfg.audio_dim
    )
    w_v = proj_rng.standard_normal((cfg.video_dim, cfg.emotion_dims)) / np.sqrt(
        cfg.video_dim
    )
    w_t = proj_rng.standard_normal((cfg.text_dim, cfg.emotion_dims)) / np.sqrt(
        cfg.text_dim
    )
    w2 = proj_rng.standard_normal((cfg.emotion_dims, cfg.emotion_dims))

    base = audio @ w_a + video @ w_v + text @ w_t
    signal = np.tanh(base + 0.5 * np.tanh(base @ w2))

    if cfg.hard_from_features and cfg.hard_fraction > 0:
        # Hardness carried by the features: a fixed projection of the audio
        # features above its (1 - hard_fraction) quantile. The quantile is a
        # distributional constant (standard normal projection), so splits
        # share the same decision rule.
        w_h = proj_rng.standard_normal(cfg.audio_dim) / np.sqrt(cfg.audio_dim)
        hard_score = audio @ w_h
        from scipy.stats import norm

        thresh = norm.ppf(1.0 - cfg.hard_fraction)
        is_hard = hard_score > thresh
    else:
        is_hard = rng.random(n) < cfg.hard_fraction
    noise_scale = np.where(is_hard, cfg.hard_noise, cfg.label_noise)
    labels = np.tanh(
        signal + noise_scale[:, None] * rng.standard_normal((n, cfg.emotion_dims))
    ).astype(np.float32)

    return {
        "audio": audio,
        "video": video,
        "text": text,
        "labels": labels,
        "is_hard": is_hard.astype(np.float32),
    }


def make_synthetic_splits(cfg: SyntheticConfig | None = None) -> dict[str, dict]:
    """Returns {"train": {...}, "val": {...}, "test": {...}} numpy dicts."""
    cfg = cfg or SyntheticConfig()
    rng = np.random.default_rng(cfg.seed)
    return {
        "train": _make_split(cfg, cfg.n_train, rng),
        "val": _make_split(cfg, cfg.n_val, rng),
        "test": _make_split(cfg, cfg.n_test, rng),
    }
