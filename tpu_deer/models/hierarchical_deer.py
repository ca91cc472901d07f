"""Standalone hierarchical DEER models.

Two end-to-end alternatives to the flagship CompleteDEERModel:

  * HierarchicalDEERFusionModel — parity with reference deer.py:269-350:
    three linear modality projections (84/256/768 → dim) → CrossModalAttention
    (text-as-query over audio/video with uncertainty gate) → AV concat fusion
    → trimodal concat fusion → MultiDimensionalDEER heads.

  * RawSequenceDEERModel — the raw-media path the reference sketches in
    encoders.py but never wires end-to-end: frame-level audio features
    [B, T, 84] (from the Pallas front-end) through the BiLSTM audio encoder,
    video frames through the conv encoder, token ids through the transformer
    text encoder, then the same uncertainty-aware fusion + DEER heads.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpu_deer.models.attention import CrossModalAttention
from tpu_deer.models.encoders import (
    AudioSequenceEncoder,
    TextSequenceEncoder,
    VideoSequenceEncoder,
)
from tpu_deer.models.fusion import HierarchicalFusion
from tpu_deer.models.heads import MultiDimensionalDEER
from tpu_deer.models.layers import MLP

Dtype = Any


class HierarchicalDEERFusionModel(nn.Module):
    """deer.py:269-350 equivalent: linear encoders → cross-modal attention →
    two-stage concat fusion → per-dim DEER heads."""

    audio_dim: int = 84
    video_dim: int = 256
    text_dim: int = 768
    hidden_dim: int = 256
    num_heads: int = 8
    dropout: float = 0.3
    dim_names: Sequence[str] = ("valence", "arousal", "dominance")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio, video, text, *, deterministic: bool = True):
        a = nn.Dense(self.hidden_dim, dtype=self.dtype, name="audio_proj")(audio)
        v = nn.Dense(self.hidden_dim, dtype=self.dtype, name="video_proj")(video)
        t = nn.Dense(self.hidden_dim, dtype=self.dtype, name="text_proj")(text)

        a_att, v_att, gate = CrossModalAttention(
            self.hidden_dim, self.num_heads, dropout=0.1, dtype=self.dtype,
            name="cross_modal",
        )(a, v, t, deterministic=deterministic)

        # Gate-weighted AV fusion, then trimodal concat fusion.
        av = MLP(
            [self.hidden_dim, self.hidden_dim],
            dropout=self.dropout,
            dtype=self.dtype,
            name="av_fusion",
        )(
            jnp.concatenate([gate[:, 0:1] * a_att, gate[:, 1:2] * v_att], axis=-1),
            deterministic=deterministic,
        )
        tri = MLP(
            [self.hidden_dim, self.hidden_dim],
            dropout=self.dropout,
            dtype=self.dtype,
            name="trimodal_fusion",
        )(jnp.concatenate([av, t], axis=-1), deterministic=deterministic)

        out = MultiDimensionalDEER(
            self.hidden_dim, self.hidden_dim, self.dim_names, self.dropout,
            self.dtype, name="deer",
        )(tri, deterministic=deterministic)
        out["modality_gate"] = gate
        return out


class RawSequenceDEERModel(nn.Module):
    """Raw-media DEER: sequence encoders → fusion → DEER heads.

    Inputs:
      audio_frames [B, Ta, 84]  (from ops.audio_frontend.audio_frame_features)
      video_frames [B, Tv, H, W, C]
      token_ids    [B, Tt] int32  (+ optional text_mask [B, Tt])
    """

    encoder_dim: int = 256
    fusion_dim: int = 512
    vocab_size: int = 30522
    num_heads: int = 8
    dropout: float = 0.3
    dim_names: Sequence[str] = ("valence", "arousal", "dominance")
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        audio_frames,
        video_frames,
        token_ids,
        text_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ):
        a, a_attn = AudioSequenceEncoder(
            self.encoder_dim, lstm_hidden=self.encoder_dim // 2, dtype=self.dtype,
            name="audio_encoder",
        )(audio_frames, deterministic=deterministic)
        v, v_attn = VideoSequenceEncoder(
            self.encoder_dim, conv_features=(16, 32, 64), dtype=self.dtype,
            name="video_encoder",
        )(video_frames, deterministic=deterministic)
        t, t_attn = TextSequenceEncoder(
            self.vocab_size, self.encoder_dim, model_dim=self.encoder_dim,
            num_layers=2, num_heads=self.num_heads, dtype=self.dtype,
            name="text_encoder",
        )(token_ids, text_mask, deterministic=deterministic)

        fused = HierarchicalFusion(
            self.encoder_dim, self.fusion_dim, self.dropout, self.dtype,
            name="fusion",
        )(a, v, t, deterministic=deterministic)

        out = MultiDimensionalDEER(
            self.fusion_dim, self.encoder_dim, self.dim_names, self.dropout,
            self.dtype, name="deer",
        )(fused, deterministic=deterministic)
        out["temporal_attention"] = {
            "audio": a_attn, "video": v_attn, "text": t_attn,
        }
        return out
