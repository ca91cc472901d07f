"""Modality encoders.

Two tiers, matching the reference's actual dataflow:

1. Feature-level encoders (`ModalityEncoder`) — the path the flagship
   CompleteDEERModel uses: pre-extracted feature vectors (84-d audio, 256-d
   video, 768-d text) → residual MLP → 256-d. Parity with
   complete_project.py:77-118 (EnhancedModalityEncoder).

2. Raw-sequence encoders — parity with src/models/encoders.py:
   * AudioSequenceEncoder — encoders.py:50-389: frame features [B, T, F] →
     bidirectional LSTM (lax.scan over flax cells) → tanh-MLP attention
     pooling → MLP+LayerNorm → output_dim. The reference's per-sample
     librosa feature loop is replaced by the Pallas front-end in
     tpu_deer.ops.audio_frontend; this module consumes its framed output.
   * VideoSequenceEncoder — encoders.py:392-550: frames [B, T, H, W, C] →
     conv blocks → global average pool → temporal conv → attention pooling.
     GroupNorm replaces the reference's BatchNorm: it is state-free (no
     running statistics to carry through jit/pmap) and equally effective at
     these widths — a deliberate TPU-first substitution.
   * TextSequenceEncoder — encoders.py:553-761 fallback path: trainable
     embedding + sinusoidal positions + transformer blocks + token-level
     attention pooling. (BERT features are produced offline in the data
     pipeline, matching the reference's actual dataflow at
     preprocessing.py:702-729.)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_deer.models.attention import MultiHeadAttention
from tpu_deer.models.layers import MLP, ResidualBlock

Dtype = Any


class ModalityEncoder(nn.Module):
    """Feature-vector encoder: input proj → N residual blocks → output proj.

    Parity with complete_project.py:77-118.
    """

    output_dim: int = 256
    num_layers: int = 3
    dropout: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.output_dim, dtype=self.dtype, name="input_proj")(x)
        h = nn.relu(h)
        h = nn.LayerNorm(dtype=self.dtype, name="input_norm")(h)
        for i in range(self.num_layers):
            h = ResidualBlock(
                self.output_dim, self.dropout, self.dtype, name=f"block_{i}"
            )(h, deterministic=deterministic)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="output_proj")(h)


class AttentionPooling(nn.Module):
    """tanh-MLP attention pooling over time (encoders.py:93-98, 462-467).

    scores = Dense_1(tanh(Dense_h(x))); weights = softmax_T(scores);
    pooled = sum_T weights * x. Supports a [B, T] validity mask.
    """

    hidden_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        scores = nn.Dense(1, dtype=self.dtype, name="score")(
            nn.tanh(nn.Dense(self.hidden_dim, dtype=self.dtype, name="proj")(x))
        )[..., 0]
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
        weights = nn.softmax(scores, axis=-1)
        return jnp.einsum("bt,btd->bd", weights, x), weights


class BiLSTM(nn.Module):
    """Bidirectional LSTM via lax.scan over flax OptimizedLSTMCell.

    Sequential by nature; acceptable at utterance scale (T ≤ a few hundred).
    Stacked `num_layers` deep; outputs [B, T, 2*hidden].
    """

    hidden_dim: int
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for layer in range(self.num_layers):
            fwd_cell = nn.OptimizedLSTMCell(
                self.hidden_dim, dtype=self.dtype, name=f"fwd_{layer}"
            )
            bwd_cell = nn.OptimizedLSTMCell(
                self.hidden_dim, dtype=self.dtype, name=f"bwd_{layer}"
            )
            fwd = nn.RNN(fwd_cell, name=f"rnn_fwd_{layer}")(x)
            bwd = nn.RNN(bwd_cell, reverse=True, keep_order=True, name=f"rnn_bwd_{layer}")(x)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x


class AudioSequenceEncoder(nn.Module):
    """Frame-level audio features [B, T, F] → utterance embedding [B, output_dim].

    Mirrors EnhancedAudioEncoder (encoders.py:50-389): BiLSTM over frame
    features, attention pooling, MLP + LayerNorm head. Feature extraction
    itself lives in tpu_deer.ops.audio_frontend (Pallas), not here.
    """

    output_dim: int = 512
    lstm_hidden: int = 256
    lstm_layers: int = 2
    dropout: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        h = BiLSTM(self.lstm_hidden, self.lstm_layers, self.dtype, name="bilstm")(x)
        pooled, attn = AttentionPooling(self.lstm_hidden, self.dtype, name="pool")(
            h, mask
        )
        out = MLP(
            [self.output_dim, self.output_dim],
            dropout=self.dropout,
            dtype=self.dtype,
            name="head",
        )(pooled, deterministic=deterministic)
        out = nn.LayerNorm(dtype=self.dtype, name="head_norm")(out)
        return out, attn


class ConvBlock(nn.Module):
    """Conv → GroupNorm → ReLU → strided conv downsample."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.features, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype
        )(x)
        x = nn.relu(x)
        return x


class VideoSequenceEncoder(nn.Module):
    """Video frames [B, T, H, W, C] → utterance embedding [B, output_dim].

    Mirrors EnhancedVideoEncoder (encoders.py:392-550): per-frame spatial CNN
    (vmapped over time so XLA batches the convs as one [B*T, ...] program) →
    global average pool → temporal 1-D convs → attention pooling.
    """

    output_dim: int = 512
    conv_features: tuple = (32, 64, 128, 256)
    dropout: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        b, t = x.shape[0], x.shape[1]
        frames = x.reshape((b * t,) + x.shape[2:])
        for i, f in enumerate(self.conv_features):
            frames = ConvBlock(f, self.dtype, name=f"conv_{i}")(frames)
        spatial = frames.mean(axis=(1, 2))  # global average pool → [B*T, C]
        seq = spatial.reshape(b, t, -1)
        seq = nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(seq)
        # Temporal modelling: two 1-D convs over time.
        seq = nn.relu(
            nn.Conv(self.output_dim, (3,), padding="SAME", dtype=self.dtype,
                    name="tconv1")(seq)
        )
        seq = nn.relu(
            nn.Conv(self.output_dim, (3,), padding="SAME", dtype=self.dtype,
                    name="tconv2")(seq)
        )
        pooled, attn = AttentionPooling(self.output_dim, self.dtype, name="pool")(
            seq, mask
        )
        out = nn.Dropout(self.dropout)(pooled, deterministic=deterministic)
        out = nn.LayerNorm(dtype=self.dtype, name="norm")(out)
        return out, attn


def create_encoders_from_config(config) -> dict[str, nn.Module]:
    """Factory building the three feature-level encoders from a model config
    (parity with reference create_encoders_from_config, encoders.py:936-956)."""
    return {
        name: ModalityEncoder(
            output_dim=config.encoder_dim,
            num_layers=config.encoder_layers,
            dropout=config.dropout,
            dtype=config.dtype,
        )
        for name in ("audio", "video", "text")
    }


def get_encoder_output_dims(config) -> dict[str, int]:
    """Parity with reference get_encoder_output_dims (encoders.py:958-966)."""
    return {name: config.encoder_dim for name in ("audio", "video", "text")}


class UnifiedSequenceEncoder(nn.Module):
    """Unified wrapper over the three raw-sequence encoders.

    Parity with reference ModalityEncoder (encoders.py:764-852): one module
    exposing all requested modalities behind a single call, each producing a
    `output_dim` embedding. Missing modalities are simply not computed
    (static — jit-friendly), instead of the reference's runtime try/except
    zero-substitution (encoders.py:820-850) which hid failures silently.
    """

    output_dim: int = 512
    modalities: tuple = ("audio", "video", "text")
    vocab_size: int = 30522
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        audio_frames=None,
        video_frames=None,
        token_ids=None,
        text_mask=None,
        *,
        deterministic: bool = True,
    ):
        out: dict = {}
        if "audio" in self.modalities and audio_frames is not None:
            out["audio"], out["audio_attention"] = AudioSequenceEncoder(
                self.output_dim, dtype=self.dtype, name="audio"
            )(audio_frames, deterministic=deterministic)
        if "video" in self.modalities and video_frames is not None:
            out["video"], out["video_attention"] = VideoSequenceEncoder(
                self.output_dim, dtype=self.dtype, name="video"
            )(video_frames, deterministic=deterministic)
        if "text" in self.modalities and token_ids is not None:
            out["text"], out["text_attention"] = TextSequenceEncoder(
                self.vocab_size, self.output_dim, dtype=self.dtype, name="text"
            )(token_ids, text_mask, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    """Pre-norm transformer encoder block (use_flash → Pallas attention)."""

    dim: int
    num_heads: int = 8
    mlp_ratio: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    use_flash: Any = "auto"  # bool | "auto" (measured-crossover dispatch)

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        attn_mask = None
        if mask is not None:
            attn_mask = mask[:, None, None, :]  # [B, 1, 1, T]
        h = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, self.dtype,
            use_flash=self.use_flash,
        )(h, h, h, mask=attn_mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = MLP(
            [self.dim * self.mlp_ratio, self.dim],
            dropout=self.dropout,
            dtype=self.dtype,
        )(h, deterministic=deterministic)
        return x + nn.Dropout(self.dropout)(h, deterministic=deterministic)


def sinusoidal_positions(t: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """Standard sinusoidal positional encoding [T, dim]."""
    pos = jnp.arange(t, dtype=jnp.float32)[:, None]
    i = jnp.arange(dim // 2, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, 2.0 * i / dim)
    enc = jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)
    return enc.astype(dtype)


class TextSequenceEncoder(nn.Module):
    """Token ids [B, T] → utterance embedding [B, output_dim].

    Trainable-embedding transformer with token-level attention pooling —
    parity with the reference's non-BERT fallback (encoders.py:586-594,
    719-746). BERT-768 features come from the offline data pipeline instead.
    """

    vocab_size: int = 30522
    output_dim: int = 512
    model_dim: int = 256
    num_layers: int = 4
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    # bool | "auto": auto-dispatch flash vs SDPA at the measured crossover
    # (ops.flash_attention.resolve_use_flash) — long transcripts get the
    # O(T·D) Pallas kernel, short ones the fused XLA SDPA.
    use_flash: Any = "auto"

    @nn.compact
    def __call__(
        self,
        token_ids,
        mask=None,
        *,
        deterministic: bool = True,
        return_sequence: bool = False,
        mlm_logits: bool = False,
    ):
        embed = nn.Embed(
            self.vocab_size, self.model_dim, dtype=self.dtype, name="embed"
        )
        x = embed(token_ids)
        x = x + sinusoidal_positions(token_ids.shape[1], self.model_dim, x.dtype)[
            None
        ]
        bool_mask = mask.astype(bool) if mask is not None else None
        for i in range(self.num_layers):
            x = TransformerBlock(
                self.model_dim, self.num_heads, dropout=self.dropout,
                dtype=self.dtype, use_flash=self.use_flash, name=f"block_{i}",
            )(x, bool_mask, deterministic=deterministic)
        pooled, attn = AttentionPooling(self.model_dim, self.dtype, name="pool")(
            x, bool_mask
        )
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="out_proj")(pooled)
        out = nn.LayerNorm(dtype=self.dtype, name="norm")(out)
        if mlm_logits:
            # Tied masked-token logits (hidden @ embeddingᵀ) for the MLM
            # pretraining objective (train.text_pretrain). Tying is what
            # pulls same-context words into nearby embedding rows — the
            # property the downstream featurizer relies on.
            return out, attn, x, embed.attend(x)
        if return_sequence:
            # Token-level hidden states — same params, extra output.
            return out, attn, x
        return out, attn
