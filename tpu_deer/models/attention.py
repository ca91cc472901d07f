"""Attention modules: MHA, uncertainty estimation, uncertainty-aware fusion attention.

Behavioral parity with reference `src/models/complete_project.py`:
  * MultiHeadAttention        — complete_project.py:121-183 (from-scratch SDPA)
  * UncertaintyEstimator      — complete_project.py:186-212 (MLP → sigmoid)
  * UncertaintyAwareAttention — complete_project.py:215-303
and `src/models/deer.py`:
  * CrossModalAttention       — deer.py:353-425

TPU notes: the modality path uses sequence length 1, so attention reduces to
fused dense ops that XLA folds into a handful of MXU matmuls — no flash
attention needed here. The MHA module is written general (einsum over
[B, T, D]) so the raw-sequence encoders reuse it at T > 1.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_deer.models.layers import MLP

Dtype = Any


class MultiHeadAttention(nn.Module):
    """Scaled-dot-product multi-head attention over [B, T, D] with optional mask.

    use_flash=True routes through the blocked Pallas flash-attention kernel
    (tpu_deer.ops.flash_attention) — O(T·D) memory for long sequences. The
    flash path supports key-padding masks ([B, 1, 1, Tk] or [B, Tk]) and
    skips attention-prob dropout (standard for flash kernels).

    use_flash="auto" (the default) picks the kernel from the measured
    crossover vs key length and phase (ops.flash_attention.resolve_use_flash):
    XLA SDPA below it, flash at/above — so seq-len-1 modality attention and
    short transcripts keep the fused-SDPA path while long raw sequences get
    O(T·D) memory for free, with no config knob to forget.
    """

    feature_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    use_flash: Any = "auto"

    @nn.compact
    def __call__(self, query, key, value, mask=None, *, deterministic: bool = True):
        assert self.feature_dim % self.num_heads == 0
        head_dim = self.feature_dim // self.num_heads
        b, tq, _ = query.shape
        tk = key.shape[1]

        def split_heads(x, t):
            return x.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split_heads(nn.Dense(self.feature_dim, dtype=self.dtype, name="q_proj")(query), tq)
        k = split_heads(nn.Dense(self.feature_dim, dtype=self.dtype, name="k_proj")(key), tk)
        v = split_heads(nn.Dense(self.feature_dim, dtype=self.dtype, name="v_proj")(value), tk)

        from tpu_deer.ops.flash_attention import resolve_use_flash

        if resolve_use_flash(self.use_flash, tk, training=not deterministic):
            from tpu_deer.ops.flash_attention import flash_attention

            kv_mask = None
            if mask is not None:
                kv_mask = mask.reshape(b, -1, tk)[:, -1, :].astype(jnp.float32)
            out = flash_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), kv_mask,
                interpret=jax.default_backend() not in ("tpu",),
            ).astype(q.dtype)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(head_dim, dtype=q.dtype)
            )
            if mask is not None:
                scores = jnp.where(mask, scores, jnp.finfo(scores.dtype).min)
            attn = nn.softmax(scores, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)

        out = out.transpose(0, 2, 1, 3).reshape(b, tq, self.feature_dim)
        return nn.Dense(self.feature_dim, dtype=self.dtype, name="out_proj")(out)


class UncertaintyEstimator(nn.Module):
    """Per-modality scalar uncertainty in [0, 1] (complete_project.py:186-212)."""

    feature_dim: int
    dropout: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.feature_dim // 2, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.feature_dim // 4, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(1, dtype=self.dtype)(h)
        return nn.sigmoid(h)


class UncertaintyAwareAttention(nn.Module):
    """Uncertainty-aware cross-modal attention (complete_project.py:215-303).

    Per modality m with features f_m [B, D]:
      u_m    = UncertaintyEstimator(f_m)                     (shared estimator)
      self_m = SelfAttn(f_m)  (shared self-attention weights)
      cross_m = CrossAttn(text → f_m)  (text as query; shared weights)
      w      = softmax(WeightNet(cat[self_a, self_v, self_t, u_a, u_v, u_t]))
      out_m  = w_m * self_m + (1 - u_m) * cross_m
    """

    feature_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio, video, text, *, deterministic: bool = True):
        self_attn = MultiHeadAttention(
            self.feature_dim, self.num_heads, self.dropout, self.dtype,
            name="self_attention",
        )
        cross_attn = MultiHeadAttention(
            self.feature_dim, self.num_heads, self.dropout, self.dtype,
            name="cross_attention",
        )
        unc = UncertaintyEstimator(
            self.feature_dim, dtype=self.dtype, name="uncertainty_estimator"
        )

        a1, v1, t1 = (x[:, None, :] for x in (audio, video, text))

        u_a = unc(audio, deterministic=deterministic)
        u_v = unc(video, deterministic=deterministic)
        u_t = unc(text, deterministic=deterministic)

        a_self = self_attn(a1, a1, a1, deterministic=deterministic)[:, 0]
        v_self = self_attn(v1, v1, v1, deterministic=deterministic)[:, 0]
        t_self = self_attn(t1, t1, t1, deterministic=deterministic)[:, 0]

        a_cross = cross_attn(t1, a1, a1, deterministic=deterministic)[:, 0]
        v_cross = cross_attn(t1, v1, v1, deterministic=deterministic)[:, 0]
        t_cross = cross_attn(t1, t1, t1, deterministic=deterministic)[:, 0]

        weight_in = jnp.concatenate([a_self, v_self, t_self, u_a, u_v, u_t], axis=1)
        weights = MLP(
            [self.feature_dim, 3],
            dropout=self.dropout,
            final_activation="softmax",
            dtype=self.dtype,
            name="weight_network",
        )(weight_in, deterministic=deterministic)

        return {
            "audio": weights[:, 0:1] * a_self + (1.0 - u_a) * a_cross,
            "video": weights[:, 1:2] * v_self + (1.0 - u_v) * v_cross,
            "text": weights[:, 2:3] * t_self + (1.0 - u_t) * t_cross,
            "attention_weights": weights,
            "modality_uncertainties": jnp.concatenate([u_a, u_v, u_t], axis=1),
        }


class CrossModalAttention(nn.Module):
    """Text-as-query attention over audio/video + uncertainty gate (deer.py:353-425).

    Returns attended (audio, video) plus softmax gate weights [B, 2] over the
    two non-text modalities.
    """

    feature_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio, video, text, *, deterministic: bool = True):
        attn = MultiHeadAttention(
            self.feature_dim, self.num_heads, self.dropout, self.dtype, name="attn"
        )
        a1, v1, t1 = (x[:, None, :] for x in (audio, video, text))
        a_att = attn(t1, a1, a1, deterministic=deterministic)[:, 0]
        v_att = attn(t1, v1, v1, deterministic=deterministic)[:, 0]

        gate_in = jnp.concatenate([a_att, v_att, text], axis=-1)
        gate = MLP(
            [self.feature_dim, 2],
            dropout=self.dropout,
            final_activation="softmax",
            dtype=self.dtype,
            name="uncertainty_gate",
        )(gate_in, deterministic=deterministic)
        return a_att, v_att, gate
