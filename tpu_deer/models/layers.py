"""Shared building blocks (flax.linen), dtype-aware for bf16 TPU compute."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ResidualBlock(nn.Module):
    """x + LayerNorm(Dropout(ReLU(Dense(x)))) — reference complete_project.py:61-74.

    Residual MLP block; LayerNorm sits at the end of the branch (post-norm on
    the branch, not the sum), matching the reference ordering.
    """

    dim: int
    dropout: float = 0.3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.dim, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        return x + h


class MLP(nn.Module):
    """Dense stack with ReLU + dropout between layers; optional final activation."""

    features: Sequence[int]
    dropout: float = 0.0
    final_activation: str | None = None  # None | "relu" | "sigmoid" | "softmax"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            is_last = i == len(self.features) - 1
            if not is_last:
                x = nn.relu(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.final_activation == "relu":
            x = nn.relu(x)
        elif self.final_activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.final_activation == "softmax":
            x = nn.softmax(x, axis=-1)
        return x
