"""Appearance-embedding (ReID) head (components C2/C11).

Produces an L2-normalized embedding per detection for the tracker's cosine
association cost (BASELINE north-star: "appearance-embedding cosine costs").
Input is RoIAligned pyramid features for the final detections — the head is
fused into the same jitted detector forward, so embeddings are free-ish:
one small conv stack + matmul on features already in HBM.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from waymo_2d_tracking_tpu.models.quant import make_conv


class ReIDHead(nn.Module):
    """(R, P, P, C) pooled features -> (R, E) L2-normalized embeddings."""

    embed_dim: int = 128
    channels: int = 256
    dtype: Any = jnp.bfloat16
    quant: str = "off"

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = pooled.astype(self.dtype)
        for i in range(2):
            x = make_conv(self.quant, features=self.channels,
                          kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
                          dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))                       # global average pool
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
