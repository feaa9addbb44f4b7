"""Positional embeddings over continuous 3D coordinates.

Parity targets: src/models/transformer/position_embedding.py:7-72.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from .common import torch_linear_init


class PositionEmbeddingCoordsSine(nn.Module):
    """Sine/cos embedding generalized to continuous D-dim coordinates.

    d_model is split across input dims; remainder zero-padded
    (position_embedding.py:17-50).
    """
    n_dim: int = 3
    d_model: int = 256
    temperature: float = 10000.0
    scale: float = 1.0

    @nn.compact
    def __call__(self, xyz: jnp.ndarray) -> jnp.ndarray:
        assert xyz.shape[-1] == self.n_dim
        num_pos_feats = self.d_model // self.n_dim // 2 * 2
        padding = self.d_model - num_pos_feats * self.n_dim

        dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
        dim_t = self.temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

        xyz = xyz * (self.scale * 2.0 * math.pi)
        pos_divided = xyz[..., None] / dim_t          # (..., n_dim, num_pos_feats)
        pos_sin = jnp.sin(pos_divided[..., 0::2])
        pos_cos = jnp.cos(pos_divided[..., 1::2])
        pos_emb = jnp.stack([pos_sin, pos_cos], axis=-1)
        pos_emb = pos_emb.reshape(*xyz.shape[:-1], -1)
        if padding:
            pos_emb = jnp.pad(pos_emb, [(0, 0)] * (pos_emb.ndim - 1) + [(0, padding)])
        return pos_emb


class PositionEmbeddingLearned(nn.Module):
    """5-layer MLP position embedding (position_embedding.py:53-72)."""
    n_dim: int = 3
    d_model: int = 256

    @nn.compact
    def __call__(self, xyz: jnp.ndarray) -> jnp.ndarray:
        dims = [32, 64, 128, 256]
        h = xyz
        for d in dims:
            h = nn.Dense(d, kernel_init=torch_linear_init(h.shape[-1]),
                         bias_init=torch_linear_init(h.shape[-1]))(h)
            h = nn.relu(h)
        return nn.Dense(self.d_model, kernel_init=torch_linear_init(h.shape[-1]),
                        bias_init=torch_linear_init(h.shape[-1]))(h)
