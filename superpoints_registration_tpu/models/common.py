"""Shared model utilities: initializers and masked normalization layers."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_linear_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def kpconv_weight_init(fan_in: int):
    """Kaiming-uniform (a=sqrt(5)) on the torch fan-in convention:
    bound = 1/sqrt(fan_in)."""
    return torch_linear_init(fan_in)


def masked_instance_norm(x: jnp.ndarray, mask: jnp.ndarray,
                         eps: float = 1e-5) -> jnp.ndarray:
    """Per-cloud, per-channel instance normalization over valid points.

    Matches the reference's BatchNormBlock, which despite its name applies
    InstanceNorm1d per cloud segment (kpconv_blocks.py:474-530): affine=False,
    biased variance, eps=1e-5. Invalid rows are zeroed.

    Args:
        x: (B, N, C); mask: (B, N) bool.
    """
    m = mask[..., None].astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    xm = x * m
    # Single-pass moments (E[x^2] - E[x]^2): one read of x instead of two —
    # these norms run over (B, N, C) at L0 scale ~10x per forward, and are
    # HBM-bound. Post-conv activations are O(1), so the cancellation is
    # benign in f32.
    mean = jnp.sum(xm, axis=1, keepdims=True) / cnt
    ex2 = jnp.sum(xm * xm, axis=1, keepdims=True) / cnt
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    return out * m


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.1) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=negative_slope)
