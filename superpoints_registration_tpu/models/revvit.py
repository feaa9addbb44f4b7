"""Reversible transformer blocks with O(1) activation memory.

Functional parity target: src/models/revvit/revvit_model.py:14-241 — the
reference's RevViT block library (custom autograd recomputing activations in
the backward pass; the qk_revvit model files are absent upstream, only the
block library remains, so this mirrors that scope).

TPU-native design: a `jax.custom_vjp` over the whole reversible stack. The
forward keeps only the final (x1, x2) pair; the backward *inverts* each block
analytically (y2 = x2 + F(x1) ; y1 = x1 + G(y2)) to rebuild inputs, then
re-plays the block under jax.vjp for gradients — activation memory is O(1) in
depth, compute is ~2x forward (same trade as the reference).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import torch_linear_init


class AttentionSubBlock(nn.Module):
    """F = LayerNorm + MHA (revvit_model.py:197-217)."""
    dim: int
    nhead: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        d_head = self.dim // self.nhead
        xavier = nn.initializers.xavier_uniform()
        q = nn.Dense(self.dim, kernel_init=xavier)(h)
        k = nn.Dense(self.dim, kernel_init=xavier)(h)
        v = nn.Dense(self.dim, kernel_init=xavier)(h)
        b, n, _ = x.shape
        qh = q.reshape(b, n, self.nhead, d_head)
        kh = k.reshape(b, n, self.nhead, d_head)
        vh = v.reshape(b, n, self.nhead, d_head)
        attn = jax.nn.softmax(
            jnp.einsum('bqhd,bkhd->bhqk', qh, kh) / (d_head ** 0.5), axis=-1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, vh).reshape(b, n, self.dim)
        return nn.Dense(self.dim, kernel_init=torch_linear_init(self.dim))(out)


class MLPSubBlock(nn.Module):
    """G = LayerNorm + MLP (revvit_model.py:219-241)."""
    dim: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.mlp_ratio,
                     kernel_init=torch_linear_init(self.dim))(h)
        h = nn.gelu(h)
        return nn.Dense(self.dim, kernel_init=torch_linear_init(
            self.dim * self.mlp_ratio))(h)


class ReversibleBlock(nn.Module):
    """y1 = x1 + F(x2); y2 = x2 + G(y1) (revvit_model.py:72-194)."""
    dim: int
    nhead: int

    def setup(self):
        self.f = AttentionSubBlock(dim=self.dim, nhead=self.nhead)
        self.g = MLPSubBlock(dim=self.dim)

    def __call__(self, x1, x2):
        y1 = x1 + self.f(x2)
        y2 = x2 + self.g(y1)
        return y1, y2

    def invert(self, y1, y2):
        x2 = y2 - self.g(y1)
        x1 = y1 - self.f(x2)
        return x1, x2


class ReversibleEncoder(nn.Module):
    """Stack of reversible blocks executed under a custom VJP that
    reconstructs activations by inversion (RevBackProp,
    revvit_model.py:14-69)."""
    dim: int
    nhead: int
    depth: int

    def setup(self):
        self.blocks = [ReversibleBlock(dim=self.dim, nhead=self.nhead)
                       for _ in range(self.depth)]

    def _fwd_block(self, i, x1, x2):
        return jax.lax.switch(
            i, [lambda a, b, blk=blk: blk(a, b) for blk in self.blocks], x1, x2)

    def __call__(self, x):
        """x: (B, N, 2*dim) — split into the two residual streams."""
        x1, x2 = jnp.split(x, 2, axis=-1)

        if self.is_initializing():
            for blk in self.blocks:
                x1, x2 = blk(x1, x2)
            return jnp.concatenate([x1, x2], axis=-1)

        # Bind each block's apply as a pure function of params.
        block_fns = [
            (lambda p, a, b, blk=blk: blk.apply({'params': p}, a, b),
             lambda p, a, b, blk=blk: blk.apply({'params': p}, a, b,
                                                method=blk.invert))
            for blk in self.blocks]
        params = [jax.tree_util.tree_map(
            lambda x: x, self.blocks[i].variables['params'])
            for i in range(self.depth)]

        y1, y2 = _reversible_scan(tuple(block_fns), params, x1, x2)
        return jnp.concatenate([y1, y2], axis=-1)


def _reversible_scan(block_fns, params, x1, x2):
    """Run blocks forward without storing intermediates; rebuild by inversion
    in the backward pass."""

    @jax.custom_vjp
    def run(params, x1, x2):
        for (fwd, _), p in zip(block_fns, params):
            x1, x2 = fwd(p, x1, x2)
        return x1, x2

    def run_fwd(params, x1, x2):
        out = run(params, x1, x2)
        return out, (params, out)

    def run_bwd(res, grads):
        params, (y1, y2) = res
        g1, g2 = grads
        param_grads = []
        for (fwd, inv), p in zip(reversed(block_fns), reversed(params)):
            x1, x2 = inv(p, y1, y2)
            x1 = jax.lax.stop_gradient(x1)
            x2 = jax.lax.stop_gradient(x2)
            _, vjp_fn = jax.vjp(lambda pp, a, b: fwd(pp, a, b), p, x1, x2)
            dp, g1, g2 = vjp_fn((g1, g2))
            param_grads.append(dp)
            y1, y2 = x1, x2
        return (list(reversed(param_grads)), g1, g2)

    run.defvjp(run_fwd, run_bwd)
    return run(params, x1, x2)
