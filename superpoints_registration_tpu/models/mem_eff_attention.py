"""Memory-efficient (chunked) attention with logsumexp renormalization.

Functional parity target: src/models/transformer/mem_eff_att.py:54-227 — the
Rabe & Staats chunked attention the reference keeps as a standalone module
(not wired into the active model). Here: pure-JAX blockwise attention with a
running max/denominator (flash-attention recurrence) over key chunks under
`lax.scan`, with `jax.checkpoint` on the chunk body for O(sqrt(N)) memory, and
an MHA wrapper (`ChunkedMultiheadAttention`) that is a drop-in for
transformer.MultiheadAttention via cfg.attention_impl = 'chunked'.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import torch_linear_init

_NEG_INF = -1e9


def chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      key_valid: jnp.ndarray | None = None,
                      q_chunk: int = 1024, k_chunk: int = 1024,
                      checkpoint_chunks: bool = True) -> jnp.ndarray:
    """Blockwise softmax(q k^T / sqrt(d)) v without materializing (Nq, Nk).

    Shapes: q (B, H, Nq, D), k/v (B, H, Nk, D), key_valid (B, Nk) bool.
    Nq % q_chunk == 0 and Nk % k_chunk == 0 (pad beforehand; padded keys must
    be masked via key_valid).
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    assert nq % q_chunk == 0 and nk % k_chunk == 0
    scale = d ** -0.5

    if key_valid is None:
        key_valid = jnp.ones((b, nk), bool)

    kc = k.reshape(b, h, nk // k_chunk, k_chunk, d)
    vc = v.reshape(b, h, nk // k_chunk, k_chunk, d)
    maskc = key_valid.reshape(b, 1, nk // k_chunk, k_chunk)

    def process_q_chunk(q_blk):
        """q_blk: (B, H, q_chunk, D) -> (B, H, q_chunk, D)."""

        def body(carry, inputs):
            acc, denom, m_run = carry
            k_blk, v_blk, mask_blk = inputs      # (B,H,kc,D), (B,H,kc,D), (B,1,kc)
            s = jnp.einsum('bhqd,bhkd->bhqk', q_blk, k_blk) * scale
            s = jnp.where(mask_blk[:, :, None, :], s, _NEG_INF)
            m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
            alpha = jnp.exp(m_run - m_new)
            p = jnp.exp(s - m_new[..., None])
            acc = acc * alpha[..., None] + jnp.einsum('bhqk,bhkd->bhqd', p, v_blk)
            denom = denom * alpha + jnp.sum(p, axis=-1)
            return (acc, denom, m_new), None

        body_fn = jax.checkpoint(body) if checkpoint_chunks else body
        init = (jnp.zeros_like(q_blk),
                jnp.zeros(q_blk.shape[:-1], q_blk.dtype),
                jnp.full(q_blk.shape[:-1], _NEG_INF, q_blk.dtype))
        (acc, denom, _), _ = jax.lax.scan(
            body_fn, init,
            (jnp.moveaxis(kc, 2, 0), jnp.moveaxis(vc, 2, 0),
             jnp.moveaxis(maskc, 2, 0)))
        return acc / jnp.maximum(denom[..., None], 1e-20)

    qc = jnp.moveaxis(q.reshape(b, h, nq // q_chunk, q_chunk, d), 2, 0)
    out = jax.lax.map(process_q_chunk, qc)
    return jnp.moveaxis(out, 0, 2).reshape(b, h, nq, d)


class ChunkedMultiheadAttention(nn.Module):
    """Drop-in MHA using chunked attention (for very large superpoint counts)."""
    d_model: int
    nhead: int
    q_chunk: int = 1024
    k_chunk: int = 1024

    @nn.compact
    def __call__(self, q, k, v, key_valid=None):
        d_head = self.d_model // self.nhead
        xavier = nn.initializers.xavier_uniform()

        def proj(x, name):
            return nn.Dense(self.d_model, name=name, kernel_init=xavier,
                            bias_init=nn.initializers.zeros)(x)

        b, nq, _ = q.shape
        nk = k.shape[1]
        qh = proj(q, 'q_proj').reshape(b, nq, self.nhead, d_head).transpose(0, 2, 1, 3)
        kh = proj(k, 'k_proj').reshape(b, nk, self.nhead, d_head).transpose(0, 2, 1, 3)
        vh = proj(v, 'v_proj').reshape(b, nk, self.nhead, d_head).transpose(0, 2, 1, 3)

        qc = min(self.q_chunk, nq)
        kc = min(self.k_chunk, nk)
        # Pad to chunk multiples; padded keys masked out.
        pad_q = (-nq) % qc
        pad_k = (-nk) % kc
        if key_valid is None:
            key_valid = jnp.ones((b, nk), bool)
        if pad_q:
            qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        if pad_k:
            kh = jnp.pad(kh, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
            vh = jnp.pad(vh, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
            key_valid = jnp.pad(key_valid, ((0, 0), (0, pad_k)))

        out = chunked_attention(qh, kh, vh, key_valid, qc, kc)
        out = out[:, :, :nq].transpose(0, 2, 1, 3).reshape(b, nq, self.d_model)
        return nn.Dense(self.d_model, name='out_proj',
                        kernel_init=torch_linear_init(self.d_model),
                        bias_init=nn.initializers.zeros)(out)
