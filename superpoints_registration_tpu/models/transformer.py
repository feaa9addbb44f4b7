"""Source<->target cross-attention transformer encoder.

Re-design of the reference's DETR-derived cross encoder
(src/models/transformer/transformers.py:18-275) for TPU: batch-first
(B, N, D) layout, additive -inf masking from validity masks, and shared
self/cross attention weights per layer exactly as the reference (the same
`self_attn` module is applied to src and tgt; same for cross attention).

Attention runs as plain XLA einsum-softmax-einsum: at superpoint counts
(hundreds to a few thousand) this fits VMEM-tiled fusion well; a Pallas
flash-attention kernel can be swapped in for very large clouds.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from .common import torch_linear_init

_NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    """Standard MHA; `key_valid` is True where the key position is real.

    compute_dtype=bfloat16 runs projections and attention matmuls in bf16
    (params and softmax stay f32) — standard TPU mixed precision.
    """
    d_model: int
    nhead: int
    compute_dtype: str = 'float32'

    @nn.compact
    def __call__(self, q, k, v, key_valid: Optional[jnp.ndarray] = None):
        d_head = self.d_model // self.nhead
        assert d_head * self.nhead == self.d_model
        xavier = nn.initializers.xavier_uniform()
        cdt = jnp.bfloat16 if self.compute_dtype == 'bfloat16' else jnp.float32

        def proj(x, name):
            return nn.Dense(self.d_model, name=name, kernel_init=xavier,
                            bias_init=nn.initializers.zeros, dtype=cdt)(x)

        qh = proj(q, 'q_proj').reshape(*q.shape[:-1], self.nhead, d_head)
        kh = proj(k, 'k_proj').reshape(*k.shape[:-1], self.nhead, d_head)
        vh = proj(v, 'v_proj').reshape(*v.shape[:-1], self.nhead, d_head)

        # In bf16 mode the (B, H, S, S) score matrix — by far the layer's
        # largest tensor — is stored bf16 too; softmax runs its reductions
        # in f32 (fused, nothing f32 materializes). Logit resolution at
        # |scores| <= ~30 is ~0.12, well under softmax noise that matters;
        # docs/ABLATION.md quantifies the recall effect of f32 vs bf16.
        scores = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                            preferred_element_type=cdt) / (d_head ** 0.5)
        if key_valid is not None:
            scores = jnp.where(key_valid[:, None, None, :], scores,
                               jnp.asarray(_NEG_INF, cdt))
        mx = jnp.max(scores.astype(jnp.float32), axis=-1, keepdims=True)
        ex = jnp.exp(scores.astype(jnp.float32) - mx)
        attn = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(cdt)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, vh,
                         preferred_element_type=jnp.float32)
        out = out.reshape(*q.shape[:-1], self.d_model).astype(jnp.float32)
        return nn.Dense(self.d_model, name='out_proj',
                        kernel_init=torch_linear_init(self.d_model),
                        bias_init=nn.initializers.zeros)(out)


class TransformerCrossEncoderLayer(nn.Module):
    """One layer: self-attn(src), self-attn(tgt) [shared weights], cross-attn
    src<-tgt and tgt<-src [shared weights], FFN [shared weights]
    (transformers.py:84-259)."""
    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    pre_norm: bool = True
    sa_val_has_pos_emb: bool = True
    ca_val_has_pos_emb: bool = True
    activation: str = 'relu'
    cross_only: bool = False     # transformer_only_ce.py variant (no self-attn)
    attention_impl: str = 'dense'  # 'dense' | 'chunked' | 'ring'
    compute_dtype: str = 'float32'

    def _mha(self):
        if self.attention_impl == 'chunked':
            from .mem_eff_attention import ChunkedMultiheadAttention
            return ChunkedMultiheadAttention(self.d_model, self.nhead)
        if self.attention_impl == 'ring':
            # Sequence-parallel exact attention over a mesh axis; requires
            # parallel.ring_attention.set_ring_mesh before tracing.
            from ..parallel.ring_attention import RingMultiheadAttention
            return RingMultiheadAttention(self.d_model, self.nhead)
        return MultiheadAttention(self.d_model, self.nhead,
                                  compute_dtype=self.compute_dtype)

    def setup(self):
        self.self_attn = None if self.cross_only else self._mha()
        self.cross_attn = self._mha()
        cdt = (jnp.bfloat16 if self.compute_dtype == 'bfloat16'
               else jnp.float32)
        self.linear1 = nn.Dense(self.dim_feedforward,
                                kernel_init=torch_linear_init(self.d_model),
                                bias_init=torch_linear_init(self.d_model),
                                dtype=cdt)
        self.linear2 = nn.Dense(self.d_model,
                                kernel_init=torch_linear_init(self.dim_feedforward),
                                bias_init=torch_linear_init(self.dim_feedforward),
                                dtype=cdt)
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.norm3 = nn.LayerNorm()

    def _act(self, x):
        return nn.relu(x) if self.activation == 'relu' else nn.gelu(x)

    def _ffn(self, x):
        return self.linear2(self._act(self.linear1(x))).astype(jnp.float32)

    def __call__(self, src, tgt, src_valid, tgt_valid, src_pos=None, tgt_pos=None):
        add_pos = lambda x, p: x if p is None else x + p

        if self.pre_norm:
            # Self attention (pre-norm), shared module across src/tgt.
            if not self.cross_only:
                src2 = self.norm1(src)
                src2p = add_pos(src2, src_pos)
                src = src + self.self_attn(
                    src2p, src2p, src2p if self.sa_val_has_pos_emb else src2,
                    src_valid)
                tgt2 = self.norm1(tgt)
                tgt2p = add_pos(tgt2, tgt_pos)
                tgt = tgt + self.self_attn(
                    tgt2p, tgt2p, tgt2p if self.sa_val_has_pos_emb else tgt2,
                    tgt_valid)

            # Cross attention.
            src2, tgt2 = self.norm2(src), self.norm2(tgt)
            src2p, tgt2p = add_pos(src2, src_pos), add_pos(tgt2, tgt_pos)
            src = src + self.cross_attn(
                src2p, tgt2p, tgt2p if self.ca_val_has_pos_emb else tgt2, tgt_valid)
            tgt = tgt + self.cross_attn(
                tgt2p, src2p, src2p if self.ca_val_has_pos_emb else src2, src_valid)

            # FFN.
            src = src + self._ffn(self.norm3(src))
            tgt = tgt + self._ffn(self.norm3(tgt))
        else:
            if not self.cross_only:
                srcp = add_pos(src, src_pos)
                src = self.norm1(src + self.self_attn(
                    srcp, srcp, srcp if self.sa_val_has_pos_emb else src,
                    src_valid))
                tgtp = add_pos(tgt, tgt_pos)
                tgt = self.norm1(tgt + self.self_attn(
                    tgtp, tgtp, tgtp if self.sa_val_has_pos_emb else tgt,
                    tgt_valid))

            srcp, tgtp = add_pos(src, src_pos), add_pos(tgt, tgt_pos)
            src_new = self.norm2(src + self.cross_attn(
                srcp, tgtp, tgtp if self.ca_val_has_pos_emb else tgt, tgt_valid))
            tgt_new = self.norm2(tgt + self.cross_attn(
                tgtp, srcp, srcp if self.ca_val_has_pos_emb else src, src_valid))
            src, tgt = src_new, tgt_new

            src = self.norm3(src + self._ffn(src))
            tgt = self.norm3(tgt + self._ffn(tgt))

        return src, tgt


class TransformerCrossEncoder(nn.Module):
    """Stack of cross-encoder layers (transformers.py:18-59).

    Returns (L_out, B, N, D) stacks: L_out == num_layers when
    return_intermediate else 1, mirroring the reference's leading axis.
    """
    d_model: int
    nhead: int
    num_layers: int
    dim_feedforward: int = 1024
    pre_norm: bool = True
    sa_val_has_pos_emb: bool = True
    ca_val_has_pos_emb: bool = True
    activation: str = 'relu'
    return_intermediate: bool = False
    cross_only: bool = False
    attention_impl: str = 'dense'
    grad_checkpoint: bool = False
    compute_dtype: str = 'float32'

    @nn.compact
    def __call__(self, src, tgt, src_valid, tgt_valid, src_pos=None, tgt_pos=None):
        final_norm = nn.LayerNorm() if self.pre_norm else None
        layer_cls = TransformerCrossEncoderLayer
        if self.grad_checkpoint:
            layer_cls = nn.remat(TransformerCrossEncoderLayer)
        src_inter, tgt_inter = [], []
        for _ in range(self.num_layers):
            src, tgt = layer_cls(
                self.d_model, self.nhead, self.dim_feedforward, self.pre_norm,
                self.sa_val_has_pos_emb, self.ca_val_has_pos_emb,
                self.activation, self.cross_only, self.attention_impl,
                self.compute_dtype)(
                src, tgt, src_valid, tgt_valid, src_pos, tgt_pos)
            if self.return_intermediate:
                src_inter.append(final_norm(src) if final_norm else src)
                tgt_inter.append(final_norm(tgt) if final_norm else tgt)

        if final_norm is not None:
            src, tgt = final_norm(src), final_norm(tgt)
            if self.return_intermediate:
                src_inter[-1], tgt_inter[-1] = src, tgt

        if self.return_intermediate:
            return jnp.stack(src_inter), jnp.stack(tgt_inter)
        return src[None], tgt[None]
