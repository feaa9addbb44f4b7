"""Ring attention: exact sequence-parallel attention over a mesh axis.

Closes SURVEY §5.7's long-context row: full-resolution LiDAR clouds put the
cross-encoder's (B, S, S) attention beyond one chip's HBM once S grows past
~32k. The reference has no equivalent (its mem_eff_att.py chunks on ONE GPU;
multi-GPU is data-parallel only) — this is the TPU-native answer: shard the
sequence axis over a mesh axis, keep queries local, and rotate K/V shards
around the ICI ring with `lax.ppermute` while a flash-attention recurrence
(running max / denominator, Rabe & Staats) combines partial results. Exact
softmax attention — same math as models/mem_eff_attention.py — with peak
memory O(S/n) per chip and comm that pipelines with compute.

Layout contract (under `jax.shard_map`):
  q           (B, H, nq_local, D)   queries stay put
  k, v        (B, H, nk_local, D)   rotated around the ring
  key_valid   (B, nk_local) bool    rotated alongside K/V (budget masks)

Integration: `ring_self_attention` / `ring_cross_attention` wrap the core in
shard_map over a (data, seq) mesh; `RingMultiheadAttention` is a drop-in MHA
module (transformer.py attention_impl='ring') whose mesh is installed via
`set_ring_mesh` before the model is traced.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from ..models.common import torch_linear_init

_NEG_INF = -1e9

# Process-global mesh used by RingMultiheadAttention: a flax module cannot
# carry a Mesh through the config dict, so the train/eval step installs it
# before tracing (same lifecycle pattern as ops.kernel_points overrides).
_RING_MESH: Mesh | None = None
_SEQ_AXIS = 'seq'
_DATA_AXIS = 'data'


def set_ring_mesh(mesh: Mesh | None, seq_axis: str = 'seq',
                  data_axis: str = 'data') -> None:
    """Install (or clear, with None) the mesh ring attention modules use."""
    global _RING_MESH, _SEQ_AXIS, _DATA_AXIS
    _RING_MESH = mesh
    _SEQ_AXIS = seq_axis
    _DATA_AXIS = data_axis


def ring_attention_shard(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         key_valid: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Per-shard ring attention body — call under shard_map.

    Each of the `n` devices on `axis_name` holds a query shard and a K/V
    shard; `n` scan steps each combine one K/V shard into the flash carry
    then pass the shard to the next device (`ppermute`). Step t's permute
    overlaps step t+1's matmuls under XLA's async collectives.
    """
    n = jax.lax.axis_size(axis_name)
    scale = q.shape[-1] ** -0.5
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, _):
        acc, denom, m_run, k_cur, v_cur, mask_cur = carry
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask_cur[:, None, None, :], s, _NEG_INF)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(s - m_new[..., None])
        acc = acc * alpha[..., None] + jnp.einsum(
            'bhqk,bhkd->bhqd', p, v_cur.astype(p.dtype),
            preferred_element_type=jnp.float32)
        denom = denom * alpha + jnp.sum(p, axis=-1)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        mask_nxt = jax.lax.ppermute(mask_cur, axis_name, perm)
        return (acc, denom, m_new, k_nxt, v_nxt, mask_nxt), None

    # Derive the carry init from q so it carries q's varying-axes type —
    # shard_map rejects mixing replicated constants into a varying carry.
    acc0 = (q * 0.0).astype(jnp.float32)
    zero0 = acc0[..., 0]
    init = (acc0, zero0, zero0 + _NEG_INF, k, v, key_valid)
    (acc, denom, _, _, _, _), _ = jax.lax.scan(body, init, None, length=n)
    # An all-invalid key set (possible on a fully-padded batch row) leaves
    # denom ~ n*exp(-inf) = 0; clamp like mem_eff_attention does.
    out = acc / jnp.maximum(denom[..., None], 1e-20)
    return out.astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   key_valid: jnp.ndarray | None, mesh: Mesh,
                   seq_axis: str = 'seq',
                   data_axis: str | None = 'data') -> jnp.ndarray:
    """Full-array entry: shard the sequence axes over `seq_axis` and run the
    ring. Shapes as chunked_attention: q (B,H,Nq,D), k/v (B,H,Nk,D),
    key_valid (B,Nk). Nq and Nk must divide by mesh.shape[seq_axis]; the
    batch axis is additionally sharded over `data_axis` when given.
    """
    if key_valid is None:
        key_valid = jnp.ones((k.shape[0], k.shape[2]), bool)
    nseq = mesh.shape[seq_axis]
    if q.shape[2] % nseq or k.shape[2] % nseq:
        raise ValueError(f"sequence lengths {q.shape[2]}/{k.shape[2]} do not "
                         f"divide the '{seq_axis}' mesh axis ({nseq})")
    da = data_axis if (data_axis and data_axis in mesh.shape) else None
    qs = P(da, None, seq_axis, None)
    ms = P(da, seq_axis)
    fn = shard_fn = partial(ring_attention_shard, axis_name=seq_axis)
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=(qs, qs, qs, ms),
                       out_specs=qs)
    return fn(q, k, v, key_valid)


class RingMultiheadAttention(nn.Module):
    """Drop-in MHA (transformer.py attention_impl='ring'): replicated q/k/v
    projections, ring attention core over the installed mesh's seq axis."""
    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, q, k, v, key_valid=None):
        if _RING_MESH is None:
            raise RuntimeError(
                "attention_impl='ring' needs set_ring_mesh(mesh) before the "
                "model is traced (parallel/ring_attention.py)")
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
        if key_valid is None:
            key_valid = jnp.ones((b, nk), bool)
        out = ring_attention(qh, kh, vh, key_valid, _RING_MESH,
                             seq_axis=_SEQ_AXIS, data_axis=_DATA_AXIS)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, self.d_model)
        return nn.Dense(self.d_model, name='out_proj',
                        kernel_init=torch_linear_init(self.d_model),
                        bias_init=nn.initializers.zeros)(out)
