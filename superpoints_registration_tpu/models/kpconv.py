"""Kernel Point Convolution backbone, mask-based and fixed-shape.

Re-design of the reference KPConv stack (src/models/backbone_kpconv/
kpconv_blocks.py:175-787, kpconv.py:22-168) for TPU:

  * operates on (B, N, C) mask-padded per-cloud stacks instead of packed
    ragged tensors — every op is a batched gather/matmul XLA can tile on
    the MXU;
  * shadow neighbors (index == N) gather a zero-feature / far-away row,
    matching the reference convention (kpconv_blocks.py:309, 388);
  * kernel-point distances are computed via the |a-b|^2 expansion, so the
    (B, N, K, Kp) influence tensor comes from one MXU matmul rather than a
    materialized (B, N, K, Kp, 3) difference tensor;
  * "batch norm" is the reference's per-cloud instance norm, implemented
    with masks (common.masked_instance_norm).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.kernel_points import load_kernel_points
# NOTE: this import must stay at module level. Importing the pallas gather
# module lazily (inside a traced __call__) executes pallas/jax.experimental
# imports mid-trace, which poisons the emitted program in this TPU runtime:
# every 2nd+ dispatch of the executable fails with "INVALID_ARGUMENT: TPU
# backend error". Root-caused in round 2 (see docs/pallas_fault_repro.py).
from ..ops.pallas.gather import gather_coords_feats_batch, gather_feats_batch
from .common import kpconv_weight_init, leaky_relu, masked_instance_norm, torch_linear_init

_SHADOW_DIST = 1e6


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray, pad_value: float = 0.0) -> jnp.ndarray:
    """Gather rows of x (B, N, C) by idx (B, Q, K) with shadow index == N.

    Returns (B, Q, K, C); shadow entries filled with `pad_value`.

    Implemented as ONE flat global-index `jnp.take` over the (B*N, C) table
    with a single appended shadow row: measured 23.6 ms vs 86 ms for the
    batched take_along_axis formulation at L0 scale on v5e (bf16, D=38) —
    XLA lowers the flat form to a dramatically better gather.
    """
    b, n, c = x.shape
    _, q, k = idx.shape
    tab = jnp.concatenate(
        [x.reshape(b * n, c), jnp.full((1, c), pad_value, x.dtype)], axis=0)
    offs = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    gidx = jnp.where(idx >= n, b * n, idx + offs)
    # mode='promise_in_bounds': gidx is in-bounds by construction (shadow
    # remaps to the appended row). The default mode='fill' lowers to
    # gather + select_n, and that select forces a col-major layout on the
    # gathered table plus a full-tensor copy (~500 MB at L0 budgets).
    return tab.at[gidx.reshape(-1)].get(
        mode='promise_in_bounds').reshape(b, q, k, c)


def max_pool(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Max over gathered neighbor features; shadow rows contribute 0
    (kpconv_blocks.py:127-143 pads with zeros, so outputs are floored at 0)."""
    gathered = gather_rows(x, idx, pad_value=0.0)
    return jnp.max(gathered, axis=2)


def closest_pool(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Pool from the closest (first) neighbor (kpconv_blocks.py:112-124)."""
    return gather_rows(x, idx[:, :, :1], pad_value=0.0)[:, :, 0]




def _fused_table_gather(s_pts, feat_list, idx, bf16: bool):
    """One flat XLA row-gather of [coords | feats...] for a stack of clouds.

    Returns (neighbors (B,Q,K,3) f32, feats (B,Q,K,sum C) — bf16 when
    `bf16`); shadow rows get coords == _SHADOW_DIST and zero features. bf16
    stores coords as hi/lo bf16 halves (~2^-16 precision) and KEEPS the
    feature payload bf16: upcasting (B,Q,K,C) to f32 costs as much HBM
    traffic as the gather itself, and every consumer (influence product,
    aggregation einsum) is happy with bf16 operands + f32 accumulation.

    The gather is a single flat `jnp.take` over the (B*N+1, D) table with
    globalized indices (see gather_rows). Measured on v5e: ~3.1-3.5 ns/row
    for bf16 tables up to 128 columns, 4x worse past 128 columns and for
    f32 tables — keep tables bf16 and under 128 columns (callers split
    wider payloads into separate gathers).
    """
    b, n, _ = s_pts.shape
    cs = [f.shape[-1] for f in feat_list]
    c_tot = sum(cs)
    if bf16:
        hi = s_pts.astype(jnp.bfloat16)
        lo = (s_pts - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        cols = [hi, lo] + [f.astype(jnp.bfloat16) for f in feat_list]
        coord_cols = 6
        dt = jnp.bfloat16
    else:
        cols = [s_pts] + list(feat_list)
        coord_cols = 3
        dt = s_pts.dtype
    table = jnp.concatenate(cols, axis=-1).reshape(b * n, coord_cols + c_tot)
    shadow = jnp.concatenate(
        [jnp.full((1, coord_cols), _SHADOW_DIST, dt),
         jnp.zeros((1, c_tot), dt)], axis=-1)
    if bf16:
        # hi/lo halves must RECOMBINE to _SHADOW_DIST: hi = bf16(S), lo = S-hi.
        s_hi = jnp.full((), _SHADOW_DIST, jnp.bfloat16)
        s_lo = (jnp.float32(_SHADOW_DIST) - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        shadow = jnp.concatenate(
            [jnp.full((1, 3), s_hi, dt), jnp.full((1, 3), s_lo, dt),
             jnp.zeros((1, c_tot), dt)], axis=-1)
    table = jnp.concatenate([table, shadow], axis=0)
    offs = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    gidx = jnp.where(idx >= n, b * n, idx + offs)
    # promise_in_bounds: see gather_rows — avoids the fill-mode select_n
    # that forces a col-major layout + full-tensor copy of the output.
    g = table.at[gidx.reshape(-1)].get(mode='promise_in_bounds')
    # Split coords/feats on the FLAT (R, D) gather output and reshape each
    # piece separately: slicing the 4-D (B,Q,K,D) form forces XLA to
    # materialize full-tensor layout copies (~3.4 GB/fwd measured at 3DMatch
    # budgets) because the gather's natural output layout disagrees with the
    # slice consumers'; flat column slices are layout-neutral.
    if bf16:
        nb = g[:, :3].astype(jnp.float32) + g[:, 3:6].astype(jnp.float32)
        feats = g[:, 6:]                     # stays bf16
    else:
        nb = g[:, :3]
        feats = g[:, 3:]
    nb = nb.reshape(*idx.shape, 3)
    feats = feats.reshape(*idx.shape, c_tot)
    return nb, feats


class KPConvOp(nn.Module):
    """The kernel point convolution op (kpconv_blocks.py:175-414, rigid only).

    Shapes: q_pts (B, Nq, 3), s_pts (B, Ns, 3), neighb (B, Nq, K) with
    shadow == Ns, x (B, Ns, C_in) -> (B, Nq, C_out).
    """
    num_kernel_points: int
    in_channels: int
    out_channels: int
    kp_extent: float
    radius: float
    fixed_kernel_points: str = 'center'
    kp_influence: str = 'linear'
    aggregation_mode: str = 'sum'
    kp_seed: int = 0
    deformable: bool = False
    modulated: bool = False
    gather_impl: str = 'auto'   # 'auto' | 'pallas' | 'xla'
    gather_block: int = 1024
    gather_window_blocks: int = 2
    gather_dtype: str = 'float32'  # 'float32' | 'bfloat16'

    def _use_pallas(self) -> bool:
        # 'auto' resolves to the fused XLA gather. History: the Pallas
        # windowed gather tripped a repeated-dispatch TPU runtime fault in
        # the round-3/4 environment image (docs/pallas_fault_repro.py); on
        # the round-5 image the fault no longer reproduces and the kernel
        # runs correctly — but measured END-TO-END it is SLOWER than the
        # XLA flat take (17.17 vs 30.44 pairs/s, BENCH_GATHER=pallas,
        # docs/PERF.md round-5 table), so it stays opt-in on performance
        # grounds, not correctness.
        return self.gather_impl == 'pallas'

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x, pregathered=None):
        kp = jnp.asarray(load_kernel_points(
            self.radius, self.num_kernel_points, dimension=3,
            fixed=self.fixed_kernel_points, seed=self.kp_seed))  # (Kp, 3)
        weights = self.param(
            'weights', kpconv_weight_init(self.in_channels * self.out_channels),
            (self.num_kernel_points, self.in_channels, self.out_channels))

        offsets = None
        modulations = None
        if self.deformable:
            # Offset-generating rigid KPConv (kpconv_blocks.py:275-298): its
            # output parameterizes per-query kernel-point offsets (and
            # optional modulations), scaled by the extent.
            kp_dim = self.num_kernel_points * 3
            off_dim = kp_dim + (self.num_kernel_points if self.modulated else 0)
            off = KPConvOp(self.num_kernel_points, self.in_channels, off_dim,
                           self.kp_extent, self.radius,
                           fixed_kernel_points=self.fixed_kernel_points,
                           kp_influence=self.kp_influence,
                           aggregation_mode=self.aggregation_mode,
                           kp_seed=self.kp_seed + 1000,
                           gather_impl=self.gather_impl,
                           gather_block=self.gather_block,
                           gather_window_blocks=self.gather_window_blocks,
                           gather_dtype=self.gather_dtype,
                           name='offset_conv')(q_pts, s_pts, neighb_inds, x)
            off = off + self.param('offset_bias', nn.initializers.zeros,
                                   (off_dim,))
            offsets = off[..., :kp_dim].reshape(
                *off.shape[:-1], self.num_kernel_points, 3) * self.kp_extent
            if self.modulated:
                modulations = 2.0 * jax.nn.sigmoid(off[..., kp_dim:])

        if pregathered is not None:
            # Caller already gathered (e.g. fused with the strided shortcut).
            neighbors, neighb_x = pregathered
        elif self._use_pallas():
            # Fused windowed MXU gather (ops/pallas/gather.py): coords +
            # features in one pass; ~2% of far neighbors may be dropped
            # (-> shadow), analogous to the reference's neighbor cap.
            neighbors, neighb_x, _ = gather_coords_feats_batch(
                s_pts, x, neighb_inds, shadow_coord=_SHADOW_DIST,
                block=self.gather_block,
                window_blocks=self.gather_window_blocks)
        else:
            # ONE combined gather for coords + features (XLA gather cost is
            # per-row, nearly independent of width; fusing halves it).
            # gather_dtype=bfloat16 shaves a further ~23% (measured 121->93 ms
            # at L0 scale); coords keep ~2^-16 precision via a hi/lo split.
            neighbors, neighb_x = _fused_table_gather(
                s_pts, [x], neighb_inds,
                bf16=self.gather_dtype == 'bfloat16')
        if neighb_x is None:
            neighb_x = gather_rows(x, neighb_inds, pad_value=0.0)  # (B,Nq,K,C)

        # ---- Layout-canonical compute (flat G = B*Nq batch) -------------
        # Everything below is either elementwise or a batched matmul in the
        # canonical (batch, rows, cols) row-major form the TPU dot wants.
        # The influence tensor is built DIRECTLY as (G, Kp, K) — K minor —
        # so the aggregation dot's LHS needs no transpose, and the gathered
        # features (G, K, C) keep the flat gather's natural row-major
        # layout. Formulations that let XLA assign layouts around 4-D
        # einsums ('bnkp,bnkc->bnpc') were measured to insert ~3 GB/fwd of
        # pure layout copies at 3DMatch budgets (see docs/PERF.md).
        b, nq, k_n = neighb_inds.shape
        g_ = b * nq
        kp_n = self.num_kernel_points
        rel = (neighbors - q_pts[:, :, None, :]).reshape(g_, k_n, 3)
        neighb_x = neighb_x.reshape(g_, k_n, -1)                   # (G,K,C)

        # The d=3 contraction is written as three broadcast FMAs, NOT a dot:
        # a dot_general here forces layout round-trips (~0.8 GB/fwd measured)
        # between its row-major output and the G-minor layout XLA prefers for
        # the elementwise influence chain on (G,Kp,K) tensors (Kp=15/K=25
        # pad badly in the (8,128) tile). FMAs fuse into the chain instead.
        # In bf16 gather mode the whole chain runs in bf16 — rel is small
        # (<= 2*radius) so bf16 is ~0.4% relative noise on distances, inside
        # the existing ~1% tolerance of the influence weights — halving the
        # chain's materialized bytes and removing a separate f32->bf16
        # convert/relayout pass at the aggregation dot.
        rel_sq = jnp.sum(rel * rel, axis=-1)                       # (G,K)
        chain_dt = neighb_x.dtype
        rel_c = rel.astype(chain_dt)
        rel_sq_c = rel_sq.astype(chain_dt)
        if offsets is not None:
            dkp = (kp + offsets).reshape(g_, kp_n, 3)              # (G,Kp,3)
            kp_sq = jnp.sum(dkp * dkp, axis=-1)[:, :, None].astype(chain_dt)
            dkp_c = dkp.astype(chain_dt)
            cross = sum(dkp_c[:, :, None, d] * rel_c[:, None, :, d]
                        for d in range(3))                         # (G,Kp,K)
        else:
            kp_sq = jnp.sum(kp * kp, axis=-1)[None, :, None].astype(chain_dt)
            kp_c = kp.astype(chain_dt)
            cross = sum(kp_c[None, :, None, d] * rel_c[:, None, :, d]
                        for d in range(3))                         # (G,Kp,K)
        sq_distances = jnp.maximum(
            rel_sq_c[:, None, :] - 2.0 * cross + kp_sq,
            jnp.zeros((), chain_dt))                               # (G,Kp,K)

        if self.kp_influence == 'constant':
            all_weights = jnp.ones_like(sq_distances)
        elif self.kp_influence == 'linear':
            all_weights = jnp.clip(1.0 - jnp.sqrt(sq_distances) / self.kp_extent,
                                   0.0, None)
        elif self.kp_influence == 'gaussian':
            sigma = self.kp_extent * 0.3
            all_weights = jnp.exp(-sq_distances / (2 * sigma ** 2 + 1e-9))
        else:
            raise ValueError(self.kp_influence)

        if self.aggregation_mode == 'closest':
            closest = jnp.argmin(sq_distances, axis=1)             # (G,K)
            onehot = jax.nn.one_hot(closest, kp_n, axis=1,
                                    dtype=all_weights.dtype)       # (G,Kp,K)
            all_weights = all_weights * onehot
        elif self.aggregation_mode != 'sum':
            raise ValueError(self.aggregation_mode)

        # bf16 gather mode: keep the (G,Kp,K)/(G,K,C) operands bf16 —
        # influence weights carry ~1% clip/sqrt noise anyway and the dot
        # accumulates in f32; materializing these tensors in f32 doubles the
        # dominant HBM traffic of the block.
        if neighb_x.dtype == jnp.bfloat16:
            all_weights = all_weights.astype(jnp.bfloat16)

        # (G,Kp,K) @ (G,K,C) -> (G,Kp,C); then contract the kernel dim.
        weighted = jnp.einsum('gpk,gkc->gpc', all_weights, neighb_x,
                              preferred_element_type=jnp.float32)
        if modulations is not None:
            weighted = weighted * modulations.reshape(g_, kp_n, 1)
        out = jnp.einsum('gpc,pcd->gd', weighted, weights,
                         preferred_element_type=jnp.float32)

        # Normalize by the number of contributing neighbors: the reference
        # counts rows whose feature-sum > 0 (kpconv_blocks.py:409-412), which
        # excludes shadow rows (zero features). Deformable convs prune
        # neighbors out of range of EVERY deformed kernel point before that
        # count (kpconv_blocks.py:331-356, in_range = any(sq < KP_extent^2));
        # the pruned rows have zero influence either way, but they must not
        # inflate the normalizer.
        contrib_mask = jnp.sum(neighb_x.astype(jnp.float32), axis=-1) > 0.0
        if offsets is not None:
            in_range = jnp.any(
                sq_distances < jnp.asarray(self.kp_extent ** 2, chain_dt),
                axis=1)                                            # (G,K)
            contrib_mask = contrib_mask & in_range
        contrib = jnp.sum(contrib_mask, axis=-1)                   # (G,)
        contrib = jnp.maximum(contrib, 1).astype(out.dtype)
        return (out / contrib[:, None]).reshape(b, nq, self.out_channels)


class UnaryBlock(nn.Module):
    """Linear (no bias) + per-cloud instance norm + LeakyReLU(0.1)
    (kpconv_blocks.py:533-567)."""
    out_dim: int
    use_norm: bool = True
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, mask):
        fan_in = x.shape[-1]
        x = nn.Dense(self.out_dim, use_bias=False,
                     kernel_init=torch_linear_init(fan_in))(x)
        if self.use_norm:
            x = masked_instance_norm(x, mask)
        else:
            x = x + self.param('bias', nn.initializers.zeros, (self.out_dim,))
        if not self.no_relu:
            x = leaky_relu(x)
        return x


class SimpleBlock(nn.Module):
    """KPConv -> norm -> LeakyReLU, outputting out_dim // 2 channels
    (kpconv_blocks.py:590-646)."""
    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    config: Any
    kp_seed: int = 0

    @nn.compact
    def __call__(self, x, meta):
        cfg = self.config
        current_extent = self.radius * cfg.KP_extent / cfg.conv_radius
        strided = 'strided' in self.block_name
        l = self.layer_ind
        q_level = l + 1 if strided else l
        q_pts = meta['points'][q_level]
        s_pts = meta['points'][l]
        inds = meta['pools'][l] if strided else meta['neighbors'][l]
        out_mask = meta['masks'][q_level]

        x = KPConvOp(cfg.num_kernel_points, self.in_dim, self.out_dim // 2,
                     current_extent, self.radius,
                     fixed_kernel_points=cfg.fixed_kernel_points,
                     kp_influence=cfg.KP_influence,
                     aggregation_mode=cfg.aggregation_mode,
                     kp_seed=self.kp_seed,
                     deformable='deform' in self.block_name,
                     modulated=bool(cfg.get('modulated', False)),
                     gather_impl=cfg.get('gather_impl', 'auto'),
                     gather_block=cfg.get('gather_block', 1024),
                     gather_window_blocks=cfg.get('gather_window_blocks', 2),
                     gather_dtype=cfg.get('gather_dtype', 'float32'))(q_pts, s_pts, inds, x)
        x = masked_instance_norm(x, out_mask) if cfg.use_batch_norm else x
        return leaky_relu(x)


class ResnetBottleneckBlock(nn.Module):
    """unary1 -> KPConv -> unary2 + (max-pooled) shortcut
    (kpconv_blocks.py:649-741)."""
    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    config: Any
    kp_seed: int = 0

    @nn.compact
    def __call__(self, x, meta):
        cfg = self.config
        current_extent = self.radius * cfg.KP_extent / cfg.conv_radius
        strided = 'strided' in self.block_name
        l = self.layer_ind
        q_level = l + 1 if strided else l
        q_pts = meta['points'][q_level]
        s_pts = meta['points'][l]
        inds = meta['pools'][l] if strided else meta['neighbors'][l]
        in_mask = meta['masks'][l]
        out_mask = meta['masks'][q_level]

        mid = self.out_dim // 4
        h = UnaryBlock(mid, use_norm=cfg.use_batch_norm)(x, in_mask) \
            if self.in_dim != mid else x

        kpconv = KPConvOp(cfg.num_kernel_points, mid, mid, current_extent,
                          self.radius,
                          fixed_kernel_points=cfg.fixed_kernel_points,
                          kp_influence=cfg.KP_influence,
                          aggregation_mode=cfg.aggregation_mode,
                          kp_seed=self.kp_seed,
                          deformable='deform' in self.block_name,
                          modulated=bool(cfg.get('modulated', False)),
                          gather_impl=cfg.get('gather_impl', 'auto'),
                          gather_block=cfg.get('gather_block', 1024),
                          gather_window_blocks=cfg.get('gather_window_blocks', 2),
                          gather_dtype=cfg.get('gather_dtype', 'float32'))

        if strided and cfg.get('gather_impl', 'auto') != 'pallas':
            bf16 = cfg.get('gather_dtype', 'float32') == 'bfloat16'
            if bf16 and 3 + 3 + mid + x.shape[-1] > 128:
                # XLA gather cost jumps ~4x past 128 table columns (measured
                # 3.5 -> 13.7 ns/row on v5e): gather [coords|h] and the
                # shortcut features separately instead of one wide fused row.
                pre_nb, h_g = _fused_table_gather(s_pts, [h], inds, bf16=True)
                x_g = gather_rows(x.astype(jnp.bfloat16), inds, pad_value=0.0)
            else:
                # Fuse the KPConv feature gather and the max-pool shortcut
                # gather: both read the SAME pool indices.
                pre_nb, pre_feats = _fused_table_gather(
                    s_pts, [h, x], inds, bf16=bf16)
                h_g = pre_feats[..., :mid]
                x_g = pre_feats[..., mid:]
            h = kpconv(q_pts, s_pts, inds, h, pregathered=(pre_nb, h_g))
            shortcut = jnp.max(x_g, axis=2).astype(jnp.float32)
        else:
            h = kpconv(q_pts, s_pts, inds, h)
            if strided:
                gathered = gather_feats_batch(
                    x, inds, block=cfg.get('gather_block', 1024),
                    window_blocks=cfg.get('gather_window_blocks', 2))
                shortcut = jnp.max(gathered, axis=2)
            else:
                shortcut = x
        h = masked_instance_norm(h, out_mask) if cfg.use_batch_norm else h
        h = leaky_relu(h)

        h = UnaryBlock(self.out_dim, use_norm=cfg.use_batch_norm,
                       no_relu=True)(h, out_mask)
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, use_norm=cfg.use_batch_norm,
                                  no_relu=True)(shortcut, out_mask)
        return leaky_relu(h + shortcut)



class UnaryBlock2(nn.Module):
    """Plain 2-layer MLP block (kpconv_blocks.py:569-587)."""
    out_dim: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        h = nn.Dense(in_dim, kernel_init=torch_linear_init(in_dim),
                     bias_init=torch_linear_init(in_dim))(x)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, kernel_init=torch_linear_init(in_dim),
                        bias_init=torch_linear_init(in_dim))(h)


def global_average(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked global average per cloud: (B, N, D), (B, N) -> (B, D)
    (kpconv_blocks.py:146-165 semantics on the padded layout)."""
    m = mask[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class GlobalAverageBlock(nn.Module):
    """Global average over the coarsest level (kpconv_blocks.py:744-754)."""

    def __call__(self, x, meta):
        return global_average(x, meta['masks'][-1])


class NearestUpsampleBlock(nn.Module):
    """Upsample by gathering the closest coarse point (kpconv_blocks.py:757-772)."""
    layer_ind: int

    def __call__(self, x, meta):
        return closest_pool(x, meta['upsamples'][self.layer_ind - 1])


def encoder_plan(cfg) -> tuple:
    """Walk cfg.architecture and produce the static block plan + skip dims,
    mirroring KPFEncoder.__init__ (kpconv.py:22-79).

    Returns (blocks, skip_dims, skip_idx): blocks is a list of dicts with
    keys {name, in_dim, out_dim, radius, layer_ind}.
    """
    blocks = []
    skip_dims, skip_idx = [], []
    r = cfg.first_subsampling_dl * cfg.conv_radius
    in_dim, out_dim = cfg.in_feats_dim, cfg.first_feats_dim
    layer = 0
    for block_i, block in enumerate(cfg.architecture):
        if any(t in block for t in ('pool', 'strided', 'upsample', 'global')):
            skip_idx.append(block_i)
            skip_dims.append(in_dim)
        if 'upsample' in block:
            break
        blocks.append(dict(name=block, in_dim=in_dim, out_dim=out_dim,
                           radius=r, layer_ind=layer))
        in_dim = out_dim // 2 if 'simple' in block else out_dim
        if 'pool' in block or 'strided' in block:
            layer += 1
            r *= 2
            out_dim *= 2
    else:
        skip_idx.append(len(cfg.architecture) - 1)
        skip_dims.append(in_dim)
    return blocks, skip_dims, skip_idx


class KPFEncoder(nn.Module):
    """The KPConv encoder: stack of simple/resnetb blocks over the pyramid
    (kpconv.py:22-92). Returns (final_feats, skip_feats)."""
    config: Any

    def setup(self):
        plan, skip_dims, skip_idx = encoder_plan(self.config)
        self.skip_dims = skip_dims
        self.skip_idx = tuple(skip_idx)
        mods = []
        for i, b in enumerate(plan):
            cls = SimpleBlock if 'simple' in b['name'] else ResnetBottleneckBlock
            if not ('simple' in b['name'] or 'resnetb' in b['name']):
                raise NotImplementedError(f"block {b['name']}")
            mods.append(cls(block_name=b['name'], in_dim=b['in_dim'],
                            out_dim=b['out_dim'], radius=b['radius'],
                            layer_ind=b['layer_ind'], config=self.config,
                            kp_seed=i))
        self.blocks = mods

    def __call__(self, x, meta):
        skips = []
        for i, block in enumerate(self.blocks):
            if i in self.skip_idx:
                skips.append(x)
            x = block(x, meta)
        return x, skips


class KPFDecoder(nn.Module):
    """Nearest-upsample decoder with skip concat (kpconv.py:95-168).

    Unused by RegTR (as in the reference) but provided for backbone parity.
    Architecture entries after the first 'nearest_upsample' are consumed;
    each upsample halves the channel count and concatenates the skip.
    """
    config: Any
    skip_dims: Sequence[int]

    @nn.compact
    def __call__(self, x, skips, meta):
        cfg = self.config
        # Find decoder start.
        start = next((i for i, b in enumerate(cfg.architecture)
                      if 'upsample' in b), None)
        if start is None:
            return x
        level = sum(1 for b in cfg.architecture[:start]
                    if 'pool' in b or 'strided' in b)
        skips = list(skips)
        out_dim = x.shape[-1]
        for block_i, block in enumerate(cfg.architecture[start:]):
            if block_i > 0 and 'upsample' in cfg.architecture[start + block_i - 1]:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = UnaryBlock(out_dim, use_norm=cfg.use_batch_norm)(
                    x, meta['masks'][level])
            if 'upsample' in block:
                x = NearestUpsampleBlock(level)(x, meta)
                level -= 1
                out_dim = out_dim // 2
        return x
