"""Fixed-shape KPConv pyramid preprocessing, fully on-device under one jit.

Replaces the reference Preprocessor / PreprocessorGPU
(src/models/backbone_kpconv/kpconv.py:295-549): walking the architecture
string list, it computes per-level subsampled points, conv-neighbor indices,
pooling indices and (optionally) upsample indices.

TPU-first differences from the reference:
  * Everything operates on (B, N_l, ...) mask-padded stacks with STATIC
    per-level budgets — no ragged packed tensors, no host round trips. The
    whole pyramid build jits and fuses with the model forward.
  * Deterministic: voxel ordering is lexicographic, neighbor lists are
    distance-sorted (the reference GPU path is explicitly nondeterministic,
    kpconv.py:421-424).
  * `upsamples` are only computed when requested — RegTR never uses them
    (the KPFDecoder is unused, kpconv.py:95-168).

The B axis stacks all clouds in the batch: for pair registration the caller
stacks [src_0..src_{P-1}, tgt_0..tgt_{P-1}] so B = 2P, mirroring the
reference's `src_xyz + tgt_xyz` concatenation (qk_regtr_full.py:152).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from .neighbors import (radius_knn_batch, radius_knn_blocked_batch,
                        radius_knn_lane_batch)
from .subsample import voxel_subsample_batch


@dataclasses.dataclass(frozen=True)
class PyramidSpec:
    """Static description of the preprocessing pyramid, derived from config.

    Mirrors the reference's architecture walk (kpconv.py:462-539): one entry
    per pyramid level; level l has conv neighbors at `radii[l]` and (except
    the last level) a strided pool to level l+1 computed at the same radius,
    with the next level's points from a voxel grid of size `voxel_sizes[l+1]`.
    """
    num_levels: int
    voxel_sizes: tuple            # len L; [0] is the input voxel size (informational)
    radii: tuple                  # len L; conv radius at each level
    neighbor_limits: tuple        # len L; K at each level
    budgets: tuple                # len L; static N_l point budgets
    exact: bool = False           # exact top_k instead of approx_max_k
    recall: float = 0.95          # approx_max_k recall target
    # Blocked (cell-list style) search (ops/neighbors.py radius_knn_blocked):
    # only computes distances against AABB-relevant Morton blocks instead of
    # the full support set. `rmax` bounds relevant blocks per query block,
    # calibrated like neighborhood_limits (overflow telemetry in the meta).
    search: str = 'brute'         # 'brute' | 'blocked' | 'lane'
    rmax: tuple = ()              # per-level rmax (conv); () -> default 32
    rmax_pool: tuple = ()         # per-level rmax for pools; () -> conv+8
    min_blocked_n: int = 8192     # below this support size brute is faster
                                  # (measured: no win at N=4864, v5e)
    # Lane search (ops/pallas/knn.py): fused pallas kernel, never
    # materializes the distance matrix; cpl = candidates per lane residue.
    lane_cpl: int = 2

    @staticmethod
    def from_config(cfg, budgets: Sequence[int] | None = None) -> "PyramidSpec":
        """Build from a flat config namespace (same keys as the reference YAML:
        architecture, first_subsampling_dl, conv_radius, neighborhood_limits)."""
        arch = cfg.architecture
        # Preprocessing stops at the first global/upsample block, like the
        # reference's architecture walk (kpconv.py:463-465).
        stop = next((i for i, b in enumerate(arch)
                     if 'global' in b or 'upsample' in b), len(arch))
        arch = arch[:stop]

        num_strided = sum(1 for b in arch if ('pool' in b or 'strided' in b))
        num_levels = num_strided + 1

        # Levels containing deformable blocks search with the (larger)
        # deform radius (kpconv.py:477-486 semantics, per-level granularity).
        deform_level = [False] * num_levels
        level = 0
        for b in arch:
            if 'deform' in b:
                deform_level[level] = True
            if 'pool' in b or 'strided' in b:
                level += 1

        dl0 = float(cfg.first_subsampling_dl)
        conv_r = float(cfg.conv_radius)
        deform_scale = (float(cfg.get('deform_radius', conv_r)) / conv_r
                        if hasattr(cfg, 'get') else 1.0)
        voxel_sizes = tuple(dl0 * (2 ** l) for l in range(num_levels))
        radii = tuple(dl0 * conv_r * (2 ** l)
                      * (deform_scale if deform_level[l] else 1.0)
                      for l in range(num_levels))
        limits = tuple(int(x) for x in cfg.neighborhood_limits[:num_levels])

        if budgets is None:
            budgets = getattr(cfg, 'level_budgets', None)
        if budgets is None:
            raise ValueError("level_budgets must be set in the config "
                             "(static per-level point budgets)")
        budgets = tuple(int(b) for b in budgets[:num_levels])
        assert len(budgets) == num_levels, \
            f"need {num_levels} budgets, got {len(budgets)}"
        g = cfg.get if hasattr(cfg, 'get') else lambda k, d: getattr(cfg, k, d)
        return PyramidSpec(num_levels, voxel_sizes, radii, limits, budgets,
                           exact=bool(g('neighbor_exact', False)),
                           recall=float(g('neighbor_recall', 0.95)),
                           search=str(g('neighbor_search', 'brute')),
                           rmax=tuple(g('neighbor_rmax', ()) or ()),
                           rmax_pool=tuple(g('neighbor_rmax_pool', ()) or ()),
                           min_blocked_n=int(g('neighbor_min_blocked_n', 8192)),
                           lane_cpl=int(g('neighbor_lane_cpl', 2)))


@partial(jax.jit, static_argnames=("spec", "need_upsamples", "chunk"))
def build_pyramid(points: jnp.ndarray, mask: jnp.ndarray, spec: PyramidSpec,
                  need_upsamples: bool = False, chunk: int = 1024) -> dict:
    """Compute the full multi-level KPConv metadata for a stack of clouds.

    Args:
        points: (B, N_0, 3) float32 mask-padded clouds, N_0 == spec.budgets[0].
        mask: (B, N_0) bool.
        spec: static PyramidSpec.
        need_upsamples: also compute nearest-upsample indices (decoder only).
        chunk: query chunk size for neighbor search.

    Returns:
        dict of per-level lists (all static shapes):
          points[l]:    (B, N_l, 3)
          masks[l]:     (B, N_l) bool
          lengths[l]:   (B,) int32 valid counts
          neighbors[l]: (B, N_l, K_l) int32 into level-l supports, shadow==N_l
          pools[l]:     (B, N_{l+1}, K_l) int32 into level-l, l in [0, L-2]
          upsamples[l]: (B, N_l, K_l) int32 into level l+1, if requested
          n_voxels[l]:  (B,) int32 true occupied-voxel count (overflow check)
    """
    assert points.shape[1] == spec.budgets[0], \
        f"input budget mismatch: {points.shape[1]} vs {spec.budgets[0]}"

    # Sort level-0 points into Morton order (at the input voxel scale) so the
    # windowed gather kernel sees spatially-local indices. Deeper levels come
    # out of voxel_subsample already Morton-ordered. perm0 maps sorted slot ->
    # original row (invalid rows last); callers permute per-point labels
    # (e.g. GT overlap) with it.
    from .morton import morton_keys
    safe = jnp.where(mask[..., None], points, 0.0)
    pmin = jnp.min(jnp.where(mask[..., None], points, jnp.inf), axis=1,
                   keepdims=True)
    pmin = jnp.where(jnp.isfinite(pmin), pmin, 0.0)
    coords = jnp.floor((safe - jnp.floor(pmin / spec.voxel_sizes[0])
                        * spec.voxel_sizes[0]) / spec.voxel_sizes[0])
    khi, klo = morton_keys(coords.astype(jnp.int32))
    big = jnp.int32(2 ** 30)
    khi = jnp.where(mask, khi, big)
    klo = jnp.where(mask, klo, big)
    iota = jnp.broadcast_to(jnp.arange(points.shape[1], dtype=jnp.int32),
                            mask.shape)
    _, _, px, py, pz, m_i, perm0 = jax.lax.sort(
        (khi, klo, safe[..., 0], safe[..., 1], safe[..., 2],
         mask.astype(jnp.int32), iota), num_keys=2, dimension=1)
    points = jnp.stack([px, py, pz], axis=-1)
    mask = m_i.astype(bool)

    L = spec.num_levels
    meta = {
        'points': [points], 'masks': [mask],
        'lengths': [jnp.sum(mask.astype(jnp.int32), axis=1)],
        'neighbors': [], 'pools': [], 'upsamples': [],
        'n_voxels': [jnp.sum(mask.astype(jnp.int32), axis=1)],
        'rel_overflow': [],   # blocked search: max(n_rel - rmax, 0) per call
        'perm0': perm0,
    }

    def search(q, qm, s, sm, radius, limit, rmax_default, l, pool):
        """Dispatch brute vs blocked/lane; the latter only pay off at scale."""
        if (spec.search in ('lane', 'lane_packed')
                and s.shape[1] >= spec.min_blocked_n):
            return radius_knn_lane_batch(q, qm, s, sm, radius, limit,
                                         cpl=spec.lane_cpl, exact=spec.exact,
                                         recall=spec.recall,
                                         packed=spec.search == 'lane_packed')
        if spec.search == 'blocked' and s.shape[1] >= spec.min_blocked_n:
            rmaxes = spec.rmax_pool if pool else spec.rmax
            rmax = int(rmaxes[l]) if l < len(rmaxes) else rmax_default
            idx, n_rel = radius_knn_blocked_batch(
                q, qm, s, sm, radius, limit, rmax=rmax,
                exact=spec.exact, recall=spec.recall)
            meta['rel_overflow'].append(
                jnp.maximum(jnp.max(n_rel) - rmax, 0))
            return idx
        return radius_knn_batch(q, qm, s, sm, radius, limit, chunk,
                                spec.exact, spec.recall)

    for l in range(L):
        pts_l, mask_l = meta['points'][l], meta['masks'][l]
        # Conv neighbors within the level.
        with jax.named_scope(f'knn_l{l}'):
            meta['neighbors'].append(search(
                pts_l, mask_l, pts_l, mask_l, spec.radii[l],
                spec.neighbor_limits[l], 40, l, pool=False))

        if l + 1 < L:
            # dl = 2 * r_normal / conv_radius == voxel_sizes[l+1]  (kpconv.py:498)
            with jax.named_scope(f'subsample_l{l + 1}'):
                sub_pts, sub_mask, n_vox = voxel_subsample_batch(
                    pts_l, mask_l, spec.voxel_sizes[l + 1], spec.budgets[l + 1])
            # Pool: neighbors of the subsampled points among level-l points,
            # searched at the *current* level radius (kpconv.py:511).
            with jax.named_scope(f'pools_l{l}'):
                pools = search(sub_pts, sub_mask, pts_l, mask_l,
                               spec.radii[l], spec.neighbor_limits[l],
                               56, l, pool=True)
            meta['pools'].append(pools)
            if need_upsamples:
                # Upsample: level-l queries over level-(l+1) supports at 2r
                # (kpconv.py:515-516).
                with jax.named_scope(f'upsamples_l{l}'):
                    meta['upsamples'].append(radius_knn_batch(
                        pts_l, mask_l, sub_pts, sub_mask, 2.0 * spec.radii[l],
                        spec.neighbor_limits[l], chunk, spec.exact,
                        spec.recall))
            meta['points'].append(sub_pts)
            meta['masks'].append(sub_mask)
            meta['lengths'].append(jnp.sum(sub_mask.astype(jnp.int32), axis=1))
            meta['n_voxels'].append(n_vox)

    return meta
