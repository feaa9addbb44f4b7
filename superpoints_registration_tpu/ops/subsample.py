"""On-device voxel-grid subsampling with a static output budget.

Replaces the reference's C++ grid subsampling
(src/models/backbone_kpconv/cpp_wrappers/cpp_subsampling/grid_subsampling/
grid_subsampling.cpp:5-106) and its MinkowskiEngine GPU hack
(src/models/backbone_kpconv/kpconv.py:217-244) with a fully jittable,
deterministic TPU implementation.

Semantics (matching the C++ reference):
  * grid origin  = floor(min(points) / dl) * dl
  * voxel coords = floor((p - origin) / dl)
  * one output point per occupied voxel = barycenter of its points

TPU-first design: instead of a hash map (dynamic shapes), we sort points
lexicographically by voxel coordinate (XLA sort is fast on TPU), detect voxel
boundaries, and scatter-add into a fixed `budget`-sized output with
segment sums. Output is deterministic (voxels ordered by (z, y, x)), unlike
the reference GPU path which is explicitly nondeterministic
(kpconv.py:220-223). Voxels beyond the budget are dropped and reported via
`n_voxels` so budget overflows are observable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG_I32 = jnp.int32(2 ** 30)


@partial(jax.jit, static_argnames=("budget",))
def voxel_subsample(points: jnp.ndarray, mask: jnp.ndarray, voxel_size: float,
                    budget: int):
    """Voxel-grid barycenter subsampling of one (padded) point cloud.

    Args:
        points: (N, 3) float32, padded; padded rows must be finite.
        mask: (N,) bool validity of each row.
        voxel_size: grid cell edge length (static or traced scalar).
        budget: static output size M.

    Returns:
        out_points: (M, 3) voxel barycenters (zeros for empty slots).
        out_mask: (M,) bool validity.
        n_voxels: () int32, TOTAL occupied voxels (may exceed budget; if so,
            the `n_voxels - budget` voxels sorting last were dropped).
    """
    points = points.astype(jnp.float32)
    # Zero out padded coords so they can't produce inf/nan in arithmetic.
    safe_pts = jnp.where(mask[:, None], points, 0.0)

    pmin = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    pmin = jnp.where(jnp.isfinite(pmin), pmin, 0.0)  # all-invalid cloud
    origin = jnp.floor(pmin / voxel_size) * voxel_size
    coords = jnp.floor((safe_pts - origin) / voxel_size).astype(jnp.int32)

    # Morton order: keeps the output spatially local in index space, which
    # the windowed gather kernel (ops/pallas/gather.py) relies on. Invalid
    # rows sort last.
    from .morton import morton_keys
    khi, klo = morton_keys(coords)
    khi = jnp.where(mask, khi, _BIG_I32)
    klo = jnp.where(mask, klo, _BIG_I32)

    shi, slo, px, py, pz, m_i = jax.lax.sort(
        (khi, klo, safe_pts[:, 0], safe_pts[:, 1], safe_pts[:, 2],
         mask.astype(jnp.int32)),
        num_keys=2)

    valid = m_i.astype(bool)
    boundary = jnp.concatenate([
        jnp.ones((1,), bool),
        (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1]),
    ])
    new_voxel = boundary & valid
    seg = jnp.cumsum(new_voxel.astype(jnp.int32)) - 1
    seg = jnp.where(valid, jnp.minimum(seg, budget), budget)

    pts_sorted = jnp.stack([px, py, pz], axis=1)
    sums = jax.ops.segment_sum(pts_sorted * valid[:, None], seg,
                               num_segments=budget + 1)
    counts = jax.ops.segment_sum(valid.astype(jnp.float32), seg,
                                 num_segments=budget + 1)

    out_points = sums[:budget] / jnp.maximum(counts[:budget, None], 1.0)
    out_mask = counts[:budget] > 0
    n_voxels = jnp.sum(new_voxel.astype(jnp.int32))
    return out_points, out_mask, n_voxels


# Batched over a stack of clouds: (B, N, 3), (B, N) -> (B, M, 3), (B, M), (B,)
voxel_subsample_batch = jax.vmap(voxel_subsample, in_axes=(0, 0, None, None),
                                 out_axes=0)
