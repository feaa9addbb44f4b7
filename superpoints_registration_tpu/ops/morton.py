"""Morton (Z-order) keys for spatially-local point ordering.

Storing pyramid points in Morton order makes neighbor indices *local*: the
queries of one gather tile reference support rows spanning a narrow index
window, which is what makes the windowed MXU gather kernel
(ops/pallas/gather.py) fast. Plain lexicographic (z, y, x) voxel order leaves
~60% of neighbors outside a 2K window on real scenes; Morton order keeps the
window tight.

Keys are returned as an (hi, lo) int32 pair supporting 20 bits per axis
(~10^6 voxels per side) — sort lexicographically by (hi, lo).
"""
from __future__ import annotations

import jax.numpy as jnp


def _spread10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each
    (standard 3D Morton magic numbers, 32-bit safe)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_keys(coords: jnp.ndarray):
    """(N, 3) non-negative int32 voxel coords -> (hi, lo) int32 Morton keys.

    lo interleaves bits 0-9 of each axis, hi interleaves bits 10-19; sorting
    by (hi, lo) is the full 60-bit Morton order.
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    lo = _spread10(x) | (_spread10(y) << 1) | (_spread10(z) << 2)
    hi = (_spread10(x >> 10) | (_spread10(y >> 10) << 1)
          | (_spread10(z >> 10) << 2))
    return hi, lo
