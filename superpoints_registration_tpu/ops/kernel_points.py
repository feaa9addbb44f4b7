"""Kernel-point disposition generation for KPConv.

Replaces the reference's repulsion-optimized, PLY-cached kernel dispositions
(src/models/backbone_kpconv/kernels/kernel_points.py:245-469) with a small,
deterministic, in-memory generator: points repel each other inside the unit
ball (inverse-square potential), the first point is pinned at the center,
and the result is rescaled so the mean non-center radius is `ratio` (0.66,
as in the reference), then scaled by the block radius.

Unlike the reference, no file cache and no *unseeded* randomness: the
disposition, the random rotation, and the jitter noise all derive from an
explicit seed, so model init is reproducible.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

# Per-seed kernel-point overrides, installed when loading a checkpoint
# converted from the reference (utils/convert_reference.py): the reference
# stores each conv layer's (randomly rotated + jittered) disposition as a
# buffer (kpconv_blocks.py:244-268 `kernel_points`), so converted weights
# only reproduce its outputs when paired with ITS dispositions. Keyed by the
# same per-layer `seed` that load_kernel_points would otherwise use.
_OVERRIDES: dict | None = None


def set_kernel_point_overrides(mapping: dict | None):
    """Install {seed: (Kp, 3) array} overrides (None clears them)."""
    global _OVERRIDES
    _OVERRIDES = (None if mapping is None else
                  {int(k): np.asarray(v, np.float32)
                   for k, v in mapping.items()})


def load_kernel_point_overrides(npz_path) -> dict:
    """Read an overrides file written by utils/convert_reference.py."""
    with np.load(npz_path) as z:
        return {int(k): z[k] for k in z.files}


@lru_cache(maxsize=32)
def _optimize_disposition(num_points: int, dimension: int, fixed: str,
                          seed: int) -> tuple:
    """Repulsion-optimized points in the unit ball; returns a hashable tuple."""
    rng = np.random.default_rng(seed)

    # Init uniformly in a ball of radius sqrt(0.5).
    pts = np.zeros((0, dimension))
    while len(pts) < num_points:
        cand = rng.uniform(-1.0, 1.0, (num_points * 3, dimension))
        cand = cand[np.sum(cand ** 2, axis=1) < 0.5]
        pts = np.concatenate([pts, cand])
    pts = pts[:num_points]

    if fixed == 'center':
        pts[0] = 0.0
    elif fixed == 'verticals':
        pts[:3] = 0.0
        pts[1, -1] = 2.0 / 3.0
        pts[2, -1] = -2.0 / 3.0

    lr, decay, clip = 1e-2, 0.9995, 0.05
    for _ in range(5000):
        diff = pts[:, None, :] - pts[None, :, :]
        d = np.linalg.norm(diff, axis=-1)
        np.fill_diagonal(d, 1.0)
        # Inverse-square repulsion.
        grad = np.sum(diff / (d ** 3)[..., None], axis=1)
        np.fill_diagonal(d, 0.0)
        gnorm = np.linalg.norm(grad, axis=-1, keepdims=True)
        grad = np.where(gnorm > clip / lr, grad * (clip / lr) / gnorm, grad)
        pts = pts + lr * grad
        lr *= decay
        # Constrain to the unit ball.
        r = np.linalg.norm(pts, axis=-1, keepdims=True)
        pts = np.where(r > 1.0, pts / r, pts)
        if fixed == 'center':
            pts[0] = 0.0
        elif fixed == 'verticals':
            pts[:3, :-1] = 0.0
            pts[1, -1], pts[2, -1] = max(pts[1, -1], 0.1), min(pts[2, -1], -0.1)

    # Rescale: mean radius of the non-fixed points == 0.66.
    n_fixed = 1 if fixed == 'center' else (3 if fixed == 'verticals' else 0)
    free = pts[n_fixed:] if n_fixed else pts
    pts = pts * (0.66 / np.mean(np.linalg.norm(free, axis=-1)))
    return tuple(map(tuple, pts))


def load_kernel_points(radius: float, num_kpoints: int, dimension: int = 3,
                       fixed: str = 'center', seed: int = 0,
                       rotate: bool = True, noise_scale: float = 0.01) -> np.ndarray:
    """Kernel disposition scaled to `radius`, with seeded rotation + jitter.

    The reference applies a random z-rotation and N(0, 0.01) jitter on every
    load (kernel_points.py:433-469), so each conv layer gets a different
    orientation; pass a distinct `seed` per layer to reproduce that property
    deterministically.

    If overrides are installed (converted reference checkpoints), the stored
    disposition for this seed is returned verbatim — it is already scaled,
    rotated, and jittered.
    """
    if _OVERRIDES is not None and seed in _OVERRIDES:
        return _OVERRIDES[seed]
    pts = np.asarray(_optimize_disposition(num_kpoints, dimension, fixed, seed=0),
                     dtype=np.float64)
    rng = np.random.default_rng(seed + 1)
    if rotate and dimension == 3:
        theta = rng.random() * 2 * np.pi
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    else:
        rot = np.eye(dimension)
    pts = pts + rng.normal(scale=noise_scale, size=pts.shape)
    pts = (radius * pts) @ rot
    return pts.astype(np.float32)
