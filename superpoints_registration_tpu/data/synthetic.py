"""Synthetic partial-overlap registration pairs (ModelNet-crop style).

Self-generating fixtures: a random surface-ish cloud is split into two copies,
each half-space-cropped to `partial` fraction (the reference's RandomCrop,
src/data_loaders/modelnet_transforms.py:176-248), the source is rigidly
perturbed (RandomTransformSE3, modelnet_transforms.py:249-356), and GT
overlap masks are computed by mutual radius-NN (src/utils/pointcloud.py:8-65).

Used for unit tests, smoke training, and benchmarking without any dataset
download — the same role the reference's ModelNet pipeline plays.
"""
from __future__ import annotations

import numpy as np

from ..ops import lie_np


def random_cloud(rng: np.random.Generator, n: int) -> np.ndarray:
    """Blobby multi-surface cloud in the unit ball, vaguely object-like."""
    n_parts = 4
    pts = []
    for _ in range(n_parts):
        center = rng.uniform(-0.5, 0.5, 3)
        axis_a = rng.normal(size=3)
        axis_a /= np.linalg.norm(axis_a)
        axis_b = np.cross(axis_a, rng.normal(size=3))
        axis_b /= np.linalg.norm(axis_b)
        uv = rng.uniform(-0.5, 0.5, (n // n_parts, 2))
        part = center + uv[:, :1] * axis_a + uv[:, 1:] * axis_b
        part += rng.normal(size=part.shape) * 0.01
        pts.append(part)
    out = np.concatenate(pts)[:n]
    if len(out) < n:
        out = np.concatenate([out, out[: n - len(out)]])
    return out.astype(np.float32)


def halfspace_crop(rng: np.random.Generator, pts: np.ndarray, p_keep: float):
    """Keep the p_keep fraction on one side of a random plane through the
    centroid (modelnet_transforms.py:176-248)."""
    if p_keep >= 1.0:
        return pts, np.ones(len(pts), bool)
    direction = lie_np.uniform_2_sphere(rng)
    centered = pts - pts.mean(axis=0)
    dist = centered @ direction
    thresh = np.percentile(dist, (1.0 - p_keep) * 100.0)
    keep = dist > thresh
    return pts[keep], keep


def compute_overlap_masks(src_warped: np.ndarray, tgt: np.ndarray,
                          radius: float):
    """Mutual overlap masks: src/tgt points with a counterpart within radius
    (utils/pointcloud.py:8-65 semantics, brute force)."""
    d = np.linalg.norm(src_warped[:, None, :] - tgt[None, :, :], axis=-1)
    src_mask = (d <= radius).any(axis=1)
    tgt_mask = (d <= radius).any(axis=0)
    return src_mask, tgt_mask


def make_pair(rng: np.random.Generator, n_points: int = 1024,
              partial: float = 0.7, rot_mag_deg: float = 45.0,
              trans_mag: float = 0.5, noise_std: float = 0.005,
              overlap_radius: float = 0.0375) -> dict:
    """One synthetic registration pair (ragged; collate pads to budgets).

    Returns dict: src_xyz (N,3), tgt_xyz (M,3), pose (3,4) with
    pose @ src ~= tgt, src_overlap (N,), tgt_overlap (M,).
    """
    cloud = random_cloud(rng, n_points)

    src, _ = halfspace_crop(rng, cloud, partial)
    tgt, _ = halfspace_crop(rng, cloud, partial)

    # Random transform applied to the target side; pose maps src -> tgt.
    angle = np.radians(rot_mag_deg) * rng.random()
    axis = lie_np.uniform_2_sphere(rng)
    rot = lie_np.so3_exp(axis * angle)
    trans = rng.uniform(-trans_mag, trans_mag, (3, 1))
    pose = np.concatenate([rot, trans], axis=1).astype(np.float32)

    tgt = lie_np.se3_transform(pose, tgt).astype(np.float32)

    if noise_std > 0:
        src = src + rng.normal(size=src.shape).astype(np.float32) * noise_std
        tgt = tgt + rng.normal(size=tgt.shape).astype(np.float32) * noise_std

    src_ov, tgt_ov = compute_overlap_masks(
        lie_np.se3_transform(pose, src), tgt, overlap_radius)

    return {
        'src_xyz': src.astype(np.float32),
        'tgt_xyz': tgt.astype(np.float32),
        'pose': pose,
        'src_overlap': src_ov.astype(np.float32),
        'tgt_overlap': tgt_ov.astype(np.float32),
    }


class SyntheticPairDataset:
    """Deterministic-by-index synthetic pair dataset."""

    def __init__(self, size: int = 1024, n_points: int = 1024,
                 partial: float = 0.7, rot_mag_deg: float = 45.0,
                 trans_mag: float = 0.5, noise_std: float = 0.005,
                 overlap_radius: float = 0.0375, seed: int = 0):
        self.size = size
        self.kwargs = dict(n_points=n_points, partial=partial,
                           rot_mag_deg=rot_mag_deg, trans_mag=trans_mag,
                           noise_std=noise_std, overlap_radius=overlap_radius)
        self.seed = seed

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng((self.seed, idx))
        return make_pair(rng, **self.kwargs)
