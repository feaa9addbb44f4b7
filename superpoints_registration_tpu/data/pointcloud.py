"""Point-cloud utilities for the CPU data pipeline.

compute_overlap replaces the reference's Open3D-KDTree version
(src/utils/pointcloud.py:8-65) with scipy cKDTree; voxel_down_sample_np
replaces the kiss-icp pybind call (src/data_loaders/kitti_pred.py:12-14).
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def compute_overlap(src: np.ndarray, tgt: np.ndarray, search_radius: float):
    """Mutual overlap masks + correspondence index pairs.

    Args:
        src: (N, 3) source points, already in the target frame.
        tgt: (M, 3) target points.

    Returns:
        src_mask (N,) bool, tgt_mask (M,) bool,
        src_tgt_corr (2, C) int: mutual nearest pairs within the radius.
    """
    src_tree = cKDTree(src)
    tgt_tree = cKDTree(tgt)

    d_src, i_src = tgt_tree.query(src, k=1, distance_upper_bound=search_radius)
    src_mask = np.isfinite(d_src)
    d_tgt, i_tgt = src_tree.query(tgt, k=1, distance_upper_bound=search_radius)
    tgt_mask = np.isfinite(d_tgt)

    src_idx = np.nonzero(src_mask)[0]
    corr = np.stack([src_idx, i_src[src_idx]])
    return src_mask, tgt_mask, corr.astype(np.int64)


def voxel_down_sample_np(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel-grid downsample keeping ONE point per voxel (the first), matching
    kiss-icp's VoxelDownsample behavior (not barycenters)."""
    coords = np.floor(points / voxel_size).astype(np.int64)
    _, first = np.unique(coords, axis=0, return_index=True)
    return points[np.sort(first)]


def icp_refine(src: np.ndarray, tgt: np.ndarray, init_pose: np.ndarray,
               max_dist: float = 0.5, iters: int = 30) -> np.ndarray:
    """Point-to-point ICP for GT pose refinement (replaces the Open3D ICP at
    src/data_loaders/kitti_pred.py:161-183). Returns a refined (3, 4) pose."""
    from ..ops import lie_np
    pose = init_pose.copy()
    tree = cKDTree(tgt)
    for _ in range(iters):
        warped = lie_np.se3_transform(pose, src)
        d, idx = tree.query(warped, k=1, distance_upper_bound=max_dist)
        ok = np.isfinite(d)
        if ok.sum() < 10:
            break
        a = src[ok]
        b = tgt[idx[ok]]
        # Weighted Kabsch (uniform weights) in numpy.
        ca, cb = a.mean(0), b.mean(0)
        cov = (a - ca).T @ (b - cb)
        u, s, vt = np.linalg.svd(cov)
        d_sign = np.sign(np.linalg.det(vt.T @ u.T))
        rot = vt.T @ np.diag([1.0, 1.0, d_sign]) @ u.T
        trans = cb - rot @ ca
        new_pose = np.concatenate([rot, trans[:, None]], axis=1)
        if np.allclose(new_pose, pose, atol=1e-7):
            pose = new_pose
            break
        pose = new_pose
    return pose.astype(np.float32)
