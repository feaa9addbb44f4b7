"""Numpy oracles re-implementing the reference preprocessing semantics exactly.

These mirror the C++ ops (grid_subsampling.cpp:5-106, neighbors.cpp:125-333)
for property-testing the on-device implementations.
"""
import numpy as np


def voxel_subsample_oracle(points: np.ndarray, voxel_size: float):
    """Exact voxel barycenters as an (unordered) set.

    Returns (M, 3) barycenters sorted lexicographically by voxel (z, y, x)
    to match the TPU implementation's deterministic ordering.
    """
    origin = np.floor(points.min(axis=0) / voxel_size) * voxel_size
    coords = np.floor((points - origin) / voxel_size).astype(np.int64)
    # Group by (z, y, x)
    order = np.lexsort((coords[:, 0], coords[:, 1], coords[:, 2]))
    coords_s = coords[order]
    pts_s = points[order]
    boundary = np.ones(len(points), bool)
    boundary[1:] = np.any(coords_s[1:] != coords_s[:-1], axis=1)
    seg = np.cumsum(boundary) - 1
    m = seg[-1] + 1
    sums = np.zeros((m, 3))
    counts = np.zeros(m)
    np.add.at(sums, seg, pts_s)
    np.add.at(counts, seg, 1.0)
    return sums / counts[:, None]


def radius_neighbors_oracle(queries: np.ndarray, supports: np.ndarray,
                            radius: float, k: int):
    """K closest supports within radius per query; shadow index = len(supports).

    Returns (Nq, K) int64.
    """
    ns = len(supports)
    d = np.linalg.norm(queries[:, None, :] - supports[None, :, :], axis=-1)
    out = np.full((len(queries), k), ns, dtype=np.int64)
    for i in range(len(queries)):
        idx = np.argsort(d[i], kind='stable')[:k]
        ok = d[i][idx] <= radius
        out[i, :ok.sum()] = idx[ok]
    return out
