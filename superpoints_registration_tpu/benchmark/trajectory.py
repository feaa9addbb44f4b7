"""Redwood/3DMatch trajectory file IO (gt.log / gt.info / est.log).

Format spec: http://redwood-data.org/indoor/fileformat.html. Functional
parity: src/benchmark/benchmark_predator.py:84-199.
"""
from __future__ import annotations

import numpy as np


def read_trajectory(path, dim: int = 4):
    """Read a .log trajectory: returns (pairs (n, 3) int str-array, traj (n, 4, 4))."""
    with open(path) as f:
        lines = [ln.rstrip('\n') for ln in f if ln.strip()]
    n = len(lines) // (dim + 1)
    pairs, mats = [], []
    for i in range(n):
        head = lines[i * (dim + 1)].split()
        pairs.append([h.strip() for h in head[:3]])
        rows = []
        for r in range(dim):
            # Tab-separated per spec, but tolerate spaces.
            rows.append(np.asarray(lines[i * (dim + 1) + 1 + r].split(),
                                   dtype=np.float64))
        mats.append(np.stack(rows))
    return np.asarray(pairs), np.asarray(mats, dtype=np.float64)


def read_trajectory_info(path, dim: int = 6):
    """Read a .info covariance file: returns (n_fragments, cov (n, 6, 6))."""
    with open(path) as f:
        lines = [ln for ln in f if ln.strip()]
    n = len(lines) // (dim + 1)
    covs = []
    n_frag = 0
    for i in range(n):
        head = lines[i * (dim + 1)].split()
        n_frag = int(head[2])
        covs.append(np.stack([np.fromstring(lines[i * (dim + 1) + 1 + r], sep='\t')
                              for r in range(dim)]))
    return n_frag, np.asarray(covs, dtype=np.float64)


def write_trajectory(path, pairs, traj, dim: int = 4):
    """Write an est.log in Redwood format. pairs: (n, 3) ints; traj: (n, 4, 4)."""
    with open(path, 'w') as f:
        for meta, mat in zip(pairs, traj):
            f.write('\t'.join(str(int(x)) for x in meta) + '\n')
            for r in range(dim):
                f.write('\t'.join(f'{v:.12f}' for v in mat[r]) + '\n')


def rotation_to_quaternion(rot: np.ndarray) -> np.ndarray:
    """(3, 3) rotation -> (w, x, y, z) unit quaternion (Shepperd's method)."""
    m = rot
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    # Canonical sign (matches nibabel: w >= 0).
    if q[0] < 0:
        q = -q
    return q
