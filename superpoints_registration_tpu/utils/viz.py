"""Offline registration visualization (matplotlib; dev/debug only).

Replaces the reference's VTK viewer stack (src/cvhelpers/visualization/,
src/utils/viz.py:11-132 — all call sites commented out upstream) with a
headless matplotlib version that renders the same 2x3 debug grid: source /
target / overlap predictions / correspondences / GT-aligned / pred-aligned,
saved to PNG.
"""
from __future__ import annotations

import numpy as np

from ..ops import lie_np


def _scatter(ax, pts, color, s=0.5, label=None):
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=s, c=color, label=label,
               depthshade=False)
    ax.set_axis_off()


def visualize_registration(src_xyz: np.ndarray, tgt_xyz: np.ndarray,
                           pose_pred: np.ndarray, pose_gt: np.ndarray | None = None,
                           src_overlap: np.ndarray | None = None,
                           corr_src: np.ndarray | None = None,
                           corr_tgt: np.ndarray | None = None,
                           corr_weight: np.ndarray | None = None,
                           out_path: str = 'registration.png'):
    """Render the registration debug grid to a PNG. All inputs numpy,
    unpadded."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(15, 10))
    axes = [fig.add_subplot(2, 3, i + 1, projection='3d') for i in range(6)]

    _scatter(axes[0], src_xyz, 'tab:orange')
    axes[0].set_title('source')
    _scatter(axes[1], tgt_xyz, 'tab:blue')
    axes[1].set_title('target')

    if src_overlap is not None:
        c = np.clip(src_overlap, 0, 1)
        axes[2].scatter(src_xyz[:, 0], src_xyz[:, 1], src_xyz[:, 2], s=0.5,
                        c=c, cmap='viridis', depthshade=False)
        axes[2].set_axis_off()
        axes[2].set_title('predicted overlap (src)')

    if corr_src is not None and corr_tgt is not None:
        n = min(len(corr_src), 200)
        sel = np.linspace(0, len(corr_src) - 1, n).astype(int)
        if corr_weight is not None:
            order = np.argsort(corr_weight)[::-1]
            sel = order[:n]
        _scatter(axes[3], src_xyz, 'lightgray')
        _scatter(axes[3], tgt_xyz, 'lightblue')
        for a, b in zip(corr_src[sel], corr_tgt[sel]):
            axes[3].plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]],
                         'g-', linewidth=0.3)
        axes[3].set_title('correspondences')

    if pose_gt is not None:
        warped = lie_np.se3_transform(pose_gt, src_xyz)
        _scatter(axes[4], warped, 'tab:orange')
        _scatter(axes[4], tgt_xyz, 'tab:blue')
        axes[4].set_title('GT alignment')

    warped = lie_np.se3_transform(pose_pred, src_xyz)
    _scatter(axes[5], warped, 'tab:orange')
    _scatter(axes[5], tgt_xyz, 'tab:blue')
    axes[5].set_title('predicted alignment')

    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
