"""ModelNet / ModelLoNet evaluation: RPMNet metric suite.

Functional parity: src/benchmark/benchmark_modelnet.py:33-124 — anisotropic
Euler-angle r_mse/r_mae (xyz, degrees), t_mse/t_mae, isotropic rotation /
translation errors, and the modified Chamfer distance against the raw
(uncropped) cloud. Pure numpy.
"""
from __future__ import annotations

import numpy as np


def rotation_to_euler_xyz_deg(rots: np.ndarray) -> np.ndarray:
    """(N, 3, 3) rotations -> (N, 3) intrinsic-xyz Euler angles in degrees.

    Convention matches scipy Rotation.as_euler('xyz', degrees=True) as used by
    the reference (benchmark_modelnet.py:20-29).
    """
    out = np.zeros((len(rots), 3))
    for i, r in enumerate(rots):
        # R = Rz(c) @ Ry(b) @ Rx(a) for intrinsic xyz? scipy 'xyz' intrinsic:
        # R = Rx(a) @ Ry(b) @ Rz(c) rotated axes; equivalent extrinsic zyx.
        # scipy lowercase 'xyz' is EXTRINSIC: R = Rz(c) Ry(b) Rx(a)... Use the
        # standard extraction for R = R_z(y3) R_y(y2) R_x(y1) convention then
        # reorder: scipy's as_euler('xyz') returns angles (a1, a2, a3) with
        # R = Rz(a3) @ Ry(a2) @ Rx(a1) (extrinsic x-y-z application order).
        sy = -r[2, 0]
        a2 = np.arcsin(np.clip(sy, -1.0, 1.0))
        if abs(sy) < 0.99999:
            a1 = np.arctan2(r[2, 1], r[2, 2])
            a3 = np.arctan2(r[1, 0], r[0, 0])
        else:  # gimbal lock
            a1 = np.arctan2(-r[1, 2], r[1, 1])
            a3 = 0.0
        out[i] = np.degrees([a1, a2, a3])
    return out


def square_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(B, N, 3), (B, M, 3) -> (B, N, M) squared distances."""
    return np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)


def _transform(pose, pts):
    return pts @ pose[..., :3, :3].swapaxes(-1, -2) + pose[..., None, :3, 3]


def _cat(a, b):
    rot = a[..., :3, :3] @ b[..., :3, :3]
    t = a[..., :3, :3] @ b[..., :3, 3:4] + a[..., :3, 3:4]
    return np.concatenate([rot, t], axis=-1)


def _inv(p):
    rot = p[..., :3, :3].swapaxes(-1, -2)
    return np.concatenate([rot, -rot @ p[..., :3, 3:4]], axis=-1)


def compute_metrics(points_src: np.ndarray, points_ref: np.ndarray,
                    points_raw: np.ndarray, gt_transforms: np.ndarray,
                    pred_transforms: np.ndarray) -> dict:
    """RPMNet metric suite for a batch.

    Args:
        points_src: (B, N, 3) source points (cropped/sampled input).
        points_ref: (B, M, 3) reference points.
        points_raw: (B, R, 3) raw (complete) clouds in ref frame.
        gt_transforms / pred_transforms: (B, 3, 4).
    """
    r_gt = rotation_to_euler_xyz_deg(gt_transforms[:, :3, :3])
    r_pred = rotation_to_euler_xyz_deg(pred_transforms[:, :3, :3])
    t_gt = gt_transforms[:, :3, 3]
    t_pred = pred_transforms[:, :3, 3]

    r_mse = np.mean((r_gt - r_pred) ** 2, axis=1)
    r_mae = np.mean(np.abs(r_gt - r_pred), axis=1)
    t_mse = np.mean((t_gt - t_pred) ** 2, axis=1)
    t_mae = np.mean(np.abs(t_gt - t_pred), axis=1)

    concat = _cat(_inv(gt_transforms), pred_transforms)
    trace = concat[:, 0, 0] + concat[:, 1, 1] + concat[:, 2, 2]
    err_r_deg = np.degrees(np.arccos(np.clip(0.5 * (trace - 1), -1.0, 1.0)))
    err_t = np.linalg.norm(concat[:, :, 3], axis=-1)

    # Modified Chamfer: predicted-warped src vs raw ref cloud, and ref vs
    # (pred o inv(gt))-warped raw cloud (benchmark_modelnet.py:67-72).
    src_tf = _transform(pred_transforms, points_src)
    src_clean = _transform(_cat(pred_transforms, _inv(gt_transforms)), points_raw)
    dist_src = np.min(square_distance(src_tf, points_raw), axis=-1)
    dist_ref = np.min(square_distance(points_ref, src_clean), axis=-1)
    chamfer = np.mean(dist_src, axis=1) + np.mean(dist_ref, axis=1)

    return {'r_mse': r_mse, 'r_mae': r_mae, 't_mse': t_mse, 't_mae': t_mae,
            'err_r_deg': err_r_deg, 'err_t': err_t, 'chamfer_dist': chamfer}


def summarize_metrics(metrics: dict) -> dict:
    """rmse for *_mse keys, mean+rmse for err_* keys, mean otherwise
    (benchmark_modelnet.py:88-99)."""
    out = {}
    for k, v in metrics.items():
        v = np.asarray(v)
        if k.endswith('mse'):
            out[k[:-3] + 'rmse'] = float(np.sqrt(np.mean(v)))
        elif k.startswith('err'):
            out[k + '_mean'] = float(np.mean(v))
            out[k + '_rmse'] = float(np.sqrt(np.mean(v ** 2)))
        else:
            out[k] = float(np.mean(v))
    return out


def print_metrics(logger, summary: dict, title: str = 'Metrics'):
    logger.info('%s:', title)
    logger.info('DeepCP: %.4f(rot-rmse) | %.4f(rot-mae) | %.4g(trans-rmse) | %.4g(trans-mae)',
                summary['r_rmse'], summary['r_mae'], summary['t_rmse'], summary['t_mae'])
    logger.info('Rotation error %.4f(deg, mean) | %.4f(deg, rmse)',
                summary['err_r_deg_mean'], summary['err_r_deg_rmse'])
    logger.info('Translation error %.4g(mean) | %.4g(rmse)',
                summary['err_t_mean'], summary['err_t_rmse'])
    logger.info('Chamfer error: %.7f(mean-sq)', summary['chamfer_dist'])
