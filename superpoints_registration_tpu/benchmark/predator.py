"""3DMatch/3DLoMatch registration-recall evaluation (Predator/Redwood protocol).

Functional parity with src/benchmark/benchmark_predator.py:223-374: a pair
succeeds when the covariance-weighted transformation error (an approximation
of the RMSE over GT correspondences, http://redwood-data.org/indoor/
registration.html) satisfies p <= err_thresh^2. Reports per-scene
precision/recall, median RRE/RTE, and the weighted mean precision.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from .trajectory import (read_trajectory, read_trajectory_info,
                         rotation_to_quaternion)

SCENE_SHORT_NAMES = ['Kitchen', 'Home 1', 'Home 2', 'Hotel 1', 'Hotel 2',
                     'Hotel 3', 'Study', 'MIT Lab']

# The real 3DMatch test-scene directory names, in the order the short
# display names above apply (benchmark_predator.py:289-300). The short names
# are used only when the evaluated scene list IS this list — a custom
# 8-scene corpus keeps its own names.
_3DMATCH_TEST_SCENES = [
    '7-scenes-redkitchen',
    'sun3d-home_at-home_at_scan1_2013_jan_1',
    'sun3d-home_md-home_md_scan9_2012_sep_30',
    'sun3d-hotel_uc-scan3',
    'sun3d-hotel_umd-maryland_hotel1',
    'sun3d-hotel_umd-maryland_hotel3',
    'sun3d-mit_76_studyroom-76-1studyroom2',
    'sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika',
]


def transformation_error(delta: np.ndarray, info: np.ndarray) -> float:
    """Covariance-weighted squared error of a relative transform.

    delta: (4, 4) = inv(gt) @ est; info: (6, 6) information matrix.
    (benchmark_predator.py:60-79)
    """
    t = delta[:3, 3]
    q = rotation_to_quaternion(delta[:3, :3])
    er = np.concatenate([t, q[1:]])
    return float(er @ info @ er / info[0, 0])


def rotation_error_deg(r1: np.ndarray, r2: np.ndarray) -> float:
    cos = np.clip((np.trace(r1.T @ r2) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(cos)))


@dataclass
class SceneResult:
    precision: float
    recall: float
    n_valid: int
    rre_median: float
    rte_median: float
    flags: list = field(default_factory=list)
    errors: np.ndarray = None


def evaluate_scene(est_pairs, est_traj, gt_pairs, gt_traj, gt_info,
                   n_fragments: int, err_thresh: float = 0.2) -> SceneResult:
    """Evaluate one scene (benchmark_predator.py:223-282 semantics).

    Only non-consecutive pairs (|i-j| > 1) count toward recall; flags are
    0 = success, 1 = failure, 2 = not in the GT set.
    """
    err2 = err_thresh ** 2
    gt_index = {}
    for idx in range(len(gt_pairs)):
        i, j = int(gt_pairs[idx, 0]), int(gt_pairs[idx, 1])
        if j - i > 1:
            gt_index[(i, j)] = idx
    n_gt = len(gt_index)

    flags, errors = [], np.full(len(est_pairs), np.nan)
    good, n_res = 0, 0
    rre, rte = [], []
    for idx in range(len(est_pairs)):
        i, j = int(est_pairs[idx, 0]), int(est_pairs[idx, 1])
        if (i, j) in gt_index:
            n_res += 1
            g = gt_index[(i, j)]
            delta = np.linalg.inv(gt_traj[g]) @ est_traj[idx]
            p = transformation_error(delta, gt_info[g])
            errors[idx] = p
            if p <= err2:
                good += 1
                flags.append(0)
                rre.append(rotation_error_deg(gt_traj[g][:3, :3],
                                              est_traj[idx][:3, :3]))
                rte.append(float(np.linalg.norm(gt_traj[g][:3, 3]
                                                - est_traj[idx][:3, 3])))
            else:
                flags.append(1)
        else:
            flags.append(2)

    precision = good / max(n_res, 1e-6)
    recall = good / max(n_gt, 1)
    return SceneResult(
        precision=precision, recall=recall, n_valid=n_gt,
        rre_median=float(np.median(rre)) if rre else float('nan'),
        rte_median=float(np.median(rte)) if rte else float('nan'),
        flags=flags, errors=errors)


def benchmark(est_folder: str, gt_folder: str, err_thresh: float = 0.2,
              save_errors: bool = True):
    """Evaluate all scenes; est_folder/<scene>/est.log vs gt_folder/<scene>/.

    Returns (report_str, mean_recall, per_scene dict).
    """
    scenes = sorted(os.listdir(gt_folder))
    results = {}
    lines = ["Scene | prec. | rec. | re | te | samples"]
    for idx, scene in enumerate(scenes):
        gt_pairs, gt_traj = read_trajectory(os.path.join(gt_folder, scene, 'gt.log'))
        n_frag, gt_info = read_trajectory_info(
            os.path.join(gt_folder, scene, 'gt.info'))
        est_pairs, est_traj = read_trajectory(
            os.path.join(est_folder, scene, 'est.log'))
        res = evaluate_scene(est_pairs, est_traj, gt_pairs, gt_traj, gt_info,
                             n_frag, err_thresh)
        results[scene] = res
        # Short display names apply only to the real 3DMatch scene dirs
        # (benchmark_predator.py:289-300); any other corpus — even an
        # 8-scene one — keeps its own scene names in the report.
        short = (SCENE_SHORT_NAMES[idx]
                 if scenes == _3DMATCH_TEST_SCENES
                 else scene)
        lines.append(f"{short} | {res.precision:.3f} | {res.recall:.3f} | "
                     f"{res.rre_median:.3f} | {res.rte_median:.3f} | {res.n_valid}")
        if save_errors:
            np.save(os.path.join(est_folder, scene, 'flag.npy'),
                    np.asarray(res.flags))
            np.save(os.path.join(est_folder, scene, 'errors.npy'), res.errors)

    precisions = np.array([r.precision for r in results.values()])
    recalls = np.array([r.recall for r in results.values()])
    n_valids = np.array([r.n_valid for r in results.values()])
    weighted_precision = (n_valids * precisions).sum() / n_valids.sum()
    lines.append(f"Mean precision: {precisions.mean():.3f} +- {precisions.std():.3f}")
    lines.append(f"Weighted precision: {weighted_precision:.3f}")
    lines.append(f"Mean recall: {recalls.mean():.3f}")
    rre_med = np.array([r.rre_median for r in results.values()])
    rte_med = np.array([r.rte_median for r in results.values()])
    lines.append(f"Mean median RRE: {np.nanmean(rre_med):.3f}")
    lines.append(f"Mean median RTE: {np.nanmean(rte_med):.3f}")
    return '\n'.join(lines), float(recalls.mean()), results
