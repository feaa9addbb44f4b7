"""3DMatch DGR-protocol evaluation: success = RRE < 15 deg AND RTE < 0.3 m.

Functional parity: src/benchmark/benchmark_3dmatch.py:105-176 (errors are
computed between the INVERSES of the estimated and GT trajectories, as in the
reference).
"""
from __future__ import annotations

import os

import numpy as np

from .predator import SCENE_SHORT_NAMES, rotation_error_deg
from .trajectory import read_trajectory


def benchmark_dgr(est_folder: str, gt_folder: str, re_thresh: float = 15.0,
                  te_thresh: float = 0.3):
    """Returns (report_str, overall_success_rate, per_scene dict)."""
    scenes = sorted(os.listdir(gt_folder))
    lines = ["Scene | success | rre | rte | rre_all | rte_all"]
    per_scene = {}
    all_success, all_rre_s, all_rte_s, all_rre, all_rte = [], [], [], [], []

    for idx, scene in enumerate(scenes):
        _, gt_traj = read_trajectory(os.path.join(gt_folder, scene, 'gt.log'))
        _, est_traj = read_trajectory(os.path.join(est_folder, scene, 'est.log'))

        succ, rre_s, rte_s, rre, rte = [], [], [], [], []
        for i in range(len(est_traj)):
            est_inv = np.linalg.inv(est_traj[i])
            gt_inv = np.linalg.inv(gt_traj[i])
            re = rotation_error_deg(est_inv[:3, :3], gt_inv[:3, :3])
            te = float(np.linalg.norm(est_inv[:3, 3] - gt_inv[:3, 3]))
            rre.append(re)
            rte.append(te)
            ok = re < re_thresh and te < te_thresh
            succ.append(ok)
            if ok:
                rre_s.append(re)
                rte_s.append(te)

        short = SCENE_SHORT_NAMES[idx] if idx < len(SCENE_SHORT_NAMES) else scene
        lines.append(f"{short} | {np.mean(succ):.3f} | "
                     f"{np.mean(rre_s) if rre_s else float('nan'):.3f} | "
                     f"{np.mean(rte_s) if rte_s else float('nan'):.3f} | "
                     f"{np.mean(rre):.3f} | {np.mean(rte):.3f}")
        per_scene[scene] = dict(success=float(np.mean(succ)),
                                rre=rre, rte=rte)
        all_success += succ
        all_rre_s += rre_s
        all_rte_s += rte_s
        all_rre += rre
        all_rte += rte

    lines.append(f"Avg | {np.mean(all_success):.3f} | "
                 f"{np.mean(all_rre_s) if all_rre_s else float('nan'):.3f} | "
                 f"{np.mean(all_rte_s) if all_rte_s else float('nan'):.3f} | "
                 f"{np.mean(all_rre):.3f} | {np.mean(all_rte):.3f}")
    return '\n'.join(lines), float(np.mean(all_success)), per_scene
