"""KITTI odometry LiDAR pair dataset.

Functional parity: src/data_loaders/kitti_pred.py:45-293 — odometry sequences
(train 0-5, val 6-7, test 8-10), pairs >= 10 m apart built from the odometry
translations, known-bad test pair (8, 15, 58) removed, GT pose = camera
odometry conjugated by the velo->cam calibration and refined by ICP (cached as
.npy), input clouds voxel-downsampled at first_subsampling_dl, optional
radius crop / ground removal.

Differences: ICP refinement uses our scipy-based point-to-point ICP
(data/pointcloud.py) instead of Open3D; the voxel downsample is numpy instead
of kiss-icp; overlap masks are computed on the fly (cached h5 optional)
instead of hard-requiring a precomputed file.
"""
from __future__ import annotations

import glob
import logging
import os

import numpy as np

from ..ops import lie_np
from .pointcloud import compute_overlap, icp_refine, voxel_down_sample_np
from .threedmatch import default_train_transforms

_logger = logging.getLogger(__name__)

# velo->cam calibration (KITTI odometry devkit values, kitti_pred.py:254-266).
_VELO2CAM_R = np.array([
    7.533745e-03, -9.999714e-01, -6.166020e-04, 1.480249e-02, 7.280733e-04,
    -9.998902e-01, 9.998621e-01, 7.523790e-03, 1.480755e-02]).reshape(3, 3)
_VELO2CAM_T = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01]).reshape(3, 1)


def velo2cam_4x4() -> np.ndarray:
    m = np.vstack([np.hstack([_VELO2CAM_R, _VELO2CAM_T]), [0, 0, 0, 1]])
    return m.T  # the reference stores/uses the TRANSPOSE (kitti_pred.py:264)


class KittiPairDataset:
    SEQUENCES = {'train': [0, 1, 2, 3, 4, 5], 'val': [6, 7],
                 'test': [8, 9, 10]}
    BAD_PAIRS = {'test': [(8, 15, 58)]}

    def __init__(self, cfg, phase: str):
        assert phase in ('train', 'val', 'test')
        self.cfg = cfg
        self.phase = phase
        self.seed = cfg.get('seed', 0)
        self.epoch = 0
        self.root = os.path.join(cfg.root, 'dataset')
        self.icp_path = os.path.join(cfg.root, 'icp')
        os.makedirs(self.icp_path, exist_ok=True)
        self.voxel_size = cfg.first_subsampling_dl
        self.search_radius = cfg.get('overlap_radius', 0.3)
        self._odometry_cache = {}

        self.files = self._build_pairs(phase)
        for bad in self.BAD_PAIRS.get(phase, []):
            if bad in self.files:
                self.files.remove(bad)
        _logger.info('KITTI %s: %d pairs', phase, len(self.files))

        self.transforms = (default_train_transforms(cfg)
                           if phase == 'train' else None)

    # ---- pair construction (kitti_pred.py:94-139) ----

    def _odometry(self, drive: int) -> np.ndarray:
        path = os.path.join(self.root, 'poses', f'{drive:02d}.txt')
        if path not in self._odometry_cache:
            self._odometry_cache[path] = np.genfromtxt(path)
        return self._odometry_cache[path]

    @staticmethod
    def _to_4x4(odo_row: np.ndarray) -> np.ndarray:
        return np.vstack([odo_row.reshape(3, 4), [0, 0, 0, 1]])

    def _build_pairs(self, phase):
        files = []
        for drive in self.SEQUENCES[phase]:
            fnames = glob.glob(os.path.join(
                self.root, 'sequences', f'{drive:02d}', 'velodyne', '*.bin'))
            if not fnames:
                raise FileNotFoundError(
                    f'KITTI odometry data not found under {self.root} '
                    f'(sequence {drive:02d})')
            inames = sorted(int(os.path.basename(f)[:-4]) for f in fnames)
            all_pos = np.stack([self._to_4x4(r) for r in self._odometry(drive)])
            ts = all_pos[:, :3, 3]
            pdist = np.linalg.norm(ts[None] - ts[:, None], axis=-1)
            more_than_10 = pdist > 10
            iname_set = set(inames)
            curr = inames[0]
            while curr in iname_set:
                nxt = np.nonzero(more_than_10[curr][curr:curr + 100])[0]
                if len(nxt) == 0:
                    curr += 1
                    continue
                nxt = int(nxt[0]) + curr - 1
                if nxt in iname_set:
                    files.append((drive, curr, nxt))
                    curr = nxt + 1
                else:
                    curr += 1
        return files

    # ---- sample loading ----

    def _velodyne(self, drive: int, t: int) -> np.ndarray:
        fname = os.path.join(self.root, 'sequences', f'{drive:02d}', 'velodyne',
                             f'{t:06d}.bin')
        return np.fromfile(fname, dtype=np.float32).reshape(-1, 4)[:, :3]

    def _gt_pose(self, drive, t0, t1, xyz0, xyz1) -> np.ndarray:
        """Odometry pose conjugated to the velodyne frame, ICP-refined and
        cached (kitti_pred.py:160-183)."""
        cache = os.path.join(self.icp_path, f'{drive}_{t0}_{t1}.npy')
        if os.path.exists(cache):
            return np.load(cache)
        pos = self._odometry(drive)[[t0, t1]]
        p0, p1 = self._to_4x4(pos[0]), self._to_4x4(pos[1])
        v2c = velo2cam_4x4()
        m = (v2c @ p0.T @ np.linalg.inv(p1.T) @ np.linalg.inv(v2c)).T
        # Refine on moderately downsampled clouds for speed.
        s0 = voxel_down_sample_np(xyz0, 0.1)
        s1 = voxel_down_sample_np(xyz1, 0.1)
        warped = s0 @ m[:3, :3].T + m[:3, 3]
        delta = icp_refine(warped, s1, np.concatenate(
            [np.eye(3), np.zeros((3, 1))], axis=1), max_dist=0.2, iters=200)
        delta44 = np.vstack([delta, [0, 0, 0, 1]])
        m2 = delta44 @ m
        np.save(cache, m2)
        return m2

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        drive, t0, t1 = self.files[idx]
        xyz0 = self._velodyne(drive, t0)
        xyz1 = self._velodyne(drive, t1)
        pose = self._gt_pose(drive, t0, t1, xyz0, xyz1)[:3].astype(np.float32)

        # Native C++ voxel downsample when built (cpp/build.sh), ~6x faster
        # than the numpy path on 120k-point scans.
        from .. import native
        down = (native.voxel_downsample_first if native.available()
                else voxel_down_sample_np)
        src = down(xyz0, self.voxel_size).astype(np.float32)
        tgt = down(xyz1, self.voxel_size).astype(np.float32)

        crop = self.cfg.get('crop_radius', 0.0)
        if crop > 0:
            src = src[np.linalg.norm(src[:, :2], axis=1) <= crop]
            tgt = tgt[np.linalg.norm(tgt[:, :2], axis=1) <= crop]
        if self.cfg.get('remove_ground', False):
            src = src[src[:, 2] > -1]
            tgt = tgt[tgt[:, 2] > -1]

        src_mask, tgt_mask, corr = compute_overlap(
            lie_np.se3_transform(pose, src), tgt, self.search_radius)

        data = {
            'src_xyz': src, 'tgt_xyz': tgt,
            'src_overlap': src_mask.astype(np.float32),
            'tgt_overlap': tgt_mask.astype(np.float32),
            'correspondences': corr,
            'pose': pose,
            'idx': idx,
        }
        if self.transforms is not None:
            rng = np.random.default_rng((self.seed, self.epoch, idx))
            data = self.transforms(data, rng)
        return data
