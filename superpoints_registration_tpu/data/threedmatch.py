"""3DMatch / 3DLoMatch indoor RGB-D fragment pairs.

Functional parity: src/data_loaders/threedmatch.py:19-107 — pair metadata from
{phase}_info.pkl pickles, .pth point clouds (loaded via torch-cpu), GT overlap
masks from a precomputed *-overlapmask.h5 else computed on the fly, train-time
augmentations (RigidPerturb / Jitter / ShufflePoints / RandomSwap as built by
src/data_loaders/__init__.py:24-40).
"""
from __future__ import annotations

import logging
import os
import pickle

import numpy as np

from ..ops import lie_np
from .pointcloud import compute_overlap
from .transforms import Compose, Jitter, RandomSwap, RigidPerturb, ShufflePoints

_logger = logging.getLogger(__name__)


def default_train_transforms(cfg):
    """Augmentation pipeline for 3DMatch/KITTI-style pair datasets
    (data_loaders/__init__.py:24-40)."""
    return Compose([
        RigidPerturb(perturb_mode=cfg.get('perturb_pose', 'small')),
        Jitter(scale=cfg.get('augment_noise', 0.005)),
        ShufflePoints(max_pts=cfg.get('max_points', 30000)),
        RandomSwap(),
    ])


class ThreeDMatchPairDataset:
    def __init__(self, cfg, phase: str, metadata_dir: str | None = None):
        assert phase in ('train', 'val', 'test')
        self.cfg = cfg
        self.phase = phase
        self.seed = cfg.get('seed', 0)
        self.epoch = 0

        metadata_dir = metadata_dir or cfg.get('metadata_dir', 'datasets/3dmatch')
        if phase in ('train', 'val'):
            info_fname = os.path.join(metadata_dir, f'{phase}_info.pkl')
            pairs_fname = f'{phase}_pairs-overlapmask.h5'
        else:
            benchmark = cfg.get('benchmark', '3DMatch')
            info_fname = os.path.join(metadata_dir, f'{phase}_{benchmark}_info.pkl')
            pairs_fname = f'{phase}_{benchmark}_pairs-overlapmask.h5'

        with open(info_fname, 'rb') as f:
            self.infos = pickle.load(f)

        roots = cfg.root if isinstance(cfg.root, (list, tuple)) else [cfg.root]
        self.base_dir = next((r for r in roots if os.path.exists(f'{r}/train')
                              or os.path.exists(f'{r}/test')), None)
        if self.base_dir is None:
            raise FileNotFoundError(f'3DMatch data not found in {cfg.root}')

        pairs_path = os.path.join(self.base_dir, pairs_fname)
        if os.path.exists(pairs_path):
            import h5py
            self.pairs_data = h5py.File(pairs_path, 'r')
        else:
            _logger.warning('Overlap masks not precomputed; computing on the '
                            'fly (run data.precompute_overlaps to speed up)')
            self.pairs_data = None

        self.search_radius = cfg.get('overlap_radius', 0.0375)
        self.transforms = (default_train_transforms(cfg)
                           if phase == 'train' else None)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.infos['rot'])

    def _load_cloud(self, rel_path: str) -> np.ndarray:
        import torch
        pts = torch.load(os.path.join(self.base_dir, rel_path),
                         map_location='cpu', weights_only=False)
        if hasattr(pts, 'numpy'):
            pts = pts.numpy()
        return np.asarray(pts, dtype=np.float32)

    def __getitem__(self, item: int) -> dict:
        pose = lie_np.se3_init(self.infos['rot'][item],
                               self.infos['trans'][item])  # src -> tgt
        src_xyz = self._load_cloud(self.infos['src'][item])
        tgt_xyz = self._load_cloud(self.infos['tgt'][item])

        if self.pairs_data is None:
            src_mask, tgt_mask, corr = compute_overlap(
                lie_np.se3_transform(pose, src_xyz), tgt_xyz, self.search_radius)
        else:
            g = self.pairs_data[f'pair_{item:06d}']
            src_mask = np.asarray(g['src_mask'])
            tgt_mask = np.asarray(g['tgt_mask'])
            corr = np.asarray(g['src_tgt_corr'])

        data = {
            'src_xyz': src_xyz,
            'tgt_xyz': tgt_xyz,
            'src_overlap': src_mask.astype(np.float32),
            'tgt_overlap': tgt_mask.astype(np.float32),
            'correspondences': corr,
            'pose': pose.astype(np.float32),
            'idx': item,
            'overlap_p': self.infos['overlap'][item],
        }
        if self.transforms is not None:
            rng = np.random.default_rng((self.seed, self.epoch, item))
            data = self.transforms(data, rng)
        return data

    def pair_scene_ids(self, item: int):
        """(scene_name, src_fragment_id, tgt_fragment_id) for est.log writing
        (generic_reg_model.py:382-403)."""
        src = self.infos['src'][item]
        parts = src.split(os.sep) if os.sep in src else src.split('/')
        scene = parts[1]
        src_id = int(parts[-1].split('_')[-1].replace('.pth', ''))
        tgt = self.infos['tgt'][item]
        tgt_id = int(tgt.split('/')[-1].split('_')[-1].replace('.pth', ''))
        return scene, src_id, tgt_id
