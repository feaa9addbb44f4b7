"""ModelNet40 HDF5 pairwise-registration dataset.

Functional parity: src/data_loaders/modelnet.py:124-250 — reads the
modelnet40_ply_hdf5_2048 shards, filters by category split files
(half1/half2), applies the noise_type transform pipeline, and emits
src/tgt/pose/overlap samples in the common pair format. Also keeps
points_raw for the ModelNet Chamfer metric.
"""
from __future__ import annotations

import os

import numpy as np

from .modelnet_transforms import get_transforms

_DOWNLOAD_URL = 'https://shapenet.cs.stanford.edu/media/modelnet40_ply_hdf5_2048.zip'


class ModelNetPairDataset:
    def __init__(self, cfg, phase: str):
        assert phase in ('train', 'val', 'test')
        self.cfg = cfg
        self.phase = phase
        self.seed = cfg.get('seed', 0)
        self.epoch = 0

        subset = 'train' if phase == 'train' else 'test'
        catfile = cfg.get(f'{phase}_categoryfile', None)
        categories = None
        if catfile:
            with open(catfile) as f:
                categories = sorted(ln.rstrip('\n') for ln in f if ln.strip())

        root = cfg.root
        if not os.path.exists(os.path.join(root, 'shape_names.txt')):
            raise FileNotFoundError(
                f'ModelNet40 HDF5 data not found at {root}. Download '
                f'{_DOWNLOAD_URL} and extract it there (this environment has '
                'no network egress; the reference auto-downloads).')

        with open(os.path.join(root, 'shape_names.txt')) as f:
            self.classes = [ln.rstrip('\n') for ln in f]
        cat_ids = ([self.classes.index(c) for c in categories]
                   if categories else None)

        with open(os.path.join(root, f'{subset}_files.txt')) as f:
            h5_files = [os.path.join(root, os.path.basename(ln.strip()))
                        for ln in f if ln.strip()]
        self.points, self.labels = self._read_h5(h5_files, cat_ids)

        train_t, test_t = get_transforms(
            cfg.get('noise_type', 'crop'), cfg.get('rot_mag', 45.0),
            cfg.get('trans_mag', 0.5), cfg.get('num_points', 1024),
            cfg.get('partial', [0.7, 0.7]))
        self.transform = train_t if phase == 'train' else test_t

    @staticmethod
    def _read_h5(fnames, cat_ids):
        import h5py
        pts, labels = [], []
        for fname in fnames:
            with h5py.File(fname, 'r') as f:
                data = np.concatenate(
                    [f['data'][:], f['normal'][:]], axis=-1).astype(np.float32)
                lab = f['label'][:].flatten().astype(np.int64)
            if cat_ids is not None:
                keep = np.isin(lab, cat_ids)
                data, lab = data[keep], lab[keep]
            pts.append(data)
            labels.append(lab)
        return np.concatenate(pts), np.concatenate(labels)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.points)

    def __getitem__(self, item: int) -> dict:
        rng = np.random.default_rng((self.seed, self.epoch, item))
        sample = {'points': self.points[item].copy(), 'idx': item,
                  'label': self.labels[item]}
        sample = self.transform(sample, rng)
        return {
            'src_xyz': sample['points_src'][:, :3].astype(np.float32),
            'tgt_xyz': sample['points_ref'][:, :3].astype(np.float32),
            'src_overlap': sample['src_overlap'].astype(np.float32),
            'tgt_overlap': sample['ref_overlap'].astype(np.float32),
            'correspondences': sample['correspondences'],
            'pose': sample['transform_gt'].astype(np.float32),
            'points_raw': sample['points_raw'][:, :3].astype(np.float32),
            'idx': item,
        }
