"""Pair augmentations for registration training (numpy, explicit RNG).

Functional parity: src/data_loaders/transforms.py:15-179 — RigidPerturb
(small/large), Jitter, ShufflePoints (with max-point cap and correspondence
reindexing), RandomSwap. Unlike the reference (global RNG), every transform
takes an explicit np.random.Generator so augmentation is reproducible.
"""
from __future__ import annotations

import numpy as np

from ..ops import lie_np


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, data: dict, rng: np.random.Generator) -> dict:
        for t in self.transforms:
            data = t(data, rng)
        return data


class RigidPerturb:
    """Random rigid perturbation of one side, pose recomposed accordingly.

    'small': SE3.sample_small-style perturbation centered at the cloud
    centroid; 'large': Predator-style full random rotation + [-4, 4] m
    translation (transforms.py:15-92).
    """

    def __init__(self, perturb_mode: str = 'small'):
        assert perturb_mode in ('none', 'small', 'large')
        self.mode = perturb_mode

    def __call__(self, data, rng):
        if self.mode == 'none':
            return data
        perturb = (lie_np.sample_pose_small(rng, std=0.1) if self.mode == 'small'
                   else lie_np.sample_pose_large(rng))
        perturb_source = rng.random() > 0.5

        if self.mode == 'small':
            # Center the perturbation on the centroid to avoid large induced
            # translations.
            cloud = data['src_xyz'] if perturb_source else data['tgt_xyz']
            centroid = cloud.mean(axis=0, keepdims=True).T  # (3, 1)
            center = lie_np.se3_init(None, -centroid)
            perturb = lie_np.se3_cat(lie_np.se3_cat(lie_np.se3_inv(center), perturb),
                                     center)

        if perturb_source:
            data['pose'] = lie_np.se3_cat(data['pose'], lie_np.se3_inv(perturb))
            data['src_xyz'] = lie_np.se3_transform(perturb, data['src_xyz']).astype(np.float32)
        else:
            data['pose'] = lie_np.se3_cat(perturb, data['pose'])
            data['tgt_xyz'] = lie_np.se3_transform(perturb, data['tgt_xyz']).astype(np.float32)
        data['pose'] = data['pose'].astype(np.float32)
        return data


class Jitter:
    """Gaussian position noise on both clouds (transforms.py:95-112)."""

    def __init__(self, scale: float):
        self.scale = scale

    def __call__(self, data, rng):
        for cloud in ('src_xyz', 'tgt_xyz'):
            data[cloud] = (data[cloud]
                           + rng.normal(size=data[cloud].shape) * self.scale
                           ).astype(np.float32)
        return data


class ShufflePoints:
    """Random permutation capped at max_pts, with overlap-mask and
    correspondence reindexing (transforms.py:115-159)."""

    def __init__(self, max_pts: int = 30000, shuffle: bool = True):
        self.max_pts = max_pts
        self.shuffle = shuffle

    def __call__(self, data, rng):
        n_src = data['src_xyz'].shape[0]
        n_tgt = data['tgt_xyz'].shape[0]
        if self.shuffle:
            src_idx = rng.permutation(n_src)[:self.max_pts]
            tgt_idx = rng.permutation(n_tgt)[:self.max_pts]
        else:
            src_idx = np.arange(min(n_src, self.max_pts))
            tgt_idx = np.arange(min(n_tgt, self.max_pts))

        if 'correspondences' in data:
            src_rev = np.full(n_src, -1)
            src_rev[src_idx] = np.arange(len(src_idx))
            tgt_rev = np.full(n_tgt, -1)
            tgt_rev[tgt_idx] = np.arange(len(tgt_idx))
            corr = np.stack([src_rev[data['correspondences'][0]],
                             tgt_rev[data['correspondences'][1]]])
            data['correspondences'] = corr[:, np.all(corr >= 0, axis=0)]

        data['src_xyz'] = data['src_xyz'][src_idx]
        data['src_overlap'] = data['src_overlap'][src_idx]
        data['tgt_xyz'] = data['tgt_xyz'][tgt_idx]
        data['tgt_overlap'] = data['tgt_overlap'][tgt_idx]
        return data


class RandomSwap:
    """Swap source and target (and invert the pose) with 50% chance
    (transforms.py:162-179)."""

    def __call__(self, data, rng):
        if rng.random() > 0.5:
            data['src_xyz'], data['tgt_xyz'] = data['tgt_xyz'], data['src_xyz']
            data['src_overlap'], data['tgt_overlap'] = (data['tgt_overlap'],
                                                        data['src_overlap'])
            if 'correspondences' in data:
                data['correspondences'] = np.stack([data['correspondences'][1],
                                                    data['correspondences'][0]])
            data['pose'] = lie_np.se3_inv(data['pose']).astype(np.float32)
        return data
