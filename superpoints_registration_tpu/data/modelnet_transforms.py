"""ModelNet transform pipeline (numpy, explicit RNG).

Functional parity: src/data_loaders/modelnet_transforms.py:46-440 —
SplitSourceRef, Resampler/FixedResampler, RandomJitter, RandomCrop (half-space
crop with overlap-mask + correspondence bookkeeping), RandomTransformSE3 and
its Euler variant, ShufflePoints.

Samples flow as dicts with keys points / points_src / points_ref /
points_raw / correspondences / src_overlap / ref_overlap / transform_gt.
`deterministic` samples are seeded by their index (test-time reproducibility,
SetDeterministic in the reference).
"""
from __future__ import annotations

import math

import numpy as np

from ..ops import lie_np


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        for t in self.transforms:
            if sample.get('deterministic', False):
                rng = np.random.default_rng(sample['idx'])
            sample = t(sample, rng)
        return sample


class SetDeterministic:
    def __call__(self, sample, rng):
        sample['deterministic'] = True
        return sample


class SplitSourceRef:
    """Clone the cloud into source and reference; correspondences = identity."""

    def __call__(self, sample, rng):
        sample['points_raw'] = sample.pop('points')
        sample['points_src'] = sample['points_raw'].copy()
        sample['points_ref'] = sample['points_raw'].copy()
        n = sample['points_raw'].shape[0]
        sample['correspondences'] = np.tile(np.arange(n), (2, 1))
        return sample


def _resample(points, k, rng):
    """Exactly-k resampling: no repeats when k <= N; all points appear when
    k > N (modelnet_transforms.py:116-137)."""
    n = points.shape[0]
    if k <= n:
        idx = rng.choice(n, k, replace=False)
    else:
        idx = np.concatenate([rng.permutation(n),
                              rng.choice(n, k - n, replace=True)])
    return points[idx], idx


class Resampler:
    """Resample to num points; under cropping resamples proportionally
    (with the reference's intentional 717-point quirk for 2-element crop
    proportions, modelnet_transforms.py:88-94)."""

    def __init__(self, num: int):
        self.num = num

    def __call__(self, sample, rng):
        if 'points' in sample:
            sample['points'], _ = _resample(sample['points'], self.num, rng)
            return sample

        prop = sample.get('crop_proportion', None)
        if prop is None:
            src_size = ref_size = self.num
        elif len(prop) == 1:
            src_size = math.ceil(prop[0] * self.num)
            ref_size = self.num
        else:
            # Reference keeps a hardcoded 717 here for Predator consistency.
            src_size = ref_size = 717

        src, src_idx = _resample(sample['points_src'], src_size, rng)
        ref, ref_idx = _resample(sample['points_ref'], ref_size, rng)

        src_map = np.full(sample['points_src'].shape[0], -1)
        ref_map = np.full(sample['points_ref'].shape[0], -1)
        src_map[src_idx] = np.arange(src_size)
        ref_map[ref_idx] = np.arange(ref_size)
        corr = np.stack([src_map[sample['correspondences'][0]],
                         ref_map[sample['correspondences'][1]]])
        sample['correspondences'] = corr[:, np.all(corr >= 0, axis=0)]
        sample['points_src'] = src
        sample['points_ref'] = ref
        sample['src_overlap'] = sample['src_overlap'][src_idx]
        sample['ref_overlap'] = sample['ref_overlap'][ref_idx]
        return sample


class FixedResampler(Resampler):
    """Deterministic resampling: repeats the cloud then truncates
    (modelnet_transforms.py:140-152)."""

    def __call__(self, sample, rng):
        points = sample['points']
        n = points.shape[0]
        reps = int(np.ceil(self.num / n))
        sample['points'] = np.tile(points, (reps, 1))[:self.num]
        return sample


class RandomJitter:
    """Clipped gaussian jitter on src and ref (scale 0.01, clip 0.05)."""

    def __init__(self, scale: float = 0.01, clip: float = 0.05):
        self.scale = scale
        self.clip = clip

    def __call__(self, sample, rng):
        for key in ('points_src', 'points_ref'):
            noise = np.clip(rng.normal(0.0, self.scale,
                                       (sample[key].shape[0], 3)),
                            -self.clip, self.clip)
            sample[key] = sample[key].copy()
            sample[key][:, :3] += noise.astype(sample[key].dtype)
        return sample


class RandomCrop:
    """Half-space crop of src (and ref) to ~p_keep, updating overlap masks and
    correspondences (modelnet_transforms.py:176-248)."""

    def __init__(self, p_keep=None):
        self.p_keep = np.array(p_keep if p_keep is not None else [0.7, 0.7],
                               dtype=np.float32)

    @staticmethod
    def crop(points, p_keep, rng):
        direction = lie_np.uniform_2_sphere(rng)
        centered = points[:, :3] - points[:, :3].mean(axis=0)
        dist = centered @ direction
        if p_keep == 0.5:
            mask = dist > 0
        else:
            mask = dist > np.percentile(dist, (1.0 - p_keep) * 100)
        return points[mask], mask

    def __call__(self, sample, rng):
        sample['crop_proportion'] = self.p_keep
        if np.all(self.p_keep == 1.0):
            sample['src_overlap'] = np.ones(sample['points_src'].shape[0], bool)
            sample['ref_overlap'] = np.ones(sample['points_ref'].shape[0], bool)
            return sample

        src, src_mask = self.crop(sample['points_src'], self.p_keep[0], rng)
        if len(self.p_keep) == 1:
            ref = sample['points_ref']
            ref_mask = np.ones(ref.shape[0], dtype=bool)
        else:
            # NOTE: reference crops ref with p_keep[0] as well
            # (modelnet_transforms.py:217).
            ref, ref_mask = self.crop(sample['points_ref'], self.p_keep[0], rng)

        corr = sample['correspondences']
        src_overlap = np.zeros(sample['points_src'].shape[0], dtype=bool)
        src_overlap[corr[0][ref_mask[corr[1]]]] = True
        src_overlap = src_overlap[src_mask]
        ref_overlap = np.zeros(sample['points_ref'].shape[0], dtype=bool)
        ref_overlap[corr[1][src_mask[corr[0]]]] = True
        ref_overlap = ref_overlap[ref_mask]

        src_map = np.full(sample['points_src'].shape[0], -1)
        src_map[src_mask] = np.arange(src_mask.sum())
        ref_map = np.full(sample['points_ref'].shape[0], -1)
        ref_map[ref_mask] = np.arange(ref_mask.sum())
        corr = np.stack([src_map[corr[0]], ref_map[corr[1]]])

        sample['points_src'] = src
        sample['points_ref'] = ref
        sample['correspondences'] = corr[:, np.all(corr >= 0, axis=0)]
        sample['src_overlap'] = src_overlap
        sample['ref_overlap'] = ref_overlap
        return sample


class RandomTransformSE3:
    """Random rigid transform applied to the SOURCE; transform_gt maps the
    transformed source back onto the reference
    (modelnet_transforms.py:249-312)."""

    def __init__(self, rot_mag: float = 180.0, trans_mag: float = 1.0,
                 random_mag: bool = False):
        self.rot_mag = rot_mag
        self.trans_mag = trans_mag
        self.random_mag = random_mag

    def _magnitudes(self, rng):
        if self.random_mag:
            a = rng.random()
            return a * self.rot_mag, a * self.trans_mag
        return self.rot_mag, self.trans_mag

    def generate_transform(self, rng):
        rot_mag, trans_mag = self._magnitudes(rng)
        rand_rot = lie_np.sample_rotation_uniform(rng)
        axis_angle = lie_np.so3_log(rand_rot) * (rot_mag / 180.0)
        rot = lie_np.so3_exp(axis_angle)
        trans = rng.uniform(-trans_mag, trans_mag, 3)
        return np.concatenate([rot, trans[:, None]], axis=1).astype(np.float32)

    def apply(self, points, transform):
        p = lie_np.se3_transform(transform, points[:, :3]).astype(np.float32)
        if points.shape[1] == 6:  # rotate normals too
            n = points[:, 3:6] @ transform[:3, :3].T
            p = np.concatenate([p, n.astype(np.float32)], axis=-1)
        return p, lie_np.se3_inv(transform).astype(np.float32)

    def __call__(self, sample, rng):
        transform = self.generate_transform(rng)
        if 'points' in sample:
            sample['points'], _ = self.apply(sample['points'], transform)
        else:
            src_tf, gt = self.apply(sample['points_src'], transform)
            sample['points_src'] = src_tf
            sample['transform_gt'] = gt  # applies to src to get ref
        return sample


class RandomTransformSE3_euler(RandomTransformSE3):
    """Euler-angle variant (DCP convention): R = Rx Ry Rz with each angle in
    [0, rot_mag] (modelnet_transforms.py:316-356)."""

    def generate_transform(self, rng):
        rot_mag, trans_mag = self._magnitudes(rng)
        ax, ay, az = rng.uniform(size=3) * np.pi * rot_mag / 180.0
        cx, sx = np.cos(ax), np.sin(ax)
        cy, sy = np.cos(ay), np.sin(ay)
        cz, sz = np.cos(az), np.sin(az)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        rot = rx @ ry @ rz
        trans = rng.uniform(-trans_mag, trans_mag, 3)
        return np.concatenate([rot, trans[:, None]], axis=1).astype(np.float32)


class ShufflePoints:
    """Random permutation of src/ref + correspondence reindex
    (modelnet_transforms.py:359-381)."""

    def __call__(self, sample, rng):
        src_perm = rng.permutation(sample['points_src'].shape[0])
        ref_perm = rng.permutation(sample['points_ref'].shape[0])
        src_rev = np.empty_like(src_perm)
        src_rev[src_perm] = np.arange(len(src_perm))
        ref_rev = np.empty_like(ref_perm)
        ref_rev[ref_perm] = np.arange(len(ref_perm))
        corr = np.stack([src_rev[sample['correspondences'][0]],
                         ref_rev[sample['correspondences'][1]]])
        sample['correspondences'] = corr
        sample['points_src'] = sample['points_src'][src_perm]
        sample['points_ref'] = sample['points_ref'][ref_perm]
        sample['src_overlap'] = sample['src_overlap'][src_perm]
        sample['ref_overlap'] = sample['ref_overlap'][ref_perm]
        return sample


def get_transforms(noise_type: str, rot_mag: float = 45.0,
                   trans_mag: float = 0.5, num_points: int = 1024,
                   partial_p_keep=None):
    """Train/test pipelines per noise_type (src/data_loaders/modelnet.py:50-121)."""
    partial_p_keep = partial_p_keep if partial_p_keep is not None else [0.7, 0.7]
    if noise_type == 'clean':
        train = [Resampler(num_points), SplitSourceRef(),
                 RandomTransformSE3_euler(rot_mag, trans_mag), ShufflePoints()]
        test = [SetDeterministic(), FixedResampler(num_points), SplitSourceRef(),
                RandomTransformSE3_euler(rot_mag, trans_mag), ShufflePoints()]
        # 'clean' has exact 1-1 correspondences; all points overlap.
        train.insert(2, _FullOverlap())
        test.insert(3, _FullOverlap())
    elif noise_type == 'jitter':
        train = [SplitSourceRef(), _FullOverlap(),
                 RandomTransformSE3_euler(rot_mag, trans_mag),
                 Resampler(num_points), RandomJitter(), ShufflePoints()]
        test = [SetDeterministic()] + train
    elif noise_type == 'crop':
        train = [SplitSourceRef(), RandomCrop(partial_p_keep),
                 RandomTransformSE3_euler(rot_mag, trans_mag),
                 Resampler(num_points), RandomJitter(), ShufflePoints()]
        test = [SetDeterministic()] + train
    else:
        raise NotImplementedError(noise_type)
    return Compose(train), Compose(test)


class _FullOverlap:
    """All points overlap (clean/jitter pipelines have no cropping)."""

    def __call__(self, sample, rng):
        sample['src_overlap'] = np.ones(sample['points_src'].shape[0], bool)
        sample['ref_overlap'] = np.ones(sample['points_ref'].shape[0], bool)
        return sample
