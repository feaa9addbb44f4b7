"""Simple numpy data loader: dataset -> shuffled, collated, fixed-shape batches.

Replaces torch DataLoader + DistributedSampler (src/data_loaders/__init__.py:
13-97): pure-python iteration, deterministic per-epoch shuffling, fixed-budget
collation, optional per-host sharding for multi-host training, and a
background prefetch thread.
"""
from __future__ import annotations

import numpy as np

from .collate import collate_pairs
from ..utils.prefetch import Prefetcher


class DataLoader:
    def __init__(self, dataset, batch_size: int, budget: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 num_shards: int = 1, shard_index: int = 0,
                 pad_rng: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.budget = budget
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.pad_rng = pad_rng
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def check_budget(self):
        """Verify every sample fits the level-0 budget; raise listing the
        offenders. Called up-front by eval flows that would otherwise only
        discover an over-budget cloud mid-loop (after wasting the run on the
        batches already evaluated). Uses the dataset's cheap `sample_sizes()`
        when available, else loads each sample once.
        """
        sizes = getattr(self.dataset, 'sample_sizes', None)
        if sizes is not None:
            per_sample = sizes()
        else:
            per_sample = (max(len(self.dataset[i]['src_xyz']),
                              len(self.dataset[i]['tgt_xyz']))
                          for i in range(len(self.dataset)))
        bad = [(i, n) for i, n in enumerate(per_sample) if n > self.budget]
        if bad:
            head = ', '.join(f'#{i}: {n} pts' for i, n in bad[:5])
            raise ValueError(
                f'{len(bad)} test sample(s) exceed the level-0 budget '
                f'{self.budget} ({head}{", ..." if len(bad) > 5 else ""}): '
                f'the collate would subsample what the model sees, so '
                f'host-side metric recomputation would use different points. '
                f'Raise level_budgets[0] (and recalibrate).')

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _iter_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        order = order[self.shard_index::self.num_shards]
        rng = (np.random.default_rng((self.seed, self.epoch, 1))
               if self.pad_rng else None)
        nb = len(self)
        for b in range(nb):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            if len(idx) == 0:
                return
            samples = [self.dataset[int(i)] for i in idx]
            yield collate_pairs(samples, self.budget, rng)

    def __iter__(self):
        it = self._iter_batches()
        return Prefetcher(it, self.prefetch) if self.prefetch else it


def get_dataloader(cfg, phase: str, num_shards: int = 1, shard_index: int = 0):
    """Dataset + loader factory keyed on cfg.dataset
    (src/data_loaders/__init__.py:13 equivalent)."""
    assert phase in ('train', 'val', 'test')
    batch_size = {
        'train': cfg.get('train_batch_size', 1),
        'val': cfg.get('val_batch_size', 1),
        'test': cfg.get('test_batch_size', 1),
    }[phase]
    budget = cfg.level_budgets[0]
    name = cfg.dataset

    if name == 'synthetic':
        from .synthetic import SyntheticPairDataset
        ds = SyntheticPairDataset(
            size=cfg.get('dataset_size', 512 if phase == 'train' else 64),
            n_points=cfg.get('num_points', 1024),
            partial=(cfg.get('partial', [0.7, 0.7]) or [0.7])[0],
            rot_mag_deg=cfg.get('rot_mag', 45.0),
            trans_mag=cfg.get('trans_mag', 0.5),
            noise_std=cfg.get('augment_noise', 0.005),
            overlap_radius=cfg.get('overlap_radius', 0.0375),
            seed={'train': 0, 'val': 10_000, 'test': 20_000}[phase])
    elif name == 'modelnet':
        from .modelnet import ModelNetPairDataset
        ds = ModelNetPairDataset(cfg, phase)
    elif name == '3dmatch':
        from .threedmatch import ThreeDMatchPairDataset
        ds = ThreeDMatchPairDataset(cfg, phase)
    elif name == 'kitti':
        from .kitti import KittiPairDataset
        ds = KittiPairDataset(cfg, phase)
    else:
        raise ValueError(f"unknown dataset '{name}'")

    return DataLoader(ds, batch_size, budget, shuffle=(phase == 'train'),
                      seed=cfg.get('seed', 0), num_shards=num_shards,
                      shard_index=shard_index)
