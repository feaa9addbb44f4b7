"""Offline GT-overlap precomputation -> HDF5 masks.

Equivalent of src/data_processing/compute_overlap_3dmatch.py:27-60 and
compute_overlap_kitti.py:23-238: for every pair in a dataset, compute the
mutual overlap masks + correspondences once and store them so training skips
the per-sample KD-tree query.

Usage:
    python -m superpoints_registration_tpu.data.precompute_overlaps \
        --config <yaml> --phase train --out <file.h5>
"""
from __future__ import annotations

import argparse

import numpy as np

from ..config import load_builtin, load_config
from ..ops import lie_np
from .pointcloud import compute_overlap


def precompute(dataset, out_path: str, search_radius: float,
               compression: str | None = 'lzf'):
    """Iterate raw pairs (pre-augmentation) and store masks per pair index.

    lzf (not gzip) by default: on corpora of tens of thousands of pairs the
    gzip deflate pass costs more CPU than the KD-tree queries themselves,
    and this file is a local cache, not an artifact to ship.
    """
    import time

    import h5py
    # The 'src_overlap' fast path below trusts the dataset's own masks, which
    # is only valid when the dataset computed them fresh in __getitem__ at
    # search_radius. Two footguns guarded here: (a) a dataset that loaded an
    # existing overlapmask.h5 would hand back STALE masks and this run would
    # copy them into the new file; (b) a dataset configured with a different
    # overlap radius would hand back masks at that radius, silently ignoring
    # the search_radius argument.
    if getattr(dataset, 'pairs_data', None) is not None:
        print('precompute: disabling the dataset\'s loaded overlap cache so '
              f'masks are recomputed fresh at radius {search_radius}')
        dataset.pairs_data = None
    ds_radius = getattr(dataset, 'search_radius', None)
    if ds_radius is not None and abs(ds_radius - search_radius) > 1e-9:
        raise ValueError(
            f'search_radius={search_radius} differs from the dataset\'s own '
            f'overlap radius {ds_radius}; the masks its __getitem__ computes '
            f'would use the latter. Pass the dataset\'s radius (or build the '
            f'dataset with overlap_radius={search_radius}).')
    t0 = time.time()
    with h5py.File(out_path, 'w') as f:
        for i in range(len(dataset)):
            d = dataset[i]
            if 'src_overlap' in d:
                # datasets without a mask cache compute overlap in __getitem__
                # (threedmatch.py) — reuse it rather than paying the KD-tree
                # queries a second time here
                src_mask = np.asarray(d['src_overlap']).astype(bool)
                tgt_mask = np.asarray(d['tgt_overlap']).astype(bool)
                corr = np.asarray(d['correspondences'])
            else:
                src_mask, tgt_mask, corr = compute_overlap(
                    lie_np.se3_transform(d['pose'], d['src_xyz']),
                    d['tgt_xyz'], search_radius)
            g = f.create_group(f'pair_{i:06d}')
            g.create_dataset('src_mask', data=src_mask, compression=compression)
            g.create_dataset('tgt_mask', data=tgt_mask, compression=compression)
            g.create_dataset('src_tgt_corr', data=corr, compression=compression)
            if (i + 1) % 500 == 0:
                rate = (i + 1) / (time.time() - t0)
                eta = (len(dataset) - i - 1) / rate
                print(f'{i + 1}/{len(dataset)} pairs done '
                      f'({rate:.1f}/s, eta {eta / 60:.1f} min)', flush=True)
    print(f'wrote {out_path}')


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--config', required=True)
    p.add_argument('--phase', default='train')
    p.add_argument('--out', required=True)
    args = p.parse_args(argv)
    import pathlib
    cfg_path = pathlib.Path(args.config)
    cfg = load_config(cfg_path) if cfg_path.exists() else load_builtin(args.config)

    if cfg.dataset == '3dmatch':
        from .threedmatch import ThreeDMatchPairDataset
        ds = ThreeDMatchPairDataset(cfg, args.phase)
        ds.transforms = None  # raw pairs
        ds.pairs_data = None
    elif cfg.dataset == 'kitti':
        from .kitti import KittiPairDataset
        ds = KittiPairDataset(cfg, args.phase)
        ds.transforms = None
    else:
        raise ValueError(cfg.dataset)
    precompute(ds, args.out, cfg.get('overlap_radius', 0.0375))


if __name__ == '__main__':
    main()
