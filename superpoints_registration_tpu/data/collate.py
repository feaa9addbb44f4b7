"""Collation: ragged pair samples -> fixed-budget padded device batches.

Replaces the reference's list-of-ragged-tensors collate
(src/data_loaders/collate_functions.py:4-23) with static padding so the whole
batch enters one jit. Oversized clouds are randomly subsampled to the budget
(the reference caps at 30k via ShufflePoints, src/data_loaders/transforms.py:118).
"""
from __future__ import annotations

import numpy as np


def pad_points(pts: np.ndarray, budget: int, rng: np.random.Generator | None,
               extras: list | None = None):
    """Pad (or subsample) one cloud to `budget` rows.

    extras: optional list of per-point arrays to subsample/pad in sync.
    Returns (padded_pts, mask, padded_extras).
    """
    n = len(pts)
    extras = extras or []
    if n > budget:
        if rng is None:
            sel = np.arange(budget)
        else:
            sel = rng.choice(n, budget, replace=False)
        pts = pts[sel]
        extras = [e[sel] for e in extras]
        n = budget
    out = np.zeros((budget,) + pts.shape[1:], pts.dtype)
    out[:n] = pts
    mask = np.zeros(budget, bool)
    mask[:n] = True
    padded_extras = []
    for e in extras:
        pe = np.zeros((budget,) + e.shape[1:], e.dtype)
        pe[:n] = e
        padded_extras.append(pe)
    return out, mask, padded_extras


def collate_pairs(samples: list, budget: int,
                  rng: np.random.Generator | None = None) -> dict:
    """Stack pair samples into a fixed-shape batch dict.

    Input samples: dicts with src_xyz, tgt_xyz, pose, src_overlap, tgt_overlap.
    Output: src_points (P,S,3), src_mask (P,S), src_overlap (P,S), tgt_* alike,
    pose (P,3,4).
    """
    out = {'src_points': [], 'src_mask': [], 'src_overlap': [],
           'tgt_points': [], 'tgt_mask': [], 'tgt_overlap': [], 'pose': []}
    for s in samples:
        sp, sm, (sov,) = pad_points(s['src_xyz'], budget, rng, [s['src_overlap']])
        tp, tm, (tov,) = pad_points(s['tgt_xyz'], budget, rng, [s['tgt_overlap']])
        out['src_points'].append(sp)
        out['src_mask'].append(sm)
        out['src_overlap'].append(sov)
        out['tgt_points'].append(tp)
        out['tgt_mask'].append(tm)
        out['tgt_overlap'].append(tov)
        out['pose'].append(s['pose'])
    return {k: np.stack(v) for k, v in out.items()}
