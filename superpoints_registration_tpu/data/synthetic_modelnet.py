"""Synthetic ModelNet40-format corpus: HDF5 shards + metadata files.

Real modelnet40_ply_hdf5_2048 data (the reference auto-downloads it,
src/data_loaders/modelnet.py:124-157) is unreachable in this environment.
This generator writes a corpus that speaks the exact same file protocol —
`shape_names.txt`, `{train,test}_files.txt`, `ply_data_*.h5` shards with
(N, 2048, 3) float32 `data`, `normal` and int `label` datasets, and the
half1/half2 category-split files — so `data/modelnet.py` and the RPMNet
benchmark run unmodified against it.

Shapes are parametric surfaces with ANALYTIC normals (sphere, box,
cylinder, cone, torus — 5 families x 8 parameter buckets = 40 classes),
anisotropically scaled and normalized to the unit sphere like ModelNet
CAD models.
"""
from __future__ import annotations

import json
import os

import numpy as np

_FAMILIES = ('sphere', 'box', 'cylinder', 'cone', 'torus')


def _sample_sphere(rng, n):
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    return d, d.copy()


def _sample_box(rng, n):
    # Area-weighted face sampling of the unit box [-1, 1]^3.
    axis = rng.integers(3, size=n)
    sign = rng.choice([-1.0, 1.0], size=n)
    pts = rng.uniform(-1, 1, (n, 3))
    nrm = np.zeros((n, 3))
    pts[np.arange(n), axis] = sign
    nrm[np.arange(n), axis] = sign
    return pts, nrm


def _sample_cylinder(rng, n):
    # Side + caps, area-weighted for h = 2, r = 1.
    side = rng.uniform(size=n) < (2.0 / 3.0)
    ang = rng.uniform(0, 2 * np.pi, n)
    pts = np.zeros((n, 3))
    nrm = np.zeros((n, 3))
    c, s = np.cos(ang), np.sin(ang)
    z = rng.uniform(-1, 1, n)
    pts[side] = np.stack([c[side], s[side], z[side]], 1)
    nrm[side] = np.stack([c[side], s[side], np.zeros(side.sum())], 1)
    cap = ~side
    r = np.sqrt(rng.uniform(size=cap.sum()))
    zc = rng.choice([-1.0, 1.0], size=cap.sum())
    pts[cap] = np.stack([r * c[cap], r * s[cap], zc], 1)
    nrm[cap] = np.stack([np.zeros(cap.sum())] * 2 + [zc], 1)
    return pts, nrm


def _sample_cone(rng, n):
    # Lateral surface of a unit cone (apex (0,0,1), base r=1 at z=-1) + base.
    lat = rng.uniform(size=n) < 0.7
    ang = rng.uniform(0, 2 * np.pi, n)
    c, s = np.cos(ang), np.sin(ang)
    pts = np.zeros((n, 3))
    nrm = np.zeros((n, 3))
    t = np.sqrt(rng.uniform(size=lat.sum()))      # area-uniform along slant
    r = t
    pts[lat] = np.stack([r * c[lat], r * s[lat], 1 - 2 * t], 1)
    slant = np.stack([2 * c[lat], 2 * s[lat], np.ones(lat.sum())], 1)
    nrm[lat] = slant / np.linalg.norm(slant, axis=1, keepdims=True)
    base = ~lat
    rb = np.sqrt(rng.uniform(size=base.sum()))
    pts[base] = np.stack([rb * c[base], rb * s[base], -np.ones(base.sum())], 1)
    nrm[base] = np.tile([0., 0., -1.], (base.sum(), 1))
    return pts, nrm


def _sample_torus(rng, n, r_minor=0.35):
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    cu, su, cv, sv = np.cos(u), np.sin(u), np.cos(v), np.sin(v)
    pts = np.stack([(1 + r_minor * cv) * cu, (1 + r_minor * cv) * su,
                    r_minor * sv], 1)
    nrm = np.stack([cv * cu, cv * su, sv], 1)
    return pts, nrm


_SAMPLERS = {'sphere': _sample_sphere, 'box': _sample_box,
             'cylinder': _sample_cylinder, 'cone': _sample_cone,
             'torus': _sample_torus}


def make_shape(rng, label: int, n: int = 2048):
    """One (n, 3) cloud + unit normals for class `label` (0..39): family =
    label % 5, the parameter bucket (anisotropic scale pattern) = label // 5.
    Output normalized to the unit sphere like ModelNet CAD models."""
    family = _FAMILIES[label % len(_FAMILIES)]
    bucket = label // len(_FAMILIES)
    pts, nrm = _SAMPLERS[family](rng, n)
    # Bucket-keyed anisotropy makes the 8 buckets of one family distinct
    # classes; per-instance jitter keeps intra-class variety.
    brng = np.random.default_rng(1000 + label)
    scale = brng.uniform(0.4, 1.0, 3) * rng.uniform(0.85, 1.15, 3)
    pts = pts * scale
    nrm = nrm / np.maximum(scale, 1e-9)            # inverse-transpose
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-12
    pts = pts - pts.mean(0)
    pts = pts / (np.linalg.norm(pts, axis=1).max() + 1e-12)
    return pts.astype(np.float32), nrm.astype(np.float32)


def generate(out: str, n_train: int = 200, n_test: int = 80, seed: int = 0,
             n_points: int = 2048, shard_size: int = 2048) -> dict:
    """Write the corpus. Returns {'train': n, 'test': n, 'classes': 40}."""
    import h5py
    os.makedirs(out, exist_ok=True)
    names = [f'{_FAMILIES[i % 5]}_{i // 5:02d}' for i in range(40)]
    with open(os.path.join(out, 'shape_names.txt'), 'w') as f:
        f.write('\n'.join(names) + '\n')
    # Category split files (reference keeps them under datasets/modelnet/,
    # the config points wherever these live).
    for half, cats in (('half1', names[:20]), ('half2', names[20:])):
        with open(os.path.join(out, f'modelnet40_{half}.txt'), 'w') as f:
            f.write('\n'.join(cats) + '\n')

    counts = {}
    for subset, total in (('train', n_train), ('test', n_test)):
        rng = np.random.default_rng((seed, {'train': 0, 'test': 1}[subset]))
        files = []
        written = 0
        shard = 0
        while written < total:
            m = min(shard_size, total - written)
            data = np.zeros((m, n_points, 3), np.float32)
            normal = np.zeros((m, n_points, 3), np.float32)
            label = np.zeros((m, 1), np.int64)
            for i in range(m):
                lab = int(rng.integers(40))
                data[i], normal[i] = make_shape(rng, lab, n_points)
                label[i] = lab
            fname = f'ply_data_{subset}{shard}.h5'
            with h5py.File(os.path.join(out, fname), 'w') as f:
                f.create_dataset('data', data=data)
                f.create_dataset('normal', data=normal)
                f.create_dataset('label', data=label)
            files.append(fname)
            written += m
            shard += 1
        with open(os.path.join(out, f'{subset}_files.txt'), 'w') as f:
            f.write('\n'.join(files) + '\n')
        counts[subset] = written
    counts['classes'] = 40
    return counts


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--out', required=True)
    p.add_argument('--train', type=int, default=200)
    p.add_argument('--test', type=int, default=80)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)
    print(json.dumps(generate(args.out, args.train, args.test, args.seed)))


if __name__ == '__main__':
    main()
