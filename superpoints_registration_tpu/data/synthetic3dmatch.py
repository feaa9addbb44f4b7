"""Protocol-complete synthetic 3DMatch corpus generator.

Real 3DMatch data (fragment .pth files, `src/datasets/3dmatch/*.pkl` pair
pickles, `src/datasets/3dmatch/benchmarks/*/gt.log|gt.info` trajectory files
— see /root/reference/src/data_loaders/threedmatch.py:19-107 and
/root/reference/src/benchmark/benchmark_predator.py:84-374) is not available
in this environment. This module generates a stand-in corpus that speaks the
exact same file protocol, so the ENTIRE downstream stack — dataset loader,
overlap precompute, est.log writer, Predator registration-recall benchmark —
runs unmodified against it:

  {out}/train/{scene}/cloud_bin_{i}.pth          torch float32 (N, 3) clouds
  {out}/test/{scene}/cloud_bin_{i}.pth
  {out}/metadata/{train,val}_info.pkl            {rot, trans, src, tgt, overlap}
  {out}/metadata/test_{3DMatch,3DLoMatch}_info.pkl
  {out}/benchmarks/{3DMatch,3DLoMatch}/{scene}/gt.log    Redwood trajectories
  {out}/benchmarks/{3DMatch,3DLoMatch}/{scene}/gt.info   6x6 information matrices

Scenes are cluttered rooms: planar patches (floor/walls) plus box / sphere /
cylinder objects, surface-sampled and voxel-downsampled at 2.5 cm — the
density of real TSDF-fused 3DMatch fragments. Fragments are partial views:
nearest-K spatial crops around a random-walk of view centers (consecutive
fragments overlap strongly, distant ones weakly — like sequential RGB-D
scans), each expressed in its own randomly-rotated local frame with 2 mm
sensor noise. Pairs with ground-truth voxel overlap > 0.3 form the 3DMatch
benchmark; (0.1, 0.3] forms 3DLoMatch (Predator's split criterion).

The information matrix per pair is the Redwood evaluation Jacobian
Sum_p J_p^T J_p with J_p = [I_3 | -2 skew(p)] over the target-frame overlap
points, so `benchmark/predator.py:transformation_error` (er @ info @ er /
info[0,0]) evaluates the mean squared correspondence displacement, per
http://redwood-data.org/indoor/registration.html
(/root/reference/src/benchmark/benchmark_predator.py:60-79).
"""
from __future__ import annotations

import json
import os
import pickle

import numpy as np

from ..ops import lie_np

# Split ids seed the per-scene RNG streams: regenerating any split alone
# reproduces its scenes exactly, independent of the other splits' counts.
_SPLIT_IDS = {'train': 0, 'val': 1, 'test': 2}


def _voxel_downsample(pts: np.ndarray, voxel: float) -> np.ndarray:
    """Barycenter voxel downsample (grid_subsampling.cpp:5-106 semantics)."""
    coords = np.floor((pts - pts.min(0)) / voxel).astype(np.int64)
    key = (coords[:, 0] * (2 ** 42) + coords[:, 1] * (2 ** 21) + coords[:, 2])
    uniq, inv = np.unique(key, return_inverse=True)
    out = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    np.add.at(out, inv, pts)
    np.add.at(cnt, inv, 1)
    return (out / cnt[:, None]).astype(np.float32)


def _sample_plane(rng, center, u, v, half_u, half_v, density):
    n = max(int(4 * half_u * half_v * density), 8)
    a = rng.uniform(-half_u, half_u, n)
    b = rng.uniform(-half_v, half_v, n)
    return center + a[:, None] * u + b[:, None] * v


def _sample_box(rng, center, size, yaw, density):
    sx, sy, sz = size
    rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                    [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    faces = []
    for axis, (ha, hb) in ((0, (sy, sz)), (1, (sx, sz)), (2, (sx, sy))):
        for sign in (-1.0, 1.0):
            n = max(int(4 * ha * hb * density), 4)
            ab = rng.uniform(-1, 1, (n, 2)) * [ha, hb]
            pts = np.zeros((n, 3))
            pts[:, axis] = sign * size[axis]
            pts[:, [i for i in range(3) if i != axis]] = ab
            faces.append(pts)
    return np.concatenate(faces) @ rot.T + center


def _sample_sphere(rng, center, radius, density):
    n = max(int(4 * np.pi * radius ** 2 * density), 16)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    return center + radius * d


def _sample_cylinder(rng, center, radius, height, density):
    n = max(int(2 * np.pi * radius * height * density), 16)
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-height / 2, height / 2, n)
    return center + np.stack([radius * np.cos(ang), radius * np.sin(ang), z], 1)


def make_room(rng: np.random.Generator, extent: float = 3.0,
              n_patches: int = 5, n_objects: int = 14,
              voxel: float = 0.025) -> np.ndarray:
    """One cluttered room scene as a (N, 3) float32 surface cloud.

    Floor + walls + `n_patches` tilted planar patches + `n_objects`
    box/sphere/cylinder objects, surface-sampled and voxel-downsampled at
    `voxel` — matching real TSDF-fragment surface density (2.5 cm).
    """
    density = 2.0 / voxel ** 2   # oversample ~2x; the voxel pass thins it
    half = extent / 2
    parts = []

    # Floor + two walls (axis-aligned structure every indoor scene has).
    parts.append(_sample_plane(rng, np.array([0., 0., 0.]),
                               np.array([1., 0., 0.]), np.array([0., 1., 0.]),
                               half, half, density))
    wall_h = extent * 0.4
    parts.append(_sample_plane(rng, np.array([0., -half, wall_h / 2]),
                               np.array([1., 0., 0.]), np.array([0., 0., 1.]),
                               half, wall_h / 2, density))
    parts.append(_sample_plane(rng, np.array([-half, 0., wall_h / 2]),
                               np.array([0., 1., 0.]), np.array([0., 0., 1.]),
                               half, wall_h / 2, density))

    # Tilted planar patches (tables, leaning boards).
    for _ in range(n_patches):
        c = np.array([rng.uniform(-half, half), rng.uniform(-half, half),
                      rng.uniform(0.1, 1.0)])
        normal = rng.normal(size=3)
        normal /= np.linalg.norm(normal) + 1e-12
        u = np.cross(normal, [0., 0., 1.])
        if np.linalg.norm(u) < 1e-6:
            u = np.array([1., 0., 0.])
        u /= np.linalg.norm(u)
        v = np.cross(normal, u)
        parts.append(_sample_plane(rng, c, u, v, rng.uniform(0.3, 0.9),
                                   rng.uniform(0.3, 0.9), density))

    # Clutter objects.
    for _ in range(n_objects):
        c = np.array([rng.uniform(-half, half), rng.uniform(-half, half),
                      rng.uniform(0.05, 1.2)])
        kind = rng.integers(3)
        if kind == 0:
            parts.append(_sample_box(rng, c, rng.uniform(0.08, 0.35, 3),
                                     rng.uniform(0, np.pi), density))
        elif kind == 1:
            parts.append(_sample_sphere(rng, c, rng.uniform(0.08, 0.3), density))
        else:
            parts.append(_sample_cylinder(rng, c, rng.uniform(0.05, 0.2),
                                          rng.uniform(0.2, 0.8), density))

    return _voxel_downsample(np.concatenate(parts), voxel)


def _frame_rotation(rng, frame_dist: str, tilt_deg: float) -> np.ndarray:
    """Per-fragment local-frame rotation.

    'so3_uniform' draws uniformly over SO(3): relative rotations between
    fragments then average 126 deg — a full-rotation-invariance task that is
    HARDER than the reference's actual benchmark (real 3DMatch fragments come
    from a roughly-upright handheld RGB-D camera; the v5 corpus that trained
    to 0.966 used a narrower distribution, per the round-3/4 root-cause in
    RESULTS.md). 'upright' models that geometry: free yaw about gravity plus
    a small tilt about a random horizontal axis (|angle| ~ N(0, tilt_deg)
    clipped at 2 sigma)."""
    if frame_dist == 'so3_uniform':
        return lie_np.sample_rotation_uniform(rng)
    if frame_dist != 'upright':
        raise ValueError(f"unknown frame_dist '{frame_dist}'")
    yaw = rng.uniform(0.0, 2 * np.pi)
    return _upright_rotation(rng, yaw, tilt_deg)


def _upright_rotation(rng, yaw: float, tilt_deg: float) -> np.ndarray:
    cy, sy = np.cos(yaw), np.sin(yaw)
    rz = np.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    ang = np.clip(rng.normal(0.0, np.deg2rad(tilt_deg)),
                  -2 * np.deg2rad(tilt_deg), 2 * np.deg2rad(tilt_deg))
    phi = rng.uniform(0.0, 2 * np.pi)
    axis = np.array([np.cos(phi), np.sin(phi), 0.0])   # horizontal axis
    k = np.array([[0.0, -axis[2], axis[1]],
                  [axis[2], 0.0, -axis[0]],
                  [-axis[1], axis[0], 0.0]])
    tilt = np.eye(3) + np.sin(ang) * k + (1 - np.cos(ang)) * (k @ k)
    return tilt @ rz


def _make_fragments(rng, room: np.ndarray, n_fragments: int,
                    min_points: int, max_points: int, noise: float,
                    frame_dist: str = 'so3_uniform', tilt_deg: float = 15.0):
    """Partial views of `room`: nearest-K crops around a random-walk of view
    centers. Returns (clouds local-frame, poses world->local (F,3,4),
    index sets into `room`)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(room)
    lo, hi = room.min(0), room.max(0)
    center = room[rng.integers(len(room))]

    clouds, poses, index_sets = [], [], []
    # In 'upright' mode the camera yaw random-walks WITH the view center
    # (sigma 35 deg, fresh draw on a jump), so high-overlap pairs — the ones
    # that become 3DMatch-split pairs — also have moderate relative yaw,
    # matching sequential handheld scanning; low-overlap (3DLoMatch) pairs
    # keep near-arbitrary relative yaw. All yaw draws are gated on the mode
    # so 'so3_uniform' consumes the exact rng stream of earlier corpus
    # versions (v6 stays regenerable byte-for-byte).
    upright = frame_dist == 'upright'
    yaw = rng.uniform(0.0, 2 * np.pi) if upright else 0.0
    for _ in range(n_fragments):
        # Random-walk the view center (with occasional jumps to a fresh spot):
        # consecutive fragments overlap heavily, distant ones weakly — the
        # overlap statistics of sequential RGB-D scans.
        if rng.uniform() < 0.25:
            center = room[rng.integers(len(room))]
            if upright:
                yaw = rng.uniform(0.0, 2 * np.pi)
        else:
            center = np.clip(center + rng.normal(0, 1.4, 3), lo, hi)
            if upright:
                yaw = yaw + rng.normal(0.0, np.deg2rad(35.0))
        k = min(int(rng.integers(min_points, max_points + 1)), len(room))
        _, idx = tree.query(center, k=k)
        idx = np.atleast_1d(idx)
        world_pts = room[idx]

        rot = (_upright_rotation(rng, yaw, tilt_deg)
               if frame_dist == 'upright'
               else _frame_rotation(rng, frame_dist, tilt_deg))
        centroid = world_pts.mean(0)
        trans = (-rot @ centroid[:, None]
                 + rng.normal(0, 0.05, (3, 1)))       # world -> local
        local = world_pts @ rot.T + trans.T
        local = local + rng.normal(0, noise, local.shape)
        clouds.append(local.astype(np.float32))
        poses.append(lie_np.se3_init(rot, trans))
        index_sets.append(idx)
    return clouds, poses, index_sets


def _information_matrix(points: np.ndarray) -> np.ndarray:
    """Redwood information matrix Sum_p J^T J, J = [I_3 | -2 skew(p)] over
    target-frame overlap points (benchmark_predator.py:60-79 consumes it as
    er @ info @ er / info[0,0] with er = [t_err, quat_imag])."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    n = len(points)
    jac = np.zeros((n, 3, 6))
    jac[:, 0, 0] = jac[:, 1, 1] = jac[:, 2, 2] = 1.0
    jac[:, 0, 4] = 2 * z
    jac[:, 0, 5] = -2 * y
    jac[:, 1, 3] = -2 * z
    jac[:, 1, 5] = 2 * x
    jac[:, 2, 3] = 2 * y
    jac[:, 2, 4] = -2 * x
    return np.einsum('nij,nik->jk', jac, jac)


def _write_traj(path, entries, n_fragments, dim):
    """Redwood .log/.info writer: tab-separated (read back by
    benchmark/trajectory.py which uses np.fromstring(sep='\\t'))."""
    with open(path, 'w') as f:
        for (i, j), mat in entries:
            f.write(f'{i}\t{j}\t{n_fragments}\n')
            for r in range(dim):
                f.write('\t'.join(f'{v:.12f}' for v in mat[r]) + '\n')


def _relative_pose(pose_tgt, pose_src):
    """GT pose mapping src-fragment local coords into the tgt fragment's
    local frame: T_tgt o T_src^-1 (threedmatch.py pose convention)."""
    rel = lie_np.se3_cat(pose_tgt, lie_np.se3_inv(pose_src))
    return rel.astype(np.float64)


def _empty_infos():
    return {'rot': [], 'trans': [], 'src': [], 'tgt': [], 'overlap': []}


def _append_pair(infos, rel, cloud_split, scene, src_id, tgt_id, ov):
    infos['rot'].append(rel[:3, :3].astype(np.float32))
    infos['trans'].append(rel[:3, 3:4].astype(np.float32))
    infos['src'].append(f'{cloud_split}/{scene}/cloud_bin_{src_id}.pth')
    infos['tgt'].append(f'{cloud_split}/{scene}/cloud_bin_{tgt_id}.pth')
    infos['overlap'].append(float(ov))


def _dump_infos(path, infos):
    with open(path, 'wb') as f:
        pickle.dump({k: (np.asarray(v) if k in ('rot', 'trans') else v)
                     for k, v in infos.items()}, f)


def generate(out: str, train_scenes: int = 200, val_scenes: int = 8,
             test_scenes: int = 8, fragments_per_scene: int = 8,
             seed: int = 0, extent: float = 3.0, min_points: int = 9000,
             max_points: int = 16384, noise: float = 0.002,
             overlap_hi: float = 0.30, overlap_lo: float = 0.10,
             frame_dist: str = 'so3_uniform', tilt_deg: float = 15.0) -> dict:
    """Generate the corpus. Returns a summary dict with pair counts."""
    os.makedirs(os.path.join(out, 'metadata'), exist_ok=True)
    import torch
    summary = {}
    test_infos = {'3DMatch': _empty_infos(), '3DLoMatch': _empty_infos()}

    for split, n_scenes in (('train', train_scenes), ('val', val_scenes),
                            ('test', test_scenes)):
        # val scenes live under train/ like real 3DMatch's validation data.
        cloud_split = 'train' if split in ('train', 'val') else 'test'
        infos = _empty_infos()

        for s in range(n_scenes):
            rng = np.random.default_rng((seed, _SPLIT_IDS[split], s))
            scene = (f'scene_{s:04d}' if split != 'val'
                     else f'val-scene_{s:04d}')
            room = make_room(rng, extent=extent)
            clouds, poses, index_sets = _make_fragments(
                rng, room, fragments_per_scene, min_points, max_points, noise,
                frame_dist=frame_dist, tilt_deg=tilt_deg)

            scene_dir = os.path.join(out, cloud_split, scene)
            os.makedirs(scene_dir, exist_ok=True)
            for i, cloud in enumerate(clouds):
                torch.save(torch.from_numpy(cloud),
                           os.path.join(scene_dir, f'cloud_bin_{i}.pth'))

            # Pair selection by GT voxel overlap (shared room indices).
            sets = [frozenset(ix.tolist()) for ix in index_sets]
            gt_entries = {'3DMatch': [], '3DLoMatch': []}
            for i in range(fragments_per_scene):             # i = tgt (earlier)
                for j in range(i + 1, fragments_per_scene):  # j = src (later)
                    shared = sets[i] & sets[j]
                    ov = len(shared) / min(len(sets[i]), len(sets[j]))
                    if ov <= overlap_lo:
                        continue
                    is_hi = ov > overlap_hi
                    rel = _relative_pose(poses[i], poses[j])

                    if split != 'test':
                        if is_hi:  # train/val keep >0.3 like real 3DMatch
                            _append_pair(infos, rel, cloud_split, scene,
                                         j, i, ov)
                        continue

                    if j - i <= 1:
                        # Redwood recall counts only non-consecutive pairs
                        # (benchmark_predator.py:241 semantics); keep the
                        # eval set identical to the recall denominator.
                        continue
                    bench = '3DMatch' if is_hi else '3DLoMatch'
                    _append_pair(test_infos[bench], rel, cloud_split, scene,
                                 j, i, ov)
                    rel44 = np.concatenate([rel, [[0., 0., 0., 1.]]], 0)
                    shared_idx = np.fromiter(shared, dtype=np.int64)
                    tgt_local = (room[shared_idx] @ poses[i][:3, :3].T
                                 + poses[i][:3, 3])
                    gt_entries[bench].append(
                        ((i, j), rel44, _information_matrix(tgt_local)))

            for bench, entries in gt_entries.items():
                if not entries:
                    continue
                bdir = os.path.join(out, 'benchmarks', bench, scene)
                os.makedirs(bdir, exist_ok=True)
                _write_traj(os.path.join(bdir, 'gt.log'),
                            [(p, m) for p, m, _ in entries],
                            fragments_per_scene, 4)
                _write_traj(os.path.join(bdir, 'gt.info'),
                            [(p, info) for p, _, info in entries],
                            fragments_per_scene, 6)

        # Info pickles are written even when empty so a small corpus fails
        # loudly at generation (or loads as an empty dataset) instead of a
        # later FileNotFoundError deep inside the loader.
        if split == 'test':
            if n_scenes > 0:
                for bench, binfos in test_infos.items():
                    _dump_infos(os.path.join(
                        out, 'metadata', f'test_{bench}_info.pkl'), binfos)
            summary['test_pairs_3dmatch'] = len(test_infos['3DMatch']['rot'])
            summary['test_pairs_3dlomatch'] = len(
                test_infos['3DLoMatch']['rot'])
            summary['test_pairs'] = summary['test_pairs_3dmatch']
        else:
            if n_scenes > 0:
                _dump_infos(os.path.join(out, 'metadata',
                                         f'{split}_info.pkl'), infos)
                if not infos['rot']:
                    raise RuntimeError(
                        f'{split} split produced 0 pairs from {n_scenes} '
                        f'scene(s); raise fragments_per_scene or scene count '
                        f'(every pair needs GT overlap > {overlap_hi})')
            summary[f'{split}_pairs'] = len(infos['rot'])

    return summary


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--out', required=True)
    p.add_argument('--train-scenes', type=int, default=200)
    p.add_argument('--val-scenes', type=int, default=8)
    p.add_argument('--test-scenes', type=int, default=8)
    p.add_argument('--fragments', type=int, default=8,
                   help='fragments per scene')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--extent', type=float, default=3.0)
    p.add_argument('--noise', type=float, default=0.002)
    p.add_argument('--frame-dist', default='so3_uniform',
                   choices=['so3_uniform', 'upright'],
                   help='fragment local-frame rotation distribution '
                        '(upright = free yaw + small tilt, like real '
                        'handheld RGB-D fragments)')
    p.add_argument('--tilt-deg', type=float, default=15.0)
    args = p.parse_args(argv)
    s = generate(args.out, train_scenes=args.train_scenes,
                 val_scenes=args.val_scenes, test_scenes=args.test_scenes,
                 fragments_per_scene=args.fragments, seed=args.seed,
                 extent=args.extent, noise=args.noise,
                 frame_dist=args.frame_dist, tilt_deg=args.tilt_deg)
    print(json.dumps(s))
    return s


if __name__ == '__main__':
    main()
