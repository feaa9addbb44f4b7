"""Synthetic KITTI-odometry-format LiDAR corpus.

Real KITTI odometry data is unreachable here; this generator writes the
exact file protocol `data/kitti.py` consumes (mirroring the reference's
reader, src/data_loaders/kitti_pred.py:45-293):

  {out}/dataset/sequences/{seq:02d}/velodyne/{frame:06d}.bin   float32 (N,4)
  {out}/dataset/poses/{seq:02d}.txt                            3x4 cam0 poses

Each sequence is a vehicle driving a curvy 2-D path through a generated
street world (ground plane with 1/r ring density + walls, poles, boxes —
the `bench.py make_lidar_scene` statistics, promoted here to a persistent
world so consecutive frames genuinely co-observe structure). Per frame the
world is cropped to the sensor's 55 m range and expressed in the velodyne
frame; the poses file stores the camera-frame odometry p_t = C @ W_t @ C^-1
(C = the devkit velo->cam calibration the loader hardcodes), so the
loader's GT construction m = C^-1 p1^-1 p0 C (kitti_pred.py:160-183
semantics) exactly maps frame-t0 velodyne points onto frame t1.
"""
from __future__ import annotations

import json
import os

import numpy as np

_SENSOR_Z = 1.73      # velodyne height above ground (KITTI setup)
_RANGE = 55.0         # crop radius per frame


def _rot_z(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.], [s, c, 0.], [0., 0., 1.]])


def make_street_world(rng: np.random.Generator, length: float,
                      half_width: float = 18.0) -> np.ndarray:
    """Street-scale world cloud along x in [−20, length+20]: ground strip +
    building walls + poles + parked boxes. Densities per make_lidar_scene."""
    lo, hi = -20.0, length + 20.0
    span = hi - lo
    pts = []
    # Ground: uniform strip (the per-frame 1/r ring falloff emerges from the
    # range crop + per-frame subsample below).
    n_g = int(span * 2 * half_width * 14)
    g = np.stack([rng.uniform(lo, hi, n_g),
                  rng.uniform(-half_width, half_width, n_g),
                  rng.normal(0, 0.02, n_g)], 1)
    pts.append(g)
    # Building walls along both sides, piecewise facades.
    x = lo
    while x < hi:
        w = rng.uniform(8, 25)
        for side in (-1.0, 1.0):
            if rng.uniform() < 0.85:
                y = side * rng.uniform(half_width * 0.55, half_width)
                h = rng.uniform(4, 12)
                n_w = int(w * h * 18)
                pts.append(np.stack([rng.uniform(x, x + w, n_w),
                                     y + rng.normal(0, 0.03, n_w),
                                     rng.uniform(0, h, n_w)], 1))
        x += w
    # Poles.
    for _ in range(int(span / 6)):
        c = np.array([rng.uniform(lo, hi),
                      rng.uniform(-half_width, half_width), 0.0])
        h = rng.uniform(2.5, 6.0)
        n_p = int(h * 60)
        ang = rng.uniform(0, 2 * np.pi, n_p)
        pts.append(np.stack([c[0] + 0.12 * np.cos(ang),
                             c[1] + 0.12 * np.sin(ang),
                             rng.uniform(0, h, n_p)], 1))
    # Parked boxes (cars/bins).
    for _ in range(int(span / 8)):
        c = np.array([rng.uniform(lo, hi),
                      rng.uniform(-half_width * 0.8, half_width * 0.8), 0.0])
        sz = rng.uniform([1.5, 0.7, 0.6], [4.5, 1.9, 1.8])
        yaw = rng.uniform(0, np.pi)
        n_b = int(sz.prod() * 140)
        cube = rng.uniform(-1, 1, (n_b, 3))
        face = rng.integers(3, size=n_b)
        cube[np.arange(n_b), face] = np.sign(cube[np.arange(n_b), face])
        pts.append((cube * sz / 2) @ _rot_z(yaw).T
                   + c + [0, 0, sz[2] / 2])
    return np.concatenate(pts).astype(np.float32)


def make_trajectory(rng: np.random.Generator, n_frames: int,
                    step: float = 1.3) -> np.ndarray:
    """(F, 4, 4) velo->world poses: a smooth curvy drive along +x with
    heading-following yaw and the sensor at z = 1.73 m."""
    yaw = 0.0
    pos = np.array([0.0, 0.0, _SENSOR_Z])
    poses = []
    for _ in range(n_frames):
        w = np.eye(4)
        w[:3, :3] = _rot_z(yaw)
        w[:3, 3] = pos
        poses.append(w)
        yaw = float(np.clip(yaw + rng.normal(0, 0.02), -0.5, 0.5))
        pos = pos + _rot_z(yaw)[:, 0] * step
    return np.stack(poses)


def generate(out: str, frames_per_seq: int = 130, seqs=range(11),
             seed: int = 0, noise: float = 0.012,
             max_points: int = 90000) -> dict:
    """Write sequences + poses for `seqs` (KITTI uses 00-10: train 0-5,
    val 6-7, test 8-10 — data/kitti.py SEQUENCES)."""
    from .kitti import velo2cam_4x4
    c_t = velo2cam_4x4()          # the loader keeps the devkit TRANSPOSE
    cam_from_velo = c_t.T         # devkit C: x_cam = C @ x_velo
    os.makedirs(os.path.join(out, 'dataset', 'poses'), exist_ok=True)

    total_frames = 0
    for seq in seqs:
        rng = np.random.default_rng((seed, int(seq)))
        length = frames_per_seq * 1.3
        world = make_street_world(rng, length)
        traj = make_trajectory(rng, frames_per_seq)

        vdir = os.path.join(out, 'dataset', 'sequences', f'{int(seq):02d}',
                            'velodyne')
        os.makedirs(vdir, exist_ok=True)
        rows = []
        for t, w in enumerate(traj):
            center = w[:3, 3]
            d = np.linalg.norm(world[:, :2] - center[None, :2], axis=1)
            vis = world[d < _RANGE]
            if len(vis) > max_points:
                vis = vis[rng.choice(len(vis), max_points, replace=False)]
            local = (vis - center) @ w[:3, :3]          # R^T (x - t)
            local = local + rng.normal(0, noise, local.shape)
            scan = np.concatenate(
                [local, np.zeros((len(local), 1))], 1).astype(np.float32)
            scan.tofile(os.path.join(vdir, f'{t:06d}.bin'))
            # Camera-frame odometry row: p_t = C @ W_t @ C^-1.
            p = cam_from_velo @ w @ np.linalg.inv(cam_from_velo)
            rows.append(p[:3].reshape(-1))
            total_frames += 1
        np.savetxt(os.path.join(out, 'dataset', 'poses',
                                f'{int(seq):02d}.txt'), np.stack(rows))
    return {'sequences': len(list(seqs)), 'frames': total_frames}


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--out', required=True)
    p.add_argument('--frames', type=int, default=130,
                   help='frames per sequence')
    p.add_argument('--seqs', type=int, nargs='*', default=list(range(11)))
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args(argv)
    print(json.dumps(generate(args.out, frames_per_seq=args.frames,
                              seqs=args.seqs, seed=args.seed)))


if __name__ == '__main__':
    main()
