"""Benchmark: 3DMatch-style scene-pair registration inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): >= 50 scene-pairs/sec per v5e chip on 3DMatch
inference. Runs on whatever the default JAX backend is (the real TPU chip
under the driver).

Scene pairs are synthetic 3DMatch-like RGB-D fragments (room-scale surface
clouds, ~15k points at 2.5 cm voxel size) pushed through the full flagship
pipeline (on-device pyramid + KPConv + 6-layer cross-encoder + matching +
Kabsch/Sinkhorn) at the full 3DMatch budgets.
"""
import json
import os
import time

import jax.numpy as jnp
import numpy as np


def _voxel_downsample(pts, dl):
    coords = np.floor((pts - np.floor(pts.min(0) / dl) * dl) / dl).astype(np.int64)
    key = coords[:, 0] * (2 ** 40) + coords[:, 1] * (2 ** 20) + coords[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    out = np.zeros((len(uniq), 3))
    cnt = np.zeros(len(uniq))
    np.add.at(out, inv, pts)
    np.add.at(cnt, inv, 1)
    return (out / cnt[:, None]).astype(np.float32)


def make_scene(rng, n, extent=3.0, voxel=0.025):
    """Room-like fragment with REAL-3DMatch point density.

    Real 3DMatch fragments are TSDF-fused surfaces voxel-downsampled at
    2.5 cm — i.e. near-uniform 2.5 cm surface spacing. Sampling planar
    patches densely and voxel-downsampling at `voxel` reproduces that
    density (and hence realistic neighbor counts per pyramid level); a
    sparser cloud would understate gather/neighbor cost. Scenes over `n`
    points are cropped to the n points nearest the centroid (a spatial
    crop keeps the density honest, unlike random subsampling).
    """
    pts = []
    n_walls = 6
    patch = 1.15         # patch edge; ~16k occupied 2.5cm voxels total
    for _ in range(n_walls):
        origin = rng.uniform(-extent / 2, extent / 2, 3)
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        b = np.cross(a, rng.normal(size=3))
        b /= np.linalg.norm(b)
        uv = rng.uniform(-patch / 2, patch / 2, (8000, 2))
        pts.append(origin + uv[:, :1] * a + uv[:, 1:] * b
                   + rng.normal(size=(8000, 3)) * 0.002)
    out = _voxel_downsample(np.concatenate(pts), voxel)
    if len(out) > n:
        d = np.linalg.norm(out - out.mean(0), axis=1)
        out = out[np.argsort(d)[:n]]
    return out.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from superpoints_registration_tpu.config import load_builtin
    from superpoints_registration_tpu.models import build_model
    from superpoints_registration_tpu.ops import lie_np

    cfg = load_builtin('regtr_3dmatch')
    model = build_model('regtr.RegTR', cfg)

    n_pairs = int(os.environ.get('BENCH_PAIRS', '8'))  # throughput = pairs/sec
    budget = cfg.level_budgets[0]
    n_points = 15000     # typical 3DMatch fragment size at 2.5 cm
    rng = np.random.default_rng(0)

    batch = {'src_points': [], 'src_mask': [], 'tgt_points': [], 'tgt_mask': [],
             'pose': [], 'src_overlap': [], 'tgt_overlap': []}
    for _ in range(n_pairs):
        cloud = make_scene(rng, n_points)
        pose = np.concatenate([lie_np.sample_rotation_uniform(rng),
                               rng.uniform(-1, 1, (3, 1))], axis=1).astype(np.float32)
        tgt = lie_np.se3_transform(pose, cloud).astype(np.float32)
        for side, pts in (('src', cloud), ('tgt', tgt)):
            pad = np.zeros((budget, 3), np.float32)
            pad[:n_points] = pts
            m = np.zeros(budget, bool)
            m[:n_points] = True
            batch[f'{side}_points'].append(pad)
            batch[f'{side}_mask'].append(m)
            batch[f'{side}_overlap'].append(m.astype(np.float32))
        batch['pose'].append(pose)
    batch = {k: jnp.asarray(np.stack(v)) for k, v in batch.items()}

    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    n_iters = 10

    # Time n_iters forwards inside ONE jitted program (lax.fori_loop) and
    # fetch a scalar checksum: block_until_ready does not reliably sync
    # through the axon tunnel, and per-dispatch tunnel latency (~25 ms) would
    # pollute per-batch timing. The input is perturbed per iteration so
    # nothing folds away.
    @jax.jit
    def run(params, batch):
        def it(i, acc):
            b = dict(batch)
            b['src_points'] = b['src_points'] + i * 1e-6
            pose = model.apply(params, b, compute_loss=False)['pose']
            return acc + jnp.sum(pose)

        return jax.lax.fori_loop(0, n_iters, it, jnp.float32(0))

    float(run(params, batch))  # compile + warmup

    t0 = time.perf_counter()
    float(run(params, batch))
    dt = time.perf_counter() - t0

    pairs_per_sec = n_pairs * n_iters / dt
    baseline = 50.0
    print(json.dumps({
        'metric': '3dmatch_inference_throughput',
        'value': round(pairs_per_sec, 2),
        'unit': 'scene-pairs/sec/chip',
        'vs_baseline': round(pairs_per_sec / baseline, 3),
    }))


if __name__ == '__main__':
    main()
