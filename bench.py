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
import time

import numpy as np


def make_scene(rng, n, extent=3.0):
    """Room-like fragment: points on several planar patches + clutter."""
    pts = []
    n_walls = 6
    for _ in range(n_walls):
        origin = rng.uniform(-extent / 2, extent / 2, 3)
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        b = np.cross(a, rng.normal(size=3))
        b /= np.linalg.norm(b)
        uv = rng.uniform(-extent / 2, extent / 2, (n // n_walls, 2))
        pts.append(origin + uv[:, :1] * a + uv[:, 1:] * b
                   + rng.normal(size=(n // n_walls, 3)) * 0.004)
    out = np.concatenate(pts)[:n]
    return out.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from superpoints_registration_tpu.config import load_builtin
    from superpoints_registration_tpu.models import build_model
    from superpoints_registration_tpu.ops import lie_np

    cfg = load_builtin('regtr_3dmatch')
    model = build_model('regtr.RegTR', cfg)

    n_pairs = 8          # batched inference; throughput = pairs/sec
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
    fwd = jax.jit(lambda p, b: model.apply(p, b, compute_loss=False)['pose'])

    # Warmup / compile. NOTE: block_until_ready does not reliably sync through
    # the axon tunnel; a host fetch of the (tiny) pose output does, and since
    # the device executes programs in order, fetching iteration N's output
    # bounds the wall time of all N iterations.
    np.asarray(fwd(params, batch))

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        pose = fwd(params, batch)
    np.asarray(pose)
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
