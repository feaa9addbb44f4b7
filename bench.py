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


def make_scene(rng, n, voxel=0.025):
    """Realistic 3DMatch-like fragment at real surface density.

    Uses the clutter-scene generator from the accuracy corpus
    (data/synthetic3dmatch.py make_room: planar patches + spheres/boxes/
    cylinders at 2.5 cm voxel spacing — the density of real TSDF-fused
    fragments) and takes a ~room-fragment spatial crop, so neighbor counts
    AND local geometry statistics match what the accuracy eval sees.
    Scenes over `n` points are cropped to the n points nearest a random
    center (a spatial crop keeps the density honest, unlike random
    subsampling).
    """
    from superpoints_registration_tpu.data.synthetic3dmatch import make_room
    room = make_room(rng, extent=3.0, n_patches=5, n_objects=14, voxel=voxel)
    center = room[rng.integers(len(room))]
    d = np.linalg.norm(room - center, axis=1)
    out = room[np.argsort(d)[:n]]
    return out.astype(np.float32)


def make_lidar_scene(rng, n, voxel=0.2):
    """KITTI-like LiDAR sweep: ground plane sampled with 1/r ring density +
    vertical structures (walls/poles/boxes), voxel-downsampled at the KITTI
    config's first_subsampling_dl (kiss-icp voxel_down_sample equivalent,
    reference kitti_pred.py:203-204)."""
    pts = []
    r = np.sqrt(rng.uniform(0.02, 1.0, 60000)) * 60.0   # ring-ish falloff
    ang = rng.uniform(0, 2 * np.pi, 60000)
    ground = np.stack([r * np.cos(ang), r * np.sin(ang),
                       rng.normal(0, 0.05, 60000)], 1)
    pts.append(ground)
    for _ in range(40):  # buildings/walls
        c = rng.uniform(-50, 50, 2)
        w, h = rng.uniform(2, 15), rng.uniform(2, 6)
        th = rng.uniform(0, np.pi)
        u = rng.uniform(-w / 2, w / 2, 3000)
        z = rng.uniform(0, h, 3000)
        pts.append(np.stack([c[0] + u * np.cos(th), c[1] + u * np.sin(th), z], 1))
    for _ in range(30):  # poles / cars
        c = rng.uniform(-40, 40, 2)
        pts.append(np.stack([c[0] + rng.normal(0, 0.3, 800),
                             c[1] + rng.normal(0, 0.8, 800),
                             rng.uniform(0, 2.0, 800)], 1))
    out = _voxel_downsample(np.concatenate(pts).astype(np.float64), voxel)
    if len(out) > n:
        out = out[rng.choice(len(out), n, replace=False)]
    return out.astype(np.float32)


def _bench_train(jax, jnp, cfg, model, params, batch, n_pairs, kitti):
    """Train-step throughput: n_iters optimizer steps inside one jitted
    lax.fori_loop (same dispatch-latency hygiene as the inference path)."""
    from superpoints_registration_tpu.parallel.train_step import (
        TrainState, make_train_step)
    from superpoints_registration_tpu.train.optim import make_optimizer

    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, tx)
    n_iters = 6

    @jax.jit
    def run(state, batch):
        def it(i, carry):
            st, acc = carry
            b = dict(batch)
            b['src_points'] = b['src_points'] + i * 1e-6
            st, losses = step_fn(st, b)
            return st, acc + losses['total']
        return jax.lax.fori_loop(0, n_iters, it, (state, jnp.float32(0)))

    compiled = run.lower(state, batch).compile()
    if os.environ.get('BENCH_COMPILE_ONLY'):
        print(json.dumps({'metric': 'compile_only', 'value': 1}))
        return
    out_state, _ = compiled(state, batch)
    jax.block_until_ready(out_state.step)      # warmup
    t0 = time.perf_counter()
    out_state, acc = compiled(state, batch)
    float(acc)
    dt = time.perf_counter() - t0
    steps_per_sec = n_iters / dt
    print(json.dumps({
        'metric': ('kitti_train_step_throughput' if kitti
                   else '3dmatch_train_step_throughput'),
        'value': round(steps_per_sec, 3),
        'unit': f'steps/sec/chip (batch {n_pairs})',
        'vs_baseline': None,
        'pairs_per_sec': round(steps_per_sec * n_pairs, 2),
    }))


def main():
    import jax
    import jax.numpy as jnp
    from superpoints_registration_tpu.train.cli import _enable_compile_cache
    _enable_compile_cache()
    from superpoints_registration_tpu.config import load_builtin, load_config
    from superpoints_registration_tpu.models import build_model
    from superpoints_registration_tpu.ops import lie_np

    cfg_name = os.environ.get('BENCH_CONFIG', 'regtr_3dmatch')
    cfg = (load_config(cfg_name) if os.path.exists(cfg_name)
           else load_builtin(cfg_name))
    kitti = 'kitti' in cfg_name
    # A/B knobs for the neighbor-search variants (docs/PERF.md):
    #   BENCH_SEARCH=brute|blocked|lane, BENCH_LANE_CPL=1|2,
    #   BENCH_EXACT=0|1, BENCH_RECALL=0.90..0.95
    for env, key, cast in (('BENCH_SEARCH', 'neighbor_search', str),
                           ('BENCH_LANE_CPL', 'neighbor_lane_cpl', int),
                           ('BENCH_EXACT', 'neighbor_exact',
                            lambda v: v not in ('0', 'false', '')),
                           ('BENCH_RECALL', 'neighbor_recall', float),
                           # Gather-impl A/B (xla fused take vs pallas
                           # windowed-DMA, models/kpconv.py)
                           ('BENCH_GATHER', 'gather_impl', str)):
        v = os.environ.get(env)
        if v is not None:
            cfg[key] = cast(v)
    # Tightened L0 operating point (VERDICT r4 weak-1d): the search matrix
    # scales with budget^2 and the gathers linearly, so a budget that hugs
    # the actual cloud size instead of the next power of two is free
    # throughput. BENCH_BUDGETS="15360,4608,1440" overrides per-level.
    v = os.environ.get('BENCH_BUDGETS')
    if v is not None:
        cfg['level_budgets'] = [int(x) for x in v.split(',')]
    # Neighborhood-limit (K) reduction: the KPConv gather stage is linear in
    # K (docs/PERF.md: 15M rows at XLA's per-row issue ceiling), so a
    # tighter cap than the calibrated p80 trades neighbor coverage for
    # gather time. BENCH_LIMITS="20,25,28" overrides per-level.
    v = os.environ.get('BENCH_LIMITS')
    if v is not None:
        cfg['neighborhood_limits'] = [int(x) for x in v.split(',')]
    model = build_model('regtr.RegTR', cfg)

    # throughput = pairs/sec. KITTI runs batch 1 like the reference
    # (conf/qk_regtr_full_kitti.yaml test_batch_size) unless overridden.
    n_pairs = int(os.environ.get('BENCH_PAIRS', '2' if kitti else '8'))
    budget = cfg.level_budgets[0]
    n_points = int(os.environ.get('BENCH_POINTS', '30000' if kitti else '15000'))
    n_points = min(n_points, budget)
    rng = np.random.default_rng(0)

    batch = {'src_points': [], 'src_mask': [], 'tgt_points': [], 'tgt_mask': [],
             'pose': [], 'src_overlap': [], 'tgt_overlap': []}
    for _ in range(n_pairs):
        cloud = (make_lidar_scene(rng, n_points,
                                  voxel=cfg.first_subsampling_dl)
                 if kitti else make_scene(rng, n_points))
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

    # BENCH_MODE=train: time the FULL training step (fwd + bwd + AdamW
    # update under remat) instead of inference. Reported separately; the
    # driver's headline metric stays inference.
    if os.environ.get('BENCH_MODE') == 'train':
        return _bench_train(jax, jnp, cfg, model, params, batch, n_pairs,
                            kitti)

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

    compiled = run.lower(params, batch).compile()
    if os.environ.get('BENCH_COMPILE_ONLY'):
        # Populate the persistent compilation cache without touching the
        # chip (used to pre-compile A/B variants while a training run owns
        # the device); timing a shared chip would be meaningless anyway.
        print(json.dumps({'metric': 'compile_only', 'value': 1}))
        return
    float(compiled(params, batch))  # warmup

    t0 = time.perf_counter()
    float(compiled(params, batch))
    dt = time.perf_counter() - t0

    pairs_per_sec = n_pairs * n_iters / dt

    # MFU / HBM utilization (round-3 verdict #6): XLA's own cost model for
    # the compiled program, divided by wall time and chip peaks. v5e peak:
    # 197 TFLOP/s bf16 MXU, 819 GB/s HBM. cost_analysis flops counts each
    # MAC as 2 ops regardless of precision passes, so this is a lower bound
    # on physical MXU activity.
    mfu = hbm_util = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get('flops', 0.0))
        byts = float(ca.get('bytes accessed', 0.0))
        if flops > 0:
            mfu = round(flops / dt / 197e12, 4)
        if byts > 0:
            hbm_util = round(byts / dt / 819e9, 4)
    except Exception:
        pass

    baseline = 50.0
    print(json.dumps({
        'metric': ('kitti_inference_throughput' if kitti
                   else '3dmatch_inference_throughput'),
        'value': round(pairs_per_sec, 2),
        'unit': 'scene-pairs/sec/chip',
        'vs_baseline': round(pairs_per_sec / baseline, 3),
        'mfu': mfu,
        'hbm_utilization': hbm_util,
    }))


if __name__ == '__main__':
    main()
