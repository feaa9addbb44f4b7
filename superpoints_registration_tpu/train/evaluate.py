"""Dataset-specific test evaluation: est.log writing, benchmark invocation.

Functional parity with the reference's test flow (src/models/
generic_reg_model.py:166-292, 382-403 and src/test.py):

  * 3dmatch: per-scene est.log files (header 'tgt_idx src_idx -1', 4x4 pose)
    then the Predator registration-recall benchmark against gt.log/gt.info.
  * modelnet: RPMNet metric suite + pred_transforms.npy.
  * kitti: mean RRE/RTE over successful pairs (rot < thresh, trans < thresh).
"""
from __future__ import annotations

import os

import numpy as np

from ..benchmark import modelnet as bm_modelnet
from ..benchmark import predator as bm_predator

from ..parallel.mesh import (make_mesh_for_batch, make_mesh_from_config,
                             shard_batch)
from ..parallel.train_step import make_eval_step


def run_test(cfg, model, params, loader, run_dir, logger,
             benchmark_gt_root: str | None = None) -> dict:
    """Run the test loop and the dataset-specific benchmark. Returns metrics."""
    if cfg.get('attention_impl', 'dense') == 'ring':
        mesh = make_mesh_from_config(cfg)   # (data, seq) + ring-mesh install
    else:
        mesh = make_mesh_for_batch(loader.batch_size)
    eval_step = make_eval_step(model, cfg, mesh=mesh)
    dataset = loader.dataset
    ds_name = cfg.get('dataset')

    if ds_name in ('modelnet', 'synthetic') and hasattr(loader, 'check_budget'):
        # These benchmarks recompute metrics host-side from dataset[i]; an
        # over-budget cloud would make that recomputation silently disagree
        # with what the model saw. Fail BEFORE the eval loop, not after N-1
        # evaluated batches.
        loader.check_budget()

    all_poses, all_gt, all_rot_err, all_trans_err = [], [], [], []
    sample_idx = 0
    per_sample_indices = []
    for batch in loader:
        sharded = shard_batch(batch, mesh)
        small, _, metrics = eval_step(params, sharded)
        poses = np.asarray(small['pose'])
        all_poses.append(poses)
        all_gt.append(np.asarray(batch['pose']))
        all_rot_err.append(np.asarray(metrics['rot_err_deg']))
        all_trans_err.append(np.asarray(metrics['trans_err']))
        per_sample_indices.extend(range(sample_idx, sample_idx + len(poses)))
        sample_idx += len(poses)

    poses = np.concatenate(all_poses)
    gts = np.concatenate(all_gt)
    rot_err = np.concatenate(all_rot_err)
    trans_err = np.concatenate(all_trans_err)
    results = {
        'rot_err_deg_mean': float(rot_err.mean()),
        'trans_err_mean': float(trans_err.mean()),
    }

    if ds_name == '3dmatch':
        benchmark = cfg.get('benchmark', '3DMatch')
        out_dir = os.path.join(run_dir, benchmark)
        truncated = set()  # truncate each scene's est.log once per run:
        # appending to a leftover file from a previous run would duplicate
        # entries and corrupt the recall computation.
        for i, pose in zip(per_sample_indices, poses):
            scene, src_id, tgt_id = dataset.pair_scene_ids(i)
            scene_dir = os.path.join(out_dir, scene)
            os.makedirs(scene_dir, exist_ok=True)
            est_path = os.path.join(scene_dir, 'est.log')
            mode = 'a' if est_path in truncated else 'w'
            truncated.add(est_path)
            pose44 = np.concatenate([pose, [[0., 0., 0., 1.]]], axis=0)
            with open(est_path, mode) as f:
                f.write(f'{tgt_id}\t{src_id}\t-1\n')
                for r in range(4):
                    f.write('\t'.join(f'{v:.12f}' for v in pose44[r]) + '\n')
        gt_root = benchmark_gt_root or cfg.get(
            'benchmark_gt_root', os.path.join('datasets', '3dmatch', 'benchmarks'))
        gt_dir = os.path.join(gt_root, benchmark)
        if os.path.exists(gt_dir):
            report, recall, _ = bm_predator.benchmark(out_dir, gt_dir)
            logger.info('\n%s', report)
            results['registration_recall'] = recall
            if cfg.get('dgr_protocol', False):
                # Alternative 3DMatch protocol: success = RRE < 15 deg AND
                # RTE < 0.3 m on inverse trajectories
                # (benchmark_3dmatch.py:105-176).
                from ..benchmark import dgr as bm_dgr
                dgr_report, dgr_rate, _ = bm_dgr.benchmark_dgr(out_dir, gt_dir)
                logger.info('DGR protocol:\n%s', dgr_report)
                results['dgr_success_rate'] = dgr_rate
        else:
            logger.warning('GT benchmark dir %s not found; wrote est.log only',
                           gt_dir)

    elif ds_name in ('modelnet', 'synthetic'):
        # RPMNet metric suite; Chamfer needs the raw clouds from the dataset.
        # Re-reading dataset[i] on the host is only valid because the collate
        # never subsampled — guaranteed by the up-front check_budget() above.
        metric_list = []
        for i, (pose, gt) in enumerate(zip(poses, gts)):
            sample = dataset[per_sample_indices[i]]
            raw = sample.get('points_raw', sample['tgt_xyz'])
            m = bm_modelnet.compute_metrics(
                sample['src_xyz'][None], sample['tgt_xyz'][None], raw[None],
                gt[None], pose[None])
            metric_list.append(m)
        cat = {k: np.concatenate([m[k] for m in metric_list])
               for k in metric_list[0]}
        summary = bm_modelnet.summarize_metrics(cat)
        bm_modelnet.print_metrics(logger, summary)
        np.save(os.path.join(run_dir, 'pred_transforms.npy'), poses)
        results.update(summary)

    elif ds_name == 'kitti':
        thr_r = cfg.get('reg_success_thresh_rot', 5.0)
        thr_t = cfg.get('reg_success_thresh_trans', 2.0)
        ok = (rot_err < thr_r) & (trans_err < thr_t)
        results['success_rate'] = float(ok.mean())
        results['rre_success'] = float(rot_err[ok].mean()) if ok.any() else float('nan')
        results['rte_success'] = float(trans_err[ok].mean()) if ok.any() else float('nan')
        logger.info('KITTI: success %.3f, RRE %.3f deg, RTE %.3f m',
                    results['success_rate'], results['rre_success'],
                    results['rte_success'])

    logger.info('test summary: %s',
                ' '.join(f'{k}={v:.4f}' for k, v in sorted(results.items())))
    return results
