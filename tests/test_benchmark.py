"""Tests for the evaluation harnesses against synthetic scenes and scipy oracles."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from superpoints_registration_tpu.benchmark import dgr, modelnet, predator, trajectory
from superpoints_registration_tpu.ops import lie_np


class TestTrajectoryIO:
    def test_roundtrip(self, tmp_path, rng):
        pairs = np.array([[0, 1, 60], [0, 3, 60], [2, 8, 60]])
        mats = np.stack([np.eye(4) for _ in range(3)])
        mats[:, :3, :3] = [lie_np.sample_rotation_uniform(rng) for _ in range(3)]
        mats[:, :3, 3] = rng.normal(size=(3, 3))
        trajectory.write_trajectory(tmp_path / 'est.log', pairs, mats)
        rpairs, rmats = trajectory.read_trajectory(tmp_path / 'est.log')
        np.testing.assert_array_equal(rpairs.astype(int), pairs)
        np.testing.assert_allclose(rmats, mats, atol=1e-10)

    def test_quaternion_matches_scipy(self, rng):
        for _ in range(20):
            r = lie_np.sample_rotation_uniform(rng)
            q = trajectory.rotation_to_quaternion(r)
            q_scipy = Rotation.from_matrix(r).as_quat()  # (x, y, z, w)
            q_scipy = np.concatenate([[q_scipy[3]], q_scipy[:3]])
            if q_scipy[0] < 0:
                q_scipy = -q_scipy
            np.testing.assert_allclose(q, q_scipy, atol=1e-8)


def make_scene(tmp_path, rng, n_frag=10, noise_pairs=(), drop_pairs=()):
    """Synthetic gt.log/gt.info + est.log; est = gt except noise_pairs get a
    large perturbation."""
    gt_dir = tmp_path / 'gt' / 'scene0'
    est_dir = tmp_path / 'est' / 'scene0'
    gt_dir.mkdir(parents=True)
    est_dir.mkdir(parents=True)
    pairs, mats, infos = [], [], []
    for i in range(n_frag):
        for j in range(i + 1, min(i + 4, n_frag)):
            pose = np.eye(4)
            pose[:3, :3] = lie_np.sample_rotation_uniform(rng)
            pose[:3, 3] = rng.normal(size=3)
            pairs.append([i, j, n_frag])
            mats.append(pose)
            infos.append(np.eye(6) * 100.0)
    pairs = np.array(pairs)
    mats = np.stack(mats)
    trajectory.write_trajectory(gt_dir / 'gt.log', pairs, mats)
    with open(gt_dir / 'gt.info', 'w') as f:
        for p, info in zip(pairs, infos):
            f.write('\t'.join(str(int(x)) for x in p) + '\n')
            for r in range(6):
                f.write('\t'.join(f'{v:.6f}' for v in info[r]) + '\n')

    est_mats = mats.copy()
    keep = np.ones(len(pairs), bool)
    for idx, (i, j, _) in enumerate(pairs):
        if (i, j) in noise_pairs:
            est_mats[idx, :3, 3] += 5.0  # gross translation error
        if (i, j) in drop_pairs:
            keep[idx] = False
    trajectory.write_trajectory(est_dir / 'est.log', pairs[keep], est_mats[keep])
    return tmp_path / 'est', tmp_path / 'gt', pairs


class TestPredatorBenchmark:
    def test_perfect_recall(self, tmp_path, rng):
        est, gt, pairs = make_scene(tmp_path, rng)
        report, recall, results = predator.benchmark(str(est), str(gt))
        assert recall == pytest.approx(1.0)
        assert results['scene0'].precision == pytest.approx(1.0)

    def test_report_uses_real_scene_names_for_small_corpora(self, tmp_path, rng):
        # The Kitchen/Home/... short names apply only to the 8-scene real
        # 3DMatch benchmark; other corpora keep their directory names.
        est, gt, _ = make_scene(tmp_path, rng)
        report, _, _ = predator.benchmark(str(est), str(gt))
        assert 'scene0' in report
        assert 'Kitchen' not in report

    def test_failures_reduce_recall(self, tmp_path, rng):
        # Perturb two non-consecutive pairs.
        est, gt, pairs = make_scene(tmp_path, rng,
                                    noise_pairs={(0, 2), (1, 3)})
        report, recall, results = predator.benchmark(str(est), str(gt))
        n_valid = results['scene0'].n_valid
        assert recall == pytest.approx((n_valid - 2) / n_valid)

    def test_consecutive_pairs_ignored(self, tmp_path, rng):
        # Perturbing a consecutive pair (i, i+1) must not change recall.
        est, gt, _ = make_scene(tmp_path, rng, noise_pairs={(4, 5)})
        _, recall, _ = predator.benchmark(str(est), str(gt))
        assert recall == pytest.approx(1.0)


class TestDGRBenchmark:
    def test_perfect(self, tmp_path, rng):
        est, gt, _ = make_scene(tmp_path, rng)
        report, success, _ = dgr.benchmark_dgr(str(est), str(gt))
        assert success == pytest.approx(1.0)

    def test_gross_errors_fail(self, tmp_path, rng):
        est, gt, pairs = make_scene(tmp_path, rng, noise_pairs={(0, 1), (0, 2)})
        report, success, _ = dgr.benchmark_dgr(str(est), str(gt))
        assert success == pytest.approx((len(pairs) - 2) / len(pairs))


class TestModelNetMetrics:
    def test_euler_matches_scipy(self, rng):
        rots = np.stack([lie_np.sample_rotation_uniform(rng) for _ in range(20)])
        got = modelnet.rotation_to_euler_xyz_deg(rots)
        expected = np.stack([Rotation.from_matrix(r).as_euler('xyz', degrees=True)
                             for r in rots])
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_identity_prediction_zero_error(self, rng):
        pose = np.concatenate([lie_np.sample_rotation_uniform(rng),
                               rng.normal(size=(3, 1))], axis=1)[None]
        raw = rng.normal(size=(1, 100, 3))
        src = raw.copy()
        ref = np.einsum('bij,bnj->bni', pose[:, :3, :3], raw) + pose[:, None, :3, 3]
        m = modelnet.compute_metrics(src, ref, ref, pose, pose)
        assert m['r_mse'][0] == pytest.approx(0.0, abs=1e-6)
        assert m['err_r_deg'][0] == pytest.approx(0.0, abs=1e-3)
        assert m['chamfer_dist'][0] == pytest.approx(0.0, abs=1e-8)
        s = modelnet.summarize_metrics(m)
        assert 'r_rmse' in s and 'err_r_deg_mean' in s

    def test_known_rotation_error(self):
        gt = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)[None]
        th = np.radians(10.0)
        rot = np.array([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        pred = np.concatenate([rot, np.zeros((3, 1))], axis=1)[None]
        pts = np.random.default_rng(0).normal(size=(1, 50, 3))
        m = modelnet.compute_metrics(pts, pts, pts, gt, pred)
        assert m['err_r_deg'][0] == pytest.approx(10.0, abs=1e-4)


class TestSyntheticCorpus:
    def test_generate_load_evaluate_roundtrip(self, tmp_path):
        """Corpus generator -> dataset loader -> gt.log/gt.info -> predator
        benchmark: feeding the GT poses as estimates must score recall 1.0."""
        import os, glob, shutil
        from superpoints_registration_tpu.data.synthetic3dmatch import generate
        from superpoints_registration_tpu.data.threedmatch import (
            ThreeDMatchPairDataset)
        from superpoints_registration_tpu.benchmark import predator
        from superpoints_registration_tpu.config import Config
        from superpoints_registration_tpu.ops import lie_np

        out = str(tmp_path / 'corpus')
        s = generate(out, train_scenes=0, val_scenes=0, test_scenes=1,
                     fragments_per_scene=5, seed=3)
        assert s['test_pairs'] >= 1

        cfg = Config(root=out, metadata_dir=os.path.join(out, 'metadata'),
                     benchmark='3DMatch', overlap_radius=0.0375, seed=0)
        ds = ThreeDMatchPairDataset(cfg, 'test')
        d = ds[0]
        # GT pose actually aligns the fragments.
        warped = lie_np.se3_transform(d['pose'],
                                      d['src_xyz'][d['src_overlap'] > 0])
        from scipy.spatial import cKDTree
        dist, _ = cKDTree(d['tgt_xyz']).query(warped, k=1)
        assert np.median(dist) < 0.04
        scene, src_id, tgt_id = ds.pair_scene_ids(0)
        assert src_id > tgt_id  # real-3DMatch convention

        scene_dir = glob.glob(os.path.join(out, 'benchmarks/3DMatch/*'))[0]
        est_root = str(tmp_path / 'est')
        os.makedirs(os.path.join(est_root, os.path.basename(scene_dir)))
        shutil.copy(os.path.join(scene_dir, 'gt.log'),
                    os.path.join(est_root, os.path.basename(scene_dir),
                                 'est.log'))
        _, recall, _ = predator.benchmark(
            est_root, os.path.join(out, 'benchmarks/3DMatch'),
            save_errors=False)
        assert recall == 1.0
