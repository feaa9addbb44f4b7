"""Data pipeline tests: augmentations preserve pose consistency, ModelNet
transforms produce correct overlap bookkeeping, datasets read their formats
(exercised on generated fixtures)."""
import os

import numpy as np
import pytest

from superpoints_registration_tpu.config import Config
from superpoints_registration_tpu.data import transforms as T
from superpoints_registration_tpu.data import modelnet_transforms as MT
from superpoints_registration_tpu.data.pointcloud import (
    compute_overlap, icp_refine, voxel_down_sample_np)
from superpoints_registration_tpu.ops import lie_np


def make_pair_sample(rng, n=200):
    src = rng.normal(size=(n, 3)).astype(np.float32)
    pose = np.concatenate([lie_np.sample_rotation_uniform(rng),
                           rng.normal(size=(3, 1))], axis=1).astype(np.float32)
    tgt = lie_np.se3_transform(pose, src).astype(np.float32)
    return {
        'src_xyz': src.copy(), 'tgt_xyz': tgt.copy(), 'pose': pose.copy(),
        'src_overlap': np.ones(n, np.float32),
        'tgt_overlap': np.ones(n, np.float32),
        'correspondences': np.tile(np.arange(n), (2, 1)),
    }


def alignment_residual(data):
    warped = lie_np.se3_transform(data['pose'], data['src_xyz'])
    return np.abs(warped - data['tgt_xyz']).max()


class TestPairTransforms:
    @pytest.mark.parametrize('mode', ['small', 'large'])
    def test_rigid_perturb_preserves_alignment(self, rng, mode):
        data = make_pair_sample(rng)
        out = T.RigidPerturb(mode)(data, rng)
        assert alignment_residual(out) < 1e-4

    def test_random_swap_preserves_alignment(self, rng):
        for _ in range(8):  # covers both swap outcomes
            data = make_pair_sample(rng)
            out = T.RandomSwap()(data, rng)
            assert alignment_residual(out) < 1e-4

    def test_shuffle_points_caps_and_reindexes(self, rng):
        data = make_pair_sample(rng, n=200)
        out = T.ShufflePoints(max_pts=100)(data, rng)
        assert out['src_xyz'].shape == (100, 3)
        assert out['src_overlap'].shape == (100,)
        corr = out['correspondences']
        # Each surviving correspondence must still match geometrically.
        warped = lie_np.se3_transform(out['pose'], out['src_xyz'])
        d = np.linalg.norm(warped[corr[0]] - out['tgt_xyz'][corr[1]], axis=1)
        assert d.max() < 1e-4

    def test_compose_full_pipeline(self, rng):
        data = make_pair_sample(rng)
        pipeline = T.Compose([T.RigidPerturb('small'), T.Jitter(0.001),
                              T.ShufflePoints(max_pts=150), T.RandomSwap()])
        out = pipeline(data, rng)
        corr = out['correspondences']
        warped = lie_np.se3_transform(out['pose'], out['src_xyz'][corr[0]])
        d = np.linalg.norm(warped - out['tgt_xyz'][corr[1]], axis=1)
        assert d.max() < 0.02  # jitter-limited


class TestModelNetTransforms:
    def _sample(self, rng, n=256):
        return {'points': rng.normal(size=(n, 6)).astype(np.float32), 'idx': 0}

    def test_crop_pipeline_consistency(self, rng):
        train, _ = MT.get_transforms('crop', rot_mag=45, trans_mag=0.5,
                                     num_points=128, partial_p_keep=[0.7, 0.7])
        s = train(self._sample(rng), rng)
        # transform_gt maps src onto ref: overlap correspondences must align.
        corr = s['correspondences']
        warped = lie_np.se3_transform(s['transform_gt'], s['points_src'][:, :3])
        d = np.linalg.norm(warped[corr[0]] - s['points_ref'][corr[1], :3], axis=1)
        assert d.max() < 0.25  # jitter clip 0.05 on both sides + fp
        # Overlap masks: correspondences are a subset of overlap=True points.
        assert s['src_overlap'][corr[0]].all()
        assert s['ref_overlap'][corr[1]].all()
        assert s['points_src'].shape[0] == 717  # reference 717-point quirk

    def test_clean_pipeline_exact_correspondence(self, rng):
        train, _ = MT.get_transforms('clean', rot_mag=45, trans_mag=0.5,
                                     num_points=128)
        s = train(self._sample(rng), rng)
        corr = s['correspondences']
        warped = lie_np.se3_transform(s['transform_gt'], s['points_src'][:, :3])
        d = np.linalg.norm(warped[corr[0]] - s['points_ref'][corr[1], :3], axis=1)
        assert d.max() < 1e-5

    def test_deterministic_test_pipeline(self, rng):
        _, test = MT.get_transforms('crop', num_points=128)
        s1 = test({'points': np.arange(256 * 6, dtype=np.float32).reshape(256, 6) / 100,
                   'idx': 7}, np.random.default_rng(0))
        s2 = test({'points': np.arange(256 * 6, dtype=np.float32).reshape(256, 6) / 100,
                   'idx': 7}, np.random.default_rng(12345))
        np.testing.assert_array_equal(s1['points_src'], s2['points_src'])


class TestPointcloudUtils:
    def test_compute_overlap(self, rng):
        src = rng.normal(size=(100, 3))
        tgt = np.concatenate([src[:50] + 0.001, rng.normal(size=(60, 3)) + 100])
        src_mask, tgt_mask, corr = compute_overlap(src, tgt, 0.05)
        assert src_mask[:50].all() and not src_mask[50:].any()
        assert tgt_mask[:50].all() and not tgt_mask[50:].any()
        np.testing.assert_array_equal(corr[0], np.arange(50))

    def test_voxel_down_sample(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        out = voxel_down_sample_np(pts, 0.5)
        assert len(out) < 500
        # one point per voxel
        coords = np.floor(out / 0.5).astype(np.int64)
        assert len(np.unique(coords, axis=0)) == len(out)

    def test_icp_refines_noisy_init(self, rng):
        src = rng.normal(size=(500, 3))
        gt = np.concatenate([lie_np.sample_rotation_small(rng, 0.02),
                             rng.normal(size=(3, 1)) * 0.05], axis=1)
        tgt = lie_np.se3_transform(gt, src)
        init = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
        refined = icp_refine(src, tgt, init, max_dist=0.5, iters=50)
        resid = np.abs(lie_np.se3_transform(refined, src) - tgt).max()
        assert resid < 1e-3


class TestModelNetDataset:
    def test_reads_h5_fixture(self, tmp_path, rng):
        import h5py
        # Build a tiny fake modelnet40_ply_hdf5_2048 layout.
        root = tmp_path
        classes = [f'class{i}' for i in range(4)]
        (root / 'shape_names.txt').write_text('\n'.join(classes) + '\n')
        with h5py.File(root / 'ply_data_test0.h5', 'w') as f:
            f['data'] = rng.normal(size=(8, 512, 3)).astype(np.float32)
            f['normal'] = rng.normal(size=(8, 512, 3)).astype(np.float32)
            f['label'] = np.arange(8).reshape(-1, 1) % 4
        (root / 'test_files.txt').write_text('ply_data_test0.h5\n')
        (root / 'train_files.txt').write_text('ply_data_test0.h5\n')
        catfile = root / 'cats.txt'
        catfile.write_text('class0\nclass1\n')

        from superpoints_registration_tpu.data.modelnet import ModelNetPairDataset
        cfg = Config(root=str(root), test_categoryfile=str(catfile),
                     noise_type='crop', rot_mag=45.0, trans_mag=0.5,
                     num_points=128, partial=[0.7, 0.7], overlap_radius=0.04)
        ds = ModelNetPairDataset(cfg, 'test')
        assert len(ds) == 4  # only class0/class1 samples
        d = ds[0]
        assert d['src_xyz'].shape[1] == 3
        assert d['pose'].shape == (3, 4)
        warped = lie_np.se3_transform(d['pose'],
                                      d['src_xyz'][d['correspondences'][0]])
        resid = np.linalg.norm(warped - d['tgt_xyz'][d['correspondences'][1]],
                               axis=1)
        assert np.median(resid) < 0.2


class TestSyntheticModelNet:
    def test_generator_feeds_real_pipeline(self, tmp_path, rng):
        """synthetic_modelnet writes the exact modelnet40_ply_hdf5_2048
        protocol: the real dataset loader + crop transform pipeline runs on
        it and the GT pose aligns the correspondences."""
        from superpoints_registration_tpu.data.synthetic_modelnet import (
            generate, make_shape)
        # Analytic normals are unit and shapes fit the unit sphere.
        for lab in (0, 13, 39):
            p, n = make_shape(rng, lab, 256)
            assert np.abs(np.linalg.norm(n, axis=1) - 1).max() < 1e-5
            assert np.linalg.norm(p, axis=1).max() <= 1 + 1e-6

        s = generate(str(tmp_path), n_train=12, n_test=6, seed=0,
                     n_points=512)
        assert s == {'train': 12, 'test': 6, 'classes': 40}

        from superpoints_registration_tpu.data.modelnet import (
            ModelNetPairDataset)
        cfg = Config(root=str(tmp_path),
                     train_categoryfile=str(tmp_path / 'modelnet40_half1.txt'),
                     test_categoryfile=str(tmp_path / 'modelnet40_half2.txt'),
                     noise_type='crop', rot_mag=45.0, trans_mag=0.5,
                     num_points=128, partial=[0.7, 0.7], overlap_radius=0.04)
        for phase in ('train', 'test'):
            ds = ModelNetPairDataset(cfg, phase)
            assert len(ds) >= 1
            d = ds[0]
            warped = lie_np.se3_transform(
                d['pose'], d['src_xyz'][d['correspondences'][0]])
            resid = np.linalg.norm(
                warped - d['tgt_xyz'][d['correspondences'][1]], axis=1)
            assert np.median(resid) < 0.2


class TestSyntheticKitti:
    def test_generator_feeds_real_pipeline(self, tmp_path, rng):
        """synthetic_kitti writes the exact KITTI odometry protocol: the real
        loader builds >=10 m pairs from the poses file, conjugates the cam
        odometry through the devkit calibration, ICP-refines, and the
        resulting GT aligns the generated scans."""
        from superpoints_registration_tpu.data.synthetic_kitti import generate
        from superpoints_registration_tpu.data.kitti import KittiPairDataset
        s = generate(str(tmp_path), frames_per_seq=22, seqs=[8, 9, 10],
                     seed=0, max_points=15000)
        assert s == {'sequences': 3, 'frames': 66}
        cfg = Config(root=str(tmp_path), first_subsampling_dl=0.15,
                     overlap_radius=0.45, augment_noise=0.01,
                     perturb_pose='small')
        ds = KittiPairDataset(cfg, 'test')
        assert len(ds) >= 3
        d = ds[0]
        warped = lie_np.se3_transform(d['pose'],
                                      d['src_xyz'][d['src_overlap'] > 0])
        from scipy.spatial import cKDTree
        dist, _ = cKDTree(d['tgt_xyz']).query(warped, k=1)
        # At 15k points over a 55 m range the inter-scan NN spacing alone is
        # ~0.16 m; the bound only needs to rule out misalignment (pairs are
        # >= 10 m apart, a frame off would be >= 1.3 m).
        assert np.median(dist) < 0.25
        assert (d['src_overlap'] > 0).mean() > 0.5


class TestKittiDataset:
    def test_fixture_pipeline(self, tmp_path, rng):
        # Fake KITTI odometry: one sequence with 4 scans moving +12m in x each.
        root = tmp_path
        seq = root / 'dataset' / 'sequences' / '08' / 'velodyne'
        seq.mkdir(parents=True)
        poses_dir = root / 'dataset' / 'poses'
        poses_dir.mkdir(parents=True)
        base = (rng.normal(size=(3000, 3)) * [20, 20, 2]).astype(np.float32)
        poses = []
        from superpoints_registration_tpu.data.kitti import velo2cam_4x4
        v2c = velo2cam_4x4()
        for t in range(4):
            # world = cam0 frame; scan moves along x
            shift = np.array([12.0 * t, 0, 0])
            cam_pose = np.eye(4)
            cam_pose[:3, 3] = shift
            poses.append(cam_pose[:3].reshape(-1))
            # velodyne points: world points in the velo frame of this scan
            world = base.copy()
            cam = world - shift  # into cam frame
            velo = (np.linalg.inv(v2c.T) @ np.vstack([cam.T, np.ones(len(cam))]))[:3].T
            pts = np.concatenate([velo, np.ones((len(velo), 1))], axis=1)
            pts.astype(np.float32).tofile(seq / f'{t:06d}.bin')
        np.savetxt(poses_dir / '08.txt', np.stack(poses))

        from superpoints_registration_tpu.data.kitti import KittiPairDataset
        cfg = Config(root=str(root), first_subsampling_dl=0.3,
                     overlap_radius=0.45, crop_radius=0.0, remove_ground=False,
                     augment_noise=0.01, perturb_pose='none', max_points=30000)
        ds = KittiPairDataset.__new__(KittiPairDataset)
        ds.cfg = cfg
        ds.phase = 'test'
        ds.seed = 0
        ds.epoch = 0
        ds.root = os.path.join(cfg.root, 'dataset')
        ds.icp_path = os.path.join(cfg.root, 'icp')
        os.makedirs(ds.icp_path, exist_ok=True)
        ds.voxel_size = cfg.first_subsampling_dl
        ds.search_radius = cfg.overlap_radius
        ds._odometry_cache = {}
        ds.transforms = None
        # restrict to our fake sequence
        KittiPairDataset.SEQUENCES = dict(KittiPairDataset.SEQUENCES)
        files = ds._build_pairs.__func__(ds, 'test') if False else None
        ds.files = [(8, 0, 1), (8, 1, 2)]

        d = ds[0]
        assert d['pose'].shape == (3, 4)
        # GT pose must align the downsampled clouds.
        warped = lie_np.se3_transform(d['pose'], d['src_xyz'])
        from scipy.spatial import cKDTree
        dist, _ = cKDTree(d['tgt_xyz']).query(warped, k=1)
        assert np.median(dist) < 0.5
        assert d['src_overlap'].mean() > 0.5

    def test_icp_gt_refinement_beats_raw_odometry(self, tmp_path, rng):
        """VERDICT #9: the own-ICP GT refinement must pull a drifted odometry
        pose back to the true relative pose (KITTI recall is sensitive to GT
        quality; the reference refines with Open3D ICP, kitti_pred.py:161-183).
        Built as a synthetic LiDAR-like pair with KNOWN truth + odometry error."""
        from superpoints_registration_tpu.data.kitti import (
            KittiPairDataset, velo2cam_4x4)

        # LiDAR-ish structured scene: ground plane + walls, in the src frame.
        n = 6000
        ground = np.concatenate(
            [rng.uniform(-30, 30, (n // 2, 2)),
             rng.normal(size=(n // 2, 1)) * 0.03 - 1.7], axis=1)
        walls = np.concatenate(
            [rng.uniform(-30, 30, (n // 2, 1)),
             np.sign(rng.normal(size=(n // 2, 1))) * 8
             + rng.normal(size=(n // 2, 1)) * 0.05,
             rng.uniform(-1.5, 3, (n // 2, 1))], axis=1)
        src = np.concatenate([ground, walls]).astype(np.float32)

        # True relative velo pose: 12 m forward + small yaw.
        true_rel = np.eye(4)
        yaw = 0.03
        true_rel[:3, :3] = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                                     [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
        true_rel[:3, 3] = [12.0, 0.4, 0.0]
        tgt = (src @ true_rel[:3, :3].T + true_rel[:3, 3]).astype(np.float32)

        # Odometry (cam frame) with drift: perturb the true pose by ~0.25 m
        # and ~1 degree before handing it to the refinement.
        v2c = velo2cam_4x4()
        drift = np.eye(4)
        ang = np.radians(1.0)
        drift[:3, :3] = np.array([[np.cos(ang), 0, np.sin(ang)],
                                  [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]])
        drift[:3, 3] = [0.15, -0.12, 0.15]
        noisy_rel = drift @ true_rel
        # _gt_pose computes m = (v2c @ p0^T @ inv(p1^T) @ inv(v2c))^T from cam
        # odometry rows p0, p1; build p0 = I, p1 such that m == noisy_rel.
        p0 = np.eye(4)
        # m^T = v2c p0^T inv(p1^T) inv(v2c) -> with p0 = I:
        # p1^T = inv(inv(v2c) @ m^T @ v2c) ... solve directly:
        p1_t = np.linalg.inv(np.linalg.inv(v2c) @ noisy_rel.T @ v2c)
        p1 = p1_t.T

        ds = KittiPairDataset.__new__(KittiPairDataset)
        ds.icp_path = str(tmp_path)
        ds._odometry_cache = {
            'fake': np.stack([p0[:3].reshape(-1), p1[:3].reshape(-1)])}
        ds._odometry = lambda drive: ds._odometry_cache['fake']

        refined = ds._gt_pose('fake', 0, 1, src, tgt)

        def err(m):
            dr = m[:3, :3] @ true_rel[:3, :3].T
            ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
            return ang, np.linalg.norm(m[:3, 3] - true_rel[:3, 3])

        rot_before, trans_before = err(noisy_rel)
        rot_after, trans_after = err(refined)
        assert trans_before > 0.15 and rot_before > 0.9  # drift actually injected
        assert trans_after < 0.05, (trans_before, trans_after)
        assert rot_after < 0.2, (rot_before, rot_after)
