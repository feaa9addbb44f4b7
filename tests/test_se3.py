"""Golden-value and property tests for the SE(3) geometry core."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superpoints_registration_tpu.ops import se3, lie_np


def random_pose(rng):
    rot = lie_np.sample_rotation_uniform(rng)
    trans = rng.normal(size=(3, 1))
    return np.concatenate([rot, trans], axis=1).astype(np.float32)


class TestSE3Ops:
    def test_cat_inv_roundtrip(self, rng):
        a = jnp.asarray(random_pose(rng))
        ident = se3.se3_cat(a, se3.se3_inv(a))
        np.testing.assert_allclose(np.asarray(ident), np.asarray(se3.se3_identity()),
                                   atol=1e-5)

    def test_transform_matches_numpy(self, rng):
        pose = random_pose(rng)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        expected = lie_np.se3_transform(pose, pts)
        got = se3.se3_transform(jnp.asarray(pose), jnp.asarray(pts))
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_transform_batched(self, rng):
        poses = np.stack([random_pose(rng) for _ in range(4)])
        pts = rng.normal(size=(4, 20, 3)).astype(np.float32)
        got = se3.se3_transform(jnp.asarray(poses), jnp.asarray(pts))
        for b in range(4):
            np.testing.assert_allclose(np.asarray(got[b]),
                                       lie_np.se3_transform(poses[b], pts[b]), atol=1e-5)

    def test_compare_identity(self, rng):
        a = jnp.asarray(random_pose(rng))
        err = se3.se3_compare(a, a)
        assert float(err['rot_deg']) < 1e-2
        assert float(err['trans']) < 1e-4

    def test_compare_known_rotation(self):
        # 30 degrees about z
        th = np.radians(30.0)
        rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
                        [0, 0, 1]], dtype=np.float32)
        a = jnp.asarray(np.concatenate([rot, np.zeros((3, 1), np.float32)], axis=1))
        err = se3.se3_compare(a, se3.se3_identity())
        np.testing.assert_allclose(float(err['rot_deg']), 30.0, atol=1e-3)


class TestKabsch:
    def test_exact_recovery(self, rng):
        pose = random_pose(rng)
        a = rng.normal(size=(100, 3)).astype(np.float32)
        b = lie_np.se3_transform(pose, a)
        est = se3.compute_rigid_transform(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(est), pose, atol=1e-4)

    def test_weighted_ignores_zero_weight_outliers(self, rng):
        pose = random_pose(rng)
        a = rng.normal(size=(100, 3)).astype(np.float32)
        b = lie_np.se3_transform(pose, a)
        # Corrupt 30 correspondences but zero their weights.
        b_corrupt = b.copy()
        b_corrupt[:30] += rng.normal(size=(30, 3)) * 10
        w = np.ones(100, np.float32)
        w[:30] = 0.0
        est = se3.compute_rigid_transform(jnp.asarray(a), jnp.asarray(b_corrupt),
                                          jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(est), pose, atol=1e-4)

    def test_batched(self, rng):
        poses = np.stack([random_pose(rng) for _ in range(8)])
        a = rng.normal(size=(8, 64, 3)).astype(np.float32)
        b = np.stack([lie_np.se3_transform(poses[i], a[i]) for i in range(8)])
        est = se3.compute_rigid_transform(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(est), poses, atol=1e-4)

    def test_reflection_disambiguation(self, rng):
        # Planar points are the degenerate case where SVD may return a reflection.
        pose = random_pose(rng)
        a = rng.normal(size=(50, 3)).astype(np.float32)
        a[:, 2] = 0.0
        b = lie_np.se3_transform(pose, a)
        est = se3.compute_rigid_transform(jnp.asarray(a), jnp.asarray(b))
        det = np.linalg.det(np.asarray(est)[:3, :3])
        np.testing.assert_allclose(det, 1.0, atol=1e-4)
        np.testing.assert_allclose(lie_np.se3_transform(np.asarray(est), a), b, atol=1e-4)

    def test_all_zero_weights_returns_identity(self, rng):
        # Every correspondence padded/filtered out: must return a finite pose
        # (identity), not an arbitrary one from a 0/eps division.
        a = jnp.asarray(rng.normal(size=(4, 50, 3)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(4, 50, 3)).astype(np.float32))
        w = jnp.zeros((4, 50), jnp.float32)
        est = np.asarray(se3.compute_rigid_transform(a, b, w))
        assert np.all(np.isfinite(est))
        np.testing.assert_allclose(est, np.asarray(se3.se3_identity((4,))),
                                   atol=1e-6)

    def test_jit_and_grad(self, rng):
        a = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
        w = jnp.ones(32)

        def loss_fn(w):
            pose = se3.compute_rigid_transform(a, b, w)
            return jnp.sum(se3.transformation_residuals(a, b, pose))

        g = jax.jit(jax.grad(loss_fn))(w)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSinkhorn:
    def test_no_slack_doubly_stochastic(self, rng):
        log_alpha = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))
        out = np.exp(np.asarray(se3.sinkhorn_log(log_alpha, n_iters=30, slack=False)))
        np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-3)
        np.testing.assert_allclose(out.sum(axis=2), 1.0, atol=1e-3)

    def test_slack_rows_cols_leq_one(self, rng):
        log_alpha = jnp.asarray(rng.normal(size=(2, 12, 20)).astype(np.float32))
        out = np.exp(np.asarray(se3.sinkhorn_log(log_alpha, n_iters=10, slack=True)))
        assert np.all(out.sum(axis=1) <= 1.0 + 1e-4)
        assert np.all(out.sum(axis=2) <= 1.0 + 1e-4)

    def test_matches_reference_algorithm(self, rng):
        """Numpy re-implementation of the reference slack-Sinkhorn loop
        (se3_torch.py:166-202): pad with one zero row/col, normalize all but the
        last row then all but the last column, n_iters times."""
        log_alpha = rng.normal(size=(1, 5, 7)).astype(np.float32)
        la = np.pad(log_alpha, ((0, 0), (0, 1), (0, 1)))
        for _ in range(3):
            norm = la - np.log(np.exp(la).sum(axis=2, keepdims=True))
            la = np.concatenate([norm[:, :-1, :], la[:, -1:, :]], axis=1)
            norm = la - np.log(np.exp(la).sum(axis=1, keepdims=True))
            la = np.concatenate([norm[:, :, :-1], la[:, :, -1:]], axis=2)
        expected = la[:, :-1, :-1]
        got = np.asarray(se3.sinkhorn_log(jnp.asarray(log_alpha), n_iters=3, slack=True))
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_sinkhorn_procrustes_recovers_pose(self, rng):
        pose = random_pose(rng)
        a = rng.normal(size=(1, 40, 3)).astype(np.float32)
        b = np.stack([lie_np.se3_transform(pose, a[0])])
        # Affinity: negative squared distance between true correspondences
        dist = np.linalg.norm(b[:, None, :, :] - b[:, :, None, :], axis=-1)
        affinity = jnp.asarray(-10.0 * dist)
        est = se3.compute_rigid_transform_with_sinkhorn(
            jnp.asarray(a), jnp.asarray(b), affinity, slack=True, n_iters=5)
        err = se3.se3_compare(est, jnp.asarray(pose[None]))
        assert float(err['rot_deg'][0]) < 1.0
        assert float(err['trans'][0]) < 0.05


class TestLieNp:
    def test_exp_log_roundtrip(self, rng):
        omega = rng.normal(size=3) * 0.7
        rot = lie_np.so3_exp(omega)
        back = lie_np.so3_log(rot)
        np.testing.assert_allclose(back, omega, atol=1e-6)

    def test_sample_rotation_valid(self, rng):
        for _ in range(5):
            r = lie_np.sample_rotation_uniform(rng)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
            np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-6)

    def test_sample_pose_small_magnitude(self, rng):
        poses = [lie_np.sample_pose_small(rng, std=0.01) for _ in range(20)]
        for p in poses:
            angle = np.degrees(np.arccos(np.clip((np.trace(p[:, :3]) - 1) / 2, -1, 1)))
            assert angle < 10.0
