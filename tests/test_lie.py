"""JAX Lie-group maps vs numpy/scipy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from superpoints_registration_tpu.ops import lie, lie_np


class TestSO3:
    def test_exp_matches_numpy(self, rng):
        omega = rng.normal(size=(10, 3)) * 1.5
        got = np.asarray(lie.so3_exp(jnp.asarray(omega, dtype=jnp.float32)))
        for i in range(10):
            np.testing.assert_allclose(got[i], lie_np.so3_exp(omega[i]), atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        omega = rng.normal(size=(8, 3)).astype(np.float32) * 0.8
        back = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(omega))))
        np.testing.assert_allclose(back, omega, atol=1e-4)

    def test_exp_near_zero(self):
        omega = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]])
        r = np.asarray(lie.so3_exp(omega))
        np.testing.assert_allclose(r, np.stack([np.eye(3)] * 2), atol=1e-6)

    def test_grad_through_exp(self, rng):
        omega = jnp.asarray(rng.normal(size=3).astype(np.float32))
        g = jax.grad(lambda o: jnp.sum(lie.so3_exp(o)))(omega)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(6, 6)).astype(np.float32) * 0.7
        pose = lie.se3_exp(jnp.asarray(xi))
        back = np.asarray(lie.se3_log(pose))
        np.testing.assert_allclose(back, xi, atol=1e-4)

    def test_exp_is_valid_pose(self, rng):
        xi = jnp.asarray(rng.normal(size=(5, 6)).astype(np.float32))
        pose = np.asarray(lie.se3_exp(xi))
        for p in pose:
            np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3),
                                       atol=1e-5)


class TestQuaternion:
    def test_matches_scipy(self, rng):
        for _ in range(20):
            r = lie_np.sample_rotation_uniform(rng)
            q = np.asarray(lie.quaternion_from_matrix(
                jnp.asarray(r, dtype=jnp.float32)))
            qs = Rotation.from_matrix(r).as_quat()  # x, y, z, w
            qs = np.concatenate([[qs[3]], qs[:3]])
            if qs[0] < 0:
                qs = -qs
            np.testing.assert_allclose(q, qs, atol=1e-5)

    def test_roundtrip(self, rng):
        r = jnp.asarray(lie_np.sample_rotation_uniform(rng), dtype=jnp.float32)
        back = lie.matrix_from_quaternion(lie.quaternion_from_matrix(r))
        np.testing.assert_allclose(np.asarray(back), np.asarray(r), atol=1e-5)


class TestSampling:
    def test_uniform_rotation_valid(self):
        rots = np.asarray(lie.sample_uniform_rotation(jax.random.PRNGKey(0),
                                                      (16,)))
        for r in rots:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(r) > 0.99

    def test_small_pose_magnitude(self):
        poses = np.asarray(lie.sample_small_pose(jax.random.PRNGKey(1), 0.01,
                                                 (32,)))
        from superpoints_registration_tpu.ops import se3
        import jax.numpy as jnp2
        errs = se3.se3_compare(jnp2.asarray(poses),
                               se3.se3_identity((32,)))
        assert float(np.asarray(errs['rot_deg']).mean()) < 5.0


class TestJacobians:
    def test_left_jacobian_matches_numeric(self, rng):
        """J_l satisfies exp(w + J_l(w) dw) ~= exp(dw_world) exp(w) to first
        order, i.e. d/d eps log(exp(eps v) exp(w)) = J_l^-1 ... verify via the
        defining series identity J_l = sum_k hat^k / (k+1)!."""
        from superpoints_registration_tpu.ops import lie
        w = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        hat = lie.so3_hat(w)
        expected = np.zeros((5, 3, 3), np.float64)
        term = np.broadcast_to(np.eye(3), (5, 3, 3)).astype(np.float64).copy()
        import math
        for k in range(12):
            expected += term / math.factorial(k + 1)
            term = term @ np.asarray(hat, np.float64)
        got = np.asarray(lie.so3_left_jacobian(w))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_inv_left_jacobian_is_inverse(self, rng):
        from superpoints_registration_tpu.ops import lie
        w = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
        prod = np.asarray(jnp.matmul(lie.so3_left_jacobian(w),
                                     lie.so3_inv_left_jacobian(w)))
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), (7, 3, 3)),
                                   atol=1e-5)

    def test_near_zero_stable(self):
        from superpoints_registration_tpu.ops import lie
        w = jnp.zeros((2, 3), jnp.float32).at[1].set(1e-7)
        j = np.asarray(lie.so3_left_jacobian(w))
        ji = np.asarray(lie.so3_inv_left_jacobian(w))
        assert np.all(np.isfinite(j)) and np.all(np.isfinite(ji))
        np.testing.assert_allclose(j[0], np.eye(3), atol=1e-6)
