"""SO3/SE3 Lie-group class API (ops/lie_groups.py) vs scipy + numeric oracles.

Covers the reference class surface (src/cvhelpers/lie/numpy/{so3,se3}.py):
constructors, exp/log (incl. near-pi branch), quaternion round-trips,
group ops, container behavior, boxplus retractions, and the A·exp(ε)·D
jacobian against finite differences.
"""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from superpoints_registration_tpu.ops.lie_groups import SE3, SO3


@pytest.fixture
def nprng():
    return np.random.default_rng(0)


class TestSO3Class:
    def test_identity_shapes(self):
        assert SO3.identity().data.shape == (3, 3)
        assert SO3.identity(5).data.shape == (5, 3, 3)
        assert len(SO3.identity(5)) == 5
        assert len(SO3.identity()) == 1  # reference liegroupbase.py:109-111

    def test_exp_log_roundtrip(self, nprng):
        omega = nprng.normal(size=(32, 3))
        # keep |omega| < pi so the principal-branch log returns omega itself
        omega *= 0.9 * np.pi / np.maximum(
            np.linalg.norm(omega, axis=-1, keepdims=True), 0.9 * np.pi)
        back = SO3.exp(omega).log()
        np.testing.assert_allclose(back, omega, atol=1e-8)

    def test_log_near_pi(self, nprng):
        # Angles within 1e-5 of pi exercise the antipodal branch.
        axis = nprng.normal(size=(16, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        omega = axis * (np.pi - 1e-5)
        back = SO3.exp(omega).log()
        # log may return the equivalent opposite branch; compare rotations.
        err = (SO3.exp(back) * SO3.exp(omega).inv()).rotation_angle()
        np.testing.assert_allclose(err, 0.0, atol=5e-5)

    def test_log_matches_scipy(self, nprng):
        mats = Rotation.random(20, random_state=3).as_matrix()
        got = SO3.from_matrix(mats).log()
        want = Rotation.from_matrix(mats).as_rotvec()
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_quaternion_roundtrip(self, nprng):
        r = SO3.sample_uniform(12, rng=nprng)
        q = r.as_quaternion()
        assert np.all(q[:, 0] >= 0)  # w >= 0 convention
        back = SO3.from_quaternion(q)
        np.testing.assert_allclose(back.data, r.data, atol=1e-10)

    def test_from_quaternion_rejects_unnormalized(self):
        with pytest.raises(ValueError):
            SO3.from_quaternion(np.array([2.0, 0, 0, 0]))
        SO3.from_quaternion(np.array([2.0, 0, 0, 0]), normalize=True)

    def test_from_matrix_check_and_normalize(self, nprng):
        bad = np.eye(3) + 0.05 * nprng.normal(size=(3, 3))
        with pytest.raises(ValueError):
            SO3.from_matrix(bad)
        fixed = SO3.from_matrix(bad, normalize=True)
        assert fixed.is_valid()

    def test_compose_inv_transform(self, nprng):
        a = SO3.sample_uniform(6, rng=nprng)
        b = SO3.sample_uniform(6, rng=nprng)
        np.testing.assert_allclose((a * a.inv()).data,
                                   np.stack([np.eye(3)] * 6), atol=1e-12)
        pts = nprng.normal(size=(6, 50, 3))
        got = (a * b).transform(pts)
        want = a.transform(b.transform(pts))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_hat_vee(self, nprng):
        v = nprng.normal(size=(7, 3))
        np.testing.assert_allclose(SO3.vee(SO3.hat(v)), v)
        h = SO3.hat(v)
        np.testing.assert_allclose(h, -np.swapaxes(h, -1, -2))

    def test_compare_and_angle(self, nprng):
        axis = np.array([0.0, 0.0, 1.0])
        r1 = SO3.exp(axis * 0.3)
        r2 = SO3.exp(axis * 0.5)
        d = r1.compare(r2)
        np.testing.assert_allclose(d['rot_deg'], np.rad2deg(0.2), atol=1e-8)

    def test_sampling_reproducible(self):
        a = SO3.sample_uniform(4, rng=np.random.default_rng(7))
        b = SO3.sample_uniform(4, rng=np.random.default_rng(7))
        np.testing.assert_array_equal(a.data, b.data)
        assert a.is_valid()
        small = SO3.sample_small(100, std=0.05,
                                 rng=np.random.default_rng(1))
        assert np.max(small.rotation_angle()) < np.pi / 4

    def test_container(self, nprng):
        r = SO3.sample_uniform(5, rng=nprng)
        sub = r[1:3]
        assert sub.shape == (2,)
        r[0] = SO3.identity()
        np.testing.assert_allclose(r.data[0], np.eye(3))
        st = SO3.stack([SO3.identity(), SO3.identity()])
        assert st.shape == (2,)
        assert np.asarray(r).shape == (5, 3, 3)
        assert r.vec().shape == (5, 9)


class TestSE3Class:
    def test_exp_log_roundtrip(self, nprng):
        xi = nprng.normal(size=(32, 6)) * 0.9
        back = SE3.exp(xi).log()
        np.testing.assert_allclose(back, xi, atol=1e-8)

    def test_exp_small_angle(self):
        xi = np.array([1e-9, 2e-9, 0, 0, 0, 1e-10])
        np.testing.assert_allclose(SE3.exp(xi).data, np.eye(3, 4), atol=1e-8)

    def test_from_matrix_accepts_4x4_and_3x4(self, nprng):
        p = SE3.sample_uniform(4, rng=nprng)
        hom = p.as_matrix()
        assert hom.shape == (4, 4, 4)
        np.testing.assert_allclose(hom[:, 3], np.tile([0, 0, 0, 1.0], (4, 1)))
        back = SE3.from_matrix(hom)
        np.testing.assert_allclose(back.data, p.data, atol=1e-12)
        back34 = SE3.from_matrix(p.data)
        np.testing.assert_allclose(back34.data, p.data)

    def test_rtvec_roundtrip(self, nprng):
        p = SE3.sample_uniform(8, rng=nprng)
        v = p.vec()
        assert v.shape == (8, 7)
        back = SE3.from_rtvec(v)
        np.testing.assert_allclose(back.data, p.data, atol=1e-10)

    def test_compose_inv_transform(self, nprng):
        a = SE3.sample_uniform(6, trans_mag=2.0, rng=nprng)
        b = SE3.sample_uniform(6, trans_mag=2.0, rng=nprng)
        ident = (a * a.inv()).data
        np.testing.assert_allclose(ident, np.stack([np.eye(3, 4)] * 6),
                                   atol=1e-12)
        pts = nprng.normal(size=(6, 40, 3))
        np.testing.assert_allclose((a * b).transform(pts),
                                   a.transform(b.transform(pts)), atol=1e-12)

    def test_hat_vee(self, nprng):
        v = nprng.normal(size=(5, 6))
        np.testing.assert_allclose(SE3.vee(SE3.hat(v)), v)
        h = SE3.hat(v)
        assert h.shape == (5, 4, 4)
        np.testing.assert_allclose(h[..., 3, :], 0.0)

    def test_boxplus(self, nprng):
        p = SE3.sample_uniform(rng=nprng)
        delta = nprng.normal(size=6) * 0.1
        left = p.boxplus_left(delta)
        np.testing.assert_allclose(left.data, (SE3.exp(delta) * p).data)
        right = p.boxplus_right(delta)
        np.testing.assert_allclose(right.data, (p * SE3.exp(delta)).data)

    def test_compare(self, nprng):
        p = SE3.sample_uniform(3, rng=nprng)
        d = p.compare(p)
        np.testing.assert_allclose(d['rot_deg'], 0.0, atol=1e-6)
        np.testing.assert_allclose(d['trans'], 0.0, atol=1e-12)

    def test_jacob_dAexpeD_de_matches_numeric(self, nprng):
        a = SE3.sample_uniform(rng=nprng)
        d = SE3.sample_uniform(rng=nprng)
        jac = SE3.jacob_dAexpeD_de(a, d, full_matrix=True)
        assert jac.shape == (12, 6)
        eps = 1e-6
        num = np.zeros((12, 6))
        for i in range(6):
            e = np.zeros(6)
            e[i] = eps
            plus = (a * SE3.exp(e) * d).data
            minus = (a * SE3.exp(-e) * d).data
            # column-major over D's columns: vec order (d_0, d_1, d_2, t).
            diff = (plus - minus) / (2 * eps)
            num[:, i] = diff.T.reshape(-1)
        np.testing.assert_allclose(jac, num, atol=1e-6)

    def test_jacob_blocks_layout(self, nprng):
        a = SE3.sample_uniform(rng=nprng)
        d = SE3.sample_uniform(rng=nprng)
        blocks = SE3.jacob_dAexpeD_de(a, d, full_matrix=False)
        assert blocks.shape == (15, 3)
        np.testing.assert_allclose(blocks[:3], a.rot.data)

    def test_rot_trans_properties(self, nprng):
        p = SE3.sample_uniform(5, rng=nprng)
        assert isinstance(p.rot, SO3)
        assert p.rot.is_valid()
        assert p.trans.shape == (5, 3)
        q, t = p.as_quat_trans()
        assert q.shape == (5, 4) and t.shape == (5, 3)
        assert p.is_valid()

    def test_sample_small_magnitude(self):
        p = SE3.sample_small(200, std=0.01, rng=np.random.default_rng(2))
        assert np.max(p.rot.rotation_angle()) < 0.2
        assert np.max(np.abs(p.trans)) < 0.2
