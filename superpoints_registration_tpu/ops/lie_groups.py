"""Batched SO(3)/SE(3) Lie-group classes (numpy, CPU-side).

Class-API parity with the reference's Lie library
(src/cvhelpers/lie/numpy/{liegroupbase,so3,se3}.py, ~1.9k LoC incl. the
torch mirrors): identity / sampling / from_matrix / from_quaternion /
from_rtvec constructors, exp/log maps, hat/vee, boxplus_left/right,
inv / composition / transform, compare, quaternion conversions, the
A·exp(ε)·D jacobian (se3.py:185-230), validity checks, and
stack/index/len container behavior.

Design differences from the reference (deliberate, documented):
  - Storage is (..., 3, 4) poses / (..., 3, 3) rotations — the framework-wide
    convention shared with ops/se3.py and ops/lie_np.py — not 4×4. `as_matrix`
    still returns homogeneous 4×4 like the reference.
  - Randomness takes an explicit `numpy.random.Generator` (the framework's
    explicit-RNG idiom) instead of mutating global state.
  - Everything is batched ((...,) leading dims) with no python loops; the
    on-device jit/vmap-friendly functional twin lives in ops/lie.py.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from . import lie_np

_EPS = 1e-12


def _so3_log_batched(rot: np.ndarray) -> np.ndarray:
    """(..., 3, 3) -> (..., 3) principal-branch rotation vector, vectorized."""
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos = np.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = np.arccos(cos)
    vee = 0.5 * np.stack([rot[..., 2, 1] - rot[..., 1, 2],
                          rot[..., 0, 2] - rot[..., 2, 0],
                          rot[..., 1, 0] - rot[..., 0, 1]], axis=-1)
    sin = np.sin(theta)
    scale = np.where(theta < 1e-6, 1.0, theta / np.maximum(sin, _EPS))
    near_pi = theta > np.pi - 1e-4
    if np.any(near_pi):
        # Antipodal branch: |sin θ| ≈ 0 but vee ≈ 0 too; recover the axis from
        # the symmetric part R + I whose largest-diagonal column ∝ axis.
        sym = rot + np.broadcast_to(np.eye(3, dtype=rot.dtype), rot.shape)
        diag = np.stack([sym[..., 0, 0], sym[..., 1, 1], sym[..., 2, 2]], -1)
        k = np.argmax(diag, axis=-1)
        col = np.take_along_axis(
            np.swapaxes(sym, -1, -2), k[..., None, None].repeat(3, -1),
            axis=-2)[..., 0, :]
        axis = col / np.maximum(np.linalg.norm(col, axis=-1, keepdims=True),
                                _EPS)
        # Fix the sign using the skew part (zero exactly at π, where sign is
        # arbitrary — both ±axis·π are valid logs).
        sgn = np.where(np.sum(vee * axis, axis=-1, keepdims=True) < 0,
                       -1.0, 1.0)
        alt = axis * sgn * theta[..., None]
        return np.where(near_pi[..., None], alt, vee * scale[..., None])
    return vee * scale[..., None]


def _quat_from_matrix(rot: np.ndarray) -> np.ndarray:
    """(..., 3, 3) -> (..., 4) (w, x, y, z), w >= 0. Branch-free Shepperd."""
    m = rot
    qw = np.stack([1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2],
                   m[..., 2, 1] - m[..., 1, 2],
                   m[..., 0, 2] - m[..., 2, 0],
                   m[..., 1, 0] - m[..., 0, 1]], axis=-1)
    qx = np.stack([m[..., 2, 1] - m[..., 1, 2],
                   1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
                   m[..., 0, 1] + m[..., 1, 0],
                   m[..., 0, 2] + m[..., 2, 0]], axis=-1)
    qy = np.stack([m[..., 0, 2] - m[..., 2, 0],
                   m[..., 0, 1] + m[..., 1, 0],
                   1.0 + m[..., 1, 1] - m[..., 0, 0] - m[..., 2, 2],
                   m[..., 1, 2] + m[..., 2, 1]], axis=-1)
    qz = np.stack([m[..., 1, 0] - m[..., 0, 1],
                   m[..., 0, 2] + m[..., 2, 0],
                   m[..., 1, 2] + m[..., 2, 1],
                   1.0 + m[..., 2, 2] - m[..., 0, 0] - m[..., 1, 1]], axis=-1)
    cands = np.stack([qw, qx, qy, qz], axis=-2)
    best = np.argmax(np.sum(cands * cands, axis=-1), axis=-1)
    q = np.take_along_axis(cands, best[..., None, None].repeat(4, -1),
                           axis=-2)[..., 0, :]
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return q * np.where(q[..., :1] < 0, -1.0, 1.0)


def _matrix_from_quat(q: np.ndarray) -> np.ndarray:
    """(..., 4) (w, x, y, z) -> (..., 3, 3)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], axis=-1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], axis=-1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def _project_rotation(mat: np.ndarray) -> np.ndarray:
    """Nearest rotation matrix via SVD with det=+1 fix."""
    u, _, vt = np.linalg.svd(mat)
    det = np.linalg.det(u @ vt)
    u = np.concatenate([u[..., :2], u[..., 2:] * det[..., None, None]],
                       axis=-1)
    return u @ vt


class _LieBase:
    """Container behavior shared by SO3/SE3: indexing, stacking, repr."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data)

    # -- container protocol --------------------------------------------
    @property
    def shape(self):
        return self.data.shape[:-2]

    def __len__(self):
        # Reference parity (liegroupbase.py:109-111): an unbatched transform
        # has length 1 rather than raising.
        if self.data.ndim == 2:
            return 1
        return self.data.shape[0]

    def __getitem__(self, item):
        return self.__class__(self.data[item])

    def __setitem__(self, item, value):
        self.data[item] = value.data if isinstance(value, _LieBase) else value

    def __array__(self, dtype=None):
        return np.asarray(self.data, dtype=dtype)

    def __repr__(self):
        return f'{self.__class__.__name__}(shape={self.shape})\n{self.data}'

    @classmethod
    def stack(cls, transforms: Sequence['_LieBase']) -> '_LieBase':
        return cls(np.stack([t.data for t in transforms], axis=0))

    # -- group operations built on primitives ---------------------------
    def boxplus_left(self, delta: np.ndarray) -> '_LieBase':
        """exp(delta) ∘ self (left-increment retraction)."""
        return self.__class__.exp(delta) * self

    def boxplus_right(self, delta: np.ndarray) -> '_LieBase':
        """self ∘ exp(delta) (right-increment retraction)."""
        return self * self.__class__.exp(delta)


class SO3(_LieBase):
    """Batch of rotations stored as (..., 3, 3) matrices."""

    DIM = 3

    # -- constructors ----------------------------------------------------
    @staticmethod
    def identity(size: Optional[int] = None) -> 'SO3':
        eye = np.eye(3)
        return SO3(np.tile(eye, (size, 1, 1)) if size is not None else eye)

    @staticmethod
    def sample_uniform(size: Optional[int] = None,
                       rng: Optional[np.random.Generator] = None) -> 'SO3':
        rng = rng or np.random.default_rng()
        q = rng.normal(size=((4,) if size is None else (size, 4)))
        return SO3(_matrix_from_quat(q))

    @staticmethod
    def sample_small(size: Optional[int] = None, std: float = 0.1,
                     rng: Optional[np.random.Generator] = None) -> 'SO3':
        rng = rng or np.random.default_rng()
        shape = () if size is None else (size,)
        axis = rng.normal(size=shape + (3,))
        axis = axis / np.maximum(
            np.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
        theta = rng.normal(size=shape + (1,)) * std * np.pi / np.sqrt(3.0)
        return SO3.exp(axis * theta)

    @staticmethod
    def from_matrix(mat: np.ndarray, normalize: bool = False,
                    check: bool = True) -> 'SO3':
        mat = np.asarray(mat, dtype=np.float64)
        assert mat.shape[-2:] == (3, 3), 'rotations are (..., 3, 3)'
        if normalize:
            mat = _project_rotation(mat)
        r = SO3(mat)
        if check and not r.is_valid():
            raise ValueError('matrix is not a valid rotation '
                             '(pass normalize=True to project)')
        return r

    @staticmethod
    def from_quaternion(quat: np.ndarray, normalize: bool = False) -> 'SO3':
        quat = np.asarray(quat, dtype=np.float64)
        if not normalize:
            norms = np.linalg.norm(quat, axis=-1)
            if not np.allclose(norms, 1.0, atol=1e-5):
                raise ValueError('quaternion not normalized '
                                 '(pass normalize=True)')
        return SO3(_matrix_from_quat(quat))

    # -- exp/log ----------------------------------------------------------
    @staticmethod
    def exp(omega: np.ndarray) -> 'SO3':
        return SO3(lie_np.so3_exp(omega))

    @staticmethod
    def exp_and_theta(omega: np.ndarray):
        """exp(omega) together with the rotation angle ‖omega‖."""
        return SO3.exp(omega), np.linalg.norm(np.asarray(omega), axis=-1)

    def log(self) -> np.ndarray:
        return _so3_log_batched(self.data)

    # -- group ops ---------------------------------------------------------
    def inv(self) -> 'SO3':
        return SO3(np.swapaxes(self.data, -1, -2))

    def __mul__(self, other: 'SO3') -> 'SO3':
        return SO3(self.data @ other.data)

    def transform(self, pts: np.ndarray) -> np.ndarray:
        """Rotate (..., N, 3) points."""
        return pts @ np.swapaxes(self.data, -1, -2)

    # -- algebra -----------------------------------------------------------
    @staticmethod
    def hat(v: np.ndarray) -> np.ndarray:
        return lie_np.so3_hat(v)

    @staticmethod
    def vee(mat: np.ndarray) -> np.ndarray:
        mat = np.asarray(mat)
        return np.stack([mat[..., 2, 1], mat[..., 0, 2], mat[..., 1, 0]],
                        axis=-1)

    # -- metrics / conversions ----------------------------------------------
    def rotation_angle(self) -> np.ndarray:
        """Rotation angle(s) in radians."""
        trace = (self.data[..., 0, 0] + self.data[..., 1, 1]
                 + self.data[..., 2, 2])
        return np.arccos(np.clip(0.5 * (trace - 1.0), -1.0, 1.0))

    def compare(self, other: 'SO3') -> Dict[str, np.ndarray]:
        return {'rot_deg': np.rad2deg((self * other.inv()).rotation_angle())}

    def vec(self) -> np.ndarray:
        """Flattened (..., 9) representation."""
        return self.data.reshape(*self.data.shape[:-2], 9)

    def as_quaternion(self) -> np.ndarray:
        return _quat_from_matrix(self.data)

    def as_matrix(self) -> np.ndarray:
        return self.data

    def is_valid(self, atol: float = 1e-5) -> bool:
        rtr = self.data @ np.swapaxes(self.data, -1, -2)
        eye = np.broadcast_to(np.eye(3), rtr.shape)
        return bool(np.allclose(rtr, eye, atol=atol)
                    and np.allclose(np.linalg.det(self.data), 1.0, atol=atol))


class SE3(_LieBase):
    """Batch of rigid transforms stored as (..., 3, 4) [R | t] poses."""

    DIM = 6

    # -- constructors --------------------------------------------------------
    @staticmethod
    def identity(size: Optional[int] = None) -> 'SE3':
        eye = np.eye(3, 4)
        return SE3(np.tile(eye, (size, 1, 1)) if size is not None else eye)

    @staticmethod
    def sample_uniform(size: Optional[int] = None, trans_mag: float = 1.0,
                       rng: Optional[np.random.Generator] = None) -> 'SE3':
        rng = rng or np.random.default_rng()
        rot = SO3.sample_uniform(size, rng=rng)
        shape = () if size is None else (size,)
        trans = rng.uniform(-trans_mag, trans_mag, shape + (3, 1))
        return SE3.from_rt(rot, trans)

    @staticmethod
    def sample_small(size: Optional[int] = None, std: float = 0.1,
                     rng: Optional[np.random.Generator] = None) -> 'SE3':
        rng = rng or np.random.default_rng()
        rot = SO3.sample_small(size, std, rng=rng)
        shape = () if size is None else (size,)
        trans = rng.normal(size=shape + (3, 1)) * std / np.sqrt(3.0)
        return SE3.from_rt(rot, trans)

    @staticmethod
    def from_rt(rot: Union[SO3, np.ndarray], trans: np.ndarray) -> 'SE3':
        rot = rot.data if isinstance(rot, SO3) else np.asarray(rot)
        trans = np.asarray(trans)
        if trans.shape[-1] != 1:
            trans = trans[..., None]
        return SE3(np.concatenate([rot, trans], axis=-1))

    @staticmethod
    def from_rtvec(vec: np.ndarray, normalize: bool = False) -> 'SE3':
        """7-vector (qw, qx, qy, qz, tx, ty, tz) -> SE3."""
        vec = np.asarray(vec, dtype=np.float64)
        rot = SO3.from_quaternion(vec[..., :4], normalize=normalize)
        return SE3.from_rt(rot, vec[..., 4:])

    @staticmethod
    def from_matrix(mat: np.ndarray, normalize: bool = False,
                    check: bool = True) -> 'SE3':
        """Accepts (..., 3, 4) or homogeneous (..., 4, 4)."""
        mat = np.asarray(mat, dtype=np.float64)
        if mat.shape[-2:] == (4, 4):
            mat = mat[..., :3, :]
        assert mat.shape[-2:] == (3, 4), 'poses are (..., 3, 4) or (..., 4, 4)'
        rot = SO3.from_matrix(mat[..., :3], normalize=normalize, check=check)
        return SE3.from_rt(rot, mat[..., 3:])

    # -- exp/log --------------------------------------------------------------
    @staticmethod
    def exp(xi: np.ndarray) -> 'SE3':
        """(..., 6) twist [rho, omega] -> SE3 (V-matrix translation)."""
        xi = np.asarray(xi, dtype=np.float64)
        rho, omega = xi[..., :3], xi[..., 3:]
        rot = lie_np.so3_exp(omega)
        theta = np.linalg.norm(omega, axis=-1)[..., None, None]
        w_hat = lie_np.so3_hat(omega)
        w_hat2 = w_hat @ w_hat
        eye = np.broadcast_to(np.eye(3), rot.shape)
        t = np.maximum(theta, 1e-9)
        v_full = (eye + (1.0 - np.cos(t)) / t ** 2 * w_hat
                  + (t - np.sin(t)) / t ** 3 * w_hat2)
        v = np.where(theta < 1e-6, eye + 0.5 * w_hat, v_full)
        trans = v @ rho[..., None]
        return SE3(np.concatenate([rot, trans], axis=-1))

    def log(self) -> np.ndarray:
        """SE3 -> (..., 6) twist [rho, omega]."""
        rot, trans = self.data[..., :3], self.data[..., 3]
        omega = _so3_log_batched(rot)
        theta = np.linalg.norm(omega, axis=-1)[..., None, None]
        w_hat = lie_np.so3_hat(omega)
        w_hat2 = w_hat @ w_hat
        eye = np.broadcast_to(np.eye(3), rot.shape)
        t = np.maximum(theta, 1e-9)
        half = 0.5 * t
        cot = np.cos(half) / np.maximum(np.abs(np.sin(half)), _EPS) \
            * np.sign(np.sin(half) + _EPS)
        v_inv_full = (eye - 0.5 * w_hat
                      + (1.0 - half * cot) / t ** 2 * w_hat2)
        v_inv = np.where(theta < 1e-6, eye - 0.5 * w_hat, v_inv_full)
        rho = (v_inv @ trans[..., None])[..., 0]
        return np.concatenate([rho, omega], axis=-1)

    # -- group ops ---------------------------------------------------------------
    def inv(self) -> 'SE3':
        return SE3(lie_np.se3_inv(self.data))

    def __mul__(self, other: 'SE3') -> 'SE3':
        return SE3(lie_np.se3_cat(self.data, other.data))

    def transform(self, pts: np.ndarray) -> np.ndarray:
        """Apply to (..., N, 3) points."""
        return lie_np.se3_transform(self.data, pts)

    # -- algebra --------------------------------------------------------------------
    @staticmethod
    def hat(v: np.ndarray) -> np.ndarray:
        """(..., 6) twist [rho, omega] -> (..., 4, 4) se(3) matrix."""
        v = np.asarray(v)
        top = np.concatenate([lie_np.so3_hat(v[..., 3:]),
                              v[..., :3, None]], axis=-1)
        bottom = np.zeros_like(top[..., :1, :])
        return np.concatenate([top, bottom], axis=-2)

    @staticmethod
    def vee(mat: np.ndarray) -> np.ndarray:
        """(..., 4, 4) se(3) matrix -> (..., 6) twist [rho, omega]."""
        mat = np.asarray(mat)
        return np.concatenate([mat[..., :3, 3], SO3.vee(mat[..., :3, :3])],
                              axis=-1)

    @staticmethod
    def jacob_dAexpeD_de(poseA: 'SE3', poseD: 'SE3',
                         full_matrix: bool = True) -> np.ndarray:
        """Jacobian of A·exp(ε)·D wrt the right-increment ε at ε=0.

        Column-major over D's columns (the reference's block layout,
        se3.py:185-230): with A's rotation R_A and D's columns d_k,
        ∂(A exp(ε) D)/∂ε has blocks R_A (translation wrt ρ) and
        −R_A·[d_k]× (each output column wrt ω). Returns (..., 12, 6) when
        full_matrix else the five nonzero 3×3 blocks stacked as (..., 15, 3).
        """
        rotA = poseA.data[..., :3, :3]
        d = poseD.data
        blocks = [rotA] + [-rotA @ lie_np.so3_hat(d[..., :3, k])
                           for k in range(4)]
        if not full_matrix:
            return np.concatenate(blocks, axis=-2)
        jac = np.zeros(poseA.data.shape[:-2] + (12, 6), dtype=d.dtype)
        jac[..., 9:12, 0:3] = blocks[0]
        for k in range(4):
            jac[..., 3 * k:3 * k + 3, 3:6] = blocks[k + 1]
        return jac

    # -- metrics / conversions -------------------------------------------------------
    @property
    def rot(self) -> SO3:
        return SO3(self.data[..., :3])

    @property
    def trans(self) -> np.ndarray:
        return self.data[..., 3]

    def compare(self, other: 'SE3') -> Dict[str, np.ndarray]:
        err = self * other.inv()
        return {'rot_deg': np.rad2deg(err.rot.rotation_angle()),
                'trans': np.linalg.norm(self.trans - other.trans, axis=-1)}

    def vec(self) -> np.ndarray:
        """7-vector (qw, qx, qy, qz, tx, ty, tz)."""
        return np.concatenate([self.rot.as_quaternion(), self.trans], axis=-1)

    def as_quat_trans(self):
        return self.rot.as_quaternion(), self.trans

    def as_matrix(self) -> np.ndarray:
        """Homogeneous (..., 4, 4) (reference as_matrix shape)."""
        bottom = np.zeros(self.data.shape[:-2] + (1, 4))
        bottom[..., 0, 3] = 1.0
        return np.concatenate([self.data, bottom], axis=-2)

    def is_valid(self, atol: float = 1e-5) -> bool:
        return self.rot.is_valid(atol=atol)
