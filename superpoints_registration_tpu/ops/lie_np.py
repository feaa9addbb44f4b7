"""Numpy SO(3)/SE(3) utilities for the CPU-side data pipeline (augmentations).

These run in data-loader workers, never on device. Poses are (3, 4) numpy
arrays, matching the on-device convention in `ops.se3`.

Functional parity targets (cited for parity checking only):
  - exp / sample_small / sample_uniform: src/cvhelpers/lie/numpy/so3.py:25-101,
    src/cvhelpers/lie/numpy/se3.py:25-45
  - se3 init/cat/inv/transform: src/utils/se3_numpy.py:11-51
"""
from __future__ import annotations

import numpy as np


def so3_hat(omega: np.ndarray) -> np.ndarray:
    """(..., 3) rotation vector -> (..., 3, 3) skew matrix."""
    o = np.asarray(omega)
    zeros = np.zeros_like(o[..., 0])
    return np.stack([
        np.stack([zeros, -o[..., 2], o[..., 1]], axis=-1),
        np.stack([o[..., 2], zeros, -o[..., 0]], axis=-1),
        np.stack([-o[..., 1], o[..., 0], zeros], axis=-1),
    ], axis=-2)


def so3_exp(omega: np.ndarray) -> np.ndarray:
    """Rodrigues formula: (..., 3) rotation vector -> (..., 3, 3) rotation matrix."""
    omega = np.asarray(omega, dtype=np.float64)
    theta = np.linalg.norm(omega, axis=-1, keepdims=True)
    near_zero = np.isclose(theta, 0.0)[..., None]
    taylor = np.identity(3) + so3_hat(omega)
    with np.errstate(divide='ignore', invalid='ignore'):
        w = np.where(theta > 0, omega / theta, 0.0)
    w_hat = so3_hat(w)
    w_hat2 = w_hat @ w_hat
    s = np.sin(theta)[..., None]
    c = np.cos(theta)[..., None]
    rodrigues = np.identity(3) + s * w_hat + (1.0 - c) * w_hat2
    return np.where(near_zero, taylor, rodrigues)


def so3_log(rot: np.ndarray) -> np.ndarray:
    """(3, 3) rotation matrix -> (3,) rotation vector (single matrix only)."""
    cos_theta = np.clip((np.trace(rot) - 1.0) * 0.5, -1.0, 1.0)
    theta = np.arccos(cos_theta)
    if np.isclose(theta, 0.0):
        return np.array([rot[2, 1] - rot[1, 2],
                         rot[0, 2] - rot[2, 0],
                         rot[1, 0] - rot[0, 1]]) * 0.5
    return theta / (2.0 * np.sin(theta)) * np.array([
        rot[2, 1] - rot[1, 2], rot[0, 2] - rot[2, 0], rot[1, 0] - rot[0, 1]])


def uniform_2_sphere(rng: np.random.Generator, size=None) -> np.ndarray:
    """Uniform random direction(s) on the unit sphere."""
    shape = (3,) if size is None else (size, 3)
    v = rng.normal(size=shape)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def sample_rotation_small(rng: np.random.Generator, std: float) -> np.ndarray:
    """Small random rotation: random axis, N(0, (std*pi/sqrt(3))^2) angle."""
    axis = uniform_2_sphere(rng)
    theta = rng.normal() * std * np.pi / np.sqrt(3.0)
    return so3_exp(axis * theta)


def sample_rotation_uniform(rng: np.random.Generator) -> np.ndarray:
    """Uniform random rotation matrix (via QR of a Gaussian matrix)."""
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r))
    if np.linalg.det(q) < 0:
        q[:, 2] *= -1
    return q


def sample_pose_small(rng: np.random.Generator, std: float = 0.1) -> np.ndarray:
    """Small random SE(3) perturbation as a (3, 4) pose."""
    rot = sample_rotation_small(rng, std)
    trans = rng.normal(size=(3, 1)) * std / np.sqrt(3.0)
    return np.concatenate([rot, trans], axis=1).astype(np.float32)


def sample_pose_large(rng: np.random.Generator, trans_mag: float = 4.0) -> np.ndarray:
    """Predator-style large perturbation: uniform zyx-Euler rotation, +/-trans_mag translation."""
    euler = rng.random(3) * 2.0 * np.pi
    cz, sz = np.cos(euler[0]), np.sin(euler[0])
    cy, sy = np.cos(euler[1]), np.sin(euler[1])
    cx, sx = np.cos(euler[2]), np.sin(euler[2])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    rot = rz @ ry @ rx  # 'zyx' intrinsic order
    trans = rng.uniform(-trans_mag, trans_mag, (3, 1))
    return np.concatenate([rot, trans], axis=1).astype(np.float32)


# ---- (3, 4) pose algebra (numpy mirrors of ops/se3.py) ----

def se3_init(rot=None, trans=None) -> np.ndarray:
    assert rot is not None or trans is not None
    if rot is None:
        rot = np.identity(3)
    if trans is None:
        trans = np.zeros((3, 1))
    return np.concatenate([np.asarray(rot, dtype=np.float32),
                           np.asarray(trans, dtype=np.float32).reshape(3, 1)], axis=1)


def se3_cat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    rot = a[..., :3, :3] @ b[..., :3, :3]
    trans = a[..., :3, :3] @ b[..., :3, 3:4] + a[..., :3, 3:4]
    return np.concatenate([rot, trans], axis=-1)


def se3_inv(pose: np.ndarray) -> np.ndarray:
    rot = pose[..., :3, :3]
    irot = np.swapaxes(rot, -1, -2)
    itrans = -irot @ pose[..., :3, 3:4]
    return np.concatenate([irot, itrans], axis=-1)


def se3_transform(pose: np.ndarray, xyz: np.ndarray) -> np.ndarray:
    rot, trans = pose[..., :3, :3], pose[..., :3, 3:4]
    return xyz @ np.swapaxes(rot, -1, -2) + np.swapaxes(trans, -1, -2)
