"""SO(3)/SE(3) Lie-group maps in JAX (jit/vmap/grad friendly).

Parity target: the reference's torch Lie classes
(src/cvhelpers/lie/torch/{so3,se3}.py, ~1.9k LoC with the numpy mirrors) —
exp/log maps, hat/vee, and sampling. The numpy versions used by the CPU data
pipeline live in ops/lie_np.py; this module provides the on-device versions
(e.g. for differentiable pose parameterizations or on-device augmentation).

All rotation vectors are (..., 3); matrices (..., 3, 3); poses (..., 3, 4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(omega: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    o0, o1, o2 = omega[..., 0], omega[..., 1], omega[..., 2]
    zeros = jnp.zeros_like(o0)
    return jnp.stack([
        jnp.stack([zeros, -o2, o1], axis=-1),
        jnp.stack([o2, zeros, -o0], axis=-1),
        jnp.stack([-o1, o0, zeros], axis=-1),
    ], axis=-2)


def so3_vee(mat: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew matrix -> (..., 3)."""
    return jnp.stack([mat[..., 2, 1], mat[..., 0, 2], mat[..., 1, 0]], axis=-1)


def so3_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3). Taylor-safe near zero."""
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, 0.0)
    w = omega / jnp.maximum(theta, _EPS)
    w_hat = so3_hat(w)
    w_hat2 = jnp.matmul(w_hat, w_hat)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype),
                           omega.shape[:-1] + (3, 3))
    rodrigues = eye + s * w_hat + (1.0 - c) * w_hat2
    taylor = eye + so3_hat(omega)
    near_zero = (theta < 1e-6)[..., None]
    return jnp.where(near_zero, taylor, rodrigues)


def so3_log(rot: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) rotation vector (principal branch)."""
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos)
    vee = so3_vee(rot - jnp.swapaxes(rot, -1, -2)) * 0.5
    sin = jnp.sin(theta)
    scale = jnp.where(theta < 1e-6, 1.0, theta / jnp.maximum(sin, _EPS))
    return vee * scale[..., None]


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist [rho, omega] -> (..., 3, 4) pose (V-matrix translation)."""
    rho, omega = xi[..., :3], xi[..., 3:]
    rot = so3_exp(omega)
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)[..., None]
    w_hat = so3_hat(omega)
    w_hat2 = jnp.matmul(w_hat, w_hat)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), rot.shape)
    t2 = jnp.maximum(theta ** 2, _EPS)
    t3 = jnp.maximum(theta ** 3, _EPS)
    v_full = (eye + (1.0 - jnp.cos(theta)) / t2 * w_hat
              + (theta - jnp.sin(theta)) / t3 * w_hat2)
    v_taylor = eye + 0.5 * w_hat
    v = jnp.where(theta < 1e-6, v_taylor, v_full)
    trans = jnp.matmul(v, rho[..., None])
    return jnp.concatenate([rot, trans], axis=-1)


def se3_log(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 6) twist [rho, omega]."""
    rot, trans = pose[..., :3, :3], pose[..., :3, 3]
    omega = so3_log(rot)
    theta = jnp.linalg.norm(omega, axis=-1, keepdims=True)[..., None]
    w_hat = so3_hat(omega)
    w_hat2 = jnp.matmul(w_hat, w_hat)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pose.dtype), rot.shape)
    half_theta = 0.5 * theta
    t = jnp.maximum(theta, _EPS)
    cot = jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS)
    v_inv_full = (eye - 0.5 * w_hat
                  + (1.0 - half_theta * cot) / jnp.maximum(theta ** 2, _EPS)
                  * w_hat2)
    v_inv_taylor = eye - 0.5 * w_hat
    v_inv = jnp.where(theta < 1e-6, v_inv_taylor, v_inv_full)
    rho = jnp.matmul(v_inv, trans[..., None])[..., 0]
    return jnp.concatenate([rho, omega], axis=-1)


def quaternion_from_matrix(rot: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) (w, x, y, z), w >= 0. Branch-free Shepperd."""
    m = rot
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # Four candidate constructions; pick the numerically best.
    qw = jnp.stack([1.0 + t,
                    m[..., 2, 1] - m[..., 1, 2],
                    m[..., 0, 2] - m[..., 2, 0],
                    m[..., 1, 0] - m[..., 0, 1]], axis=-1)
    qx = jnp.stack([m[..., 2, 1] - m[..., 1, 2],
                    1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
                    m[..., 0, 1] + m[..., 1, 0],
                    m[..., 0, 2] + m[..., 2, 0]], axis=-1)
    qy = jnp.stack([m[..., 0, 2] - m[..., 2, 0],
                    m[..., 0, 1] + m[..., 1, 0],
                    1.0 + m[..., 1, 1] - m[..., 0, 0] - m[..., 2, 2],
                    m[..., 1, 2] + m[..., 2, 1]], axis=-1)
    qz = jnp.stack([m[..., 1, 0] - m[..., 0, 1],
                    m[..., 0, 2] + m[..., 2, 0],
                    m[..., 1, 2] + m[..., 2, 1],
                    1.0 + m[..., 2, 2] - m[..., 0, 0] - m[..., 1, 1]], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)       # (..., 4, 4)
    norms = jnp.sum(cands * cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def matrix_from_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) (w, x, y, z) -> (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def sample_uniform_rotation(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform random rotations via normalized quaternions."""
    q = jax.random.normal(key, tuple(shape) + (4,))
    return matrix_from_quaternion(q)


def sample_small_pose(key: jax.Array, std: float, shape=()) -> jnp.ndarray:
    """Small random SE(3) perturbations (lie_np.sample_pose_small on-device)."""
    k1, k2, k3 = jax.random.split(key, 3)
    axis = jax.random.normal(k1, tuple(shape) + (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    theta = jax.random.normal(k2, tuple(shape) + (1,)) * std * jnp.pi / jnp.sqrt(3.0)
    rot = so3_exp(axis * theta)
    trans = jax.random.normal(k3, tuple(shape) + (3, 1)) * std / jnp.sqrt(3.0)
    return jnp.concatenate([rot, trans], axis=-1)


def so3_left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3): J_l(w) (..., 3) -> (..., 3, 3).

    J_l = I + (1-cos t)/t^2 [w]_x + (t - sin t)/t^3 [w]_x^2.
    Thin port of the reference Lie classes' jacobian API
    (cvhelpers/lie/numpy/so3.py jacobian methods); Taylor-safe near zero.
    """
    theta = jnp.linalg.norm(omega, axis=-1)
    hat = so3_hat(omega)
    hat2 = jnp.matmul(hat, hat)
    t = jnp.maximum(theta, _EPS)
    a = (1.0 - jnp.cos(t)) / (t ** 2)
    b = (t - jnp.sin(t)) / (t ** 3)
    near = theta < 1e-4
    a = jnp.where(near, 0.5 - theta ** 2 / 24.0, a)
    b = jnp.where(near, 1.0 / 6.0 - theta ** 2 / 120.0, b)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype),
                           omega.shape[:-1] + (3, 3))
    return eye + a[..., None, None] * hat + b[..., None, None] * hat2


def so3_inv_left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3):
    J_l^-1 = I - 1/2 [w]_x + (1/t^2 - (1+cos t)/(2 t sin t)) [w]_x^2."""
    theta = jnp.linalg.norm(omega, axis=-1)
    hat = so3_hat(omega)
    hat2 = jnp.matmul(hat, hat)
    t = jnp.maximum(theta, _EPS)
    c = (1.0 / t ** 2
         - (1.0 + jnp.cos(t)) / (2.0 * t * jnp.maximum(jnp.sin(t), _EPS)))
    near = theta < 1e-4
    c = jnp.where(near, 1.0 / 12.0 + theta ** 2 / 720.0, c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype),
                           omega.shape[:-1] + (3, 3))
    return eye - 0.5 * hat + c[..., None, None] * hat2
