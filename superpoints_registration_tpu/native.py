"""ctypes bindings for the native host ops (cpp/libspr_native.so).

Falls back to the pure numpy/scipy implementations in data/pointcloud.py when
the shared library hasn't been built (cpp/build.sh). The native path speeds
up the host-side data loader: KITTI scan downsampling, offline overlap
precompute, and exact neighbor oracles.
"""
from __future__ import annotations

import ctypes
import pathlib

import numpy as np

_LIB = None
_LIB_PATH = pathlib.Path(__file__).parent.parent / 'cpp' / 'libspr_native.so'


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.spr_grid_subsample.restype = ctypes.c_int64
    lib.spr_grid_subsample.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, f32p]
    lib.spr_voxel_downsample_first.restype = ctypes.c_int64
    lib.spr_voxel_downsample_first.argtypes = [f32p, ctypes.c_int64,
                                               ctypes.c_float, f32p]
    lib.spr_radius_neighbors.restype = None
    lib.spr_radius_neighbors.argtypes = [f32p, ctypes.c_int64, f32p,
                                         ctypes.c_int64, ctypes.c_float,
                                         ctypes.c_int32, i64p]
    lib.spr_mutual_overlap.restype = None
    lib.spr_mutual_overlap.argtypes = [f32p, ctypes.c_int64, f32p,
                                       ctypes.c_int64, ctypes.c_float, u8p, u8p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel barycenters (unordered). Falls back to numpy if lib missing."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        from .data.pointcloud import voxel_down_sample_np  # fallback approx
        raise RuntimeError('native lib not built; run cpp/build.sh')
    out = np.empty_like(pts)
    m = lib.spr_grid_subsample(_fp(pts), len(pts), voxel_size, _fp(out))
    return out[:m].copy()


def voxel_downsample_first(points: np.ndarray, voxel_size: float) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        from .data.pointcloud import voxel_down_sample_np
        return voxel_down_sample_np(pts, voxel_size)
    out = np.empty_like(pts)
    m = lib.spr_voxel_downsample_first(_fp(pts), len(pts), voxel_size, _fp(out))
    return out[:m].copy()


def radius_neighbors(queries: np.ndarray, supports: np.ndarray, radius: float,
                     k: int) -> np.ndarray:
    """(Nq, K) int64 closest-within-radius indices; shadow = len(supports)."""
    lib = _load()
    q = np.ascontiguousarray(queries, np.float32)
    s = np.ascontiguousarray(supports, np.float32)
    if lib is None:
        from scipy.spatial import cKDTree
        tree = cKDTree(s)
        d, idx = tree.query(q, k=k, distance_upper_bound=radius)
        d = np.atleast_2d(d)
        idx = np.atleast_2d(idx)
        idx[~np.isfinite(d)] = len(s)
        return idx.astype(np.int64)
    out = np.empty((len(q), k), np.int64)
    lib.spr_radius_neighbors(_fp(q), len(q), _fp(s), len(s), radius, k,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def mutual_overlap(src: np.ndarray, tgt: np.ndarray, radius: float):
    """Overlap masks; falls back to scipy when lib missing."""
    lib = _load()
    if lib is None:
        from .data.pointcloud import compute_overlap
        sm, tm, _ = compute_overlap(src, tgt, radius)
        return sm, tm
    s = np.ascontiguousarray(src, np.float32)
    t = np.ascontiguousarray(tgt, np.float32)
    sm = np.empty(len(s), np.uint8)
    tm = np.empty(len(t), np.uint8)
    lib.spr_mutual_overlap(_fp(s), len(s), _fp(t), len(t), radius,
                           sm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           tm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return sm.astype(bool), tm.astype(bool)
