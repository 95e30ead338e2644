"""ctypes bindings for the native host runtime (native/libibgs_native.so).

Builds on demand with `make -C native` if the shared object is missing;
every entry point has a pure-python/JAX fallback so the framework works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
_SO = os.path.join(_ROOT, "native", "libibgs_native.so")
_lib = None


def _stale():
    src = os.path.join(_ROOT, "native", "ibgs_native.cpp")
    try:
        return os.path.getmtime(src) > os.path.getmtime(_SO)
    except OSError:
        return True


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or _stale():
        try:
            subprocess.run(["make", "-C", os.path.join(_ROOT, "native"),
                            "-B"], check=True, capture_output=True)
        except Exception:
            if not os.path.exists(_SO):
                return None
    try:
        lib = ctypes.CDLL(_SO)
        if lib.ibgs_native_abi() != 2:
            return None
    except (OSError, AttributeError):
        return None
    lib.knn_mean_sq_dist_3.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.parse_colmap_points3d.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64)]
    lib.parse_colmap_points3d.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def knn_mean_sq_dist_3(points: np.ndarray) -> np.ndarray:
    """(N, 3) float32 → (N,) mean squared 3-NN distance (exact)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        from ibgs_tpu.core.knn import mean_sq_dist_to_3nn
        import jax.numpy as jnp
        return np.asarray(mean_sq_dist_to_3nn(jnp.asarray(pts)))
    out = np.empty(len(pts), np.float32)
    lib.knn_mean_sq_dist_3(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def parse_colmap_points3d(path: str):
    """Fast points3D.bin parse; returns (xyz f64 (N,3), rgb u8 (N,3),
    err f64 (N,), track_len i64 (N,)) or None when the native lib is
    unavailable.  err/track_len let the caller apply the reference's
    point-quality filter (scene/colmap_loader.py:144-157)."""
    lib = _load()
    if lib is None:
        return None
    blob = np.fromfile(path, np.uint8)
    count = int.from_bytes(blob[:8].tobytes(), "little")
    xyz = np.empty((count, 3), np.float64)
    rgb = np.empty((count, 3), np.uint8)
    err = np.empty((count,), np.float64)
    tlen = np.empty((count,), np.int64)
    got = lib.parse_colmap_points3d(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(blob),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tlen.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if got != count:
        return None
    return xyz, rgb, err, tlen
