"""Geometry primitives shared by the whole framework.

All matrices follow standard column-vector convention: ``x_out = M @ x_in``.
(The torch/CUDA reference stores transposed matrices and multiplies row
vectors; the math here is equivalent — see the parity notes on each
function.  Reference for semantics: /root/reference/utils/graphics_utils.py
and /root/reference/submodules/diff-plane-rasterization/cuda_rasterizer/forward.cu.)
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Quaternions / rotations / covariances
# --------------------------------------------------------------------------

def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) wxyz quaternion → (…, 3, 3) rotation matrix.

    The quaternion is used as-is (callers normalise), matching the kernel
    convention (reference forward.cu:156-190 `computeCov3D`).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-24) -> jnp.ndarray:
    """Safe unit-normalisation: v * rsqrt(|v|^2 + eps).

    Unlike v/(|v|+e), the reverse-mode gradient stays finite at v = 0
    (|v|'s grad is 0/0 there), which matters because zero vectors times a
    zero cotangent would otherwise inject NaNs into gated loss terms."""
    from jax import lax
    return v * lax.rsqrt((v * v).sum(axis=axis, keepdims=True) + eps)


def build_covariance_3d(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) activated scales + (…, 4) unit quats → (…, 3, 3) world covariance.

    Sigma = R S S^T R^T with S = diag(scale).
    """
    R = quat_to_rotmat(quat)
    M = R * scale[..., None, :]  # columns scaled: R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def cov3d_to_sym6(cov: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) symmetric → packed (…, 6): xx, xy, xz, yy, yz, zz."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def sym6_to_cov3d(s: jnp.ndarray) -> jnp.ndarray:
    r0 = jnp.stack([s[..., 0], s[..., 1], s[..., 2]], axis=-1)
    r1 = jnp.stack([s[..., 1], s[..., 3], s[..., 4]], axis=-1)
    r2 = jnp.stack([s[..., 2], s[..., 4], s[..., 5]], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


# --------------------------------------------------------------------------
# Camera matrices (host-side numpy: built once per camera)
# --------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """COLMAP-convention pose → 4x4 world-to-camera matrix.

    ``R`` is the camera-to-world rotation (as stored by the common 3DGS data
    loaders), ``t`` the world-to-camera translation.
    """
    M = np.eye(4, dtype=np.float64)
    M[:3, :3] = R.T
    M[:3, 3] = t
    return M.astype(np.float32)


def perspective(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style asymmetric frustum used by 3DGS (z in [0,1] after divide).

    Matches reference graphics_utils.getProjectionMatrix (column-vector form).
    """
    tx = math.tan(fovx * 0.5)
    ty = math.tan(fovy * 0.5)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tx
    P[1, 1] = 1.0 / ty
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def fov_to_focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: int) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


# --------------------------------------------------------------------------
# Projection helpers (device-side)
# --------------------------------------------------------------------------

def apply_transform(M: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(4,4) @ (…,3) homogeneous point transform, returning (…,3) xyz (no divide)."""
    return p @ M[:3, :3].T + M[:3, 3]


def apply_rotation(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate direction vectors by the 3x3 block of a 4x4 transform."""
    return v @ M[:3, :3].T


def project_hom(M: jnp.ndarray, p: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Full projective transform with homogeneous divide → (…,3) NDC."""
    xyzw = p @ M[:, :3].T + M[:, 3]
    w = 1.0 / (xyzw[..., 3] + eps)
    return xyzw[..., :3] * w[..., None]


def ndc_to_pixel(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC in [-1,1] → pixel coordinate, 3DGS convention ((v+1)*S - 1)/2."""
    return ((v + 1.0) * size - 1.0) * 0.5


def camera_center_from_view(view: jnp.ndarray) -> jnp.ndarray:
    """World-space camera centre from a 4x4 world-to-view matrix."""
    Rcw = view[:3, :3]
    t = view[:3, 3]
    return -(Rcw.T @ t)
