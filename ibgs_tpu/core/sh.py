"""Real spherical-harmonics shading (degrees 0..3).

Matches the polynomial basis of the reference renderer
(/root/reference/submodules/diff-plane-rasterization/cuda_rasterizer/forward.cu:58-109
and /root/reference/utils/sh_utils.py), written as a single vectorised basis
matmul so XLA can fuse it into the preprocess pass.
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)

MAX_DEGREE = 3


def num_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """(…, 3) unit directions → (…, (degree+1)^2) SH basis values."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if degree >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        out += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def degree_mask(max_degree: int, active_degree) -> jnp.ndarray:
    """Per-coefficient 0/1 mask selecting coefficients of degree <= active.

    ``active_degree`` may be a traced int32 scalar, so ramping the SH degree
    during training never triggers recompilation.
    """
    K = num_coeffs(max_degree)
    coeff_deg = jnp.array(
        [d for d in range(max_degree + 1) for _ in range(2 * d + 1)],
        dtype=jnp.int32,
    )
    assert coeff_deg.shape[0] == K
    return (coeff_deg <= active_degree).astype(jnp.float32)


def eval_sh(coeffs: jnp.ndarray, dirs: jnp.ndarray, max_degree: int,
            active_degree) -> jnp.ndarray:
    """Shade: (…, K, 3) coefficients, (…, 3) unit view dirs → (…, 3) RGB-ish.

    Returns the raw SH sum (no +0.5 offset / clamp — callers apply those,
    mirroring reference forward.cu:101-108).
    """
    basis = sh_basis(dirs, max_degree)  # (…, K)
    basis = basis * degree_mask(max_degree, active_degree)
    return jnp.einsum("...k,...kc->...c", basis, coeffs)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def sh0_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5
