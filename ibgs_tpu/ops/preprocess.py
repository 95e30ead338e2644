"""Per-Gaussian view preprocessing (projection / EWA splatting / shading).

This stage is embarrassingly parallel so it is written as plain `jnp` ops:
XLA vectorises it across the VPU and JAX autodiff provides the exact
backward (the reference hand-derives this in
/root/reference/submodules/diff-plane-rasterization/cuda_rasterizer/backward.cu:241-493;
here it falls out of `jax.vjp` for free).

Behavioural spec matched against reference forward.cu:194-295:
  * near-plane cull at view z <= 0.2,
  * EWA Jacobian with ±1.3·tan(fov) frustum clamping of the view-space mean,
  * +0.3 px low-pass dilation of the 2D covariance,
  * radius = ceil(3·sqrt(lambda_max)), lambda via mid ± sqrt(max(0.1, mid²-det)),
  * SH→RGB with +0.5 offset and clamp-to-positive,
  * tile rectangle in units of the (tile_h × tile_w) tile grid.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct
from jax import lax

from ibgs_tpu.core import sh as shlib
from ibgs_tpu.core import transforms as tf
from ibgs_tpu.core.camera import Camera

NEAR_CULL_Z = 0.2
COV2D_DILATION = 0.3


@struct.dataclass
class Splats2D:
    """Screen-space Gaussians for one camera (all arrays length P)."""
    mean2d: jnp.ndarray      # (P, 2) pixel coords
    depth: jnp.ndarray       # (P,) view-space z
    conic: jnp.ndarray       # (P, 3) inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray     # (P,)
    rgb: jnp.ndarray         # (P, 3)
    plane_normal: jnp.ndarray  # (P, 3) camera-space plane normal
    plane_dist: jnp.ndarray  # (P,) camera-space |plane offset|
    radius: jnp.ndarray      # (P,) int32 screen radius (0 = culled)
    rect_min: jnp.ndarray    # (P, 2) int32 tile rect (x, y), inclusive
    rect_max: jnp.ndarray    # (P, 2) int32 tile rect, exclusive
    n_tiles: jnp.ndarray     # (P,) int32 tiles touched


def _cov3d_sym6(scale: jnp.ndarray, quat: jnp.ndarray):
    """Activated scales + unit quats → packed world covariance
    (xx, xy, xz, yy, yz, zz), fully elementwise (batched 3x3 matmuls are
    pathological on the MXU — tiny contractions belong on the VPU)."""
    w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    R = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    s2 = [scale[:, k] * scale[:, k] for k in range(3)]

    def sig(i, j):
        return (R[i][0] * R[j][0] * s2[0] + R[i][1] * R[j][1] * s2[1]
                + R[i][2] * R[j][2] * s2[2])

    return [sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)]


def ewa_project(scale: jnp.ndarray, quat: jnp.ndarray,
                mean_view: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Scales/quats + view-space means → packed 2D covariance (a, b, c)
    with the low-pass dilation, all elementwise over P."""
    tz = mean_view[:, 2]
    lim_x = 1.3 * cam.tan_fovx
    lim_y = 1.3 * cam.tan_fovy
    tx = jnp.clip(mean_view[:, 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(mean_view[:, 1] / tz, -lim_y, lim_y) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = cam.fx * inv_z
    j02 = -cam.fx * tx * inv_z2
    j11 = cam.fy * inv_z
    j12 = -cam.fy * ty * inv_z2
    Wm = cam.view[:3, :3]
    # U = J @ W with J = [[j00, 0, j02], [0, j11, j12]]
    U0 = [j00 * Wm[0, k] + j02 * Wm[2, k] for k in range(3)]
    U1 = [j11 * Wm[1, k] + j12 * Wm[2, k] for k in range(3)]

    S = _cov3d_sym6(scale, quat)
    Sm = [[S[0], S[1], S[2]], [S[1], S[3], S[4]], [S[2], S[4], S[5]]]

    def quad(Ua, Ub):
        out = 0.0
        for i in range(3):
            for j in range(3):
                out = out + Ua[i] * Sm[i][j] * Ub[j]
        return out

    a = quad(U0, U0) + COV2D_DILATION
    b = quad(U0, U1)
    c = quad(U1, U1) + COV2D_DILATION
    return jnp.stack([a, b, c], axis=-1)


def camera_plane(normal_world: jnp.ndarray, offset: jnp.ndarray,
                 xyz: jnp.ndarray, cam: Camera):
    """World plane (camera-facing normal + scalar offset) → camera-space plane.

    Mirrors reference gaussian_renderer/__init__.py:304-316: the plane's
    camera-space distance is |n_w·x + D| with D = -n_w·mu (+ learnt offset),
    shifted into the view frame.
    """
    n_cam = normal_world @ cam.view[:3, :3].T
    dist_world = -(normal_world * xyz).sum(-1) + offset
    # Shift the plane offset into the view frame: d_cam = D + n_w·cam_pos,
    # and n_w·cam_pos == -n_cam·t for t the view translation.
    dist_cam = dist_world - n_cam @ cam.view[:3, 3]
    return n_cam, jnp.abs(dist_cam)


def orient_normals(normal_world: jnp.ndarray, offset: jnp.ndarray,
                   xyz: jnp.ndarray, cam_pos: jnp.ndarray):
    """Flip normals (and plane offsets) to face the camera.

    Reference: scene/gaussian_model.py:166-173 (`get_normal`).
    """
    to_cam = cam_pos - xyz
    flip = jnp.where((normal_world * to_cam).sum(-1) < 0.0, -1.0, 1.0)
    return normal_world * flip[:, None], offset * flip


def smallest_axis_normals(log_scale: jnp.ndarray, quat_unit: jnp.ndarray,
                          xyz: jnp.ndarray, cam_pos: jnp.ndarray):
    """Camera-facing normal from the smallest covariance axis
    (reference gaussian_model.py:149-161)."""
    R = tf.quat_to_rotmat(quat_unit)  # (P,3,3), columns are principal axes
    idx = jnp.argmin(log_scale, axis=-1)
    n = jnp.take_along_axis(R, idx[:, None, None].repeat(3, 1), axis=2)[..., 0]
    to_cam = cam_pos - xyz
    flip = jnp.where((n * to_cam).sum(-1) < 0.0, -1.0, 1.0)
    return n * flip[:, None]


def preprocess(
    xyz: jnp.ndarray,              # (P,3)
    scale: jnp.ndarray,            # (P,3) activated (exp'd)
    quat: jnp.ndarray,             # (P,4) unit
    opacity: jnp.ndarray,          # (P,) activated (sigmoid'd)
    sh_coeffs: jnp.ndarray,        # (P,K,3)
    active_sh_degree,              # traced int
    plane_normal_world: jnp.ndarray,  # (P,3) camera-facing
    plane_offset: jnp.ndarray,     # (P,) sign-corrected learnt offset
    cam: Camera,
    tile_h: int,
    tile_w: int,
    alive: jnp.ndarray | None = None,   # (P,) bool, static-capacity mask
    rgb_override: jnp.ndarray | None = None,
) -> Splats2D:
    P = xyz.shape[0]
    tiles_x = -(-cam.width // tile_w)
    tiles_y = -(-cam.height // tile_h)

    mean_view = tf.apply_transform(cam.view, xyz)
    depth = mean_view[:, 2]
    in_front = depth > NEAR_CULL_Z

    ndc = tf.project_hom(cam.full_proj, xyz)
    mean2d = jnp.stack(
        [tf.ndc_to_pixel(ndc[:, 0], cam.width),
         tf.ndc_to_pixel(ndc[:, 1], cam.height)],
        axis=-1,
    )

    cov2d = ewa_project(scale, quat, mean_view, cam)
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det != 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    # Opacity-aware per-axis tile rectangle (ellipse AABB).  Pixels with
    # alpha >= 1/255 satisfy d^T Sigma^-1 d <= cutoff^2, and the marginal-
    # variance bound d^T Sigma^-1 d >= dx^2/Sigma_xx gives exact AABB
    # half-extents tr = cutoff*sqrt(Sigma_xx/yy) for the contributing
    # strip — everything outside has alpha < 1/255 and is skipped by the
    # blend's ok-gate anyway.  Each axis takes the INTERSECTION of
    #   (a) the reference rect from the isotropic min(3,cutoff)*sigma_max
    #       radius with the reference's own (m + r + tw - 1)/tw truncated
    #       arithmetic (forward.cu getRect), and
    #   (b) the exact tile cover [floor((m-tr)/tw), floor((m+tr)/tw)] of
    #       the alpha >= 1/255 strip,
    # so the new rect is a subset of the reference rect that still covers
    # every contributing pixel the reference rect covered — outputs and
    # gradients are preserved while anisotropic / low-opacity splats bin
    # far fewer instances (~30% on the bench scene).  (The cover (b) is
    # computed with floor, not the +tw-1 trick: floor((z+tw-1)/tw) ==
    # ceil(z/tw) only holds for INTEGER z, and for fractional m + r it
    # under-covers the boundary tile.)  The reported radius stays at the
    # reference's 3*sigma so densification statistics keep reference
    # semantics.
    cutoff = jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacity, 1.000001)))
    rect_radius = jnp.ceil(jnp.minimum(3.0, cutoff) * jnp.sqrt(lam_max))
    tr_x = cutoff * jnp.sqrt(a)
    tr_y = cutoff * jnp.sqrt(c)

    radius_f = lax.stop_gradient(radius_f)
    rect_radius = lax.stop_gradient(rect_radius)
    tr_x = lax.stop_gradient(tr_x)
    tr_y = lax.stop_gradient(tr_y)
    m2d = lax.stop_gradient(mean2d)

    def _lo(m, tr, tile, n):
        old = (m - rect_radius) / tile
        return jnp.clip(jnp.maximum(old.astype(jnp.int32),
                                    jnp.floor((m - tr) / tile).astype(jnp.int32)),
                        0, n)

    def _hi(m, tr, tile, n):
        old = (m + rect_radius + tile - 1) / tile
        return jnp.clip(jnp.minimum(old.astype(jnp.int32),
                                    jnp.floor((m + tr) / tile).astype(jnp.int32) + 1),
                        0, n)

    rect_min = jnp.stack([_lo(m2d[:, 0], tr_x, tile_w, tiles_x),
                          _lo(m2d[:, 1], tr_y, tile_h, tiles_y)], axis=-1)
    rect_max = jnp.stack([_hi(m2d[:, 0], tr_x, tile_w, tiles_x),
                          _hi(m2d[:, 1], tr_y, tile_h, tiles_y)], axis=-1)
    rect_max = jnp.maximum(rect_max, rect_min)
    n_tiles = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])

    valid = in_front & det_ok & (n_tiles > 0) & (opacity > 1.0 / 255.0)
    if alive is not None:
        valid = valid & alive
    radius = jnp.where(valid, radius_f.astype(jnp.int32), 0)
    n_tiles = jnp.where(valid, n_tiles, 0)

    if rgb_override is not None:
        rgb = rgb_override
    else:
        view_dir = tf.normalize(xyz - cam.cam_pos)
        max_deg = int(round(sh_coeffs.shape[1] ** 0.5)) - 1
        rgb = jnp.maximum(
            shlib.eval_sh(sh_coeffs, view_dir, max_deg, active_sh_degree) + 0.5, 0.0
        )

    n_cam, dist_cam = camera_plane(plane_normal_world, plane_offset, xyz, cam)

    return Splats2D(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        opacity=opacity,
        rgb=rgb,
        plane_normal=n_cam,
        plane_dist=dist_cam,
        radius=radius,
        rect_min=rect_min,
        rect_max=rect_max,
        n_tiles=n_tiles,
    )
