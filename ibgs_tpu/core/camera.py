"""Camera model.

A `Camera` is a JAX pytree (flax struct): matrix/vector fields are device
arrays that can be traced through `jit`, while image dimensions are static
metadata (shapes must be compile-time constants on TPU).

Semantics mirror the reference Camera (/root/reference/scene/cameras.py):
principal point at the image centre, znear=0.01 / zfar=100, pixel centre
convention pix = ((ndc+1)*S - 1)/2.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ibgs_tpu.core import transforms as tf

ZNEAR = 0.01
ZFAR = 100.0


@struct.dataclass
class Camera:
    # --- static metadata ---
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    # --- traced arrays ---
    view: jnp.ndarray          # (4,4) world→camera
    proj: jnp.ndarray          # (4,4) camera→clip
    full_proj: jnp.ndarray     # (4,4) world→clip
    cam_pos: jnp.ndarray       # (3,) world-space centre
    fx: jnp.ndarray            # () focal in px
    fy: jnp.ndarray
    cx: jnp.ndarray            # () principal point (W/2, H/2)
    cy: jnp.ndarray
    tan_fovx: jnp.ndarray
    tan_fovy: jnp.ndarray

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def rays_cam(self) -> jnp.ndarray:
        """(H, W, 3) unit-z camera-space ray directions through pixel centres."""
        xs = (jnp.arange(self.width, dtype=jnp.float32) - self.cx) / self.fx
        ys = (jnp.arange(self.height, dtype=jnp.float32) - self.cy) / self.fy
        rx, ry = jnp.meshgrid(xs, ys, indexing="xy")
        return jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int) -> Camera:
    """Build a Camera from a COLMAP-style pose (R: cam→world rotation, t: w2c
    translation) and field of view."""
    view = tf.world_to_view(np.asarray(R, np.float64), np.asarray(t, np.float64))
    proj = tf.perspective(ZNEAR, ZFAR, fovx, fovy)
    full = (proj @ view).astype(np.float32)
    cam_pos = (-view[:3, :3].T @ view[:3, 3]).astype(np.float32)
    return Camera(
        width=int(width),
        height=int(height),
        view=jnp.asarray(view),
        proj=jnp.asarray(proj),
        full_proj=jnp.asarray(full),
        cam_pos=jnp.asarray(cam_pos),
        fx=jnp.float32(tf.fov_to_focal(fovx, width)),
        fy=jnp.float32(tf.fov_to_focal(fovy, height)),
        cx=jnp.float32(0.5 * width),
        cy=jnp.float32(0.5 * height),
        tan_fovx=jnp.float32(math.tan(0.5 * fovx)),
        tan_fovy=jnp.float32(math.tan(0.5 * fovy)),
    )


def look_at_camera(eye, target, up, fovx: float, fovy: float,
                   width: int, height: int) -> Camera:
    """Convenience constructor for tests/synthetic scenes."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # camera-to-world rotation with columns (right, down, forward):
    R = np.stack([right, down, fwd], axis=1)
    t = -R.T @ eye  # world→camera translation
    return make_camera(R, t, fovx, fovy, width, height)


def interpolate_cameras(cam_a: Camera, cam_b: Camera, w: float) -> Camera:
    """Pose interpolation between two cameras (reference cameras.py
    sample_cam :155-180 — linear blend of the camera-to-world matrices)."""
    va = np.asarray(cam_a.view, np.float64)
    vb = np.asarray(cam_b.view, np.float64)
    c2w = w * np.linalg.inv(va) + (1.0 - w) * np.linalg.inv(vb)
    w2c = np.linalg.inv(c2w)
    R = w2c[:3, :3].T
    t = w2c[:3, 3]
    fovx = 2.0 * math.atan(cam_a.width / (2.0 * float(cam_a.fx)))
    fovy = 2.0 * math.atan(cam_a.height / (2.0 * float(cam_a.fy)))
    return make_camera(R, t, fovx, fovy, cam_a.width, cam_a.height)


def perturbed_camera(cam: Camera, rng, trans_noise=1.0, deg_noise=15.0) -> Camera:
    """Random virtual camera around an existing pose (reference train.py
    gen_virtul_cam :43-74)."""
    v = np.asarray(cam.view, np.float64)
    c2w = np.linalg.inv(v)
    rx, ry, rz = np.deg2rad(rng.uniform(-deg_noise, deg_noise, 3))
    Rx = np.array([[1, 0, 0], [0, np.cos(rx), -np.sin(rx)],
                   [0, np.sin(rx), np.cos(rx)]])
    Ry = np.array([[np.cos(ry), 0, np.sin(ry)], [0, 1, 0],
                   [-np.sin(ry), 0, np.cos(ry)]])
    Rz = np.array([[np.cos(rz), -np.sin(rz), 0],
                   [np.sin(rz), np.cos(rz), 0], [0, 0, 1]])
    c2w[:3, :3] = c2w[:3, :3] @ (Rz @ Ry @ Rx)
    c2w[:3, 3] += rng.uniform(-trans_noise, trans_noise, 3)
    w2c = np.linalg.inv(c2w)
    fovx = 2.0 * math.atan(cam.width / (2.0 * float(cam.fx)))
    fovy = 2.0 * math.atan(cam.height / (2.0 * float(cam.fy)))
    return make_camera(w2c[:3, :3].T, w2c[:3, 3], fovx, fovy,
                       cam.width, cam.height)


def ellipse_path(cameras, n_frames: int = 240, z_variation: float = 0.0):
    """Smooth elliptical fly-through fitted to the training cameras
    (reference utils/render_utils.py:121-195 generate_ellipse_path
    semantics: fit an ellipse to the camera centres, look at the scene
    focus)."""
    centers = np.stack([np.asarray(c.cam_pos) for c in cameras])
    center = centers.mean(0)
    offsets = centers - center
    # principal axes of the camera ring (full basis even for < 3 cameras)
    u, s, vt = np.linalg.svd(offsets, full_matrices=False)
    if vt.shape[0] < 3:
        vt = np.concatenate([vt, np.zeros((3 - vt.shape[0], 3))], 0)
        for k in range(3):
            if np.linalg.norm(vt[2]) < 1e-6:
                cand = np.zeros(3)
                cand[k] = 1.0
                vt[2] = cand - vt[:2].T @ (vt[:2] @ cand)
        vt[2] /= np.linalg.norm(vt[2]) + 1e-12
    a1, a2 = vt[0] * np.percentile(np.abs(offsets @ vt[0]), 90), \
        vt[1] * np.percentile(np.abs(offsets @ vt[1]), 90)
    up_axis = vt[2]
    z_amp = z_variation * np.percentile(np.abs(offsets @ vt[2]), 90)
    out = []
    look_at = center + vt[2] * 0.0
    for k in range(n_frames):
        th = 2 * np.pi * k / n_frames
        eye = center + np.cos(th) * a1 + np.sin(th) * a2 \
            + np.sin(2 * th) * z_amp * up_axis
        fwd = look_at - eye
        fwd = fwd / (np.linalg.norm(fwd) + 1e-9)
        right = np.cross(fwd, up_axis)
        nr = np.linalg.norm(right)
        if nr < 1e-6:
            right = np.cross(fwd, up_axis + np.array([0.17, 0.31, 0.45]))
            nr = np.linalg.norm(right)
        right /= nr + 1e-9
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=1)
        t = -R.T @ eye
        fovx = 2.0 * math.atan(cameras[0].width / (2.0 * float(cameras[0].fx)))
        fovy = 2.0 * math.atan(cameras[0].height / (2.0 * float(cameras[0].fy)))
        out.append(make_camera(R, t, fovx, fovy, cameras[0].width,
                               cameras[0].height))
    return out
