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
