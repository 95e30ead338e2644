"""Shared synthetic-scene helpers for the test-suite."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu.core.camera import Camera, look_at_camera


def simple_camera(width=64, height=64, fov=0.8, dist=3.0) -> Camera:
    return look_at_camera(
        eye=[0.0, 0.0, -dist], target=[0.0, 0.0, 0.0], up=[0.0, -1.0, 0.0],
        fovx=fov, fovy=fov, width=width, height=height,
    )


def random_cloud(key, n, spread=0.8, scale_rng=(-3.5, -2.0)):
    """Random Gaussian parameters in front of the simple_camera."""
    ks = jax.random.split(key, 6)
    xyz = jax.random.uniform(ks[0], (n, 3), minval=-spread, maxval=spread)
    log_scale = jax.random.uniform(
        ks[1], (n, 3), minval=scale_rng[0], maxval=scale_rng[1]
    )
    quat = jax.random.normal(ks[2], (n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    opacity = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.95)
    sh0 = jax.random.uniform(ks[4], (n, 1, 3), minval=-1.0, maxval=1.0)
    normal = jax.random.normal(ks[5], (n, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    offset = jnp.zeros((n,))
    return dict(
        xyz=xyz,
        scale=jnp.exp(log_scale),
        quat=quat,
        opacity=opacity,
        sh_coeffs=sh0,
        normal_world=normal,
        plane_offset=offset,
    )


def face_camera(params, cam: Camera):
    """Orient normals toward the camera (reference get_normal semantics)."""
    to_cam = cam.cam_pos - params["xyz"]
    flip = jnp.where((params["normal_world"] * to_cam).sum(-1) < 0, -1.0, 1.0)
    out = dict(params)
    out["normal_world"] = params["normal_world"] * flip[:, None]
    out["plane_offset"] = params["plane_offset"] * flip
    return out
