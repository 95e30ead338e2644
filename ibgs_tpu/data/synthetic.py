"""Synthetic multi-view scene generator (tests / benchmarks / demos).

Builds a SceneData of a procedurally-textured scene observed from a ring
of cameras — no files on disk needed.  Ground-truth images are rendered
with the oracle rasterizer from a dense "ground truth" splat set, so the
training pipeline can be exercised end-to-end hermetically.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu.core.camera import look_at_camera
from ibgs_tpu.core.sh import rgb_to_sh0
from ibgs_tpu.data.dataset import CameraInfo, SceneData
from ibgs_tpu.ops.rasterize import RasterConfig, rasterize


def _gt_cloud(rng, n):
    """A colourful blobby surface: points on a wavy disc."""
    r = np.sqrt(rng.random(n)) * 1.1
    th = rng.random(n) * 2 * np.pi
    x, y = r * np.cos(th), r * np.sin(th)
    z = 0.25 * np.sin(3 * x) * np.cos(3 * y)
    pts = np.stack([x, y, z], -1)
    col = np.stack([(np.sin(4 * x) + 1) / 2, (np.cos(4 * y) + 1) / 2,
                    (np.sin(2 * (x + y)) + 1) / 2], -1)
    return pts.astype(np.float32), col.astype(np.float32)


def make_synthetic_scene(
    n_views: int = 12, width: int = 64, height: int = 64,
    n_gt: int = 1200, n_seed: int = 400, seed: int = 0,
    cam_radius: float = 3.0, eval_every: int = 6,
    gt_backend: str = None, gt_instance_cap: int = None,
) -> SceneData:
    """gt_backend/gt_instance_cap control the GT renders: the oracle's
    lax.scan is O(instance cap) SEQUENTIAL steps, fine at test sizes but
    unusable for production-scale scenes — those should render GT with
    the Pallas backend on the accelerator (auto when not on CPU)."""
    rng = np.random.default_rng(seed)
    pts, col = _gt_cloud(rng, n_gt)

    gt_params = dict(
        xyz=jnp.asarray(pts),
        scale=jnp.full((n_gt, 3), 0.05),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_gt, 1)),
        opacity=jnp.full((n_gt,), 0.85),
        sh_coeffs=rgb_to_sh0(jnp.asarray(col))[:, None, :],
        normal_world=jnp.tile(jnp.array([0.0, 0, 1.0]), (n_gt, 1)),
        plane_offset=jnp.zeros((n_gt,)),
    )
    if gt_backend is None:
        gt_backend = ("oracle" if jax.default_backend() == "cpu"
                      else "pallas")
    if gt_instance_cap is None:
        gt_instance_cap = max(1 << 15, 1 << (int(n_gt * 12).bit_length()))
    cfg = RasterConfig(instance_cap=gt_instance_cap, backend=gt_backend)

    cams, infos, imgs = [], [], []
    for k in range(n_views):
        a = 2 * math.pi * k / n_views
        eye = [cam_radius * math.sin(a) * 0.45,
               cam_radius * math.cos(a) * 0.45, -cam_radius]
        cam = look_at_camera(eye, [0, 0, 0], [0, -1, 0], 0.8, 0.8,
                             width, height)
        res = rasterize(**gt_params, active_sh_degree=0, cam=cam,
                        bg=jnp.zeros(3), cfg=cfg, render_geo=False)
        cams.append(cam)
        imgs.append(np.asarray(res.render))
        view = np.asarray(cam.view)
        infos.append(CameraInfo(
            uid=k, R=view[:3, :3].T, T=view[:3, 3],
            fovx=0.8, fovy=0.8, width=width, height=height,
            image_path=f"synthetic_{k}", image_name=f"synthetic_{k}"))

    test_sel = [k for k in range(n_views) if k % eval_every == 0]
    train_sel = [k for k in range(n_views) if k % eval_every != 0]
    seed_idx = rng.choice(n_gt, size=min(n_seed, n_gt), replace=False)

    centers = np.stack([np.asarray(cams[k].cam_pos) for k in train_sel])
    rays = np.stack([infos[k].R[:, 2] for k in train_sel])
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    nearest = []
    for qi in range(len(train_sel)):
        d = np.linalg.norm(centers[qi][None] - centers, axis=-1)
        order = np.argsort(d)[1:5]
        nearest.append([int(o) for o in order])

    return SceneData(
        train_cameras=[cams[k] for k in train_sel],
        test_cameras=[cams[k] for k in test_sel],
        train_infos=[infos[k] for k in train_sel],
        test_infos=[infos[k] for k in test_sel],
        images=np.stack([imgs[k] for k in train_sel]),
        test_images=np.stack([imgs[k] for k in test_sel]),
        points=pts[seed_idx] + rng.normal(0, 0.01, (len(seed_idx), 3)).astype(np.float32),
        colors=col[seed_idx],
        cameras_extent=float(cam_radius),
        nearest_ids=nearest,
        test_nearest_ids=[[0, 1] for _ in test_sel],
        white_background=False,
    )
