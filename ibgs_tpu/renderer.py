"""View-level rendering orchestration.

The JAX equivalent of reference gaussian_renderer/__init__.py: assembles
per-view inputs (camera-facing plane normals, source-view stacks,
ref→src transforms), invokes the differentiable rasterizer, and derives
screen-space depth normals.  Everything here is jit-able; host-side source
selection lives in the data layer.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

from ibgs_tpu.core.camera import Camera
from ibgs_tpu.models.gaussians import GaussianModel
from ibgs_tpu.ops.epilogue import SourceViews
from ibgs_tpu.ops.rasterize import RasterConfig, rasterize


def depth_to_normal(cam: Camera, depth: jnp.ndarray) -> jnp.ndarray:
    """Median depth map → camera-space normals by central differences.

    Reference utils/graphics_utils.py:25-83 (depth2point_cam +
    depth_pcd2normal): back-project through K^-1, cross(right-left,
    top-bottom), zero-padded border.  Returns (H, W, 3) unnormalised;
    callers normalise (gaussian_renderer/__init__.py:338-342).
    """
    pts = cam.rays_cam() * depth[..., None]          # (H, W, 3)
    l2r = pts[1:-1, 2:] - pts[1:-1, :-2]
    b2t = pts[:-2, 1:-1] - pts[2:, 1:-1]
    n = jnp.cross(l2r, b2t)
    n = n * lax.rsqrt((n * n).sum(-1, keepdims=True) + 1e-20)
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)))


def source_views_from_stacks(
    image_stack: jnp.ndarray,    # (N, H, W, 3) all train images
    depth_stack: jnp.ndarray,    # (N, H, W) cached median depths
    w2v_stack: jnp.ndarray,      # (N, 4, 4) world→view per train camera
    cam_pos_stack: jnp.ndarray,  # (N, 3)
    indices: jnp.ndarray,        # (S,) int32 selected sources (pad with 0)
    count,                       # () int32 number of real sources
    ref_cam: Camera,
) -> SourceViews:
    """Gather the per-view source pack (gaussian_renderer/__init__.py:243-267).

    ref_to_src = W2V_src @ V2W_ref.
    """
    w2v = w2v_stack[indices]                              # (S, 4, 4)
    ref_v2w = jnp.linalg.inv(ref_cam.view)
    return SourceViews(
        images=image_stack[indices],
        depths=depth_stack[indices],
        ref_to_src=w2v @ ref_v2w[None],
        cam_pos=cam_pos_stack[indices],
        count=jnp.asarray(count, jnp.int32),
    )


def render_view(
    model: GaussianModel,
    cam: Camera,
    cfg: RasterConfig,
    bg: jnp.ndarray,
    src: Optional[SourceViews] = None,
    learnt_normal: bool = True,
    render_geo: bool = True,
    depth_only: bool = False,
    return_depth_normal: bool = True,
    screen_dummy=None,
    screen_dummy_abs=None,
):
    """One differentiable forward render (reference render(), :143-365).

    Returns (RenderResult, depth_normal | None)."""
    normal_w, offset = model.oriented_normal(cam.cam_pos, learnt=learnt_normal)
    res = rasterize(
        xyz=model.params.xyz,
        scale=model.scale,
        quat=model.quat_unit,
        opacity=model.opacity,
        sh_coeffs=model.sh_coeffs,
        active_sh_degree=model.active_sh_degree,
        normal_world=normal_w,
        plane_offset=offset,
        cam=cam,
        bg=bg,
        cfg=cfg,
        src=src,
        alive=model.alive,
        screen_dummy=screen_dummy,
        screen_dummy_abs=screen_dummy_abs,
        render_geo=render_geo,
        depth_only=depth_only,
    )
    dnormal = None
    if return_depth_normal and (render_geo or depth_only):
        dn = depth_to_normal(cam, res.median_depth)
        dnormal = dn * lax.rsqrt((dn * dn).sum(-1, keepdims=True) + 1e-16)
    return res, dnormal


def render_depth_view(model: GaussianModel, cam: Camera, cfg: RasterConfig,
                      learnt_normal: bool = True) -> jnp.ndarray:
    """Depth-only pre-pass for source views (reference render_depth :41-140)."""
    res, _ = render_view(
        model, cam, cfg, bg=jnp.zeros(3), src=None,
        learnt_normal=learnt_normal, render_geo=False, depth_only=True,
        return_depth_normal=False,
    )
    return res.median_depth


def apply_exposure(render, appear_ab, cam_uid):
    """AppModel affine: exp(a)·render + b (reference app_model.py +
    gaussian_renderer/__init__.py:344-347)."""
    ab = appear_ab[cam_uid]
    return jnp.exp(ab[0]) * render + ab[1]
