"""Differentiable plane-based Gaussian rasterization — the public op.

Pipeline (TPU-first factoring of the reference CUDA rasterizer):

    preprocess (jnp, autodiff)          reference forward.cu:194-295
      → binning  (XLA sort)             reference rasterizer_impl.cu:320-515
      → blend    (Pallas custom_vjp)    reference forward.cu:305-665 / backward.cu:496-807
      → epilogue (jnp gathers, autodiff) reference forward.cu:496-663

Only the order-dependent blend needs hand-written kernels; every other
stage differentiates via JAX autodiff, so the whole `rasterize` call is a
single differentiable function of the Gaussian parameters.

Densification statistics: like the reference (which routes screen-space
gradients through dummy `screenspace_points` tensors,
gaussian_renderer/__init__.py:153-159), callers pass zero-valued
`screen_dummy` / `screen_dummy_abs` arrays; `jax.grad` w.r.t. them yields
the per-Gaussian view-space gradient and its absolute-value accumulation
(the AbsGS-style statistic that cannot be produced by plain autodiff).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import struct
from jax import lax

from ibgs_tpu.core.camera import Camera
from ibgs_tpu.ops import binning, blend_oracle, epilogue, preprocess
from ibgs_tpu.ops.blend_common import BlendConfig, BlendOutputs, Instances
from ibgs_tpu.ops.epilogue import IBROutputs, SourceViews


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer configuration (hashable; part of the jit key).

    The pallas backend requires tile_h * tile_w to be a multiple of the
    128-lane vreg width.  Tile shape changes NO output (same depth-order
    blend, different partition); it trades instance count against pixels
    per instance.  Measured on v5e (fwd+bwd, 960x544 bench scene,
    staircase binning): 8x16 159.8 ms, 16x16 (the reference's
    BLOCK_X/BLOCK_Y) 128.0, 16x32 119.0, 32x32 120.5 — the blend kernel
    is issue-bound per 128-instance substep, so fewer-instances/wider-
    tiles wins until the vector work catches up at NP=1024; 16x32 is the
    default."""
    tile_h: int = 16
    tile_w: int = 32
    instance_cap: int = 1 << 18
    buffer_len: int = 4
    max_src: int = 5
    depth_error_threshold: float = 0.01
    backend: str = "pallas"          # "pallas" | "oracle"
    # enable_mix_precision (reference arguments/__init__.py:137).  Reserved
    # for rasterizer-side half-precision experiments; bf16 warp tables were
    # measured SLOWER on v5e (XLA layout flip — see epilogue.py) so the
    # epilogue currently ignores it.  The aggregation net consumes the same
    # config flag separately (models/aggregation.py).
    mix_precision: bool = False
    # Exact per-instance tile/ellipse cull in binning (bin_splats cull_tab):
    # output- and gradient-preserving (the blend's per-pixel alpha >= 1/255
    # ok-gate would skip every pixel of a culled instance).  Measured on
    # v5e at the bench scene (100k near-isotropic splats, 960x544): culls
    # 13.3% of instances but the widened (cap,8) rank-row gather + cull
    # math cost ~7 ms against ~4 ms of blend savings → net +2.7 ms/step,
    # so it defaults OFF.  It pays off where rects are large and
    # anisotropic (the AABB's corner tiles), and under GSP it also shrinks
    # the instance all_to_all volume.
    exact_tile_cull: bool = False
    # Staircase-interval expansion (binning._bin_splats_staircase): counts
    # each gaussian's exactly-kept tiles per tile row BEFORE slot
    # assignment, so `total` — and every cap-sized sort/gather plus the
    # blend walk — shrinks, unlike exact_tile_cull which only retags
    # already-assigned slots.  Output- and gradient-preserving (kept set
    # ⊇ the exact cull's).  row_cap is the static tile-row capacity
    # (0 → instance_cap // 2; rows ≤ AABB instances, overflow drops the
    # deepest gaussians' rows with prefix semantics like instance_cap).
    staircase_cull: bool = False
    row_cap: int = 0

    def blend_cfg(self, render_geo: bool, depth_only: bool) -> BlendConfig:
        return BlendConfig(
            tile_h=self.tile_h,
            tile_w=self.tile_w,
            buffer_len=self.buffer_len,
            render_geo=render_geo,
            depth_only=depth_only,
        )


@struct.dataclass
class RenderResult:
    render: jnp.ndarray              # (H, W, 3) composited colour (+bg)
    radii: jnp.ndarray               # (P,) int32 screen radii (0 = culled)
    final_t: jnp.ndarray             # (H, W)
    n_contrib: jnp.ndarray           # (H, W) int32
    normal: jnp.ndarray              # (H, W, 3) rendered plane normals
    median_depth: jnp.ndarray        # (H, W)
    n_instances: jnp.ndarray         # () int32 (overflow diagnostics)
    ibr: Optional[IBROutputs]        # image-based outputs (render_geo only)
    n_rows: jnp.ndarray = 0          # () int32 staircase rows (0 = AABB)


def _padded(size: int, tile: int) -> int:
    return -(-size // tile) * tile


def mark_visible(xyz: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """(P,) bool frustum-culling mask: view-space depth > 0.2 (reference
    GaussianRasterizer.markVisible → in_frustum, diff_plane_rasterization/
    __init__.py:283-292 / cuda_rasterizer/auxiliary.h:143-168)."""
    z = xyz @ cam.view[2, :3] + cam.view[2, 3]
    return z > 0.2


def _validate_inputs(xyz, scale, quat, opacity, sh_coeffs, normal_world,
                     plane_offset, screen_dummy, rgb_override):
    """Input contract of the reference rasterizer bindings
    (diff_plane_rasterization/__init__.py:294-316, rasterize_points.cu
    CHECK_INPUT): consistent leading dim, fixed trailing shapes, exactly
    one color source."""
    P = xyz.shape[0]
    specs = [("xyz", xyz, (3,)), ("scale", scale, (3,)),
             ("quat", quat, (4,)), ("opacity", opacity, ()),
             ("normal_world", normal_world, (3,)),
             ("plane_offset", plane_offset, ())]
    if screen_dummy is not None:
        specs.append(("screen_dummy", screen_dummy, (2,)))
    for name, arr, trail in specs:
        if arr.shape != (P,) + trail:
            raise ValueError(
                f"rasterize: {name} must have shape {(P,) + trail}, got "
                f"{arr.shape}")
    if (sh_coeffs is None) == (rgb_override is None):
        raise ValueError(
            "rasterize: provide exactly one of sh_coeffs or rgb_override")
    if sh_coeffs is not None and (
            sh_coeffs.ndim != 3 or sh_coeffs.shape[0] != P
            or sh_coeffs.shape[2] != 3):
        raise ValueError(
            f"rasterize: sh_coeffs must be (P, n_sh, 3), got "
            f"{sh_coeffs.shape}")
    if rgb_override is not None and rgb_override.shape != (P, 3):
        raise ValueError(
            f"rasterize: rgb_override must be (P, 3), got "
            f"{rgb_override.shape}")


def rasterize(
    *,
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    quat: jnp.ndarray,
    opacity: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    active_sh_degree,
    normal_world: jnp.ndarray,
    plane_offset: jnp.ndarray,
    cam: Camera,
    bg: jnp.ndarray,
    cfg: RasterConfig,
    src: Optional[SourceViews] = None,
    alive: Optional[jnp.ndarray] = None,
    screen_dummy: Optional[jnp.ndarray] = None,
    screen_dummy_abs: Optional[jnp.ndarray] = None,
    render_geo: bool = True,
    depth_only: bool = False,
    rgb_override: Optional[jnp.ndarray] = None,
    viewport_row0=None,
    viewport_rows: Optional[int] = None,
) -> RenderResult:
    """Differentiable render.  With `viewport_row0`/`viewport_rows` set,
    only the horizontal band of rows [row0, row0+rows) is rasterized —
    the unit of image-space sharding across a device mesh (row0 may be a
    traced multiple of tile_h, rows is static)."""
    P = xyz.shape[0]
    _validate_inputs(xyz, scale, quat, opacity, sh_coeffs, normal_world,
                     plane_offset, screen_dummy, rgb_override)
    band = viewport_rows is not None
    rows = viewport_rows if band else cam.height
    row0 = viewport_row0 if band else 0
    Hp = _padded(rows, cfg.tile_h)
    Wp = _padded(cam.width, cfg.tile_w)
    tiles_x = Wp // cfg.tile_w
    tiles_y = Hp // cfg.tile_h

    sp = preprocess.preprocess(
        xyz, scale, quat, opacity, sh_coeffs, active_sh_degree,
        normal_world, plane_offset, cam, cfg.tile_h, cfg.tile_w,
        alive=alive, rgb_override=rgb_override,
    )
    if band:
        ty0 = jnp.asarray(row0, jnp.int32) // cfg.tile_h
        rmin_y = jnp.clip(sp.rect_min[:, 1] - ty0, 0, tiles_y)
        rmax_y = jnp.clip(sp.rect_max[:, 1] - ty0, 0, tiles_y)
        # gate by the ORIGINAL n_tiles: preprocess culls (dead / behind /
        # transparent) by zeroing n_tiles while leaving the rect garbage —
        # recomputing from rects alone would resurrect those Gaussians
        n_tiles = jnp.where(
            sp.n_tiles > 0,
            (sp.rect_max[:, 0] - sp.rect_min[:, 0]) * (rmax_y - rmin_y), 0)
        sp = sp.replace(
            rect_min=sp.rect_min.at[:, 1].set(rmin_y),
            rect_max=sp.rect_max.at[:, 1].set(rmax_y),
            n_tiles=n_tiles,
            radius=jnp.where(n_tiles > 0, sp.radius, 0),
        )
    cull_tab = None
    if cfg.exact_tile_cull or cfg.staircase_cull:
        # exact per-instance tile/ellipse test (see bin_splats): mean in
        # band-local pixel coords + conic + the ln(255*opacity) power
        # threshold of the kernel's alpha >= 1/255 ok-gate
        m2c = lax.stop_gradient(sp.mean2d)
        con = lax.stop_gradient(sp.conic)
        thr = jnp.log(jnp.maximum(255.0 * lax.stop_gradient(sp.opacity),
                                  1.000001))
        row0f = jnp.asarray(row0, jnp.float32)
        cull_tab = jnp.stack(
            [m2c[:, 0], m2c[:, 1] - row0f,
             con[:, 0], con[:, 1], con[:, 2], thr], axis=1)
    bins = binning.bin_splats(sp, tiles_x, tiles_y, cfg.instance_cap,
                              with_gauss_id=False, cull_tab=cull_tab,
                              tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                              staircase=cfg.staircase_cull,
                              row_cap=cfg.row_cap or cfg.instance_cap // 2)

    mean2d = sp.mean2d
    if screen_dummy is not None:
        mean2d = mean2d + screen_dummy
    if screen_dummy_abs is None:
        screen_dummy_abs = jnp.zeros((P, 2), jnp.float32)

    # One packed per-Gaussian feature table → ONE per-instance row gather
    # (cap-sized gathers are the expensive primitive on TPU, ~8 ns/element;
    # gathering 16-float rows once beats eight per-attribute gathers).
    feats_g = jnp.stack(
        [mean2d[:, 0], mean2d[:, 1],
         sp.conic[:, 0], sp.conic[:, 1], sp.conic[:, 2],
         sp.opacity,
         sp.rgb[:, 0], sp.rgb[:, 1], sp.rgb[:, 2],
         sp.plane_normal[:, 0], sp.plane_normal[:, 1], sp.plane_normal[:, 2],
         sp.plane_dist,
         screen_dummy_abs[:, 0], screen_dummy_abs[:, 1]],
        axis=1,
    )
    # 15 columns, not CF=16: blend_packed zero-pads the kernel's 16th
    # channel itself, so the cap-sized pack gather and the slot-keyed
    # pack-bwd sorts never move the dead pad column.
    # pack_rows: one per-instance row gather fwd + gather/cumsum segment-sum
    # bwd (replaces XLA's cap-sized scatter-add transpose); zeroes invalid
    # rows (clipped gather indices can land on dead Gaussians whose
    # non-finite attributes poison reverse-mode cotangents even when masked)
    feats_inst = binning.pack_rows(feats_g, bins)

    bcfg = cfg.blend_cfg(render_geo, depth_only)
    if cfg.backend == "oracle":
        inst = Instances(
            mean2d=feats_inst[:, 0:2],
            conic=feats_inst[:, 2:5],
            opacity=feats_inst[:, 5],
            rgb=feats_inst[:, 6:9],
            normal=feats_inst[:, 9:12],
            dist=feats_inst[:, 12],
        )
        blend = blend_oracle.blend_oracle(
            inst, bins, Wp, Hp, cam.fx, cam.fy, cam.cx, cam.cy, bcfg,
            row0=row0,
        )
    else:
        from ibgs_tpu.ops import blend_pallas
        blend = blend_pallas.blend_packed(
            feats_inst, bins, Wp, Hp,
            cam.fx, cam.fy, cam.cx, cam.cy, bcfg, row0=row0,
        )

    H, W = rows, cam.width
    blend = BlendOutputs(
        color=blend.color[:H, :W],
        normal=blend.normal[:H, :W],
        final_t=blend.final_t[:H, :W],
        n_contrib=blend.n_contrib[:H, :W],
        buf_depth=blend.buf_depth[:H, :W],
        buf_weight=blend.buf_weight[:H, :W],
        buf_contrib=blend.buf_contrib[:H, :W],
    )

    out_color = blend.color + blend.final_t[..., None] * bg[None, None, :]

    ibr = None
    if depth_only:
        median = epilogue.median_depth_only(blend)
    elif render_geo:
        assert src is not None, "render_geo requires SourceViews"
        ibr = epilogue.ibr_epilogue(blend, cam, src, cfg.depth_error_threshold,
                                    row0=row0,
                                    mix_precision=cfg.mix_precision)
        median = ibr.median_depth
    else:
        median = jnp.zeros((H, W), jnp.float32)

    return RenderResult(
        render=out_color,
        radii=sp.radius,
        final_t=blend.final_t,
        n_contrib=blend.n_contrib,
        normal=blend.normal,
        median_depth=median,
        n_instances=bins.n_instances,
        ibr=ibr,
        n_rows=bins.n_rows,
    )
