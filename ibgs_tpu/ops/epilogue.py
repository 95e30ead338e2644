"""Image-based-rendering epilogue.

The per-pixel tail of the reference forward kernel (forward.cu:496-663):
median plane-intersection depth from the buffer, reprojection of every
buffer entry into each source view with bilinear colour sampling, occlusion
testing of the median point against cached source depth maps, per-valid-view
packed warped colours + camera features, and the world-space viewing ray.

On TPU this stage is pure `jnp`: the bilinear samples are gathers (XLA's
gather replaces CUDA layered textures), and JAX autodiff supplies the
backward chain the reference hand-derives (backward.cu:692-767: bilinear
texture gradients → projection Jacobian dp/dd → plane parameters).

Gradient-flow parity notes (matching the reference autograd contract,
diff_plane_rasterization/__init__.py:117-250):
  * source images / source depths / ref-to-src transforms / source camera
    positions are constants (stop_gradient);
  * `cam_feat`, `camera_ray`, `min_depth_diff` and the validity outputs
    carry no gradient (the CUDA op returns no grads for them);
  * `warped_image` and `median_depth` are differentiable w.r.t. the buffer
    depths/weights, which the blend VJP chains to plane params and alphas.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ibgs_tpu.core.camera import Camera
from ibgs_tpu.ops.blend_common import BlendOutputs

EPS = 1.0e-8


@struct.dataclass
class SourceViews:
    """A stack of S source (training) views for the image-based path."""
    images: jnp.ndarray      # (S, H, W, 3) colours
    depths: jnp.ndarray      # (S, H, W) cached rendered depths
    ref_to_src: jnp.ndarray  # (S, 4, 4) reference-camera → source-camera
    cam_pos: jnp.ndarray     # (S, 3) world-space source centres
    count: jnp.ndarray       # () int32 number of real views (<= S)


@struct.dataclass
class IBROutputs:
    median_depth: jnp.ndarray     # (H, W)
    camera_ray: jnp.ndarray       # (H, W, 3) world ray through median point
    warped_image: jnp.ndarray     # (S, H, W, 3) packed by valid order
    cam_feat: jnp.ndarray         # (S, H, W, 4) packed (Δcam-pos, ray-dot)
    min_depth_diff: jnp.ndarray   # (H, W)
    valid_src_index: jnp.ndarray  # (S, H, W) int32, -1 padded
    valid_src_weight: jnp.ndarray  # (S, H, W) per-view buffer-weight sums
    use_first_src_mask: jnp.ndarray  # (H, W) int32
    low_contrib: jnp.ndarray      # (H, W) int32 median-window low (bwd cache)
    high_contrib: jnp.ndarray     # (H, W) int32 median-window high


def bilinear_sample(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Clamped bilinear sampling. img: (H, W, C) or (H, W); u, v: pixel coords.

    Matches the layered-texture path of the reference (texel-centre
    convention with clamp-to-edge addressing, forward.cu:550).
    Reference implementation (four corner gathers); the hot path uses
    pack_bilinear_corners + bilinear_sample_packed below, which TPU row
    gathers make ~4x cheaper (gather cost is per ROW, nearly independent
    of row width up to ~16 f32 lanes — measured on v5e).
    """
    H, W = img.shape[0], img.shape[1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    x0 = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    i00 = img[y0, x0]
    i01 = img[y0, x1]
    i10 = img[y1, x0]
    i11 = img[y1, x1]
    if img.ndim == 3:
        fu = fu[..., None]
        fv = fv[..., None]
    return ((1 - fu) * (1 - fv) * i00 + fu * (1 - fv) * i01
            + (1 - fu) * fv * i10 + fu * fv * i11)


def pack_bilinear_corners(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) or (H, W, C) → (H·W, 4·C) table whose row y·W+x holds the 2x2
    clamp-to-edge footprint [I(y,x) | I(y,x+1) | I(y+1,x) | I(y+1,x+1)].

    One row gather from this table replaces four corner gathers (exact same
    clamp semantics as bilinear_sample: x1 = clip(x0+1), y1 = clip(y0+1))."""
    if img.ndim == 2:
        img = img[..., None]
    H, W, C = img.shape
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    downright = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.concatenate([img, right, down, downright],
                           axis=-1).reshape(H * W, 4 * C)


def bilinear_sample_packed(packed: jnp.ndarray, H: int, W: int,
                           u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample via ONE row gather from a pack_bilinear_corners
    table.  Returns u.shape + (C,) (C=1 stays unsqueezed for ndim-2
    sources — callers slice [..., 0])."""
    C = packed.shape[1] // 4
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0).reshape(-1, 1)
    fv = (v - v0).reshape(-1, 1)
    x0 = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    rows = packed[(y0 * W + x0).reshape(-1)]          # (n, 4C)
    out = ((1 - fu) * (1 - fv) * rows[:, :C]
           + fu * (1 - fv) * rows[:, C:2 * C]
           + (1 - fu) * fv * rows[:, 2 * C:3 * C]
           + fu * fv * rows[:, 3 * C:])
    return out.reshape(u.shape + (C,))


def _proj_view(bd, r2s_s, pdx, pdy, intr, Hs, Ws):
    """Projection chain of one source view, shared by the warp forward and
    its backward recompute: buffer depths -> source pixel coords.

    bd is (B, H, W) — buffer-entry-MAJOR.  With B minor the downstream
    reshape/sum/broadcast ops force (3,H,W,B)-transposed layout copies
    (~20 ms/step at 960x544, trace-measured); with B leading, the B-sum is
    four contiguous slice adds and the backward broadcast is free."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    px_, py_, pz_ = pdx[None] * bd, pdy[None] * bd, bd

    def xf(i):
        return (r2s_s[i, 0] * px_ + r2s_s[i, 1] * py_
                + r2s_s[i, 2] * pz_ + r2s_s[i, 3])

    qx, qy, qz = xf(0), xf(1), xf(2)                        # (B,H,W)
    inv_z = 1.0 / (qz + EPS)
    pu = qx * fx * inv_z + cx
    pv = qy * fy * inv_z + cy
    inb = (pu >= 0.0) & (pu <= Ws - 1.0) & (pv >= 0.0) & (pv <= Hs - 1.0)
    return pu, pv, qx, qy, inv_z, inb


RGB10_SCALE = 1023.0


def pack_rgb10(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) colours in [0,1] → (H, W) int32, 10 bits per channel.

    Source images come from 8-bit files (reference uploads them to f32
    textures, rasterizer_impl.cu:67-133); a 10-bit fixed-point grid carries
    more precision than the 8-bit content, and packing a texel into ONE
    int32 cuts the warp-gather row width 12→4 (the gather runs ~15 GB/s
    effective on v5e — bytes moved are the cost)."""
    q = jnp.round(jnp.clip(img, 0.0, 1.0) * RGB10_SCALE).astype(jnp.int32)
    return (q[..., 0] << 20) | (q[..., 1] << 10) | q[..., 2]


def pack_bilinear_corners_rgb10(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) colours → (H·W, 4) int32 table whose row y·W+x holds the
    rgb10-packed 2x2 clamp-to-edge footprint (same clamp semantics as
    pack_bilinear_corners)."""
    p = pack_rgb10(img)                                   # (H, W)
    H, W = p.shape
    right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    down = jnp.concatenate([p[1:], p[-1:]], axis=0)
    downright = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.stack([p, right, down, downright], axis=-1).reshape(H * W, 4)


def _unpack_rgb10(v: jnp.ndarray):
    """int32 rgb10 → three f32 arrays in [0,1] (same shape as v)."""
    s = 1.0 / RGB10_SCALE
    return (((v >> 20) & 1023).astype(jnp.float32) * s,
            ((v >> 10) & 1023).astype(jnp.float32) * s,
            (v & 1023).astype(jnp.float32) * s)


import os as _os

# The warp core's consumers re-read the 16-byte gathered rows once per
# fused pass (12+ passes/view across fwd+bwd, trace-measured ~5 ms/step
# of (BHW,) loop fusions at 960x544).  An optimization_barrier after the
# corner mix materialises the three 4-byte channel arrays once so later
# passes read 8.3 MB instead of 33 MB — measured A/B on v5e: a LOSS
# (122.8 vs 120.0 ms/step): the extra 25 MB write+read outweighs the
# saved re-reads, i.e. XLA's default fusion already wins.  Kept as an
# experiment flag, default OFF.
_WARP_BARRIER = _os.environ.get("IBGS_WARP_BARRIER", "0") == "1"


def _corner_mix_rgb10(rows, fu, fv):
    """Bilinear mix of an rgb10 footprint.  rows: (n, 4) int32; fu, fv:
    (n,) 1-D fractional coords.  Returns three (n,) channel arrays —
    keeping channels as separate 1-D arrays avoids every minor-dim-3
    layout pad."""
    w00 = (1 - fu) * (1 - fv)
    w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv
    w11 = fu * fv
    out = []
    c00 = _unpack_rgb10(rows[:, 0])
    c01 = _unpack_rgb10(rows[:, 1])
    c10 = _unpack_rgb10(rows[:, 2])
    c11 = _unpack_rgb10(rows[:, 3])
    for ch in range(3):
        out.append(w00 * c00[ch] + w01 * c01[ch]
                   + w10 * c10[ch] + w11 * c11[ch])
    if _WARP_BARRIER:
        out = list(lax.optimization_barrier(tuple(out)))
    return out


def _warp_views_impl(bd, bw, tables, r2s, pdx, pdy, intr):
    """Reproject every buffer entry into each source view and accumulate
    weighted bilinear colours (forward.cu:520-563).

    bd, bw: (B, H, W) buffer-MAJOR depths / weights; tables: (S, Hs, Ws, 4)
    int32 rgb10-packed 2x2 colour footprints; r2s: (S, 4, 4); pdx, pdy: (H, W) pixel
    ray slopes; intr: (4,) [fx, fy, cx, cy].  Per-view loop: stacking the
    gathered rows into one (S,H,W,B,12) slab costs ~14 ms of layout copies
    at 960x544 (trace-measured).  Everything stays FLAT (BHW, k) through
    the gather + corner mix; the B-sum is a leading-axis reduce of
    contiguous (HW, 3) blocks (B-minor forms forced ~20 ms/step of
    (3,H,W,B) transposes)."""
    S, Hs, Ws = tables.shape[0], tables.shape[1], tables.shape[2]
    B, H, W = bd.shape
    wsc, ws, rows_all = [], [], []
    for s in range(S):
        pu, pv, _qx, _qy, _inv_z, inb = _proj_view(
            bd, r2s[s], pdx, pdy, intr, Hs, Ws)
        w_eff = bw * inb.astype(bw.dtype)                   # (B,H,W)
        x0 = jnp.clip(jnp.floor(pu).astype(jnp.int32), 0, Ws - 1)
        y0 = jnp.clip(jnp.floor(pv).astype(jnp.int32), 0, Hs - 1)
        # zero-weight rows (empty buffer slots, out-of-bounds projections)
        # gather row 0 instead: their colour is multiplied by w_eff == 0 in
        # every output, and the one backward term that would see it (dbw of
        # an EMPTY slot) is provably discarded by the blend kernel (empty
        # slots have buf_contrib == 0, which never matches a contributor),
        # so outputs and end-to-end gradients are unchanged — while the
        # repeated index-0 rows are cache-hot instead of ~4.3 ns/row HBM
        # touches (often 30-50%+ of B·H·W rows: the below-buffer is empty
        # wherever T never crossed 0.5).
        idx = jnp.where(w_eff > 0.0, y0 * Ws + x0, 0)
        rows = tables[s].reshape(Hs * Ws, 4)[
            idx.reshape(-1)]                                # (BHW, 4) int32
        fu = (pu - jnp.floor(pu)).reshape(-1)
        fv = (pv - jnp.floor(pv)).reshape(-1)
        col = _corner_mix_rgb10(rows, fu, fv)               # 3 x (BHW,)
        wf = w_eff.reshape(-1)
        wsc.append(jnp.stack(
            [(col[ch] * wf).reshape(B, H * W).sum(axis=0)
             for ch in range(3)], axis=-1).reshape(H, W, 3))
        ws.append(w_eff.sum(axis=0))
        rows_all.append(rows)
    return jnp.stack(wsc, 0), jnp.stack(ws, 0), tuple(rows_all)


@jax.custom_vjp
def _warp_views(bd, bw, tables, r2s, pdx, pdy, intr):
    """Differentiable warp accumulation with a HAND-DERIVED backward.

    XLA autodiff of this chain materialises ~20 (S,H,W,B) slabs plus
    layout reshapes (~70 ms/step at 960x544, measured); the analytic VJP
    (the same closed form as reference backward.cu:729-757: bilinear
    texture gradient chained through the projection Jacobian dp/dd)
    recomputes the elementwise chain and reads back only the saved
    gathered rows."""
    wsum_color, wsum, _ = _warp_views_impl(bd, bw, tables, r2s, pdx, pdy,
                                           intr)
    return wsum_color, wsum


def _warp_views_fwd(bd, bw, tables, r2s, pdx, pdy, intr):
    wsum_color, wsum, rows = _warp_views_impl(bd, bw, tables, r2s, pdx, pdy,
                                              intr)
    dims = (tables.shape[1], tables.shape[2])
    return (wsum_color, wsum), (bd, bw, rows, r2s, pdx, pdy, intr, dims)


def _warp_views_bwd(res, cts):
    bd, bw, rows_all, r2s, pdx, pdy, intr, dims = res
    g_wsc, g_wsum = cts
    fx, fy = intr[0], intr[1]
    Hs, Ws = dims
    S = len(rows_all)

    B, H, W = bd.shape
    dbd = jnp.zeros_like(bd)
    dbw = jnp.zeros_like(bw)
    for s in range(S):
        pu, pv, qx, qy, inv_z, inb = _proj_view(
            bd, r2s[s], pdx, pdy, intr, Hs, Ws)
        inbf = inb.astype(bw.dtype)
        w_eff_f = (bw * inbf).reshape(-1)                   # (BHW,)
        fu = (pu - jnp.floor(pu)).reshape(-1)
        fv = (pv - jnp.floor(pv)).reshape(-1)
        rows = rows_all[s]                                  # (BHW,4) int32
        c00 = _unpack_rgb10(rows[:, 0])
        c01 = _unpack_rgb10(rows[:, 1])
        c10 = _unpack_rgb10(rows[:, 2])
        c11 = _unpack_rgb10(rows[:, 3])
        w00 = (1 - fu) * (1 - fv)
        w01 = fu * (1 - fv)
        w10 = (1 - fu) * fv
        w11 = fu * fv

        # leading-axis broadcasts are tile-repeats, not transposes
        def bcast(x):                                       # (H,W) -> (BHW,)
            return jnp.broadcast_to(x.reshape(1, H * W),
                                    (B, H * W)).reshape(-1)

        # d wsum = sum_b w_eff ; d wsum_color = sum_b col*w_eff
        dw_eff = bcast(g_wsum[s])
        du = jnp.zeros_like(w_eff_f)
        dv = jnp.zeros_like(w_eff_f)
        for ch in range(3):
            col_ch = (w00 * c00[ch] + w01 * c01[ch]
                      + w10 * c10[ch] + w11 * c11[ch])
            gc_ch = bcast(g_wsc[s][..., ch])
            dw_eff = dw_eff + col_ch * gc_ch
            dcol_ch = w_eff_f * gc_ch
            dI_du = (1 - fv) * (c01[ch] - c00[ch]) + fv * (c11[ch] - c10[ch])
            dI_dv = (1 - fu) * (c10[ch] - c00[ch]) + fu * (c11[ch] - c01[ch])
            du = du + dcol_ch * dI_du
            dv = dv + dcol_ch * dI_dv
        dbw = dbw + (dw_eff * inbf.reshape(-1)).reshape(B, H, W)
        du = du.reshape(B, H, W)
        dv = dv.reshape(B, H, W)

        # projection Jacobian dp/d(depth): q = A.(pdx*d, pdy*d, d) + t, so
        # dq/dd = A.(pdx, pdy, 1) =: r  (reference backward.cu:738-757)
        def rdir(i):
            return (r2s[s, i, 0] * pdx + r2s[s, i, 1] * pdy + r2s[s, i, 2])

        rx, ry, rz = rdir(0), rdir(1), rdir(2)              # (H,W)
        du_dbd = fx * (rx[None] - qx * inv_z * rz[None]) * inv_z
        dv_dbd = fy * (ry[None] - qy * inv_z * rz[None]) * inv_z
        dbd = dbd + du * du_dbd + dv * dv_dbd

    # zero cotangents for the constant inputs (upstream stop_gradients
    # drop them; XLA DCEs the broadcasts).  The int32 tables take a float0
    # cotangent per the JAX integer-input convention.
    import numpy as _np
    d_tables = _np.zeros((S, Hs, Ws, 4), dtype=jax.dtypes.float0)
    return (dbd, dbw, d_tables, jnp.zeros_like(r2s), jnp.zeros_like(pdx),
            jnp.zeros_like(pdy), jnp.zeros_like(intr))


_warp_views.defvjp(_warp_views_fwd, _warp_views_bwd)


# Occlusion-depth footprint storage experiment: the depth tables are
# (Hs·Ws, 4) f32 16-byte rows (33.4 MB/view at 1080p — uncached, and the
# occlusion gathers cost 36 ms/step there).  IBGS_DEPTH_F16=1 packs each
# 2x2 footprint as FOUR f16s in TWO int32 lanes → 8-byte rows, 4x smaller
# table (int32 lanes dodge the 2-byte-table layout flip).  f16 keeps
# ~5e-4 relative precision against the 0.01 relative depth-error
# threshold (the reference's own texture filtering interpolates at 8-bit
# fractional precision, forward.cu:550's tex2DLayered).  Default OFF
# until the 1080p A/B wins on hardware.
_DEPTH_F16 = _os.environ.get("IBGS_DEPTH_F16", "0") == "1"


def pack_bilinear_corners_f16(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) f32 → (H·W, 2) int32; row y·W+x = [f16(d00)|f16(d01),
    f16(d10)|f16(d11)] (same clamp semantics as pack_bilinear_corners)."""
    H, W = img.shape
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    downright = jnp.concatenate([right[1:], right[-1:]], axis=0)

    def pk(a, b):
        ab = jnp.stack([a.astype(jnp.float16), b.astype(jnp.float16)],
                       axis=-1)
        return lax.bitcast_convert_type(ab, jnp.int32)

    return jnp.stack([pk(img, right), pk(down, downright)],
                     axis=-1).reshape(H * W, 2)


def bilinear_sample_packed_f16(packed: jnp.ndarray, H: int, W: int,
                               u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample from a pack_bilinear_corners_f16 table → u.shape."""
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0).reshape(-1)
    fv = (v - v0).reshape(-1)
    x0 = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    rows = packed[(y0 * W + x0).reshape(-1)]          # (n, 2) int32
    c = lax.bitcast_convert_type(rows, jnp.float16).astype(jnp.float32)
    out = ((1 - fu) * (1 - fv) * c[:, 0, 0] + fu * (1 - fv) * c[:, 0, 1]
           + (1 - fu) * fv * c[:, 1, 0] + fu * fv * c[:, 1, 1])
    return out.reshape(u.shape)


def median_depth_only(blend: BlendOutputs) -> jnp.ndarray:
    """Depth-only epilogue (forward.cu:507-510)."""
    tot = blend.buf_weight.sum(-1)
    return (blend.buf_weight * blend.buf_depth).sum(-1) / (tot + EPS)


def ibr_epilogue(
    blend: BlendOutputs,
    cam: Camera,
    src: SourceViews,
    depth_error_threshold: float = 0.01,
    row0=0,
    mix_precision: bool = False,
) -> IBROutputs:
    H, W = blend.final_t.shape          # band (sharded) dims
    S, Hs = src.images.shape[0], src.images.shape[1]  # full source frames

    images = lax.stop_gradient(src.images)
    depths = lax.stop_gradient(src.depths)
    r2s = lax.stop_gradient(src.ref_to_src)
    src_pos = lax.stop_gradient(src.cam_pos)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32) + row0
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    pdx = (gx - cam.cx) / cam.fx   # (H, W)
    pdy = (gy - cam.cy) / cam.fy

    # buffer-entry-MAJOR (B, H, W) forms: leading-B keeps every warp-core
    # reshape/broadcast/reduce layout-free (B-minor forced ~20 ms/step of
    # (3,H,W,B) transposes at 960x544 — trace-measured); two 8 MB
    # transposes here replace them
    bw = jnp.transpose(blend.buf_weight, (2, 0, 1))   # (B, H, W)
    bd = jnp.transpose(blend.buf_depth, (2, 0, 1))
    used = bw != 0.0

    # --- per-buffer-entry reprojection & colour warping (forward.cu:520-563)
    # via the warp core with the hand-derived VJP (_warp_views); the tiny
    # 3x3 transforms stay elementwise — batched small matmuls are
    # pathological on the MXU.
    Ws = src.images.shape[2]
    # Colour tables are rgb10 fixed point packed into int32 (lossless for
    # 8-bit image content; the reference's textures are f32 uploads of the
    # same 8-bit files).  One int32 per texel cuts the warp-gather row
    # width 12->4 f32-equivalents; bf16 tables were measured SLOWER (XLA
    # flips the table layout for 2-byte types, doubling per-row cost:
    # 24.6 vs 12.9 ms/view at 960x544 on v5e).
    del mix_precision
    tables = jnp.stack(
        [pack_bilinear_corners_rgb10(images[s]).reshape(Hs, Ws, 4)
         for s in range(S)], axis=0)
    intr = jnp.stack([jnp.asarray(cam.fx, jnp.float32),
                      jnp.asarray(cam.fy, jnp.float32),
                      jnp.asarray(cam.cx, jnp.float32),
                      jnp.asarray(cam.cy, jnp.float32)])
    wsum_color, wsum = _warp_views(bd, bw, tables, r2s, pdx, pdy, intr)

    tot_w = (bw * used).sum(0)                              # (H,W)
    median = (bw * bd).sum(0) / (tot_w + EPS)

    # median contributor window cache for the blend backward
    # (forward.cu:515-567: min/max over used entries, seeded with slot 0)
    contrib = blend.buf_contrib                             # (H,W,B)
    used_hwb = blend.buf_weight != 0.0
    low = jnp.minimum(
        jnp.where(used_hwb, contrib, jnp.int32(2**30)).min(-1),
        contrib[..., 0]
    )
    high = jnp.maximum(
        jnp.where(used_hwb, contrib, jnp.int32(0)).max(-1), contrib[..., 0]
    )

    # --- median point & world-space viewing ray (forward.cu:569-592)
    mpt = jnp.stack([pdx * median, pdy * median, median], axis=-1)  # (H,W,3)
    d = mpt - cam.view[:3, 3]
    V = cam.view[:3, :3]
    mpt_world = jnp.stack(
        [d[..., 0] * V[0, k] + d[..., 1] * V[1, k] + d[..., 2] * V[2, k]
         for k in range(3)], axis=-1)
    ray = mpt_world - cam.cam_pos
    ray = ray * lax.rsqrt((ray * ray).sum(-1, keepdims=True) + EPS)
    ray = lax.stop_gradient(ray)
    mpt_world_c = lax.stop_gradient(mpt_world)

    # --- occlusion test of the median point per source (forward.cu:594-656)
    mpt_c = lax.stop_gradient(mpt)
    mx, my, mz = mpt_c[..., 0][None], mpt_c[..., 1][None], mpt_c[..., 2][None]

    def xform_m(M, i):
        return (M[:, i, 0][:, None, None] * mx + M[:, i, 1][:, None, None] * my
                + M[:, i, 2][:, None, None] * mz + M[:, i, 3][:, None, None])

    qmx, qmy, qmz = xform_m(r2s, 0), xform_m(r2s, 1), xform_m(r2s, 2)
    inv_zm = 1.0 / (qmz + EPS)
    pum = qmx * cam.fx * inv_zm + cam.cx
    pvm = qmy * cam.fy * inv_zm + cam.cy
    inbm = (pum >= 0.0) & (pum <= W - 1.0) & (pvm >= 0.0) & (pvm <= Hs - 1.0)
    if _DEPTH_F16:
        wdepth = jnp.stack(
            [bilinear_sample_packed_f16(pack_bilinear_corners_f16(depths[s]),
                                        Hs, Ws, pum[s], pvm[s])
             for s in range(S)], axis=0)
    else:
        wdepth = jnp.stack(
            [bilinear_sample_packed(pack_bilinear_corners(depths[s]),
                                    Hs, Ws, pum[s], pvm[s])[..., 0]
             for s in range(S)], axis=0
        )
    wdepth = jnp.where(inbm, wdepth, 0.0)
    depth_err = jnp.abs(wdepth - qmz) * inv_zm              # (S,H,W)

    src_real = jnp.arange(S, dtype=jnp.int32)[:, None, None] < src.count
    valid = (wdepth > 0.0) & (depth_err < depth_error_threshold) & src_real

    # --- pack valid sources first, preserving source order (forward.cu:626-655)
    # Static one-hot selection over the S (<=5) source slots instead of a
    # per-pixel argsort + take_along_axis (8M+ scalar gathers at 1080p):
    # rank[s] = #valid sources before s; packed slot k sums x[s] over the
    # unique s with valid[s] and rank[s]==k.  Entries past n_valid are
    # zero/-1 — exactly what the masked pack produced.
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=0) - 1   # (S,H,W)
    n_valid = valid.sum(axis=0)                              # (H,W)
    sel = [valid[s] & (rank[s] == jnp.arange(S)[:, None, None])
           for s in range(S)]                                # per-s (S,H,W)

    def pack(x):  # (S,H,W,...) valid-first packing along S (masked to 0)
        m = [sel[s].reshape(sel[s].shape + (1,) * (x.ndim - 3)) for s in
             range(S)]
        return sum(jnp.where(m[s], x[s][None], 0) for s in range(S))

    valid_p = jnp.arange(S, dtype=jnp.int32)[:, None, None] < n_valid
    warped = wsum_color / (wsum[..., None] + EPS)
    warped_p = pack(warped)

    src_dir = mpt_world_c[None] - src_pos[:, None, None, :]
    src_dir = src_dir * lax.rsqrt((src_dir * src_dir).sum(-1, keepdims=True) + EPS)
    ray_dot = (src_dir * ray[None]).sum(-1)                  # (S,H,W)
    dcam = (cam.cam_pos - src_pos)[:, None, None, :] * jnp.ones((S, H, W, 3))
    feat = jnp.concatenate([dcam, ray_dot[..., None]], axis=-1)  # (S,H,W,4)
    feat_p = lax.stop_gradient(pack(feat))

    src_ids = jnp.broadcast_to(
        jnp.arange(S, dtype=jnp.int32)[:, None, None], (S, H, W)
    )
    idx_p = jnp.where(valid_p, pack(src_ids), -1)
    wsum_p = pack(wsum)

    min_err = jnp.where(valid, depth_err, 1.0).min(axis=0)
    min_err = jnp.minimum(min_err, 1.0)

    return IBROutputs(
        median_depth=median,
        camera_ray=ray,
        warped_image=warped_p,
        cam_feat=feat_p,
        min_depth_diff=lax.stop_gradient(min_err),
        valid_src_index=idx_p,
        valid_src_weight=lax.stop_gradient(wsum_p),
        use_first_src_mask=valid[0].astype(jnp.int32),
        low_contrib=low,
        high_contrib=high,
    )
