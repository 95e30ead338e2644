"""Reference (oracle) blend implementation in pure JAX.

Replicates, per pixel, the exact sequential semantics of the reference
forward blend kernel (forward.cu:305-665 `renderCUDA`): front-to-back alpha
compositing with early termination, plane-intersection depths, and the
two-part median-depth buffer (circular "before" sub-buffer while T > 0.5,
write-once "below" sub-buffer afterwards, early exit in depth-only mode when
the below buffer fills).

It is a `lax.scan` over instance slots vectorised across all pixels, so it
is slow but exactly ordered, and JAX autodiff through the scan provides
reference gradients.  The production Pallas kernel is validated against this
oracle (forward outputs and VJPs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ibgs_tpu.ops import blend_common as bc
from ibgs_tpu.ops.binning import TileBins
from ibgs_tpu.ops.blend_common import BlendConfig, BlendOutputs, Instances


def blend_oracle(
    inst: Instances,
    bins: TileBins,
    width: int,
    height: int,
    fx, fy, cx, cy,
    cfg: BlendConfig,
    row0=0,
) -> BlendOutputs:
    cap = inst.opacity.shape[0]
    tiles_x = -(-width // cfg.tile_w)
    N = height * width
    B = cfg.buffer_len

    px = jnp.tile(jnp.arange(width, dtype=jnp.float32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width) + row0
    ray_x = (px - cx) / fx
    ray_y = (py - cy) / fy
    tile_of_pix = (((py - row0).astype(jnp.int32)) // cfg.tile_h) * tiles_x + (
        px.astype(jnp.int32) // cfg.tile_w
    )
    start = bins.tile_start[tile_of_pix]  # (N,)
    stop = bins.tile_stop[tile_of_pix]

    def step(carry, xs):
        (T, done, C, nrm, before_ptr, below_cnt, bd, bw, bcontrib, last) = carry
        i, m2d, con, op, rgb, n3, dist = xs

        in_range = (i >= start) & (i < stop) & (~done)
        pos = (i - start + 1).astype(jnp.int32)

        dx = m2d[0] - px
        dy = m2d[1] - py
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        # clamp BEFORE the exp: an f32-indefinite conic (det = a*c - b^2
        # cancels to <= 0 on extreme-anisotropy needles) makes power > 0
        # somewhere, and exp(+huge) = inf turns the masked-out VJP into
        # 0 * inf = NaN — which the pack-bwd cumsum then spreads to EVERY
        # Gaussian's gradient (observed: prod-run collapse at iter ~1800).
        # Forward-identical: the ok gate already excludes power > 0
        # (reference forward.cu's `if (power > 0) continue;`).
        alpha = jnp.minimum(bc.ALPHA_CLAMP,
                            op * jnp.exp(jnp.minimum(power, 0.0)))
        ok = in_range & (power <= 0.0) & (alpha >= bc.ALPHA_MIN)
        test_t = T * (1.0 - alpha)
        crossing = test_t < bc.T_STOP
        contribute = ok & (~crossing)
        done = done | (ok & crossing)
        a_t = jnp.where(contribute, alpha * T, 0.0)

        if not cfg.depth_only:
            C = C + rgb[None, :] * a_t[:, None]

        if cfg.render_geo or cfg.depth_only:
            denom = n3[0] * ray_x + n3[1] * ray_y + n3[2] + bc.PLANE_EPS
            depth_i = -dist / denom
            has_depth = contribute & (depth_i > 0.0)
            push_before = has_depth & (T > 0.5)
            push_below = has_depth & (T <= 0.5) & (below_cnt < cfg.below_cap)
            slot = jnp.where(push_before, before_ptr, cfg.before_cap + below_cnt)
            push = push_before | push_below
            onehot = push[:, None] & (
                slot[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]
            )
            bd = jnp.where(onehot, depth_i[:, None], bd)
            bw = jnp.where(onehot, a_t[:, None], bw)
            bcontrib = jnp.where(onehot, pos[:, None], bcontrib)
            before_ptr = jnp.where(
                push_before, (before_ptr + 1) % cfg.before_cap, before_ptr
            )
            below_cnt = below_cnt + push_below.astype(jnp.int32)
            if cfg.depth_only:
                # forward.cu:484-488 — stop once the below buffer fills
                # (the filling instance still updates T / last contributor).
                done = done | (has_depth & (below_cnt == cfg.below_cap))

        if cfg.render_geo and not cfg.depth_only:
            nrm = nrm + n3[None, :] * a_t[:, None]

        T = jnp.where(contribute, test_t, T)
        last = jnp.where(contribute, pos, last)
        return (T, done, C, nrm, before_ptr, below_cnt, bd, bw, bcontrib, last), None

    carry0 = (
        jnp.ones((N,), jnp.float32),
        jnp.zeros((N,), bool),
        jnp.zeros((N, 3), jnp.float32),
        jnp.zeros((N, 3), jnp.float32),
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N, B), jnp.float32),
        jnp.zeros((N, B), jnp.float32),
        jnp.zeros((N, B), jnp.int32),
        jnp.zeros((N,), jnp.int32),
    )
    xs = (
        jnp.arange(cap, dtype=jnp.int32),
        inst.mean2d,
        inst.conic,
        inst.opacity,
        inst.rgb,
        inst.normal,
        inst.dist,
    )
    carry, _ = lax.scan(step, carry0, xs)
    (T, _done, C, nrm, _bp, _bc, bd, bw, bcontrib, last) = carry

    shp = (height, width)
    return BlendOutputs(
        color=C.reshape(height, width, 3),
        normal=nrm.reshape(height, width, 3),
        final_t=T.reshape(shp),
        n_contrib=last.reshape(shp),
        buf_depth=bd.reshape(height, width, B),
        buf_weight=bw.reshape(height, width, B),
        buf_contrib=bcontrib.reshape(height, width, B),
    )
