"""Colour-fusion residual network + exposure correction.

Re-design of /root/reference/color_aggregation_network.py as Flax modules
on NHWC layouts (TPU-native conv layout).  Architecture parity:

  * per-view MLP 7→32→32 over (residual RGB, camera features);
  * mean/max aggregation over the ≤M source views;
  * concat with the world viewing ray + rendered colour (38 channels);
  * two-level conv hourglass (enc h→h→h/2→h/4, nearest-upsample decode
    with skip concats, 1x1 input-skip fusion, 1x1→3 head);
  * least-squares 3x4 affine exposure fit of the render against the first
    warped source view, fitted without gradients and applied
    differentiably (compute_exposure_affine_matrix :136-153);
  * `fuse_color` burn-in schedule: the Gaussian render path is detached
    until burn-in completes, then image_pred = burned_in·render + residual
    (fuse_color :156-241).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ibgs_tpu.ops.epilogue import bilinear_sample


class ConvDecoderAE(nn.Module):
    """Two-level hourglass with input skip, NHWC."""
    hidden: int

    @nn.compact
    def __call__(self, x):                      # (H, W, C=hidden)
        h = self.hidden
        conv = lambda c, k: nn.Conv(c, (k, k), padding="SAME")
        e1 = nn.relu(conv(h, 3)(x))
        p1 = nn.max_pool(e1, (2, 2), strides=(2, 2))
        e2 = nn.relu(conv(h // 2, 3)(p1))
        p2 = nn.max_pool(e2, (2, 2), strides=(2, 2))
        bott = nn.relu(conv(h // 4, 3)(p2))

        u2 = jax.image.resize(bott, e2.shape[:2] + bott.shape[-1:], "nearest")
        u2 = nn.relu(conv(h // 2, 3)(u2))
        d2 = nn.relu(conv(h // 2, 3)(jnp.concatenate([u2, e2], -1)))

        u1 = jax.image.resize(d2, e1.shape[:2] + d2.shape[-1:], "nearest")
        u1 = nn.relu(conv(h, 3)(u1))
        d1 = nn.relu(conv(h, 3)(jnp.concatenate([u1, e1], -1)))

        fused = nn.relu(conv(h, 1)(jnp.concatenate([d1, x], -1)))
        return conv(3, 1)(fused)


class ColorFusionResidualNet(nn.Module):
    """Aggregates per-view features into a per-pixel RGB residual."""
    per_view_feat_dim: int = 32
    feat_aggregate_mode: str = "mean"

    @nn.compact
    def __call__(self, view_feats, ray_dir, rendered):
        """view_feats: (H, W, S, 7); ray_dir: (H, W, 3); rendered: (H, W, 3)."""
        d = self.per_view_feat_dim
        f = nn.relu(nn.Dense(d)(view_feats))
        f = nn.relu(nn.Dense(d)(f))             # (H, W, S, d)
        if self.feat_aggregate_mode == "max":
            agg = f.max(axis=2)
        else:
            agg = f.mean(axis=2)
        x = jnp.concatenate([agg, ray_dir, rendered], axis=-1)
        return ConvDecoderAE(hidden=d + 6)(x)


def exposure_affine(render, first_warped, valid_mask):
    """Fit I_warp ≈ A·[I_render; 1] on valid pixels (no grad through the
    fit), apply A differentiably.  render/first_warped: (H, W, 3);
    valid_mask: (H, W) float/bool.  Solves via normal equations so the
    pixel set can stay static-shaped (masked) on TPU."""
    m = valid_mask.astype(render.dtype).reshape(-1, 1)
    X = jnp.concatenate(
        [render.reshape(-1, 3), jnp.ones_like(m)], axis=-1)       # (N, 4)
    Y = first_warped.reshape(-1, 3)
    Xs = lax.stop_gradient(X) * m
    Ys = lax.stop_gradient(Y) * m
    # Normal equations are cancellation-prone: TPU default matmul precision
    # is bf16 passes, which silently corrupted exactly this class of
    # computation before (3-NN init scales, SSIM variances — CLAUDE.md).
    hi = lax.Precision.HIGHEST
    G = jnp.matmul(Xs.T, Xs, precision=hi) + \
        1e-6 * jnp.eye(4, dtype=render.dtype)
    A = jnp.linalg.solve(G, jnp.matmul(Xs.T, Ys, precision=hi))   # (4, 3)
    out = (X @ A).reshape(render.shape)
    return out, A.T


def resize_align_corners(x: jnp.ndarray, H2: int, W2: int) -> jnp.ndarray:
    """Bilinear resize of (H, W, C) with the corner-to-corner convention of
    torch `F.interpolate(..., mode="bilinear", align_corners=True)` (the
    reference's residual_resolution_scale resampling,
    color_aggregation_network.py:201-239).  jax.image.resize uses the
    half-pixel convention, so this samples explicitly."""
    H, W = x.shape[0], x.shape[1]
    u = (jnp.linspace(0.0, W - 1.0, W2) if W2 > 1
         else jnp.zeros((1,), jnp.float32))
    v = (jnp.linspace(0.0, H - 1.0, H2) if H2 > 1
         else jnp.zeros((1,), jnp.float32))
    gu, gv = jnp.meshgrid(u, v, indexing="xy")
    return bilinear_sample(x, gu, gv)


def fuse_color(
    net: ColorFusionResidualNet,
    net_params,
    render: jnp.ndarray,          # (H, W, 3)
    warped_image: jnp.ndarray,    # (S, H, W, 3) valid-packed
    cam_feat: jnp.ndarray,        # (S, H, W, 4)
    camera_ray: jnp.ndarray,      # (H, W, 3)
    min_depth_diff: jnp.ndarray,  # (H, W)
    use_first_src_mask,           # (H, W) int
    burned_in_gauss,              # traced float in [0.5, 1]
    nb_visible: int,
    enable_exposure_correction: bool = False,
    residual_resolution_scale: float = 1.0,
    enable_mix_precision: bool = False,
):
    """Differentiable fusion step (reference fuse_color :156-241).

    The reference detaches the Gaussian branch until burn-in completes
    (`burned_in_gauss < 1`); with traced schedules we express the switch as
    g·x + (1-g)·stop_grad(x) with g = [burned_in >= 1].

    The reference's dynamic `nb_valid_warp_level` (skip the net if no view
    is valid) becomes a static `nb_visible` slice + an output gate, keeping
    shapes fixed under jit.
    """
    g = (burned_in_gauss >= 1.0).astype(render.dtype)

    def gate(x):
        return g * x + (1.0 - g) * lax.stop_gradient(x)

    render_g = gate(render)
    warped = gate(warped_image[:nb_visible])       # (S', H, W, 3)
    feat = gate(cam_feat[:nb_visible])             # (S', H, W, 4)
    ray = gate(camera_ray)
    mdd = lax.stop_gradient(min_depth_diff)

    if enable_exposure_correction:
        first = warped_image[0] * use_first_src_mask[..., None]
        render_g, _A = exposure_affine(render_g, first,
                                       use_first_src_mask)

    valid = (feat.sum(-1, keepdims=True) > 0.0).astype(render.dtype)
    residual_in = (warped - render_g[None]) * valid
    view_feats = jnp.concatenate([residual_in, feat], axis=-1)   # (S',H,W,7)
    view_feats = jnp.moveaxis(view_feats, 0, 2)                  # (H,W,S',7)

    if enable_mix_precision:
        # the autocast region of the reference (render.py:213-222 /
        # train.py's `with autocast()`): the aggregation net runs in
        # half precision — bf16 on TPU (MXU-native) — params and inputs
        # down-cast, residual up-cast back to f32
        bf = jnp.bfloat16
        params_lo = jax.tree.map(
            lambda a: a.astype(bf)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            net_params)

        def apply_net(vf, r, rg):
            return net.apply(params_lo, vf.astype(bf), r.astype(bf),
                             rg.astype(bf)).astype(render.dtype)
    else:
        def apply_net(vf, r, rg):
            return net.apply(net_params, vf, r, rg)

    H, W = render.shape[0], render.shape[1]
    if residual_resolution_scale != 1.0:
        # run the net at reduced resolution, upscale its residual
        # (color_aggregation_network.py:200-239)
        H2 = int(H * residual_resolution_scale)
        W2 = int(W * residual_resolution_scale)
        Sv = view_feats.shape[2]
        vf = resize_align_corners(
            view_feats.reshape(H, W, Sv * 7), H2, W2).reshape(H2, W2, Sv, 7)
        render_n = resize_align_corners(render_g, H2, W2)
        ray_n = resize_align_corners(ray, H2, W2)
        ray_n = ray_n / (jnp.linalg.norm(ray_n, axis=-1, keepdims=True)
                         + 1e-10)
        residual = apply_net(vf, ray_n, render_n)
        residual = resize_align_corners(residual, H, W)
    else:
        residual = apply_net(view_feats, ray, render_g)
    image_pred = burned_in_gauss * render_g + residual
    any_valid = (warped_image.sum(axis=(1, 2, 3)) != 0).sum() > 0
    return {
        "image_pred": image_pred,
        "residual": residual,
        "valid_warp_mask": (mdd < 0.999).astype(render.dtype),
        "burned_in_gauss": burned_in_gauss,
        "any_valid": any_valid,
        "exposed_render": render_g,
    }
