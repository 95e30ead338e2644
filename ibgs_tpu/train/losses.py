"""Training losses.

Parity targets: /root/reference/utils/loss_utils.py (l1/ssim/photometric
SSIM with an 11x11 sigma-1.5 Gaussian window) and the loss terms assembled
in /root/reference/train.py:302-366.

TPU notes: the SSIM window is an outer product of a 1-D Gaussian, so the
convolution is separable — two small depthwise convs that XLA fuses well.
Images are (H, W, C); everything is autodiff-friendly jnp.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

C1 = 0.01 ** 2
C2 = 0.03 ** 2


def l1(a, b):
    return jnp.abs(a - b).mean()


def l2(a, b):
    return ((a - b) ** 2).mean()


def psnr(a, b):
    mse = ((a - b) ** 2).mean()
    return -10.0 * jnp.log10(mse + 1e-12)


@functools.lru_cache(maxsize=None)
def _gauss_window(size: int = 11, sigma: float = 1.5):
    import numpy as np
    x = np.arange(size, dtype=np.float32) - size // 2
    w = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return np.asarray(w / w.sum())   # numpy host constant — safe to cache


def _sep_blur(img: jnp.ndarray, axes, size: int = 11,
              sigma: float = 1.5) -> jnp.ndarray:
    """Separable Gaussian blur with zero padding (matches torch conv2d
    padding=size//2 in the reference), along the given axes in order.

    Implemented as unrolled shift-and-add on the VPU: an 11-tap blur is
    ~70 MFLOP — exact f32 and fused by XLA into two loop fusions.  The MXU
    conv path is both slower (1-wide contractions) and, at the TPU default
    bf16 pass precision, corrupts SSIM's variance terms
    (E[x²]−E[x]² cancellation); HIGHEST-precision convs fix accuracy but
    cost 68 ms/step at 960×544 vs ~2 ms for this formulation (measured)."""
    w = _gauss_window(size, sigma)
    pad = size // 2

    def along(x, axis):
        padw = [(0, 0)] * x.ndim
        padw[axis] = (pad, pad)
        xp = jnp.pad(x, padw)
        n = x.shape[axis]
        acc = None
        for k in range(size):
            t = lax.slice_in_dim(xp, k, k + n, axis=axis) * w[k]
            acc = t if acc is None else acc + t
        return acc

    for ax in axes:
        img = along(img, ax)
    return img


def _blur(img: jnp.ndarray, size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """(H, W, C) blur (H pass then W pass)."""
    return _sep_blur(img, (0, 1), size, sigma)


# Stacked channel-leading SSIM (IBGS_SSIM_STACKED=1): one (5C, H, W)
# leading-axis blur instead of five (H, W, C) blurs — identical per-element
# op order (bit-exact), fewer op dispatches.  Hardware A/B
# (scripts/ssim_ab.py, v5e, 1080p fwd+bwd): stacked 14.41 ms vs hwc
# 8.11 ms — the (H, W, C) separable blur chain fuses BETTER despite the
# C=3 minor dim, so the flag stays OFF; kept for layout experiments.
import os as _os
_SSIM_STACKED = _os.environ.get("IBGS_SSIM_STACKED", "0") == "1"


def _ssim_map_chw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel SSIM map in (C, H, W) layout from (C, H, W) inputs."""
    C = a.shape[0]
    stack = jnp.concatenate([a, b, a * a, b * b, a * b], axis=0)
    blur = _sep_blur(stack, (1, 2))
    mu1, mu2, ex2, ey2, exy = (blur[i * C:(i + 1) * C] for i in range(5))
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = ex2 - mu1_sq
    s2 = ey2 - mu2_sq
    s12 = exy - mu12
    return ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel, per-channel SSIM map (H, W, C)."""
    if _SSIM_STACKED:
        return jnp.moveaxis(_ssim_map_chw(jnp.moveaxis(img1, -1, 0),
                                          jnp.moveaxis(img2, -1, 0)), 0, -1)
    mu1 = _blur(img1)
    mu2 = _blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _blur(img1 * img1) - mu1_sq
    s2 = _blur(img2 * img2) - mu2_sq
    s12 = _blur(img1 * img2) - mu12
    return ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))


def ssim(img1, img2):
    if _SSIM_STACKED:
        return _ssim_map_chw(jnp.moveaxis(img1, -1, 0),
                             jnp.moveaxis(img2, -1, 0)).mean()
    return ssim_map(img1, img2).mean()


def photometric_ssim(ref, warped):
    """Per-pixel channel-mean SSIM (reference compute_photometric_ssim with
    size_average=False then .mean(0))."""
    if _SSIM_STACKED:
        return _ssim_map_chw(jnp.moveaxis(ref, -1, 0),
                             jnp.moveaxis(warped, -1, 0)).mean(0)
    return ssim_map(ref, warped).mean(-1)


def dssim_l1(pred, gt, lambda_dssim: float = 0.2):
    """The standard 3DGS image loss (train.py:302-305)."""
    return (1.0 - lambda_dssim) * l1(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt))


def image_gradient_weight(img: jnp.ndarray, beta: float = 2.0) -> jnp.ndarray:
    """Edge-aware weight map (loss_utils.py:119-131). img: (H, W, C)."""
    gx = jnp.abs(img[1:-1, 2:] - img[1:-1, :-2]).mean(-1)
    gy = jnp.abs(img[:-2, 1:-1] - img[2:, 1:-1]).mean(-1)
    g = jnp.maximum(gx, gy)
    g = (g - g.min()) / (g.max() - g.min() + 1e-12)
    return jnp.pad(g, 1, constant_values=1.0)


def normal_consistency(rendered_normal, depth_normal, weight: float):
    """Single-view normal loss (train.py:308-315); inputs (H, W, 3)."""
    l1_term = jnp.abs(depth_normal - rendered_normal).sum(-1).mean()
    cos_term = (1.0 - (depth_normal * rendered_normal).sum(-1)).mean()
    return weight * (0.4 * l1_term + 0.6 * cos_term)


def multi_view_photometric(gt, warped_stack, valid_mask,
                           photo_ssim_weight: float, photo_weight: float):
    """Multi-view photometric loss (train.py:318-338).

    gt: (H, W, 3); warped_stack: (S, H, W, 3); valid_mask: (S, H, W).
    Invalid pixels are replaced by gt (zero residual), exactly as the
    reference's masked blend.
    """
    vm = valid_mask[..., None].astype(gt.dtype)
    masked = vm * warped_stack + (1.0 - vm) * gt[None]
    any_valid = valid_mask.sum()

    smap = jax.vmap(lambda w: photometric_ssim(gt, w))(masked)   # (S, H, W)
    ssim_term = ((1.0 - smap) * valid_mask).sum() / (any_valid + 1e-9)
    l1_map = jnp.abs(gt[None] - masked).mean(-1)
    l1_term = (l1_map * valid_mask).sum() / (any_valid + 1e-9)
    loss = ((1 - photo_ssim_weight) * l1_term
            + photo_ssim_weight * ssim_term) * photo_weight
    return jnp.where(any_valid > 0, loss, 0.0)


def patch_offsets(half_patch: int):
    """(1, P², 2) grid of integer offsets (reference graphics_utils.py:212)."""
    r = jnp.arange(-half_patch, half_patch + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([ox, oy], -1).reshape(1, -1, 2)


def patch_warp(H: jnp.ndarray, uv: jnp.ndarray):
    """Apply per-patch homographies (B, 3, 3) to pixel grids (B, P, 2)
    (reference graphics_utils.py:216-225)."""
    ones = jnp.ones(uv.shape[:-1] + (1,), uv.dtype)
    huv = jnp.concatenate([uv, ones], axis=-1)
    out = jnp.einsum("bik,bpk->bpi", H, huv)
    return out[..., :2] / (out[..., 2:] + 1e-10)


def lncc(ref: jnp.ndarray, nea: jnp.ndarray):
    """Local normalised cross-correlation over pixel patches
    (reference loss_utils.py:133-168).  ref/nea: (B, P²) flattened patches.
    Returns (ncc (B, 1), mask (B, 1))."""
    bs, tps = ref.shape
    ref_sum = ref.sum(-1)
    nea_sum = nea.sum(-1)
    ref_avg = ref_sum / tps
    nea_avg = nea_sum / tps
    cross = (ref * nea).sum(-1) - nea_avg * ref_sum
    ref_var = (ref * ref).sum(-1) - ref_avg * ref_sum
    nea_var = (nea * nea).sum(-1) - nea_avg * nea_sum
    cc = cross * cross / (ref_var * nea_var + 1e-8)
    ncc = jnp.clip(1.0 - cc, 0.0, 2.0)[:, None]
    return ncc, ncc < 0.9
