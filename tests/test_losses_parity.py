"""Loss parity against a torch re-computation of the reference formulas
(torch-cpu is available in the image; the reference loss_utils.py math is
reproduced here independently for cross-checking)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ibgs_tpu.train import losses

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    """Reference loss_utils.py:24-64 semantics (2-D gaussian window conv)."""
    t1 = torch.from_numpy(np.asarray(img1)).permute(2, 0, 1)[None]
    t2 = torch.from_numpy(np.asarray(img2)).permute(2, 0, 1)[None]
    ch = t1.shape[1]
    x = torch.arange(window_size, dtype=torch.float32) - window_size // 2
    g = torch.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    win = (g[:, None] @ g[None, :])[None, None].expand(ch, 1, -1, -1)
    pad = window_size // 2
    mu1 = F.conv2d(t1, win, padding=pad, groups=ch)
    mu2 = F.conv2d(t2, win, padding=pad, groups=ch)
    s1 = F.conv2d(t1 * t1, win, padding=pad, groups=ch) - mu1 ** 2
    s2 = F.conv2d(t2 * t2, win, padding=pad, groups=ch) - mu2 ** 2
    s12 = F.conv2d(t1 * t2, win, padding=pad, groups=ch) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 ** 2 + mu2 ** 2 + C1) * (s1 + s2 + C2))
    return m


def test_ssim_matches_torch_reference():
    rng = np.random.default_rng(0)
    a = rng.random((40, 56, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(_torch_ssim(a, b).mean())
    assert abs(ours - ref) < 1e-5


def test_photometric_ssim_matches_torch():
    rng = np.random.default_rng(1)
    a = rng.random((32, 32, 3)).astype(np.float32)
    b = rng.random((32, 32, 3)).astype(np.float32)
    ours = np.asarray(losses.photometric_ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim(a, b)[0].mean(0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identity_is_one():
    a = jnp.asarray(np.random.default_rng(2).random((24, 24, 3)), jnp.float32)
    assert abs(float(losses.ssim(a, a)) - 1.0) < 1e-5


def test_psnr():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    assert abs(float(losses.psnr(a, b)) - 20.0) < 1e-3


def test_resize_align_corners_matches_torch():
    """resize_align_corners must reproduce torch F.interpolate(mode=
    'bilinear', align_corners=True) — the reference's
    residual_resolution_scale resampling (color_aggregation_network.py:201)."""
    import torch
    import torch.nn.functional as F
    from ibgs_tpu.models.aggregation import resize_align_corners

    rng = np.random.default_rng(3)
    x = rng.random((20, 28, 5)).astype(np.float32)
    for H2, W2 in [(10, 14), (40, 56), (7, 9)]:
        ours = np.asarray(resize_align_corners(jnp.asarray(x), H2, W2))
        ref = F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None],
            size=(H2, W2), mode="bilinear", align_corners=True,
        )[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fuse_color_residual_resolution_scale():
    """fuse_color at residual_resolution_scale=0.5 runs the net at half
    resolution and upscales the residual back (full-res output, finite,
    differentiable)."""
    import jax
    from ibgs_tpu.models import aggregation

    rng = np.random.default_rng(4)
    H, W, S = 16, 24, 3
    net = aggregation.ColorFusionResidualNet()
    render = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    warped = jnp.asarray(rng.random((S, H, W, 3)), jnp.float32)
    feat = jnp.asarray(rng.random((S, H, W, 4)), jnp.float32)
    ray = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.moveaxis(jnp.zeros((2, H // 2, W // 2, 7)), 0, 2),
                      ray[: H // 2, : W // 2], render[: H // 2, : W // 2])

    def run(r):
        out = aggregation.fuse_color(
            net, params, r, warped, feat, ray,
            jnp.zeros((H, W)), jnp.zeros((H, W), jnp.int32),
            jnp.float32(1.0), 2, residual_resolution_scale=0.5)
        return out["image_pred"]

    pred = run(render)
    assert pred.shape == (H, W, 3)
    assert np.isfinite(np.asarray(pred)).all()
    g = jax.grad(lambda r: run(r).sum())(render)
    assert np.isfinite(np.asarray(g)).all()


def test_fuse_color_mix_precision():
    """enable_mix_precision runs the aggregation net in bf16 (the autocast
    region of reference render.py:213-222) — output stays f32 and close to
    the full-precision result within bf16 tolerance."""
    import jax
    from ibgs_tpu.models import aggregation

    rng = np.random.default_rng(7)
    H, W, S = 16, 24, 2
    net = aggregation.ColorFusionResidualNet()
    render = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    warped = jnp.asarray(rng.random((S, H, W, 3)), jnp.float32)
    feat = jnp.asarray(rng.random((S, H, W, 4)), jnp.float32)
    ray = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((H, W, S, 7)), ray, render)

    def run(mp):
        return aggregation.fuse_color(
            net, params, render, warped, feat, ray,
            jnp.zeros((H, W)), jnp.zeros((H, W), jnp.int32),
            jnp.float32(1.0), S, enable_mix_precision=mp)["image_pred"]

    hi, lo = run(False), run(True)
    assert lo.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(lo), np.asarray(hi),
                               atol=0.05, rtol=0.05)
    g = jax.grad(lambda r: aggregation.fuse_color(
        net, params, r, warped, feat, ray, jnp.zeros((H, W)),
        jnp.zeros((H, W), jnp.int32), jnp.float32(1.0), S,
        enable_mix_precision=True)["image_pred"].sum())(render)
    assert np.isfinite(np.asarray(g)).all()
