"""The hand-derived _warp_views VJP must match JAX autodiff of the same
forward math (reference backward.cu:729-757 chain)."""
import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu.ops.epilogue import (_warp_views, _warp_views_impl,
                                   bilinear_sample,
                                   pack_bilinear_corners_rgb10)


def _setup(seed=0, S=3, H=12, W=16, B=4, Hs=20, Ws=24):
    rng = np.random.default_rng(seed)
    # buffer-entry-major (B, H, W) — the _warp_views layout contract
    bd = jnp.asarray(rng.random((B, H, W)) * 4 + 0.5, jnp.float32)
    bw = jnp.asarray(rng.random((B, H, W)), jnp.float32)
    # zero some weights (unused buffer slots)
    bw = bw * (rng.random((B, H, W)) > 0.3)
    imgs = rng.random((S, Hs, Ws, 3)).astype(np.float32)
    tables = jnp.stack(
        [pack_bilinear_corners_rgb10(jnp.asarray(imgs[s])).reshape(Hs, Ws, 4)
         for s in range(S)], axis=0)
    r2s = np.tile(np.eye(4, dtype=np.float32)[None], (S, 1, 1))
    for s in range(S):
        th = 0.1 * (s - 1)
        r2s[s, :3, :3] = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]], np.float32)
        r2s[s, :3, 3] = rng.normal(0, 0.05, 3)
    r2s = jnp.asarray(r2s)
    xs = (jnp.arange(W, dtype=jnp.float32) - W / 2) / (W / 2)
    ys = (jnp.arange(H, dtype=jnp.float32) - H / 2) / (H / 2)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    intr = jnp.asarray([W / 2.0, H / 2.0, Ws / 2.0, Hs / 2.0], jnp.float32)
    return bd, bw, tables, r2s, gx, gy, intr


def test_warp_views_forward_matches_impl():
    args = _setup()
    out = _warp_views(*args)
    ref = _warp_views_impl(*args)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               rtol=1e-6, atol=1e-6)


def test_warp_views_grads_match_autodiff():
    args = _setup()
    bd, bw = args[0], args[1]
    rest = args[2:]
    rng = np.random.default_rng(7)
    ct_c = jnp.asarray(rng.normal(size=(3, 12, 16, 3)), jnp.float32)
    ct_w = jnp.asarray(rng.normal(size=(3, 12, 16)), jnp.float32)

    def loss_custom(bd, bw):
        c, w = _warp_views(bd, bw, *rest)
        return jnp.sum(c * ct_c) + jnp.sum(w * ct_w)

    def loss_ref(bd, bw):
        c, w, _ = _warp_views_impl(bd, bw, *rest)
        return jnp.sum(c * ct_c) + jnp.sum(w * ct_w)

    g1 = jax.grad(loss_custom, argnums=(0, 1))(bd, bw)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(bd, bw)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=2e-5, atol=2e-6)


def test_warp_views_rgb10_close_to_exact_bilinear():
    """The rgb10 fixed-point tables quantise each texel by <= 0.5/1023 —
    the warp accumulation must match an exact-f32 bilinear re-derivation
    to that tolerance (lossless for 8-bit image content)."""
    S, H, W, B, Hs, Ws = 3, 12, 16, 4, 20, 24
    args = _setup(S=S, H=H, W=W, B=B, Hs=Hs, Ws=Ws)
    bd, bw, tables, r2s, gx, gy, intr = args
    rng = np.random.default_rng(3)
    imgs = rng.random((S, Hs, Ws, 3)).astype(np.float32)
    tables = jnp.stack(
        [pack_bilinear_corners_rgb10(jnp.asarray(imgs[s])).reshape(
            Hs, Ws, 4) for s in range(S)], axis=0)
    got_c, got_w = _warp_views(bd, bw, tables, r2s, gx, gy, intr)

    # exact-f32 reference: project every buffer entry, bilinear-sample the
    # unquantised image, weight-sum over B
    fx, fy, cx, cy = (float(x) for x in intr)
    exp_c = np.zeros((S, H, W, 3), np.float32)
    exp_w = np.zeros((S, H, W), np.float32)
    for s in range(S):
        for b in range(B):
            d = bd[b]
            px, py, pz = gx * d, gy * d, d
            q = jnp.einsum("ij,jhw->ihw",
                           r2s[s, :3, :3], jnp.stack([px, py, pz])) \
                + r2s[s, :3, 3][:, None, None]
            pu = q[0] / (q[2] + 1e-8) * fx + cx
            pv = q[1] / (q[2] + 1e-8) * fy + cy
            inb = ((pu >= 0) & (pu <= Ws - 1.0)
                   & (pv >= 0) & (pv <= Hs - 1.0))
            w = np.asarray(bw[b]) * np.asarray(inb, np.float32)
            col = np.asarray(bilinear_sample(jnp.asarray(imgs[s]), pu, pv))
            exp_c[s] += col * w[..., None]
            exp_w[s] += w
    np.testing.assert_allclose(np.asarray(got_w), exp_w, rtol=1e-5,
                               atol=1e-5)
    # per-texel quantisation 0.5/1023, summed over B weighted entries
    wmax = float(np.abs(exp_w).max())
    np.testing.assert_allclose(np.asarray(got_c), exp_c, rtol=0,
                               atol=(0.5 / 1023) * wmax + 1e-5)


def test_depth_f16_pack_matches_f32():
    """IBGS_DEPTH_F16 occlusion-table packing: bilinear samples match the
    f32 footprint path to f16 precision (half-ULP ~5e-4 relative, well
    under the 0.01 relative depth-error threshold it feeds)."""
    import numpy as np
    from ibgs_tpu.ops.epilogue import (
        bilinear_sample_packed, bilinear_sample_packed_f16,
        pack_bilinear_corners, pack_bilinear_corners_f16)
    rng = np.random.default_rng(0)
    H, W = 37, 53
    img = jnp.asarray(rng.random((H, W)) * 5.0, jnp.float32)
    u = jnp.asarray(rng.random(500) * (W - 1), jnp.float32)
    v = jnp.asarray(rng.random(500) * (H - 1), jnp.float32)
    a = bilinear_sample_packed(pack_bilinear_corners(img), H, W, u, v)[..., 0]
    b = bilinear_sample_packed_f16(pack_bilinear_corners_f16(img), H, W, u, v)
    err = np.abs(np.asarray(a) - np.asarray(b)) / (np.abs(np.asarray(a)) + 1e-9)
    assert err.max() < 2e-3, err.max()
