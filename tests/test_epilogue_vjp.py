"""The hand-derived _warp_views VJP must match JAX autodiff of the same
forward math (reference backward.cu:729-757 chain)."""
import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu.ops.epilogue import (_warp_views, _warp_views_impl,
                                   pack_bilinear_corners)


def _setup(seed=0, S=3, H=12, W=16, B=4, Hs=20, Ws=24):
    rng = np.random.default_rng(seed)
    # buffer-entry-major (B, H, W) — the _warp_views layout contract
    bd = jnp.asarray(rng.random((B, H, W)) * 4 + 0.5, jnp.float32)
    bw = jnp.asarray(rng.random((B, H, W)), jnp.float32)
    # zero some weights (unused buffer slots)
    bw = bw * (rng.random((B, H, W)) > 0.3)
    imgs = rng.random((S, Hs, Ws, 3)).astype(np.float32)
    tables = jnp.stack(
        [pack_bilinear_corners(jnp.asarray(imgs[s])).reshape(Hs, Ws, 12)
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


def test_warp_views_bf16_tables_close_to_f32():
    args = _setup()
    bd, bw, tables = args[0], args[1], args[2]
    rest = args[3:]
    c32, w32 = _warp_views(bd, bw, tables, *rest)
    cbf, wbf = _warp_views(bd, bw, tables.astype(jnp.bfloat16), *rest)
    # bf16 quantises the 8-bit-derived source colours by ~0.4%
    np.testing.assert_allclose(np.asarray(cbf), np.asarray(c32),
                               rtol=0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(wbf), np.asarray(w32),
                               rtol=0, atol=1e-5)

    def loss(fn_tables, bd, bw):
        c, w = _warp_views(bd, bw, fn_tables, *rest)
        return jnp.sum(c * c) + jnp.sum(w)

    g32 = jax.grad(loss, argnums=(1, 2))(tables, bd, bw)
    gbf = jax.grad(loss, argnums=(1, 2))(tables.astype(jnp.bfloat16), bd, bw)
    for a, b in zip(gbf, g32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=8e-2)
