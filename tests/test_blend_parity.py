"""Pallas blend kernel (interpret mode) vs pure-JAX oracle: fwd + grad parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.ops.epilogue import SourceViews
from ibgs_tpu.ops.rasterize import RasterConfig, rasterize
from tests.utils import face_camera, random_cloud, simple_camera

ORACLE = RasterConfig(instance_cap=4096, backend="oracle")
PALLAS = RasterConfig(instance_cap=4096, backend="pallas")


def _dummy_src(S, H, W, key=None):
    if key is None:
        return SourceViews(
            images=jnp.zeros((S, H, W, 3)), depths=jnp.zeros((S, H, W)),
            ref_to_src=jnp.zeros((S, 4, 4)), cam_pos=jnp.zeros((S, 3)),
            count=jnp.int32(0),
        )
    ks = jax.random.split(key, 3)
    eye = jnp.tile(jnp.eye(4)[None], (S, 1, 1))
    r2s = eye.at[:, :3, 3].add(jax.random.normal(ks[2], (S, 3)) * 0.05)
    return SourceViews(
        images=jax.random.uniform(ks[0], (S, H, W, 3)),
        depths=jax.random.uniform(ks[1], (S, H, W), minval=2.0, maxval=4.0),
        ref_to_src=r2s,
        cam_pos=jax.random.normal(ks[2], (S, 3)) * 0.1,
        count=jnp.int32(S),
    )


def _run(params, cam, cfg, src=None, **kw):
    return rasterize(
        xyz=params["xyz"], scale=params["scale"], quat=params["quat"],
        opacity=params["opacity"], sh_coeffs=params["sh_coeffs"],
        active_sh_degree=0, normal_world=params["normal_world"],
        plane_offset=params["plane_offset"], cam=cam,
        bg=jnp.array([0.2, 0.3, 0.4]), cfg=cfg, src=src, **kw,
    )


@pytest.mark.parametrize("seed,n", [(0, 40), (1, 120)])
def test_forward_parity_color(seed, n):
    cam = simple_camera(32, 48)
    params = face_camera(random_cloud(jax.random.PRNGKey(seed), n), cam)
    a = _run(params, cam, ORACLE, render_geo=False)
    b = _run(params, cam, PALLAS, render_geo=False)
    np.testing.assert_allclose(b.render, a.render, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b.final_t, a.final_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(b.n_contrib, a.n_contrib)


@pytest.mark.parametrize("seed,n", [(2, 60), (3, 150)])
def test_forward_parity_geo(seed, n):
    cam = simple_camera(48, 32)
    params = face_camera(random_cloud(jax.random.PRNGKey(seed), n), cam)
    src = _dummy_src(3, 32, 48, jax.random.PRNGKey(100 + seed))
    a = _run(params, cam, ORACLE, src=src, render_geo=True)
    b = _run(params, cam, PALLAS, src=src, render_geo=True)
    np.testing.assert_allclose(b.render, a.render, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b.normal, a.normal, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b.median_depth, a.median_depth,
                               rtol=1e-4, atol=1e-5)
    assert b.ibr is not None and a.ibr is not None
    np.testing.assert_allclose(b.ibr.warped_image, a.ibr.warped_image,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(b.ibr.cam_feat, a.ibr.cam_feat,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(b.ibr.use_first_src_mask,
                                  a.ibr.use_first_src_mask)


def test_forward_parity_depth_only():
    cam = simple_camera(32, 32)
    params = face_camera(random_cloud(jax.random.PRNGKey(4), 80), cam)
    a = _run(params, cam, ORACLE, render_geo=False, depth_only=True)
    b = _run(params, cam, PALLAS, render_geo=False, depth_only=True)
    np.testing.assert_allclose(b.median_depth, a.median_depth,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(b.final_t, a.final_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(b.n_contrib, a.n_contrib)


def _loss_fn(cfg, cam, src, params, geo=True):
    def loss(xyz, scale, quat, opacity, sh, nrm, off):
        r = rasterize(
            xyz=xyz, scale=scale, quat=quat, opacity=opacity, sh_coeffs=sh,
            active_sh_degree=0, normal_world=nrm, plane_offset=off, cam=cam,
            bg=jnp.array([0.2, 0.3, 0.4]), cfg=cfg, src=src, render_geo=geo,
        )
        out = jnp.abs(r.render - 0.5).mean() + 0.3 * (r.final_t ** 2).mean()
        if geo:
            out = out + 0.2 * jnp.abs(r.normal).mean()
            out = out + 0.1 * (r.median_depth ** 2).mean() * 0.05
            out = out + 0.4 * jnp.abs(r.ibr.warped_image - 0.3).mean()
        return out
    return loss


@pytest.mark.parametrize("geo", [False, True])
def test_grad_parity(geo):
    cam = simple_camera(32, 32)
    params = face_camera(random_cloud(jax.random.PRNGKey(7), 50), cam)
    src = _dummy_src(2, 32, 32, jax.random.PRNGKey(11)) if geo else None
    args = (params["xyz"], params["scale"], params["quat"], params["opacity"],
            params["sh_coeffs"], params["normal_world"], params["plane_offset"])
    ga = jax.grad(_loss_fn(ORACLE, cam, src, params, geo), argnums=tuple(range(7)))(*args)
    gb = jax.grad(_loss_fn(PALLAS, cam, src, params, geo), argnums=tuple(range(7)))(*args)
    names = ["xyz", "scale", "quat", "opacity", "sh", "normal", "offset"]
    for name, a, b in zip(names, ga, gb):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-6,
            err_msg=f"grad mismatch for {name}",
        )


def test_indefinite_conic_grads_finite():
    """An f32-indefinite conic (det = a*c - b^2 cancels to <= 0 on extreme-
    anisotropy needle splats) makes power > 0 at some pixels.  The kernels
    must not turn the masked-out exp into 0*inf = NaN in reverse: one NaN
    instance cotangent spreads through the pack-bwd cumsum segment-sum to
    EVERY Gaussian's gradient (observed as a whole-model collapse at iter
    ~1800 of the 960x544 hardware run).  Reference parity: forward.cu's
    `if (power > 0.0f) continue;` skip."""
    from flax import struct

    from ibgs_tpu.ops import blend_oracle as BO
    from ibgs_tpu.ops import blend_pallas as BP
    from ibgs_tpu.ops.blend_common import BlendConfig, Instances

    @struct.dataclass
    class _Bins:
        tile_start: jnp.ndarray
        tile_stop: jnp.ndarray

    Wp, Hp = 32, 16
    cfg = BlendConfig(tile_h=16, tile_w=32, buffer_len=4,
                      render_geo=True, depth_only=False)
    cap = 8
    rng = np.random.default_rng(0)
    # b^2 > a*c: indefinite quadratic — power = +(dx)^2 along dx = -dy
    # (up to ~200 at tile scale, so exp overflows f32 to inf pre-fix),
    # <= 0 elsewhere, so some pixels still blend (the hyperbola's valid
    # region)
    conic = jnp.tile(jnp.asarray([[1.0, 2.0, 1.0]], jnp.float32), (cap, 1))
    mean2d = jnp.asarray(
        np.stack([rng.uniform(4, 28, cap), rng.uniform(2, 14, cap)], 1),
        jnp.float32)
    opacity = jnp.full((cap,), 0.9, jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (cap, 3)), jnp.float32)
    normal = jnp.tile(jnp.asarray([[0.1, 0.0, 0.9]], jnp.float32), (cap, 1))
    dist = jnp.full((cap,), -2.0, jnp.float32)
    bins = _Bins(tile_start=jnp.zeros((1,), jnp.int32),
                 tile_stop=jnp.full((1,), cap, jnp.int32))
    fx = fy = 30.0
    cx, cy = 16.0, 8.0

    def outs_sum(b):
        return (b.color.sum() + b.final_t.sum() + b.normal.sum()
                + (b.buf_depth * b.buf_weight).sum())

    def f_oracle(m2d, con, op, c3, n3, d):
        inst = Instances(mean2d=m2d, conic=con, opacity=op, rgb=c3,
                         normal=n3, dist=d)
        return outs_sum(BO.blend_oracle(inst, bins, Wp, Hp, fx, fy, cx, cy,
                                        cfg))

    def f_pallas(feats):
        return outs_sum(BP.blend_packed(feats, bins, Wp, Hp, fx, fy, cx, cy,
                                        cfg))

    va, ga = jax.value_and_grad(f_oracle, argnums=(0, 1, 2, 3, 4, 5))(
        mean2d, conic, opacity, rgb, normal, dist)
    feats = jnp.concatenate(
        [mean2d, conic, opacity[:, None], rgb, normal, dist[:, None],
         jnp.zeros((cap, 2), jnp.float32)], axis=1)
    vb, gb = jax.value_and_grad(f_pallas)(feats)

    assert np.isfinite(float(va)) and np.isfinite(float(vb))
    np.testing.assert_allclose(float(vb), float(va), rtol=1e-5)
    for name, g in zip(("mean2d", "conic", "opacity", "rgb", "normal",
                        "dist"), ga):
        assert np.isfinite(np.asarray(g)).all(), f"oracle grad[{name}] NaN"
    assert np.isfinite(np.asarray(gb)).all(), "pallas grad NaN"
    # grad parity on the shared columns
    np.testing.assert_allclose(np.asarray(gb[:, 0:2]), np.asarray(ga[0]),
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(gb[:, 2:5]), np.asarray(ga[1]),
                               rtol=5e-4, atol=5e-6)
    np.testing.assert_allclose(np.asarray(gb[:, 5]), np.asarray(ga[2]),
                               rtol=5e-4, atol=5e-6)
