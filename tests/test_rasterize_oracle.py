"""Semantic tests of the oracle rasterization path (pure JAX blend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.ops import binning, preprocess
from ibgs_tpu.ops.epilogue import SourceViews
from ibgs_tpu.ops.rasterize import RasterConfig, rasterize
from tests.utils import face_camera, random_cloud, simple_camera

CFG = RasterConfig(tile_h=16, tile_w=16, instance_cap=4096, backend="oracle")


def _raster(params, cam, **kw):
    kw.setdefault("render_geo", False)
    return rasterize(
        xyz=params["xyz"], scale=params["scale"], quat=params["quat"],
        opacity=params["opacity"], sh_coeffs=params["sh_coeffs"],
        active_sh_degree=0, normal_world=params["normal_world"],
        plane_offset=params["plane_offset"], cam=cam,
        bg=jnp.zeros(3), cfg=kw.pop("cfg", CFG), **kw,
    )


def test_single_gaussian_profile():
    """One isotropic splat at the origin: analytic alpha profile."""
    cam = simple_camera(64, 64)
    n = 1
    params = dict(
        xyz=jnp.zeros((n, 3)),
        scale=jnp.full((n, 3), 0.05),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        opacity=jnp.array([0.8]),
        sh_coeffs=jnp.zeros((n, 1, 3)).at[:, 0, :].set(1.0),
        normal_world=jnp.tile(jnp.array([0.0, 0, 1.0]), (n, 1)),
        plane_offset=jnp.zeros((n,)),
    )
    res = _raster(params, cam)
    img = np.asarray(res.render)
    # peak at the projected centre (pixel 31/32 region)
    peak = img[..., 0].max()
    iy, ix = np.unravel_index(img[..., 0].argmax(), img[..., 0].shape)
    assert 30 <= ix <= 33 and 30 <= iy <= 33
    # analytic: colour = SH0*C0+0.5 clamped; alpha at centre ~ opacity
    from ibgs_tpu.core.sh import C0
    expect_col = C0 * 1.0 + 0.5
    # centre of the Gaussian lies between pixels; alpha at the max pixel is
    # slightly below opacity
    assert 0.7 * expect_col <= peak <= 0.81 * expect_col
    # radii positive for the one splat
    assert int(res.radii[0]) > 0
    assert int(res.n_instances) >= 1


def test_background_composites():
    cam = simple_camera(32, 32)
    params = random_cloud(jax.random.PRNGKey(0), 20)
    bg = jnp.array([0.0, 0.5, 1.0])
    res = rasterize(
        xyz=params["xyz"], scale=params["scale"], quat=params["quat"],
        opacity=params["opacity"], sh_coeffs=params["sh_coeffs"],
        active_sh_degree=0, normal_world=params["normal_world"],
        plane_offset=params["plane_offset"], cam=cam, bg=bg, cfg=CFG,
        render_geo=False,
    )
    img = np.asarray(res.render)
    T = np.asarray(res.final_t)
    # wherever nothing rendered, colour == background
    empty = T > 0.999
    assert empty.any()
    np.testing.assert_allclose(img[empty], np.tile(bg, (empty.sum(), 1)), atol=1e-5)


def test_front_to_back_ordering():
    """A red splat in front of a green one: red must dominate."""
    cam = simple_camera(32, 32)
    from ibgs_tpu.core.sh import rgb_to_sh0
    xyz = jnp.array([[0.0, 0, -0.5], [0.0, 0, 0.5]])  # first closer to camera
    sh = jnp.stack([
        rgb_to_sh0(jnp.array([1.0, 0, 0]))[None],
        rgb_to_sh0(jnp.array([0.0, 1.0, 0]))[None],
    ])
    params = dict(
        xyz=xyz, scale=jnp.full((2, 3), 0.2),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
        opacity=jnp.array([0.9, 0.9]), sh_coeffs=sh,
        normal_world=jnp.tile(jnp.array([0.0, 0, 1.0]), (2, 1)),
        plane_offset=jnp.zeros((2,)),
    )
    res = _raster(params, cam)
    c = np.asarray(res.render)[16, 16]
    assert c[0] > 0.8 and c[1] < 0.15


def test_plane_depth_analytic():
    """A fronto-parallel plane splat: median depth equals plane distance."""
    cam = simple_camera(64, 64, dist=3.0)
    n = 1
    params = dict(
        xyz=jnp.zeros((n, 3)),
        scale=jnp.full((n, 3), 0.5),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        opacity=jnp.array([0.99]),
        sh_coeffs=jnp.zeros((n, 1, 3)),
        normal_world=jnp.tile(jnp.array([0.0, 0, -1.0]), (n, 1)),  # toward cam
        plane_offset=jnp.zeros((n,)),
    )
    params = face_camera(params, cam)
    S = 1
    src = SourceViews(
        images=jnp.zeros((S, 64, 64, 3)),
        depths=jnp.zeros((S, 64, 64)),
        ref_to_src=jnp.zeros((S, 4, 4)),
        cam_pos=jnp.zeros((S, 3)),
        count=jnp.int32(0),
    )
    res = _raster(params, cam, render_geo=True, src=src)
    d = np.asarray(res.median_depth)
    # plane z=0 world, camera at z=-3 → depth along z is 3.0/(n·ray);
    # for the fronto-parallel plane the plane-intersection depth at pixel p is
    # dist / (n·(rx,ry,1)) = 3.0 exactly (normal = (0,0,1) camera space).
    centre = d[28:36, 28:36]
    np.testing.assert_allclose(centre, 3.0, rtol=1e-4)
    # rendered normal at centre points toward camera (camera-space -z... the
    # camera-facing convention makes n_cam·(0,0,1) < 0)
    nz = np.asarray(res.normal)[30, 30, 2]
    assert nz < -0.5


def test_depth_only_matches_geo_median():
    cam = simple_camera(48, 48)
    params = face_camera(random_cloud(jax.random.PRNGKey(1), 50), cam)
    S = 1
    src = SourceViews(
        images=jnp.zeros((S, 48, 48, 3)), depths=jnp.zeros((S, 48, 48)),
        ref_to_src=jnp.zeros((S, 4, 4)), cam_pos=jnp.zeros((S, 3)),
        count=jnp.int32(0),
    )
    geo = _raster(params, cam, render_geo=True, src=src)
    dep = _raster(params, cam, render_geo=False, depth_only=True)
    d1 = np.asarray(geo.median_depth)
    d2 = np.asarray(dep.median_depth)
    # depth-only path may terminate earlier (below-buffer break) but for this
    # scene both should agree almost everywhere
    frac = np.mean(np.isclose(d1, d2, rtol=1e-4, atol=1e-5))
    assert frac > 0.95


def test_gradients_flow_and_are_finite():
    cam = simple_camera(32, 32)
    params = face_camera(random_cloud(jax.random.PRNGKey(2), 30), cam)
    target = jnp.ones((32, 32, 3)) * 0.5

    def loss(xyz, opacity, sh):
        res = rasterize(
            xyz=xyz, scale=params["scale"], quat=params["quat"],
            opacity=opacity, sh_coeffs=sh, active_sh_degree=0,
            normal_world=params["normal_world"],
            plane_offset=params["plane_offset"], cam=cam,
            bg=jnp.zeros(3), cfg=CFG, render_geo=False,
        )
        return jnp.abs(res.render - target).mean()

    g = jax.grad(loss, argnums=(0, 1, 2))(
        params["xyz"], params["opacity"], params["sh_coeffs"]
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
    assert np.abs(np.asarray(g[2])).max() > 0  # colour grads nonzero


def test_finite_difference_opacity():
    """FD check of one opacity gradient through the full oracle path."""
    cam = simple_camera(24, 24)
    params = face_camera(random_cloud(jax.random.PRNGKey(5), 8), cam)
    target = jnp.zeros((24, 24, 3))

    def loss_ninst(op):
        res = rasterize(
            xyz=params["xyz"], scale=params["scale"], quat=params["quat"],
            opacity=op, sh_coeffs=params["sh_coeffs"], active_sh_degree=0,
            normal_world=params["normal_world"],
            plane_offset=params["plane_offset"], cam=cam,
            bg=jnp.zeros(3), cfg=CFG, render_geo=False,
        )
        return ((res.render - target) ** 2).sum(), res.n_instances

    def loss(op):
        return loss_ninst(op)[0]

    g = jax.grad(loss)(params["opacity"])
    eps = 1e-3
    checked = 0
    for i in range(8):
        e = jnp.zeros_like(params["opacity"]).at[i].set(eps)
        lp, np_p = loss_ninst(params["opacity"] + e)
        lm, np_m = loss_ninst(params["opacity"] - e)
        if int(np_p) != int(np_m):
            # The opacity-aware tile rect (preprocess.py) makes binning a
            # step function of opacity: at a flip the loss is continuous
            # but has an O(ALPHA_MIN) kink, so central differences are
            # invalid there.  Skip non-differentiable sample points.
            continue
        fd = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=2e-4)
        checked += 1
        if checked == 3:
            break
    assert checked >= 2, "too many rect-flip indices; pick another seed"
