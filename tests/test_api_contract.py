"""Public rasterizer API contract: mark_visible + input validation
(reference diff_plane_rasterization/__init__.py:283-331)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.ops.rasterize import RasterConfig, mark_visible, rasterize
from tests.utils import face_camera, random_cloud, simple_camera

CFG = RasterConfig(instance_cap=2048, backend="oracle")


def test_mark_visible_frustum():
    cam = simple_camera(32, 32)
    # simple_camera sits at z=-3 looking toward +z → view depth = z + 3
    xyz = jnp.asarray(np.array([[0, 0, 0.0],     # depth 3: in front
                                [0, 0, -2.9],    # depth 0.1 < 0.2: culled
                                [0, 0, -4.0]],   # behind
                               np.float32))
    vis = mark_visible(xyz, cam)
    assert vis.tolist() == [True, False, False]


def _params(n=20):
    cam = simple_camera(32, 32)
    return face_camera(random_cloud(jax.random.PRNGKey(0), n), cam), cam


def test_rasterize_rejects_bad_shapes():
    params, cam = _params()
    with pytest.raises(ValueError, match="scale"):
        rasterize(xyz=params["xyz"], scale=params["scale"][:, :2],
                  quat=params["quat"], opacity=params["opacity"],
                  sh_coeffs=params["sh_coeffs"], active_sh_degree=0,
                  normal_world=params["normal_world"],
                  plane_offset=params["plane_offset"], cam=cam,
                  bg=jnp.zeros(3), cfg=CFG, render_geo=False)


def test_rasterize_rejects_double_color_source():
    params, cam = _params()
    with pytest.raises(ValueError, match="exactly one"):
        rasterize(xyz=params["xyz"], scale=params["scale"],
                  quat=params["quat"], opacity=params["opacity"],
                  sh_coeffs=params["sh_coeffs"], active_sh_degree=0,
                  normal_world=params["normal_world"],
                  plane_offset=params["plane_offset"], cam=cam,
                  bg=jnp.zeros(3), cfg=CFG, render_geo=False,
                  rgb_override=jnp.zeros((20, 3)))


def test_rasterize_rgb_override_only():
    params, cam = _params()
    res = rasterize(xyz=params["xyz"], scale=params["scale"],
                    quat=params["quat"], opacity=params["opacity"],
                    sh_coeffs=None, active_sh_degree=0,
                    normal_world=params["normal_world"],
                    plane_offset=params["plane_offset"], cam=cam,
                    bg=jnp.zeros(3), cfg=CFG, render_geo=False,
                    rgb_override=jnp.full((20, 3), 0.7))
    assert np.isfinite(np.asarray(res.render)).all()


@pytest.mark.parametrize("wh", [(50, 37), (33, 17)])
def test_odd_image_sizes_pallas_matches_oracle(wh):
    """Non-tile-multiple sizes: outputs have the exact requested shape
    (internal Wp/Hp padding cropped away) and the Pallas kernel matches
    the oracle at the padded-tile boundaries."""
    import dataclasses
    w, h = wh
    cam = simple_camera(w, h)
    p = face_camera(random_cloud(jax.random.PRNGKey(11), 50), cam)

    def run(backend):
        cfg = dataclasses.replace(CFG, backend=backend)
        return rasterize(
            xyz=p["xyz"], scale=p["scale"], quat=p["quat"],
            opacity=p["opacity"], sh_coeffs=p["sh_coeffs"],
            active_sh_degree=0, normal_world=p["normal_world"],
            plane_offset=p["plane_offset"], cam=cam,
            bg=jnp.array([0.1, 0.2, 0.3]), cfg=cfg, render_geo=False)

    ro, rp = run("oracle"), run("pallas")
    assert ro.render.shape == (h, w, 3)
    assert ro.final_t.shape == (h, w)
    assert np.isfinite(np.asarray(ro.render)).all()
    np.testing.assert_allclose(np.asarray(rp.render), np.asarray(ro.render),
                               rtol=1e-5, atol=1e-5)
    # content near the right/bottom edge is not lost to tile padding
    assert np.abs(np.asarray(ro.render)[:, -1] -
                  np.array([0.1, 0.2, 0.3])).max() >= 0.0
