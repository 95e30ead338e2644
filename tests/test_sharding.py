"""Multi-device (8 virtual CPU chips) sharding tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.models.gaussians import init_from_points
from ibgs_tpu.ops.rasterize import RasterConfig, rasterize
from ibgs_tpu.parallel.sharding import (make_mesh, sharded_render,
                                        sharded_train_step, _cam_stack)
from ibgs_tpu.renderer import render_view
from tests.utils import face_camera, random_cloud, simple_camera

CFG = RasterConfig(instance_cap=4096, backend="oracle")


def _params(seed=0, n=40):
    cam = simple_camera(32, 64)
    return face_camera(random_cloud(jax.random.PRNGKey(seed), n), cam), cam


def test_viewport_band_matches_full():
    """Rendering two half-bands reproduces the full-image render exactly."""
    params, cam = _params()
    kw = dict(
        xyz=params["xyz"], scale=params["scale"], quat=params["quat"],
        opacity=params["opacity"], sh_coeffs=params["sh_coeffs"],
        active_sh_degree=0, normal_world=params["normal_world"],
        plane_offset=params["plane_offset"], cam=cam, bg=jnp.zeros(3),
        cfg=CFG, render_geo=False,
    )
    full = rasterize(**kw)
    top = rasterize(**kw, viewport_row0=0, viewport_rows=32)
    bot = rasterize(**kw, viewport_row0=32, viewport_rows=32)
    np.testing.assert_allclose(
        np.concatenate([top.render, bot.render], 0), full.render,
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.concatenate([top.final_t, bot.final_t], 0), full.final_t,
        rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_sharded_render_matches_single():
    assert len(jax.devices()) >= 8
    params, cam = _params()
    model0 = init_from_points(np.zeros((4, 3), np.float32),
                              np.zeros((4, 3), np.float32), 0, capacity=64)
    n = params["xyz"].shape[0]
    model = model0.replace(
        params=model0.params.replace(
            xyz=jnp.zeros((64, 3)).at[:n].set(params["xyz"]),
            log_scale=jnp.full((64, 3), -9.0).at[:n].set(
                jnp.log(params["scale"])),
            quat=jnp.zeros((64, 4)).at[:, 0].set(1.0).at[:n].set(
                params["quat"]),
            opacity_logit=jnp.full((64, 1), -9.0).at[:n, 0].set(
                jnp.log(params["opacity"] / (1 - params["opacity"]))),
            sh_dc=jnp.zeros((64, 1, 3)).at[:n].set(params["sh_coeffs"]),
            normal=jnp.zeros((64, 3)).at[:, 2].set(1.0).at[:n].set(
                params["normal_world"]),
        ),
        alive=jnp.arange(64) < n,
    )
    mesh = make_mesh(dp=2, tp=4)
    cams = [cam, cam]
    out = sharded_render(model, cams, CFG, jnp.zeros(3), mesh)
    ref, _ = render_view(model, cam, CFG, jnp.zeros(3), render_geo=False,
                         return_depth_normal=False)
    assert out.shape == (2, 64, 32, 3)
    np.testing.assert_allclose(out[0], ref.render, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[1], ref.render, rtol=1e-5, atol=1e-6)


def test_sharded_train_step_runs_and_improves():
    assert len(jax.devices()) >= 8
    params, cam = _params(seed=3, n=60)
    model = init_from_points(np.asarray(params["xyz"]),
                             np.full((60, 3), 0.5, np.float32), 0,
                             capacity=128)
    mesh = make_mesh(dp=2, tp=4)
    from ibgs_tpu.ops.epilogue import SourceViews
    S, H, W = 2, 64, 32
    srcs = SourceViews(
        images=jnp.zeros((2, S, H, W, 3)), depths=jnp.zeros((2, S, H, W)),
        ref_to_src=jnp.zeros((2, S, 4, 4)), cam_pos=jnp.zeros((2, S, 3)),
        count=jnp.zeros((2,), jnp.int32),
    )
    gts = jnp.tile(jnp.asarray(np.linspace(0, 1, H * W * 3,
                                           dtype=np.float32)
                               .reshape(1, H, W, 3)), (2, 1, 1, 1))
    step = sharded_train_step(None, CFG, mesh, W, H)
    cam_arrays = _cam_stack([cam, cam])
    m, l0 = step(model, cam_arrays, gts, srcs, jnp.int32(1))
    for i in range(2, 8):
        m, l = step(m, cam_arrays, gts, srcs, jnp.int32(i))
    assert np.isfinite(float(l))
    assert float(l) < float(l0)


def test_fsdp_train_step_matches_replicated_grads():
    """FSDP (gaussian-sharded) step must track the replicated step."""
    from ibgs_tpu.parallel.sharding import fsdp_train_step
    from ibgs_tpu.ops.epilogue import SourceViews
    params, cam = _params(seed=3, n=60)
    model = init_from_points(np.asarray(params["xyz"]),
                             np.full((60, 3), 0.5, np.float32), 0,
                             capacity=128)
    mesh = make_mesh(dp=2, tp=4)
    S, H, W = 2, 64, 32
    srcs = SourceViews(
        images=jnp.zeros((2, S, H, W, 3)), depths=jnp.zeros((2, S, H, W)),
        ref_to_src=jnp.zeros((2, S, 4, 4)), cam_pos=jnp.zeros((2, S, 3)),
        count=jnp.zeros((2,), jnp.int32))
    gts = jnp.tile(jnp.asarray(
        np.linspace(0, 1, H * W * 3, dtype=np.float32).reshape(1, H, W, 3)),
        (2, 1, 1, 1))
    ca = _cam_stack([cam, cam])
    fsdp = fsdp_train_step(None, CFG, mesh, W, H)
    repl = sharded_train_step(None, CFG, mesh, W, H)
    m1, l1 = fsdp(model, ca, gts, srcs, jnp.int32(1))
    m2, l2 = repl(model, ca, gts, srcs, jnp.int32(1))
    assert abs(float(l1) - float(l2)) < 1e-5
    np.testing.assert_allclose(np.asarray(m1.params.xyz),
                               np.asarray(m2.params.xyz), atol=2e-5)
