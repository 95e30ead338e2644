"""Gaussian-sharded compute (instance all_to_all) tests on the 8-device
CPU mesh: exactness vs the replicated band renderer, gradient/update
parity vs the replicated train step, and overflow accounting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.models.gaussians import init_from_points
from ibgs_tpu.ops.epilogue import SourceViews
from ibgs_tpu.ops.rasterize import RasterConfig
from ibgs_tpu.parallel.gsp import gsp_render, gsp_train_step
from ibgs_tpu.parallel.sharding import (make_mesh, sharded_train_step,
                                        _cam_stack)
from ibgs_tpu.renderer import render_view
from tests.utils import face_camera, random_cloud, simple_camera

CFG = RasterConfig(instance_cap=4096, backend="oracle")


def _model(seed=0, n=60, cap=128, H=128, W=32):
    cam = simple_camera(W, H)
    params = face_camera(random_cloud(jax.random.PRNGKey(seed), n), cam)
    model0 = init_from_points(np.asarray(params["xyz"]),
                              np.full((n, 3), 0.5, np.float32), 0,
                              capacity=cap)
    model = model0.replace(
        params=model0.params.replace(
            log_scale=model0.params.log_scale.at[:n].set(
                jnp.log(params["scale"])),
            quat=model0.params.quat.at[:n].set(params["quat"]),
            opacity_logit=model0.params.opacity_logit.at[:n, 0].set(
                jnp.log(params["opacity"] / (1 - params["opacity"]))),
            normal=model0.params.normal.at[:n].set(params["normal_world"]),
        ))
    return model, cam


def test_gsp_render_matches_single():
    assert len(jax.devices()) >= 8
    model, cam = _model(seed=1, n=60, cap=128, H=128, W=32)
    mesh = make_mesh(1, 8, axis_names=("dp", "gs"))
    img, ovf = gsp_render(model, cam, CFG, mesh, cap_local=1024,
                          exchange_cap=512, bg=jnp.array([0.2, 0.3, 0.4]))
    ref, _ = render_view(model, cam, CFG, jnp.array([0.2, 0.3, 0.4]),
                         render_geo=False, return_depth_normal=False)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.render),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("backend", ["oracle", "pallas"])
def test_gsp_render_backends(backend):
    """The Pallas kernel must run (interpret mode) inside shard_map too."""
    model, cam = _model(seed=2, n=50, cap=64, H=128, W=32)
    cfg = RasterConfig(instance_cap=4096, backend=backend)
    mesh = make_mesh(1, 8, axis_names=("dp", "gs"))
    img, ovf = gsp_render(model, cam, cfg, mesh, cap_local=1024,
                          exchange_cap=512)
    ref, _ = render_view(model, cam, CFG, jnp.zeros(3), render_geo=False,
                         return_depth_normal=False)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.render),
                               rtol=1e-5, atol=1e-5)


def test_gsp_train_step_matches_replicated():
    """Same loss and same post-Adam params as the replicated-band step —
    proves the all_to_all exchange routes gradients to owning shards."""
    assert len(jax.devices()) >= 8
    model, cam = _model(seed=3, n=60, cap=128, H=128, W=32)
    H, W, S = 128, 32, 2
    mesh_g = make_mesh(2, 4, axis_names=("dp", "gs"))
    mesh_r = make_mesh(2, 4)
    srcs = SourceViews(
        images=jnp.zeros((2, S, H, W, 3)), depths=jnp.zeros((2, S, H, W)),
        ref_to_src=jnp.tile(jnp.eye(4)[None, None], (2, S, 1, 1)),
        cam_pos=jnp.zeros((2, S, 3)),
        count=jnp.zeros((2,), jnp.int32))
    gts = jnp.tile(jnp.asarray(
        np.linspace(0, 1, H * W * 3, dtype=np.float32).reshape(1, H, W, 3)),
        (2, 1, 1, 1))
    ca = _cam_stack([cam, cam])
    gstep = gsp_train_step(CFG, mesh_g, W, H, cap_local=2048,
                           exchange_cap=1024)
    rstep = sharded_train_step(None, CFG, mesh_r, W, H)
    m1, l1, ovf = gstep(model, ca, gts, srcs, jnp.int32(1))
    m2, l2 = rstep(model, ca, gts, srcs, jnp.int32(1))
    assert int(ovf) == 0
    assert abs(float(l1) - float(l2)) < 1e-5, (float(l1), float(l2))
    # Adam at step 1 normalises: update ~ lr * g / (|g| + eps), so f32
    # summation-order noise on a NEAR-ZERO gradient element (the all_to_all
    # reorders the instance reduction) flips that element's whole +-lr step.
    # The per-element bound is therefore 2*lr (position_lr 1.6e-4, normal_lr
    # 1e-3 — the observed violations sit exactly at 2*lr), not a uniform
    # tight tolerance; the 1e-5 loss match above carries the exactness
    # claim for the forward + reduction path.
    np.testing.assert_allclose(np.asarray(m1.params.xyz),
                               np.asarray(m2.params.xyz), atol=4e-4)
    np.testing.assert_allclose(np.asarray(m1.params.normal),
                               np.asarray(m2.params.normal), atol=2.5e-3)
    # a few more steps stay finite and improve
    m, l0 = m1, l1
    for i in range(2, 6):
        m, l, _ = gstep(m, ca, gts, srcs, jnp.int32(i))
    assert np.isfinite(float(l)) and float(l) < float(l0)


def test_gsp_overflow_counter():
    """A too-small exchange capacity reports dropped instances instead of
    crashing (and still renders finitely)."""
    model, cam = _model(seed=4, n=60, cap=64, H=128, W=32)
    mesh = make_mesh(1, 8, axis_names=("dp", "gs"))
    img, ovf = gsp_render(model, cam, CFG, mesh, cap_local=1024,
                          exchange_cap=8)
    assert int(ovf) > 0
    assert np.isfinite(np.asarray(img)).all()
