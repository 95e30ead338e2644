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


@pytest.mark.slow
@pytest.mark.parametrize("stair", [False, True])
def test_gsp_render_matches_single(stair):
    """Exact vs the replicated renderer — with the staircase expansion ON
    the bins (and the all_to_all exchange volume) shrink before the
    exchange, and the result must stay exact (VERDICT r2 #5)."""
    import dataclasses
    assert len(jax.devices()) >= 8
    model, cam = _model(seed=1, n=60, cap=128, H=128, W=32)
    cfg = dataclasses.replace(CFG, staircase_cull=stair, row_cap=1024)
    mesh = make_mesh(1, 8, axis_names=("dp", "gs"))
    img, ovf = gsp_render(model, cam, cfg, mesh, cap_local=1024,
                          exchange_cap=512, bg=jnp.array([0.2, 0.3, 0.4]))
    ref, _ = render_view(model, cam, CFG, jnp.array([0.2, 0.3, 0.4]),
                         render_geo=False, return_depth_normal=False)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.render),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
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


@pytest.mark.slow
def test_gsp_full_objective_matches_single():
    """The FULL IBGS objective (image + normal-consistency + multi-view
    photometric + aggregation-net losses, AppModel exposure, densify-stat
    dummies) under Gaussian-sharded SPMD must match the single-chip
    make_train_step: same loss/aux scalars and the same post-Adam params
    up to the documented sign-step bound (fresh-state Adam updates are
    lr·g/(|g|+eps) ≈ ±lr, so an element whose gradient is at the f32
    reduction-order noise floor can flip its whole ±lr step — the
    per-element bound is 2·lr per group, with the loss match carrying the
    exactness claim)."""
    assert len(jax.devices()) >= 4
    from ibgs_tpu.config import OptimizationParams
    from ibgs_tpu.models import aggregation
    from ibgs_tpu.parallel.gsp import gsp_full_train_step
    from ibgs_tpu.renderer import render_depth_view
    from ibgs_tpu.train.trainer import (SideOptState, StepPhase, TrainState,
                                        make_train_step)

    model, cam = _model(seed=5, n=60, cap=128, H=128, W=32)
    H, W, S = 128, 32, 3
    opt = OptimizationParams(
        use_color_aggregation=True, number_src_frames=S,
        nb_visible_src_frames=2, single_view_weight_from_iter=0,
        multi_view_weight_from_iter=0, start_color_aggregation_iter=0,
        position_lr_max_steps=100)
    phase = StepPhase(render_geo=True, use_aggregation=True)
    net = aggregation.ColorFusionResidualNet(
        feat_aggregate_mode=opt.feat_aggregate_mode)
    net_params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((H, W, 2, 7)), jnp.zeros((H, W, 3)),
                          jnp.zeros((H, W, 3)))
    state = TrainState(
        model=model,
        app_ab=jnp.zeros((1600, 2), jnp.float32),
        app_opt=SideOptState.init(jnp.zeros((1600, 2))),
        net_params=net_params,
        net_opt=SideOptState.init(net_params),
        spatial_lr_scale=jnp.float32(1.0),
    )
    # source views whose cached depth equals this view's own render →
    # the occlusion test passes and the photometric/aggregation paths see
    # valid warps (ref_to_src = identity)
    d0 = render_depth_view(model, cam, CFG)
    ks = jax.random.split(jax.random.PRNGKey(7), 2)
    src = SourceViews(
        images=jax.random.uniform(ks[0], (S, H, W, 3)),
        depths=jnp.tile(d0[None], (S, 1, 1)),
        ref_to_src=jnp.tile(jnp.eye(4)[None], (S, 1, 1)),
        cam_pos=jax.random.normal(ks[1], (S, 3)) * 0.05,
        count=jnp.int32(S))
    gt = jax.random.uniform(jax.random.PRNGKey(9), (H, W, 3))
    it, bg = jnp.int32(5), jnp.zeros(3)
    use_app, burned = jnp.bool_(True), jnp.float32(1.0)
    net_lr = jnp.float32(1e-4)

    sstep = make_train_step(opt, CFG, net, phase)
    s1, aux1 = sstep(state, cam, jnp.int32(0), gt, src, it, bg,
                     use_app, burned, net_lr)

    mesh = make_mesh(1, 4, axis_names=("dp", "gs"))
    gstep = gsp_full_train_step(opt, CFG, net, phase, mesh, W, H,
                                cap_local=2048, exchange_cap=1024)
    srcs = jax.tree.map(lambda x: x[None], src)
    s2, aux2 = gstep(state, _cam_stack([cam]), jnp.zeros((1,), jnp.int32),
                     gt[None], srcs, it, bg, use_app, burned, net_lr)

    assert int(aux2["n_overflow"]) == 0
    for k in ("image_loss", "normal_loss", "photo_loss", "agg_loss", "l1",
              "psnr"):
        a, b = float(aux1[k]), float(aux2[k])
        assert abs(a - b) <= 2e-5 * max(abs(a), 1.0), (k, a, b)
    np.testing.assert_allclose(np.asarray(aux2["median_depth"][0]),
                               np.asarray(aux1["median_depth"]),
                               rtol=1e-5, atol=1e-6)

    # post-step params: per-group sign-step bound (docstring)
    lrs = dict(xyz=1.6e-4, sh_dc=2.5e-3, sh_rest=1.25e-4, log_scale=5e-3,
               quat=1e-3, opacity_logit=2.5e-2, normal=1e-3, offset=8e-5)
    for f, lr in lrs.items():
        a = np.asarray(getattr(s1.model.params, f))
        b = np.asarray(getattr(s2.model.params, f))
        if a.size == 0:      # sh_rest is (P, 0, 3) at sh degree 0
            continue
        d = np.abs(a - b)
        assert d.max() <= 2.05 * lr, (f, d.max(), lr)
        assert (d > 1e-6).mean() < 0.05, (f, (d > 1e-6).mean())
    # densify statistics accumulated identically (pure data-plane values)
    np.testing.assert_allclose(np.asarray(s1.model.grad_accum),
                               np.asarray(s2.model.grad_accum),
                               rtol=1e-3, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(s1.model.denom),
                                  np.asarray(s2.model.denom))
    # AppModel + aggregation-net updates match within the same mechanism
    np.testing.assert_allclose(np.asarray(s1.app_ab), np.asarray(s2.app_ab),
                               atol=2.1e-3)
    for la, lb in zip(jax.tree.leaves(s1.net_params),
                      jax.tree.leaves(s2.net_params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2.1 * float(net_lr))


@pytest.mark.slow
def test_gsp_densify_is_shard_local():
    """gsp_densify_fn allocates clone/split slots within each shard's own
    pool; after gsp_interleave spreads alive rows and free slots evenly,
    alive counts grow, dead-slot surgery stays masked, and the step
    remains runnable afterwards."""
    from ibgs_tpu.models.gaussians import DensifyConfig
    from ibgs_tpu.parallel.gsp import gsp_densify_fn, gsp_interleave

    model, cam = _model(seed=6, n=64, cap=128, H=128, W=32)
    # force clones: every alive splat flagged high-gradient and small
    model = model.replace(
        grad_accum=jnp.where(model.alive, 1.0, 0.0),
        denom=jnp.where(model.alive, 1.0, 0.0),
    )
    # without the interleave the block-wise sharding packs every alive row
    # into shards 0-1 and every free slot into shards 2-3 → zero grants
    model = gsp_interleave(model, 4)
    assert np.asarray(model.alive).reshape(4, -1).sum(1).std() == 0.0
    mesh = make_mesh(1, 4, axis_names=("dp", "gs"))
    dens = gsp_densify_fn(mesh, DensifyConfig(grad_threshold=1e-9,
                                              percent_dense=10.0))
    m2 = dens(model, jax.random.PRNGKey(0), jnp.float32(1.0))
    assert int(m2.n_alive) > int(model.n_alive)
    # stats were reset
    assert float(m2.grad_accum.sum()) == 0.0
    # per-shard allocation: every shard of 32 slots gained splats
    alive = np.asarray(m2.alive).reshape(4, -1)
    before = np.asarray(model.alive).reshape(4, -1)
    assert (alive.sum(1) >= before.sum(1)).all()
    img, ovf = gsp_render(jax.device_get(m2), cam, CFG, mesh,
                          cap_local=2048, exchange_cap=1024)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.slow
def test_gsp_single_band_fast_path_matches_generic():
    """At n_gs=1 the exchange is skipped entirely (identity fast path,
    taken when exchange_cap >= cap_local); forcing the generic
    scatter/all_to_all/re-sort path with exchange_cap < cap_local (large
    enough that nothing drops) must produce the identical image — the
    two code paths must agree bit-for-bit with each other and with the
    unsharded renderer."""
    model, cam = _model(seed=5, n=60, cap=128, H=128, W=32)
    mesh = make_mesh(1, 1, axis_names=("dp", "gs"))
    img_fast, ovf_fast = gsp_render(model, cam, CFG, mesh, cap_local=1024,
                                    exchange_cap=1024)
    img_gen, ovf_gen = gsp_render(model, cam, CFG, mesh, cap_local=1024,
                                  exchange_cap=512)
    assert int(ovf_fast) == 0 and int(ovf_gen) == 0
    np.testing.assert_array_equal(np.asarray(img_fast), np.asarray(img_gen))
    ref, _ = render_view(model, cam, CFG, jnp.zeros(3), render_geo=False,
                         return_depth_normal=False)
    np.testing.assert_allclose(np.asarray(img_fast),
                               np.asarray(ref.render), rtol=1e-5, atol=1e-6)


def test_generic_exchange_gradients_match_fast_path():
    """The gather-only routing (_route_rows/_permute_rows custom VJPs —
    no 16-wide scatter in forward or backward) must carry EXACTLY the
    same gradients as the identity fast path: force the generic
    scatter→all_to_all→merge→permute composition at n_gs=1 with
    exchange_cap < cap_local and compare d(loss)/d(params) bit-for-bit."""
    from ibgs_tpu.parallel.gsp import make_gsp_render

    model, cam = _model(seed=7, n=60, cap=128, H=128, W=32)
    mesh = make_mesh(1, 1, axis_names=("dp", "gs"))

    def grad_of(exchange_cap):
        render = make_gsp_render(cam.width, cam.height, CFG, mesh,
                                 cap_local=1024, exchange_cap=exchange_cap)

        def loss(params):
            img, _ = render(model.replace(params=params), cam)
            return (img * jnp.arange(3)[None, None]).sum()

        return jax.grad(loss)(model.params)

    g_fast = grad_of(1024)       # identity fast path
    g_gen = grad_of(512)         # generic exchange (nothing drops)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_gen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gsp_overflow_counter():
    """A too-small exchange capacity reports dropped instances instead of
    crashing (and still renders finitely)."""
    import dataclasses
    model, cam = _model(seed=4, n=60, cap=64, H=128, W=32)
    mesh = make_mesh(1, 8, axis_names=("dp", "gs"))
    # pin 16x16 tiles: at the 16x32 default this 32-px-wide scene makes
    # too few instances per (src, dst) pair to overflow exchange_cap=8
    cfg = dataclasses.replace(CFG, tile_h=16, tile_w=16)
    img, ovf = gsp_render(model, cam, cfg, mesh, cap_local=1024,
                          exchange_cap=8)
    assert int(ovf) > 0
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.slow
def test_train_driver_on_mesh(tmp_path):
    """The production train() driver with mesh= trains the full cadence
    under Gaussian-sharded SPMD on the virtual CPU mesh: loss improves,
    shard-local densification grows points, eval + PLY snapshot run on
    gathered copies."""
    import os

    from ibgs_tpu.config import ModelParams, OptimizationParams, PipelineParams
    from ibgs_tpu.data.synthetic import make_synthetic_scene
    from ibgs_tpu.train.loop import train

    scene = make_synthetic_scene(n_views=6, width=32, height=64,
                                 n_gt=400, n_seed=150)
    opt = OptimizationParams(
        iterations=40, densify_from_iter=10, densification_interval=15,
        densify_until_iter=38, opacity_reset_interval=10_000,
        single_view_weight_from_iter=20, multi_view_weight_from_iter=20,
        use_color_aggregation=True, start_color_aggregation_iter=28,
        color_aggregate_burnin_steps=8, number_src_frames=2,
        nb_visible_src_frames=2, position_lr_max_steps=40)
    pipe = PipelineParams(backend="oracle", instance_cap=1 << 14)
    mesh = make_mesh(1, 4, axis_names=("dp", "gs"))
    state, stacks = train(
        scene, ModelParams(sh_degree=1), opt, pipe,
        model_path=str(tmp_path), save_iterations=(40,),
        test_iterations=(40,), log_every=10, quiet=True, mesh=mesh)
    import json
    log = [json.loads(l) for l in
           open(os.path.join(str(tmp_path), "train_log.jsonl"))]
    assert np.isfinite(log[-1]["image_loss"])
    assert log[-1]["psnr"] > log[0]["psnr"] + 1.0, (log[0], log[-1])
    assert "n_overflow" not in log[-1], log[-1]
    assert os.path.exists(os.path.join(
        str(tmp_path), "point_cloud", "iteration_40", "point_cloud.ply"))
    # per-shard balance held through densification
    alive = np.asarray(state.model.alive).reshape(4, -1).sum(1)
    assert (alive > 0).all(), alive


@pytest.mark.slow
def test_train_driver_dp2(tmp_path):
    """dp=2 camera batching in the production driver (VERDICT r3 #9): a
    (2, 2) ('dp','gs') mesh feeds two cameras per step; loss finite, PSNR
    improving, and the depth cache is filled for BOTH dp rows' cameras."""
    import json
    import os

    from ibgs_tpu.config import ModelParams, OptimizationParams, PipelineParams
    from ibgs_tpu.data.synthetic import make_synthetic_scene
    from ibgs_tpu.train.loop import train

    scene = make_synthetic_scene(n_views=6, width=32, height=64,
                                 n_gt=400, n_seed=150)
    opt = OptimizationParams(
        iterations=30, densify_from_iter=10, densification_interval=15,
        densify_until_iter=28, opacity_reset_interval=10_000,
        single_view_weight_from_iter=12, multi_view_weight_from_iter=12,
        use_color_aggregation=False, number_src_frames=2,
        nb_visible_src_frames=2, position_lr_max_steps=30)
    pipe = PipelineParams(backend="oracle", instance_cap=1 << 14)
    mesh = make_mesh(2, 2, axis_names=("dp", "gs"))
    state, stacks = train(
        scene, ModelParams(sh_degree=1), opt, pipe,
        model_path=str(tmp_path), save_iterations=(), test_iterations=(),
        log_every=5, quiet=True, mesh=mesh)
    log = [json.loads(l) for l in
           open(os.path.join(str(tmp_path), "train_log.jsonl"))]
    assert np.isfinite(log[-1]["image_loss"])
    assert log[-1]["psnr"] > log[0]["psnr"] + 1.0, (log[0], log[-1])
    # geo phase ran with dp=2: every train view's depth-cache row written
    d = np.abs(np.asarray(stacks["depths"])).reshape(scene.n_train, -1)
    assert (d.sum(-1) > 0).all(), d.sum(-1)
