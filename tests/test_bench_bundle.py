"""Converged-scene bench bundle roundtrip (scripts/make_bench_bundle.py →
bench._model_from_raw): the captured model must rebuild exactly and the
frozen camera/source pack must render finitely at native AND scaled
resolution (the paths bench.py uses for the converged configs)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bundle_roundtrip(tmp_path):
    from bench import _model_from_raw, _round_up
    from ibgs_tpu.config import OptimizationParams
    from ibgs_tpu.core.camera import make_camera
    from ibgs_tpu.data.synthetic import make_synthetic_scene
    from ibgs_tpu.models.gaussians import init_from_points
    from ibgs_tpu.ops.epilogue import SourceViews
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.renderer import render_view
    from scripts.make_bench_bundle import write_bundle

    scene = make_synthetic_scene(n_views=6, width=48, height=32, n_gt=500,
                                 n_seed=200, eval_every=3)
    model = init_from_points(scene.points, scene.colors, 2)
    H, W = scene.images.shape[1:3]
    depths = jnp.full((scene.n_train, H, W), 2.5, jnp.float32)
    opt = OptimizationParams(number_src_frames=3)
    path = str(tmp_path / "bundle.npz")
    write_bundle(path, model, scene, depths, cam_idx=1, opt=opt)

    d = dict(np.load(path))
    n = d["xyz"].shape[0]
    assert n == int(model.n_alive)
    m2 = _model_from_raw(d, _round_up(1.31 * n, 256))
    # parameters of alive rows survive exactly
    alive = np.asarray(model.alive)
    np.testing.assert_array_equal(np.asarray(model.params.xyz)[alive],
                                  np.asarray(m2.params.xyz)[: n])
    np.testing.assert_array_equal(
        np.asarray(model.params.opacity_logit)[alive],
        np.asarray(m2.params.opacity_logit)[: n])
    assert int(m2.n_alive) == n

    # the frozen camera rebuilds at native AND doubled resolution
    cfg = RasterConfig(instance_cap=4096, backend="oracle",
                       staircase_cull=True, row_cap=2048)
    for scale in (1, 2):
        cam = make_camera(d["cam_R"], d["cam_t"], float(d["fovx"]),
                          float(d["fovy"]), W * scale, H * scale)
        Hs, Ws = H * scale, W * scale
        imgs = d["src_images"] if scale == 1 else np.repeat(
            np.repeat(d["src_images"], 2, 1), 2, 2)
        deps = d["src_depths"] if scale == 1 else np.repeat(
            np.repeat(d["src_depths"], 2, 1), 2, 2)
        src = SourceViews(
            images=jnp.asarray(imgs, jnp.float32),
            depths=jnp.asarray(deps, jnp.float32),
            ref_to_src=jnp.asarray(d["src_ref_to_src"], jnp.float32),
            cam_pos=jnp.asarray(d["src_cam_pos"], jnp.float32),
            count=jnp.int32(int(d["src_count"])))
        res, _ = render_view(m2, cam, cfg, jnp.zeros(3), src=src,
                             render_geo=True, return_depth_normal=False)
        img = np.asarray(res.render)
        assert img.shape == (Hs, Ws, 3) and np.isfinite(img).all()
        assert int(res.n_instances) > 0
        # native resolution must reproduce the same view the scene renders
        if scale == 1:
            ref, _ = render_view(model, scene.train_cameras[1], cfg,
                                 jnp.zeros(3), src=src, render_geo=True,
                                 return_depth_normal=False)
            np.testing.assert_allclose(img, np.asarray(ref.render),
                                       rtol=1e-5, atol=1e-5)
