#!/usr/bin/env python
"""Evaluation rendering CLI (reference render.py UX).

    python render.py -m <model_dir> [--skip_train] [--render_geo] [--synthetic]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from ibgs_tpu import config as C


def main(argv=None):
    parser = C.build_parser("ibgs_tpu rendering")
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--render_geo", action="store_true",
                        help="TSDF-fuse depths and extract a mesh")
    parser.add_argument("--voxel_size", type=float, default=0.01)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_spec", nargs=5, type=int,
                        default=[12, 64, 64, 1200, 400],
                        metavar=("VIEWS", "W", "H", "N_GT", "N_SEED"))
    parser.add_argument("--measure_fps", action="store_true", default=True)
    parser.add_argument("--use_depth_filter", action="store_true",
                        help="zero grazing-angle depths before TSDF fusion")
    parser.add_argument("--src_image_ext", type=str, default="jpg")
    args = C.load_combined(parser, argv)

    mp = C.extract(args, C.ModelParams)
    opt = C.extract(args, C.OptimizationParams)
    pipe = C.extract(args, C.PipelineParams)

    import jax.numpy as jnp
    from ibgs_tpu.data.ply import load_gaussian_ply
    from ibgs_tpu.eval.render_driver import (EvalRenderer,
                                             dump_test_time_data,
                                             extract_tsdf_mesh,
                                             folder_size_mb, render_split)
    from ibgs_tpu.models import aggregation
    from ibgs_tpu.models.gaussians import GaussianModel, init_from_points
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.train.checkpoint import load_state
    from ibgs_tpu.train.trainer import SideOptState, TrainState

    if getattr(args, "synthetic", False):
        from ibgs_tpu.data.synthetic import make_synthetic_scene
        v, w, h, ngt, nseed = args.synthetic_spec
        scene = make_synthetic_scene(n_views=v, width=w, height=h,
                                     n_gt=ngt, n_seed=nseed,
                                     eval_every=max(v // 2, 2))
    else:
        from ibgs_tpu.data.dataset import load_scene
        scene = load_scene(
            mp.source_path, images_dir=mp.images, resolution=mp.resolution,
            eval_split=mp.eval, white_background=mp.white_background,
            multi_view_num=mp.multi_view_num,
            multi_view_max_angle=mp.multi_view_max_angle,
            multi_view_min_dis=mp.multi_view_min_dis,
            multi_view_max_dis=mp.multi_view_max_dis,
            exposure_reorder=opt.enable_exposure_correction)

    # locate the trained point cloud
    pc_root = os.path.join(mp.model_path, "point_cloud")
    it = args.iteration
    if it == -1:
        its = [int(d.split("_")[-1]) for d in os.listdir(pc_root)]
        it = max(its)
    ply_path = os.path.join(pc_root, f"iteration_{it}", "point_cloud.ply")
    d = load_gaussian_ply(ply_path)
    n = d["xyz"].shape[0]
    model = init_from_points(np.zeros((4, 3), np.float32),
                             np.zeros((4, 3), np.float32),
                             mp.sh_degree,
                             capacity=1 << int(np.ceil(np.log2(max(n, 8)))))

    def fill(dst, src):
        out = np.zeros_like(np.asarray(dst))
        out[:n] = src.reshape(out[:n].shape)
        return jnp.asarray(out)

    model = model.replace(
        params=model.params.replace(
            xyz=fill(model.params.xyz, d["xyz"]),
            sh_dc=fill(model.params.sh_dc, d["sh_dc"]),
            sh_rest=fill(model.params.sh_rest, d["sh_rest"]),
            log_scale=fill(model.params.log_scale, d["log_scale"]),
            quat=fill(model.params.quat, d["quat"]),
            opacity_logit=fill(model.params.opacity_logit,
                               d["opacity_logit"]),
            normal=fill(model.params.normal, d["normal"]),
            offset=fill(model.params.offset, d["offset"])),
        alive=jnp.arange(model.capacity) < n,
        active_sh_degree=jnp.int32(mp.sh_degree),
    )

    H, W = scene.images.shape[1:3]
    net = net_params = None
    if opt.use_color_aggregation:
        net = aggregation.ColorFusionResidualNet(
            feat_aggregate_mode=opt.feat_aggregate_mode)
        ckpts = [f for f in os.listdir(mp.model_path)
                 if f.startswith("chkpnt")]
        if ckpts:
            import jax
            last = sorted(ckpts, key=lambda s: int(s[6:-4]))[-1]
            S = opt.nb_visible_src_frames
            tmpl_net = net.init(jax.random.PRNGKey(0),
                                jnp.zeros((H, W, S, 7)), jnp.zeros((H, W, 3)),
                                jnp.zeros((H, W, 3)))
            tmpl = TrainState(
                model=model, app_ab=jnp.zeros((1600, 2)),
                app_opt=SideOptState.init(jnp.zeros((1600, 2))),
                net_params=tmpl_net, net_opt=SideOptState.init(tmpl_net),
                spatial_lr_scale=jnp.float32(1.0))
            try:
                st, _ = load_state(tmpl, os.path.join(mp.model_path, last))
                net_params = st.net_params
            except Exception as e:
                print(f"[warn] could not restore net from {last}: {e}")
                net = None
        else:
            net = None

    state = TrainState(model=model, app_ab=jnp.zeros((1600, 2)),
                       app_opt=SideOptState.init(jnp.zeros((1600, 2))),
                       net_params=net_params, net_opt=None,
                       spatial_lr_scale=jnp.float32(1.0))
    rcfg = RasterConfig(instance_cap=pipe.instance_cap,
                        buffer_len=opt.buffer_length,
                        depth_error_threshold=opt.depth_error_threshold,
                        backend=pipe.backend,
                        mix_precision=opt.enable_mix_precision)
    ev = EvalRenderer(state, scene, opt, rcfg, net=net)

    results = {}
    misc_path = None
    if not args.skip_test and scene.test_cameras:
        # store + reload lossy source data first, mimicking the real test
        # environment (reference render.py:157-186)
        misc_path = dump_test_time_data(ev, mp.model_path, it,
                                        ext=args.src_image_ext)
        fps = render_split(
            ev, scene.test_cameras,
            [scene.test_images[k] for k in range(len(scene.test_cameras))],
            scene.test_nearest_ids,
            os.path.join(mp.model_path, "test", f"ours_{it}"),
            measure_fps=args.measure_fps)
        results["FPS"] = results["fps"] = fps
    if not args.skip_train:
        render_split(
            ev, scene.train_cameras,
            [scene.images[k] for k in range(scene.n_train)],
            scene.nearest_ids,
            os.path.join(mp.model_path, "train", f"ours_{it}"))
    if args.render_geo:
        mesh_path = os.path.join(mp.model_path, "mesh.ply")
        extract_tsdf_mesh(ev, mesh_path, voxel_size=args.voxel_size,
                          use_depth_filter=args.use_depth_filter)
        print("mesh written to", mesh_path)

    results["n_gaussians"] = results["num_gaussians"] = n
    results["model_mb"] = folder_size_mb(
        os.path.join(pc_root, f"iteration_{it}"))
    # full deployment footprint = stored src data + PLY + aggregation net
    # checkpoint (reference render.py:188-196)
    total_mb = results["model_mb"]
    if misc_path is not None:
        total_mb += folder_size_mb(misc_path)
    if net is not None:
        ckpts = [f for f in os.listdir(mp.model_path)
                 if f.startswith("chkpnt")]
        if ckpts:
            last = sorted(ckpts, key=lambda s: int(s[6:-4]))[-1]
            total_mb += os.path.getsize(
                os.path.join(mp.model_path, last)) / 1e6
    results["memory"] = total_mb
    with open(os.path.join(mp.model_path, "result_fps_mem.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
