#!/usr/bin/env python
"""Training CLI (reference train.py UX).

    python train.py -s <scene_dir> -m <model_dir> [-r 2 --eval ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from ibgs_tpu import config as C


def main(argv=None):
    parser = C.build_parser("ibgs_tpu training")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 15_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--port", type=int, default=None,
                        help="serve the SIBR network viewer on this port")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on the built-in synthetic scene")
    parser.add_argument("--synthetic_spec", nargs=5, type=int,
                        default=[12, 64, 64, 1200, 400],
                        metavar=("VIEWS", "W", "H", "N_GT", "N_SEED"),
                        help="synthetic scene shape (with --synthetic)")
    parser.add_argument("--gsp_shards", type=int, default=0,
                        help="train under Gaussian-sharded SPMD on a "
                             "(dp, N)-device ('dp','gs') mesh; joins the "
                             "multi-host group first if COORDINATOR_ADDRESS "
                             "etc. are set (parallel/distributed.py)")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel camera batching: dp cameras "
                             "per step on the mesh's dp axis (requires "
                             "--gsp_shards; dp*gsp_shards devices)")
    args = parser.parse_args(argv)

    mp = C.extract(args, C.ModelParams)
    opt = C.extract(args, C.OptimizationParams)
    pipe = C.extract(args, C.PipelineParams)
    if not mp.model_path:
        import uuid
        mp.model_path = os.path.join("./output", str(uuid.uuid4())[:10])
    args.model_path = mp.model_path
    C.save_config(args, mp.model_path)

    np.random.seed(24)

    mesh = None
    if args.gsp_shards:
        # must run before ANY JAX call initialises the backend (scene
        # loading below touches JAX)
        from ibgs_tpu.parallel import distributed
        distributed.initialize()       # single-process fallback is a no-op
        mesh = distributed.global_mesh(args.dp, args.gsp_shards,
                                       axis_names=("dp", "gs"))
        import jax as _jax
        print(f"GSP mesh: {args.dp} x {args.gsp_shards} devices "
              f"across {_jax.process_count()} process(es)")

    if args.synthetic:
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
            exposure_reorder=opt.enable_exposure_correction,
        )
    print(f"scene: {scene.n_train} train / {len(scene.test_cameras)} test "
          f"cams, {scene.images.shape[1:3]} px, "
          f"{len(scene.points)} seed points, extent {scene.cameras_extent:.2f}")

    from ibgs_tpu.train.loop import train
    if opt.iterations not in args.save_iterations:
        args.save_iterations.append(opt.iterations)
    train(scene, mp, opt, pipe, mp.model_path,
          save_iterations=tuple(args.save_iterations),
          test_iterations=tuple(args.test_iterations),
          checkpoint_iterations=tuple(args.checkpoint_iterations),
          start_checkpoint=args.start_checkpoint, quiet=args.quiet,
          viewer_port=args.port, mesh=mesh)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
