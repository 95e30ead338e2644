"""Capture a converged-scene bench bundle for `BENCH_CKPT` (VERDICT r4 #3).

A bundle freezes ONE real training-step input at a converged model — the
reference's steady-state operating point (converged opacity distribution →
the blend kernel's early-exit regime, which the random bench scene never
reaches): the alive Gaussian parameters, one train camera (stored as
pose + fov so bench.py can rebuild it at ANY resolution), its ground
truth, and the exact source pack (images + the EVOLVED per-view median
depth cache + relative transforms).

Two entry points:
  * `write_bundle(...)` — called in-process by training drivers
    (scripts/tpu_ref30k_run.py) where state/stacks are already in hand;
  * CLI: `python scripts/make_bench_bundle.py <model_path> <out.npz>
    [--spec V W H GT SEED]` — loads the latest PLY snapshot, rebuilds the
    synthetic scene it was trained on, re-renders the source depth cache
    with the converged model, then writes the bundle.
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def write_bundle(path, model, scene, depths_stack, cam_idx, opt):
    """model: gathered GaussianModel; depths_stack: (N_train, H, W) median
    depth cache (the training loop's stacks["depths"]); cam_idx: train
    view to freeze."""
    import jax
    import jax.numpy as jnp
    from ibgs_tpu.renderer import source_views_from_stacks

    cam = scene.train_cameras[cam_idx]
    view = np.asarray(cam.view)
    R = view[:3, :3].T
    t = view[:3, 3]
    fovx = 2.0 * math.atan(float(cam.tan_fovx))
    fovy = 2.0 * math.atan(float(cam.tan_fovy))

    w2v, centers, _ = scene.poses_stack()
    nbrs = list(scene.nearest_ids[cam_idx][: opt.number_src_frames])
    S = max(len(nbrs), 1)
    idx = np.zeros((S,), np.int32)
    idx[: len(nbrs)] = nbrs
    src = source_views_from_stacks(
        jnp.asarray(scene.images), jnp.asarray(depths_stack),
        jnp.asarray(w2v), jnp.asarray(centers),
        jnp.asarray(idx), jnp.int32(len(nbrs)), cam)

    alive = np.asarray(model.alive)
    p = jax.tree.map(lambda x: np.asarray(x)[alive], model.params)
    np.savez_compressed(
        path,
        xyz=p.xyz, sh_dc=p.sh_dc, sh_rest=p.sh_rest,
        log_scale=p.log_scale, quat=p.quat,
        opacity_logit=p.opacity_logit, normal=p.normal, offset=p.offset,
        cam_R=R, cam_t=t, fovx=np.float64(fovx), fovy=np.float64(fovy),
        gt=np.asarray(scene.images[cam_idx], np.float32),
        src_images=np.asarray(src.images),
        src_depths=np.asarray(src.depths),
        src_ref_to_src=np.asarray(src.ref_to_src),
        src_cam_pos=np.asarray(src.cam_pos),
        src_count=np.asarray(src.count),
    )
    print(f"bundle: {alive.sum()} splats, cam {cam_idx}, "
          f"{len(nbrs)} sources -> {path} "
          f"({os.path.getsize(path) / 1e6:.1f} MB)")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model_path")
    ap.add_argument("out")
    ap.add_argument("--spec", nargs=5, type=int,
                    default=[16, 960, 544, 150_000, 20_000],
                    metavar=("V", "W", "H", "GT", "SEED"),
                    help="synthetic scene spec the model was trained on")
    ap.add_argument("--cam_idx", type=int, default=0)
    ap.add_argument("--iteration", type=int, default=-1)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp

    from ibgs_tpu.config import OptimizationParams
    from ibgs_tpu.data.ply import load_gaussian_ply
    from ibgs_tpu.data.synthetic import make_synthetic_scene
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.renderer import render_depth_view

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _model_from_raw, _round_up

    v, w, h, ngt, nseed = args.spec
    scene = make_synthetic_scene(n_views=v, width=w, height=h, n_gt=ngt,
                                 n_seed=nseed, eval_every=8)

    pc_root = os.path.join(args.model_path, "point_cloud")
    it = args.iteration
    if it == -1:
        it = max(int(d.split("_")[-1]) for d in os.listdir(pc_root))
    d = load_gaussian_ply(os.path.join(pc_root, f"iteration_{it}",
                                       "point_cloud.ply"))
    n = d["xyz"].shape[0]
    model = _model_from_raw(d, _round_up(1.31 * n, 1024))

    opt = OptimizationParams()
    backend = "oracle" if jax.default_backend() == "cpu" else "pallas"
    rcfg = RasterConfig(instance_cap=1 << 20, backend=backend,
                        staircase_cull=True, row_cap=1 << 19)
    depth_fn = jax.jit(lambda m, c: render_depth_view(
        m, c, rcfg, learnt_normal=opt.learnt_normal))
    H, W = scene.images.shape[1:3]
    depths = np.zeros((scene.n_train, H, W), np.float32)
    for ci in scene.nearest_ids[args.cam_idx][: opt.number_src_frames]:
        depths[ci] = np.asarray(depth_fn(model, scene.train_cameras[ci]))
    write_bundle(args.out, model, scene, jnp.asarray(depths),
                 args.cam_idx, opt)


if __name__ == "__main__":
    main()
