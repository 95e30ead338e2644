"""End-to-end training validation on the REAL TPU (Pallas backend).

Runs the full training cadence (densify/prune/reset, normal + multi-view
losses, colour aggregation with burn-in) on a 128x128 synthetic scene and
reports the PSNR trajectory + wall-clock.  This is milestone (4) of
BASELINE.md executed on hardware rather than the CPU oracle.

Run: `python scripts/tpu_train_validation.py [out_dir]` (claims the TPU).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_train_val"
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from ibgs_tpu.config import (ModelParams, OptimizationParams,
                                 PipelineParams)
    from ibgs_tpu.data.synthetic import make_synthetic_scene
    from ibgs_tpu.train.loop import train

    scene = make_synthetic_scene(n_views=16, width=128, height=128,
                                 n_gt=4000, n_seed=1200, eval_every=8)
    opt = OptimizationParams(
        iterations=int(os.environ.get("VAL_ITERS", 3000)),
        densify_from_iter=500, densification_interval=100,
        densify_until_iter=1500, opacity_reset_interval=3000,
        single_view_weight_from_iter=700, multi_view_weight_from_iter=700,
        use_color_aggregation=True, start_color_aggregation_iter=1200,
        color_aggregate_burnin_steps=400,
        number_src_frames=4, nb_visible_src_frames=3,
        position_lr_max_steps=3000,
    )
    pipe = PipelineParams(backend="pallas", instance_cap=1 << 17)
    start_ckpt = None
    if len(sys.argv) > 2:                     # resume after a relay drop
        start_ckpt = sys.argv[2]
    t0 = time.time()
    evals = () if os.environ.get("VAL_NO_EVAL") else (1000, 2000, 3000)
    train(scene, ModelParams(sh_degree=2), opt, pipe, model_path=out,
          save_iterations=(opt.iterations,), test_iterations=evals,
          checkpoint_iterations=(500, 1000, 1500, 2000, 2500),
          start_checkpoint=start_ckpt,
          log_every=int(os.environ.get("VAL_LOG_EVERY", 200)), quiet=True)
    wall = time.time() - t0

    log = [json.loads(l) for l in open(os.path.join(out, "train_log.jsonl"))]
    first, last = log[0], log[-1]
    print(json.dumps({
        "tpu_train_validation": {
            "iters": opt.iterations, "wall_s": round(wall, 1),
            "it_per_s": round(opt.iterations / wall, 2),
            "first_psnr": first["psnr"], "last_psnr": last["psnr"],
            "points": last.get("points"),
            "device": str(jax.devices()[0]),
        }}))


if __name__ == "__main__":
    main()
