"""Full 30k-iteration REFERENCE-CADENCE hardware run (VERDICT r4 #2).

Executes the reference's exact training schedule — the shipped
OptimizationParams defaults, which mirror /root/reference/arguments/
__init__.py:87-138 — end to end on the real TPU at the bench scale:

  30_000 iterations; densify over [500, 15_000] every 100 with the
  un-halved thresholds (grad 2e-4 / abs 8e-4); opacity reset every
  3_000; geometry losses from 7_000; colour aggregation from 10_000
  with a 3_000-step burn-in and LR halvings at 18_000/25_000; SH degree
  ramp every 1_000; Adam position LR schedule over the full 30_000.

Scene: 960x544 synthetic (16 views, 150k GT points, 20k seed splats) —
no real datasets exist in this image (BASELINE.md), so the hermetic
synthetic scene is the operating proxy.  The debug trip wire stays armed
the whole run (per-step non-finite-gradient check + snapshot dump).

Artifacts: PSNR trajectory (train AND test at every eval), checkpoints
every 5k, PLY snapshots at 15k/30k, a final base-vs-aggregate test PSNR
comparison, and the converged-scene bench bundle
(`bench_bundle.npz`, consumed by bench.py / BENCH_CKPT).

Run: `python scripts/tpu_ref30k_run.py [out_dir] [resume_ckpt]`
Env:  REF_ITERS (30000), REF_DEBUG (1), REF_BUNDLE (path, default
      <repo>/bench_bundle.npz), REF_CAP (1<<19).
"""
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_ref30k_run"
    import jax
    cache_dir = os.path.join(_REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ibgs_tpu.config import (ModelParams, OptimizationParams,
                                 PipelineParams)
    from ibgs_tpu.data.synthetic import make_synthetic_scene
    from ibgs_tpu.train.loop import train

    iters = int(os.environ.get("REF_ITERS", 30_000))
    t0 = time.time()
    # scene-size overrides exist ONLY for CPU smoke tests of this script;
    # the production run uses the defaults
    scene = make_synthetic_scene(
        n_views=int(os.environ.get("REF_VIEWS", 16)),
        width=int(os.environ.get("REF_W", 960)),
        height=int(os.environ.get("REF_H", 544)),
        n_gt=int(os.environ.get("REF_GT", 150_000)),
        n_seed=int(os.environ.get("REF_SEED_PTS", 20_000)), eval_every=8)
    print(f"scene built in {time.time() - t0:.0f}s "
          f"({scene.n_train} train views)", flush=True)

    # THE reference schedule == the dataclass defaults; only the iteration
    # count is overridable (for short smoke tests of this script).
    opt = OptimizationParams(iterations=iters, position_lr_max_steps=iters)
    pipe = PipelineParams(
        backend=os.environ.get("REF_BACKEND", "pallas"),
        instance_cap=int(os.environ.get("REF_CAP", 1 << 19)),
        staircase_cull=True,
        debug=os.environ.get("REF_DEBUG", "1") == "1")
    start_ckpt = sys.argv[2] if len(sys.argv) > 2 else None

    evals = tuple(x for x in
                  (1000, 2500, 5000, 10000, 15000, 20000, 25000, iters)
                  if x <= iters)
    ckpts = tuple(range(5000, iters, 5000))
    saves = tuple(x for x in (15000, iters) if x <= iters)

    t0 = time.time()
    state, stacks = train(
        scene, ModelParams(sh_degree=2), opt, pipe, model_path=out,
        save_iterations=saves, test_iterations=evals,
        checkpoint_iterations=ckpts, start_checkpoint=start_ckpt,
        log_every=int(os.environ.get("REF_LOG_EVERY", 100)), quiet=False)
    wall = time.time() - t0
    done_iters = iters - (0 if start_ckpt is None else
                          int(os.path.basename(start_ckpt)[6:-4]))

    # ---- final base-vs-aggregate test PSNR (reference metrics.py:66-103:
    # results_renders.json vs results_renders_aggregate.json) ----
    from ibgs_tpu.eval.render_driver import EvalRenderer
    from ibgs_tpu.models import aggregation
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.train import losses

    net = aggregation.ColorFusionResidualNet(
        feat_aggregate_mode=opt.feat_aggregate_mode)
    eval_cap = int(os.environ.get("REF_EVAL_CAP", 1 << 21))
    rcfg = RasterConfig(
        instance_cap=eval_cap, buffer_len=opt.buffer_length, max_src=5,
        depth_error_threshold=opt.depth_error_threshold,
        backend=pipe.backend, mix_precision=opt.enable_mix_precision,
        staircase_cull=True, row_cap=eval_cap // 2)
    ev = EvalRenderer(state, scene, opt, rcfg, net=net)
    base_psnr, agg_psnr = [], []
    for k, cam in enumerate(scene.test_cameras):
        o = ev.render_one(cam, scene.test_nearest_ids[k])
        gt = jnp.asarray(scene.test_images[k])
        base_psnr.append(float(losses.psnr(jnp.clip(o["render"], 0, 1), gt)))
        agg_psnr.append(float(losses.psnr(
            jnp.clip(o.get("aggregate", o["render"]), 0, 1), gt)))
    base_vs_agg = {
        "test_psnr_base": round(float(np.mean(base_psnr)), 3),
        "test_psnr_aggregate": round(float(np.mean(agg_psnr)), 3),
    }
    print("base-vs-aggregate:", json.dumps(base_vs_agg), flush=True)

    # ---- converged-scene bench bundle (consumed by bench.py) ----
    bundle_path = os.environ.get(
        "REF_BUNDLE", os.path.join(_REPO, "bench_bundle.npz"))
    try:
        from scripts.make_bench_bundle import write_bundle
        write_bundle(bundle_path, jax.device_get(state.model), scene,
                     stacks["depths"], cam_idx=0, opt=opt)
    except Exception as e:
        print(f"bundle write failed: {e}", flush=True)

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items()
               if "bytes" in k or "size" in k}
    except Exception as e:
        mem = {"error": str(e)}

    log = [json.loads(l) for l in open(os.path.join(out, "train_log.jsonl"))]
    print(json.dumps({
        "metric": "30k reference-cadence hardware training",
        "iterations": iters, "wall_s": round(wall, 1),
        "it_per_s": round(done_iters / wall, 2),
        "points_final": log[-1]["points"],
        "final_train_psnr": round(log[-1]["psnr"], 2),
        **base_vs_agg,
        "psnr_trajectory": [(m["iter"], round(m["psnr"], 2))
                            for m in log[:: max(len(log) // 20, 1)]],
        "memory_stats": mem,
    }), flush=True)


if __name__ == "__main__":
    main()
