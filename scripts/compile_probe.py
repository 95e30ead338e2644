"""Cold-compile attribution for the bench graph (VERDICT r3 #5).

BENCH_r03 recorded a 303 s cold compile (vs 107 s in r02).  This probe
times the XLA+Mosaic compile of each pipeline sub-graph SEPARATELY with a
fresh (temp) compilation cache, so the growth can be pinned to a program
family:

  binning      : staircase (or AABB) expansion + tile sort + pack tables
  blend_fwd    : the forward Pallas kernel alone (pre-binned inputs)
  fwd          : full forward render (preprocess+binning+blend+epilogue)
  fwd_bwd      : full gradient step (the bench graph minus the fori chain)
  chain        : the exact bench chain (fori_loop of 5 fwd+bwd steps)

Env: CP_STAIR=0/1 (default 1), CP_TILE=16x32, CP_W/H/N/CAP/ROWCAP —
mirror bench.py's knobs to compare config families.

    python scripts/compile_probe.py            # claims the TPU
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    # FRESH cache: cold numbers, not warm-cache reads
    tmp = tempfile.mkdtemp(prefix="jaxcache_probe_")
    jax.config.update("jax_compilation_cache_dir", tmp)

    from ibgs_tpu.models.gaussians import init_from_points
    from ibgs_tpu.ops.epilogue import SourceViews
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.renderer import render_view
    from ibgs_tpu.train import losses
    from tests.utils import simple_camera

    W = int(os.environ.get("CP_W", 960))
    H = int(os.environ.get("CP_H", 544))
    n = int(os.environ.get("CP_N", 100_000))
    stair = os.environ.get("CP_STAIR", "1") == "1"
    cap = int(os.environ.get("CP_CAP", 629_000 if stair else 707_000))
    rowcap = int(os.environ.get("CP_ROWCAP", 301_000 if stair else 0))
    th, tw = (int(x) for x in os.environ.get("CP_TILE", "16x32").split("x"))

    rng = np.random.default_rng(0)
    pts = (rng.random((n, 3)) * 2.0 - 1.0).astype(np.float32)
    pts[:, 2] *= 0.3
    model = init_from_points(pts, rng.random((n, 3)).astype(np.float32),
                             max_sh_degree=2, capacity=131_072)
    cam = simple_camera(W, H)
    backend = "oracle" if jax.default_backend() == "cpu" else "pallas"
    cfg = RasterConfig(instance_cap=cap, backend=backend,
                       mix_precision=True, tile_h=th, tile_w=tw,
                       staircase_cull=stair, row_cap=rowcap)
    S = 4
    src = SourceViews(
        images=jnp.asarray(rng.random((S, H, W, 3)), jnp.float32),
        depths=jnp.full((S, H, W), 3.0, jnp.float32),
        ref_to_src=jnp.tile(jnp.eye(4)[None], (S, 1, 1)),
        cam_pos=jnp.asarray(rng.random((S, 3)) * 0.1, jnp.float32),
        count=jnp.int32(S))
    gt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)

    def emit(stage, seconds):
        print(json.dumps({"stage": stage, "compile_s": round(seconds, 1),
                          "stair": stair, "tile": f"{th}x{tw}"}),
              flush=True)

    def time_compile(stage, fn, *args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        emit(stage, time.time() - t0)
        return compiled

    # --- preprocess + binning only (the sort/scan/table families) ---
    from ibgs_tpu.ops import binning as B
    from ibgs_tpu.ops import preprocess as PP

    tiles_x = -(-W // tw)
    tiles_y = -(-H // th)

    def bin_only(params):
        m = model.replace(params=params)
        normal_w, offset = m.oriented_normal(cam.cam_pos, learnt=True)
        sp = PP.preprocess(
            params.xyz, m.scale, m.quat_unit, m.opacity, m.sh_coeffs,
            m.active_sh_degree, normal_w, offset, cam, th, tw,
            alive=m.alive)
        cull_tab = None
        if stair:
            m2c = lax.stop_gradient(sp.mean2d)
            con = lax.stop_gradient(sp.conic)
            thr = jnp.log(jnp.maximum(
                255.0 * lax.stop_gradient(sp.opacity), 1.000001))
            cull_tab = jnp.stack(
                [m2c[:, 0], m2c[:, 1], con[:, 0], con[:, 1], con[:, 2],
                 thr], axis=1)
        bins = B.bin_splats(sp, tiles_x, tiles_y, cap,
                            with_gauss_id=False, cull_tab=cull_tab,
                            tile_h=th, tile_w=tw, staircase=stair,
                            row_cap=rowcap or cap // 2)
        return bins.rank.sum() + bins.order.sum()

    try:
        time_compile("binning", bin_only, model.params)
    except Exception as e:
        print(json.dumps({"stage": "binning", "error": str(e)[:200]}),
              flush=True)

    # --- full forward ---
    def fwd(params):
        m = model.replace(params=params)
        res, _ = render_view(m, cam, cfg, jnp.zeros(3), src=src,
                             render_geo=True, return_depth_normal=False)
        return (res.render.sum() + res.median_depth.sum()
                + res.ibr.warped_image.sum())

    time_compile("fwd", fwd, model.params)

    # --- full fwd+bwd (one step) ---
    def loss_fn(params):
        m = model.replace(params=params)
        res, _ = render_view(m, cam, cfg, jnp.zeros(3), src=src,
                             render_geo=True, return_depth_normal=False)
        return (losses.dssim_l1(res.render, gt)
                + 0.1 * jnp.abs(res.ibr.warped_image).mean()
                + 1e-3 * res.median_depth.mean())

    def fwd_bwd(params):
        g = jax.grad(loss_fn)(params)
        return sum(jnp.sum(x * x) for x in jax.tree.leaves(g))

    time_compile("fwd_bwd", fwd_bwd, model.params)

    # --- the bench chain (5 steps) ---
    def chain(params):
        def body(i, acc):
            eps = acc * 1e-30 + jnp.float32(i) * 1e-7
            return acc + fwd_bwd(params.replace(xyz=params.xyz + eps))
        return lax.fori_loop(0, 5, body, jnp.float32(0.0))

    time_compile("chain", chain, model.params)


if __name__ == "__main__":
    main()
