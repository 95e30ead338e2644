"""GSP overhead on the real chip (VERDICT r3 #4).

Times the FULL-objective training step at the bench scene (960x544, 100k
splats, S=4 sources, aggregation net on) two ways in ONE process:

  unsharded : train/trainer.make_train_step        (the single-chip trainer)
  gsp1      : parallel/gsp.gsp_full_train_step on a 1x1 ("dp","gs") mesh
              (exchange all_to_all + band all_gathers with n_gs = 1)

The difference is the GSP machinery's single-chip cost — the constant any
pod-scaling efficiency number divides by.  Timing per CLAUDE.md: chained
fori_loop steps with a data dependency, min over repeats.

    python scripts/gsp_tax.py          # real TPU (one process at a time)
    GSPTAX_W=480 GSPTAX_H=272 GSPTAX_N=20000 python scripts/gsp_tax.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def main():
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(os.path.dirname(
                                   os.path.dirname(os.path.abspath(__file__))),
                                   ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from ibgs_tpu.config import OptimizationParams
    from ibgs_tpu.models import aggregation
    from ibgs_tpu.models.gaussians import init_from_points
    from ibgs_tpu.ops.epilogue import SourceViews
    from ibgs_tpu.ops.rasterize import RasterConfig
    from ibgs_tpu.parallel.gsp import gsp_full_train_step
    from ibgs_tpu.parallel.sharding import _cam_stack
    from ibgs_tpu.train.trainer import (SideOptState, StepPhase, TrainState,
                                        make_train_step)
    from tests.utils import simple_camera
    from jax.sharding import Mesh

    W = int(os.environ.get("GSPTAX_W", 960))
    H = int(os.environ.get("GSPTAX_H", 544))
    n = int(os.environ.get("GSPTAX_N", 100_000))
    cap = int(os.environ.get("GSPTAX_CAP", 629_000))
    rowcap = int(os.environ.get("GSPTAX_ROWCAP", 301_000))
    capacity = int(os.environ.get("GSPTAX_CAPACITY", 131_072))
    iters = int(os.environ.get("GSPTAX_ITERS", 5))
    repeats = int(os.environ.get("GSPTAX_REPEATS", 3))
    S = 4

    rng = np.random.default_rng(0)
    pts = (rng.random((n, 3)) * 2.0 - 1.0).astype(np.float32)
    pts[:, 2] *= 0.3
    model = init_from_points(pts, rng.random((n, 3)).astype(np.float32),
                             max_sh_degree=2, capacity=capacity)
    cam = simple_camera(W, H)
    backend = "oracle" if jax.default_backend() == "cpu" else "pallas"
    th, tw = (int(x) for x in os.environ.get("GSPTAX_TILE", "16x32")
              .split("x"))
    rcfg = RasterConfig(instance_cap=cap, backend=backend,
                        mix_precision=True, tile_h=th, tile_w=tw,
                        staircase_cull=True, row_cap=rowcap)
    opt = OptimizationParams(
        use_color_aggregation=True, number_src_frames=S,
        nb_visible_src_frames=3, single_view_weight_from_iter=0,
        multi_view_weight_from_iter=0, start_color_aggregation_iter=0,
        position_lr_max_steps=30_000)
    phase = StepPhase(render_geo=True, use_aggregation=True)
    net = aggregation.ColorFusionResidualNet(
        feat_aggregate_mode=opt.feat_aggregate_mode)
    Sn = opt.nb_visible_src_frames
    net_params = net.init(jax.random.PRNGKey(0), jnp.zeros((H, W, Sn, 7)),
                          jnp.zeros((H, W, 3)), jnp.zeros((H, W, 3)))
    state = TrainState(
        model=model, app_ab=jnp.zeros((1600, 2), jnp.float32),
        app_opt=SideOptState.init(jnp.zeros((1600, 2))),
        net_params=net_params, net_opt=SideOptState.init(net_params),
        spatial_lr_scale=jnp.float32(1.0))
    src = SourceViews(
        images=jnp.asarray(rng.random((S, H, W, 3)), jnp.float32),
        depths=jnp.full((S, H, W), 3.0, jnp.float32),
        ref_to_src=jnp.tile(jnp.eye(4)[None], (S, 1, 1)),
        cam_pos=jnp.asarray(rng.random((S, 3)) * 0.1, jnp.float32),
        count=jnp.int32(S))
    gt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    common = dict(bg=jnp.zeros(3), use_app=jnp.bool_(True),
                  burned_in=jnp.float32(1.0), net_lr=jnp.float32(1e-3))

    def time_chain(step_fn, pack_args, label):
        """step_fn(state, it) -> new_state; chains `iters` steps.  The trip
        count is a TRACED argument (bench.py round-5): a static count lets
        XLA unroll the while loop, which cost these chains 835-1013 s of
        cold compile in round 4."""
        def chain(state, k, *args):
            def body(i, st):
                return step_fn(st, jnp.int32(100) + i, *args)
            st = lax.fori_loop(0, k, body, state)
            return st.model.params.xyz.sum()

        fit = jax.jit(chain)
        t0 = time.time()
        v = float(fit(state, jnp.int32(iters), *pack_args))
        compile_s = time.time() - t0
        assert np.isfinite(v), (label, v)
        best = np.inf
        for _ in range(repeats):
            t1 = time.time()
            float(fit(state, jnp.int32(iters), *pack_args))
            best = min(best, time.time() - t1)
        ms = best / iters * 1e3
        print(json.dumps({"variant": label, "step_ms": round(ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return ms

    # --- unsharded trainer ---
    ustep = make_train_step(opt, rcfg, net, phase)

    def unsharded(st, it, gt, src):
        new_st, _aux = ustep(st, cam, jnp.int32(0), gt, src, it,
                             **common)
        return new_st

    ms_u = time_chain(unsharded, (gt, src), "unsharded")

    prof_dir = os.environ.get("GSPTAX_PROFILE")
    if prof_dir:
        # capture ONE warm chain of the unsharded FULL train step for
        # scripts/parse_trace.py (itemizes the training-only stages the
        # bench graph lacks: aggregation net, extra SSIMs, Adam, stats)
        def chain_u(state, gt, src):
            def body(i, st):
                return unsharded(st, jnp.int32(100) + i, gt, src)
            st = lax.fori_loop(0, iters, body, state)
            return st.model.params.xyz.sum()

        fit = jax.jit(chain_u)
        float(fit(state, gt, src))
        with jax.profiler.trace(prof_dir):
            float(fit(state, gt, src))
        print(json.dumps({"profile": prof_dir, "chain_iters": iters}),
              flush=True)
        return

    # --- GSP on a 1x1 mesh ---
    # GSPTAX_GENERIC=1 forces the generic exchange path (VERDICT r4 #4):
    # exchange_cap just below cap_local bypasses the identity fast path
    # while dropping nothing at the bench scene (524k instances < cap-1),
    # so the measured delta is the pure scatter→all_to_all→merge→permute
    # machinery cost at full (unsharded) sizes — its single-chip upper
    # bound.
    generic = os.environ.get("GSPTAX_GENERIC", "0") == "1"
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "gs"))
    gstep = gsp_full_train_step(opt, rcfg, net, phase, mesh, W, H,
                                cap_local=cap,
                                exchange_cap=cap - 1 if generic else cap)
    cam_arrays = _cam_stack([cam])

    def gsp1(st, it, gt, src, cam_arrays):
        srcs = jax.tree.map(lambda x: x[None], src)
        new_st, _aux = gstep(st, cam_arrays,
                             jnp.zeros((1,), jnp.int32), gt[None], srcs, it,
                             **common)
        return new_st

    label = "gsp_1x1_generic" if generic else "gsp_1x1"
    ms_g = time_chain(gsp1, (gt, src, cam_arrays), label)

    print(json.dumps({
        "metric": "GSP tax at bench scene"
                  + (" (generic exchange forced)" if generic else ""),
        "unsharded_ms": round(ms_u, 2), "gsp_1x1_ms": round(ms_g, 2),
        "tax_ms": round(ms_g - ms_u, 2),
        "tax_pct": round(100 * (ms_g - ms_u) / ms_u, 1)}), flush=True)


if __name__ == "__main__":
    main()
