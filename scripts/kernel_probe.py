"""Standalone blend-kernel micro-bench (TPU).

Times the Pallas fwd and bwd blend kernels in isolation on a synthetic
instance list shaped like the bench scene (1.37M instances over 60x34
16x16 tiles), using the chained-fori_loop methodology from CLAUDE.md
(data dependency through an input column; scalar D2H sync).

Run: `python scripts/kernel_probe.py` (claims the TPU).
Env: KP_INSTANCES, KP_ITERS.
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
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from ibgs_tpu.ops import blend_pallas as bp
    from ibgs_tpu.ops.blend_common import BlendConfig

    W, H = 960, 544
    th = tw = 16
    tiles_x, tiles_y = W // tw, H // th
    num_tiles = tiles_x * tiles_y
    n_inst = int(os.environ.get("KP_INSTANCES", 1_370_000))
    iters = int(os.environ.get("KP_ITERS", 5))
    cap = -(-n_inst // bp.CHUNK) * bp.CHUNK + bp.CHUNK

    rng = np.random.default_rng(0)
    data_path = os.environ.get("KP_DATA")
    if data_path:
        # real binning data exported from the bench scene (feats (cap', 15),
        # tile_start/stop) — isolates whether the in-bench kernel time gap
        # vs this synthetic harness is data-content or attribution
        d = np.load(data_path)
        n_inst = int(d["n"])
        cap = -(-d["feats"].shape[0] // bp.CHUNK) * bp.CHUNK
        feats = np.zeros((cap, bp.CF), np.float32)
        feats[: d["feats"].shape[0], : d["feats"].shape[1]] = d["feats"]
        start, stop = d["start"], d["stop"]
        assert start.size == num_tiles, (start.size, num_tiles)
    else:
        # uniform split of instances over tiles, realistic splat stats
        per = n_inst // num_tiles
        start = (np.arange(num_tiles) * per).astype(np.int32)
        stop = np.concatenate([start[1:], [n_inst]]).astype(np.int32)

        feats = np.zeros((cap, bp.CF), np.float32)
        tile_of = np.repeat(np.arange(num_tiles), per)
        tile_of = np.concatenate(
            [tile_of, np.full(n_inst - tile_of.size, num_tiles - 1)])
        cx_t = (tile_of % tiles_x) * tw + tw / 2
        cy_t = (tile_of // tiles_x) * th + th / 2
        feats[:n_inst, bp.FX] = cx_t + rng.normal(0, 6, n_inst)
        feats[:n_inst, bp.FY] = cy_t + rng.normal(0, 6, n_inst)
        sig = rng.uniform(2.0, 8.0, n_inst)
        feats[:n_inst, bp.FCA] = 1.0 / sig**2
        feats[:n_inst, bp.FCC] = 1.0 / sig**2
        feats[:n_inst, bp.FOP] = rng.uniform(0.02, 0.9, n_inst)
        feats[:n_inst, bp.FR:bp.FB + 1] = rng.random((n_inst, 3))
        feats[:n_inst, bp.FNX:bp.FNZ + 1] = np.array([0.0, 0.0, 1.0])
        feats[:n_inst, bp.FD] = -rng.uniform(1.0, 5.0, n_inst)

    cfg = BlendConfig(tile_h=th, tile_w=tw, buffer_len=4,
                      render_geo=True, depth_only=False)
    static = (cfg, tiles_x, tiles_y, cap, jax.default_backend() == "cpu")
    scal = jnp.asarray([500.0, 500.0, W / 2, H / 2, 0.0], jnp.float32)
    startj = jnp.asarray(start)
    stopj = jnp.asarray(stop)
    featsT = jnp.asarray(feats.T)          # (CF, cap)

    def emit(name, **kw):
        print(json.dumps({"probe": name, **kw}), flush=True)

    emit("device", dev=str(jax.devices()[0]), n_inst=n_inst, cap=cap)

    def timed(fn, label):
        def chain(n, featsT):
            def body(i, acc):
                # perturb the PAD feature column so no iteration is CSE'd
                f = featsT.at[bp.FPAD, 0].set(acc * 1e-30 + jnp.float32(i))
                out = fn(f)
                return acc + out
            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        fit = jax.jit(chain, static_argnums=())
        t0 = time.time()
        jax.block_until_ready(fit(jnp.int32(1), featsT))
        compile_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(fit(jnp.int32(1), featsT))
        t1 = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(fit(jnp.int32(iters + 1), featsT))
        tn = time.time() - t0
        ms = (tn - t1) / iters * 1e3
        emit(label, ms=round(ms, 2), compile_s=round(compile_s, 1))
        return ms

    def fwd_only(f):
        outs = bp._blend_core(static, f, startj, stopj, scal)
        return outs[0].sum() + outs[2].sum() + outs[4].sum()

    def fwd_bwd(f):
        def loss(f):
            outs = bp._blend_core(static, f, startj, stopj, scal)
            return (outs[0].sum() + outs[2].sum() + outs[4].sum()
                    + outs[5].sum() + (outs[1].sum() if cfg.render_geo
                                       else 0.0))
        v, g = jax.value_and_grad(loss)(f)
        return v + g.sum() * 1e-20

    timed(fwd_only, "blend_fwd")
    timed(fwd_bwd, "blend_fwd_bwd")

    # Mosaic-under-shard_map hardware smoke (VERDICT r2 #8): all sharded
    # tests/dryruns run interpret mode on CPU; this is the one place the
    # REAL kernel executes inside shard_map on a TPU (1x1 mesh).
    from jax.sharding import Mesh, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("gs",))

    def shard_fn(f):
        outs = bp._blend_core(static, f, startj, stopj, scal)
        return (outs[0].sum() + outs[2].sum() + outs[4].sum())[None]

    fn = jax.jit(jax.shard_map(shard_fn, mesh=mesh, in_specs=P(),
                               out_specs=P("gs"), check_vma=False))
    v_smap = float(fn(featsT)[0])
    v_ref = float(jax.jit(fwd_only)(featsT))
    rel = abs(v_smap - v_ref) / max(abs(v_ref), 1.0)
    emit("shard_map_smoke", value=v_smap, ref=v_ref, rel_err=rel,
         ok=bool(np.isfinite(v_smap) and rel < 1e-5))

    # FULL-objective GSP training step on hardware (KP_GSP_STEP=1): the
    # production sharded trainer — exchange all_to_all, band all_gathers,
    # aggregation net, AppModel, Adam — on a 1x1 ("dp","gs") mesh with the
    # REAL Pallas kernel (everything else runs it interpret-mode on CPU).
    if os.environ.get("KP_GSP_STEP", "0") == "1":
        from ibgs_tpu.config import OptimizationParams
        from ibgs_tpu.models import aggregation
        from ibgs_tpu.models.gaussians import init_from_points
        from ibgs_tpu.ops.epilogue import SourceViews
        from ibgs_tpu.ops.rasterize import RasterConfig
        from ibgs_tpu.parallel.gsp import gsp_full_train_step
        from ibgs_tpu.parallel.sharding import _cam_stack
        from ibgs_tpu.train.trainer import (SideOptState, StepPhase,
                                            TrainState)
        from tests.utils import simple_camera

        Wg, Hg, S = 128, 128, 2
        rng2 = np.random.default_rng(1)
        model = init_from_points(
            (rng2.random((2000, 3)) * 1.2 - 0.6).astype(np.float32),
            rng2.random((2000, 3)).astype(np.float32), max_sh_degree=1,
            capacity=4096)
        cam = simple_camera(Wg, Hg)
        rcfg = RasterConfig(instance_cap=65536, backend="pallas")
        opt = OptimizationParams(
            use_color_aggregation=True, number_src_frames=S,
            nb_visible_src_frames=S, single_view_weight_from_iter=0,
            multi_view_weight_from_iter=0, start_color_aggregation_iter=0,
            position_lr_max_steps=100)
        phase = StepPhase(render_geo=True, use_aggregation=True)
        net = aggregation.ColorFusionResidualNet(
            feat_aggregate_mode=opt.feat_aggregate_mode)
        net_params = net.init(jax.random.PRNGKey(0),
                              jnp.zeros((Hg, Wg, S, 7)),
                              jnp.zeros((Hg, Wg, 3)), jnp.zeros((Hg, Wg, 3)))
        state = TrainState(
            model=model, app_ab=jnp.zeros((1600, 2), jnp.float32),
            app_opt=SideOptState.init(jnp.zeros((1600, 2))),
            net_params=net_params, net_opt=SideOptState.init(net_params),
            spatial_lr_scale=jnp.float32(1.0))
        from jax.sharding import Mesh
        mesh2 = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                     ("dp", "gs"))
        gstep = gsp_full_train_step(opt, rcfg, net, phase, mesh2, Wg, Hg,
                                    cap_local=65536, exchange_cap=65536)
        srcs = SourceViews(
            images=jnp.asarray(rng2.random((1, S, Hg, Wg, 3)), jnp.float32),
            depths=jnp.full((1, S, Hg, Wg), 3.0, jnp.float32),
            ref_to_src=jnp.tile(jnp.eye(4)[None, None], (1, S, 1, 1)),
            cam_pos=jnp.zeros((1, S, 3)), count=jnp.full((1,), S, jnp.int32))
        gts = jnp.asarray(rng2.random((1, Hg, Wg, 3)), jnp.float32)
        s2, aux = gstep(state, _cam_stack([cam]), jnp.zeros((1,), jnp.int32),
                        gts, srcs, jnp.int32(5), jnp.zeros(3),
                        jnp.bool_(True), jnp.float32(1.0), jnp.float32(1e-4))
        loss = float(aux["loss"])
        moved = float(jnp.abs(s2.model.params.xyz - model.params.xyz).max())
        emit("gsp_full_step_hw", loss=loss, max_dxyz=moved,
             n_overflow=int(aux["n_overflow"]),
             ok=bool(np.isfinite(loss) and moved > 0.0))
    emit("done")


if __name__ == "__main__":
    main()
