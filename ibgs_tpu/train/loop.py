"""Host-side training driver (the reference train.py `training()` loop)."""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ibgs_tpu import renderer
from ibgs_tpu.config import ModelParams, OptimizationParams, PipelineParams
from ibgs_tpu.data.dataset import SceneData
from ibgs_tpu.models import aggregation
from ibgs_tpu.models.gaussians import (DensifyConfig, decay_opacity,
                                       grow_capacity, init_from_points,
                                       oneup_sh_degree, reset_opacity)
from ibgs_tpu.ops.rasterize import RasterConfig
from ibgs_tpu.renderer import source_views_from_stacks
from ibgs_tpu.train import checkpoint as ckpt
from ibgs_tpu.train import losses
from ibgs_tpu.train.logging import TrainLogger, colorize_depth
from ibgs_tpu.train.trainer import (SideOptState, StepPhase, TrainState,
                                    densify_step, make_train_step)
from ibgs_tpu.utils.profiling import step_annotation


_gather_src_jit = jax.jit(source_views_from_stacks)


def train(
    scene: SceneData,
    mp: ModelParams,
    opt: OptimizationParams,
    pipe: PipelineParams,
    model_path: str,
    save_iterations=(30_000,),
    test_iterations=(7_000, 15_000, 30_000),
    checkpoint_iterations=(),
    start_checkpoint: Optional[str] = None,
    quiet: bool = False,
    seed: int = 24,
    log_every: int = 200,
    viewer_port: Optional[int] = None,
    mesh=None,
    gsp_cap_local: Optional[int] = None,
    gsp_exchange_cap: Optional[int] = None,
):
    """With `mesh` (a ("dp", "gs") jax.sharding.Mesh, dp=1), the SAME
    driver trains under Gaussian-sharded SPMD: the step becomes
    parallel/gsp.gsp_full_train_step (identical objective — shared code),
    densification runs shard-local (gsp_densify_fn) after a one-time
    gsp_interleave balance, and capacity growth re-interleaves.  Evals,
    checkpoints and the depth cache read gathered copies.  Overflows of
    the per-pair exchange capacity are surfaced in the log."""
    os.makedirs(model_path, exist_ok=True)
    from ibgs_tpu.data.dataset import write_multiview_json
    try:
        write_multiview_json(scene, model_path)
    except Exception:
        pass
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    H, W = scene.images.shape[1:3]
    n_train = scene.n_train
    rcfg = RasterConfig(
        instance_cap=pipe.instance_cap,
        buffer_len=opt.buffer_length,
        max_src=5,
        depth_error_threshold=opt.depth_error_threshold,
        backend=pipe.backend,
        mix_precision=opt.enable_mix_precision,
        staircase_cull=pipe.staircase_cull,
        row_cap=pipe.row_cap,
    )

    model = init_from_points(scene.points, scene.colors, mp.sh_degree,
                             capacity=mp.init_capacity or None)
    net = None
    net_params = net_opt = None
    if opt.use_color_aggregation:
        net = aggregation.ColorFusionResidualNet(
            feat_aggregate_mode=opt.feat_aggregate_mode)
        S = opt.nb_visible_src_frames
        net_params = net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((H, W, S, 7)), jnp.zeros((H, W, 3)),
            jnp.zeros((H, W, 3)))
        net_opt = SideOptState.init(net_params)

    state = TrainState(
        model=model,
        app_ab=jnp.zeros((1600, 2), jnp.float32),
        app_opt=SideOptState.init(jnp.zeros((1600, 2))),
        net_params=net_params,
        net_opt=net_opt,
        spatial_lr_scale=jnp.float32(scene.cameras_extent),
    )

    w2v, centers, _rays = scene.poses_stack()
    stacks = {
        "images": jnp.asarray(scene.images),
        "depths": jnp.zeros((n_train, H, W), jnp.float32),
        "w2v": jnp.asarray(w2v),
        "centers": jnp.asarray(centers),
    }

    first_iter = 1
    if start_checkpoint:
        state, first_iter = ckpt.load_state(state, start_checkpoint)
        first_iter += 1

    dcfg = DensifyConfig(
        grad_threshold=opt.densify_grad_threshold,
        abs_grad_threshold=opt.densify_abs_grad_threshold,
        opacity_cull=opt.opacity_cull_threshold,
        percent_dense=opt.percent_dense,
        abs_split_radii2d_threshold=opt.abs_split_radii2D_threshold,
        max_abs_split=opt.max_abs_split_points,
    )

    bg_fixed = jnp.ones(3) if scene.white_background else jnp.zeros(3)
    geo_from = opt.single_view_weight_from_iter - 2 * n_train
    steps = {}
    dens_fns = {}

    n_gs = 0
    n_dp = 1
    if mesh is not None:
        from ibgs_tpu.parallel.gsp import gsp_interleave
        # dp > 1 batches dp cameras per step (one per dp row — the cheap
        # second scaling axis on a pod); the reference cadence is dp=1
        n_dp = mesh.shape["dp"]
        n_gs = mesh.shape["gs"]
        assert H % (n_gs * rcfg.tile_h) == 0, (H, n_gs, rcfg.tile_h)
        # spread alive rows + free slots across shards once (set semantics)
        state = state.replace(model=gsp_interleave(state.model, n_gs))
        if gsp_cap_local is None:
            gsp_cap_local = max(-(-pipe.instance_cap // n_gs) * 2, 4096)
        if gsp_exchange_cap is None:
            gsp_exchange_cap = max(-(-gsp_cap_local // n_gs) * 2, 2048)

    def _make_step(phase):
        if mesh is None:
            return make_train_step(opt, rcfg, net, phase)
        from ibgs_tpu.parallel.gsp import gsp_full_train_step
        gstep = gsp_full_train_step(opt, rcfg, net, phase, mesh, W, H,
                                    cap_local=gsp_cap_local,
                                    exchange_cap=gsp_exchange_cap)

        def wrapped(state, cams, cam_uids, gts, srcs, it, bg, use_app,
                    burned_in, net_lr):
            # cams: list of n_dp cameras; gts (dp,H,W,3); srcs stacked
            # SourceViews with leading dp axis; aux["median_depth"] stays
            # (dp,H,W) — the caller updates the cache row per dp camera
            from ibgs_tpu.parallel.sharding import _cam_stack
            new_state, aux = gstep(
                state, _cam_stack(cams),
                jnp.asarray(cam_uids, jnp.int32), gts, srcs, it,
                bg, use_app, burned_in, net_lr)
            return new_state, dict(aux)
        return wrapped

    def get_step(it):
        phase = StepPhase(
            render_geo=it > geo_from,
            use_aggregation=bool(opt.use_color_aggregation
                                 and it > opt.start_color_aggregation_iter),
        )
        if phase not in steps:
            steps[phase] = _make_step(phase)
        return steps[phase], phase

    update_depth = jax.jit(lambda cache, i, d: cache.at[i].set(d))
    logger = TrainLogger(model_path)

    def make_eval_render(rcfg):
        # factory (not a module-level closure): eval_render must be rebuilt
        # when instance_cap grows, since jit inlines rcfg at trace time
        @jax.jit
        def eval_render(model, cam, src):
            from ibgs_tpu.renderer import render_view
            res, _ = render_view(model, cam, rcfg, bg_fixed, src=src,
                                 learnt_normal=opt.learnt_normal,
                                 render_geo=True, return_depth_normal=False)
            return res.render, res.median_depth, res.normal
        return eval_render

    eval_render = make_eval_render(rcfg)

    def eval_model():
        # sharded arrays → one gathered host copy for eval/snapshot paths
        return (jax.device_get(state.model) if mesh is not None
                else state.model)

    def run_eval(it):
        """Reference training_report (train.py:104-170): PSNR over the
        test split + a train-view sample."""
        configs = [("test", scene.test_cameras, scene.test_images,
                    scene.test_nearest_ids),
                   ("train", [scene.train_cameras[i % n_train]
                              for i in range(5, 30, 5)],
                    scene.images[[i % n_train for i in range(5, 30, 5)]],
                    [scene.nearest_ids[i % n_train]
                     for i in range(5, 30, 5)])]
        for name, cams_e, gts_e, nbrs_e in configs:
            if not cams_e:
                continue
            tot = 0.0
            for k, cam_e in enumerate(cams_e):
                nb = nbrs_e[k][: opt.number_src_frames]
                idx2 = np.zeros((rcfg.max_src,), np.int32)
                idx2[: len(nb)] = nb
                src_e = _gather_src_jit(
                    stacks["images"], stacks["depths"], stacks["w2v"],
                    stacks["centers"], jnp.asarray(idx2),
                    jnp.int32(len(nb)), cam_e)
                img, dep, nrm = eval_render(eval_model(), cam_e, src_e)
                p = float(losses.psnr(jnp.clip(img, 0, 1),
                                      jnp.asarray(gts_e[k])))
                tot += p
                if k < 3:
                    logger.image(it, f"{name}_view_{k}/render", img)
                    logger.image(it, f"{name}_view_{k}/depth",
                                 colorize_depth(dep))
                    logger.image(it, f"{name}_view_{k}/normal",
                                 (np.asarray(nrm) + 1) / 2)
            mean_psnr = tot / len(cams_e)
            print(f"\n[ITER {it}] Evaluating {name}: PSNR {mean_psnr:.2f}")
            logger.scalars(it, {f"{name}/psnr": mean_psnr})
        alive = np.asarray(state.model.alive)
        logger.histogram(it, "scene/opacity_histogram",
                         np.asarray(state.model.opacity)[alive])
        logger.scalars(it, {"total_points": int(alive.sum())})
    set_normal_from_axis = jax.jit(
        lambda m: m.replace(params=m.params.replace(
            normal=jax.lax.stop_gradient(m.smallest_axis()))))

    # on resume past the geometry threshold, rebuild the per-view depth
    # cache with a no-grad depth sweep (reference train.py:242-256)
    if start_checkpoint and first_iter > geo_from:
        from ibgs_tpu.renderer import render_depth_view
        depth_fn = jax.jit(lambda m, c: render_depth_view(
            m, c, rcfg, learnt_normal=opt.learnt_normal))
        for ci, cam_i in enumerate(scene.train_cameras):
            stacks["depths"] = update_depth(
                stacks["depths"], ci, depth_fn(state.model, cam_i))
        print(f"[resume] depth cache rebuilt for {n_train} views")

    def check_caps(n_inst, n_rows, it):
        """Grow the static instance/row caps (+ recompile) when a step
        reports counts past them — binning truncates the deepest splats
        past the cap, so a late reaction silently degrades training."""
        nonlocal rcfg, eval_render
        import dataclasses as _dc
        grew = False
        if n_inst > rcfg.instance_cap:
            newcap = 1 << int(np.ceil(np.log2(n_inst * 1.25)))
            print(f"[it {it}] WARNING: tile instances {n_inst} exceed "
                  f"instance_cap {rcfg.instance_cap} (deepest splats "
                  f"dropped); growing cap -> {newcap} and recompiling")
            rcfg = _dc.replace(rcfg, instance_cap=newcap)
            grew = True
        if rcfg.staircase_cull:
            # staircase tile-ROW capacity: same prefix-truncation
            # semantics, same growth policy
            row_eff = rcfg.row_cap or rcfg.instance_cap // 2
            if n_rows > row_eff:
                newrows = 1 << int(np.ceil(np.log2(n_rows * 1.25)))
                print(f"[it {it}] WARNING: staircase rows {n_rows} "
                      f"exceed row_cap {row_eff}; growing -> {newrows} "
                      f"and recompiling")
                rcfg = _dc.replace(rcfg, row_cap=newrows)
                grew = True
        if grew:
            steps.clear()
            eval_render = make_eval_render(rcfg)

    stack_order = []
    net_lr = 1e-3
    metrics_log = []
    t_start = time.time()
    # overflow-reaction state: caps are checked EVERY step.  Normally the
    # PREVIOUS step's counters are read (that step has already finished, so
    # the fetch cannot stall the async dispatch pipeline) → growth lands
    # within one step of an overflow.  On the step right after a densify —
    # the moment counts can spike — the CURRENT step is checked
    # synchronously.
    prev_caps = None
    check_caps_now = True     # first step: sync check

    # live SIBR viewer hook (reference network_gui, here actually wired)
    if viewer_port is not None:
        from ibgs_tpu.eval import viewer as _viewer
        _viewer.init(port=viewer_port)

        def _viewer_render(cam, msg):
            # plain gaussian render at the viewer's requested resolution
            # (sources off: count=0 → no warp inputs needed)
            src = _gather_src_jit(
                stacks["images"], stacks["depths"], stacks["w2v"],
                stacks["centers"],
                jnp.zeros((rcfg.max_src,), jnp.int32), jnp.int32(0), cam)
            img, _d, _n = eval_render(eval_model(), cam, src)
            return np.asarray(img)

    profile_dir = pipe.profile_dir or os.path.join(model_path, "trace")
    profiling_now = False

    for it in range(first_iter, opt.iterations + 1):
        if pipe.profile_num_steps:
            if it == pipe.profile_from_iter:
                jax.profiler.start_trace(profile_dir)
                profiling_now = True
            elif profiling_now and it == (pipe.profile_from_iter
                                          + pipe.profile_num_steps):
                jax.profiler.stop_trace()
                profiling_now = False
                print(f"[it {it}] profiler trace written to {profile_dir}")
        if viewer_port is not None:
            _viewer.serve_once(_viewer_render)
        if it == opt.single_view_weight_from_iter:
            # seed learnt normals from the smallest covariance axis
            # (reference train.py:261-263)
            state = state.replace(model=set_normal_from_axis(state.model))
        if opt.use_color_aggregation and it in opt.color_aggregation_reduce_lr_iter:
            net_lr *= 0.5
        if it % 1000 == 0:
            state = state.replace(model=oneup_sh_degree(state.model))
        cam_idxs = []
        for _ in range(n_dp):
            if not stack_order:
                stack_order = list(range(n_train))
            cam_idxs.append(int(stack_order.pop(
                rng.integers(len(stack_order)))))
        cam_idx = cam_idxs[0]

        cam = scene.train_cameras[cam_idx]
        gt = stacks["images"][cam_idx]
        step_fn, phase = get_step(it)

        def build_src(ci):
            pool = scene.nearest_ids[ci]
            if (opt.shuffle_source_frame
                    and len(pool) > opt.number_src_frames):
                nbrs = list(rng.choice(pool, size=opt.number_src_frames,
                                       replace=False))
            else:
                nbrs = pool[: opt.number_src_frames]
            sidx = np.zeros((rcfg.max_src,), np.int32)
            sidx[: len(nbrs)] = nbrs
            return sidx, _gather_src_jit(
                stacks["images"], stacks["depths"], stacks["w2v"],
                stacks["centers"], jnp.asarray(sidx), jnp.int32(len(nbrs)),
                scene.train_cameras[ci])

        src_packs = [build_src(ci) for ci in cam_idxs]
        idx, src = src_packs[0]

        bg = (jnp.asarray(rng.random(3), jnp.float32)
              if opt.random_background else bg_fixed)
        use_app = jnp.bool_(opt.exposure_compensation and it > 1000)
        burn = np.clip(
            (it - opt.start_color_aggregation_iter)
            / max(opt.color_aggregate_burnin_steps, 1), 0.0, 1.0)
        burned_in = jnp.float32((burn + 1.0) / 2.0)

        prev_state = state     # kept one step for the debug dump below
        with step_annotation("train_step", it):
            if mesh is None:
                state, aux = step_fn(state, cam, jnp.int32(cam_idx), gt,
                                     src, jnp.int32(it), bg, use_app,
                                     burned_in, jnp.float32(net_lr))
            else:
                cams_dp = [scene.train_cameras[ci] for ci in cam_idxs]
                gts = stacks["images"][np.asarray(cam_idxs)]
                srcs = jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[s for _, s in src_packs])
                state, aux = step_fn(state, cams_dp, cam_idxs, gts, srcs,
                                     jnp.int32(it), bg, use_app, burned_in,
                                     jnp.float32(net_lr))

        # Debug mode (reference diff_plane_rasterization/__init__.py:101-114
        # + train.py:367): the CUDA version syncs-and-checks every launch
        # and dumps all kernel INPUTS on failure; the TPU equivalent forces
        # a per-step D2H sync of the loss and dumps the step's pre-step
        # input pack to <model_path>/snapshot_fw.npz on the first
        # non-finite step so it can be replayed in isolation.
        if pipe.debug and (
                int(aux.get("nonfinite_grads", 0)) > 0
                or not all(
                    np.isfinite(float(aux[k])) for k in
                    ("image_loss", "normal_loss", "photo_loss", "agg_loss")
                    if k in aux)):
            snap = os.path.join(model_path, "snapshot_fw.npz")
            p = prev_state.model.params
            np.savez(snap, iter=it, cam_idx=cam_idx, src_idx=idx,
                     xyz=np.asarray(p.xyz), log_scale=np.asarray(p.log_scale),
                     quat=np.asarray(p.quat),
                     opacity_logit=np.asarray(p.opacity_logit),
                     normal=np.asarray(p.normal), offset=np.asarray(p.offset),
                     sh_dc=np.asarray(p.sh_dc), sh_rest=np.asarray(p.sh_rest),
                     alive=np.asarray(prev_state.model.alive),
                     gt=np.asarray(gt), bg=np.asarray(bg),
                     # the exact source pack used (the depth half is the
                     # EVOLVED per-view cache — not reconstructible offline)
                     src_images=np.asarray(src.images),
                     src_depths=np.asarray(src.depths),
                     src_ref_to_src=np.asarray(src.ref_to_src),
                     src_cam_pos=np.asarray(src.cam_pos),
                     src_count=np.asarray(src.count),
                     burned_in=float(burned_in), use_app=bool(use_app),
                     nonfinite_grads=int(aux.get("nonfinite_grads", 0)))
            raise FloatingPointError(
                f"[it {it}] non-finite step (nonfinite_grads="
                f"{int(aux.get('nonfinite_grads', 0))}); inputs dumped to "
                f"{snap} (reference debug-mode analog)")

        if phase.render_geo:
            if mesh is None:
                stacks["depths"] = update_depth(
                    stacks["depths"], cam_idx, aux["median_depth"])
            else:
                for j, ci in enumerate(cam_idxs):
                    stacks["depths"] = update_depth(
                        stacks["depths"], ci, aux["median_depth"][j])

        # ---- instance-cap overflow: grow + recompile instead of silently
        # truncating the deepest Gaussians (binning.py caps at instance_cap;
        # mirrors the P-capacity growth below).  Checked EVERY step: the
        # previous step's (already-materialised) counters normally, the
        # current step synchronously right after a densify. ----
        cur_caps = (aux["n_instances"], aux.get("n_rows"))
        if check_caps_now:
            check_caps(int(cur_caps[0]),
                       int(cur_caps[1]) if cur_caps[1] is not None else 0, it)
            check_caps_now = False
        elif prev_caps is not None:
            check_caps(int(prev_caps[0]),
                       int(prev_caps[1]) if prev_caps[1] is not None else 0,
                       it)
        prev_caps = cur_caps

        # ---- maintenance cadence (train.py:399-430) ----
        if it < opt.densify_until_iter:
            if it > opt.densify_from_iter and it % opt.densification_interval == 0:
                key, sub = jax.random.split(key)
                max_screen = 20.0 if it > opt.opacity_reset_interval else None
                # PRE-growth: if occupancy is already near capacity, grow
                # BEFORE the densify so clone/split are never slot-starved
                # (the reference concatenates, so its candidates never
                # compete for slots — gaussian_model.py:362-515).  Also a
                # measured robustness fix: the densify graph's XLA peak
                # memory is occupancy-shape-dependent on v5e (1M alive
                # OOMs at 99.5%/95.4% occupancy, passes at <=90%), and
                # post-growth the same event runs with headroom.
                n_alive = int(state.model.n_alive)
                if (n_alive > 0.9 * state.model.capacity
                        and state.model.capacity < opt.max_all_points):
                    newcap = min(state.model.capacity * 2,
                                 1 << int(np.ceil(np.log2(opt.max_all_points))))
                    grown = grow_capacity(jax.device_get(state.model)
                                          if mesh is not None
                                          else state.model, newcap)
                    if mesh is not None:
                        from ibgs_tpu.parallel.gsp import gsp_interleave
                        grown = gsp_interleave(grown, n_gs)
                    state = state.replace(model=grown)
                    print(f"[it {it}] capacity -> {newcap} (pre-densify)",
                          flush=True)
                if mesh is None:
                    state = state.replace(model=densify_step(
                        state.model, sub, dcfg,
                        jnp.float32(scene.cameras_extent),
                        max_screen=max_screen))
                else:
                    if max_screen not in dens_fns:
                        from ibgs_tpu.parallel.gsp import gsp_densify_fn
                        dens_fns[max_screen] = gsp_densify_fn(
                            mesh, dcfg, max_screen=max_screen)
                    state = state.replace(model=dens_fns[max_screen](
                        state.model, sub, jnp.float32(scene.cameras_extent)))
                # a split/clone can spike the instance count — check the
                # very next step's counters synchronously
                check_caps_now = True
                n_alive = int(state.model.n_alive)
                if (n_alive > 0.9 * state.model.capacity
                        and state.model.capacity < opt.max_all_points):
                    newcap = min(state.model.capacity * 2,
                                 1 << int(np.ceil(np.log2(opt.max_all_points))))
                    grown = grow_capacity(jax.device_get(state.model)
                                          if mesh is not None
                                          else state.model, newcap)
                    if mesh is not None:
                        # new free slots pad the END → re-deal them evenly
                        from ibgs_tpu.parallel.gsp import gsp_interleave
                        grown = gsp_interleave(grown, n_gs)
                    state = state.replace(model=grown)
                    print(f"[it {it}] capacity -> {newcap}")
            if it % opt.opacity_reset_interval == 0 or (
                    scene.white_background and it == opt.densify_from_iter):
                state = state.replace(model=reset_opacity(state.model))
            if (0 < opt.opacity_decay < 1
                    and it % opt.opacity_decay_interval == 0
                    and it > opt.densify_from_iter):
                state = state.replace(
                    model=decay_opacity(state.model, opt.opacity_decay))

        if it % log_every == 0 or it == first_iter:
            m = {k: float(aux[k]) for k in
                 ("image_loss", "normal_loss", "photo_loss", "agg_loss",
                  "psnr")}
            m.update(iter=it, points=int(state.model.n_alive),
                     n_instances=int(aux["n_instances"]),
                     elapsed=time.time() - t_start)
            if mesh is not None and int(aux.get("n_overflow", 0)) > 0:
                m["n_overflow"] = int(aux["n_overflow"])
                print(f"[it {it}] WARNING: GSP exchange dropped "
                      f"{m['n_overflow']} instances (raise "
                      f"gsp_exchange_cap)")
            metrics_log.append(m)
            if not quiet:
                print(f"[it {it}] loss {m['image_loss']:.4f} "
                      f"psnr {m['psnr']:.2f} pts {m['points']} "
                      f"inst {m['n_instances']} t {m['elapsed']:.0f}s",
                      flush=True)
            with open(os.path.join(model_path, "train_log.jsonl"), "a") as f:
                f.write(json.dumps(m) + "\n")
            logger.scalars(it, {
                "train_loss_patches/l1_loss": float(aux["l1"]),
                "train_loss_patches/total_loss": m["image_loss"],
                "train/psnr": m["psnr"],
            })

        if it in test_iterations:
            run_eval(it)

        if it in save_iterations:
            pc_dir = os.path.join(model_path, "point_cloud",
                                  f"iteration_{it}")
            os.makedirs(pc_dir, exist_ok=True)
            ckpt.save_ply_snapshot(eval_model(),
                                   os.path.join(pc_dir, "point_cloud.ply"))
        if it in checkpoint_iterations:
            ckpt.save_state(state, it,
                            os.path.join(model_path, f"chkpnt{it}.npz"))

    logger.close()
    return state, stacks
