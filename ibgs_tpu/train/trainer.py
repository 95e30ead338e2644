"""Training step + driver loop.

The jitted step mirrors the reference loop body (train.py:260-430):
render → image / single-view-normal / multi-view-photometric /
colour-aggregation losses → backward → per-group Adam on the Gaussians,
Adam on the exposure model and the aggregation net → densification
statistics.  The few schedule switches that change the computation graph
(geometry rendering on, aggregation on) are static phase flags, so the
whole run compiles a handful of step variants.

The driver keeps only non-array orchestration on the host: viewpoint
sampling, source-view selection (precomputed neighbour lists), the
densify / opacity-reset cadence, capacity growth, checkpointing.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ibgs_tpu import renderer
from ibgs_tpu.config import OptimizationParams
from ibgs_tpu.core.camera import Camera
from ibgs_tpu.models import aggregation
from ibgs_tpu.models.gaussians import (DensifyConfig, GaussianModel,
                                       LRConfig, accumulate_stats,
                                       adam_step, densify_and_prune,
                                       lr_tree)
from ibgs_tpu.ops.rasterize import RasterConfig
from ibgs_tpu.train import losses

APP_CAPACITY = 1600     # reference app_model.py fixed image capacity


@struct.dataclass
class SideOptState:
    """Adam state for a side network (exposure model / aggregation net)."""
    mu: any
    nu: any
    step: jnp.ndarray

    @classmethod
    def init(cls, params):
        z = jax.tree.map(jnp.zeros_like, params)
        return cls(mu=z, nu=jax.tree.map(jnp.zeros_like, params),
                   step=jnp.int32(0))


def side_adam(params, opt: SideOptState, grads, lr, b1=0.9, b2=0.999,
              eps=1e-8):
    step = opt.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    def upd(p, m, v, g):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        return p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps), m, v

    out = jax.tree.map(upd, params, opt.mu, opt.nu, grads)
    leaf = lambda t: isinstance(t, tuple)
    return (jax.tree.map(lambda t: t[0], out, is_leaf=leaf),
            SideOptState(mu=jax.tree.map(lambda t: t[1], out, is_leaf=leaf),
                         nu=jax.tree.map(lambda t: t[2], out, is_leaf=leaf),
                         step=step))


@struct.dataclass
class TrainState:
    model: GaussianModel
    app_ab: jnp.ndarray                  # (APP_CAPACITY, 2)
    app_opt: SideOptState
    net_params: any                      # aggregation net params (or None)
    net_opt: any
    spatial_lr_scale: jnp.ndarray        # () f32 (scene extent)


@dataclasses.dataclass(frozen=True)
class StepPhase:
    """Static flags selecting the compiled step variant."""
    render_geo: bool
    use_aggregation: bool


def make_lr_config(opt: OptimizationParams) -> LRConfig:
    return LRConfig(
        position_lr_init=opt.position_lr_init,
        position_lr_final=opt.position_lr_final,
        position_lr_delay_mult=opt.position_lr_delay_mult,
        position_lr_max_steps=opt.position_lr_max_steps,
        feature_lr=opt.feature_lr,
        opacity_lr=opt.opacity_lr,
        scaling_lr=opt.scaling_lr,
        rotation_lr=opt.rotation_lr,
        normal_lr=opt.normal_lr,
    )


def ibgs_objective(opt: OptimizationParams, phase: StepPhase, net,
                   net_params, app_ab, cam_uid, image, rendered_normal,
                   dnormal, ibr, gt, iteration, use_app, burned_in):
    """The full IBGS training objective (reference train.py:302-366):
    L1+DSSIM image loss with the AppModel exposure switch, single-view
    normal consistency, multi-view photometric, and the colour-aggregation
    loss with its burn-in gating.

    Shared VERBATIM by the single-chip step (make_train_step) and the
    Gaussian-sharded step (parallel/gsp.py gsp_full_train_step) so the
    two trainers' semantics cannot drift.  All image-shaped inputs are
    full-frame (H, W, ...); `ibr` is an IBROutputs (or None when
    phase.render_geo is False).  Returns (total, aux scalar dict)."""
    ssim_loss = 1.0 - losses.ssim(image, gt)
    app_image = renderer.apply_exposure(image, app_ab, cam_uid)
    l1_plain = losses.l1(image, gt)
    l1_app = losses.l1(app_image, gt)
    Ll1 = jnp.where(use_app & (ssim_loss < 0.5), l1_app, l1_plain)
    image_loss = (1.0 - opt.lambda_dssim) * Ll1 + \
        opt.lambda_dssim * ssim_loss

    normal_loss = jnp.float32(0.0)
    photo_loss = jnp.float32(0.0)
    agg_loss = jnp.float32(0.0)
    use_agg_now = jnp.bool_(False)
    if phase.render_geo:
        gate_n = (iteration > opt.single_view_weight_from_iter
                  ).astype(jnp.float32)
        normal_loss = gate_n * losses.normal_consistency(
            rendered_normal, dnormal,
            opt.single_view_weight)

        gate_p = (iteration > opt.multi_view_weight_from_iter
                  ).astype(jnp.float32)
        warped = ibr.warped_image[:opt.nb_visible_src_frames]
        feat = ibr.cam_feat[:opt.nb_visible_src_frames]
        valid = feat.sum(-1) > 0.0
        photo_loss = gate_p * losses.multi_view_photometric(
            gt, warped, valid, opt.photo_ssim_weight, opt.photo_weight)

        if phase.use_aggregation:
            fusion = aggregation.fuse_color(
                net, net_params, image,
                ibr.warped_image, ibr.cam_feat,
                ibr.camera_ray, ibr.min_depth_diff,
                ibr.use_first_src_mask,
                burned_in, opt.nb_visible_src_frames,
                opt.enable_exposure_correction,
                opt.residual_resolution_scale,
                opt.enable_mix_precision,
            )
            pred = fusion["image_pred"]
            agg_ssim = 1.0 - losses.ssim(pred, gt)
            agg_l1 = losses.l1(pred, gt)
            agg_loss = (1.0 - opt.lambda_dssim) * agg_l1 + \
                opt.lambda_dssim * agg_ssim
            use_agg_now = fusion["any_valid"]

    total = normal_loss + photo_loss + jnp.where(
        use_agg_now, 0.5 * (image_loss + agg_loss), image_loss)
    aux = dict(
        image_loss=image_loss, normal_loss=normal_loss,
        photo_loss=photo_loss, agg_loss=agg_loss, l1=Ll1,
        psnr=losses.psnr(jnp.clip(image, 0, 1), gt),
    )
    return total, aux


def make_train_step(opt: OptimizationParams, rcfg: RasterConfig,
                    net: Optional[aggregation.ColorFusionResidualNet],
                    phase: StepPhase):
    lrcfg = make_lr_config(opt)

    def loss_fn(params, app_ab, net_params, sdum, sdum_abs,
                state: TrainState, cam: Camera, cam_uid, gt, src, iteration,
                bg, use_app, burned_in):
        model = state.model.replace(params=params)
        res, dnormal = renderer.render_view(
            model, cam, rcfg, bg, src=src,
            learnt_normal=opt.learnt_normal,
            render_geo=phase.render_geo,
            return_depth_normal=phase.render_geo,
            screen_dummy=sdum, screen_dummy_abs=sdum_abs,
        )
        total, aux = ibgs_objective(
            opt, phase, net, net_params, app_ab, cam_uid, res.render,
            res.normal, dnormal, res.ibr, gt, iteration, use_app, burned_in)
        aux.update(radii=res.radii, median_depth=res.median_depth,
                   n_instances=res.n_instances,
                   n_rows=jnp.asarray(res.n_rows, jnp.int32))
        return total, aux

    @jax.jit
    def step(state: TrainState, cam: Camera, cam_uid, gt, src, iteration,
             bg, use_app, burned_in, net_lr):
        P = state.model.capacity
        sdum = jnp.zeros((P, 2), jnp.float32)
        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)
        (g_params, g_app, g_net, g_sd, g_sda), aux = grad_fn(
            state.model.params, state.app_ab, state.net_params,
            sdum, sdum, state, cam, cam_uid, gt, src, iteration, bg,
            use_app, burned_in)

        # Non-finite-gradient sentinel (debug-mode trip wire): a reverse-
        # only NaN (0·inf through a masked chain) poisons Adam moments and
        # then the params while every LOSS scalar stays finite — fetched
        # by the loop's debug mode to dump the offending step's inputs.
        aux["nonfinite_grads"] = sum(
            (~jnp.isfinite(x)).sum() for t in
            (g_params, g_app, g_net, g_sd, g_sda)
            for x in jax.tree.leaves(t))

        lrs = lr_tree(lrcfg, iteration.astype(jnp.float32),
                      state.spatial_lr_scale)
        model = adam_step(state.model, g_params, lrs)
        model = accumulate_stats(model, g_sd, g_sda, aux.pop("radii"),
                                 cam.width, cam.height)
        app_ab, app_opt = side_adam(state.app_ab, state.app_opt, g_app,
                                    lr=1e-3, b2=0.99)
        if phase.use_aggregation:
            net_params, net_opt = side_adam(
                state.net_params, state.net_opt, g_net, lr=net_lr)
        else:
            net_params, net_opt = state.net_params, state.net_opt

        new_state = state.replace(model=model, app_ab=app_ab,
                                  app_opt=app_opt, net_params=net_params,
                                  net_opt=net_opt)
        return new_state, aux

    return step


# jitted maintenance ops (shared across phases)

@functools.partial(jax.jit, static_argnames=("cfg", "max_screen"))
def densify_step(model: GaussianModel, key, cfg: DensifyConfig, extent,
                 max_screen=None):
    return densify_and_prune(model, key, cfg, extent,
                             max_screen_size=max_screen)


densify_step.__doc__ = "jitted densify_and_prune wrapper"
