"""Multi-chip SPMD rendering and training.

The reference is strictly single-GPU (SURVEY §2.5); this layer is net-new
and TPU-native:

  * mesh axes ("dp", "tp"): `dp` batches cameras (data parallel over
    viewpoints), `tp` shards the image into horizontal row bands (the
    splatting analogue of sequence parallelism — pixels are the long axis);
  * Gaussian parameters are replicated; each device rasterizes its own
    (camera, band) viewport via the rasterizer's viewport support, so the
    depth sort and blend stay fully local to a chip;
  * per-Gaussian gradients are combined with a `psum` over both axes inside
    `shard_map` — XLA lowers it onto ICI; this is the deterministic
    collective replacing the reference's implicit atomicAdd accumulation;
  * losses are computed per band and psum-reduced (the SSIM window is
    evaluated within each band — an O(window/H_band) boundary effect).

`shard_map` is used with explicit per-device grads + psum (not relying on
replication-rule inference), so the same code path works with the Pallas
kernels inside.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ibgs_tpu.core.camera import Camera
from ibgs_tpu.models.gaussians import GaussianModel, adam_step, lr_tree, LRConfig
from ibgs_tpu.ops.rasterize import RasterConfig, rasterize
from ibgs_tpu.train import losses


def make_mesh(dp: int, tp: int, devices=None,
              axis_names=("dp", "tp")) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=axis_names)


def _band_camera(cam_arrays, width: int, height: int) -> Camera:
    """Rebuild a Camera pytree from stacked arrays (local batch index 0)."""
    v = {k: cam_arrays[k][0] for k in cam_arrays}
    return Camera(width=width, height=height, **v)


def _cam_stack(cams) -> dict:
    fields = ["view", "proj", "full_proj", "cam_pos", "fx", "fy", "cx", "cy",
              "tan_fovx", "tan_fovy"]
    return {f: jnp.stack([getattr(c, f) for c in cams]) for f in fields}


def sharded_render(model: GaussianModel, cams, cfg: RasterConfig,
                   bg, mesh: Mesh, learnt_normal=True):
    """Render a batch of len(cams) == dp views, each sharded into tp row
    bands.  Returns (dp, H, W, 3) images."""
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    width, height = cams[0].width, cams[0].height
    assert height % (tp * cfg.tile_h) == 0, "height must split into tp bands"
    band = height // tp
    cam_arrays = _cam_stack(cams)

    def shard_fn(cam_arrays, model, bg):
        cam = _band_camera(cam_arrays, width, height)
        row0 = lax.axis_index("tp") * band
        # orient normals per THIS device's camera (each dp row renders a
        # different viewpoint)
        normal_w, offset = model.oriented_normal(cam.cam_pos,
                                                 learnt=learnt_normal)
        res = rasterize(
            xyz=model.params.xyz, scale=model.scale, quat=model.quat_unit,
            opacity=model.opacity, sh_coeffs=model.sh_coeffs,
            active_sh_degree=model.active_sh_degree, normal_world=normal_w,
            plane_offset=offset,
            cam=cam, bg=bg, cfg=cfg, alive=model.alive, render_geo=False,
            viewport_row0=row0, viewport_rows=band,
        )
        return res.render[None]     # (1, band, W, 3)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("dp"), P(), P()),
        out_specs=P("dp", "tp"),
        check_vma=False,
    )
    return fn(cam_arrays, model, bg)


def sharded_train_step(opt_like, rcfg: RasterConfig, mesh: Mesh,
                       width: int, height: int, lrcfg: LRConfig = LRConfig()):
    """Build a jitted multi-device training step.

    Data layout per call:
      * model: replicated GaussianModel;
      * cam_arrays: (dp, …) stacked camera fields;
      * gts: (dp, H, W, 3) sharded P('dp', 'tp') over rows;
      * srcs: SourceViews stacked (dp, S, …), sharded P('dp') (full frames
        are needed on every band for warping).
    """
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    band = height // tp
    assert height % (tp * rcfg.tile_h) == 0

    def per_device_loss(params, state_rest, cam_arrays, gt_band, src_local,
                        iteration):
        model = state_rest.replace(params=params)
        cam = _band_camera(cam_arrays, width, height)
        row0 = lax.axis_index("tp") * band
        normal_w, offset = model.oriented_normal(cam.cam_pos, learnt=True)
        src = jax.tree.map(lambda x: x[0], src_local)
        res = rasterize(
            xyz=params.xyz, scale=model.scale, quat=model.quat_unit,
            opacity=model.opacity, sh_coeffs=model.sh_coeffs,
            active_sh_degree=model.active_sh_degree,
            normal_world=normal_w, plane_offset=offset,
            cam=cam, bg=jnp.zeros(3), cfg=rcfg, src=src,
            alive=model.alive, render_geo=True,
            viewport_row0=row0, viewport_rows=band,
        )
        img_l = losses.dssim_l1(res.render, gt_band[0])
        med_l = 1e-4 * (res.median_depth ** 2).mean()
        return img_l + med_l

    def shard_fn(params, state_rest, cam_arrays, gts, srcs, iteration):
        loss, grads = jax.value_and_grad(per_device_loss)(
            params, state_rest, cam_arrays, gts, srcs, iteration)
        loss = lax.psum(loss, ("dp", "tp")) / (dp * tp)
        grads = jax.tree.map(lambda g: lax.psum(g, ("dp", "tp")) / dp, grads)
        return loss, grads

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp", "tp"), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(model: GaussianModel, cam_arrays, gts, srcs, iteration):
        rest = model
        loss, grads = smapped(model.params, rest, cam_arrays, gts, srcs,
                              iteration)
        lrs = lr_tree(lrcfg, iteration.astype(jnp.float32), 1.0)
        model = adam_step(model, grads, lrs)
        return model, loss

    return step


# ---------------------------------------------------------------------------
# Gaussian-axis (primitive) sharding: FSDP-style storage + optimizer split
# ---------------------------------------------------------------------------

def fsdp_train_step(opt_like, rcfg: RasterConfig, mesh: Mesh,
                    width: int, height: int, lrcfg: LRConfig = LRConfig()):
    """Training step with Gaussian parameters + Adam moments sharded over
    the WHOLE mesh (leading P axis), cameras over dp and image row bands
    over tp:

      * params are all-gathered over ICI at the start of the step (the
        splatting analogue of FSDP weight gathering);
      * per-Gaussian gradients are psum_scatter'ed back to the owning
        shard, fused with the cross-(camera, band) reduction;
      * the Adam update runs on each device's 1/(dp·tp) slice only.

    Scales Gaussian memory (params + moments + grads) by the device count —
    the reference caps scenes at 5M splats on one GPU (gaussian_model.py
    max_all_points); this removes that bound on a pod slice.
    """
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    n_dev = dp * tp
    band = height // tp
    assert height % (tp * rcfg.tile_h) == 0

    def shard_fn(p_shard, mu_shard, nu_shard, rest: GaussianModel,
                 cam_arrays, gts, srcs, iteration):
        full = jax.tree.map(
            lambda x: lax.all_gather(x, ("dp", "tp"), axis=0, tiled=True),
            p_shard)
        model = rest.replace(params=full)
        cam = _band_camera(cam_arrays, width, height)
        row0 = lax.axis_index("tp") * band

        def loss_fn(params):
            m = model.replace(params=params)
            normal_w, offset = m.oriented_normal(cam.cam_pos, learnt=True)
            src = jax.tree.map(lambda x: x[0], srcs)
            res = rasterize(
                xyz=params.xyz, scale=m.scale, quat=m.quat_unit,
                opacity=m.opacity, sh_coeffs=m.sh_coeffs,
                active_sh_degree=m.active_sh_degree,
                normal_world=normal_w, plane_offset=offset,
                cam=cam, bg=jnp.zeros(3), cfg=rcfg, src=src,
                alive=m.alive, render_geo=True,
                viewport_row0=row0, viewport_rows=band,
            )
            return losses.dssim_l1(res.render, gts[0]) + \
                1e-4 * (res.median_depth ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(full)
        loss = lax.psum(loss, ("dp", "tp")) / (dp * tp)
        # reduce across replicas AND scatter to the owning shard in one
        # collective (reduce_scatter over ICI)
        g_shard = jax.tree.map(
            lambda g: lax.psum_scatter(g, ("dp", "tp"), scatter_dimension=0,
                                       tiled=True) / dp,
            grads)
        # masked Adam on the local slice
        P_shard = p_shard.xyz.shape[0]
        shard_ix = (lax.axis_index("dp") * tp + lax.axis_index("tp"))
        alive_shard = lax.dynamic_slice_in_dim(
            rest.alive, shard_ix * P_shard, P_shard, 0)
        lrs = lr_tree(lrcfg, iteration.astype(jnp.float32), 1.0)
        step = rest.step + 1
        bc1 = 1.0 - 0.9 ** step.astype(jnp.float32)
        bc2 = 1.0 - 0.999 ** step.astype(jnp.float32)

        def upd(p, m_, v_, g, lr):
            g = jnp.where(
                alive_shard.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0)
            m_ = 0.9 * m_ + 0.1 * g
            v_ = 0.999 * v_ + 0.001 * g * g
            return (p - lr * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + 1e-15),
                    m_, v_)

        out = jax.tree.map(upd, p_shard, mu_shard, nu_shard, g_shard, lrs)
        leaf = lambda t: isinstance(t, tuple)
        new_p = jax.tree.map(lambda t: t[0], out, is_leaf=leaf)
        new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=leaf)
        new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=leaf)
        return new_p, new_mu, new_nu, loss

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(("dp", "tp")), P(("dp", "tp")), P(("dp", "tp")),
                  P(), P("dp"), P("dp", "tp"), P("dp"), P()),
        out_specs=(P(("dp", "tp")), P(("dp", "tp")), P(("dp", "tp")), P()),
        check_vma=False,
    )

    @jax.jit
    def step(model: GaussianModel, cam_arrays, gts, srcs, iteration):
        new_p, new_mu, new_nu, loss = smapped(
            model.params, model.mu, model.nu, model, cam_arrays, gts, srcs,
            iteration)
        return model.replace(params=new_p, mu=new_mu, nu=new_nu,
                             step=model.step + 1), loss

    return step
