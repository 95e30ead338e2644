"""Gaussian-sharded compute: the distributed sort / instance exchange.

This is the SURVEY §2.5 "distributed radix sort" row — the TPU-native
replacement of the reference's single-GPU global cub sort
(rasterizer_impl.cu:187-255), and the piece the FSDP-style step
(sharding.py) lacks: there, every device all-gathers the full parameter
set and preprocesses/bins all P Gaussians.  Here *compute* scales as P/n:

  mesh ("dp", "gs"): dp replicates over cameras; the gs axis shards BOTH
  the Gaussian arrays (each device owns P/n primitives) and the image
  (each device owns one horizontal band of rows).

Per-device pipeline inside shard_map:
  1. preprocess OWN P/n Gaussians for this dp-row's camera (O(P/n));
  2. local binning over the FULL tile grid (scan-propagated expansion +
     one local sort — O(cap_local log));
  3. instances are routed to the device owning their tile's row band with
     ONE `lax.all_to_all` over the gs axis (the collective form of the
     reference's global sort's implicit shuffle); per-destination slots
     are capacity-padded (static shapes) with an overflow count returned
     for diagnostics;
  4. each device merge-sorts its received instances by (local tile,
     depth) — one two-key sort of (int, f32, index) triples + one row
     gather — and blends its band with the Pallas kernel;
  5. gradients flow back through the gather/all_to_all/scatter chain by
     autodiff (all_to_all is its own transpose), landing on the OWNING
     shard's parameters — no cross-gs reduction needed; only a psum over
     dp remains.

Multi-host: build the mesh over `jax.devices()` after
`parallel.distributed.initialize()`; the gs all_to_all rides ICI within a
slice and DCN across slices (XLA inserts the hierarchy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ibgs_tpu.core.camera import Camera
from ibgs_tpu.models.gaussians import GaussianModel, LRConfig, lr_tree
from ibgs_tpu.ops import binning, preprocess
from ibgs_tpu.ops.blend_common import BlendOutputs
from ibgs_tpu.ops.epilogue import ibr_epilogue
from ibgs_tpu.ops.rasterize import RasterConfig
from ibgs_tpu.parallel.sharding import _band_camera, _cam_stack  # noqa: F401
from ibgs_tpu.train import losses


@struct.dataclass
class _Bins:
    tile_start: jnp.ndarray
    tile_stop: jnp.ndarray


@jax.custom_vjp
def _route_rows(feats, src_of_slot, slot_of_src, slot_valid, src_kept):
    """Send-side slot assembly as a GATHER with a gather backward.

    The slot→instance map is injective (each kept instance fills exactly
    one send slot), so both directions are plain row gathers.  Left to
    XLA, the natural formulation — a (cap_local, C)-row scatter forward
    (or a scatter-add transpose of a gather) — costs per-ELEMENT, not
    per-row (~160 ms for a 16-wide scatter-add at cap 2M on v5e, the
    same trap binning.pack_rows documents); this helper is why the
    generic exchange has no wide scatter in forward OR backward."""
    out = feats[jnp.clip(src_of_slot, 0, feats.shape[0] - 1)]
    return jnp.where(slot_valid[:, None], out, 0.0)


def _route_rows_fwd(feats, src_of_slot, slot_of_src, slot_valid, src_kept):
    return (_route_rows(feats, src_of_slot, slot_of_src, slot_valid,
                        src_kept),
            (src_of_slot, slot_of_src, slot_valid, src_kept,
             feats.shape[0]))


def _route_rows_bwd(res, g):
    src_of_slot, slot_of_src, slot_valid, src_kept, n_src = res
    g = jnp.where(slot_valid[:, None], g, 0.0)
    d = g[jnp.clip(slot_of_src, 0, g.shape[0] - 1)]
    d = jnp.where(src_kept[:, None], d, 0.0)
    return (d, None, None, None, None)


_route_rows.defvjp(_route_rows_fwd, _route_rows_bwd)


@jax.custom_vjp
def _permute_rows(x, perm, inv_perm):
    """x[perm] with the backward as a gather by the inverse permutation
    (XLA's transpose of a permutation gather is a row scatter-add —
    per-element cost at 16 columns; the inverse-gather is per-row)."""
    return x[perm]


def _permute_rows_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _permute_rows_bwd(inv_perm, g):
    return (g[inv_perm], None, None)


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _pack_feats(sp, screen_dummy_abs=None):
    """(P, 16) packed per-Gaussian feature rows; col 15 carries view depth
    (the cross-shard merge key — non-differentiable, blend ignores it)."""
    P_ = sp.mean2d.shape[0]
    z = jnp.zeros((P_,), jnp.float32)
    ax = screen_dummy_abs[:, 0] if screen_dummy_abs is not None else z
    ay = screen_dummy_abs[:, 1] if screen_dummy_abs is not None else z
    return jnp.stack(
        [sp.mean2d[:, 0], sp.mean2d[:, 1],
         sp.conic[:, 0], sp.conic[:, 1], sp.conic[:, 2],
         sp.opacity,
         sp.rgb[:, 0], sp.rgb[:, 1], sp.rgb[:, 2],
         sp.plane_normal[:, 0], sp.plane_normal[:, 1], sp.plane_normal[:, 2],
         sp.plane_dist,
         ax, ay,
         lax.stop_gradient(sp.depth)],
        axis=1)


def exchange_and_blend(params_view, cam: Camera, rcfg: RasterConfig,
                       n_bands: int, band_index, cap_local: int,
                       exchange_cap: int, axis_name: str = "gs",
                       bg=None, src=None, render_geo=True):
    """The sharded rasterizer core (steps 1-4 above), called inside
    shard_map.  `params_view` is a dict of SHARD-LOCAL per-Gaussian arrays:
    xyz, scale, quat, opacity, sh_coeffs, active_sh_degree, normal_world,
    plane_offset, alive.

    Returns (render_band (band,W,3), blend BlendOutputs, ibr|None, extras)
    with extras = {"n_overflow": () int32 instances dropped by the
    per-pair exchange cap, "radius": (P_loc,) int32 screen radii,
    "n_instances": () int32 local pre-truncation instance count}.
    """
    tile_h, tile_w = rcfg.tile_h, rcfg.tile_w
    Wp = -(-cam.width // tile_w) * tile_w
    tiles_x = Wp // tile_w
    assert cam.height % (n_bands * tile_h) == 0, \
        "height must split into n_bands tile-aligned bands"
    band = cam.height // n_bands
    band_ty = band // tile_h
    tiles_per_band = tiles_x * band_ty
    num_tiles_total = tiles_per_band * n_bands
    row0 = band_index * band

    # 1-2. local preprocess + binning over the FULL tile grid
    sp = preprocess.preprocess(
        params_view["xyz"], params_view["scale"], params_view["quat"],
        params_view["opacity"], params_view["sh_coeffs"],
        params_view["active_sh_degree"], params_view["normal_world"],
        params_view["plane_offset"], cam, tile_h, tile_w,
        alive=params_view.get("alive"))
    cull_tab = None
    if rcfg.exact_tile_cull or rcfg.staircase_cull:
        # exact tile/ellipse cull (see bin_splats): global pixel coords —
        # GSP bins the FULL tile grid before the band exchange, so culled
        # instances also never enter the all_to_all.  The staircase variant
        # additionally shrinks `total` itself (kept-tile counting before
        # slot assignment), i.e. the exchange VOLUME, not just its content.
        m2c = lax.stop_gradient(sp.mean2d)
        con = lax.stop_gradient(sp.conic)
        thr = jnp.log(jnp.maximum(
            255.0 * lax.stop_gradient(sp.opacity), 1.000001))
        cull_tab = jnp.stack([m2c[:, 0], m2c[:, 1], con[:, 0], con[:, 1],
                              con[:, 2], thr], axis=1)
    bins = binning.bin_splats(sp, tiles_x, band_ty * n_bands, cap_local,
                              with_gauss_id=False, cull_tab=cull_tab,
                              tile_h=tile_h, tile_w=tile_w,
                              staircase=rcfg.staircase_cull,
                              row_cap=rcfg.row_cap or cap_local // 2)
    feats_g = _pack_feats(sp, params_view.get("screen_dummy_abs"))
    if params_view.get("screen_dummy") is not None:
        feats_g = feats_g.at[:, 0:2].add(params_view["screen_dummy"])
    feats_inst = binning.pack_rows(feats_g, bins)

    if n_bands == 1 and exchange_cap >= cap_local:
        # 3-4. one band owns every tile, and with exchange_cap >= cap_local
        # nothing can be dropped: the exchange is an IDENTITY.  The local
        # binning already emits instances sorted by (tile, depth) with
        # invalid rows (tile == num_tiles) at the end, so the send scatter,
        # all_to_all, two-key merge re-sort and permutation row gather are
        # all skipped — measured on v5e at the bench scene, this cuts the
        # single-chip GSP machinery tax (the n_gs=1 production path and
        # every dp-only mesh) without changing a bit of output: the generic
        # path composes scatter → all_to_all → sort → gather whose product
        # is the identity permutation here, in forward AND transpose.
        n_overflow = jnp.int32(0)
        feats_band = feats_inst
        start, stop = bins.tile_start, bins.tile_stop
    else:
        # 3. route instances to their band owner (dest monotone in tile id).
        # Binning leaves instances sorted by (tile, depth) with invalid
        # rows (tile == num_tiles) at the end, so each destination's
        # instances are one contiguous run: slot (b, q) of the send buffer
        # is instance seg_start[b] + q — assembly is a fully COHERENT row
        # gather (with a gather backward via _route_rows), never a
        # cap-sized 16-wide scatter.
        tile = bins.tile_id                              # sorted ascending
        dest = tile // tiles_per_band                    # invalid → n_bands
        seg_start = jnp.searchsorted(
            tile, jnp.arange(n_bands + 1, dtype=jnp.int32) * tiles_per_band
        ).astype(jnp.int32)
        local_pos = jnp.arange(cap_local, dtype=jnp.int32) - seg_start[
            jnp.minimum(dest, n_bands)]
        keep = (bins.inst_valid & (local_pos < exchange_cap)
                & (dest < n_bands))
        n_overflow = (bins.inst_valid & ~keep).sum()
        cap_band = n_bands * exchange_cap
        slot_b = (jnp.arange(cap_band, dtype=jnp.int32)
                  // jnp.int32(exchange_cap))
        slot_q = (jnp.arange(cap_band, dtype=jnp.int32)
                  % jnp.int32(exchange_cap))
        src_of_slot = seg_start[slot_b] + slot_q
        slot_valid = slot_q < (seg_start[slot_b + 1] - seg_start[slot_b])
        slot_of_src = dest * exchange_cap + local_pos
        sendf = _route_rows(feats_inst, src_of_slot, slot_of_src,
                            slot_valid, keep)
        sendt = jnp.where(
            slot_valid,
            tile[jnp.clip(src_of_slot, 0, cap_local - 1)]
            - slot_b * tiles_per_band,
            tiles_per_band)
        recvf = lax.all_to_all(sendf.reshape(n_bands, exchange_cap, 16),
                               axis_name, 0, 0).reshape(-1, 16)
        recvt = lax.all_to_all(sendt.reshape(n_bands, exchange_cap),
                               axis_name, 0, 0).reshape(-1)

        # 4. merge by (local tile, depth) and blend the band.  The sort's
        # permutation is applied through _permute_rows so the backward is
        # an inverse-permutation gather (the 2-operand payload sort below
        # recovers the inverse in sequential radix passes).
        depth_key = lax.stop_gradient(recvf[:, 15])
        depth_key = jnp.where(recvt < tiles_per_band, depth_key, jnp.inf)
        sortt, _, perm = lax.sort(
            (recvt, depth_key, jnp.arange(cap_band, dtype=jnp.int32)),
            num_keys=2)
        inv_perm = lax.sort(
            (perm, jnp.arange(cap_band, dtype=jnp.int32)), num_keys=1)[1]
        feats_band = _permute_rows(recvf, perm, inv_perm)
        n_valid = (sortt < tiles_per_band).sum()
        start, stop = binning.tile_ranges_from_sorted(
            sortt, tiles_per_band, n_valid)

    from ibgs_tpu.ops import blend_pallas, blend_oracle
    from ibgs_tpu.ops.blend_common import Instances
    Hp_band = band_ty * tile_h
    bcfg = rcfg.blend_cfg(render_geo, False)
    if rcfg.backend == "oracle":
        f = feats_band
        inst = Instances(mean2d=f[:, 0:2], conic=f[:, 2:5], opacity=f[:, 5],
                         rgb=f[:, 6:9], normal=f[:, 9:12], dist=f[:, 12])
        blend = blend_oracle.blend_oracle(
            inst, _Bins(start, stop), Wp, Hp_band,
            cam.fx, cam.fy, cam.cx, cam.cy, bcfg, row0=row0)
    else:
        blend = blend_pallas.blend_packed(
            feats_band, _Bins(start, stop), Wp, Hp_band,
            cam.fx, cam.fy, cam.cx, cam.cy, bcfg, row0=row0)

    H, W = band, cam.width
    blend = BlendOutputs(
        color=blend.color[:H, :W], normal=blend.normal[:H, :W],
        final_t=blend.final_t[:H, :W], n_contrib=blend.n_contrib[:H, :W],
        buf_depth=blend.buf_depth[:H, :W], buf_weight=blend.buf_weight[:H, :W],
        buf_contrib=blend.buf_contrib[:H, :W])
    bg = jnp.zeros(3) if bg is None else bg
    render = blend.color + blend.final_t[..., None] * bg[None, None, :]
    ibr = None
    if render_geo and src is not None:
        ibr = ibr_epilogue(blend, cam, src, rcfg.depth_error_threshold,
                           row0=row0)
    extras = {"n_overflow": n_overflow, "radius": sp.radius,
              "n_instances": bins.n_instances}
    return render, blend, ibr, extras


def _local_view(model_like, p_loc, alive_loc, cam_pos, learnt=True):
    """Shard-local activation dict from shard-local raw params."""
    m = model_like.replace(params=p_loc, alive=alive_loc)
    normal_w, offset = m.oriented_normal(cam_pos, learnt=learnt)
    return {
        "xyz": p_loc.xyz, "scale": m.scale, "quat": m.quat_unit,
        "opacity": m.opacity, "sh_coeffs": m.sh_coeffs,
        "active_sh_degree": model_like.active_sh_degree,
        "normal_world": normal_w, "plane_offset": offset,
        "alive": alive_loc,
    }


def gsp_train_step(rcfg: RasterConfig, mesh: Mesh, width: int, height: int,
                   cap_local: int, exchange_cap: int,
                   lrcfg: LRConfig = LRConfig()):
    """Jitted training step with Gaussian-axis COMPUTE sharding.

    Layout: params/mu/nu/alive sharded P("gs") (replicated over dp);
    cameras and source packs over dp; ground truth (dp, H, W, 3) sharded
    P("dp", "gs") over rows.  Per-device FLOPs scale as P/n_gs for
    preprocess/binning and pixels/n_gs for the blend.
    """
    dp, n = mesh.shape["dp"], mesh.shape["gs"]
    band = height // n
    assert height % (n * rcfg.tile_h) == 0

    def shard_fn(p_loc, mu_loc, nu_loc, alive_loc, rest: GaussianModel,
                 cam_arrays, gts, srcs, iteration):
        cam = _band_camera(cam_arrays, width, height)
        band_ix = lax.axis_index("gs")
        src = jax.tree.map(lambda x: x[0], srcs)

        def loss_fn(p_loc):
            view = _local_view(rest, p_loc, alive_loc, cam.cam_pos)
            render, blend, ibr, extras = exchange_and_blend(
                view, cam, rcfg, n, band_ix, cap_local, exchange_cap,
                axis_name="gs", bg=jnp.zeros(3), src=src, render_geo=True)
            img_l = losses.dssim_l1(render, gts[0])
            med_l = 1e-4 * (ibr.median_depth ** 2).mean()
            return img_l + med_l, extras["n_overflow"]

        (loss, n_ovf), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p_loc)
        loss = lax.psum(loss, ("dp", "gs")) / (dp * n)
        n_ovf = lax.psum(n_ovf, ("dp", "gs"))
        # gs shards own disjoint Gaussians — only the dp replicas reduce
        grads = jax.tree.map(lambda g: lax.psum(g, "dp") / dp, grads)

        lrs = lr_tree(lrcfg, iteration.astype(jnp.float32), 1.0)
        step = rest.step + 1
        bc1 = 1.0 - 0.9 ** step.astype(jnp.float32)
        bc2 = 1.0 - 0.999 ** step.astype(jnp.float32)

        def upd(p, m_, v_, g, lr):
            g = jnp.where(
                alive_loc.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0)
            m_ = 0.9 * m_ + 0.1 * g
            v_ = 0.999 * v_ + 0.001 * g * g
            return (p - lr * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + 1e-15),
                    m_, v_)

        out = jax.tree.map(upd, p_loc, mu_loc, nu_loc, grads, lrs)
        leaf = lambda t: isinstance(t, tuple)
        new_p = jax.tree.map(lambda t: t[0], out, is_leaf=leaf)
        new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=leaf)
        new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=leaf)
        return new_p, new_mu, new_nu, loss, n_ovf

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("gs"), P("gs"), P("gs"), P("gs"),
                  P(), P("dp"), P("dp", "gs"), P("dp"), P()),
        out_specs=(P("gs"), P("gs"), P("gs"), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(model: GaussianModel, cam_arrays, gts, srcs, iteration):
        new_p, new_mu, new_nu, loss, n_ovf = smapped(
            model.params, model.mu, model.nu, model.alive, model,
            cam_arrays, gts, srcs, iteration)
        return (model.replace(params=new_p, mu=new_mu, nu=new_nu,
                              step=model.step + 1), loss, n_ovf)

    return step


# per-Gaussian (leading-P) fields of GaussianModel, sharded P("gs") in the
# full-objective step and the sharded densify below
_SHARD_FIELDS = ("params", "mu", "nu", "alive", "max_radii2d", "grad_accum",
                 "grad_accum_abs", "denom", "denom_abs")


def _shard_arrays(model: GaussianModel) -> dict:
    return {f: getattr(model, f) for f in _SHARD_FIELDS}


def gsp_full_train_step(opt, rcfg: RasterConfig, net, phase, mesh: Mesh,
                        width: int, height: int, cap_local: int,
                        exchange_cap: int):
    """The FULL IBGS objective under Gaussian-sharded SPMD (VERDICT r2 #3).

    Identical semantics to the single-chip trainer (train/trainer.py
    make_train_step) — the objective body is literally shared
    (trainer.ibgs_objective) — with the render produced by the sharded
    exchange_and_blend pipeline:

      * model per-Gaussian arrays (params + Adam moments + densify stats)
        sharded P("gs"); AppModel table and aggregation-net params
        replicated;
      * each gs device renders its image row band, then the band outputs
        are all_gather'ed over "gs" so every loss term (full-window SSIM,
        depth→normal central differences, the aggregation hourglass) sees
        the FULL frame — bit-matching the single-chip loss math; the
        gathers are O(H·W) while the heavy blend/epilogue VJPs stay
        band-local, and their transposes reduce-scatter the image
        cotangents back to the owning band;
      * per-device loss is scaled 1/(dp·n_gs): the gs devices of one dp
        row compute IDENTICAL full-frame losses, and reverse AD through
        the all_gather/all_to_all transposes sums all n_gs copies into the
        Gaussian cotangents;
      * Gaussian/screen-dummy grads need only the dp psum (gs shards own
        disjoint Gaussians); AppModel/net grads psum over both axes;
      * Adam + densification-stats accumulation run shard-local through
        the SAME adam_step / accumulate_stats as the single-chip step.

    Returns a jitted step(state: TrainState, cam_arrays, cam_uid, gts,
    srcs, iteration, bg, use_app, burned_in, net_lr) →
    (new_state, aux dict incl. (dp,H,W) median depths for the cache).
    """
    from ibgs_tpu.ops.epilogue import IBROutputs
    from ibgs_tpu.renderer import depth_to_normal
    from ibgs_tpu.train.trainer import (ibgs_objective, make_lr_config,
                                        side_adam)
    from ibgs_tpu.models.gaussians import accumulate_stats, adam_step

    lrcfg = make_lr_config(opt)
    dp, n = mesh.shape["dp"], mesh.shape["gs"]
    assert height % (n * rcfg.tile_h) == 0, \
        "height must split into n_gs tile-aligned bands"

    def shard_fn(arrays, rest: GaussianModel, app_ab, net_params,
                 cam_arrays, cam_uid, gts, srcs, iteration, bg, use_app,
                 burned_in, spatial_lr_scale):
        model_loc = rest.replace(**arrays)
        cam = _band_camera(cam_arrays, width, height)
        band_ix = lax.axis_index("gs")
        src = jax.tree.map(lambda x: x[0], srcs)
        gt = gts[0]
        P_loc = model_loc.capacity
        sdum = jnp.zeros((P_loc, 2), jnp.float32)

        def loss_fn(params, app_ab_, net_params_, sdum_, sdum_abs_):
            view = _local_view(model_loc, params, model_loc.alive,
                               cam.cam_pos, learnt=opt.learnt_normal)
            view["screen_dummy"] = sdum_
            view["screen_dummy_abs"] = sdum_abs_
            render, blend, ibr, extras = exchange_and_blend(
                view, cam, rcfg, n, band_ix, cap_local, exchange_cap,
                axis_name="gs", bg=bg, src=src,
                render_geo=phase.render_geo)

            def gat(x, ax=0):   # band outputs → full frame
                return lax.all_gather(x, "gs", axis=ax, tiled=True)

            image = gat(render)
            normal_full = gat(blend.normal)
            ibr_full, dnormal, median_full = None, None, None
            if phase.render_geo:
                ibr_full = IBROutputs(
                    median_depth=gat(ibr.median_depth),
                    camera_ray=gat(ibr.camera_ray),
                    warped_image=gat(ibr.warped_image, 1),
                    cam_feat=gat(ibr.cam_feat, 1),
                    min_depth_diff=gat(ibr.min_depth_diff),
                    valid_src_index=gat(ibr.valid_src_index, 1),
                    valid_src_weight=gat(ibr.valid_src_weight, 1),
                    use_first_src_mask=gat(ibr.use_first_src_mask),
                    low_contrib=gat(ibr.low_contrib),
                    high_contrib=gat(ibr.high_contrib))
                median_full = ibr_full.median_depth
                # exactly renderer.render_view's depth-normal path
                dn = depth_to_normal(cam, median_full)
                dnormal = dn * lax.rsqrt(
                    (dn * dn).sum(-1, keepdims=True) + 1e-16)
            total, aux = ibgs_objective(
                opt, phase, net, net_params_, app_ab_, cam_uid[0], image,
                normal_full, dnormal, ibr_full, gt, iteration, use_app,
                burned_in)
            return total / (dp * n), (aux, extras, median_full)

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4),
                                     has_aux=True)
        (loss, (aux, extras, median_full)), \
            (g_params, g_app, g_net, g_sd, g_sda) = grad_fn(
                model_loc.params, app_ab, net_params, sdum, sdum)

        # debug-mode trip wire, mirrors trainer.make_train_step: reverse-
        # only NaNs leave every loss scalar finite.  Kept OUT of the
        # dp-averaged aux dict below: each gs shard counts only its own
        # per-shard grads, and averaging an int count over dp would
        # truncate fractional means back to 0 — it is psum'd over BOTH
        # axes as an int32 total instead.
        nonfinite_sentinel = sum(
            (~jnp.isfinite(x)).sum() for t in
            (g_params, g_app, g_net, g_sd, g_sda)
            for x in jax.tree.leaves(t)).astype(jnp.int32)

        loss = lax.psum(loss, ("dp", "gs"))
        # gs shards own disjoint Gaussians (cross-gs terms already arrived
        # through the collective transposes); only dp replicas reduce
        g_params = jax.tree.map(lambda g: lax.psum(g, "dp"), g_params)
        g_sd = lax.psum(g_sd, "dp")
        g_sda = lax.psum(g_sda, "dp")
        g_app = jax.tree.map(lambda g: lax.psum(g, ("dp", "gs")), g_app)
        g_net = jax.tree.map(lambda g: lax.psum(g, ("dp", "gs")), g_net)

        lrs = lr_tree(lrcfg, iteration.astype(jnp.float32),
                      spatial_lr_scale)
        model_new = adam_step(model_loc, g_params, lrs)
        model_new = accumulate_stats(model_new, g_sd, g_sda,
                                     extras["radius"], width, height)

        aux = {k: lax.psum(v, "dp") / dp for k, v in aux.items()}
        aux["nonfinite_grads"] = lax.psum(nonfinite_sentinel, ("dp", "gs"))
        aux["n_overflow"] = lax.psum(extras["n_overflow"], ("dp", "gs"))
        aux["n_instances"] = lax.psum(extras["n_instances"],
                                      ("dp", "gs")) // dp
        med = (jnp.zeros((1, height, width), jnp.float32)
               if median_full is None else median_full[None])
        return (_shard_arrays(model_new), model_new.step, g_app, g_net,
                loss, aux, med)

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("gs"), P(), P(), P(), P("dp"), P("dp"), P("dp"),
                  P("dp"), P(), P(), P(), P(), P()),
        out_specs=(P("gs"), P(), P(), P(), P(), P(), P("dp")),
        check_vma=False,
    )

    @jax.jit
    def step(state, cam_arrays, cam_uid, gts, srcs, iteration, bg,
             use_app, burned_in, net_lr):
        model = state.model
        (new_arrays, new_step, g_app, g_net, loss, aux, med) = smapped(
            _shard_arrays(model), model, state.app_ab, state.net_params,
            cam_arrays, cam_uid, gts, srcs, iteration, bg, use_app,
            burned_in, state.spatial_lr_scale)
        model = model.replace(step=new_step, **new_arrays)
        app_ab, app_opt = side_adam(state.app_ab, state.app_opt, g_app,
                                    lr=1e-3, b2=0.99)
        if phase.use_aggregation:
            net_params, net_opt = side_adam(
                state.net_params, state.net_opt, g_net, lr=net_lr)
        else:
            net_params, net_opt = state.net_params, state.net_opt
        aux = dict(aux)
        aux["loss"] = loss
        aux["median_depth"] = med
        new_state = state.replace(model=model, app_ab=app_ab,
                                  app_opt=app_opt, net_params=net_params,
                                  net_opt=net_opt)
        return new_state, aux

    return step


def gsp_interleave(model: GaussianModel, n_shards: int) -> GaussianModel:
    """Deal the model's slot space round-robin across gs shards.

    Gaussian order carries no semantics (the rasterizer depth-sorts), but
    the P("gs") sharding is BLOCK-wise: a freshly-initialised model
    (alive = arange < k) puts every alive Gaussian in the first shards and
    every free slot in the last, so shard-local densification
    (gsp_densify_fn) could grant nothing.  This one-time permutation sends
    old row i to shard i % n — alive rows AND free slots spread evenly —
    and per-shard allocation keeps them balanced thereafter.  Call once
    when entering GSP training (after init / checkpoint load / capacity
    growth)."""
    P_cap = model.capacity
    assert P_cap % n_shards == 0, (P_cap, n_shards)
    Pl = P_cap // n_shards
    # new position p = s*Pl + t holds old row i = t*n + s
    perm = (jnp.arange(Pl, dtype=jnp.int32)[None, :] * n_shards
            + jnp.arange(n_shards, dtype=jnp.int32)[:, None]).reshape(-1)
    moved = {f: jax.tree.map(lambda x: x[perm], getattr(model, f))
             for f in _SHARD_FIELDS}
    return model.replace(**moved)


def gsp_densify_fn(mesh: Mesh, cfg, max_screen=None):
    """Sharded densification: each gs shard clones / splits / prunes within
    its OWN P/n slot pool through the unchanged single-chip
    densify_and_prune — the rank-based slot allocator is already
    shard-local (argsorts over the local capacity only), so no collective
    is needed.  Policy deltas vs the global single-chip pass (documented):
    the abs-split budget is divided evenly across shards, and slot
    exhaustion is per-shard — a shard whose pool fills stops granting
    while others continue (the single-chip quantile back-off equivalent
    acts per shard).  The densify RNG folds in the shard index so children
    are decorrelated across shards."""
    import dataclasses as _dc

    from ibgs_tpu.models.gaussians import densify_and_prune

    n = mesh.shape["gs"]
    cfg_loc = _dc.replace(cfg, max_abs_split=max(cfg.max_abs_split // n, 1))

    def shard_fn(arrays, rest: GaussianModel, key, extent):
        model_loc = rest.replace(**arrays)
        key = jax.random.fold_in(key, lax.axis_index("gs"))
        out = densify_and_prune(model_loc, key, cfg_loc, extent,
                                max_screen_size=max_screen)
        return _shard_arrays(out)

    smapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("gs"), P(), P(), P()),
        out_specs=P("gs"),
        check_vma=False,
    )

    @jax.jit
    def densify(model: GaussianModel, key, extent):
        return model.replace(**smapped(_shard_arrays(model), model, key,
                                       extent))

    return densify


def make_gsp_render(width: int, height: int, rcfg: RasterConfig,
                    mesh: Mesh, cap_local: int, exchange_cap: int,
                    learnt_normal=True):
    """Build a reusable Gaussian-sharded renderer for a fixed geometry:
    returns `render(model, cam, bg) -> ((H, W, 3) image, overflow)`.
    Repeated calls reuse one traced shard_map (gsp_render builds a fresh
    closure per call — fine for one-shot exactness checks, a retrace per
    frame for timing sweeps)."""
    n = mesh.shape["gs"]

    def shard_fn(p_loc, alive_loc, rest, cam_arrays, bg):
        c = _band_camera(cam_arrays, width, height)
        view = _local_view(rest, p_loc, alive_loc, c.cam_pos,
                           learnt=learnt_normal)
        render, _, _, extras = exchange_and_blend(
            view, c, rcfg, n, lax.axis_index("gs"), cap_local, exchange_cap,
            bg=bg, src=None, render_geo=False)
        return render[None], lax.psum(extras["n_overflow"], "gs")

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("gs"), P("gs"), P(), P(), P()),
        out_specs=(P(None, "gs"), P()),
        check_vma=False,
    ))

    def render(model: GaussianModel, cam: Camera, bg=None):
        bg = jnp.zeros(3) if bg is None else bg
        args = (model.params, model.alive, model, _cam_stack([cam]), bg)
        if jax.process_count() > 1:
            from jax.sharding import NamedSharding

            def place(tree, spec):
                sh = NamedSharding(mesh, spec)
                return jax.tree.map(
                    lambda x: jax.device_put(jnp.asarray(x), sh), tree)
            args = (place(args[0], P("gs")), place(args[1], P("gs")),
                    place(args[2], P()), place(args[3], P()),
                    place(args[4], P()))
        img, ovf = fn(*args)
        return img[0], ovf

    return render


def gsp_render(model: GaussianModel, cam: Camera, rcfg: RasterConfig,
               mesh: Mesh, cap_local: int, exchange_cap: int, bg=None,
               learnt_normal=True):
    """Gaussian-sharded render over a 1-d gs mesh (exactness harness;
    returns the stitched (H, W, 3) image and total overflow count).

    Multi-process ready: when `mesh` spans >1 process (after
    parallel.distributed.initialize), host-local inputs are device_put to
    their global shardings first — every process passes the SAME full
    arrays and receives its addressable shards; the gs all_to_all then
    crosses the process boundary (ICI/DCN on real pods, TCP on the CPU
    backend).  The returned image is row-sharded over gs; read
    `.addressable_shards` per process (scripts/multihost_worker.py)."""
    return make_gsp_render(cam.width, cam.height, rcfg, mesh, cap_local,
                           exchange_cap, learnt_normal)(model, cam, bg)
