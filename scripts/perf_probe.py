"""Per-stage TPU performance probe for the IBGS pipeline.

Measures, in ONE process (the TPU admits one process at a time):
  1. a gather cost model (row gathers of several widths/dtypes vs the
     2-axis image gather the epilogue uses today);
  2. compile time + steady-state run time of each pipeline stage at the
     bench config (960x544, 100k splats, cap 2^21, S=4 sources).

Timing methodology per CLAUDE.md: iterations are chained inside one jit
via lax.fori_loop with a data dependency and a traced trip count (so one
compile serves both the n=1 and n=N calls); completion is forced by the
scalar D2H copy.  stage_ms = (t(N) - t(1)) / (N - 1).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

W = int(os.environ.get("PROBE_W", 960))
H = int(os.environ.get("PROBE_H", 544))
N = int(os.environ.get("PROBE_N", 100_000))
CAP = int(os.environ.get("PROBE_CAP", 1 << 21))
S = 4
ITERS = int(os.environ.get("PROBE_ITERS", 5))


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def timed_loop(body, carry0, label, iters=ITERS, args=()):
    """body: (carry, *args) -> carry.  Big arrays MUST go through `args`
    (closure constants are inlined into the remote-compile request and
    blow its size limit).  Returns (compile_s, ms/iter)."""
    def run(n, carry, *a):
        return lax.fori_loop(0, n, lambda i, c: body(c, *a), carry)

    fit = jax.jit(run)
    t0 = time.time()
    r = fit(jnp.int32(1), carry0, *args)
    jax.block_until_ready(r)
    compile_s = time.time() - t0
    # warm
    jax.block_until_ready(fit(jnp.int32(1), carry0, *args))
    t1 = time.time()
    jax.block_until_ready(fit(jnp.int32(1), carry0, *args))
    t_one = time.time() - t1
    t1 = time.time()
    jax.block_until_ready(fit(jnp.int32(iters), carry0, *args))
    t_n = time.time() - t1
    ms = (t_n - t_one) / (iters - 1) * 1e3
    emit(label, compile_s=round(compile_s, 1), ms=round(ms, 2))
    return compile_s, ms


# --------------------------------------------------------------------------
# 1. gather cost model
# --------------------------------------------------------------------------

def gather_probes():
    rng = np.random.default_rng(0)
    n_idx = S * H * W * 4          # ~8.3M (epilogue scale: S views x B=4)
    idx = jnp.asarray(rng.integers(0, H * W, n_idx), jnp.int32)

    def probe_row(width, dtype, tag):
        table = jnp.asarray(rng.random((H * W, width)), dtype)

        def body(c, table, idx):
            out = table[(idx + c.astype(jnp.int32) % 7)]
            return jnp.float32(jnp.sum(out[:, 0].astype(jnp.float32))) * 1e-30

        timed_loop(body, jnp.float32(0), f"gather_row_{tag}",
                   args=(table, idx))

    probe_row(16, jnp.float32, "w16_f32")
    probe_row(12, jnp.float32, "w12_f32")
    probe_row(4, jnp.float32, "w4_f32")
    probe_row(128, jnp.float32, "w128_f32")

    # 2-axis image gather, current epilogue pattern: img[y0, x0]
    img = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    y0 = jnp.asarray(rng.integers(0, H - 1, (4, H, W)), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, W, (4, H, W)), jnp.int32)

    def body2d(c, img, y0, x0):
        out = img[jnp.clip(y0 + c.astype(jnp.int32) % 2, 0, H - 1), x0]
        return jnp.float32(jnp.sum(out)) * 1e-30

    timed_loop(body2d, jnp.float32(0), "gather_2axis_img3_4HW",
               args=(img, y0, x0))

    # flat row gather of 3 channels, same index count
    flat = img.reshape(-1, 3)
    fidx = (y0 * W + x0).reshape(-1)

    def bodyflat(c, flat, fidx):
        out = flat[(fidx + c.astype(jnp.int32) % 7)]
        return jnp.float32(jnp.sum(out)) * 1e-30

    timed_loop(bodyflat, jnp.float32(0), "gather_row_w3_f32_4HW",
               args=(flat, fidx))


# --------------------------------------------------------------------------
# 2. stage probes
# --------------------------------------------------------------------------

def stage_probes():
    from ibgs_tpu.ops import binning, preprocess
    from ibgs_tpu.ops import blend_pallas
    from ibgs_tpu.ops.blend_common import BlendConfig, BlendOutputs
    from ibgs_tpu.ops.epilogue import SourceViews, ibr_epilogue
    from ibgs_tpu.models.gaussians import init_from_points
    from tests.utils import simple_camera

    rng = np.random.default_rng(0)
    pts = (rng.random((N, 3)) * 2.0 - 1.0).astype(np.float32)
    pts[:, 2] *= 0.3
    cols = rng.random((N, 3)).astype(np.float32)
    model = init_from_points(pts, cols, max_sh_degree=2)
    cam = simple_camera(W, H)
    tile_h, tile_w = 8, 16
    Wp = -(-W // tile_w) * tile_w
    Hp = -(-H // tile_h) * tile_h
    tiles_x, tiles_y = Wp // tile_w, Hp // tile_h

    def front(params):
        m = model.replace(params=params)
        normal_w, offset = m.oriented_normal(cam.cam_pos, learnt=True)
        sp = preprocess.preprocess(
            m.params.xyz, m.scale, m.quat_unit, m.opacity, m.sh_coeffs,
            m.active_sh_degree, normal_w, offset, cam, tile_h, tile_w,
            alive=m.alive)
        bins = binning.bin_splats(sp, tiles_x, tiles_y, CAP,
                                  with_gauss_id=False)
        P = sp.mean2d.shape[0]
        feats_g = jnp.stack(
            [sp.mean2d[:, 0], sp.mean2d[:, 1],
             sp.conic[:, 0], sp.conic[:, 1], sp.conic[:, 2],
             sp.opacity,
             sp.rgb[:, 0], sp.rgb[:, 1], sp.rgb[:, 2],
             sp.plane_normal[:, 0], sp.plane_normal[:, 1],
             sp.plane_normal[:, 2], sp.plane_dist,
             jnp.zeros((P,), jnp.float32), jnp.zeros((P,), jnp.float32),
             jnp.zeros((P,), jnp.float32)], axis=1)
        feats_inst = feats_g[bins.order][bins.rank]
        feats_inst = jnp.where(bins.inst_valid[:, None], feats_inst, 0.0)
        return feats_inst, bins

    # ---- stage A: preprocess+binning+pack (fwd only)
    def bodyA(c, params):
        p = params.replace(xyz=params.xyz + c * 1e-9)
        feats, bins = front(p)
        return jnp.sum(feats[:, 0]) * 1e-30

    timed_loop(bodyA, jnp.float32(0), "stage_pre_bin_pack_fwd",
               args=(model.params,))

    # ---- stage A2: preprocess+pack fwd+bwd (includes the cap-sized
    # instance-gather backward = scatter-add to Gaussians)
    def bodyA2(c, params):
        def lf(p):
            feats, _ = front(p)
            return jnp.sum(feats * 1e-6)

        g = jax.grad(lambda p: lf(p.replace(xyz=p.xyz + c * 1e-9)))(params)
        return jnp.sum(g.xyz) * 1e-30

    timed_loop(bodyA2, jnp.float32(0), "stage_pre_bin_pack_fwd_bwd",
               args=(model.params,))

    feats_inst, bins = jax.jit(front)(model.params)
    feats_inst = jax.device_put(feats_inst)
    n_inst = int(bins.n_instances)
    emit("scene", n_instances=n_inst, cap=CAP)

    cfg = BlendConfig(tile_h=tile_h, tile_w=tile_w, buffer_len=4,
                      render_geo=True, depth_only=False)

    def blend_fwd(feats, bins):
        return blend_pallas.blend_packed(
            feats, bins, Wp, Hp, cam.fx, cam.fy, cam.cx, cam.cy, cfg)

    # ---- stage B: blend forward (pallas)
    def bodyB(c, feats_inst, bins):
        out = blend_fwd(feats_inst.at[0, 0].add(c * 1e-9), bins)
        return jnp.sum(out.color) * 1e-30

    timed_loop(bodyB, jnp.float32(0), "stage_blend_fwd",
               args=(feats_inst, bins))

    # ---- stage C: blend fwd+bwd
    def bodyC(c, feats_inst, bins):
        f = feats_inst.at[0, 0].add(c * 1e-9)

        def lf(f):
            out = blend_fwd(f, bins)
            return (jnp.sum(out.color) + jnp.sum(out.normal)
                    + jnp.sum(out.final_t) + jnp.sum(out.buf_depth)
                    + jnp.sum(out.buf_weight))

        g = jax.grad(lf)(f)
        return jnp.sum(g[:, 0]) * 1e-30

    timed_loop(bodyC, jnp.float32(0), "stage_blend_fwd_bwd",
               args=(feats_inst, bins))

    # ---- epilogue: needs blend outputs as inputs
    blend_out = jax.jit(blend_fwd)(feats_inst, bins)
    blend_out = jax.tree.map(jax.device_put, blend_out)
    crop = BlendOutputs(
        color=blend_out.color[:H, :W], normal=blend_out.normal[:H, :W],
        final_t=blend_out.final_t[:H, :W],
        n_contrib=blend_out.n_contrib[:H, :W],
        buf_depth=blend_out.buf_depth[:H, :W],
        buf_weight=blend_out.buf_weight[:H, :W],
        buf_contrib=blend_out.buf_contrib[:H, :W])
    crop = jax.tree.map(jax.device_put, crop)
    src = SourceViews(
        images=jnp.asarray(rng.random((S, H, W, 3)), jnp.float32),
        depths=jnp.full((S, H, W), 3.0, jnp.float32),
        ref_to_src=jnp.tile(jnp.eye(4)[None], (S, 1, 1)),
        cam_pos=jnp.asarray(rng.random((S, 3)) * 0.1, jnp.float32),
        count=jnp.int32(S))

    # ---- stage D: epilogue fwd
    def bodyD(c, crop, src):
        b2 = crop.replace(buf_depth=crop.buf_depth + c * 1e-9)
        ibr = ibr_epilogue(b2, cam, src, 0.01)
        return (jnp.sum(ibr.warped_image) + jnp.sum(ibr.median_depth)) * 1e-30

    timed_loop(bodyD, jnp.float32(0), "stage_epilogue_fwd", args=(crop, src))

    # ---- stage E: epilogue fwd+bwd (grads to buf_depth/buf_weight)
    def bodyE(c, crop, src):
        def lf(bd, bw):
            b2 = crop.replace(buf_depth=bd, buf_weight=bw)
            ibr = ibr_epilogue(b2, cam, src, 0.01)
            return jnp.sum(ibr.warped_image) + jnp.sum(ibr.median_depth)

        g1, g2 = jax.grad(lf, argnums=(0, 1))(
            crop.buf_depth + c * 1e-9, crop.buf_weight)
        return (jnp.sum(g1) + jnp.sum(g2)) * 1e-30

    timed_loop(bodyE, jnp.float32(0), "stage_epilogue_fwd_bwd",
               args=(crop, src))


def main():
    emit("device", dev=str(jax.devices()[0]), backend=jax.default_backend())
    which = os.environ.get("PROBE_ONLY", "all")
    if which in ("all", "gather"):
        gather_probes()
    if which in ("all", "stage"):
        stage_probes()
    emit("done")


if __name__ == "__main__":
    main()
