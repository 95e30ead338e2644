"""Pallas TPU kernels for the sequential alpha-blend stage.

TPU-first design (NOT a translation of the CUDA kernels):

  * Tiles default to 16x16 = 256 pixels (reference BLOCK_X/BLOCK_Y) on the
    vector-lane axis.  Per step the kernel processes KI=128 depth-ordered
    instances *simultaneously* as the sublane axis of (128, 256) vregs: the
    serial CUDA loop becomes masked prefix products (transmittance), prefix
    sums (buffer ranks) and slot-vectorised "last-writer-wins" selections
    for the median buffer.
  * Instance attributes are packed as one (16, cap_pad) f32 array in HBM and
    DMA'd per CHUNK-instance slab into VMEM (double-buffered); tile ranges
    arrive via scalar prefetch.  The chunk loop early-exits once every pixel
    saturates, draining any in-flight prefetch (an un-awaited DMA desyncs
    the next grid step's semaphores — async device abort).
  * The whole median-buffer block (plane depth, rank scan, scatter) is
    sized to the *actual* buffer_len (not the compiled max of 8) and gated
    behind a pushes-still-possible test — during the long post-median alpha
    tail (T<0.5 everywhere, below buffer full) it costs nothing.
  * The backward kernel re-walks the instances FORWARD (no T-division like
    reference backward.cu:653): the suffix sums of the alpha recursion are
    `total - inclusive_prefix`, with the totals recovered from the saved
    forward outputs, so one forward sweep suffices.
  * Per-instance gradients land in disjoint rows of a (cap_pad, 16) array —
    tile ranges partition the instance list, so there are no races and no
    atomics; the gather that produced the instances turns these rows into
    deterministic per-Gaussian segment sums under autodiff.  Both the
    instance reads and the gradient read-modify-writes are double-buffered
    DMA pipelines.

Forward semantics are validated against the pure-JAX oracle
(blend_oracle.py), which replicates reference forward.cu:305-665 exactly.
Two deliberate gradient deviations from reference backward.cu (documented,
both mathematically exact where CUDA approximates):
  * alpha gradients are gated when the 0.99 alpha clamp saturates;
  * median-buffer gradients route to the exact buffer-entry instances
    instead of being smeared over the [low, high] contributor window.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ibgs_tpu.ops import blend_common as bc
from ibgs_tpu.ops.blend_common import BlendConfig, BlendOutputs, Instances

NPIX = 128          # default pixels/tile; kernels use cfg.tile_h*cfg.tile_w
#                     (must be a multiple of the 128-lane vreg width)
import os as _os
KI = int(_os.environ.get("IBGS_KI", 128))
#                     instances per vector step (sublane axis); at
#                     tile 16x16 (NP=256) KI=128/CHUNK=128 measures 29/61 ms
#                     fwd/fwd+bwd vs 51/94 for KI=32/CHUNK=256 (v5e, 1.37M
#                     instances) — wider vregs amortize op overhead and the
#                     finer chunk granularity halves range-rounding waste
CHUNK = int(_os.environ.get("IBGS_CHUNK", 128))
#                     instances DMA'd from HBM per step (env overrides are
#                     for kernel-tuning experiments; both must divide caps)
CF = 16             # packed feature channels

# feature channel layout
FX, FY, FCA, FCB, FCC, FOP, FR, FG, FB, FNX, FNY, FNZ, FD, FAX, FAY, FPAD = range(16)


# --------------------------------------------------------------------------
# sublane-axis scans (KI is tiny and static → log-step roll + mask)
# --------------------------------------------------------------------------

def _sub_iota(n, m=NPIX, dtype=jnp.int32):
    return lax.broadcasted_iota(dtype, (n, m), 0)


def _cumsum_sub(x):
    n = x.shape[0]
    i = _sub_iota(n, x.shape[1])
    s = 1
    while s < n:
        r = pltpu.roll(x, s, axis=0)
        x = x + jnp.where(i >= s, r, jnp.zeros_like(x))
        s *= 2
    return x


def _cumprod_sub(x):
    n = x.shape[0]
    i = _sub_iota(n, x.shape[1])
    s = 1
    while s < n:
        r = pltpu.roll(x, s, axis=0)
        x = x * jnp.where(i >= s, r, jnp.ones_like(x))
        s *= 2
    return x


def _shift_down(x, fill):
    """exclusive shift: row k gets row k-1, row 0 gets `fill`."""
    r = pltpu.roll(x, 1, axis=0)
    return jnp.where(_sub_iota(x.shape[0], x.shape[1]) >= 1, r,
                     jnp.full_like(x, fill))


def _last_row(x):
    """(K, N) → (1, N) last row in a canonical layout (a plain [K-1:K]
    slice keeps a sublane-offset layout that Mosaic refuses to merge
    across lax.cond branches)."""
    n = x.shape[0]
    sel = (_sub_iota(n, x.shape[1]) == n - 1).astype(x.dtype)
    return jnp.sum(x * sel, axis=0, keepdims=True)


# --------------------------------------------------------------------------
# shared per-substep math
# --------------------------------------------------------------------------

def _pixel_coords(cfg: BlendConfig, tiles_x: int, t, scal_ref):
    fx, fy, cx, cy = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    lane = lax.broadcasted_iota(jnp.int32, (1, cfg.tile_h * cfg.tile_w), 1)
    tile_x = t % tiles_x
    tile_y = t // tiles_x
    px = (tile_x * cfg.tile_w + lane % cfg.tile_w).astype(jnp.float32)
    py = (tile_y * cfg.tile_h + lane // cfg.tile_w).astype(jnp.float32)
    py = py + scal_ref[4]      # viewport row offset (global pixel coords)
    rayx = (px - cx) / fx
    rayy = (py - cy) / fy
    return px, py, rayx, rayy


def _alpha_terms(fv, j, px, py):
    """Evaluate KI instances (rows j..j+KI of the VMEM chunk) at all pixels."""
    def col(c):
        return fv[pl.ds(j, KI), c:c + 1]           # (KI, 1)

    dx = col(FX) - px                               # (KI, NPIX)
    dy = col(FY) - py
    power = (-0.5 * (col(FCA) * dx * dx + col(FCC) * dy * dy)
             - col(FCB) * dx * dy)
    # exp of the CLAMPED power: an f32-indefinite conic (det = a*c - b^2
    # cancels to <= 0 on extreme-anisotropy needles) makes power > 0 at
    # some pixels; exp(+huge) = inf there turns every mask-multiply in the
    # hand-written backward into 0 * inf = NaN, and the pack-bwd cumsum
    # spreads that to EVERY Gaussian's gradient (prod-run collapse at
    # iter ~1800, 960x544).  Forward-identical: ok excludes power > 0
    # (reference forward.cu's `if (power > 0) continue;`).
    g = jnp.exp(jnp.minimum(power, 0.0))
    raw = col(FOP) * g
    alpha = jnp.minimum(bc.ALPHA_CLAMP, raw)
    ok = (power <= 0.0) & (alpha >= bc.ALPHA_MIN)
    return col, dx, dy, g, raw, alpha, ok


def _plane_depth(col, rayx, rayy):
    denom = col(FNX) * rayx + col(FNY) * rayy + col(FNZ) + bc.PLANE_EPS
    return -col(FD) / denom, denom


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(cfg: BlendConfig, tiles_x: int,
                start_ref, stop_ref, scal_ref,
                feats_hbm,
                color_o, normal_o, t_o, nc_o, bd_o, bw_o, bcN_o,
                fv2, fv, selR, tnR, bdR, bwR, bcR, incR, sem2):
    B = cfg.buffer_len
    NP = cfg.tile_h * cfg.tile_w
    t = pl.program_id(0)
    start = start_ref[t]
    stop = stop_ref[t]
    px, py, rayx, rayy = _pixel_coords(cfg, tiles_x, t, scal_ref)
    geo = cfg.render_geo or cfg.depth_only

    # windows aligned down to CHUNK so the lane-dim DMA slice stays aligned;
    # pre-start rows are masked out below.
    s_al = lax.div(start, CHUNK) * CHUNK
    nchunk = lax.div(stop - s_al + CHUNK - 1, CHUNK)

    def dma(w, slot):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(s_al + w * CHUNK, CHUNK)],
            fv2.at[slot], sem2.at[slot])

    @pl.when(nchunk > 0)
    def _():
        dma(0, 0).start()

    def chunk_cond(st):
        return (st[0] < nchunk) & (jnp.min(st[2]) < 1.0)

    def chunk_body(st):
        (c, T, done, C3, N3, bd, bw, bcN, bptr, blw, last) = st
        s = s_al + c * CHUNK
        slot = c % 2

        @pl.when(c + 1 < nchunk)
        def _():
            dma(c + 1, (c + 1) % 2).start()

        dma(c, slot).wait()
        fv[:, :] = jnp.transpose(fv2[slot], (1, 0))   # (CHUNK, CF)

        def sub(si, sst):
            (T, done, C3, N3, bd, bw, bcN, bptr, blw, last) = sst
            j = si * KI
            col, dx, dy, g, raw, alpha, ok = _alpha_terms(fv, j, px, py)
            gidx = s + j + _sub_iota(KI, NP)
            pos = gidx - start + 1
            ok = ok & (gidx >= start) & (gidx < stop) & (done < 1.0)

            a_ok = jnp.where(ok, alpha, 0.0)
            cum = _cumprod_sub(1.0 - a_ok)
            Ti = T * _shift_down(cum, 1.0)
            crossing = ok & (Ti * (1.0 - alpha) < bc.T_STOP)
            crs = crossing.astype(jnp.float32)
            # fast path: no transmittance crossing in this substep (common)
            selR[:, :] = ok.astype(jnp.float32)
            tnR[:, :] = T * _last_row(cum)

            @pl.when(jnp.max(crs) > 0.0)
            def _():
                prior = (_cumsum_sub(crs) - crs) > 0.0
                ctr = ok & (~crossing) & (~prior)
                selR[:, :] = ctr.astype(jnp.float32)
                tnR[:, :] = T * _last_row(_cumprod_sub(
                    jnp.where(ctr, 1.0 - alpha, 1.0)))

            contrib = selR[:, :] > 0.0
            T_next = tnR[:, :]

            if geo and not cfg.depth_only:
                # During the post-median alpha tail NO buffer pushes are
                # possible (before-entries need Ti > 0.5 which only
                # decreases; below-entries need a free slot), so the depth
                # math, rank scan and scatter are all gated out — the tail
                # from T=0.5 down to the 1e-4 stop is the long part of a
                # tile's instance range.
                a_t = jnp.where(contrib, alpha * Ti, 0.0)
                bdR[:, :] = bd
                bwR[:, :] = bw
                bcR[:, :] = bcN
                incR[:, :] = jnp.zeros((2, NP), jnp.int32)
                can_push = (jnp.max(Ti) > 0.5) | (
                    jnp.min(blw) < cfg.below_cap)

                @pl.when(can_push)
                def _():
                    depth_i, _den = _plane_depth(col, rayx, rayy)
                    hd = contrib & (depth_i > 0.0)
                    pb = hd & (Ti > 0.5)
                    cand = hd & (Ti <= 0.5)
                    pbf = pb.astype(jnp.float32)
                    cdf = cand.astype(jnp.float32)
                    # both buffer ranks from ONE packed scan: counts <= KI
                    # < 1024 so nb + 1024*nl stays integer-exact in f32
                    # (< 2^24) and a power-of-two scale/floor splits it back
                    comb = _cumsum_sub(pbf + 1024.0 * cdf)
                    nl = jnp.floor(comb * (1.0 / 1024.0))
                    nb = comb - 1024.0 * nl
                    rank_b = bptr + (nb - pbf).astype(jnp.int32)
                    rank_l = blw + (nl - cdf).astype(jnp.int32)
                    pl_ok = cand & (rank_l < cfg.below_cap)
                    push = pb | pl_ok
                    incR[0:1, :] = jnp.sum(pb.astype(jnp.int32), axis=0,
                                           keepdims=True)
                    incR[1:2, :] = jnp.sum(pl_ok.astype(jnp.int32), axis=0,
                                           keepdims=True)

                    # buffer scatter: last-writer-wins per slot, skipped
                    # when this substep pushes nothing
                    @pl.when(jnp.max(push.astype(jnp.float32)) > 0.0)
                    def _():
                        slot = jnp.where(pb, rank_b % cfg.before_cap,
                                         cfg.before_cap + rank_l)
                        slotB = lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0)
                        eq = (slot[None] == slotB) & push[None]  # (B,KI,NPIX)
                        idxm = jnp.where(eq, _sub_iota(KI, NP)[None], -1)
                        win = jnp.max(idxm, axis=1)              # (B, NPIX)
                        oh = ((idxm == win[:, None, :]) & eq).astype(
                            jnp.float32)
                        has = win >= 0
                        bdR[:, :] = jnp.where(
                            has, jnp.sum(depth_i[None] * oh, axis=1), bd)
                        bwR[:, :] = jnp.where(
                            has, jnp.sum(a_t[None] * oh, axis=1), bw)
                        bcR[:, :] = jnp.where(
                            has,
                            jnp.sum(pos[None].astype(jnp.float32) * oh,
                                    axis=1).astype(jnp.int32),
                            bcN)

                bd = bdR[:, :]
                bw = bwR[:, :]
                bcN = bcR[:, :]
                bptr = bptr + incR[0:1, :]
                blw = blw + incR[1:2, :]
            elif geo:
                depth_i, _den = _plane_depth(col, rayx, rayy)
                hd = contrib & (depth_i > 0.0)
                pb = hd & (Ti > 0.5)
                cand = hd & (Ti <= 0.5)
                pbf = pb.astype(jnp.float32)
                cdf = cand.astype(jnp.float32)
                # both buffer ranks from ONE packed scan: counts <= KI < 1024
                # so nb + 1024*nl stays integer-exact in f32 (< 2^24) and a
                # power-of-two scale/floor splits it back — saves a full
                # 7-step sublane scan per substep
                comb = _cumsum_sub(pbf + 1024.0 * cdf)
                nl = jnp.floor(comb * (1.0 / 1024.0))
                nb = comb - 1024.0 * nl
                rank_b = bptr + (nb - pbf).astype(jnp.int32)
                rank_l = blw + (nl - cdf).astype(jnp.int32)
                pl_ok = cand & (rank_l < cfg.below_cap)
                if cfg.depth_only:
                    # inclusive cut once the below-buffer fills
                    # (forward.cu:484-488); the filling instance still counts.
                    plf = pl_ok.astype(jnp.float32)
                    acc = blw + _cumsum_sub(plf).astype(jnp.int32)
                    fill = hd & (acc >= cfg.below_cap)
                    ff = fill.astype(jnp.float32)
                    prior_fill = (_cumsum_sub(ff) - ff) > 0.0
                    contrib = contrib & (~prior_fill)
                    pb = pb & (~prior_fill)
                    pl_ok = pl_ok & (~prior_fill)
                    done = jnp.maximum(done, jnp.max(ff, axis=0, keepdims=True))
                    # the fill cut narrows contrib → recompute the carry T
                    T_next = T * _last_row(_cumprod_sub(
                        jnp.where(contrib, 1.0 - alpha, 1.0)))
                a_t = jnp.where(contrib, alpha * Ti, 0.0)
                push = pb | pl_ok
                # buffer scatter: last-writer-wins per slot, skipped when
                # this substep pushes nothing (the common post-median tail)
                bdR[:, :] = bd
                bwR[:, :] = bw
                bcR[:, :] = bcN

                @pl.when(jnp.max(push.astype(jnp.float32)) > 0.0)
                def _():
                    slot = jnp.where(pb, rank_b % cfg.before_cap,
                                     cfg.before_cap + rank_l)
                    slotB = lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0)
                    eq = (slot[None] == slotB) & push[None]     # (B,KI,NPIX)
                    idxm = jnp.where(eq, _sub_iota(KI, NP)[None], -1)
                    win = jnp.max(idxm, axis=1)                 # (B, NPIX)
                    oh = ((idxm == win[:, None, :]) & eq).astype(jnp.float32)
                    has = win >= 0
                    bdR[:, :] = jnp.where(
                        has, jnp.sum(depth_i[None] * oh, axis=1), bd)
                    bwR[:, :] = jnp.where(
                        has, jnp.sum(a_t[None] * oh, axis=1), bw)
                    bcR[:, :] = jnp.where(
                        has,
                        jnp.sum(pos[None].astype(jnp.float32) * oh,
                                axis=1).astype(jnp.int32),
                        bcN)

                bd = bdR[:, :]
                bw = bwR[:, :]
                bcN = bcR[:, :]
                bptr = bptr + jnp.sum(pb.astype(jnp.int32), axis=0, keepdims=True)
                blw = blw + jnp.sum(pl_ok.astype(jnp.int32), axis=0, keepdims=True)
            else:
                a_t = jnp.where(contrib, alpha * Ti, 0.0)

            if not cfg.depth_only:
                C3 = C3 + jnp.concatenate(
                    [jnp.sum(col(FR) * a_t, axis=0, keepdims=True),
                     jnp.sum(col(FG) * a_t, axis=0, keepdims=True),
                     jnp.sum(col(FB) * a_t, axis=0, keepdims=True)], axis=0)
                if cfg.render_geo:
                    N3 = N3 + jnp.concatenate(
                        [jnp.sum(col(FNX) * a_t, axis=0, keepdims=True),
                         jnp.sum(col(FNY) * a_t, axis=0, keepdims=True),
                         jnp.sum(col(FNZ) * a_t, axis=0, keepdims=True)], axis=0)

            T = T_next
            last = jnp.maximum(
                last, jnp.max(jnp.where(contrib, pos, 0), axis=0, keepdims=True))
            done = jnp.maximum(done, jnp.max(crs, axis=0, keepdims=True))
            return (T, done, C3, N3, bd, bw, bcN, bptr, blw, last)

        sst = (T, done, C3, N3, bd, bw, bcN, bptr, blw, last)
        sst = lax.fori_loop(0, CHUNK // KI, sub, sst)
        return (c + 1,) + sst

    z1 = jnp.zeros((1, NP), jnp.float32)
    z3 = jnp.zeros((3, NP), jnp.float32)
    zB = jnp.zeros((B, NP), jnp.float32)
    i1 = jnp.zeros((1, NP), jnp.int32)
    st = (jnp.int32(0), jnp.ones((1, NP), jnp.float32), z1, z3, z3,
          zB, zB, jnp.zeros((B, NP), jnp.int32), i1, i1, i1)
    st = lax.while_loop(chunk_cond, chunk_body, st)
    (_c, T, _done, C3, N3, bd, bw, bcN, _bp, _bl, last) = st

    # The saturation early-exit can leave the NEXT chunk's prefetch DMA in
    # flight; an un-awaited DMA signals its semaphore into the following
    # grid step, desynchronising that tile's double buffer (observed as
    # async device aborts in forward-only programs: eval renders, the
    # depth-cache rebuild, and the iter-1000 eval of a training run —
    # always ~one fetch after the first saturating scene).  Drain it.
    @pl.when(_c < nchunk)
    def _():
        dma(_c, _c % 2).wait()

    color_o[0] = C3
    normal_o[0] = N3
    t_o[0] = T
    nc_o[0] = last
    bd_o[0] = bd
    bw_o[0] = bw
    bcN_o[0] = bcN


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(cfg: BlendConfig, tiles_x: int,
                start_ref, stop_ref, scal_ref,
                feats_hbm,
                color_s, normal_s, t_s, nc_s, bw_s, bcN_s,
                dLc_i, dLn_i, dLt_i, dLbd_i, dLbw_i,
                _dzero,
                dfeats_hbm,
                fv2, fv, gv, acc2, extraR, ddR, qleR, sem2, rsem, osem):
    NP = cfg.tile_h * cfg.tile_w
    t = pl.program_id(0)
    start = start_ref[t]
    stop = stop_ref[t]
    px, py, rayx, rayy = _pixel_coords(cfg, tiles_x, t, scal_ref)
    geo = cfg.render_geo

    dLc = dLc_i[0]                                  # (3, NPIX)
    dLt = dLt_i[0]                                  # (1, NPIX)
    Tf = t_s[0]
    ncontrib = nc_s[0]
    TOTcn = jnp.sum(color_s[0] * dLc, axis=0, keepdims=True)
    if geo:
        dLn = dLn_i[0]
        TOTcn = TOTcn + jnp.sum(normal_s[0] * dLn, axis=0, keepdims=True)
        bcN = bcN_s[0]                              # (B, NPIX) int32
        gS = dLbw_i[0] * bw_s[0]                    # (B, NPIX)
        dLbd = dLbd_i[0]
        TOTQ = jnp.sum(gS, axis=0, keepdims=True)

    s_al = lax.div(start, CHUNK) * CHUNK
    # instances past the last contributor of every pixel have contrib==False
    # and produce zero grads — bound the chunk walk like the forward's
    # saturation early-exit (ncontrib is the saved forward n_contrib)
    stop_eff = jnp.minimum(stop, start + jnp.max(ncontrib))
    nchunk = jnp.maximum(lax.div(stop_eff - s_al + CHUNK - 1, CHUNK), 0)

    def fv_dma(w, slot):
        return pltpu.make_async_copy(
            feats_hbm.at[:, pl.ds(s_al + w * CHUNK, CHUNK)],
            fv2.at[slot], sem2.at[slot])

    def out_cp(w, slot):
        return pltpu.make_async_copy(
            acc2.at[slot],
            dfeats_hbm.at[:, pl.ds(s_al + w * CHUNK, CHUNK)],
            osem.at[slot])

    @pl.when(nchunk > 0)
    def _():
        fv_dma(0, 0).start()

    def chunk_body(c, st):
        s = s_al + c * CHUNK
        slot = c % 2

        # the gradient slab for this slot was last written for chunk c-2;
        # its RMW buffer must be free before we re-read into it.
        @pl.when(c >= 2)
        def _():
            out_cp(c - 2, slot).wait()

        rd = pltpu.make_async_copy(
            dfeats_hbm.at[:, pl.ds(s, CHUNK)], acc2.at[slot], rsem.at[slot])
        rd.start()

        @pl.when(c + 1 < nchunk)
        def _():
            fv_dma(c + 1, (c + 1) % 2).start()

        fv_dma(c, slot).wait()
        fv[:, :] = jnp.transpose(fv2[slot], (1, 0))   # (CHUNK, CF)

        def sub(si, sst):
            (T, Pc, Qle) = sst
            j = si * KI
            col, dx, dy, g, raw, alpha, ok = _alpha_terms(fv, j, px, py)
            gidx = s + j + _sub_iota(KI, NP)
            pos = gidx - start + 1
            contrib = (ok & (gidx >= start) & (gidx < stop)
                       & (pos <= ncontrib))

            a_c = jnp.where(contrib, alpha, 0.0)
            cum = _cumprod_sub(1.0 - a_c)
            Ti = T * _shift_down(cum, 1.0)
            w = jnp.where(contrib, alpha * Ti, 0.0)
            om_a = 1.0 - a_c                        # >= 0.01

            cdl = (col(FR) * dLc[0:1] + col(FG) * dLc[1:2]
                   + col(FB) * dLc[2:3])
            # the colour and normal suffix terms only ever enter dLa as a
            # SUM: one combined scan + one combined prefix carry replaces
            # two (the 7-step sublane scan is the substep's priciest block)
            if geo:
                ndl = (col(FNX) * dLn[0:1] + col(FNY) * dLn[1:2]
                       + col(FNZ) * dLn[2:3])
                cndl = cdl + ndl
            else:
                ndl = None
                cndl = cdl
            wc = w * cndl
            suff_c = TOTcn - (Pc + _cumsum_sub(wc))
            dLa = cndl * Ti - suff_c / om_a + dLt * (-Tf / om_a)
            Pc = Pc + jnp.sum(wc, axis=0, keepdims=True)

            if geo:
                pmin = s + j - start + 1
                hit = (bcN >= pmin) & (bcN <= pmin + (KI - 1))
                # default: no buffer slot touches this substep (common)
                extraR[:, :] = -(TOTQ - Qle) / om_a
                ddR[:, :] = jnp.zeros((KI, NP), jnp.float32)
                qleR[:, :] = Qle

                @pl.when(jnp.max(hit.astype(jnp.int32)) > 0)
                def _():
                    eq = (bcN[:, None, :] == pos[None]).astype(jnp.float32)
                    dd = jnp.sum(eq * dLbd[:, None, :], axis=0)   # (KI, NPIX)
                    gw = jnp.sum(eq * dLbw_i[0][:, None, :], axis=0)
                    gq = jnp.sum(eq * gS[:, None, :], axis=0)
                    extraR[:, :] = (gw * Ti
                                    - (TOTQ - (Qle + _cumsum_sub(gq))) / om_a)
                    ddR[:, :] = dd
                    qleR[:, :] = Qle + jnp.sum(gq, axis=0, keepdims=True)

                dLa = dLa + extraR[:, :]
                Qle = qleR[:, :]
                dd = ddR[:, :]
                _depth, denom = _plane_depth(col, rayx, rayy)
                inv_den = 1.0 / denom
                d_dist = dd * (-inv_den)
                coef = dd * col(FD) * inv_den * inv_den
                d_nx, d_ny, d_nz = coef * rayx, coef * rayy, coef
            else:
                d_dist = jnp.zeros_like(w)
                d_nx = d_ny = d_nz = d_dist

            dLa = jnp.where(contrib, dLa, 0.0)
            live = (raw < bc.ALPHA_CLAMP).astype(jnp.float32)
            gg = g * col(FOP) * dLa * live
            dmx = -(col(FCA) * dx + col(FCB) * dy) * gg
            dmy = -(col(FCC) * dy + col(FCB) * dx) * gg

            def red(x):
                return jnp.sum(x, axis=1, keepdims=True)        # (KI, 1)

            if geo:
                gn0 = red(w * dLn[0:1] + d_nx)
                gn1 = red(w * dLn[1:2] + d_ny)
                gn2 = red(w * dLn[2:3] + d_nz)
            else:
                gn0, gn1, gn2 = red(d_nx), red(d_ny), red(d_nz)
            grow = jnp.concatenate(
                [red(dmx), red(dmy),
                 red(-0.5 * dx * dx * gg), red(-dx * dy * gg),
                 red(-0.5 * dy * dy * gg),
                 red(g * dLa * live),
                 red(w * dLc[0:1]), red(w * dLc[1:2]), red(w * dLc[2:3]),
                 gn0, gn1, gn2,
                 red(d_dist),
                 red(jnp.abs(dmx)), red(jnp.abs(dmy)),
                 jnp.zeros((KI, 1), jnp.float32)],
                axis=1,
            )
            gv[pl.ds(j, KI), :] = grow

            T = T * _last_row(cum)
            return (T, Pc, Qle)

        sst = lax.fori_loop(0, CHUNK // KI, sub, st)
        rd.wait()
        acc2[slot] = acc2[slot] + jnp.transpose(gv[:, :CF], (1, 0))
        out_cp(c, slot).start()
        return sst

    z1 = jnp.zeros((1, NP), jnp.float32)
    lax.fori_loop(0, nchunk,
                  chunk_body,
                  (jnp.ones((1, NP), jnp.float32), z1, z1))

    # drain the write pipeline before the next tile may RMW these regions
    @pl.when(nchunk >= 1)
    def _():
        out_cp(nchunk - 1, (nchunk - 1) % 2).wait()

    @pl.when(nchunk >= 2)
    def _():
        out_cp(nchunk - 2, (nchunk - 2) % 2).wait()


# --------------------------------------------------------------------------
# pallas_call plumbing + custom_vjp
# --------------------------------------------------------------------------

def _tile_block(ch, npix):
    return pl.BlockSpec((1, ch, npix), lambda t, *_: (t, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(static, feats, tile_start, tile_stop, scal):
    cfg, tiles_x, tiles_y, cap_pad, interpret = static
    B = cfg.buffer_len
    NP = cfg.tile_h * cfg.tile_w
    num_tiles = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[_tile_block(3, NP), _tile_block(3, NP), _tile_block(1, NP),
                   _tile_block(1, NP), _tile_block(B, NP), _tile_block(B, NP),
                   _tile_block(B, NP)],
        scratch_shapes=[pltpu.VMEM((2, CF, CHUNK), jnp.float32),
                        pltpu.VMEM((CHUNK, CF), jnp.float32),
                        pltpu.VMEM((KI, NP), jnp.float32),
                        pltpu.VMEM((1, NP), jnp.float32),
                        pltpu.VMEM((B, NP), jnp.float32),
                        pltpu.VMEM((B, NP), jnp.float32),
                        pltpu.VMEM((B, NP), jnp.int32),
                        pltpu.VMEM((2, NP), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    f32, i32 = jnp.float32, jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((num_tiles, 3, NP), f32),       # color
        jax.ShapeDtypeStruct((num_tiles, 3, NP), f32),       # normal
        jax.ShapeDtypeStruct((num_tiles, 1, NP), f32),       # final T
        jax.ShapeDtypeStruct((num_tiles, 1, NP), i32),       # n_contrib
        jax.ShapeDtypeStruct((num_tiles, B, NP), f32),       # buf depth
        jax.ShapeDtypeStruct((num_tiles, B, NP), f32),       # buf weight
        jax.ShapeDtypeStruct((num_tiles, B, NP), i32),       # buf contrib
    ]
    return tuple(pl.pallas_call(
        functools.partial(_fwd_kernel, cfg, tiles_x),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_start, tile_stop, scal, feats))


def _bwd_call(static, feats, tile_start, tile_stop, scal, saved, cts):
    cfg, tiles_x, tiles_y, cap_pad, interpret = static
    B = cfg.buffer_len
    num_tiles = tiles_x * tiles_y
    NP = cfg.tile_h * cfg.tile_w
    color_s, normal_s, t_s, nc_s, _bd_s, bw_s, bcN_s = saved
    dLc, dLn, dLt, dLbd, dLbw = cts
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  _tile_block(3, NP), _tile_block(3, NP), _tile_block(1, NP),
                  _tile_block(1, NP), _tile_block(B, NP), _tile_block(B, NP),
                  _tile_block(3, NP), _tile_block(3, NP), _tile_block(1, NP),
                  _tile_block(B, NP), _tile_block(B, NP),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM((2, CF, CHUNK), jnp.float32),
                        pltpu.VMEM((CHUNK, CF), jnp.float32),
                        pltpu.VMEM((CHUNK, CF), jnp.float32),
                        pltpu.VMEM((2, CF, CHUNK), jnp.float32),
                        pltpu.VMEM((KI, NP), jnp.float32),
                        pltpu.VMEM((KI, NP), jnp.float32),
                        pltpu.VMEM((1, NP), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    (dfeats,) = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, tiles_x),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((CF, cap_pad), jnp.float32)],
        interpret=interpret,
        input_output_aliases={15: 0},   # zero-init buffer → accumulated out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_stop, scal, feats,
      color_s, normal_s, t_s, nc_s, bw_s, bcN_s,
      dLc, dLn, dLt, dLbd, dLbw,
      jnp.zeros((CF, cap_pad), jnp.float32))
    return dfeats


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend_core(static, feats, tile_start, tile_stop, scal):
    return _fwd_call(static, feats, tile_start, tile_stop, scal)


def _blend_fwd_rule(static, feats, tile_start, tile_stop, scal):
    outs = _fwd_call(static, feats, tile_start, tile_stop, scal)
    return outs, (feats, tile_start, tile_stop, scal, outs)


def _blend_bwd_rule(static, res, cts):
    cfg = static[0]
    cap_pad = static[3]
    feats, tile_start, tile_stop, scal, outs = res
    ct_color, ct_normal, ct_t, _ct_nc, ct_bd, ct_bw, _ct_bc = cts

    def _z(ct, like):
        return jnp.zeros_like(like) if ct is None or isinstance(
            ct, jax.custom_derivatives.SymbolicZero) else ct

    ct_color = _z(ct_color, outs[0])
    ct_normal = _z(ct_normal, outs[1])
    ct_t = _z(ct_t, outs[2])
    ct_bd = _z(ct_bd, outs[4])
    ct_bw = _z(ct_bw, outs[5])
    if cfg.depth_only:
        dfeats = jnp.zeros_like(feats)
    else:
        dfeats = _bwd_call(static, feats, tile_start, tile_stop, scal,
                           outs, (ct_color, ct_normal, ct_t, ct_bd, ct_bw))
        total = tile_stop[-1]
        valid = jnp.arange(cap_pad, dtype=jnp.int32) < total
        dfeats = jnp.where(valid[None, :], dfeats, 0.0)
    return dfeats, None, None, None


_blend_core.defvjp(_blend_fwd_rule, _blend_bwd_rule)


# --------------------------------------------------------------------------
# public wrapper
# --------------------------------------------------------------------------

def blend(inst: Instances, inst_dummy_abs, bins, Wp: int, Hp: int,
          fx, fy, cx, cy, cfg: BlendConfig, row0=0) -> BlendOutputs:
    """Blend from an Instances pytree (convenience wrapper over
    blend_packed)."""
    cap = inst.opacity.shape[0]
    if inst_dummy_abs is None:
        inst_dummy_abs = jnp.zeros((cap, 2), jnp.float32)
    feats_inst = jnp.stack(
        [inst.mean2d[:, 0], inst.mean2d[:, 1],
         inst.conic[:, 0], inst.conic[:, 1], inst.conic[:, 2],
         inst.opacity,
         inst.rgb[:, 0], inst.rgb[:, 1], inst.rgb[:, 2],
         inst.normal[:, 0], inst.normal[:, 1], inst.normal[:, 2],
         inst.dist,
         inst_dummy_abs[:, 0], inst_dummy_abs[:, 1]],
        axis=1)
    return blend_packed(feats_inst, bins, Wp, Hp, fx, fy, cx, cy, cfg,
                        row0=row0)


def _tiles_to_image(x, tiles_y, tiles_x, th, tw):
    """(num_tiles, C, NPIX) → (H', W', C);  (num_tiles, 1, NPIX) → (H', W')."""
    C = x.shape[1]
    out = x.reshape(tiles_y, tiles_x, C, th, tw)
    out = out.transpose(0, 3, 1, 4, 2).reshape(tiles_y * th, tiles_x * tw, C)
    return out[..., 0] if C == 1 else out


def blend_packed(feats_inst, bins, Wp: int, Hp: int,
                 fx, fy, cx, cy, cfg: BlendConfig, row0=0) -> BlendOutputs:
    """Blend from a pre-packed (cap, <=CF) per-instance feature table
    (column layout FX..FAY — see the channel constants above)."""
    if cfg.tile_h * cfg.tile_w % NPIX != 0:
        raise ValueError(
            f"pallas backend requires tile_h*tile_w % {NPIX} == 0 "
            f"(got {cfg.tile_h}x{cfg.tile_w})")
    cap = feats_inst.shape[0]
    cap_pad = (-(-cap // CHUNK) + 1) * CHUNK
    tiles_x = Wp // cfg.tile_w
    tiles_y = Hp // cfg.tile_h

    feats = jnp.pad(feats_inst,
                    ((0, cap_pad - cap), (0, CF - feats_inst.shape[1]))).T
    scal = jnp.stack([fx, fy, cx, cy,
                      jnp.asarray(row0, jnp.float32) * 1.0]).astype(jnp.float32)

    # Interpret (emulate) only on CPU; any accelerator backend (tpu, or the
    # remote-TPU "axon" platform) compiles the real Mosaic kernels.
    static = (cfg, tiles_x, tiles_y, cap_pad,
              jax.default_backend() == "cpu")
    color, normal, T, nc, bd, bw, bcN = _blend_core(
        static, feats, bins.tile_start, bins.tile_stop, scal)

    th, tw = cfg.tile_h, cfg.tile_w
    return BlendOutputs(
        color=_tiles_to_image(color, tiles_y, tiles_x, th, tw),
        normal=_tiles_to_image(normal, tiles_y, tiles_x, th, tw),
        final_t=_tiles_to_image(T, tiles_y, tiles_x, th, tw),
        n_contrib=_tiles_to_image(nc, tiles_y, tiles_x, th, tw),
        buf_depth=_tiles_to_image(bd, tiles_y, tiles_x, th, tw),
        buf_weight=_tiles_to_image(bw, tiles_y, tiles_x, th, tw),
        buf_contrib=_tiles_to_image(bcN, tiles_y, tiles_x, th, tw),
    )
