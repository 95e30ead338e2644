"""Tile binning and depth ordering.

The CUDA reference expands Gaussian→tile instances with a prefix sum +
scatter, then radix-sorts 64-bit [tile|depth] keys with cub
(rasterizer_impl.cu:187-255, 320-515).  The TPU formulation is built
around two facts of the hardware: XLA's sort is fast (HBM-speed) but
cap-sized *gathers* cost ~8 ns/element, so the expansion must avoid
per-instance random access entirely:

  1. Gaussians are depth-sorted once (P elements, cheap).
  2. Instance slots are assigned in depth-rank order by an exclusive
     prefix sum.  The depth rank reaches every slot with one head-scatter
     + `associative_scan(max)` (monotone by construction); the rest of
     the per-slot Gaussian data (tile-rect fields, base offset) follows
     by rank-indexed gathers from P-sized tables — random access into a
     few-hundred-KB table is cache-resident, only CAP-sized random
     gathers carry the ~8 ns/row cost.
  3. ONE stable single-key sort by tile id finishes the ordering: within
     a tile, instances are already depth-ascending, and the stable sort
     preserves the reference's (tile, depth, gaussian-id) tie order.
     Validity needs no payload slot (padding sorts to the end as
     tile == num_tiles).
  4. Tile ranges come from a vectorized binary search over the sorted
     tile ids (tile_ranges_from_sorted).

Limits (asserted): cap < 2^31 instances, num_tiles < 2^31.

The instance list has a static capacity `cap` with a validity mask
(overflow drops the deepest Gaussians; callers read `n_instances` to
detect truncation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ibgs_tpu.ops.preprocess import Splats2D

MAX_CAP = 1 << 31


def _scat(zeros, idx, vals):
    """Head-position scatter feeding the rank cummax.  Head indices are
    unique (strictly increasing offsets for non-empty rows), so scatter-set
    and scatter-max are equivalent; set lowers slightly cheaper (no
    compare pass: 118.8 vs 120.0 ms/step A/B on v5e — the scatter, not
    the cummax, dominates the scan-delivery cost at ~8.6 ns/update).
    IBGS_SCATTER_SET=0 reverts to max for lowering experiments."""
    import os
    if os.environ.get("IBGS_SCATTER_SET", "1") == "1":
        return zeros.at[idx].set(vals, mode="drop")
    return zeros.at[idx].max(vals, mode="drop")


def cummax_i32(x: jnp.ndarray, block: int = 4096) -> jnp.ndarray:
    """Inclusive running max of a 1-D int32 array.

    `lax.associative_scan`'s recursive odd/even decomposition takes
    ~215 s of XLA-TPU compile at 2M elements and 1-D `lax.cummax` 23 s
    (measured, v5e); this two-level formulation — row-wise cummax of a
    (R, block) reshape, then a short scan over row maxima broadcast back —
    compiles in under a second and runs at the same speed."""
    n = x.shape[0]
    if n <= block:
        return lax.cummax(x)
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), jnp.iinfo(x.dtype).min,
                                         x.dtype)])
    x2 = x.reshape(-1, block)
    within = lax.cummax(x2, axis=1)
    row_prefix = lax.cummax(within[:, -1])
    carry = jnp.concatenate(
        [jnp.full((1,), jnp.iinfo(x.dtype).min, x.dtype), row_prefix[:-1]])
    out = jnp.maximum(within, carry[:, None]).reshape(-1)
    return out[:n] if pad else out


def tile_ranges_from_sorted(tile_sorted: jnp.ndarray, num_tiles: int,
                            n_valid) -> tuple:
    """[start, stop) index ranges per tile from a tile-id-sorted instance
    list (ids >= num_tiles mark invalid/padding rows sorted to the end).

    Boundary scatters + a reverse-cummin backfill — the TPU replacement of
    the reference's identifyTileRanges kernel (rasterizer_impl.cu:233-255).
    """
    cap = tile_sorted.shape[0]
    # tile_sorted ascending → start[t] = first index with tile >= t, which
    # is a vectorized binary search (21 probe rounds for cap=2M) instead of
    # a cap-sized boundary scatter + reverse-cummin backfill (18 ms on v5e).
    start = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=tile_sorted.dtype),
        side="left").astype(jnp.int32)
    start = start.at[num_tiles].min(jnp.asarray(n_valid, jnp.int32))
    return start[:num_tiles], start[1:]


@struct.dataclass
class TileBins:
    order: jnp.ndarray       # (P,) gaussian ids in depth order
    rank: jnp.ndarray        # (cap,) depth rank of each sorted instance
    gauss_id: jnp.ndarray    # (cap,) int32 gaussian id (= order[rank])
    tile_id: jnp.ndarray     # (cap,) int32 owning tile per sorted instance
    inst_valid: jnp.ndarray  # (cap,) bool
    tile_start: jnp.ndarray  # (num_tiles,) int32
    tile_stop: jnp.ndarray   # (num_tiles,) int32
    n_instances: jnp.ndarray  # () int32 total (pre-truncation) count
    slot: jnp.ndarray        # (cap,) int32 pre-sort slot of each sorted row
    seg_off: jnp.ndarray     # (P+1,) int32 slot range of depth-rank r =
    #                          [seg_off[r], seg_off[r+1]) — pack_rows bwd
    n_rows: jnp.ndarray = 0  # () int32 staircase row count (0 = AABB path)


def _staircase_row_interval(ca, cb, cc, thr, v_lo, v_hi, tile_w,
                            mx, rx, rw):
    """Kept tile-column interval [lo, lo+w) of one tile ROW.

    Closed-form u-extent of the sublevel set E = {q(u,v) <= thr} within the
    band v in [v_lo, v_hi], where q(u,v) = 0.5(A u^2 + C v^2) + B u v is the
    kernel's Mahalanobis power (u, v relative to the splat mean).  For fixed
    v the u-interval is (-Bv +- sqrt(2A thr - det v^2))/A with
    det = AC - B^2; u_max(v) is concave, maximised at
    v* = -B sqrt(2 thr / (C det)) (where it equals the global ellipse
    extent sqrt(2 thr C / det)), so the band maximum is u_max(clip(v*)),
    and by the (u,v) -> (-u,-v) symmetry the band minimum is
    u_min(clip(-v*)).  A tile column tx survives iff its pixel u-span
    [tx tw - mx, tx tw + tw - 1 - mx] overlaps [u_min, u_max] — a
    NECESSARY condition for the exact per-tile rect-min test
    (rect ∩ E != ∅ implies u-projection overlap), hence conservative:
    every tile the blend kernel's alpha >= 1/255 ok-gate would touch is
    kept.  Degenerate conics (non-PSD numerics) keep the full AABB row.

    Returns (lo, w) int32 tile-column start / width (w may be 0)."""
    thr_m = thr + (1e-3 + 1e-3 * jnp.abs(thr))
    det = ca * cc - cb * cb
    safe = (ca > 0.0) & (cc > 0.0) & (det > 0.0) & (thr_m > 0.0)
    ca_s = jnp.where(safe, ca, 1.0)
    cc_s = jnp.where(safe, cc, 1.0)
    det_s = jnp.where(safe, det, 1.0)
    thr_s = jnp.where(safe, thr_m, 1.0)
    vstar = -cb * jnp.sqrt(2.0 * thr_s / (cc_s * det_s))
    v_at_max = jnp.clip(vstar, v_lo, v_hi)
    v_at_min = jnp.clip(-vstar, v_lo, v_hi)
    disc_max = 2.0 * ca_s * thr_s - det_s * v_at_max * v_at_max
    disc_min = 2.0 * ca_s * thr_s - det_s * v_at_min * v_at_min
    hit = disc_max >= 0.0          # band reaches the ellipse's v-extent
    u_max = (-cb * v_at_max + jnp.sqrt(jnp.maximum(disc_max, 0.0))) / ca_s
    u_min = (-cb * v_at_min - jnp.sqrt(jnp.maximum(disc_min, 0.0))) / ca_s
    # f32 safety: widen so boundary floor/ceil can never drop a tile the
    # kernel's own f32 power evaluation would keep
    u_max = u_max + (1e-3 + 1e-3 * jnp.abs(u_max))
    u_min = u_min - (1e-3 + 1e-3 * jnp.abs(u_min))
    tx_lo_f = jnp.ceil((mx + u_min - (tile_w - 1)) / tile_w)
    tx_hi_f = jnp.floor((mx + u_max) / tile_w)
    big = jnp.float32(1 << 24)
    tx_lo = jnp.clip(tx_lo_f, -1.0, big).astype(jnp.int32)
    tx_hi = jnp.clip(tx_hi_f, -2.0, big).astype(jnp.int32)
    lo = jnp.maximum(tx_lo, rx)
    hi = jnp.minimum(tx_hi, rx + rw - 1)
    w = jnp.where(hit, jnp.maximum(hi - lo + 1, 0), 0)
    lo = jnp.where(safe, lo, rx)
    w = jnp.where(safe, w, rw)
    return lo, w


def _bin_splats_staircase(sp: Splats2D, tiles_x: int, tiles_y: int,
                          cap: int, with_gauss_id: bool,
                          cull_tab: jnp.ndarray, tile_h: int, tile_w: int,
                          row_cap: int) -> TileBins:
    """Two-level scan-propagated expansion: gaussians → tile ROWS → tiles.

    Unlike the post-hoc exact cull (cull_tab retagging below, which leaves
    culled instances occupying expansion slots), the staircase computes the
    per-row kept-tile interval BEFORE slot assignment, so `total` itself —
    and with it every cap-sized sort/gather and the blend kernel's
    sequential walk — shrinks.  Both expansion levels reuse the same
    machinery (exclusive prefix sum → head-scatter + monotone cummax →
    rank-indexed packed row gathers); the per-row interval is closed-form
    (_staircase_row_interval) so no per-instance cull math or widened
    per-instance gather is needed — the rank-row gather is (cap, 3).

    Instance enumeration order (row-major within each gaussian's kept
    staircase, gaussians in depth order) and the downstream tile sort /
    range semantics are identical to the AABB path, so outputs and
    gradients are bit-identical (kept set ⊇ the exact per-tile cull's,
    which is itself output-preserving).  Rows are a second static
    capacity: row_cap (rows ≤ AABB instances; overflow drops the deepest
    gaussians' rows, prefix-truncation semantics like `cap`; callers read
    `n_rows`)."""
    assert cap < MAX_CAP and tiles_x * tiles_y < MAX_CAP
    num_tiles = tiles_x * tiles_y
    P = sp.depth.shape[0]
    n_tiles = lax.stop_gradient(sp.n_tiles)
    depth = lax.stop_gradient(sp.depth)

    order = jnp.argsort(jnp.where(n_tiles > 0, depth, jnp.inf),
                        stable=True).astype(jnp.int32)
    rx_p = sp.rect_min[:, 0].astype(jnp.int32)
    ry_p = sp.rect_min[:, 1].astype(jnp.int32)
    rw_p = jnp.maximum(
        (sp.rect_max[:, 0] - sp.rect_min[:, 0]).astype(jnp.int32), 1)
    rh_p = jnp.where(
        n_tiles > 0,
        (sp.rect_max[:, 1] - sp.rect_min[:, 1]).astype(jnp.int32), 0)
    assert tiles_x < (1 << 10) and tiles_y < (1 << 11)
    pre_cols = jnp.concatenate(
        [jnp.stack([(rx_p << 21) | (ry_p << 10) | rw_p, rh_p], axis=1),
         lax.bitcast_convert_type(lax.stop_gradient(cull_tab), jnp.int32)],
        axis=1)
    pre = pre_cols[order]                       # (P, 8) rank order
    rh = pre[:, 1]
    offs_r = jnp.cumsum(rh) - rh                # exclusive row prefix
    total_rows = offs_r[-1] + rh[-1]

    # level 1: deliver the gaussian depth-rank to every ROW slot
    ranks_p = jnp.arange(P, dtype=jnp.int32)
    head_r = jnp.where(rh > 0, offs_r, row_cap)
    rrank = cummax_i32(
        _scat(jnp.zeros((row_cap,), jnp.int32), head_r, ranks_p))
    rtab = jnp.concatenate(
        [jnp.stack([pre[:, 0], offs_r], axis=1), pre[:, 2:8]], axis=1)
    rrow = rtab[rrank]                          # (row_cap, 8)
    pr = rrow[:, 0]
    rx, ry, rw = pr >> 21, (pr >> 10) & ((1 << 11) - 1), pr & ((1 << 10) - 1)
    cf = lax.bitcast_convert_type(rrow[:, 2:8], jnp.float32)

    rslot = jnp.arange(row_cap, dtype=jnp.int32)
    row_valid = rslot < jnp.minimum(total_rows, row_cap)
    ty = ry + (rslot - rrow[:, 1])
    v_lo = (ty * tile_h).astype(jnp.float32) - cf[:, 1]
    lo, w = _staircase_row_interval(
        cf[:, 2], cf[:, 3], cf[:, 4], cf[:, 5], v_lo, v_lo + (tile_h - 1),
        tile_w, cf[:, 0], rx, rw)
    w = jnp.where(row_valid, w, 0)

    # level 2: rows → tile instances (same machinery, row-sized tables)
    offs2 = jnp.cumsum(w) - w
    total = offs2[-1] + w[-1]
    head2 = jnp.where(w > 0, offs2, cap)
    rowrank = cummax_i32(
        _scat(jnp.zeros((cap,), jnp.int32), head2, rslot))
    # the (row_cap, k)-table gather is the costliest staircase op (the
    # table is NOT cache-resident like P-sized tables — measured ~5.2
    # ns/row at 3 cols vs ~2.6 from a 1 MB table); pack tile0 and the
    # gaussian rank into ONE int32 when their bit widths fit (tile0 <
    # num_tiles, rrank < P — static check), shrinking the row to 2 cols.
    tile0 = ty * tiles_x + lo
    p_bits = max(int(P - 1).bit_length(), 1)
    packed_ok = (num_tiles - 1).bit_length() + p_bits <= 31
    if packed_ok:
        itab = jnp.stack([(tile0 << p_bits) | rrank, offs2], axis=1)
    else:
        itab = jnp.stack([tile0, offs2, rrank], axis=1)
    irow = itab[rowrank]                        # (cap, 2|3)
    inst = jnp.arange(cap, dtype=jnp.int32)
    inst_valid = inst < jnp.minimum(total, cap)
    if packed_ok:
        tile_base = irow[:, 0] >> p_bits
        rank = irow[:, 0] & ((1 << p_bits) - 1)
    else:
        tile_base = irow[:, 0]
        rank = irow[:, 2]
    tile = jnp.where(inst_valid, tile_base + (inst - irow[:, 1]), num_tiles)

    # per-gaussian slot segments for pack_rows bwd: rows of one gaussian
    # are contiguous at level 1 and slots are contiguous within each row,
    # so seg_off[r] = offs2 at the gaussian's first row (clip = the same
    # prefix-truncation semantics as `cap`)
    offs2_ext = jnp.concatenate([offs2, total[None]])
    seg_off = offs2_ext[jnp.clip(
        jnp.concatenate([offs_r, total_rows[None]]), 0, row_cap)]

    tile_sorted, rank_sorted, slot_sorted = lax.sort(
        (tile, rank, inst), num_keys=1)
    valid_sorted = tile_sorted < num_tiles
    start, stop = tile_ranges_from_sorted(tile_sorted, num_tiles,
                                          jnp.minimum(total, cap))
    gauss_id = order[rank_sorted] if with_gauss_id else rank_sorted
    return TileBins(
        order=order,
        rank=rank_sorted,
        gauss_id=gauss_id,
        tile_id=tile_sorted,
        inst_valid=valid_sorted.astype(bool),
        tile_start=start,
        tile_stop=stop,
        n_instances=total,
        slot=slot_sorted,
        seg_off=seg_off.astype(jnp.int32),
        n_rows=total_rows,
    )


def bin_splats(sp: Splats2D, tiles_x: int, tiles_y: int, cap: int,
               with_gauss_id: bool = True,
               cull_tab: jnp.ndarray | None = None,
               tile_h: int = 16, tile_w: int = 16,
               staircase: bool = False, row_cap: int = 0) -> TileBins:
    """With `cull_tab` (P, 6) f32 [mean_x, mean_y_band, conic_a, conic_b,
    conic_c, ln(255*opacity)], instances whose Mahalanobis power exceeds
    the 1/255 alpha threshold over the ENTIRE tile are retagged as padding
    (tile = num_tiles).  The blend kernel's per-pixel ok-gate
    (alpha >= 1/255, blend_pallas._alpha_terms) would skip every pixel of
    such an instance anyway, so outputs and gradients are unchanged while
    the per-tile instance ranges — and with them the sequential blend
    walk — shrink (~20-30%% beyond the per-axis ellipse AABB, which keeps
    corner tiles the ellipse never reaches).  The test is the exact min of
    the convex quadratic q(d) = 0.5(A dx^2 + C dy^2) + B dx dy over the
    tile's continuous pixel rectangle (interior if the mean is inside,
    else the best of the four clamped edge minimisers) — a lower bound on
    q at any pixel centre, so the cull is conservative.

    With `staircase=True` (requires cull_tab), the two-level staircase
    expansion (_bin_splats_staircase) is used instead: kept-tile intervals
    are counted BEFORE slot assignment so `total` itself shrinks."""
    if staircase:
        assert cull_tab is not None, "staircase expansion needs cull_tab"
        return _bin_splats_staircase(
            sp, tiles_x, tiles_y, cap, with_gauss_id, cull_tab,
            tile_h, tile_w, row_cap or cap)
    assert cap < MAX_CAP and tiles_x * tiles_y < MAX_CAP
    num_tiles = tiles_x * tiles_y
    P = sp.depth.shape[0]
    n_tiles = lax.stop_gradient(sp.n_tiles)
    depth = lax.stop_gradient(sp.depth)

    # 1. depth-rank the gaussians (stable → ties keep gaussian-id order)
    order = jnp.argsort(jnp.where(n_tiles > 0, depth, jnp.inf),
                        stable=True).astype(jnp.int32)
    # ONE packed P-row gather for every per-Gaussian field needed in rank
    # order — four separate 1-column gathers by `order` cost ~10 ms each
    # at P=512k on v5e, the packed row gather ~3 ms total.
    pre_cols = jnp.stack(
        [sp.rect_min[:, 0].astype(jnp.int32),
         sp.rect_min[:, 1].astype(jnp.int32),
         jnp.maximum((sp.rect_max[:, 0] - sp.rect_min[:, 0]).astype(
             jnp.int32), 1),
         n_tiles], axis=1)
    if cull_tab is not None:
        pre_cols = jnp.concatenate(
            [pre_cols,
             lax.bitcast_convert_type(lax.stop_gradient(cull_tab),
                                      jnp.int32)], axis=1)
    pre = pre_cols[order]                              # (P, 4|10) rank order
    cnt = pre[:, 3]
    offsets = jnp.cumsum(cnt) - cnt                    # exclusive prefix
    total = offsets[-1] + cnt[-1]

    # 2. per-slot gaussian data: ONE head-scatter + monotone cummax delivers
    # the depth rank to every slot; everything else (rect fields, base
    # offset) follows by rank-indexed gathers from P-sized tables — random
    # access into a few-hundred-KB table is cache-resident and ~free,
    # unlike cap-sized gathers (~8 ns/row), so only the rank needs the scan.
    ranks_p = jnp.arange(P, dtype=jnp.int32)
    head_pos = jnp.where(cnt > 0, offsets, cap)        # cap = dropped
    rank = cummax_i32(
        _scat(jnp.zeros((cap,), jnp.int32), head_pos, ranks_p))

    # ONE packed row gather for the per-slot fields: four separate 1-column
    # gathers cost 52 ms at cap=2M on v5e vs 2.7 ms for a single row gather
    # with the same (sorted) rank indices.  The three rect fields ride in
    # ONE int32 (rx<2^11 tiles, ry<2^11, rw<2^10): a (cap,2) gather moves
    # half the bytes of (cap,4), and unpacking by shift/mask fuses into the
    # consumers — column slices of a row-major gather output materialised
    # ~5 ms/step of full passes at cap=1.6M (trace-measured).
    # bit budget rx:10 | ry:11 | rw:10 = 31 (no sign overflow: max value
    # is exactly 2^31-1); 16x16 tiles => images up to 16384x32768 px
    assert tiles_x < (1 << 10) and tiles_y < (1 << 11)
    packed_rect = (pre[:, 0] << 21) | (pre[:, 1] << 10) | pre[:, 2]
    tab_cols = [packed_rect, offsets]
    if cull_tab is not None:
        tab_cols += [pre[:, 4 + i] for i in range(6)]
    tab = jnp.stack(tab_cols, axis=1)
    rows = tab[rank]
    pr = rows[:, 0]
    rx, ry, rw = pr >> 21, (pr >> 10) & ((1 << 11) - 1), pr & ((1 << 10) - 1)
    base = rows[:, 1]

    inst = jnp.arange(cap, dtype=jnp.int32)
    inst_valid = inst < total
    local = inst - base
    tx = rx + local % rw
    ty = ry + local // rw
    tile = jnp.where(inst_valid, ty * tiles_x + tx, num_tiles)

    if cull_tab is not None:
        cf = lax.bitcast_convert_type(rows[:, 2:8], jnp.float32)
        mx, my = cf[:, 0], cf[:, 1]
        ca, cb, cc, thr = cf[:, 2], cf[:, 3], cf[:, 4], cf[:, 5]
        # pixel offsets from the mean over this tile's pixel rectangle
        # (pixel centres at integer coords tx*tw .. tx*tw+tw-1, band-local
        # y like the kernel's _pixel_coords minus its row0 shift)
        u_lo = (tx * tile_w).astype(jnp.float32) - mx
        u_hi = u_lo + (tile_w - 1)
        v_lo = (ty * tile_h).astype(jnp.float32) - my
        v_hi = v_lo + (tile_h - 1)
        inside = (u_lo <= 0.0) & (u_hi >= 0.0) & (v_lo <= 0.0) & (v_hi >= 0.0)

        def _qu(ue):  # min over the edge u = ue, v in [v_lo, v_hi]
            vs = jnp.clip(-cb * ue / cc, v_lo, v_hi)
            return 0.5 * ca * ue * ue + cb * ue * vs + 0.5 * cc * vs * vs

        def _qv(ve):  # min over the edge v = ve, u in [u_lo, u_hi]
            us = jnp.clip(-cb * ve / ca, u_lo, u_hi)
            return 0.5 * cc * ve * ve + cb * us * ve + 0.5 * ca * us * us

        qmin = jnp.minimum(jnp.minimum(_qu(u_lo), _qu(u_hi)),
                           jnp.minimum(_qv(v_lo), _qv(v_hi)))
        qmin = jnp.where(inside, 0.0, qmin)
        # f32 safety margin: the kernel evaluates q at pixels with its own
        # rounding; never cull within a few hundred ulps of the threshold.
        # Non-PSD conics (det<0 numerics) are kept — the kernel's
        # power<=0 gate owns that case.
        keep = (qmin <= thr + (1e-3 + 1e-3 * jnp.abs(thr))) \
            | (ca <= 0.0) | (cc <= 0.0)
        tile = jnp.where(keep, tile, num_tiles)

    # 3. one stable sort by tile id (instances already depth-ordered);
    # validity is derivable (tile == num_tiles marks padding), so only
    # rank + pre-sort slot ride along as payloads
    tile_sorted, rank_sorted, slot_sorted = lax.sort(
        (tile, rank, inst), num_keys=1)
    valid_sorted = tile_sorted < num_tiles

    # 4. tile ranges: boundary scatters + reverse-cummin backfill
    start, stop = tile_ranges_from_sorted(tile_sorted, num_tiles,
                                          jnp.minimum(total, cap))

    gauss_id = order[rank_sorted] if with_gauss_id else rank_sorted

    return TileBins(
        order=order,
        rank=rank_sorted,
        gauss_id=gauss_id,
        tile_id=tile_sorted,
        inst_valid=valid_sorted.astype(bool),
        tile_start=start,
        tile_stop=stop,
        n_instances=total,
        slot=slot_sorted,
        seg_off=jnp.concatenate([offsets, total[None]]).astype(jnp.int32),
    )


@jax.custom_vjp
def pack_rows(feats_g: jnp.ndarray, bins: TileBins) -> jnp.ndarray:
    """Instance assembly: (P, C) per-Gaussian rows → (cap, C) per-instance
    rows in tile-sorted order (invalid rows zeroed).

    Forward = two row gathers (`feats_g[order][rank]`); this is the ONLY
    cap-sized random access on the hot path (SURVEY §7.1).  The hand-written
    backward replaces XLA's transpose — a cap-sized C-wide scatter-ADD
    (~160 ms at cap=2M on v5e) — with gathers: instances of one Gaussian
    occupy the CONTIGUOUS pre-sort slot range [seg_off[r], seg_off[r+1]), so
    per-Gaussian grads are segment sums of an inverse-permuted cotangent:
    slot-keyed payload sorts (sequential-pass data movement, see
    _pack_rows_bwd), one cumsum, one boundary gather + adjacent diff, and
    an inverse-permutation row gather."""
    out = feats_g[bins.order][bins.rank]
    return jnp.where(bins.inst_valid[:, None], out, 0.0)


def _pack_rows_fwd(feats_g, bins):
    return pack_rows(feats_g, bins), (bins, feats_g.shape[0])


def _pack_rows_bwd(res, g):
    bins, P = res
    cap = g.shape[0]
    g = jnp.where(bins.inst_valid[:, None], g, 0.0)
    # sorted-position cotangents → pre-sort slot order.  Applying the
    # permutation as a random row gather costs 56 ms at cap=2M on v5e
    # (latency-bound); a radix SORT keyed by the slot moves the same rows
    # in sequential passes.  XLA's sort-merger fuses same-key sorts into
    # ONE multi-operand sort whose compile time is superlinear in operand
    # count (17 ops ≈ 214 s); alternating between the slot and slot+1 as
    # the key (distinct arrays the merger cannot unify, identical order —
    # slot < cap < 2^31-1 so +1 never overflows) caps the merge at two
    # 9-operand sorts.  (A bitcast-to-f32 key does NOT work: slots below
    # 2^23 bitcast to denormals, which XLA's sort comparator flushes to
    # equal — the sort silently degrades to the identity permutation and
    # those gradient columns come back unrouted.)
    C = g.shape[1]
    slot_p1 = bins.slot + 1
    cols = []
    for i, k in enumerate(range(0, C, 4)):
        pay = tuple(g[:, k + j] for j in range(min(4, C - k)))
        key = bins.slot if i % 2 == 0 else slot_p1
        cols.extend(lax.sort((key,) + pay, num_keys=1)[1:])
    g_pre = jnp.stack(cols, axis=1)
    cums = jnp.cumsum(g_pre, axis=0)
    cums = jnp.concatenate([jnp.zeros((1, g.shape[1]), g.dtype), cums], axis=0)
    # adjacent segments share boundaries: one (P+1)-row gather + diff
    # instead of two P-row gathers (the tables are cap-sized; every saved
    # row matters)
    cb = cums[jnp.clip(bins.seg_off, 0, cap)]            # (P+1, C)
    g_ranked = cb[1:] - cb[:-1]                          # (P, C) rank order
    # rank order → gaussian-id order via a GATHER by the inverse of the
    # depth permutation (a P-row scatter-set costs ~2x the gather on v5e);
    # the inverse comes from a cheap 2-operand P-sort of the permutation.
    rinv = lax.sort((bins.order, jnp.arange(P, dtype=jnp.int32)),
                    num_keys=1)[1]
    return (g_ranked[rinv], None)


pack_rows.defvjp(_pack_rows_fwd, _pack_rows_bwd)
