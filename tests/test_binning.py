"""Binning invariants: ordering, ranges, truncation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ibgs_tpu.ops import binning, preprocess
from tests.utils import face_camera, random_cloud, simple_camera


def _splats(n=60, seed=0, w=48, h=32):
    cam = simple_camera(w, h)
    p = face_camera(random_cloud(jax.random.PRNGKey(seed), n), cam)
    sp = preprocess.preprocess(
        p["xyz"], p["scale"], p["quat"], p["opacity"], p["sh_coeffs"], 0,
        p["normal_world"], p["plane_offset"], cam, 8, 16)
    return sp, w // 16, h // 8


def test_instances_sorted_and_ranged():
    sp, tx, ty = _splats()
    bins = binning.bin_splats(sp, tx, ty, 4096)
    total = int(bins.n_instances)
    tiles = np.asarray(bins.tile_id)[:total]
    assert (np.diff(tiles) >= 0).all()
    depth = np.asarray(sp.depth)[np.asarray(bins.gauss_id)[:total]]
    # depth ascending within each tile
    for t in np.unique(tiles):
        d = depth[tiles == t]
        assert (np.diff(d) >= -1e-6).all()
    # ranges partition the valid prefix
    start = np.asarray(bins.tile_start)
    stop = np.asarray(bins.tile_stop)
    assert (stop >= start).all()
    assert stop.max() == total
    covered = sum(int(e - s) for s, e in zip(start, stop))
    assert covered == total


def test_counts_match_rects():
    sp, tx, ty = _splats(seed=3)
    bins = binning.bin_splats(sp, tx, ty, 4096)
    assert int(bins.n_instances) == int(np.asarray(sp.n_tiles).sum())


def test_truncation_is_prefix():
    sp, tx, ty = _splats(n=200, seed=1)
    full = binning.bin_splats(sp, tx, ty, 8192)
    total = int(full.n_instances)
    cap = total // 2
    trunc = binning.bin_splats(sp, tx, ty, cap)
    assert int(trunc.n_instances) == total          # reported pre-truncation
    assert int(np.asarray(trunc.tile_stop).max()) <= cap


def test_cummax_matches_associative_scan():
    import jax.numpy as jnp
    from jax import lax

    from ibgs_tpu.ops.binning import cummax_i32

    rng = np.random.default_rng(3)
    for n in (1, 7, 4096, 4097, 12288, 100_001):
        x = jnp.asarray(rng.integers(-50, 50, n), jnp.int32)
        ref = lax.associative_scan(jnp.maximum, x)
        got = cummax_i32(x, block=4096)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pack_rows_vjp_matches_autodiff():
    """The hand-written pack_rows backward (slot-keyed payload sorts +
    segment sums) must equal plain autodiff of the gather for EVERY
    column.  Regression: a bitcast-f32 alternate sort key sent slots
    below 2^23 to denormals, which XLA's sort comparator flushes to
    equal — the odd groups of 4 gradient columns came back unrouted
    (identity permutation) while the even groups were correct."""
    sp, tx, ty = _splats(n=40, seed=3)
    bins = binning.bin_splats(sp, tx, ty, 2048, with_gauss_id=False)
    P, C = 40, 15  # C spans both alternate-key sort groups
    feats = jax.random.normal(jax.random.PRNGKey(7), (P, C))
    ct = jax.random.normal(jax.random.PRNGKey(8), (2048, C))

    def via_custom(f):
        return (binning.pack_rows(f, bins) * ct).sum()

    def via_plain(f):
        out = f[bins.order][bins.rank]
        out = jnp.where(bins.inst_valid[:, None], out, 0.0)
        return (out * ct).sum()

    g1 = jax.grad(via_custom)(feats)
    g2 = jax.grad(via_plain)(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_exact_tile_cull_is_output_and_grad_preserving():
    """bin_splats' exact tile/ellipse cull only retags instances the blend
    kernel's per-pixel alpha >= 1/255 ok-gate skips anyway: full geo
    renders and every parameter gradient must be IDENTICAL with the cull
    on and off, while the per-tile instance ranges shrink."""
    import dataclasses

    from ibgs_tpu.ops.epilogue import SourceViews
    from ibgs_tpu.ops.rasterize import RasterConfig, rasterize
    from tests.utils import face_camera as _fc

    cam = simple_camera(64, 48)
    # big anisotropic splats with mixed opacities → multi-tile rects whose
    # AABB corners the ellipse never reaches
    p = _fc(random_cloud(jax.random.PRNGKey(9), 120,
                         scale_rng=(-2.5, -1.0)), cam)
    p["opacity"] = jnp.concatenate(
        [jnp.full((60,), 0.02), p["opacity"][60:]])
    S, H, W = 2, 48, 64
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    eye = jnp.tile(jnp.eye(4)[None], (S, 1, 1))
    src = SourceViews(
        images=jax.random.uniform(ks[0], (S, H, W, 3)),
        depths=jax.random.uniform(ks[1], (S, H, W), minval=2.0, maxval=4.0),
        ref_to_src=eye.at[:, :3, 3].add(
            jax.random.normal(ks[2], (S, 3)) * 0.05),
        cam_pos=jax.random.normal(ks[2], (S, 3)) * 0.1,
        count=jnp.int32(S),
    )
    cfg_on = RasterConfig(instance_cap=8192, backend="oracle",
                          exact_tile_cull=True)
    cfg_off = dataclasses.replace(cfg_on, exact_tile_cull=False)

    def run_loss(cfg):
        def loss(xyz, scale, quat, opacity, sh, nrm, off):
            r = rasterize(
                xyz=xyz, scale=scale, quat=quat, opacity=opacity,
                sh_coeffs=sh, active_sh_degree=0, normal_world=nrm,
                plane_offset=off, cam=cam, bg=jnp.array([0.2, 0.3, 0.4]),
                cfg=cfg, src=src, render_geo=True)
            out = (jnp.abs(r.render - 0.5).mean()
                   + 0.3 * (r.final_t ** 2).mean()
                   + 0.2 * jnp.abs(r.normal).mean()
                   + 0.05 * (r.median_depth ** 2).mean()
                   + 0.4 * jnp.abs(r.ibr.warped_image - 0.3).mean())
            return out, r
        return loss

    args = (p["xyz"], p["scale"], p["quat"], p["opacity"], p["sh_coeffs"],
            p["normal_world"], p["plane_offset"])
    (l_on, r_on), g_on = jax.value_and_grad(
        run_loss(cfg_on), argnums=tuple(range(7)), has_aux=True)(*args)
    (l_off, r_off), g_off = jax.value_and_grad(
        run_loss(cfg_off), argnums=tuple(range(7)), has_aux=True)(*args)

    np.testing.assert_array_equal(np.asarray(r_on.render),
                                  np.asarray(r_off.render))
    np.testing.assert_array_equal(np.asarray(r_on.normal),
                                  np.asarray(r_off.normal))
    np.testing.assert_array_equal(np.asarray(r_on.median_depth),
                                  np.asarray(r_off.median_depth))
    np.testing.assert_array_equal(np.asarray(r_on.final_t),
                                  np.asarray(r_off.final_t))
    np.testing.assert_array_equal(np.asarray(r_on.ibr.warped_image),
                                  np.asarray(r_off.ibr.warped_image))
    assert float(l_on) == float(l_off)
    for a, b in zip(g_on, g_off):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the cull actually removes work: strictly fewer in-range instances
    from ibgs_tpu.ops import preprocess as _pp
    sp = _pp.preprocess(p["xyz"], p["scale"], p["quat"], p["opacity"],
                        p["sh_coeffs"], 0, p["normal_world"],
                        p["plane_offset"], cam, 16, 16)
    import jax.numpy as _jnp
    from jax import lax as _lax
    thr = _jnp.log(_jnp.maximum(255.0 * sp.opacity, 1.000001))
    ctab = _jnp.stack([sp.mean2d[:, 0], sp.mean2d[:, 1], sp.conic[:, 0],
                       sp.conic[:, 1], sp.conic[:, 2], thr], axis=1)
    b_on = binning.bin_splats(sp, 4, 3, 8192, cull_tab=ctab,
                              tile_h=16, tile_w=16)
    b_off = binning.bin_splats(sp, 4, 3, 8192)
    kept_on = int((np.asarray(b_on.tile_stop) - np.asarray(b_on.tile_start)).sum())
    kept_off = int((np.asarray(b_off.tile_stop) - np.asarray(b_off.tile_start)).sum())
    assert kept_on < kept_off, (kept_on, kept_off)


@pytest.mark.slow
def test_staircase_cull_is_output_and_grad_preserving():
    """The staircase-interval expansion (kept-tile counting BEFORE slot
    assignment) must keep a superset of the exact per-tile cull's
    instances — which is itself output-preserving — and a subset of the
    AABB expansion's, shrink n_instances, and leave full geo renders
    bit-identical to the AABB path.

    Gradients: measured root cause of the on/off f32 gap (round 3) —
    the per-instance cotangents reaching pack_rows are BIT-EQUAL for
    every kept (tile, rank) instance and EXACTLY 0.0 for every removed
    one, and the f64 per-gaussian sums of the two paths are exactly
    equal (asserted below via a VJP spy).  The f32 results still differ
    because XLA lowers `jnp.cumsum` to a parallel scan whose combine
    tree REGROUPS when zero rows are removed from the sequence — the
    boundary partial sums round differently, bounded by
    eps_f32 * max|running sum| (~1.5e-4 at this scene's |cumsum| ~1.3e3;
    observed parameter-level gap 3.7e-6).  Both paths are equally far
    from the f64 truth (seg_off routing replicated in f64 matches an
    index-routed np.add.at truth to <1e-12), so the f32 comparison
    below uses a tolerance sized to that mechanism, while the f64
    assertions pin the invariants that ARE exact."""
    import dataclasses

    from ibgs_tpu.ops.epilogue import SourceViews
    from ibgs_tpu.ops.rasterize import RasterConfig, rasterize
    from tests.utils import face_camera as _fc

    cam = simple_camera(64, 48)
    p = _fc(random_cloud(jax.random.PRNGKey(9), 120,
                         scale_rng=(-2.5, -1.0)), cam)
    p["opacity"] = jnp.concatenate(
        [jnp.full((60,), 0.02), p["opacity"][60:]])
    S, H, W = 2, 48, 64
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    eye = jnp.tile(jnp.eye(4)[None], (S, 1, 1))
    src = SourceViews(
        images=jax.random.uniform(ks[0], (S, H, W, 3)),
        depths=jax.random.uniform(ks[1], (S, H, W), minval=2.0, maxval=4.0),
        ref_to_src=eye.at[:, :3, 3].add(
            jax.random.normal(ks[2], (S, 3)) * 0.05),
        cam_pos=jax.random.normal(ks[2], (S, 3)) * 0.1,
        count=jnp.int32(S),
    )
    cfg_on = RasterConfig(instance_cap=8192, backend="oracle",
                          staircase_cull=True, row_cap=4096)
    cfg_off = dataclasses.replace(cfg_on, staircase_cull=False)

    def run_loss(cfg):
        def loss(xyz, scale, quat, opacity, sh, nrm, off):
            r = rasterize(
                xyz=xyz, scale=scale, quat=quat, opacity=opacity,
                sh_coeffs=sh, active_sh_degree=0, normal_world=nrm,
                plane_offset=off, cam=cam, bg=jnp.array([0.2, 0.3, 0.4]),
                cfg=cfg, src=src, render_geo=True)
            out = (jnp.abs(r.render - 0.5).mean()
                   + 0.3 * (r.final_t ** 2).mean()
                   + 0.2 * jnp.abs(r.normal).mean()
                   + 0.05 * (r.median_depth ** 2).mean()
                   + 0.4 * jnp.abs(r.ibr.warped_image - 0.3).mean())
            return out, r
        return loss

    args = (p["xyz"], p["scale"], p["quat"], p["opacity"], p["sh_coeffs"],
            p["normal_world"], p["plane_offset"])

    # spy on pack_rows' VJP to capture the cotangents each path routes back
    captures = []
    orig_bwd = binning._pack_rows_bwd

    def spy_bwd(res, g):
        bins, _ = res
        def save(g_, tile, rank, valid, slot, seg_off, order):
            captures.append(dict(
                g=np.asarray(g_), tile=np.asarray(tile),
                rank=np.asarray(rank), valid=np.asarray(valid),
                slot=np.asarray(slot), seg_off=np.asarray(seg_off),
                order=np.asarray(order)))
        jax.debug.callback(save, g, bins.tile_id, bins.rank,
                           bins.inst_valid, bins.slot, bins.seg_off,
                           bins.order)
        return orig_bwd(res, g)

    binning.pack_rows.defvjp(binning._pack_rows_fwd, spy_bwd)
    try:
        (l_on, r_on), g_on = jax.value_and_grad(
            run_loss(cfg_on), argnums=tuple(range(7)), has_aux=True)(*args)
        (l_off, r_off), g_off = jax.value_and_grad(
            run_loss(cfg_off), argnums=tuple(range(7)), has_aux=True)(*args)
    finally:
        binning.pack_rows.defvjp(binning._pack_rows_fwd, orig_bwd)

    np.testing.assert_array_equal(np.asarray(r_on.render),
                                  np.asarray(r_off.render))
    np.testing.assert_array_equal(np.asarray(r_on.normal),
                                  np.asarray(r_off.normal))
    np.testing.assert_array_equal(np.asarray(r_on.median_depth),
                                  np.asarray(r_off.median_depth))
    np.testing.assert_array_equal(np.asarray(r_on.final_t),
                                  np.asarray(r_off.final_t))
    np.testing.assert_array_equal(np.asarray(r_on.ibr.warped_image),
                                  np.asarray(r_off.ibr.warped_image))
    assert float(l_on) == float(l_off)

    # exact invariants, proven in f64 (see docstring):
    c_on, c_off = captures
    def keyed(c):
        v = c["valid"]
        return dict(zip(zip(c["tile"][v].tolist(), c["rank"][v].tolist()),
                        c["g"][v]))
    d_on, d_off = keyed(c_on), keyed(c_off)
    assert set(d_on) <= set(d_off)
    # 1. every kept instance's cotangent is BIT-EQUAL across paths
    for k in d_on:
        np.testing.assert_array_equal(d_on[k], d_off[k])
    # 2. every removed instance's cotangent is EXACTLY zero
    for k in set(d_off) - set(d_on):
        assert not np.any(d_off[k])
    # 3. seg_off routing: replicate _pack_rows_bwd in f64 (slot-sort →
    #    cumsum → seg_off boundary diff → inverse-perm) and check it equals
    #    an index-routed add.at truth; both paths' truths must be EQUAL.
    def f64_truth_and_segoff(c):
        g64 = c["g"].astype(np.float64)
        g64[~c["valid"]] = 0.0
        P = c["order"].shape[0]
        truth = np.zeros((P, g64.shape[1]))
        np.add.at(truth, c["order"][c["rank"]], g64)
        cap = g64.shape[0]
        g_pre = g64[np.argsort(c["slot"], kind="stable")]
        cums = np.concatenate([np.zeros((1, g64.shape[1])),
                               np.cumsum(g_pre, axis=0)])
        cb = cums[np.clip(c["seg_off"], 0, cap)]
        via_segoff = (cb[1:] - cb[:-1])[np.argsort(c["order"], kind="stable")]
        np.testing.assert_allclose(via_segoff, truth, atol=1e-10)
        return truth
    t_on = f64_truth_and_segoff(c_on)
    t_off = f64_truth_and_segoff(c_off)
    np.testing.assert_array_equal(t_on, t_off)

    # f32 sanity at the parameter level.  The exact guarantees live in the
    # f64 assertions above; the only residual difference here is cumsum
    # parallel-scan regrouping noise — eps_f32 * max|running cumsum|
    # (~1.5e-4 at this scene) amplified through the preprocess VJP
    # Jacobian — and its grouping shifts whenever XLA refuses (e.g. the
    # debug.callback spy changes the compiled program).  This check only
    # nets NaNs / sign flips / gross misroutes.
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)

    # set relations on the kept (tile, depth-rank) pairs:
    # exact-cull kept ⊆ staircase kept ⊆ AABB kept, and total shrinks
    from ibgs_tpu.ops import preprocess as _pp
    sp = _pp.preprocess(p["xyz"], p["scale"], p["quat"], p["opacity"],
                        p["sh_coeffs"], 0, p["normal_world"],
                        p["plane_offset"], cam, 16, 16)
    thr = jnp.log(jnp.maximum(255.0 * sp.opacity, 1.000001))
    ctab = jnp.stack([sp.mean2d[:, 0], sp.mean2d[:, 1], sp.conic[:, 0],
                      sp.conic[:, 1], sp.conic[:, 2], thr], axis=1)
    b_aabb = binning.bin_splats(sp, 4, 3, 8192)
    b_exact = binning.bin_splats(sp, 4, 3, 8192, cull_tab=ctab,
                                 tile_h=16, tile_w=16)
    b_stair = binning.bin_splats(sp, 4, 3, 8192, cull_tab=ctab,
                                 tile_h=16, tile_w=16, staircase=True,
                                 row_cap=4096)

    def pairs(b):
        v = np.asarray(b.inst_valid)
        return set(zip(np.asarray(b.tile_id)[v].tolist(),
                       np.asarray(b.rank)[v].tolist()))

    pa, pe, ps = pairs(b_aabb), pairs(b_exact), pairs(b_stair)
    assert pe <= ps <= pa
    assert int(b_stair.n_instances) < int(b_aabb.n_instances)
    # seg_off partitions the slot space consistently with the kept pairs
    so = np.asarray(b_stair.seg_off)
    assert so[-1] == int(b_stair.n_instances) and (np.diff(so) >= 0).all()


def test_staircase_pallas_matches_oracle():
    """The Pallas kernel consumes staircase bins identically to the oracle
    (the kernel walks tile ranges; only the binning changed)."""
    import dataclasses

    from ibgs_tpu.ops.rasterize import RasterConfig, rasterize
    from tests.utils import face_camera as _fc

    cam = simple_camera(64, 48)
    p = _fc(random_cloud(jax.random.PRNGKey(4), 80, scale_rng=(-2.5, -1.2)),
            cam)
    cfg_o = RasterConfig(instance_cap=8192, backend="oracle",
                         staircase_cull=True, row_cap=4096)
    cfg_p = dataclasses.replace(cfg_o, backend="pallas")

    def run(cfg):
        return rasterize(
            xyz=p["xyz"], scale=p["scale"], quat=p["quat"],
            opacity=p["opacity"], sh_coeffs=p["sh_coeffs"],
            active_sh_degree=0, normal_world=p["normal_world"],
            plane_offset=p["plane_offset"], cam=cam,
            bg=jnp.array([0.1, 0.2, 0.3]), cfg=cfg, render_geo=False)

    ro, rp = run(cfg_o), run(cfg_p)
    np.testing.assert_allclose(np.asarray(rp.render), np.asarray(ro.render),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rp.final_t),
                               np.asarray(ro.final_t), rtol=1e-5, atol=1e-6)
    assert int(ro.n_rows) == int(rp.n_rows) > 0


def test_staircase_row_truncation_is_prefix():
    """Row overflow must drop the DEEPEST gaussians' rows (prefix
    semantics, like instance_cap) and report n_rows pre-truncation."""
    sp, tx, ty = _splats(n=200, seed=1)
    thr = jnp.log(jnp.maximum(255.0 * sp.opacity, 1.000001))
    ctab = jnp.stack([sp.mean2d[:, 0], sp.mean2d[:, 1], sp.conic[:, 0],
                      sp.conic[:, 1], sp.conic[:, 2], thr], axis=1)
    full = binning.bin_splats(sp, tx, ty, 8192, cull_tab=ctab,
                              tile_h=8, tile_w=16, staircase=True,
                              row_cap=8192)
    rows = int(full.n_rows)
    half = binning.bin_splats(sp, tx, ty, 8192, cull_tab=ctab,
                              tile_h=8, tile_w=16, staircase=True,
                              row_cap=rows // 2)
    assert int(half.n_rows) == rows               # reported pre-truncation
    v_full = np.asarray(full.inst_valid)
    v_half = np.asarray(half.inst_valid)
    pf = set(zip(np.asarray(full.tile_id)[v_full].tolist(),
                 np.asarray(full.rank)[v_full].tolist()))
    ph = set(zip(np.asarray(half.tile_id)[v_half].tolist(),
                 np.asarray(half.rank)[v_half].tolist()))
    assert ph < pf
    # dropped rows belong to the DEEPEST gaussians: no dropped pair may be
    # shallower than a surviving pair (equality = a partially kept gaussian)
    dropped = pf - ph
    assert min(r for _, r in dropped) >= max(r for _, r in ph)
