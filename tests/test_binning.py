"""Binning invariants: ordering, ranges, truncation."""
import jax
import jax.numpy as jnp
import numpy as np

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
