"""Tile binning and depth ordering.

The CUDA reference expands Gaussian→tile instances with a prefix sum +
scatter, then radix-sorts 64-bit [tile|depth] keys with cub
(rasterizer_impl.cu:187-255, 320-515).  The TPU formulation avoids both the
hand-written radix sort and any per-instance binary search:

  1. Gaussians are depth-sorted once (P elements, cheap).
  2. Instance expansion assigns instance slots in depth-rank order via an
     exclusive prefix sum; the owning Gaussian of each slot comes from a
     scatter-max of range heads followed by an associative cummax — O(cap)
     bandwidth instead of O(cap·log P) searchsorted gathers.
  3. ONE stable single-key sort by tile id finishes the ordering: within a
     tile, instances are already depth-ascending (step 1), and the stable
     sort preserves the reference's (tile, depth, gaussian-id) tie order.
  4. Tile ranges come from boundary scatters + a reverse cummin backfill,
     again no searchsorted.

The instance list has a static capacity `cap` with a validity mask
(overflow is dropped; callers read `n_instances` to detect truncation).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct
from jax import lax

from ibgs_tpu.ops.preprocess import Splats2D


@struct.dataclass
class TileBins:
    gauss_id: jnp.ndarray    # (cap,) int32 gaussian index per sorted instance
    tile_id: jnp.ndarray     # (cap,) int32 owning tile per sorted instance
    inst_valid: jnp.ndarray  # (cap,) bool
    tile_start: jnp.ndarray  # (num_tiles,) int32
    tile_stop: jnp.ndarray   # (num_tiles,) int32
    n_instances: jnp.ndarray  # () int32 total (pre-truncation) instance count


def bin_splats(sp: Splats2D, tiles_x: int, tiles_y: int, cap: int) -> TileBins:
    num_tiles = tiles_x * tiles_y
    P = sp.depth.shape[0]
    n_tiles = lax.stop_gradient(sp.n_tiles)
    depth = lax.stop_gradient(sp.depth)

    # 1. depth-rank the gaussians (stable → ties keep gaussian-id order)
    order = jnp.argsort(jnp.where(n_tiles > 0, depth, jnp.inf), stable=True)
    cnt = n_tiles[order]                              # counts in depth order
    offsets = jnp.cumsum(cnt) - cnt                   # exclusive prefix
    total = offsets[-1] + cnt[-1]

    # 2. owning (depth-ranked) gaussian per instance slot: scatter range
    #    heads, then cummax.  Zero-count runs share an offset with the one
    #    live gaussian at its end, so the max picks the live owner.
    head = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(cnt > 0, offsets, cap)].max(
        jnp.arange(P, dtype=jnp.int32), mode="drop")
    rank = lax.associative_scan(jnp.maximum, head)    # (cap,) depth rank
    gid = order[rank]

    inst = jnp.arange(cap, dtype=jnp.int32)
    inst_valid = inst < total
    local = inst - offsets[rank]
    rect_w = jnp.maximum(
        (sp.rect_max[gid, 0] - sp.rect_min[gid, 0]).astype(jnp.int32), 1)
    tx = sp.rect_min[gid, 0] + local % rect_w
    ty = sp.rect_min[gid, 1] + local // rect_w
    tile = jnp.where(inst_valid, ty * tiles_x + tx, num_tiles)

    # 3. one stable sort by tile id (instances already depth-ordered)
    tile_sorted, gid_sorted, valid_sorted = lax.sort(
        (tile, gid, inst_valid.astype(jnp.int32)), num_keys=1)

    # 4. tile ranges: boundary scatters + reverse-cummin backfill
    pos = jnp.arange(cap, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), tile_sorted[:-1]])
    is_head = tile_sorted != prev
    start = jnp.full((num_tiles + 1,), cap, jnp.int32).at[
        jnp.where(is_head, tile_sorted, num_tiles + 1)].min(
        pos, mode="drop")
    start = start.at[num_tiles].min(
        jnp.minimum(total, cap).astype(jnp.int32))
    # backfill empty tiles with the next tile's start
    start = lax.associative_scan(jnp.minimum, start, reverse=True)
    stop = start[1:]
    start = start[:num_tiles]

    return TileBins(
        gauss_id=gid_sorted,
        tile_id=tile_sorted,
        inst_valid=valid_sorted.astype(bool),
        tile_start=start,
        tile_stop=stop,
        n_instances=total,
    )
