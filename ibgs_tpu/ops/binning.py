"""Tile binning and depth ordering.

The CUDA reference expands Gaussian→tile instances with a prefix sum +
scatter, then radix-sorts 64-bit [tile|depth] keys with cub
(rasterizer_impl.cu:187-255, 320-515).  On TPU we keep everything gather
based and use XLA's stable sort — no hand-written sort needed, and no
dynamic shapes: the instance list has a static capacity `cap` and a validity
mask (overflow beyond `cap` is dropped, callers size `cap` generously and
can read `n_instances` to detect truncation).

Ordering semantics match the reference exactly: instances sorted by
(tile, depth, gaussian id) — the composition of two stable sorts below
yields that triple order, the same tie-breaking the stable radix sort
produces.
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
    n_tiles = lax.stop_gradient(sp.n_tiles)
    offsets = jnp.cumsum(n_tiles) - n_tiles          # exclusive prefix sum
    total = offsets[-1] + n_tiles[-1]

    inst = jnp.arange(cap, dtype=jnp.int32)
    inst_valid = inst < total
    # Owning gaussian of instance j: last g with offsets[g] <= j.
    gid = jnp.searchsorted(offsets + n_tiles, inst, side="right").astype(jnp.int32)
    gid = jnp.minimum(gid, sp.mean2d.shape[0] - 1)
    local = inst - offsets[gid]
    rect_w = (sp.rect_max[gid, 0] - sp.rect_min[gid, 0]).astype(jnp.int32)
    rect_w = jnp.maximum(rect_w, 1)
    tx = sp.rect_min[gid, 0] + local % rect_w
    ty = sp.rect_min[gid, 1] + local // rect_w
    tile = ty * tiles_x + tx

    depth = lax.stop_gradient(sp.depth)[gid]
    depth = jnp.where(inst_valid, depth, jnp.inf)
    tile = jnp.where(inst_valid, tile, num_tiles)

    # one stable lexicographic sort on (tile, depth); gaussian ids ride along
    tile_sorted, _depth_sorted, gid_sorted, valid_sorted = lax.sort(
        (tile, depth, gid, inst_valid.astype(jnp.int32)), num_keys=2)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    stop = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(jnp.int32)

    return TileBins(
        gauss_id=gid_sorted,
        tile_id=tile_sorted,
        inst_valid=valid_sorted.astype(bool),
        tile_start=start,
        tile_stop=stop,
        n_instances=total,
    )
