"""Tile binning: expand Gaussians to (tile, depth)-sorted entry lists.

This is the TPU replacement for the CUDA pipeline's duplicate-keys + global
radix sort (SURVEY.md §2.3(a) stage 2). Differences by design:

- Key expansion uses exact per-Gaussian prefix-sum offsets into a *static*
  global entry budget (`max_entries`), instead of a dynamically-sized buffer.
  Entries beyond the live total get a sentinel tile id and sort to the end.
- Sorting uses `lax.sort` with (tile_id, depth) as a two-key stable sort,
  which XLA lowers to an efficient on-device sort; stability reproduces the
  CUDA radix sort's tie-breaking by submission order.
- Per-tile ranges come from a vectorized `searchsorted` instead of a range
  identification kernel.

All shapes are static; everything jits.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .projection import ProjectedGaussians


class BinnedTiles(NamedTuple):
    gauss_id: jnp.ndarray     # [max_entries] int32 gaussian index per sorted entry
    entry_valid: jnp.ndarray  # [max_entries] bool
    tile_start: jnp.ndarray   # [num_tiles] int32 first entry index of each tile
    tile_count: jnp.ndarray   # [num_tiles] int32 number of entries per tile
    total_entries: jnp.ndarray  # [] int32 live entries (<= max_entries if no overflow)


def bin_gaussians(
    proj: ProjectedGaussians,
    grid_x: int,
    grid_y: int,
    max_entries: int,
    use_pallas: bool | None = None,
) -> BinnedTiles:
    # On TPU the expansion runs as a Pallas streaming kernel + packed-key
    # sort + vectorized binary-search ranges (ops/pallas_binning.py); the
    # XLA searchsorted expansion below is gather-bound (~770ms at 6M entries
    # on v5e vs ~35ms for the kernel path) and remains the CPU/test
    # fallback. Binning computes integer indices only (depth is consumed
    # under stop_gradient), so swapping implementations is transparent to
    # autodiff — verified grad-identical.
    if use_pallas is None:
        from .rasterize import _pallas_supported
        use_pallas = _pallas_supported()
    if use_pallas:
        from . import pallas_binning

        num_tiles = grid_x * grid_y
        tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
            proj, grid_x, grid_y, max_entries)
        keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        g_sorted, t_start, t_count, tile_sorted = (
            pallas_binning.sorted_binning_from_keys(keys, num_tiles))
        return BinnedTiles(
            gauss_id=g_sorted,
            entry_valid=tile_sorted < num_tiles,
            tile_start=t_start,
            tile_count=t_count,
            total_entries=total,
        )

    num_tiles = grid_x * grid_y
    tiles = proj.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(tiles) - tiles  # exclusive prefix sum
    total = jnp.sum(tiles)

    # Entry e belongs to gaussian g = searchsorted(offsets, e, 'right') - 1.
    entry_ids = jnp.arange(max_entries, dtype=jnp.int32)
    gauss = jnp.clip(
        jnp.searchsorted(offsets, entry_ids, side="right") - 1, 0, tiles.shape[0] - 1
    ).astype(jnp.int32)
    slot = entry_ids - offsets[gauss]

    rect_min = proj.rect_min[gauss]  # [M, 2]
    rect_w = jnp.maximum(proj.rect_max[gauss, 0] - rect_min[:, 0], 1)
    tile_x = rect_min[:, 0] + slot % rect_w
    tile_y = rect_min[:, 1] + slot // rect_w
    tile_id = (tile_y * grid_x + tile_x).astype(jnp.int32)

    valid = entry_ids < total
    tile_id = jnp.where(valid, tile_id, num_tiles)  # sentinel sorts last
    depth = jnp.where(valid, lax.stop_gradient(proj.depth[gauss]), jnp.inf)

    tile_sorted, _, gauss_sorted = lax.sort(
        (tile_id, depth.astype(jnp.float32), gauss),
        num_keys=2,
        is_stable=True,
    )

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    return BinnedTiles(
        gauss_id=gauss_sorted,
        entry_valid=tile_sorted < num_tiles,
        tile_start=tile_start,
        tile_count=tile_count,
        total_entries=total,
    )
