"""Tile-parallel alpha blending — the production XLA path.

TPU-native reformulation of the CUDA per-pixel sequential blend
(SURVEY.md §2.3(a) stage 3): for each 16x16 tile, the blend-weight matrix

    W[p, j] = alpha_j(p) * T_j(p),   T_j(p) = prod_{i<j} (1 - alpha_i(p))

is built fully in parallel on the VPU (the transmittance product is an
exclusive cumulative product along the depth-sorted entry axis), and the
accumulation over RGB plus the K language-coefficient channels becomes one
MXU matmul `W @ features_of_tile` — alpha compositing as matrix multiply.
The front-to-back termination (T*(1-alpha) < 1e-4) and the alpha skip rules
become masks on W, reproducing the CUDA kernel's inclusion set exactly (see
ops/rasterize_reference.py for the argument).

Tiles are processed in batches under `lax.map` to bound live memory; each
batch does static-shape gathers of up to `tile_cap` depth-sorted entries per
tile. Backward comes from JAX autodiff: the gathers transpose to
deterministic scatter-adds (the TPU replacement for CUDA backward atomics).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .projection import BLOCK, ProjectedGaussians
from .binning import BinnedTiles

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4

P = BLOCK * BLOCK  # pixels per tile


def _tile_pixel_coords(tile_ids: jnp.ndarray, grid_x: int):
    """Continuous pixel-center coordinates for each tile's P pixels.

    Returns (px [TB, P], py [TB, P]) in row-major (y-major) pixel order.
    """
    tx = (tile_ids % grid_x).astype(jnp.float32)
    ty = (tile_ids // grid_x).astype(jnp.float32)
    col = jnp.tile(jnp.arange(BLOCK, dtype=jnp.float32), (BLOCK,))
    row = jnp.repeat(jnp.arange(BLOCK, dtype=jnp.float32), BLOCK)
    px = tx[:, None] * BLOCK + col[None, :]
    py = ty[:, None] * BLOCK + row[None, :]
    return px, py


def blend_tiles(
    proj_xy: jnp.ndarray,        # [N, 2]
    proj_conic: jnp.ndarray,     # [N, 3]
    opacities: jnp.ndarray,      # [N] activated
    colors: jnp.ndarray,         # [N, 3]
    features: jnp.ndarray | None,  # [N, D] dense per-gaussian blend channels
    binned: BinnedTiles,
    grid_x: int,
    grid_y: int,
    bg: jnp.ndarray,             # [3]
    tile_cap: int,
    tile_batch: int,
    tile_ids: jnp.ndarray | None = None,
):
    """Blend tiles. By default all grid tiles; pass `tile_ids` [T_local] to
    blend a subset (the tile-sharded path gives each device its slice).
    Returns (rgb [T, P, 3], feat [T, P, D] | None, final_T [T, P])."""
    num_tiles = grid_x * grid_y
    if tile_ids is None:
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    n_local = tile_ids.shape[0]
    num_batches = -(-n_local // tile_batch)
    padded = num_batches * tile_batch
    tile_ids_all = jnp.pad(
        tile_ids, (0, padded - n_local), constant_values=num_tiles
    ).reshape(num_batches, tile_batch)
    max_entries = binned.gauss_id.shape[0]

    feat_dim = features.shape[1] if features is not None else 0

    def batch_fn(tile_ids):
        real = tile_ids < num_tiles
        safe_ids = jnp.minimum(tile_ids, num_tiles - 1)
        start = binned.tile_start[safe_ids]                    # [TB]
        count = jnp.where(real, binned.tile_count[safe_ids], 0)
        slots = jnp.arange(tile_cap, dtype=jnp.int32)
        eidx = jnp.minimum(start[:, None] + slots[None, :], max_entries - 1)
        in_range = slots[None, :] < jnp.minimum(count, tile_cap)[:, None]  # [TB, CAP]
        g = binned.gauss_id[eidx]                              # [TB, CAP]

        xy = proj_xy[g]            # [TB, CAP, 2]
        conic = proj_conic[g]      # [TB, CAP, 3]
        op = opacities[g]          # [TB, CAP]

        px, py = _tile_pixel_coords(safe_ids, grid_x)          # [TB, P]
        dx = xy[:, None, :, 0] - px[:, :, None]                # [TB, P, CAP]
        dy = xy[:, None, :, 1] - py[:, :, None]
        ca = conic[:, None, :, 0]
        cb = conic[:, None, :, 1]
        cc = conic[:, None, :, 2]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op[:, None, :] * jnp.exp(power))
        valid = in_range[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(valid, alpha, 0.0)

        one_minus = 1.0 - alpha
        # Exclusive cumulative product along the depth-sorted entry axis.
        T = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(one_minus[..., :1]), one_minus[..., :-1]], axis=-1),
            axis=-1,
        )
        include = valid & (T * one_minus >= T_EPS)
        w = jnp.where(include, alpha * T, 0.0)                 # [TB, P, CAP]

        rgb_tile = jnp.einsum("tpc,tcd->tpd", w, colors[g],
                              preferred_element_type=jnp.float32,
                              precision=lax.Precision.HIGHEST)
        alpha_incl = jnp.where(include, alpha, 0.0)
        final_t = jnp.exp(jnp.sum(jnp.log1p(-alpha_incl), axis=-1))  # [TB, P]
        rgb_tile = rgb_tile + final_t[..., None] * bg[None, None, :]

        if features is not None:
            feat_tile = jnp.einsum("tpc,tcd->tpd", w, features[g],
                                   preferred_element_type=jnp.float32,
                                   precision=lax.Precision.HIGHEST)
        else:
            feat_tile = jnp.zeros((tile_ids.shape[0], P, 0), jnp.float32)
        return rgb_tile, feat_tile, final_t

    rgb, feat, final_t = lax.map(batch_fn, tile_ids_all)
    rgb = rgb.reshape(padded, P, 3)[:n_local]
    feat = feat.reshape(padded, P, feat_dim)[:n_local] if features is not None else None
    final_t = final_t.reshape(padded, P)[:n_local]
    return rgb, feat, final_t


def tiles_to_image(tiles: jnp.ndarray, grid_x: int, grid_y: int, height: int, width: int):
    """[num_tiles, P, C] tile-major pixels -> [C, H, W] image (cropped)."""
    C = tiles.shape[-1]
    img = tiles.reshape(grid_y, grid_x, BLOCK, BLOCK, C)
    img = img.transpose(4, 0, 2, 1, 3).reshape(C, grid_y * BLOCK, grid_x * BLOCK)
    return img[:, :height, :width]
