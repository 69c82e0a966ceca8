"""Public differentiable rasterizer API.

Mirrors the capability surface of the reference's
`diff_gaussian_rasterization.GaussianRasterizer` (contract documented in
SURVEY.md §2.3(a); call site `gaussian_renderer/__init__.py:37-119`) with a
TPU-native implementation:

    preprocess (XLA, batched)  ->  bin+sort (lax.sort, exact)  ->
    tile blend (MXU matmul formulation, lax.map batches)

Three language-feature modes, mutually exclusive like the reference:
- ``features=None``            — RGB only (dummy 1-element tensors upstream),
- ``features=[N, L*K]``        — training mode: dense sparsified coefficient
                                  vectors blended into a [L*K, H, W] map,
- ``quick=(weights, indices)`` — inference: per-Gaussian top-k
                                  (weight, codebook-index) pairs scattered
                                  into a [num_channels, H, W] map in one pass
                                  (the 450+ FPS path, eval_lerf.py:293-356).

All static configuration lives in `RasterizeSettings` (hashable, usable as a
jit static argument).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import binning, projection, rasterize_tiles
from .projection import BLOCK


class RasterizeSettings(NamedTuple):
    """Static rasterization configuration (jit-static, hashable)."""

    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    sh_degree: int
    scale_modifier: float = 1.0
    # Entry budget for binning: total (gaussian, tile) pairs. Must be >= the
    # live total or far tiles lose entries (overflow is reported in aux).
    max_entries: int = 2 ** 21
    # Max depth-sorted entries blended per tile; beyond this the *farthest*
    # entries are dropped (front-to-back order keeps the visible ones).
    tile_cap: int = 1024
    # Tiles processed per lax.map step (memory/parallelism tradeoff).
    tile_batch: int = 16
    prefiltered: bool = False
    debug: bool = False

    @property
    def grid_x(self) -> int:
        return -(-self.image_width // BLOCK)

    @property
    def grid_y(self) -> int:
        return -(-self.image_height // BLOCK)


class RasterizeOutput(NamedTuple):
    rgb: jnp.ndarray                  # [3, H, W]
    feature_map: jnp.ndarray | None   # [D, H, W] or None
    radii: jnp.ndarray                # [N] int32
    final_transmittance: jnp.ndarray  # [H, W]
    max_tile_count: jnp.ndarray       # [] int32 (overflow telemetry vs tile_cap)
    total_entries: jnp.ndarray        # [] int32 (overflow telemetry vs max_entries)


def rasterize(
    settings: RasterizeSettings,
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,               # [N, 1] activated
    viewmatrix: jnp.ndarray,              # [4, 4] transposed W2C
    projmatrix: jnp.ndarray,              # [4, 4] transposed full projection
    campos: jnp.ndarray,                  # [3]
    bg: jnp.ndarray,                      # [3]
    scales: jnp.ndarray | None = None,
    rotations: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    shs: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    features: jnp.ndarray | None = None,          # [N, D] training mode
    quick_weights: jnp.ndarray | None = None,     # [N, S] quick mode
    quick_indices: jnp.ndarray | None = None,     # [N, S] (float or int)
    quick_channels: int = 192,
    means2d_dummy: jnp.ndarray | None = None,     # [N, 2] NDC-grad carrier
) -> RasterizeOutput:
    H, W = settings.image_height, settings.image_width

    proj = projection.preprocess(
        means3d, scales, rotations, cov3d_precomp, shs, colors_precomp,
        viewmatrix, projmatrix, campos,
        settings.tanfovx, settings.tanfovy, W, H,
        settings.sh_degree, settings.scale_modifier,
    )
    xy = proj.xy
    if means2d_dummy is not None:
        # Gradient carrier in NDC units: matches the CUDA dL_dmean2D scale,
        # which folds the 0.5*W / 0.5*H ndc->pixel factors into the gradient
        # (used for densification stats, scene/gaussian_model.py:507).
        scale_vec = jnp.array([0.5 * W, 0.5 * H], xy.dtype)
        xy = xy + means2d_dummy * scale_vec

    if quick_weights is not None:
        # Sparse (weight, index) pairs -> dense per-gaussian channel vectors.
        # one_hot keeps this an einsum (MXU) instead of a scatter.
        onehot = jax.nn.one_hot(quick_indices.astype(jnp.int32), quick_channels,
                                dtype=quick_weights.dtype)        # [N, S, C]
        blend_features = jnp.einsum("ns,nsc->nc", quick_weights, onehot)
    else:
        blend_features = features

    binned = binning.bin_gaussians(proj, settings.grid_x, settings.grid_y,
                                   settings.max_entries)

    rgb_tiles, feat_tiles, final_t_tiles = rasterize_tiles.blend_tiles(
        xy, proj.conic, opacities[:, 0],
        proj.rgb, blend_features, binned,
        settings.grid_x, settings.grid_y, bg,
        settings.tile_cap, settings.tile_batch,
    )

    rgb = rasterize_tiles.tiles_to_image(rgb_tiles, settings.grid_x, settings.grid_y, H, W)
    feat = (
        rasterize_tiles.tiles_to_image(feat_tiles, settings.grid_x, settings.grid_y, H, W)
        if feat_tiles is not None else None
    )
    final_t = rasterize_tiles.tiles_to_image(
        final_t_tiles[..., None], settings.grid_x, settings.grid_y, H, W
    )[0]

    return RasterizeOutput(
        rgb=rgb,
        feature_map=feat,
        radii=proj.radius,
        final_transmittance=final_t,
        max_tile_count=binned.tile_count.max(),
        total_entries=binned.total_entries,
    )
