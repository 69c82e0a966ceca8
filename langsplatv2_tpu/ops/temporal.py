"""Temporal-coherence serving: reuse the tile binning across nearby poses.

The interactive viewer (reference `backend_renderer.py:161-246`) renders a
smooth camera path: consecutive requests differ by a sub-pixel-to-few-pixel
motion, yet the exact frame pays the full binning pipeline — expansion,
key sort, budget cull, slice — every time, and on TPU that irregular work
is the measured majority of the budget-capped frame (expand+sort+budget+
slice = 23.4 of 47 ms at the reference 986x728 load, round-4 stage table).

The TPU-native exploitation is structural, not a cache lookup: the
budget-capped binning (`rasterize._capped_quick_binning`) already lays
every tile's depth-ordered visible prefix out as a DENSE [T, cap] grid.
That layout is a *static gather plan*: freeze it at a reference pose (a
"bin frame"), and gather every per-entry quantity that does not depend on
the pose — the packed fast16 row template (opacity, rgb frozen at the bin
pose, codebook indices, weights) plus each entry's mean3/cov3d — ONCE, in
entry order. A "steady frame" at a nearby pose then recomputes only the
pose-dependent row fields (xy, conic) by running the same closed-form EWA
projection (`projection.project_gaussians` with `cov3d_precomp`) directly
on the cached per-entry arrays, overwrites the 4 dynamic fields of the
field-major template, and blends. The steady frame therefore contains

    NO expansion, NO sort, NO budget scan, NO slice, and NO gather —

it is pure dense streaming compute (elementwise EWA on [E] lanes + the
Pallas blend), the shape of work the TPU is built for.

Approximation contract: the *set* and *depth order* of entries per tile are
frozen at the bin pose. Under a small pose delta a splat's footprint moves
by ~the same few pixels, so errors concentrate at (a) tile-boundary
crossings (a splat that moved into a tile it was not binned to is missing
there; one that moved out blends to ~zero alpha harmlessly — alpha is
evaluated with the CURRENT pose's conic) and (b) depth-order inversions
between near-equal depths. Both vanish as the delta -> 0 and both are
*measured*, not modeled: bench.py's `temporal` probe reports a similarity-
map error-vs-pose-delta curve, and the serving threshold
(`BackendRenderer(temporal_reuse_px=...)`) is expressed in estimated
pixels of image motion so the rebin policy is pinned to that curve.
Entries that fall behind the near plane at the new pose are masked
(opacity forced to 0), so camera push-through degrades gracefully.

Reference behavior covered: the interactive serving loop
(`backend_renderer.py:161-246`) — this is the TPU answer to its per-frame
CUDA re-binning, which on an A100 is cheap enough to redo every frame.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import projection
from .projection import BLOCK


class BinCache(NamedTuple):
    """Frozen binning + per-entry static state in dense [T*cap] layout.

    A pytree of device arrays — jit-transparent, lives in HBM between
    frames (a 365k-entry cache at the reference load is ~35 MB).
    """

    template: jnp.ndarray   # [16, Epad] f32 field-major fast16 rows
                            # (fields 4:16 static; 0:4 rebuilt per frame)
    geo: jnp.ndarray        # [Tcap, 16] f32: mean3 | cov3d(6) | opacity | pad
    kept: jnp.ndarray       # [T] i32 per-tile counts (<= cap), frozen
    total_entries: jnp.ndarray   # [] i32 bin-frame telemetry
    live_total: jnp.ndarray      # [] i32
    max_tile_count: jnp.ndarray  # [] i32 pre-clamp max (cap saturation)


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space covariance 6-vector (xx, xy, xz, yy, yz, zz) from
    activated scales + quaternions — Sigma = (R S)(R S)^T, the CUDA
    computeCov3D contract, as pure elementwise VPU math."""
    qn = rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True)
    r, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    R = [
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ]
    s2 = jnp.square(scale_modifier * scales)                   # [N, 3]

    def sig(i, j):
        return (s2[:, 0] * R[3 * i] * R[3 * j]
                + s2[:, 1] * R[3 * i + 1] * R[3 * j + 1]
                + s2[:, 2] * R[3 * i + 2] * R[3 * j + 2])

    return jnp.stack(
        [sig(0, 0), sig(0, 1), sig(0, 2), sig(1, 1), sig(1, 2), sig(2, 2)],
        axis=1)


def quick_bin_cache(
    settings,
    means3d, opacities, viewmatrix, projmatrix, campos,
    scales=None, rotations=None, shs=None, colors_precomp=None,
    quick_weights=None, quick_indices=None,
):
    """Run the budget-capped binning at `viewmatrix` and freeze it.

    Returns (cache, entry_geom) where entry_geom is the bin pose's own
    field-major rows — the caller can blend the bin frame from them
    directly (the bin frame costs ONE extra w16 gather over a plain
    capped frame: the static geo table pickup).
    """
    from . import pallas_blend
    from .rasterize import (_capped_quick_binning, _capped_kept_from_rows,
                            _pallas_supported)

    assert settings.tile_budget > 0.0 and settings.precision == "bf16", \
        "temporal reuse rides the budget-capped fast16 serving mode"
    interp = not _pallas_supported()
    H, W = settings.image_height, settings.image_width

    proj = projection.preprocess(
        means3d, scales, rotations, None, shs, colors_precomp,
        viewmatrix, projmatrix, campos,
        settings.tanfovx, settings.tanfovy, W, H,
        settings.sh_degree, settings.scale_modifier,
        opacities=opacities[:, 0], cull_alpha=settings.cull_alpha)

    g2, _dense_start, raw_counts, total = _capped_quick_binning(
        settings, proj, opacities, interp)

    rows = pallas_blend.pack_fast16_rows(
        proj.xy, proj.conic, opacities[:, 0], proj.rgb,
        quick_weights, quick_indices)
    rows_g2 = rows[g2]
    kept, sat_bound, live_total = _capped_kept_from_rows(
        settings, rows_g2, raw_counts, "fast16")
    chunk = min(256, max(settings.tile_budget_cap, 128))
    entry_geom = pallas_blend.to_field_major(rows_g2, chunk)

    # Static per-entry geometry: ONE w16 row gather of a pose-independent
    # table (mean3 f32 | cov3d f32 x6 | opacity | pad). Row-count-bound
    # like every XLA gather here (~114M rows/s) — ~T*cap rows, bin frames
    # only.
    cov3d = build_cov3d(scales, rotations, settings.scale_modifier)
    n = means3d.shape[0]
    geo_table = jnp.concatenate(
        [means3d, cov3d, opacities, jnp.zeros((n, 6), jnp.float32)], axis=1)
    geo = geo_table[g2]                                        # [Tcap, 16]

    cache = BinCache(
        template=entry_geom, geo=geo, kept=kept,
        total_entries=total, live_total=live_total,
        max_tile_count=sat_bound.max())
    return cache, entry_geom


def steady_entry_geom(settings, cache: BinCache, viewmatrix, projmatrix):
    """Rebuild the pose-dependent row fields against the frozen binning.

    Runs `projection.project_gaussians` (the exact same closed-form EWA as
    the fresh path, via its cov3d_precomp branch) on the cached per-ENTRY
    arrays and overwrites fields 0:4 (x, y, ca|cb, cc|op) of the template.
    Entries behind the near plane at the new pose get opacity 0.
    """
    from . import pallas_blend

    H, W = settings.image_height, settings.image_width
    mean_e = cache.geo[:, 0:3]
    cov_e = cache.geo[:, 3:9]
    op_e = cache.geo[:, 9]
    xy, depth, conic, _radius, _, _ = projection.project_gaussians(
        mean_e, None, None, cov_e, viewmatrix, projmatrix,
        settings.tanfovx, settings.tanfovy, W, H, settings.scale_modifier)
    op_live = jnp.where(depth > 0.2, op_e, 0.0)
    dyn = jnp.stack([
        xy[:, 0], xy[:, 1],
        pallas_blend._pack2bf16(conic[:, 0], conic[:, 1]),
        pallas_blend._pack2bf16(conic[:, 2], op_live),
    ], axis=0)                                                 # [4, Tcap]
    e_pad = cache.template.shape[1]
    dyn = jnp.pad(dyn, ((0, 0), (0, e_pad - dyn.shape[1])))
    return jnp.concatenate([dyn, cache.template[4:]], axis=0)


def rasterize_quick_steady(
    settings, cache: BinCache, viewmatrix, projmatrix, bg,
    quick_channels: int = 192, topk: int = 12,
    phi=None, gram=None,
):
    """One steady frame against a frozen binning: dense EWA + blend only.

    Without phi/gram: returns (rgb_tiles [T,P,3], feat_tiles [T,P,C],
    final_t [T,P]) — tile layout (the query contracts channels, so the
    [C,H,W] scatter is the caller's choice, mirroring settings.assemble).
    With phi/gram: the fused Gram query epilogue
    (pallas_blend.blend_tiles_query) — returns (rgb_tiles, raw, nrm2,
    final_t).
    """
    from . import pallas_blend
    from .rasterize import _pallas_supported

    interp = not _pallas_supported()
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    cap = settings.tile_budget_cap
    chunk = min(256, max(cap, 128))
    entry_geom = steady_entry_geom(settings, cache, viewmatrix, projmatrix)
    dense_start = jnp.arange(num_tiles, dtype=jnp.int32) * cap
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    banded = (quick_channels % 64 == 0
              and topk % (quick_channels // 64) == 0)
    if phi is not None:
        return pallas_blend.blend_tiles_query(
            entry_geom, dense_start, cache.kept, tile_ids, bg, phi, gram,
            grid_x=grid_x, grid_y=grid_y, out_channels=quick_channels,
            topk=topk, chunk=chunk, banded=banded,
            bf16_cells=settings.bf16_cells, interpret=interp)
    ef = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)
    return pallas_blend.blend_tiles_pallas(
        entry_geom, ef, dense_start, cache.kept, tile_ids, bg,
        grid_x=grid_x, grid_y=grid_y, mode="quick",
        out_channels=quick_channels, topk=topk, chunk=chunk,
        rowfmt="fast16", banded=banded, bf16_cells=settings.bf16_cells,
        feat_bf16=settings.feat_bf16, interpret=interp)


def motion_px(c2w0, c2w1, image_width: int, fovx: float,
              z_ref: float = 2.0) -> float:
    """Conservative estimate of image motion (pixels) between two poses.

    rotation: angle * focal_px (exact for small in-plane pans, an upper
    proxy otherwise); translation: |dt| / z_ref * focal_px with z_ref the
    assumed nearest relevant scene depth. Host-side (numpy) — this guards
    the *policy*, the error itself is measured by the bench curve.
    """
    import numpy as np

    f = 0.5 * image_width / math.tan(fovx / 2)
    r0 = np.asarray(c2w0)[:3, :3]
    r1 = np.asarray(c2w1)[:3, :3]
    dt = float(np.linalg.norm(np.asarray(c2w1)[:3, 3]
                              - np.asarray(c2w0)[:3, 3]))
    cos = (float(np.trace(r0.T @ r1)) - 1.0) / 2.0
    theta = float(np.arccos(np.clip(cos, -1.0, 1.0)))
    return f * (theta + dt / z_ref)
