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
from jax import lax

from . import binning, projection, rasterize_tiles
from .projection import BLOCK


def _pallas_supported() -> bool:
    """True when the default backend compiles Pallas TPU kernels natively."""
    import jax as _jax
    return "tpu" in _jax.default_backend().lower() or any(
        "tpu" in d.platform.lower() or "TPU" in str(d)
        for d in _jax.devices()[:1])


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
    # Implementation: "xla" (differentiable reference pipeline),
    # "pallas" (streaming TPU kernels, forward/inference),
    # "auto" (pallas for quick-mode inference, xla otherwise).
    impl: str = "auto"
    # Pallas binning strategy: "sort" (entry expansion + packed-key sort +
    # XLA pack gather — the measured-fastest path on v5e) or "cascade"
    # (depth-sort N gaussians + streaming partition passes; order-preserving
    # and gather-free, but the per-append cost of its partition passes loses
    # to the XLA gather at bench scale — kept as a parity cross-check and as
    # the basis of the gaussian-sharded exchange).
    binning: str = "sort"
    # Numerics of the Pallas quick path: "f32" (parity with the XLA
    # reference blend) or "bf16" (fast16 packed rows: ONE w16 entry gather,
    # bf16 MXU blend — ~1e-3 relative output error, for serving/query).
    precision: str = "f32"
    # fast16 only: run the per-entry VPU cell math (alpha chain, channel
    # expansion) in bf16 for 2x lane packing (~1e-2 relative — still inside
    # the fast serving contract). Ignored outside precision="bf16".
    bf16_cells: bool = False
    # fast16 only: store the [T, P, C] output tiles (feature AND packed RGB
    # columns) in bf16 — serving consumers cast the weight map to bf16
    # anyway, and halving the map's HBM write+read is worth ~2-4 ms/frame
    # at the reference load. Accumulation stays f32 in VMEM. Disable for
    # f32-exact RGB/feature tiles (quality tests, parity checks).
    feat_bf16: bool = True
    # When False, the quick-mode feature map is returned in tile layout
    # [T, P, C] (T row-major tiles, P=256 pixels) instead of [C, H, W]:
    # relevancy queries contract the channel axis anyway, so skipping the
    # [C, H, W] scatter saves a full HBM rewrite of the 192-channel map.
    assemble: bool = True
    # Post-cull entry budget for the gather+blend stages (0 = max_entries).
    # The exact conic cull marks dead entries in expansion and the sort
    # moves them to the END, so live entries are a PREFIX of the sorted
    # order: sizing the row gather to the live count (reported as
    # aux live_total) instead of the pre-cull budget skips gathering rows
    # nothing will ever blend (~25% of the gather at bench density).
    # Segments past the budget are clamped (overflow shows as
    # live_total > live_entries).
    live_entries: int = 0
    # binning="gauss": per-(src,dst) exchange capacity (0 = auto from
    # max_entries); overflow reported as dropped_entries.
    pair_capacity: int = 0
    # OPT-IN approximate serving mode (> 0 enables): per tile, keep only
    # the depth-prefix of entries whose transmittance BOUND
    # prod(1 - alpha_max) stays >= tile_budget (alpha_max = the entry's
    # max possible alpha anywhere in the tile, from the exact cull).
    # Because alpha(pixel) <= alpha_max the bound saturates no later than
    # any pixel -> it drops only entries the bound says are invisible,
    # but the bound can be loose (corner-hugging splats), so outputs are
    # approximate: error scale ~ tile_budget. The win: the sorted-row
    # gather and the blend become REGULAR [T, tile_budget_cap] fetches —
    # row count per frame drops from the live total (~4M at bench scale)
    # to T*cap (~1M), the measured-dominant frame cost. fast16 quick
    # paths only.
    tile_budget: float = 0.0
    # Fixed per-tile entry capacity of the budget-capped layout (128-lane
    # granularity). Tiles whose budget prefix exceeds it are clamped;
    # telemetry: RasterizeOutput.max_tile_count carries the PRE-clamp
    # per-tile maximum (> cap reveals saturation) and live_total the
    # pre-clamp budget-visible entry total.
    tile_budget_cap: int = 128
    # Sub-boxes per tile axis for the budget bound (1, 2, or 4). Each
    # 4 sub-boxes cost one extra u32 sort-payload word (~3 ms at 5M
    # entries); finer boxes tighten the bound enormously (measured output
    # error on an opaque scene at budget 1e-8: subdiv 1 ~ 5e-1 max,
    # subdiv 2 ~ 9e-2, subdiv 4 ~ 1e-2).
    tile_budget_subdiv: int = 2
    # Exact-cull alpha threshold for the Pallas serving paths. 1/255 (the
    # default) is OUTPUT-PRESERVING: it drops only (gaussian, tile)
    # entries that can never pass the blend's alpha >= 1/255 mask. Larger
    # values are an OPT-IN approximation for the budget-capped serving
    # mode: entries whose maximum possible alpha anywhere in their tile is
    # below cull_alpha are dropped at expansion (and the preprocess tile
    # rects shrink to the same bound), cutting the entry count — and with
    # it the expand/sort/budget stages, the measured majority of the
    # capped frame — by ~ln(op/tau')/ln(op*255). Per-pixel bias is
    # bounded by the sum of dropped alphas; the quality gate is the same
    # relevancy-mask IoU >= 0.95 pin as tile_budget's.
    cull_alpha: float = 1.0 / 255.0

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
    # [] int32: entries surviving the exact cull (sum of tile segment
    # lengths BEFORE live_entries clamping) — the telemetry that sizes
    # settings.live_entries, and its overflow check. None on paths that
    # don't bin via the sorted-prefix pipeline.
    live_total: jnp.ndarray | None = None
    # [] int32: gauss-sharded path only — entries dropped because a
    # (src chip, dst chip) exchange pair overflowed pair_capacity.
    dropped_entries: jnp.ndarray | None = None


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
    quick_train: bool = False,  # quick args are a TRAINING representation:
                                # d(quick_weights) must flow (feature phase)
    mesh=None,                  # jax Mesh for settings.binning == "gauss"
) -> RasterizeOutput:
    H, W = settings.image_height, settings.image_width

    if settings.binning == "gauss":
        # Gaussian-sharded forward (parallel/gauss_sharded.py): each chip
        # owns an N/C shard, bins it locally, and an all-to-all delivers
        # (row, key) payloads to the tile owners — the Mip-NeRF360-scale
        # path where replicating the Gaussians is impossible.
        assert mesh is not None, 'binning="gauss" needs a 1-D "gauss" mesh'
        from ..parallel.gauss_sharded import rasterize_gauss_sharded

        rgb, feat, final_t, total, dropped, radii = rasterize_gauss_sharded(
            mesh, settings._replace(binning="sort"), means3d, opacities,
            viewmatrix, projmatrix, campos, bg, scales=scales,
            rotations=rotations, colors_precomp=colors_precomp, shs=shs,
            quick_weights=quick_weights, quick_indices=quick_indices,
            quick_channels=quick_channels,
            pair_capacity=settings.pair_capacity or None)
        return RasterizeOutput(
            rgb=rgb, feature_map=feat, radii=radii,
            final_transmittance=final_t,
            max_tile_count=jnp.asarray(0, jnp.int32),
            total_entries=total, dropped_entries=dropped)

    if quick_train and quick_weights is not None:
        # Feature-phase training via the top-k representation: on TPU the
        # Pallas quick forward + W-replay backward (pallas_train.py —
        # avoids the dense path's wide-row feature gather); elsewhere the
        # XLA one-hot einsum below is differentiable as-is.
        route_pallas = settings.impl == "pallas" or (
            settings.impl == "auto" and _pallas_supported())
        if route_pallas and cov3d_precomp is None:
            from .pallas_train import rasterize_quick_train

            rgb, feat, final_t, radii, mtc, tot, live_tot = \
                rasterize_quick_train(
                    settings, means3d, opacities, viewmatrix, projmatrix,
                    campos, bg, scales, rotations, shs, colors_precomp,
                    quick_weights, quick_indices, quick_channels)
            return RasterizeOutput(
                rgb=rgb, feature_map=feat, radii=radii,
                final_transmittance=final_t, max_tile_count=mtc,
                total_entries=tot, live_total=live_tot)
        use_pallas = False
    else:
        # "auto": Pallas for quick-mode inference anywhere, and for RGB
        # mode on real TPUs (the Pallas forward+backward sustains
        # production scale where the XLA autodiff blend's [tiles, P, cap]
        # temps OOM; on CPU the XLA pipeline stays the reference).
        use_pallas = settings.impl == "pallas" or (
            settings.impl == "auto" and (
                quick_weights is not None
                or (features is None and cov3d_precomp is None
                    and settings.binning == "sort" and _pallas_supported())))
    if use_pallas:
        if (features is not None and quick_weights is None
                and cov3d_precomp is None):
            # Dense (feature-training) mode: Pallas forward + custom-VJP
            # backward. Contract: only d(features) is produced (geometry is
            # frozen in the feature phase, reference train.py:212-259).
            from .pallas_train import rasterize_dense_vjp

            rgb, feat, final_t, radii, mtc, tot = rasterize_dense_vjp(
                settings, means3d, opacities, viewmatrix, projmatrix,
                campos, bg, scales, rotations, shs, colors_precomp, features)
            return RasterizeOutput(
                rgb=rgb, feature_map=feat, radii=radii,
                final_transmittance=final_t, max_tile_count=mtc,
                total_entries=tot)
        if (features is None and quick_weights is None
                and cov3d_precomp is None and settings.binning == "sort"):
            # RGB mode on the sort path: Pallas forward AND backward
            # (geometry-phase training contract — pallas_rgb_train.py).
            from .pallas_rgb_train import rasterize_rgb_vjp

            rgb, final_t, radii, mtc, tot = rasterize_rgb_vjp(
                settings, means3d, opacities, viewmatrix, projmatrix,
                campos, bg, scales, rotations, shs, colors_precomp,
                means2d_dummy=means2d_dummy)
            return RasterizeOutput(
                rgb=rgb, feature_map=None, radii=radii,
                final_transmittance=final_t, max_tile_count=mtc,
                total_entries=tot)
        return _rasterize_pallas(
            settings, means3d, opacities, viewmatrix, projmatrix, campos, bg,
            scales=scales, rotations=rotations, cov3d_precomp=cov3d_precomp,
            shs=shs, colors_precomp=colors_precomp, features=features,
            quick_weights=quick_weights, quick_indices=quick_indices,
            quick_channels=quick_channels)

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
        blend_features = jnp.einsum("ns,nsc->nc", quick_weights, onehot,
                                    precision=jax.lax.Precision.HIGHEST)
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


def _rasterize_pallas(
    settings: RasterizeSettings,
    means3d, opacities, viewmatrix, projmatrix, campos, bg,
    scales=None, rotations=None, cov3d_precomp=None,
    shs=None, colors_precomp=None, features=None,
    quick_weights=None, quick_indices=None, quick_channels: int = 192,
) -> RasterizeOutput:
    """Streaming-kernel forward pipeline (inference fast path).

    Two binning strategies (settings.binning):
    - "sort" (default): preprocess (XLA) -> pallas entry expansion ->
      packed two-word u32 key sort -> entry pack gather -> blend. The
      measured-fastest path on v5e.
    - "cascade": depth-sort the N gaussians + ONE N-row gather, then
      order-preserving Pallas partition passes stream the packed rows into
      per-tile depth-sorted segments (pallas_cascade.py). Bit-identical
      segments; slower at bench scale (per-append partition cost).

    settings.precision == "bf16" additionally switches the quick path to
    the fast16 packed single-gather format (see pallas_blend module doc).
    """
    from . import pallas_binning, pallas_blend

    H, W = settings.image_height, settings.image_width
    grid_x, grid_y, num_tiles = settings.grid_x, settings.grid_y, settings.grid_x * settings.grid_y
    interp = not _pallas_supported()
    chunk = 256

    proj = projection.preprocess(
        means3d, scales, rotations, cov3d_precomp, shs, colors_precomp,
        viewmatrix, projmatrix, campos,
        settings.tanfovx, settings.tanfovy, W, H,
        settings.sh_degree, settings.scale_modifier,
        opacities=opacities[:, 0],   # opacity-aware tight tile rects
        cull_alpha=settings.cull_alpha,
    )

    if settings.binning == "cascade" and features is None:
        from . import pallas_cascade

        geom_rows, feat_rows = pallas_cascade.pack_cascade_rows(
            proj, opacities[:, 0], quick_weights, quick_indices)
        budget4 = -(-settings.max_entries // 128) * 128
        entries, tile_start, tile_count, total, overflow = \
            pallas_cascade.cascade_binning(
                geom_rows, feat_rows, jax.lax.stop_gradient(proj.depth),
                grid_x, grid_y, budget4=budget4, interpret=interp)
        # A budget-clamped cascade level silently drops entries; fold the
        # flag into the total so the caller's existing overflow telemetry
        # (total_entries >= max_entries) detects it like on the sort path.
        total = jnp.where(overflow, jnp.maximum(total, budget4), total)
        if quick_weights is not None:
            mode, out_channels = "quick", quick_channels
            topk = quick_weights.shape[1]
        else:
            mode, out_channels, topk = "rgb", 0, 12
        dummy_feat = jnp.zeros((1, 1), jnp.float32)
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
        rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
            entries, dummy_feat, tile_start, tile_count, tile_ids, bg,
            grid_x=grid_x, grid_y=grid_y, mode=mode,
            out_channels=out_channels, topk=topk, chunk=chunk,
            combined=True, interpret=interp)

        return _assemble(settings, proj, rgb_t, feat_t, t_t,
                         tile_count, total)

    capped = (settings.tile_budget > 0.0 and quick_weights is not None
              and settings.precision == "bf16")
    if capped:
        g_used_c, tile_start, raw_counts, total = _capped_quick_binning(
            settings, proj, opacities, interp)
        # Per-tile entry counts are <= tile_budget_cap by construction:
        # shrinking the blend chunk to the cap halves the VPU cell area
        # (and quarters the [chunk, chunk] transmittance matmul) at
        # cap 128 — chunk-256 programs would mask out dead lanes instead.
        chunk = min(chunk, max(settings.tile_budget_cap, 128))
    else:
        g_sorted, tile_start, tile_count, total, live_total = \
            _sorted_quick_binning(settings, proj, opacities, interp)
        telemetry_counts = tile_count

    if quick_weights is not None:
        mode, out_channels = "quick", quick_channels
        topk = quick_weights.shape[1]
        if settings.precision == "bf16":
            # fast16: the whole quick entry state in ONE packed w16 row ->
            # a single row-count-bound XLA gather instead of two.
            rows = pallas_blend.pack_fast16_rows(
                proj.xy, proj.conic, opacities[:, 0], proj.rgb,
                quick_weights, quick_indices)
            if capped:
                rows_g2 = rows[g_used_c]
                tile_count, telemetry_counts, live_total = \
                    _capped_kept_from_rows(
                        settings, rows_g2, raw_counts, "fast16")
                entry_geom = pallas_blend.to_field_major(rows_g2, chunk)
            else:
                entry_geom = pallas_blend.to_field_major(
                    rows[g_sorted], chunk)
            entry_feat = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)
            banded = (quick_channels % 64 == 0
                      and topk % (quick_channels // 64) == 0)
            tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
            rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
                entry_geom, entry_feat, tile_start, tile_count, tile_ids,
                bg, grid_x=grid_x, grid_y=grid_y, mode="quick",
                out_channels=out_channels, topk=topk, chunk=chunk,
                rowfmt="fast16", banded=banded,
                bf16_cells=settings.bf16_cells,
                feat_bf16=settings.feat_bf16, interpret=interp)
            return _assemble(settings, proj, rgb_t, feat_t, t_t,
                             telemetry_counts, total, live_total)
        rows, wrows = pallas_blend.pack_quick_rows(
            proj.xy, proj.conic, opacities[:, 0], proj.rgb,
            quick_weights, quick_indices)
        entry_geom = pallas_blend.to_field_major(rows[g_sorted], chunk)
        entry_feat = pallas_blend.to_field_major(wrows[g_sorted], chunk)
    else:
        rows = pallas_blend.pack_gaussian_rows(
            proj.xy, proj.conic, opacities[:, 0], proj.rgb)
        topk = 12
        if features is not None:
            mode, out_channels = "dense", features.shape[1]
        else:
            mode, out_channels = "rgb", 0
        entry_geom = pallas_blend.to_field_major(rows[g_sorted], chunk)
        if mode == "dense":
            entry_feat = pallas_blend.to_field_major(features[g_sorted], chunk)
        else:
            entry_feat = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
        entry_geom, entry_feat, tile_start, tile_count, tile_ids, bg,
        grid_x=grid_x, grid_y=grid_y, mode=mode, out_channels=out_channels,
        topk=topk, chunk=chunk, interpret=interp)
    return _assemble(settings, proj, rgb_t, feat_t, t_t, tile_count, total,
                     live_total)


def _sorted_quick_binning(settings, proj, opacities, interp):
    """Shared Pallas-path binning: expand -> packed-key sort -> tile
    ranges, with the optional live-prefix clamp (settings.live_entries).

    Dead (exact-culled / beyond-total) entries carry the sentinel tile and
    sort to the END, so the live entries form a prefix of the sorted
    order; when live_entries > 0 the returned g_sorted is that prefix and
    tile segments are clamped to it. Returns
    (g_sorted, tile_start, tile_count, total, live_total)."""
    from . import pallas_binning

    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
        proj, grid_x, grid_y, settings.max_entries,
        opacities=opacities[:, 0], exact_cull=True,
        cull_alpha=settings.cull_alpha, interpret=interp)
    keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
    g_sorted, tile_start, tile_count, _ = \
        pallas_binning.sorted_binning_from_keys(keys, num_tiles)
    live_total = jnp.sum(tile_count)
    live = settings.live_entries
    if 0 < live < settings.max_entries:
        g_sorted = g_sorted[:live]
        tile_count = jnp.clip(
            jnp.minimum(tile_count, live - tile_start), 0, None)
    return g_sorted, tile_start, tile_count, total, live_total


def _capped_quick_binning(settings, proj, opacities, interp):
    """Binning for the OPT-IN settings.tile_budget mode (round-5 form):
    expansion emits plain (tile, depth, gauss) — NO in-kernel alpha-bound
    emission — the key sort carries TWO operands only, and the sorted
    gauss ids are fetched with a REGULAR vmapped dynamic_slice into the
    dense [T, tile_budget_cap] layout. The transmittance-bound budget is
    computed AFTER the row gather by `_capped_kept_from_rows` (the bound
    is a pure function of the gathered xy/conic/opacity plus the tile
    box — pallas_binning.budget_from_rows), which round-5 measured as the
    cheaper structure: the round-4 form paid +2.3 ms of sort payload,
    +2 ms of lm-window slicing and the in-kernel sub-box emission for
    information the blend's own input rows already carry.

    Approximate by design (error scale ~ tile_budget; see the settings
    docstring). Returns (g2 [T*cap], dense_start [T] = t*cap,
    tile_count [T] raw per-tile counts (pre-budget, for the window mask
    and saturation telemetry), total)."""
    from . import pallas_binning

    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    cap = settings.tile_budget_cap
    assert cap % 128 == 0, "tile_budget_cap must be 128-lane aligned"
    tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
        proj, grid_x, grid_y, settings.max_entries,
        opacities=opacities[:, 0], exact_cull=True,
        cull_alpha=settings.cull_alpha, interpret=interp)
    keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
    g_sorted, tile_start, tile_count, _tile_sorted = \
        pallas_binning.sorted_binning_from_keys(keys, num_tiles)
    g2 = pallas_binning.slice_windows(g_sorted, tile_start, cap)
    dense_start = jnp.arange(num_tiles, dtype=jnp.int32) * cap
    return g2.reshape(-1), dense_start, tile_count, total


def _capped_kept_from_rows(settings, rows_g2, tile_count, rowfmt: str):
    """Budget counts for the dense window from the gathered entry rows
    themselves (see _capped_quick_binning). rows_g2 [T*cap, 16] in
    "fast16" (conic/op as bf16 pairs) or "f32" layout (x y ca cb cc op).
    Returns (kept [T] blend counts <= min(cap, tile_cap), sat_bound [T]
    saturation telemetry, live_total [])."""
    from . import pallas_binning, pallas_blend

    cap = settings.tile_budget_cap
    if rowfmt == "fast16":
        xy = rows_g2[:, 0:2]
        ca = pallas_blend._unpack_hi(rows_g2[:, 2])
        cb = pallas_blend._unpack_lo(rows_g2[:, 2])
        cc = pallas_blend._unpack_hi(rows_g2[:, 3])
        op = pallas_blend._unpack_lo(rows_g2[:, 3])
        conic = jnp.stack([ca, cb, cc], axis=1)
    else:
        xy = rows_g2[:, 0:2]
        conic = rows_g2[:, 2:5]
        op = rows_g2[:, 5]
    kept, sat_bound = pallas_binning.budget_from_rows(
        xy, conic, op, tile_count, settings.grid_x, cap,
        settings.tile_budget_subdiv, settings.tile_budget)
    kept = jnp.minimum(kept, settings.tile_cap)
    return kept, sat_bound, jnp.sum(kept)


def _assemble(settings, proj, rgb_t, feat_t, t_t, tile_count, total,
              live_total=None) -> RasterizeOutput:
    """Tile-layout blend outputs -> RasterizeOutput. RGB and final-T are
    always assembled to image layout (cheap); the feature map stays in
    [T, P, C] tile layout when settings.assemble is False (the query path
    contracts channels and never needs the [C, H, W] scatter)."""
    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    rgb = rasterize_tiles.tiles_to_image(rgb_t, grid_x, grid_y, H, W)
    if feat_t is None:
        feat = None
    elif settings.assemble:
        feat = rasterize_tiles.tiles_to_image(feat_t, grid_x, grid_y, H, W)
    else:
        feat = feat_t
    final_t = rasterize_tiles.tiles_to_image(
        t_t[..., None], grid_x, grid_y, H, W)[0]
    return RasterizeOutput(
        rgb=rgb, feature_map=feat, radii=proj.radius,
        final_transmittance=final_t,
        max_tile_count=tile_count.max(),
        total_entries=total,
        live_total=live_total,
    )


def rasterize_quick_query(
    settings: RasterizeSettings,
    means3d, opacities, viewmatrix, projmatrix, campos, bg,
    scales=None, rotations=None, shs=None, colors_precomp=None,
    quick_weights=None, quick_indices=None,
    phi=None,                 # [L, K, PQ] codebook . phrase embeddings
    gram=None,                # [L, K, K] codebook Gram matrices
    quick_channels: int = 192,
):
    """The production serving frame: fast16 quick render with the Gram
    relevancy query FUSED into the blend kernel epilogue
    (pallas_blend.blend_tiles_query) — the [T, P, L*K] weight-map tiles
    never reach HBM; only per-prompt raw scores and per-level norms do.

    Numerically matches the reference's decode-then-dot relevancy
    (eval_lerf.py:210-220) the same way the unfused Gram query does
    (bf16 einsum fidelity, the fast-mode contract). Returns
    (rgb [3,H,W], raw [T,P,L*PQ], nrm2 [T,P,L], final_T [H,W],
    radii [N], total_entries [], live_total [])."""
    from . import pallas_blend

    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    interp = not _pallas_supported()
    chunk = 256

    proj = projection.preprocess(
        means3d, scales, rotations, None, shs, colors_precomp,
        viewmatrix, projmatrix, campos,
        settings.tanfovx, settings.tanfovy, W, H,
        settings.sh_degree, settings.scale_modifier,
        opacities=opacities[:, 0], cull_alpha=settings.cull_alpha)

    rows = pallas_blend.pack_fast16_rows(
        proj.xy, proj.conic, opacities[:, 0], proj.rgb,
        quick_weights, quick_indices)
    if settings.tile_budget > 0.0:
        g_used, tile_start, raw_counts, total = _capped_quick_binning(
            settings, proj, opacities, interp)
        rows_used = rows[g_used]
        tile_count, _sat, live_total = _capped_kept_from_rows(
            settings, rows_used, raw_counts, "fast16")
        # Counts <= cap: chunk = cap halves the blend's VPU cell area at
        # cap 128 (see the capped branch in rasterize()).
        chunk = min(chunk, max(settings.tile_budget_cap, 128))
    else:
        g_used, tile_start, tile_count, total, live_total = \
            _sorted_quick_binning(settings, proj, opacities, interp)
        rows_used = rows[g_used]
    entry_geom = pallas_blend.to_field_major(rows_used, chunk)
    topk = quick_weights.shape[1]
    banded = (quick_channels % 64 == 0
              and topk % (quick_channels // 64) == 0)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    rgb_t, raw_t, nrm2_t, t_t = pallas_blend.blend_tiles_query(
        entry_geom, tile_start, tile_count, tile_ids, bg, phi, gram,
        grid_x=grid_x, grid_y=grid_y, out_channels=quick_channels,
        topk=topk, chunk=chunk, banded=banded,
        bf16_cells=settings.bf16_cells, interpret=interp)
    rgb = rasterize_tiles.tiles_to_image(rgb_t, grid_x, grid_y, H, W)
    final_t = rasterize_tiles.tiles_to_image(
        t_t[..., None], grid_x, grid_y, H, W)[0]
    return rgb, raw_t, nrm2_t, final_t, proj.radius, total, live_total
