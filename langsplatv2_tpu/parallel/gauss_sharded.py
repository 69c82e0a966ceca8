"""Gaussian-sharded rasterization with a binning all-to-all.

The replicated-Gaussian tile sharding (parallel/sharding.py) holds every
Gaussian on every chip — fine at LERF scale, impossible for Mip-NeRF360-
scale scenes (SURVEY.md §2.4 row 3; the reference handles such scenes with
one GPU's global radix sort). This module is the TPU-native replacement:

1. Each chip owns an N/C shard of the Gaussians. It preprocesses and
   expands ONLY its shard into (tile, depth, gauss) entries and packs each
   entry's full blend row (geometry + quick payload) — tile owners never
   need the Gaussian arrays themselves.
2. One local sort by the packed (tile|depth, gauss) key groups entries by
   destination chip for free (tile ids are contiguous per owner strip:
   owner = tile // tiles_per_shard), giving per-destination segments.
3. A fixed-capacity `lax.all_to_all` over the "gauss" axis exchanges
   (row, key) payloads — keys ride bitcast into two f32 columns. This is
   the ICI collective that replaces the reference's single-device radix
   sort at scale.
4. Each chip re-sorts its received entries by the same key (global depth
   order per tile, identical to the replicated path's — keys carry the
   GLOBAL gaussian id, so even tie-breaks match) and blends its tile strip
   with the streaming Pallas kernel, which consumes entry rows directly.

Per-pair capacity is static (XLA needs static shapes); overflow is counted
and reported, mirroring the entry-budget telemetry of the single-chip path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .sharding import shard_map
from ..ops import projection, rasterize_tiles, pallas_binning, pallas_blend
from ..ops.rasterize import RasterizeSettings, _pallas_supported


def _key_words(num_tiles: int, n_total: int) -> int:
    """Sort-key words for the exchanged (tile|depth|gauss) key.

    The 2-word layout holds the GLOBAL gaussian id in 20 bits of `lo`
    (pack_sort_keys) — exceeding it would OR id bits into the depth
    low-mantissa field and silently corrupt within-tile depth order, so
    grids above 8190 tiles OR total N above 2^20 take the 3-word key."""
    wide = num_tiles >= (1 << 13) - 1 or n_total > (1 << 20)
    return 3 if wide else 2


def _tile_of(k0, nk: int):
    """Tile id from the first sorted key word, for either key layout."""
    return (k0 >> 19).astype(jnp.int32) if nk == 2 else k0.astype(jnp.int32)


def _expand_exchange(proj, ops, qw, qi, *, axis, C, n_loc, tiles_per,
                     num_tiles, grid_x, grid_y, local_budget, cap, interp,
                     quick):
    """Per-shard expansion, local sort, and the binning all-to-all.

    Runs INSIDE a shard_map body. Returns the receiver-side sorted rows +
    binning tables, plus the send-side routing residuals
    (perm2, flat_idx, live, src_g) the training backward needs to route
    per-entry gradients back through the (self-transposed) all-to-all.
    """
    idx = lax.axis_index(axis)
    nk = _key_words(num_tiles, C * n_loc)
    # NOTE: the jitted entry points must be called unwrapped inside
    # shard_map — a nested jit pins replicated output shardings that
    # conflict with the "gauss" specs.
    tile, depth, gauss_l, total_l = (
        pallas_binning.expand_entries_pallas.__wrapped__(
            proj, grid_x, grid_y, local_budget, opacities=ops[:, 0],
            exact_cull=True, max_windows=None, interpret=interp))
    gauss_g = gauss_l + idx * n_loc          # global id: exact tie-break
    keys = pallas_binning.pack_sort_keys(tile, depth, gauss_g, num_tiles,
                                         force_wide=(nk == 3))
    assert len(keys) == nk
    perm0 = jnp.arange(local_budget, dtype=jnp.uint32)
    *keys_s, perm = lax.sort((*keys, perm0), num_keys=nk, is_stable=True)
    if quick:
        rows, wrows = pallas_blend.pack_quick_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb, qw, qi)
    else:
        rows = pallas_blend.pack_gaussian_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb)
        wrows = None
    src_g = gauss_l[perm.astype(jnp.int32)]
    ent_rows = rows[src_g]                   # [budget, 16] sorted order
    ent_w = wrows[src_g] if quick else None

    # Destination segments: entries are tile-sorted, and owners hold
    # contiguous tile strips, so chip d's slice is
    # [lower(d*tiles_per), lower((d+1)*tiles_per)).
    tile_sorted = _tile_of(keys_s[0], nk)
    nb = max(1, int(np.ceil(np.log2(local_budget + 1))) + 1)
    dbounds = pallas_binning._vectorized_searchsorted_left(
        tile_sorted,
        jnp.arange(C + 1, dtype=jnp.int32) * tiles_per, nb)
    # Dead entries (sentinel tile) sort after every real one; clamping
    # the bounds to the live total keeps them out of the exchange (they
    # must not eat pair capacity or read as overflow).
    dbounds = jnp.minimum(dbounds, total_l)
    dcount = dbounds[1:] - dbounds[:-1]
    dropped_local = jnp.sum(jnp.maximum(dcount - cap, 0))

    # Gather each destination's (capped) segment into the send buffer.
    send_idx = dbounds[:-1, None] + jnp.arange(cap, dtype=jnp.int32)[None]
    live = jnp.arange(cap, dtype=jnp.int32)[None, :] < \
        jnp.minimum(dcount, cap)[:, None]
    flat_idx = jnp.minimum(send_idx, local_budget - 1).reshape(-1)
    bc = lambda a: lax.bitcast_convert_type(a, jnp.float32)
    key_cols = jnp.stack([bc(k) for k in keys_s], axis=1)  # [budget, nk]
    payload = [ent_rows, key_cols] + ([ent_w] if quick else [])
    payload = jnp.concatenate(payload, axis=1)
    sendbuf = jnp.where(live.reshape(-1, 1), payload[flat_idx], 0.0)
    # Dead rows: sentinel first key word sorts to the end on the receiver
    # (the remaining key words are already zeroed by the live mask).
    sent0 = jnp.uint32(num_tiles) << 19 if nk == 2 else jnp.uint32(num_tiles)
    sent_k0 = bc(jnp.full((1,), sent0))
    sendbuf = sendbuf.at[:, 16].set(
        jnp.where(live.reshape(-1), sendbuf[:, 16], sent_k0[0]))
    sendbuf = sendbuf.reshape(C, cap, -1)

    recv = lax.all_to_all(sendbuf, axis, split_axis=0, concat_axis=0)
    recv = recv.reshape(C * cap, -1)                     # [C*cap, Wp]

    ub = lambda a: lax.bitcast_convert_type(a, jnp.uint32)
    keys2 = tuple(ub(recv[:, 16 + i]) for i in range(nk))
    perm0b = jnp.arange(C * cap, dtype=jnp.uint32)
    *keys2_s, perm2 = lax.sort((*keys2, perm0b), num_keys=nk,
                               is_stable=True)
    rows2 = recv[perm2.astype(jnp.int32)]
    tile2 = _tile_of(keys2_s[0], nk)

    nb2 = max(1, int(np.ceil(np.log2(C * cap + 1))) + 1)
    t0 = idx * tiles_per
    bounds = pallas_binning._vectorized_searchsorted_left(
        tile2, t0 + jnp.arange(tiles_per + 1, dtype=jnp.int32), nb2)
    tile_start = bounds[:-1].astype(jnp.int32)
    tile_count = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
    tile_ids = t0 + jnp.arange(tiles_per, dtype=jnp.int32)
    tile_ids = jnp.where(tile_ids < num_tiles, tile_ids, num_tiles)
    return (rows2, tile2, tile_start, tile_count, tile_ids, perm2,
            flat_idx, live, src_g, total_l, dropped_local)


def rasterize_gauss_sharded(
    mesh: Mesh,
    settings: RasterizeSettings,
    means3d, opacities, viewmatrix, projmatrix, campos, bg,
    scales=None, rotations=None, colors_precomp=None, shs=None,
    quick_weights=None, quick_indices=None, quick_channels: int = 192,
    *,
    axis: str = "gauss",
    pair_capacity: int | None = None,
):
    """Forward render with Gaussians sharded over `axis` (a 1-D mesh axis;
    the same chips own contiguous tile strips). Per-Gaussian arrays must be
    shardable: N divisible by mesh.shape[axis]. Colors come either
    precomputed (`colors_precomp`) or as SH coefficients (`shs` [N, B, 3],
    evaluated IN-SHARD during preprocessing — embarrassingly parallel over
    the gauss axis; the exchange payload carries the resulting RGB either
    way).

    Returns (rgb [3,H,W], feature_map | None, final_t [H,W],
    total_entries [], dropped_entries []) — `dropped_entries` > 0 means a
    (src chip, dst chip) pair overflowed `pair_capacity`.
    """
    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    C = mesh.shape[axis]
    tiles_per = -(-num_tiles // C)
    n = means3d.shape[0]
    assert n % C == 0, "pad per-Gaussian arrays to a multiple of the axis"
    n_loc = n // C
    local_budget = -(-settings.max_entries // C)
    cap = pair_capacity or -(-local_budget // max(C // 2, 1))
    cap = -(-cap // 128) * 128
    interp = not _pallas_supported()
    chunk = 256
    quick = quick_weights is not None

    zeros_n = jnp.zeros((n,), jnp.float32)
    use_shs = colors_precomp is None and shs is not None
    cols_in = colors_precomp if colors_precomp is not None else \
        jnp.zeros((n, 3), jnp.float32)
    shs_in = shs if use_shs else jnp.zeros((n, 1, 3), jnp.float32)
    qw_in = quick_weights if quick else jnp.zeros((n, 2), jnp.float32)
    qi_in = quick_indices if quick else jnp.zeros((n, 2), jnp.float32)

    ee = partial(_expand_exchange, axis=axis, C=C, n_loc=n_loc,
                 tiles_per=tiles_per, num_tiles=num_tiles, grid_x=grid_x,
                 grid_y=grid_y, local_budget=local_budget, cap=cap,
                 interp=interp, quick=quick)

    def shard_fn(means, ops, scs, rots, cols, sh_c, qw, qi, view, projm,
                 cpos, bgc):
        proj = projection.preprocess(
            means, scs, rots, None, sh_c if use_shs else None,
            None if use_shs else cols, view, projm, cpos,
            settings.tanfovx, settings.tanfovy, W, H,
            settings.sh_degree, settings.scale_modifier,
            opacities=ops[:, 0])
        (rows2, _tile2, tile_start, tile_count, tile_ids, _perm2, _fi, _lv,
         _sg, total_l, dropped_local) = ee(proj, ops, qw, qi)

        entry_geom = pallas_blend.to_field_major(rows2[:, :16], chunk)
        if quick:
            nk = _key_words(num_tiles, n)
            entry_feat = pallas_blend.to_field_major(
                rows2[:, 16 + nk:32 + nk], chunk)
            mode, out_ch, topk = "quick", quick_channels, qw.shape[1]
        else:
            entry_feat = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)
            mode, out_ch, topk = "rgb", 0, 12
        rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas.__wrapped__(
            entry_geom, entry_feat, tile_start, tile_count, tile_ids, bgc,
            grid_x=grid_x, grid_y=grid_y, mode=mode, out_channels=out_ch,
            topk=topk, chunk=chunk, tile_batch=8, combined=False,
            rowfmt="f32", banded=False, interpret=interp)
        total = lax.psum(total_l, axis)
        dropped = lax.psum(dropped_local, axis)
        if quick:
            return (rgb_t, feat_t, t_t, proj.radius, total, dropped)
        return (rgb_t, t_t, proj.radius, total, dropped)

    gspec = P(axis)
    out_specs = ((gspec, gspec, gspec, gspec, P(), P()) if quick
                 else (gspec, gspec, gspec, P(), P()))
    out = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(gspec, gspec, gspec, gspec, gspec, gspec, gspec, gspec,
                  P(), P(), P(), P()),
        out_specs=out_specs,
        check_rep=False,
    )(means3d, opacities,
      scales if scales is not None else jnp.ones((n, 3), jnp.float32),
      rotations if rotations is not None else
      jnp.concatenate([jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1),
      cols_in, shs_in, qw_in, qi_in, viewmatrix, projmatrix, campos,
      jnp.asarray(bg, jnp.float32))
    if quick:
        rgb_t, feat_t, t_t, radii, total, dropped = out
    else:
        rgb_t, t_t, radii, total, dropped = out
        feat_t = None

    rgb = rasterize_tiles.tiles_to_image(
        rgb_t[:num_tiles], grid_x, grid_y, H, W)
    feat = (rasterize_tiles.tiles_to_image(
        feat_t[:num_tiles], grid_x, grid_y, H, W)
        if feat_t is not None else None)
    final_t = rasterize_tiles.tiles_to_image(
        t_t[:num_tiles][..., None], grid_x, grid_y, H, W)[0]
    return rgb, feat, final_t, total, dropped, radii


def rasterize_gauss_sharded_feature_train(
    mesh: Mesh,
    settings: RasterizeSettings,
    means3d, opacities, viewmatrix, projmatrix, campos, bg,
    quick_weights, quick_indices, quick_channels: int,
    scales=None, rotations=None, colors_precomp=None, shs=None,
    *,
    axis: str = "gauss",
    pair_capacity: int | None = None,
):
    """Feature-phase TRAINING render with Gaussians sharded over `axis`.

    The forward is the gauss-sharded pipeline (per-shard expansion, local
    sort, binning all-to-all, tile-strip Pallas blend). The backward routes
    per-ENTRY feature gradients from each tile owner back to the Gaussian
    owners through the REVERSE all-to-all (the exchange's transpose is an
    all-to-all of the same capacity), scatter-reduces them onto the local
    Gaussian shard, and slices the dense per-gaussian gradient at the top-k
    lanes — exactly the single-chip quick-train VJP's reduction
    (ops/pallas_train.py), made distributed.

    FEATURE-PHASE CONTRACT (reference train.py:212-259): geometry frozen;
    only d(quick_weights) is produced, every other input gets zero.

    Returns (rgb [3,H,W], feat, final_t [H,W], total [], dropped []) where
    `feat` is [K,H,W] if settings.assemble else tile-space [T, P, K].
    """
    from ..ops import pallas_train

    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    C = mesh.shape[axis]
    tiles_per = -(-num_tiles // C)
    n = means3d.shape[0]
    assert n % C == 0, "pad per-Gaussian arrays to a multiple of the axis"
    n_loc = n // C
    local_budget = -(-settings.max_entries // C)
    cap = pair_capacity or -(-local_budget // max(C // 2, 1))
    cap = -(-cap // 128) * 128
    interp = not _pallas_supported()
    chunk = 256
    topk = quick_weights.shape[1]
    assert quick_channels <= pallas_train.GRAD_W, \
        "replay kernel emits GRAD_W-wide rows; train per level (K <= 128)"

    use_shs = colors_precomp is None and shs is not None
    cols_in = colors_precomp if colors_precomp is not None else \
        jnp.zeros((n, 3), jnp.float32)
    shs_in = shs if use_shs else jnp.zeros((n, 1, 3), jnp.float32)

    ee = partial(_expand_exchange, axis=axis, C=C, n_loc=n_loc,
                 tiles_per=tiles_per, num_tiles=num_tiles, grid_x=grid_x,
                 grid_y=grid_y, local_budget=local_budget, cap=cap,
                 interp=interp, quick=True)

    def _fwd_impl(means, ops, scs, rots, cols, sh_c, qw, qi, view, projm,
                  cpos, bgc):
        proj = projection.preprocess(
            means, scs, rots, None, sh_c if use_shs else None,
            None if use_shs else cols, view, projm, cpos,
            settings.tanfovx, settings.tanfovy, W, H,
            settings.sh_degree, settings.scale_modifier,
            opacities=ops[:, 0])
        (rows2, tile2, tile_start, tile_count, tile_ids, perm2, flat_idx,
         live, src_g, total_l, dropped_local) = ee(proj, ops, qw, qi)
        nk = _key_words(num_tiles, n)
        entry_geom = pallas_blend.to_field_major(rows2[:, :16], chunk)
        entry_feat = pallas_blend.to_field_major(
            rows2[:, 16 + nk:32 + nk], chunk)
        rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas.__wrapped__(
            entry_geom, entry_feat, tile_start, tile_count, tile_ids, bgc,
            grid_x=grid_x, grid_y=grid_y, mode="quick",
            out_channels=quick_channels, topk=topk, chunk=chunk,
            tile_batch=8, combined=False, rowfmt="f32", banded=False,
            interpret=interp)
        outputs = (rgb_t, feat_t, t_t, total_l, dropped_local)
        residuals = (entry_geom, tile2, tile_start, tile_count, tile_ids,
                     perm2, flat_idx, live, src_g, qi)
        return outputs, residuals

    @jax.custom_vjp
    def local_render(means, ops, scs, rots, cols, sh_c, qw, qi, view,
                     projm, cpos, bgc):
        return _fwd_impl(means, ops, scs, rots, cols, sh_c, qw, qi, view,
                         projm, cpos, bgc)[0]

    def local_fwd(*args):
        outputs, residuals = _fwd_impl(*args)
        return outputs, (residuals, args)

    def local_bwd(res, cotangents):
        (entry_geom, tile2, tile_start, tile_count, tile_ids, perm2,
         flat_idx, live, src_g, qi), args = res
        # Only the feature-map cotangent is consumed (feature-phase
        # contract — rgb/final_T/totals are intentionally dropped).
        _g_rgb, g_feat, _g_t, _g_tot, _g_drop = cotangents
        K = quick_channels
        # 1) Per-entry gradients on the tile owner (receiver-sorted order).
        dfeat = pallas_train.feature_grads_pallas(
            entry_geom, tile_start, tile_count, tile_ids, g_feat,
            grid_x=grid_x, grid_y=grid_y, feat_k=K, interpret=interp)
        E = C * cap
        dfeat = jnp.where((tile2 < num_tiles)[:, None], dfeat[:E, :K], 0.0)
        # 2) Un-sort to exchange order, then reverse all-to-all: the
        #    transpose of the forward exchange is the same split/concat.
        recv_grad = jnp.zeros((E, K), jnp.float32).at[
            perm2.astype(jnp.int32)].set(dfeat)
        back = lax.all_to_all(recv_grad.reshape(C, cap, K), axis,
                              split_axis=0, concat_axis=0).reshape(E, K)
        # 3) Back through the send gather (live-masked) onto the local
        #    Gaussian shard: one scatter-add keyed by each send slot's
        #    source gaussian.
        contrib = jnp.where(live.reshape(-1, 1), back, 0.0)
        d_dense = jnp.zeros((n_loc, K), jnp.float32).at[
            src_g[flat_idx]].add(contrib)
        # 4) VJP of the on-chip channel scatter: slice the dense gradient
        #    at the top-k lanes (compare + einsum — take_along_axis is a
        #    per-element gather, 10x slower on TPU).
        ch = jnp.arange(K, dtype=jnp.int32)
        onehot = (qi.astype(jnp.int32)[:, :, None] == ch[None, None, :]
                  ).astype(jnp.float32)
        d_qw = jnp.einsum("nc,njc->nj", d_dense, onehot,
                          precision=jax.lax.Precision.HIGHEST)
        zeros = [jnp.zeros_like(a) for a in args]
        zeros[6] = d_qw
        return tuple(zeros)

    local_render.defvjp(local_fwd, local_bwd)

    def shard_fn(means, ops, scs, rots, cols, sh_c, qw, qi, view, projm,
                 cpos, bgc):
        rgb_t, feat_t, t_t, total_l, dropped_local = local_render(
            means, ops, scs, rots, cols, sh_c, qw, qi, view, projm, cpos,
            bgc)
        total = lax.psum(total_l, axis)
        dropped = lax.psum(dropped_local, axis)
        return rgb_t, feat_t, t_t, total, dropped

    gspec = P(axis)
    rgb_t, feat_t, t_t, total, dropped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(gspec, gspec, gspec, gspec, gspec, gspec, gspec, gspec,
                  P(), P(), P(), P()),
        out_specs=(gspec, gspec, gspec, P(), P()),
        check_rep=False,
    )(means3d, opacities,
      scales if scales is not None else jnp.ones((n, 3), jnp.float32),
      rotations if rotations is not None else
      jnp.concatenate([jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1),
      cols_in, shs_in, quick_weights, quick_indices, viewmatrix,
      projmatrix, campos, jnp.asarray(bg, jnp.float32))

    rgb = rasterize_tiles.tiles_to_image(
        rgb_t[:num_tiles], grid_x, grid_y, H, W)
    feat = (rasterize_tiles.tiles_to_image(
        feat_t[:num_tiles], grid_x, grid_y, H, W)
        if settings.assemble else feat_t[:num_tiles])
    final_t = rasterize_tiles.tiles_to_image(
        t_t[:num_tiles][..., None], grid_x, grid_y, H, W)[0]
    return rgb, feat, final_t, total, dropped
