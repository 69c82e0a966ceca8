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

    def shard_fn(means, ops, scs, rots, cols, sh_c, qw, qi, view, projm,
                 cpos, bgc):
        idx = lax.axis_index(axis)
        proj = projection.preprocess(
            means, scs, rots, None, sh_c if use_shs else None,
            None if use_shs else cols, view, projm, cpos,
            settings.tanfovx, settings.tanfovy, W, H,
            settings.sh_degree, settings.scale_modifier,
            opacities=ops[:, 0])

        # NOTE: the jitted entry points must be called unwrapped inside
        # shard_map — a nested jit pins replicated output shardings that
        # conflict with the "gauss" specs.
        tile, depth, gauss_l, total_l = (
            pallas_binning.expand_entries_pallas.__wrapped__(
                proj, grid_x, grid_y, local_budget, opacities=ops[:, 0],
                exact_cull=True, max_windows=None, interpret=interp))
        gauss_g = gauss_l + idx * n_loc          # global id: exact tie-break
        hi, lo = pallas_binning.pack_sort_keys(tile, depth, gauss_g,
                                               num_tiles)
        perm0 = jnp.arange(local_budget, dtype=jnp.uint32)
        hi_s, lo_s, perm = lax.sort((hi, lo, perm0), num_keys=2,
                                    is_stable=True)
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
        tile_sorted = (hi_s >> 19).astype(jnp.int32)
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
        key_cols = jnp.stack([bc(hi_s), bc(lo_s)], axis=1)   # [budget, 2]
        payload = [ent_rows, key_cols] + ([ent_w] if quick else [])
        payload = jnp.concatenate(payload, axis=1)
        sendbuf = jnp.where(live.reshape(-1, 1), payload[flat_idx], 0.0)
        # Dead rows: sentinel key sorts to the end on the receiver.
        sent_hi = bc(jnp.full((1,), jnp.uint32(num_tiles) << 19))
        sendbuf = sendbuf.at[:, 16].set(
            jnp.where(live.reshape(-1), sendbuf[:, 16], sent_hi[0]))
        sendbuf = sendbuf.reshape(C, cap, -1)

        recv = lax.all_to_all(sendbuf, axis, split_axis=0, concat_axis=0)
        recv = recv.reshape(C * cap, -1)                     # [C*cap, Wp]

        ub = lambda a: lax.bitcast_convert_type(a, jnp.uint32)
        hi2 = ub(recv[:, 16])
        lo2 = ub(recv[:, 17])
        perm0b = jnp.arange(C * cap, dtype=jnp.uint32)
        hi2s, _, perm2 = lax.sort((hi2, lo2, perm0b), num_keys=2,
                                  is_stable=True)
        rows2 = recv[perm2.astype(jnp.int32)]
        tile2 = (hi2s >> 19).astype(jnp.int32)

        nb2 = max(1, int(np.ceil(np.log2(C * cap + 1))) + 1)
        t0 = idx * tiles_per
        bounds = pallas_binning._vectorized_searchsorted_left(
            tile2, t0 + jnp.arange(tiles_per + 1, dtype=jnp.int32), nb2)
        tile_start = bounds[:-1].astype(jnp.int32)
        tile_count = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
        tile_ids = t0 + jnp.arange(tiles_per, dtype=jnp.int32)
        tile_ids = jnp.where(tile_ids < num_tiles, tile_ids, num_tiles)

        entry_geom = pallas_blend.to_field_major(rows2[:, :16], chunk)
        if quick:
            entry_feat = pallas_blend.to_field_major(rows2[:, 18:34], chunk)
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
