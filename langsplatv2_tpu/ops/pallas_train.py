"""Custom-VJP Pallas rasterization for the language-feature training phase.

In feature training the geometry is frozen (reference train.py:212-259
freezes everything but logits+codebooks), so the only rasterizer gradient
the loss needs is d(feature_map)/d(features): with

    feat_map[p, k] = sum_j W[j, p] * F[j, k],    W = alpha * T * include,

the blend weights W are constants w.r.t. F, and the backward is simply
dF[j, k] = sum_p W[j, p] * g[p, k] — a forward W-replay plus ONE MXU matmul
per chunk, no suffix sums, no atomics. Per-entry gradients are written to
their (disjoint) sorted-entry rows and reduced to per-gaussian gradients by
an XLA segment scatter-add over the entry->gaussian ids.

The forward is the existing streaming fast path (ops/rasterize.py pallas
branch); this module wires jax.custom_vjp around it so the feature-phase
train step gets the Pallas forward AND a Pallas backward, with gradients
matching the XLA reference blend's autodiff (same W, same masks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import BLOCK
from . import pallas_blend
from .pallas_blend import (ALPHA_MIN, ALPHA_MAX, T_EPS, GEOM_W, LANE, P,
                           QUICK_PCOL, PAIR_BASE, _exclusive_cumprod_lanes)

GRAD_W = 128   # per-entry gradient rows padded to full lanes (DMA-writable)
PROJ_W = 8     # fused-backward top-k projection rows (sublane-padded)


def _feature_bwd_kernel(
    # scalar prefetch
    start_ref, count_ref, tid_ref,
    # inputs
    geom_hbm,          # [GEOM_W, E_pad] field-major (HBM)
    g_tiles,           # [TB, P, K] cotangent block (VMEM)
    # outputs
    dfeat_hbm,         # [E_out, GRAD_W] per-entry gradients (HBM, manual DMA)
    # scratch
    geom_buf, dbuf, sems, wsem,
    *,
    chunk: int,
    grid_x: int,
    num_tiles: int,
    feat_k: int,
    tile_batch: int,
):
    i = pl.program_id(0)
    cw = chunk + LANE

    def tile_info(k):
        idx = i * tile_batch + k
        tid = tid_ref[idx]
        start = start_ref[idx]
        count = jnp.where(tid < num_tiles, count_ref[idx], 0)
        return start, count, tid

    def aligned(start, c):
        return pl.multiple_of(((start + c * chunk) // LANE) * LANE, LANE)

    def geom_dma(slot, start, c):
        return pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(aligned(start, c), cw)],
            geom_buf.at[slot], sems.at[slot])

    start0, count0, _ = tile_info(0)

    @pl.when(count0 > 0)
    def _():
        geom_dma(0, start0, 0).start()

    def process_tile(k, carry):
        start, count, tid = tile_info(k)
        n_chunks = pl.cdiv(count, chunk)
        base = (k % 2) * 2

        @pl.when(k + 1 < tile_batch)
        def _():
            nstart, ncount, _ = tile_info(k + 1)

            @pl.when(ncount > 0)
            def _():
                geom_dma(((k + 1) % 2) * 2, nstart, 0).start()

        tx = (tid % grid_x).astype(jnp.float32)
        ty = (tid // grid_x).astype(jnp.float32)
        pix = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = tx * BLOCK + (pix % BLOCK).astype(jnp.float32)
        py = ty * BLOCK + (pix // BLOCK).astype(jnp.float32)
        g_tile = g_tiles[k]                          # [P, K]

        def write_dma(c):
            return pltpu.make_async_copy(
                dbuf.at[c % 2, pl.ds(0, chunk)],
                dfeat_hbm.at[pl.ds(start + c * chunk, chunk), :],
                wsem.at[c % 2])

        def body(c, t_test):
            slot = base + c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                geom_dma(base + (c + 1) % 2, start, c + 1).start()

            geom_dma(slot, start, c).wait()
            g = geom_buf[slot]                       # [GEOM_W, cw]
            d = (start + c * chunk) - aligned(start, c)

            x = g[0:1, :]
            y = g[1:2, :]
            ca = g[2:3, :]
            cb = g[3:4, :]
            cc = g[4:5, :]
            op = g[5:6, :]
            dx = px - x
            dy = py - y
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            lane = lax.broadcasted_iota(jnp.int32, (1, cw), 1)
            remaining = jnp.minimum(count - c * chunk, chunk)
            in_range = (lane >= d) & (lane < d + remaining)
            valid = in_range & (power <= 0.0) & (alpha >= ALPHA_MIN)
            alpha = jnp.where(valid, alpha, 0.0)

            one_minus = 1.0 - alpha
            t_excl = t_test * _exclusive_cumprod_lanes(one_minus, cw)
            include = valid & (t_excl * one_minus >= T_EPS)
            w = jnp.where(include, alpha * t_excl, 0.0)    # [P, cw]

            # dF[entry, k] = sum_p W[p, entry] * g[p, k]
            dW = lax.dot_general(
                w, g_tile, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)           # [cw, K]
            # Keep only this chunk's lanes; shift the d-offset away so row r
            # of the buffer is entry (start + c*chunk + r).
            row = lax.broadcasted_iota(jnp.int32, (cw, 1), 0)
            keep = (row >= d) & (row < d + remaining)
            dW = jnp.where(keep, dW, 0.0)
            dW = pltpu.roll(dW, shift=cw - d, axis=0)      # entry r at row r
            kpad = jnp.zeros((cw, GRAD_W - feat_k), jnp.float32)
            # Write this chunk's rows, double-buffered: the DMA issued two
            # chunks ago (same slot) is waited just before its buffer is
            # reused, so gradient writes overlap the next chunk's compute
            # instead of serializing it. Full-chunk writes can overhang
            # into the next tile's rows with zeros, but tiles are processed
            # in increasing entry order and slot writes are drained before
            # the next tile starts, so later (correct) writes land last.
            # Dead sentinel entries at the array tail are never written;
            # the XLA wrapper masks them before the per-gaussian reduction.
            @pl.when(c >= 2)
            def _():
                write_dma(c - 2).wait()

            dbuf[c % 2] = jnp.concatenate([dW[:, :feat_k], kpad], axis=1)
            write_dma(c).start()

            log_v = jnp.log1p(-alpha)
            return t_test * jnp.exp(jnp.sum(log_v, axis=1, keepdims=True))

        t0 = jnp.ones((P, 1), jnp.float32)
        lax.fori_loop(0, n_chunks, body, t0)
        # Drain this tile's outstanding writes before the next tile reuses
        # the slots (and before the kernel exits).
        @pl.when(n_chunks >= 2)
        def _():
            write_dma(n_chunks - 2).wait()

        @pl.when(n_chunks >= 1)
        def _():
            write_dma(n_chunks - 1).wait()

        return carry

    lax.fori_loop(0, tile_batch, process_tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=("grid_x", "grid_y", "feat_k", "chunk", "tile_batch",
                     "interpret"),
)
def feature_grads_pallas(
    entry_geom: jnp.ndarray,    # [GEOM_W, E_pad] field-major
    tile_start: jnp.ndarray,    # [T] int32
    tile_count: jnp.ndarray,    # [T] int32
    tile_ids: jnp.ndarray,      # [T] int32
    g_feat: jnp.ndarray,        # [T, P, K] cotangent of the tile feature map
    *,
    grid_x: int,
    grid_y: int,
    feat_k: int,
    chunk: int = 256,
    tile_batch: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-entry feature gradients [E_pad, GRAD_W] (cols [0, feat_k))."""
    n_local = tile_start.shape[0]
    num_tiles = grid_x * grid_y
    e_pad = entry_geom.shape[1]

    n_prog = -(-n_local // tile_batch)
    n_pad = n_prog * tile_batch
    tile_start = jnp.pad(tile_start, (0, n_pad - n_local))
    tile_count = jnp.pad(tile_count, (0, n_pad - n_local))
    tile_ids = jnp.pad(tile_ids, (0, n_pad - n_local),
                       constant_values=num_tiles)
    g_feat = jnp.pad(g_feat, ((0, n_pad - n_local), (0, 0), (0, 0)))

    kernel = functools.partial(
        _feature_bwd_kernel,
        chunk=chunk, grid_x=grid_x, num_tiles=num_tiles, feat_k=feat_k,
        tile_batch=tile_batch,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((tile_batch, P, feat_k), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((4, GEOM_W, chunk + LANE), jnp.float32),
            pltpu.VMEM((2, chunk + LANE, GRAD_W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    dfeat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e_pad, GRAD_W), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, tile_ids, entry_geom, g_feat)
    return dfeat


def _feature_bwd_topk_kernel(
    # scalar prefetch
    count_ref, tid_ref,
    # inputs
    geom_hbm,          # [GEOM_W, E_pad] field-major f32pack rows (HBM)
    g_tiles,           # [TB, P, K] cotangent block (VMEM)
    # outputs
    dproj_hbm,         # [PROJ_W, n_pad*cap] top-k projections (HBM, DMA)
    # scratch
    geom_buf, dbuf, sems, wsem,
    *,
    cap: int,
    grid_x: int,
    num_tiles: int,
    feat_k: int,
    topk: int,
    tile_batch: int,
):
    """FUSED replay + top-k projection for the budget-capped layout.

    The capped [T, cap] layout makes the whole backward regular: every
    tile's entries live at the 128-aligned window [t*cap, (t+1)*cap), one
    chunk == one tile. Instead of writing the dense [E, GRAD_W] gradient
    stream to HBM (134 MB at T*cap = 261k) and projecting onto each
    entry's top-k channels in XLA, this kernel projects IN VMEM: the
    per-chunk MXU product dWT[k, e] = sum_p W[p, e] g[p, k] is masked by
    the entry's own codebook indices (which ride the f32pack geometry rows
    at QUICK_PCOL — already fetched for the replay) and sublane-reduced to
    [topk, cap] rows. Only the [PROJ_W, E] projection stream (8 MB) ever
    reaches HBM — a 16x write-traffic cut, and the XLA side's where-mask +
    one-hot einsum disappear (the per-gaussian scatter reduction remains).

    Every tile k (including count==0 and grid-padding tiles) writes its
    full [PROJ_W, cap] window — zeros where invalid — so the output needs
    no validity mask; padding tiles write into the dump lanes past
    num_tiles*cap (out_shape is sized n_pad*cap for exactly this).
    """
    i = pl.program_id(0)

    def tile_info(k):
        idx = i * tile_batch + k
        tid = tid_ref[idx]
        count = jnp.where(tid < num_tiles, count_ref[idx], 0)
        return idx, count, tid

    def geom_dma(slot, idx):
        return pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(pl.multiple_of(idx * cap, LANE), cap)],
            geom_buf.at[slot], sems.at[slot])

    idx0, count0, _ = tile_info(0)

    @pl.when(count0 > 0)
    def _():
        geom_dma(0, idx0).start()

    def process_tile(k, carry):
        idx, count, tid = tile_info(k)
        slot = k % 2

        @pl.when(k + 1 < tile_batch)
        def _():
            nidx, ncount, _ = tile_info(k + 1)

            @pl.when(ncount > 0)
            def _():
                geom_dma((k + 1) % 2, nidx).start()

        @pl.when(count > 0)
        def _():
            geom_dma(slot, idx).wait()

        tx = (tid % grid_x).astype(jnp.float32)
        ty = (tid // grid_x).astype(jnp.float32)
        pix = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = tx * BLOCK + (pix % BLOCK).astype(jnp.float32)
        py = ty * BLOCK + (pix // BLOCK).astype(jnp.float32)
        g_tile = g_tiles[k]                          # [P, K]
        g = geom_buf[slot]                           # [GEOM_W, cap]

        x = g[0:1, :]
        y = g[1:2, :]
        ca = g[2:3, :]
        cb = g[3:4, :]
        cc = g[4:5, :]
        op = g[5:6, :]
        dx = px - x
        dy = py - y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        lane = lax.broadcasted_iota(jnp.int32, (1, cap), 1)
        # count <= cap by construction; lanes past it (and stale VMEM on
        # skipped DMAs) zero out through the valid mask, so every window
        # write is defined.
        valid = (lane < count) & (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(valid, alpha, 0.0)

        one_minus = 1.0 - alpha
        t_excl = _exclusive_cumprod_lanes(one_minus, cap)
        include = valid & (t_excl * one_minus >= T_EPS)
        w = jnp.where(include, alpha * t_excl, 0.0)      # [P, cap]

        # dWT[k, e] = sum_p W[p, e] * g_tile[p, k]
        dWT = lax.dot_general(
            g_tile, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)             # [K, cap]
        chan = lax.broadcasted_iota(
            jnp.int32, (feat_k, 1), 0).astype(jnp.float32)
        rows = []
        for j in range(topk):
            pair = g[QUICK_PCOL + j // 2:QUICK_PCOL + j // 2 + 1, :]
            hi = jnp.floor(pair * (1.0 / PAIR_BASE))
            ij = pair - hi * PAIR_BASE if j % 2 == 0 else hi
            mask = (chan == ij).astype(jnp.float32)      # [K, cap]
            rows.append(jnp.sum(dWT * mask, axis=0, keepdims=True))
        rows.append(jnp.zeros((PROJ_W - topk, cap), jnp.float32))

        def write_dma(kk):
            return pltpu.make_async_copy(
                dbuf.at[kk % 2],
                dproj_hbm.at[:, pl.ds(
                    pl.multiple_of((i * tile_batch + kk) * cap, LANE), cap)],
                wsem.at[kk % 2])

        @pl.when(k >= 2)
        def _():
            write_dma(k - 2).wait()

        dbuf[slot] = jnp.concatenate(rows, axis=0)       # [PROJ_W, cap]
        write_dma(k).start()

        @pl.when(k >= tile_batch - 2)
        def _():
            write_dma(k).wait()

        return carry

    lax.fori_loop(0, tile_batch, process_tile, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("grid_x", "grid_y", "feat_k", "topk", "cap",
                     "tile_batch", "interpret"),
)
def feature_grads_topk_pallas(
    entry_geom: jnp.ndarray,    # [GEOM_W, E_pad] field-major f32pack rows
    tile_count: jnp.ndarray,    # [T] int32 (kept counts, <= cap)
    tile_ids: jnp.ndarray,      # [T] int32
    g_feat: jnp.ndarray,        # [T, P, K] cotangent of the tile feature map
    *,
    grid_x: int,
    grid_y: int,
    feat_k: int,
    topk: int,
    cap: int,
    tile_batch: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused capped backward: per-entry TOP-K-PROJECTED gradients as
    field-major [PROJ_W, n_pad*cap] (sublanes [0, topk); slice lanes
    [:num_tiles*cap] for the dense window layout). Requires the capped
    [T, cap] binning (tile t's entries at window t*cap) with cap a
    multiple of 128."""
    assert cap % LANE == 0, "capped windows must be 128-lane aligned"
    n_local = tile_count.shape[0]
    num_tiles = grid_x * grid_y

    n_prog = -(-n_local // tile_batch)
    n_pad = n_prog * tile_batch
    tile_count = jnp.pad(tile_count, (0, n_pad - n_local))
    tile_ids = jnp.pad(tile_ids, (0, n_pad - n_local),
                       constant_values=num_tiles)
    g_feat = jnp.pad(g_feat, ((0, n_pad - n_local), (0, 0), (0, 0)))

    kernel = functools.partial(
        _feature_bwd_topk_kernel,
        cap=cap, grid_x=grid_x, num_tiles=num_tiles, feat_k=feat_k,
        topk=topk, tile_batch=tile_batch,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((tile_batch, P, feat_k), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_W, cap), jnp.float32),
            pltpu.VMEM((2, PROJ_W, cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    dproj = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PROJ_W, n_pad * cap), jnp.float32),
        interpret=interpret,
    )(tile_count, tile_ids, entry_geom, g_feat)
    return dproj


# ---------------------------------------------------------------------------
# custom-VJP dense rasterization (feature-phase training contract)
# ---------------------------------------------------------------------------

def _dense_fwd_impl(settings, means3d, opacities, viewmatrix, projmatrix,
                    campos, bg, scales, rotations, shs, colors_precomp,
                    features):
    """Pallas forward for dense (training) mode + residuals for backward."""
    from . import pallas_binning, projection, rasterize_tiles
    from .rasterize import _pallas_supported, RasterizeOutput

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
        opacities=opacities[:, 0],
    )
    tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
        jax.tree.map(lax.stop_gradient, proj), grid_x, grid_y,
        settings.max_entries, opacities=lax.stop_gradient(opacities[:, 0]),
        exact_cull=True, interpret=interp)
    keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
    g_sorted, tile_start, tile_count, tile_sorted = (
        pallas_binning.sorted_binning_from_keys(keys, num_tiles))

    rows = pallas_blend.pack_gaussian_rows(
        proj.xy, proj.conic, opacities[:, 0], proj.rgb)
    entry_geom = pallas_blend.to_field_major(
        lax.stop_gradient(rows)[g_sorted], chunk)
    entry_feat = pallas_blend.to_field_major(features[g_sorted], chunk)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
        entry_geom, lax.stop_gradient(entry_feat), tile_start, tile_count,
        tile_ids, bg, grid_x=grid_x, grid_y=grid_y, mode="dense",
        out_channels=features.shape[1], chunk=chunk, interpret=interp)

    rgb = rasterize_tiles.tiles_to_image(rgb_t, grid_x, grid_y, H, W)
    feat = rasterize_tiles.tiles_to_image(feat_t, grid_x, grid_y, H, W)
    final_t = rasterize_tiles.tiles_to_image(
        t_t[..., None], grid_x, grid_y, H, W)[0]

    outputs = (rgb, feat, final_t, proj.radius, tile_count.max(), total)
    residuals = (entry_geom, tile_start, tile_count, g_sorted,
                 tile_sorted < num_tiles, features.shape[0])
    return outputs, residuals


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def rasterize_dense_vjp(settings, means3d, opacities, viewmatrix, projmatrix,
                        campos, bg, scales, rotations, shs, colors_precomp,
                        features):
    """Dense-mode rasterization with a Pallas forward AND backward.

    FEATURE-PHASE CONTRACT (reference train.py:212-259): geometry is frozen,
    the loss differentiates only through `features` — this VJP returns the
    exact d(feature_map)/d(features) and ZERO for every other input. Do not
    use it for geometry (RGB-phase) training.
    """
    return _dense_fwd_impl(settings, means3d, opacities, viewmatrix,
                           projmatrix, campos, bg, scales, rotations, shs,
                           colors_precomp, features)[0]


def _dense_vjp_fwd(settings, means3d, opacities, viewmatrix, projmatrix,
                   campos, bg, scales, rotations, shs, colors_precomp,
                   features):
    outputs, residuals = _dense_fwd_impl(
        settings, means3d, opacities, viewmatrix, projmatrix, campos, bg,
        scales, rotations, shs, colors_precomp, features)
    args = (means3d, opacities, viewmatrix, projmatrix, campos, bg,
            scales, rotations, shs, colors_precomp, features)
    return outputs, (residuals, args)


def _dense_vjp_bwd(settings, res, cotangents):
    from .rasterize import _pallas_supported

    (entry_geom, tile_start, tile_count, g_sorted, entry_valid, n), args = res
    g_rgb, g_feat, g_t, g_radii, g_mtc, g_tot = cotangents
    grid_x, grid_y = settings.grid_x, settings.grid_y
    feat_k = g_feat.shape[0]
    interp = not _pallas_supported()

    g_tiles = _image_to_tiles(g_feat, grid_x, grid_y)       # [T, P, K]
    tile_ids = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    dfeat_entries = feature_grads_pallas(
        entry_geom, tile_start, tile_count, tile_ids, g_tiles,
        grid_x=grid_x, grid_y=grid_y, feat_k=feat_k, interpret=interp)
    dfeat_entries = jnp.where(
        jnp.pad(entry_valid, (0, dfeat_entries.shape[0] - entry_valid.shape[0])
                )[:, None],
        dfeat_entries[:, :feat_k], 0.0)
    e = g_sorted.shape[0]
    d_features = jnp.zeros((n, feat_k), jnp.float32).at[g_sorted].add(
        dfeat_entries[:e])

    # args order: means3d, opacities, view, proj, campos, bg, scales,
    #             rotations, shs, colors_precomp, features — every input
    #     but `features` is frozen in the feature phase (zero gradient).
    zeros = [None if a is None else jnp.zeros_like(a) for a in args]
    zeros[-1] = d_features
    return tuple(zeros)


rasterize_dense_vjp.defvjp(_dense_vjp_fwd, _dense_vjp_bwd)


# ---------------------------------------------------------------------------
# custom-VJP QUICK-representation rasterization (feature-phase training)
#
# The dense path gathers a [E, L*K] feature row per entry — a wide-row XLA
# gather that falls off the measured w>=40 performance cliff (~20x slower
# per row than w16). But the training coefficients ARE top-k sparse: packing
# the (weight, index) pairs into the 16-wide quick rows (pallas_blend
# layout) makes the whole per-entry state two fused w16 gathers, and the
# blend kernel expands the channels on-chip. The blended map is EXACTLY the
# dense path's (same scatter), and the backward stays the dense W-replay
# kernel (it never reads features) — only the final reduction changes:
# per-gaussian dense gradients are sliced back to the top-k lanes with
# take_along_axis, which is the exact VJP of the scatter.
# ---------------------------------------------------------------------------

def _quick_fwd_impl(settings, means3d, opacities, viewmatrix, projmatrix,
                    campos, bg, scales, rotations, shs, colors_precomp,
                    quick_weights, quick_indices, quick_channels: int):
    from . import pallas_binning, projection, rasterize_tiles
    from .rasterize import _pallas_supported

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
        opacities=opacities[:, 0],
        cull_alpha=settings.cull_alpha,
    )
    topk = quick_weights.shape[1]
    packed = 9 + topk // 2 + topk <= pallas_blend.GEOM_W  # topk <= 4
    capped = settings.tile_budget > 0.0 and packed
    if capped:
        # Counts <= cap by construction: chunk = cap halves the blend's
        # (and the replay backward's) VPU cell area at cap 128, same as
        # the serving path.
        chunk = min(chunk, max(settings.tile_budget_cap, 128))
    if capped:
        # OPT-IN budget-capped training (settings.tile_budget, same
        # transmittance-bound cull as the serving path's
        # rasterize._capped_quick_binning): the forward blends — and the
        # backward replays — only the budget-visible depth prefix of each
        # tile, laid out as dense [T, cap] slices. The dominant training
        # costs (w16 row gather, replay kernel, E->N reduction) drop from
        # the live total to T*cap, and every blend/replay segment starts
        # 128-aligned. Approximate by design (gradients of bound-culled
        # entries are zero; error scale ~ tile_budget — exact when the
        # budget is uncrossable). The backward takes the scatter-add
        # reduction branch (at T*cap entries the scatter is already in
        # its fast width-64 regime; no perm machinery needed).
        from .rasterize import _capped_quick_binning, _capped_kept_from_rows

        cap = settings.tile_budget_cap
        # Round-5 capped binning: 2-operand sort + dense [T, cap] window
        # slice; the transmittance budget is recomputed from the gathered
        # rows below (the f32pack rows carry exact f32 conic/opacity, so
        # the bound here is the EXACT one — see
        # pallas_binning.budget_from_rows).
        g_sorted, tile_start, raw_counts, total = _capped_quick_binning(
            settings, jax.tree.map(lax.stop_gradient, proj),
            lax.stop_gradient(opacities), interp)
        rows_cap = pallas_blend.pack_quick_train_rows(
            lax.stop_gradient(proj.xy), lax.stop_gradient(proj.conic),
            lax.stop_gradient(opacities[:, 0]),
            lax.stop_gradient(proj.rgb) if proj.rgb is not None else None,
            lax.stop_gradient(quick_weights), quick_indices)[g_sorted]
        kept, sat_bound, live_total = _capped_kept_from_rows(
            settings, rows_cap, raw_counts, "f32")
        tile_count = kept
        expidx = None
        # Slot validity: window slots past kept[t] hold neighbouring
        # tiles' entries — the replay's gradients there must be dropped.
        entry_valid = (jnp.arange(cap, dtype=jnp.int32)[None, :]
                       < kept[:, None]).reshape(-1)
        # Saturation telemetry: max > cap reveals cap saturation.
        telemetry_max = sat_bound.max()
    else:
        tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
            jax.tree.map(lax.stop_gradient, proj), grid_x, grid_y,
            settings.max_entries,
            opacities=lax.stop_gradient(opacities[:, 0]),
            exact_cull=True, cull_alpha=settings.cull_alpha,
            interpret=interp)
        keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        if packed:
            # Carry the sort permutation (expansion slot per sorted entry):
            # the backward returns per-entry gradients to gaussian-major
            # expansion order with one sort + cumsum instead of the E->N
            # scatter-add (measured 36 ms vs ~10 ms at 1.6M entries).
            g_sorted, tile_start, tile_count, tile_sorted, expidx = (
                pallas_binning.sorted_binning_from_keys(
                    keys, num_tiles, with_perm=True))
        else:
            g_sorted, tile_start, tile_count, tile_sorted = (
                pallas_binning.sorted_binning_from_keys(keys, num_tiles))
            expidx = None
        # The live-prefix clamp below only exists on the packed route;
        # on the non-packed route settings.live_entries is a no-op, so
        # report live_total = -1 there — a real count would send the
        # trainer's adaptive-budget loop into a pointless rollback +
        # step recompile when a viewpoint exceeds its stored budget.
        live_total = (jnp.sum(tile_count) if packed
                      else jnp.asarray(-1, jnp.int32))
        live = settings.live_entries
        if packed and 0 < live < settings.max_entries:
            # Live-prefix clamp (same contract as the serving path,
            # rasterize._sorted_quick_binning): dead entries sort to the
            # end, so the gather + replay + backward sort-back all shrink
            # to the live prefix. live_total (pre-clamp) is the sizing
            # telemetry; live_total > live means entries were DROPPED —
            # the trainer rebuilds the step with a bigger budget when it
            # sees that.
            g_sorted = g_sorted[:live]
            tile_count = jnp.clip(
                jnp.minimum(tile_count, live - tile_start), 0, None)
        entry_valid = (tile_sorted < num_tiles)[:g_sorted.shape[0]]
        telemetry_max = tile_count.max()
    if capped:
        # The capped branch already gathered the f32pack rows (the budget
        # recompute reads them) — reuse, no second gather.
        entry_geom = pallas_blend.to_field_major(rows_cap, chunk)
        entry_feat = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)
    elif packed:
        # Per-level training (topk <= 4): the WHOLE entry state — geometry,
        # index pairs, weights — packs into ONE 16-wide f32 row, halving
        # the dominant row-count-bound gather with zero precision change.
        rows = pallas_blend.pack_quick_train_rows(
            proj.xy, proj.conic, opacities[:, 0], proj.rgb,
            lax.stop_gradient(quick_weights), quick_indices)
        entry_geom = pallas_blend.to_field_major(
            lax.stop_gradient(rows)[g_sorted], chunk)
        entry_feat = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)
    else:
        rows, wrows = pallas_blend.pack_quick_rows(
            proj.xy, proj.conic, opacities[:, 0], proj.rgb,
            lax.stop_gradient(quick_weights), quick_indices)
        entry_geom = pallas_blend.to_field_major(
            lax.stop_gradient(rows)[g_sorted], chunk)
        entry_feat = pallas_blend.to_field_major(
            lax.stop_gradient(wrows)[g_sorted], chunk)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
        entry_geom, entry_feat, tile_start, tile_count, tile_ids, bg,
        grid_x=grid_x, grid_y=grid_y, mode="quick",
        out_channels=quick_channels, topk=topk,
        chunk=chunk, rowfmt="f32pack" if packed else "f32",
        interpret=interp)

    rgb = rasterize_tiles.tiles_to_image(rgb_t, grid_x, grid_y, H, W)
    # assemble=False keeps the feature map in [T, P, C] tile layout (the
    # tiles-space gram loss consumes it directly; the backward then skips
    # the cotangent image->tiles conversion as well).
    feat = (rasterize_tiles.tiles_to_image(feat_t, grid_x, grid_y, H, W)
            if settings.assemble else feat_t)
    final_t = rasterize_tiles.tiles_to_image(
        t_t[..., None], grid_x, grid_y, H, W)[0]

    outputs = (rgb, feat, final_t, proj.radius, telemetry_max, total,
               live_total)
    residuals = (entry_geom, tile_start, tile_count, g_sorted, entry_valid,
                 quick_indices, expidx,
                 lax.stop_gradient(proj.tiles_touched.astype(jnp.int32)))
    return outputs, residuals


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def rasterize_quick_train_vjp(settings, quick_channels, means3d, opacities,
                              viewmatrix, projmatrix, campos, bg, scales,
                              rotations, shs, colors_precomp, quick_weights,
                              quick_indices):
    """Quick-mode rasterization with a Pallas forward AND backward.

    FEATURE-PHASE CONTRACT (reference train.py:212-259): geometry frozen;
    the VJP returns exactly d(quick_weights) and ZERO for everything else
    (quick_indices are top-k selections — piecewise-constant, no gradient,
    matching the dense path's detached top-k mask)."""
    return _quick_fwd_impl(settings, means3d, opacities, viewmatrix,
                           projmatrix, campos, bg, scales, rotations, shs,
                           colors_precomp, quick_weights, quick_indices,
                           quick_channels)[0]


def rasterize_quick_train(settings, means3d, opacities, viewmatrix,
                          projmatrix, campos, bg, scales, rotations, shs,
                          colors_precomp, quick_weights, quick_indices,
                          quick_channels: int):
    """Keyword-friendly wrapper (nondiff args must lead in the custom_vjp)."""
    return rasterize_quick_train_vjp(
        settings, quick_channels, means3d, opacities, viewmatrix, projmatrix,
        campos, bg, scales, rotations, shs, colors_precomp, quick_weights,
        quick_indices)


def _quick_vjp_fwd(settings, quick_channels, means3d, opacities, viewmatrix,
                   projmatrix, campos, bg, scales, rotations, shs,
                   colors_precomp, quick_weights, quick_indices):
    outputs, residuals = _quick_fwd_impl(
        settings, means3d, opacities, viewmatrix, projmatrix, campos, bg,
        scales, rotations, shs, colors_precomp, quick_weights, quick_indices,
        quick_channels)
    args = (means3d, opacities, viewmatrix, projmatrix, campos, bg,
            scales, rotations, shs, colors_precomp, quick_weights,
            quick_indices)
    return outputs, (residuals, args)


def _quick_vjp_bwd(settings, quick_channels, res, cotangents):
    from .rasterize import _pallas_supported

    (entry_geom, tile_start, tile_count, g_sorted, entry_valid,
     quick_indices, expidx, tiles_touched), args = res
    # Contract: this route only differentiates the FEATURE MAP. The rgb /
    # final_transmittance / radii / total cotangents are intentionally
    # dropped (feature-phase losses never touch them — geometry is frozen,
    # reference train.py:212-259); a future loss term on rgb or final_T
    # during feature training would silently get zero gradient here and
    # must extend the W-replay backward instead.
    g_rgb, g_feat, g_t, g_radii, g_mtc, g_tot, g_live = cotangents
    grid_x, grid_y = settings.grid_x, settings.grid_y
    n = quick_indices.shape[0]
    interp = not _pallas_supported()

    if settings.assemble:
        feat_k = g_feat.shape[0]
        g_tiles = _image_to_tiles(g_feat, grid_x, grid_y)   # [T, P, K]
    else:
        feat_k = g_feat.shape[-1]
        g_tiles = g_feat                                    # already tiles
    tile_ids = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    topk = quick_indices.shape[1]
    # Match the forward's chunk: cap-sized on the capped route (halves
    # the replay's per-tile VPU area; the entry_geom padding was sized
    # for this chunk by the forward).
    packed_b = 9 + topk // 2 + topk <= pallas_blend.GEOM_W
    cap = settings.tile_budget_cap
    if settings.tile_budget > 0.0 and packed_b and cap % 128 == 0:
        # FUSED capped backward: the replay kernel projects each entry's
        # dense gradient onto its OWN top-k channels in VMEM and emits
        # only [PROJ_W, T*cap] (8 MB vs the 134 MB dense stream), already
        # masked to the budget-visible lanes. The per-gaussian reduction
        # is then a narrow scatter-add zero-padded to the fast w64 regime.
        dproj = feature_grads_topk_pallas(
            entry_geom, tile_count, tile_ids, g_tiles,
            grid_x=grid_x, grid_y=grid_y, feat_k=feat_k, topk=topk,
            cap=cap, interpret=interp)
        e = g_sorted.shape[0]                                # T*cap
        dcols = jnp.pad(dproj[:, :e].T, ((0, 0), (0, 64 - PROJ_W)))
        d_qw = jnp.zeros((n, 64), jnp.float32).at[g_sorted].add(
            dcols)[:, :topk]
        zeros = [None if a is None else jnp.zeros_like(a) for a in args]
        zeros[-2] = d_qw
        return tuple(zeros)
    bwd_chunk = 256
    if settings.tile_budget > 0.0 and packed_b:
        bwd_chunk = min(256, max(settings.tile_budget_cap, 128))
    dfeat_entries = feature_grads_pallas(
        entry_geom, tile_start, tile_count, tile_ids, g_tiles,
        grid_x=grid_x, grid_y=grid_y, feat_k=feat_k, chunk=bwd_chunk,
        interpret=interp)
    dfeat_entries = jnp.where(
        jnp.pad(entry_valid, (0, dfeat_entries.shape[0] - entry_valid.shape[0])
                )[:, None],
        dfeat_entries[:, :feat_k], 0.0)
    e = g_sorted.shape[0]
    if expidx is not None:
        # Scatter-free reduction (packed/f32pack path). d_qw[g, j] needs
        # only Sum_{entries of g} dfeat[entry, idx_j(g)]:
        #   1. project each entry's dense grad onto ITS OWN top-k channels
        #      (indices ride the field-major geometry rows — free slicing,
        #      no [E, 4] gather, which sits on the w4 gather cliff);
        #   2. sort the [E, topk] projections back to EXPANSION order by
        #      the carried permutation — expansion order is gaussian-major,
        #      so per-gaussian sums become contiguous-segment sums;
        #   3. cumsum + boundary diffs at the expansion offsets (w8 rows:
        #      w4 boundary gathers fall off the narrow-gather cliff).
        # Replaces the E->N scatter-add (36 ms) + dense d_qw einsum (4 ms)
        # with ~10 ms of sort+cumsum at 1.6M entries.
        dfe = dfeat_entries[:e]                              # [E_live, K]
        pairs = entry_geom[pallas_blend.QUICK_PCOL:
                           pallas_blend.QUICK_PCOL + (topk + 1) // 2, :e]
        chan = jnp.arange(feat_k, dtype=jnp.float32)
        # e_slots = the FULL expansion slot count; with a live-prefix clamp
        # (settings.live_entries) e < e_slots and the clamped-away entries
        # carry zero gradient (the forward never blended them) — pad the
        # projections so every operand aligns with the full permutation.
        e_slots = expidx.shape[0]
        cols = []
        for j in range(topk):
            pair = pairs[j // 2]
            hi = jnp.floor(pair * (1.0 / pallas_blend.PAIR_BASE))
            ij = pair - hi * pallas_blend.PAIR_BASE if j % 2 == 0 else hi
            cols.append(jnp.pad(jnp.sum(
                dfe * (ij[:, None] == chan[None, :]), axis=1),
                (0, e_slots - e)))
        sorted_back = lax.sort((expidx, *cols), num_keys=1, is_stable=False)
        s_exp = jnp.stack(sorted_back[1:], axis=1)           # [E_slots, topk]
        s_exp = jnp.pad(s_exp, ((0, 0), (0, 8 - topk)))
        csum = jnp.concatenate(
            [jnp.zeros((1, 8), jnp.float32), jnp.cumsum(s_exp, axis=0)],
            axis=0)                                          # [E_slots+1, 8]
        offsets = jnp.cumsum(tiles_touched) - tiles_touched
        starts = jnp.minimum(offsets, e_slots)
        ends = jnp.minimum(offsets + tiles_touched, e_slots)
        bounds = csum[jnp.concatenate([starts, ends])]       # [2N, 8] w8
        d_qw = (bounds[n:] - bounds[:n])[:, :topk]
    else:
        d_dense = jnp.zeros((n, feat_k), jnp.float32).at[g_sorted].add(
            dfeat_entries[:e])
        # VJP of the on-chip scatter: each top-k lane's gradient is the
        # dense gradient at its channel. As compare + einsum, NOT
        # take_along_axis — per-element gathers run at ~90M elem/s on this
        # hardware (40 ms for [300k, 64] -> 12; the einsum form is sub-ms
        # on the MXU).
        ch = jnp.arange(feat_k, dtype=jnp.int32)
        onehot = (quick_indices.astype(jnp.int32)[:, :, None]
                  == ch[None, None, :]).astype(jnp.float32)   # [N, S, C]
        d_qw = jnp.einsum("nc,njc->nj", d_dense, onehot,
                          precision=jax.lax.Precision.HIGHEST)

    zeros = [None if a is None else jnp.zeros_like(a) for a in args]
    zeros[-2] = d_qw
    return tuple(zeros)


rasterize_quick_train_vjp.defvjp(_quick_vjp_fwd, _quick_vjp_bwd)


def _image_to_tiles(img: jnp.ndarray, grid_x: int, grid_y: int) -> jnp.ndarray:
    """[C, H, W] -> [num_tiles, P, C], zero-padding to the tile grid."""
    C, H, W = img.shape
    img = jnp.pad(img, ((0, 0), (0, grid_y * BLOCK - H), (0, grid_x * BLOCK - W)))
    img = img.reshape(C, grid_y, BLOCK, grid_x, BLOCK)
    return img.transpose(1, 3, 2, 4, 0).reshape(grid_y * grid_x, BLOCK * BLOCK, C)
