"""Custom-VJP Pallas rasterization for the RGB (geometry) training phase.

The reference's CUDA backward produces d(means2D, conic, opacity, color)
per gaussian by replaying each tile's blend back-to-front with atomics
(SURVEY.md §2.3(a) stage 4). The TPU formulation avoids both the reverse
sweep and the atomics:

With C_p = sum_{j incl} alpha_j T_j c_j and T_j the exclusive transmittance
over VALID entries (exactly the forward's masks), the alpha gradient at
pixel p for entry i is

    dL/dalpha_i = [incl] T_i (c_i . g_p)
                - [valid] (S_i . g_p) / (1 - alpha_i)
                - [incl] gT_p T_final,p / (1 - alpha_i)

where S_i = sum_{j incl, j>i} alpha_j T_j c_j is the SUFFIX color sum.
Writing s_j = w_j (c_j . g_p), the suffix dot is (C_total . g_p) minus an
INCLUSIVE PREFIX of s — so one front-to-back pass with a per-pixel running
scalar (plus the same lane-scan used by the forward transmittance) covers
every term; no back-to-front pass, no stored per-entry state. Chaining
through alpha = min(0.99, op exp(power)) and the conic quadratic gives
per-entry rows d(x, y, ca, cb, cc, op, r, g, b), column-summed over the
tile's pixels on the VPU and written to disjoint sorted-entry rows (same
pattern as pallas_train._feature_bwd_kernel); an XLA segment scatter-add
over entry->gaussian ids reduces them deterministically — the TPU
replacement for CUDA atomicAdd.

The custom_vjp wraps ONLY the blend core: projection/SH/covariance stay in
XLA autodiff, so d(blend inputs) chains to means3D/scales/rotations/SH and
the means2D densification carrier for free; binning is non-differentiable
(stop-gradient), matching the CUDA rasterizer. Gradient parity vs the XLA
reference blend's autodiff is pinned by tests/test_pallas_kernels.py.
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
                           _exclusive_cumprod_lanes)

GRAD_W = 128       # per-entry gradient rows padded to full lanes
N_GRAD = 9         # dx dy dca dcb dcc dop dr dg db


def _inclusive_cumsum_lanes(v: jnp.ndarray, width: int) -> jnp.ndarray:
    """Inclusive cumulative sum along axis 1 (log-depth shifted-add scan)."""
    t = v
    lane = lax.broadcasted_iota(jnp.int32, t.shape, 1)
    shift = 1
    while shift < width:
        rolled = pltpu.roll(t, shift=shift, axis=1)
        t = t + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    return t


def _rgb_bwd_kernel(
    # scalar prefetch
    start_ref, count_ref, tid_ref,
    # inputs
    geom_hbm,          # [GEOM_W, E_pad] field-major (HBM)
    g_rgb_tiles,       # [TB, P, 8] cotangent block: g_rgb(3) sdot gteff tfin pad2
    # outputs
    dgrad_hbm,         # [E_out, GRAD_W] per-entry gradients (HBM, manual DMA)
    # scratch
    geom_buf, dbuf, sems, wsem,
    *,
    chunk: int,
    grid_x: int,
    num_tiles: int,
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
        gt = g_rgb_tiles[k]                          # [P, 8]
        g_rgb = gt[:, 0:3]                           # [P, 3]
        sdot_total = gt[:, 3:4]                      # (C_total . g) per pixel
        gteff = gt[:, 4:5]                           # dL/dT_final (+ bg path)
        t_final = gt[:, 5:6]

        def body(c, state):
            t_test, pref = state                     # [P,1], [P,1]
            slot = base + c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                geom_dma(base + (c + 1) % 2, start, c + 1).start()

            geom_dma(slot, start, c).wait()
            d = (start + c * chunk) - aligned(start, c)
            lane = lax.broadcasted_iota(jnp.int32, (1, cw), 1)
            remaining = jnp.minimum(count - c * chunk, chunk)
            in_range = (lane >= d) & (lane < d + remaining)
            g = jnp.where(in_range, geom_buf[slot], 0.0)

            x = g[0:1, :]
            y = g[1:2, :]
            ca = g[2:3, :]
            cb = g[3:4, :]
            cc = g[4:5, :]
            op = g[5:6, :]
            dx = px - x                              # [P, cw]
            dy = py - y
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            expp = jnp.exp(power)
            raw = op * expp
            alpha = jnp.minimum(ALPHA_MAX, raw)
            valid = in_range & (power <= 0.0) & (alpha >= ALPHA_MIN)
            alpha = jnp.where(valid, alpha, 0.0)
            one_minus = 1.0 - alpha
            t_excl = t_test * _exclusive_cumprod_lanes(one_minus, cw)
            include = valid & (t_excl * one_minus >= T_EPS)
            w = jnp.where(include, alpha * t_excl, 0.0)

            # s_j = w_j (c_j . g_p): one MXU matmul [P,3]x[3,cw].
            cg = lax.dot_general(
                g_rgb, g[6:9, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)     # [P, cw]
            s = w * cg
            pref_incl = pref + _inclusive_cumsum_lanes(s, cw)
            suffix = sdot_total - pref_incl          # (S_i . g_p)

            inv_om = 1.0 / jnp.maximum(one_minus, 1e-10)
            d_alpha = (jnp.where(include, t_excl * cg, 0.0)
                       - jnp.where(valid, suffix * inv_om, 0.0)
                       - jnp.where(include, gteff * t_final * inv_om, 0.0))

            # Chain through alpha = min(.99, op*exp(power)).
            unclamped = raw < ALPHA_MAX
            d_raw = jnp.where(valid & unclamped, d_alpha, 0.0)
            d_op_pix = d_raw * expp
            d_pow = d_raw * raw
            d_x_pix = d_pow * (ca * dx + cb * dy)
            d_y_pix = d_pow * (cb * dx + cc * dy)
            d_ca_pix = d_pow * (-0.5 * dx * dx)
            d_cb_pix = d_pow * (-dx * dy)
            d_cc_pix = d_pow * (-0.5 * dy * dy)

            # Per-entry rows: column sums over pixels (VPU) + one matmul
            # for the color grads d c_i = sum_p w_i(p) g_p.
            def colsum(a):
                return jnp.sum(a, axis=0, keepdims=True)     # [1, chunk]

            drgb = lax.dot_general(
                w, g_rgb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)             # [cw, 3]
            rows = jnp.concatenate([
                colsum(d_x_pix), colsum(d_y_pix), colsum(d_ca_pix),
                colsum(d_cb_pix), colsum(d_cc_pix), colsum(d_op_pix),
                jnp.transpose(drgb, (1, 0)),
            ], axis=0)                                       # [9, cw]

            # Keep only this chunk's lanes, shift the d-offset away so
            # buffer row r holds entry (start + c*chunk + r), and write the
            # chunk's rows — the same disjoint-row DMA pattern as the
            # feature backward (pallas_train.py:136-154): zero overhang
            # beyond `count` reaches only LATER entries, whose owning tile
            # writes afterwards (sort-path segments are contiguous).
            ent = jnp.transpose(rows, (1, 0))                # [cw, 9]
            row_i = lax.broadcasted_iota(jnp.int32, (cw, 1), 0)
            keep = (row_i >= d) & (row_i < d + remaining)
            ent = jnp.where(keep, ent, 0.0)
            ent = pltpu.roll(ent, shift=cw - d, axis=0)
            kpad = jnp.zeros((cw, GRAD_W - N_GRAD), jnp.float32)
            dbuf[...] = jnp.concatenate([ent, kpad], axis=1)
            cp = pltpu.make_async_copy(
                dbuf.at[pl.ds(0, chunk)],
                dgrad_hbm.at[pl.ds(start + c * chunk, chunk), :], wsem)
            cp.start()
            cp.wait()

            log_v = jnp.log1p(-alpha)
            t_next = t_test * jnp.exp(jnp.sum(log_v, axis=1, keepdims=True))
            pref_next = pref + jnp.sum(s, axis=1, keepdims=True)
            return t_next, pref_next

        init = (jnp.ones((P, 1), jnp.float32), jnp.zeros((P, 1), jnp.float32))
        lax.fori_loop(0, n_chunks, body, init)
        return carry

    lax.fori_loop(0, tile_batch, process_tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=("grid_x", "grid_y", "chunk", "tile_batch", "interpret"),
)
def rgb_grads_pallas(
    entry_geom: jnp.ndarray,    # [GEOM_W, E_pad] field-major
    tile_start: jnp.ndarray,    # [T] int32
    tile_count: jnp.ndarray,    # [T] int32
    tile_ids: jnp.ndarray,      # [T] int32
    g_pack: jnp.ndarray,        # [T, P, 8]: g_rgb(3) sdot gteff tfinal pad2
    *,
    grid_x: int,
    grid_y: int,
    chunk: int = 256,
    tile_batch: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-entry gradient rows [E_pad, GRAD_W] (cols: dx dy dca dcb dcc dop
    dr dg db). Rows outside any tile segment are zero (masked in-kernel);
    overlapping aligned windows are written by exactly one tile because
    windows are disjoint per (tile, chunk) and masked lanes write zeros —
    the caller must still mask dead sentinel entries before reducing."""
    n_local = tile_start.shape[0]
    num_tiles = grid_x * grid_y

    n_prog = -(-n_local // tile_batch)
    n_pad = n_prog * tile_batch
    tile_start = jnp.pad(tile_start, (0, n_pad - n_local))
    tile_count = jnp.pad(tile_count, (0, n_pad - n_local))
    tile_ids = jnp.pad(tile_ids, (0, n_pad - n_local),
                       constant_values=num_tiles)
    g_pack = jnp.pad(g_pack, ((0, n_pad - n_local), (0, 0), (0, 0)))

    kernel = functools.partial(
        _rgb_bwd_kernel,
        chunk=chunk, grid_x=grid_x, num_tiles=num_tiles,
        tile_batch=tile_batch,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((tile_batch, P, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((4, GEOM_W, chunk + LANE), jnp.float32),
            pltpu.VMEM((chunk + LANE, GRAD_W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    dgrad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((entry_geom.shape[1], GRAD_W),
                                       jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, tile_ids, entry_geom, g_pack)
    return dgrad


# ---------------------------------------------------------------------------
# custom-VJP blend core (geometry-phase training contract)
# ---------------------------------------------------------------------------

def _rgb_core_fwd_impl(settings, xy, conic, op_vec, rgb, g_sorted_f,
                       tile_start_f, tile_count_f, valid_f, expidx_f,
                       tiles_f):
    from .rasterize import _pallas_supported

    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    interp = not _pallas_supported()
    chunk = 256
    g_sorted = lax.bitcast_convert_type(g_sorted_f, jnp.int32)
    tile_start = lax.bitcast_convert_type(tile_start_f, jnp.int32)
    tile_count = lax.bitcast_convert_type(tile_count_f, jnp.int32)

    rows = pallas_blend.pack_gaussian_rows(xy, conic, op_vec, rgb)
    entry_geom = pallas_blend.to_field_major(rows[g_sorted], chunk)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    dummy = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)
    rgb_t, _, t_t = pallas_blend.blend_tiles_pallas(
        entry_geom, dummy, tile_start, tile_count, tile_ids, bg=jnp.zeros(3),
        grid_x=grid_x, grid_y=grid_y, mode="rgb", out_channels=0,
        chunk=chunk, interpret=interp)
    # rgb_t here excludes the background term (bg=0): the caller composites
    # bg outside the VJP so d(T_final) sees the bg path through XLA.
    residuals = (entry_geom, tile_start, tile_count, g_sorted, valid_f,
                 rgb_t, t_t, xy.shape[0], expidx_f, tiles_f)
    return (rgb_t, t_t), residuals


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def rgb_blend_core(settings, xy, conic, op_vec, rgb, g_sorted_f,
                   tile_start_f, tile_count_f, valid_f, expidx_f, tiles_f):
    """Tile blend (RGB mode, bg-free) with a Pallas forward AND backward.

    Integer binning arrays travel bitcast to f32 (bit-preserving; their
    "gradients" are zeros) so the custom_vjp signature stays all-float.
    Returns (rgb_tiles [T, P, 3] WITHOUT background, final_T [T, P]).
    """
    return _rgb_core_fwd_impl(settings, xy, conic, op_vec, rgb, g_sorted_f,
                              tile_start_f, tile_count_f, valid_f,
                              expidx_f, tiles_f)[0]


def _rgb_core_vjp_fwd(settings, xy, conic, op_vec, rgb, g_sorted_f,
                      tile_start_f, tile_count_f, valid_f, expidx_f,
                      tiles_f):
    return _rgb_core_fwd_impl(settings, xy, conic, op_vec, rgb, g_sorted_f,
                              tile_start_f, tile_count_f, valid_f,
                              expidx_f, tiles_f)


def _rgb_core_vjp_bwd(settings, res, cot):
    from .rasterize import _pallas_supported

    (entry_geom, tile_start, tile_count, g_sorted, valid_f, rgb_t, t_t,
     n, expidx_f, tiles_f) = res
    g_rgb_t, g_t_t = cot
    grid_x, grid_y = settings.grid_x, settings.grid_y
    interp = not _pallas_supported()

    # Per-pixel scalars the kernel consumes: sdot = (C_total . g),
    # gteff = dL/dT_final (the bg path was composited outside, so g_t_t
    # already carries it), t_final.
    sdot = jnp.sum(rgb_t * g_rgb_t, axis=-1, keepdims=True)   # [T, P, 1]
    g_pack = jnp.concatenate([
        g_rgb_t, sdot, g_t_t[..., None], t_t[..., None],
        jnp.zeros(g_rgb_t.shape[:2] + (2,), jnp.float32),
    ], axis=-1)                                               # [T, P, 8]

    tile_ids = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    dgrad = rgb_grads_pallas(
        entry_geom, tile_start, tile_count, tile_ids, g_pack,
        grid_x=grid_x, grid_y=grid_y, interpret=interp)

    entry_valid = lax.bitcast_convert_type(valid_f, jnp.int32) > 0
    e = g_sorted.shape[0]
    dgrad = jnp.where(
        jnp.pad(entry_valid,
                (0, dgrad.shape[0] - entry_valid.shape[0]))[:, None],
        dgrad[:, :N_GRAD], 0.0)[:e]
    # Scatter-free E->N reduction: sort the 9 gradient columns back to
    # gaussian-major EXPANSION order by the carried sort permutation, then
    # contiguous-segment sums via cumsum + boundary diffs at the expansion
    # offsets (w16-padded boundary rows: narrow gathers cliff below w8).
    # Replaces the 64-wide-padded scatter-add (measured 37 ms at 2M
    # updates) with ~14 ms of sort+cumsum.
    expidx = lax.bitcast_convert_type(expidx_f, jnp.uint32)
    tiles_touched = lax.bitcast_convert_type(tiles_f, jnp.int32)
    cols = tuple(dgrad[:, j] for j in range(N_GRAD))
    sorted_back = lax.sort((expidx, *cols), num_keys=1, is_stable=False)
    s_exp = jnp.stack(sorted_back[1:], axis=1)               # [E, 9]
    s_exp = jnp.pad(s_exp, ((0, 0), (0, 16 - N_GRAD)))
    csum = jnp.concatenate(
        [jnp.zeros((1, 16), jnp.float32), jnp.cumsum(s_exp, axis=0)],
        axis=0)                                              # [E+1, 16]
    offsets = jnp.cumsum(tiles_touched) - tiles_touched
    starts = jnp.minimum(offsets, e)
    ends = jnp.minimum(offsets + tiles_touched, e)
    bounds = csum[jnp.concatenate([starts, ends])]           # [2N, 16]
    per_gauss = (bounds[n:] - bounds[:n])[:, :N_GRAD]

    d_xy = per_gauss[:, 0:2]
    d_conic = per_gauss[:, 2:5]
    d_op = per_gauss[:, 5]
    d_rgb = per_gauss[:, 6:9]
    # Binning arrays travel as f32-bitcast ints: their "gradients" are f32
    # zeros of the right shape, discarded at the stop_gradient upstream.
    return (d_xy, d_conic, d_op, d_rgb,
            jnp.zeros(g_sorted.shape, jnp.float32),
            jnp.zeros(tile_start.shape, jnp.float32),
            jnp.zeros(tile_count.shape, jnp.float32),
            jnp.zeros(valid_f.shape, jnp.float32),
            jnp.zeros(expidx_f.shape, jnp.float32),
            jnp.zeros(tiles_f.shape, jnp.float32))


rgb_blend_core.defvjp(_rgb_core_vjp_fwd, _rgb_core_vjp_bwd)


def rasterize_rgb_vjp(settings, means3d, opacities, viewmatrix, projmatrix,
                      campos, bg, scales, rotations, shs, colors_precomp,
                      means2d_dummy=None):
    """RGB-mode rasterization: Pallas forward + Pallas backward.

    Projection/SH/covariance run in XLA under autodiff (gradients chain to
    means3D/scales/rotations/SH and the means2D densification carrier);
    binning is stop-gradient; the blend core carries the custom VJP.
    Returns (rgb [3,H,W], final_t [H,W], radii, max_tile_count, total).
    """
    from . import pallas_binning, projection, rasterize_tiles

    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y

    proj = projection.preprocess(
        means3d, scales, rotations, None, shs, colors_precomp,
        viewmatrix, projmatrix, campos,
        settings.tanfovx, settings.tanfovy, W, H,
        settings.sh_degree, settings.scale_modifier,
        opacities=lax.stop_gradient(opacities[:, 0]),
    )
    xy = proj.xy
    if means2d_dummy is not None:
        # NDC-scale gradient carrier (reference dL_dmean2D, used by the
        # densification stats — scene/gaussian_model.py:507).
        scale_vec = jnp.array([0.5 * W, 0.5 * H], xy.dtype)
        xy = xy + means2d_dummy * scale_vec

    from .rasterize import _pallas_supported

    interp = not _pallas_supported()
    tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
        jax.tree.map(lax.stop_gradient, proj), grid_x, grid_y,
        settings.max_entries, opacities=lax.stop_gradient(opacities[:, 0]),
        exact_cull=True, interpret=interp)
    keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
    g_sorted, tile_start, tile_count, tile_sorted, expidx = (
        pallas_binning.sorted_binning_from_keys(keys, num_tiles,
                                                with_perm=True))
    valid = (tile_sorted < num_tiles).astype(jnp.int32)

    bc = lambda a: lax.bitcast_convert_type(a, jnp.float32)
    rgb_t, t_t = rgb_blend_core(
        settings, xy, proj.conic, opacities[:, 0], proj.rgb,
        bc(g_sorted), bc(tile_start), bc(tile_count), bc(valid),
        bc(expidx),
        bc(lax.stop_gradient(proj.tiles_touched.astype(jnp.int32))))

    rgb = rasterize_tiles.tiles_to_image(rgb_t, grid_x, grid_y, H, W)
    final_t = rasterize_tiles.tiles_to_image(
        t_t[..., None], grid_x, grid_y, H, W)[0]
    rgb = rgb + final_t[None] * bg[:, None, None]
    return rgb, final_t, proj.radius, tile_count.max(), total
