"""Pallas TPU tile-blend kernel — the production fast path.

TPU-native replacement for the CUDA per-tile blend loop (reference contract:
SURVEY.md §2.3(a) stage 3, call site gaussian_renderer/__init__.py:108-119),
designed for the hardware rather than translated:

- One grid program per 16x16 pixel tile; the tile's depth-sorted entry
  segment (contiguous columns of the field-major entry arrays, built by
  ops/pallas_binning.py) is streamed HBM->VMEM in double-buffered async-DMA
  chunks. Mosaic requires lane-dim DMA offsets to be 128-aligned, so each
  chunk fetches the 128-aligned superset window and re-aligns on-chip with
  one dynamic lane roll (entry arrays stay compact in HBM — no 128-lane
  row padding).
- Per chunk, the alpha matrix [CHUNK, P] is built on the VPU (conic
  quadratic + exp), the front-to-back transmittance is an exclusive
  cumulative product along the chunk axis (log-depth shifted-multiply scan),
  and the weighted accumulation of RGB plus feature channels is ONE MXU
  matmul: acc[P, C] += W[CHUNK, P]^T @ F[CHUNK, C].
- The CUDA early-termination rule (pixel done when T*(1-alpha) < 1e-4)
  becomes a mask on W plus a whole-tile early exit of the chunk loop once
  every pixel has saturated — this keeps the average work per tile
  proportional to visible depth complexity instead of tile depth count.
- Quick mode (the 450+ FPS merged path, eval_lerf.py:293-356) carries each
  entry's top-k (weight, codebook index) pairs inside the packed 28-wide
  entry row (weights exact f32, indices packed two-per-f32-slot) and expands
  them into the dense channel row of F on-chip, so HBM never carries a
  dense [N, 192] coefficient field and the whole entry state needs ONE
  XLA pack gather.

Inclusion semantics match ops/rasterize_tiles.py exactly (same masks, same
T_EPS rule); that module remains the differentiable reference, and the
parity test suite pins this kernel against it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import BLOCK

P = BLOCK * BLOCK            # pixels per tile
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4

GEOM_W = 16                  # geometry row: x y ca cb cc op r g b [pairs*6] pad
RGB_COL = 6                  # rgb lives at fields 6:9
FEAT_COL = GEOM_W            # feature channels start after the geometry prefix
QUICK_PCOL = 9               # quick index pairs start here (geometry row)
PAIR_BASE = 256.0            # two u8 indices per f32 slot: lo + 256 * hi
LANE = 128                   # lane-dim DMA alignment


def _exclusive_cumprod_lanes(one_minus: jnp.ndarray, width: int) -> jnp.ndarray:
    """Exclusive cumulative product along axis 1 (the depth-sorted entry
    lane axis) via a log-depth shifted-multiply scan. [P, cw] -> [P, cw]."""
    t = one_minus
    lane = lax.broadcasted_iota(jnp.int32, t.shape, 1)
    shift = 1
    while shift < width:
        rolled = pltpu.roll(t, shift=shift, axis=1)
        t = t * jnp.where(lane >= shift, rolled, 1.0)
        shift *= 2
    # t is now the inclusive cumprod; shift down one lane for exclusive.
    excl = pltpu.roll(t, shift=1, axis=1)
    return jnp.where(lane >= 1, excl, 1.0)


def _blend_kernel(
    # scalar prefetch
    start_ref, count_ref, tid_ref,
    # inputs (HBM, field-major [W, E_pad])
    geom_hbm, feat_hbm,
    # outputs (VMEM blocks)
    acc_out, t_out,
    # scratch
    geom_buf, feat_buf, acc, t_carry, t_test, sems,
    *,
    chunk: int,
    grid_x: int,
    num_tiles: int,
    mode: str,            # "rgb" | "dense" | "quick"
    acc_width: int,
    topk: int,
    tile_batch: int,
    combined: bool,       # entry_geom is [32, E]: geom rows 0:16 + feat 16:32
):
    i = pl.program_id(0)
    cw = chunk + LANE  # fetched window (aligned superset of the chunk)
    has_feat_dma = mode in ("dense", "quick") and not combined

    def tile_info(k):
        idx = i * tile_batch + k
        tid = tid_ref[idx]
        start = start_ref[idx]
        count = jnp.where(tid < num_tiles, count_ref[idx], 0)
        return start, count, tid

    def aligned(start, c):
        al = ((start + c * chunk) // LANE) * LANE
        return pl.multiple_of(al, LANE)

    def geom_dma(slot, start, c):
        return pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(aligned(start, c), cw)],
            geom_buf.at[slot], sems.at[slot, 0])

    def feat_dma(slot, start, c):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(aligned(start, c), cw)],
            feat_buf.at[slot], sems.at[slot, 1])

    # Program prologue: fetch the first tile's first chunk. Each later
    # tile's chunk 0 is prefetched while its predecessor still computes;
    # slot pairs alternate per tile so the pipelines never collide.
    start0, count0, _ = tile_info(0)

    @pl.when(count0 > 0)
    def _():
        geom_dma(0, start0, 0).start()
        if has_feat_dma:
            feat_dma(0, start0, 0).start()

    def process_tile(k, carry):
        start, count, tid = tile_info(k)
        n_chunks = pl.cdiv(count, chunk)
        base = (k % 2) * 2

        # Prefetch the NEXT tile's first chunk into the other slot pair
        # before blocking on our own data.
        @pl.when(k + 1 < tile_batch)
        def _():
            nstart, ncount, _ = tile_info(k + 1)

            @pl.when(ncount > 0)
            def _():
                nbase = ((k + 1) % 2) * 2
                geom_dma(nbase, nstart, 0).start()
                if has_feat_dma:
                    feat_dma(nbase, nstart, 0).start()

        # Pixel centers of this tile, pixels on the sublane axis: [P, 1].
        tx = (tid % grid_x).astype(jnp.float32)
        ty = (tid // grid_x).astype(jnp.float32)
        pix = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        px = tx * BLOCK + (pix % BLOCK).astype(jnp.float32)
        py = ty * BLOCK + (pix // BLOCK).astype(jnp.float32)

        acc[...] = jnp.zeros_like(acc)
        t_carry[...] = jnp.ones_like(t_carry)  # product over INCLUDED
        t_test[...] = jnp.ones_like(t_test)    # product over all VALID

        def body(c):
            slot = base + c % 2

            @pl.when(c + 1 < n_chunks)
            def _():
                geom_dma(base + (c + 1) % 2, start, c + 1).start()
                if has_feat_dma:
                    feat_dma(base + (c + 1) % 2, start, c + 1).start()

            geom_dma(slot, start, c).wait()
            # Field-major window [W, cw]; entries live on lanes
            # [d, d + chunk) — alignment is handled by masks, not data
            # movement (no roll, no transpose). Out-of-range lanes can hold
            # garbage (cascade segments are not zero-padded); zero them so
            # the accumulate matmul never sees 0 * NaN.
            d = (start + c * chunk) - aligned(start, c)   # in [0, LANE)
            lane = lax.broadcasted_iota(jnp.int32, (1, cw), 1)
            remaining = jnp.minimum(count - c * chunk, chunk)
            in_range = (lane >= d) & (lane < d + remaining)
            g_all = jnp.where(in_range, geom_buf[slot], 0.0)
            g = g_all[:GEOM_W] if combined else g_all
            x = g[0:1, :]
            y = g[1:2, :]
            ca = g[2:3, :]
            cb = g[3:4, :]
            cc = g[4:5, :]
            op = g[5:6, :]

            dx = px - x                             # [P, cw]
            dy = py - y
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            valid = in_range & (power <= 0.0) & (alpha >= ALPHA_MIN)
            alpha = jnp.where(valid, alpha, 0.0)

            one_minus = 1.0 - alpha
            # The include test and the blend weights use the transmittance
            # over ALL prior valid alphas (matching the XLA reference
            # exactly); the final-T output multiplies only the included
            # ones (CUDA semantics — the first epsilon failure permanently
            # terminates a pixel, so both agree on every included entry).
            t_excl = t_test[...] * _exclusive_cumprod_lanes(one_minus, cw)
            include = valid & (t_excl * one_minus >= T_EPS)
            w = jnp.where(include, alpha * t_excl, 0.0)   # [P, cw]

            # Feature rows F^T [acc_width, cw]: the geometry rows carry rgb
            # at rows 6:9; channels start at FEAT_COL. Contraction happens
            # on the lane (entry) axis for both operands — no transposes.
            if mode == "rgb":
                f_rows = g
            elif mode == "dense":
                feat_dma(slot, start, c).wait()
                fb = jnp.where(in_range, feat_buf[slot], 0.0)
                f_rows = jnp.concatenate(
                    [g, fb[: acc_width - FEAT_COL, :]], axis=0)
            else:  # quick: expand packed (weights, idx pairs) on-chip
                if combined:
                    fb = g_all[GEOM_W:GEOM_W + 16]  # [16, cw]: w0..w11
                else:
                    feat_dma(slot, start, c).wait()
                    fb = jnp.where(in_range, feat_buf[slot], 0.0)  # w0..w11
                ch = lax.broadcasted_iota(
                    jnp.int32, (acc_width - FEAT_COL, 1), 0
                ).astype(jnp.float32)
                dense = jnp.zeros((acc_width - FEAT_COL, cw), jnp.float32)
                for j in range(topk):
                    wj = fb[j:j + 1, :]
                    pair = g[QUICK_PCOL + j // 2:QUICK_PCOL + j // 2 + 1, :]
                    hi4 = jnp.floor(pair * (1.0 / PAIR_BASE))
                    ij = pair - hi4 * PAIR_BASE if j % 2 == 0 else hi4
                    dense = dense + wj * (ij == ch).astype(jnp.float32)
                f_rows = jnp.concatenate([g[:FEAT_COL, :], dense], axis=0)

            # HIGHEST precision (f32 via bf16 passes) for parity with the
            # XLA reference blend; the default bf16 pass loses ~1e-3.
            acc[...] += lax.dot_general(
                w, f_rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)          # [P, acc_width]
            # reduce_prod is unsupported in Pallas TPU; exp-sum-log1p
            # matches the XLA reference's log1p(-alpha) accumulation.
            log_v = jnp.log1p(-alpha)
            t_carry[...] *= jnp.exp(jnp.sum(jnp.where(include, log_v, 0.0),
                                            axis=1, keepdims=True))
            t_test[...] *= jnp.exp(jnp.sum(log_v, axis=1, keepdims=True))

        def cond(c):
            return (c < n_chunks) & (jnp.max(t_test[...]) >= T_EPS)

        c_exit = lax.while_loop(cond, lambda c: (body(c), c + 1)[1], 0)

        # Drain: on early exit, body(c_exit - 1) already started the DMA
        # for chunk c_exit; an orphan in-flight DMA would corrupt a later
        # tile's buffers and unbalance the semaphores.
        @pl.when(c_exit < n_chunks)
        def _():
            geom_dma(base + c_exit % 2, start, c_exit).wait()
            if has_feat_dma:
                feat_dma(base + c_exit % 2, start, c_exit).wait()

        acc_out[k] = acc[...]
        t_out[k] = t_carry[...]
        return carry

    lax.fori_loop(0, tile_batch, process_tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=("grid_x", "grid_y", "mode", "out_channels", "topk",
                     "chunk", "tile_batch", "combined", "interpret"),
)
def blend_tiles_pallas(
    entry_geom: jnp.ndarray,    # [GEOM_W, E_pad] f32 field-major
    entry_feat: jnp.ndarray,    # [FW, E_pad] f32 (dense mode only; else [1, E_pad])
    tile_start: jnp.ndarray,    # [T_local] int32
    tile_count: jnp.ndarray,    # [T_local] int32
    tile_ids: jnp.ndarray,      # [T_local] int32 (>= grid_x*grid_y means dummy)
    bg: jnp.ndarray,            # [3]
    *,
    grid_x: int,
    grid_y: int,
    mode: str,                  # "rgb" | "dense" | "quick"
    out_channels: int,          # D (0 for rgb mode)
    topk: int = 12,             # quick mode: sparse pairs per entry
    chunk: int = 256,
    tile_batch: int = 8,        # tiles per grid program (overhead amortization)
    combined: bool = False,     # entry_geom is [32, E]: geom + feat rows
    interpret: bool = False,
):
    """Returns (rgb [T, P, 3], feat [T, P, D] | None, final_T [T, P]).

    Entry arrays are field-major [W, E_pad] with E_pad large enough that any
    [128-aligned start, chunk + 128) window stays in bounds (to_field_major).
    With `combined`, geometry and the 16 feature rows travel in ONE [32, E]
    array (the cascade-binning layout) and a single DMA per chunk.
    """
    assert not (combined and mode == "dense"), \
        "combined rows carry only 16 feature rows"
    n_local = tile_start.shape[0]
    num_tiles = grid_x * grid_y
    acc_width = FEAT_COL + max(out_channels, 1) if mode != "rgb" else GEOM_W
    geom_w = entry_geom.shape[0]
    feat_w = entry_feat.shape[0]
    cw = chunk + LANE

    # Pad the tile arrays to a whole number of programs; padding tiles are
    # dummies (sentinel id -> zero work, zero output).
    n_prog = -(-n_local // tile_batch)
    n_pad = n_prog * tile_batch
    tile_start = jnp.pad(tile_start, (0, n_pad - n_local))
    tile_count = jnp.pad(tile_count, (0, n_pad - n_local))
    tile_ids = jnp.pad(tile_ids, (0, n_pad - n_local),
                       constant_values=num_tiles)

    kernel = functools.partial(
        _blend_kernel,
        chunk=chunk, grid_x=grid_x, num_tiles=num_tiles, mode=mode,
        acc_width=acc_width, topk=topk, tile_batch=tile_batch,
        combined=combined,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((tile_batch, P, acc_width), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_batch, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, geom_w, cw), jnp.float32),
            pltpu.VMEM((4, feat_w, cw), jnp.float32),
            pltpu.VMEM((P, acc_width), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.VMEM((P, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )

    acc_t, t_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, P, acc_width), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, P, 1), jnp.float32),
        ],
        interpret=interpret,
    )(tile_start, tile_count, tile_ids, entry_geom, entry_feat)

    acc_t = acc_t[:n_local]
    t_t = t_t[:n_local]
    final_t = t_t[:, :, 0]                                   # [T, P]
    rgb = acc_t[:, :, RGB_COL:RGB_COL + 3] + final_t[..., None] * bg[None, None, :]
    feat = acc_t[:, :, FEAT_COL:FEAT_COL + out_channels] if mode != "rgb" else None
    return rgb, feat, final_t


def pack_gaussian_rows(xy, conic, opacities, colors):
    """Per-gaussian packed geometry rows [N, GEOM_W] (pre-gather layout)."""
    n = xy.shape[0]
    rgb = colors if colors is not None else jnp.zeros((n, 3), xy.dtype)
    return jnp.concatenate(
        [xy, conic, opacities[:, None], rgb,
         jnp.zeros((n, GEOM_W - 9), xy.dtype)], axis=1)


def pack_quick_rows(xy, conic, opacities, colors, quick_weights, quick_indices):
    """Per-gaussian packed quick state as TWO 16-wide row sets (one w32
    gather is ~30% slower than two fused w16 gathers on v5e):

    geometry rows [N, 16]: x y conic(3) op rgb(3) idx-pairs(topk/2) pad
    weight rows  [N, 16]: topk f32 weights + pad
    Index pairs pack two u8-range channel ids per f32 slot (exact)."""
    n, s = quick_weights.shape
    assert s % 2 == 0, "quick topk must be even to pack index pairs"
    assert 9 + s // 2 <= GEOM_W and s <= GEOM_W
    rgb = colors if colors is not None else jnp.zeros((n, 3), xy.dtype)
    qi = quick_indices.astype(jnp.float32)
    pairs = qi[:, 0::2] + PAIR_BASE * qi[:, 1::2]      # [N, s//2]
    geom = jnp.concatenate(
        [xy, conic, opacities[:, None], rgb, pairs,
         jnp.zeros((n, GEOM_W - 9 - s // 2), xy.dtype)], axis=1)
    wrows = jnp.concatenate(
        [quick_weights, jnp.zeros((n, GEOM_W - s), xy.dtype)], axis=1)
    return geom, wrows


def to_field_major(entries: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """[E, W] entry rows -> field-major [W, E_pad] padded so every
    128-aligned [al, chunk + 128) lane window stays in bounds."""
    e = entries.shape[0]
    target = -(-e // LANE) * LANE + chunk + LANE
    return jnp.pad(entries, ((0, target - e), (0, 0))).T
