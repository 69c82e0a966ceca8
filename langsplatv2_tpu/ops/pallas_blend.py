"""Pallas TPU tile-blend kernel — the production fast path.

TPU-native replacement for the CUDA per-tile blend loop (reference contract:
SURVEY.md §2.3(a) stage 3, call site gaussian_renderer/__init__.py:108-119),
designed for the hardware rather than translated:

- One grid program per batch of 16x16 pixel tiles; each tile's depth-sorted
  entry segment (contiguous columns of the field-major entry arrays, built
  by ops/pallas_binning.py or ops/pallas_cascade.py) is streamed HBM->VMEM
  in double-buffered async-DMA chunks. Chunks are fetched from the segment's
  128-ALIGNED base (Mosaic requires lane-dim DMA offsets to be 128-aligned),
  so every window is exactly `chunk` lanes; the sub-128 misalignment `d` of
  the segment start is handled purely by the validity mask — no oversized
  fetch window, no data movement.
- Per chunk, the alpha matrix [P, chunk] is built on the VPU (conic
  quadratic + exp), the front-to-back transmittance is an exclusive
  cumulative product along the chunk axis (log-depth shifted-multiply scan),
  and the weighted accumulation of RGB plus feature channels is ONE MXU
  matmul: acc[P, C] += W[P, chunk] @ F[chunk, C]^T.
- The CUDA early-termination rule (pixel done when T*(1-alpha) < 1e-4)
  becomes a mask on W plus a whole-tile early exit of the chunk loop once
  every pixel has saturated — this keeps the average work per tile
  proportional to visible depth complexity instead of tile depth count.
- Quick mode (the 450+ FPS merged path, eval_lerf.py:293-356) carries each
  entry's top-k (weight, codebook index) pairs inside the packed entry row
  and expands them into the dense channel rows of F on-chip, so HBM never
  carries a dense [N, 192] coefficient field.

Two row formats:

- "f32" (parity): 16-wide f32 geometry rows (+16 feature rows when
  `combined`, or a separate feature array). Exact f32 math, HIGHEST-
  precision matmuls — bit-stable against the XLA reference blend
  (ops/rasterize_tiles.py), which the parity test suite pins.
- "fast16" (serving): ONE 16-wide row per entry packing the whole quick
  state — xy f32, conic/opacity/rgb as bf16 pairs, 12 codebook indices as
  exact base-256 triples, 12 weights as bf16 pairs — so the whole entry
  state needs a single w16 XLA pack gather (row-count is what bounds XLA
  gathers on TPU, ~140M rows/s regardless of width). In-kernel, the conic
  quadratic moves to the MXU as a [P, 8] x [8, chunk] polynomial matmul in
  tile-relative coordinates, the transmittance scan becomes a strict-lower-
  triangular matmul, the channel expansion compares only each index's
  64-wide codebook band, and the accumulate runs at default (bf16) MXU
  precision. Output error vs the parity path is ~1e-3 relative — invisible
  to relevancy queries; training and eval default to the parity path.
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
POWER_TOL = 1e-5             # fast16: MXU-rounded power vs the exact <=0 test

GEOM_W = 16                  # geometry row: x y ca cb cc op r g b [pairs*6] pad
RGB_COL = 6                  # rgb lives at fields 6:9 (f32 format)
FEAT_COL = GEOM_W            # feature channels start after the geometry prefix
QUICK_PCOL = 9               # quick index pairs start here (geometry row)
PAIR_BASE = 256.0            # two u8 indices per f32 slot: lo + 256 * hi
LANE = 128                   # lane-dim DMA alignment

# fast16 packed row layout (single 16-wide row per entry):
#   0 x (f32)   1 y (f32)
#   2 ca|cb     3 cc|op     4 r|g      5 b|-         (bf16 pairs, hi|lo)
#   6:10  codebook-index triples i0 + 256*i1 + 65536*i2 (exact in f32)
#   10:16 weight bf16 pairs w(2s)|w(2s+1)
F16_CONIC = 2
F16_IDX = 6
F16_W = 10
F16_RGB_COL = 0              # fast16 acc layout: rgb rows 0:3, channels 3:
F16_FEAT_COL = 3
LEVEL_BAND = 64              # codebook band width for banded expansion


def _unpack_hi(v):
    """High bf16 of a packed f32 pair, as f32 (exact bit extension)."""
    u = lax.bitcast_convert_type(v, jnp.uint32)
    return lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)


def _unpack_lo(v):
    u = lax.bitcast_convert_type(v, jnp.uint32)
    return lax.bitcast_convert_type(u << 16, jnp.float32)


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
    # inputs (HBM, field-major [W, E_pad]) + optional query constants (VMEM)
    geom_hbm, feat_hbm, *rest,
    # keyword-only statics
    chunk: int,
    grid_x: int,
    num_tiles: int,
    mode: str,            # "rgb" | "dense" | "quick"
    acc_width: int,
    out_width: int,       # acc_out channel width (== acc_width unless query)
    topk: int,
    tile_batch: int,
    combined: bool,       # entry_geom is [32, E]: geom rows 0:16 + feat 16:32
    rowfmt: str,          # "f32" | "fast16"
    banded: bool,         # fast16: indices respect 64-wide level bands
    query: bool,          # fuse the Gram relevancy query into the epilogue
    cellbf16: bool,       # fast16: per-entry VPU cell math in bf16 (2x lane
                          # packing; ~1e-2 relative — still inside the fast
                          # serving contract). f32 cells otherwise.
):
    if query:
        (phi_vmem, gram_vmem, band_vmem, acc_out, t_out,
         geom_buf, feat_buf, acc, t_carry, t_test, sems) = rest
    else:
        (acc_out, t_out,
         geom_buf, feat_buf, acc, t_carry, t_test, sems) = rest
    i = pl.program_id(0)
    fast = rowfmt == "fast16"
    packed = rowfmt == "f32pack"
    assert not cellbf16 or fast, "bf16 cell math rides the fast16 path"
    cdt = jnp.bfloat16 if cellbf16 else jnp.float32
    has_feat_dma = (mode in ("dense", "quick") and not combined and not fast
                    and not packed)

    def tile_info(k):
        idx = i * tile_batch + k
        tid = tid_ref[idx]
        start = start_ref[idx]
        count = jnp.where(tid < num_tiles, count_ref[idx], 0)
        return start, count, tid

    def base_al(start):
        return pl.multiple_of((start // LANE) * LANE, LANE)

    def geom_dma(slot, start, c):
        off = pl.multiple_of(base_al(start) + c * chunk, LANE)
        return pltpu.make_async_copy(
            geom_hbm.at[:, pl.ds(off, chunk)], geom_buf.at[slot],
            sems.at[slot, 0])

    def feat_dma(slot, start, c):
        off = pl.multiple_of(base_al(start) + c * chunk, LANE)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, chunk)], feat_buf.at[slot],
            sems.at[slot, 1])

    if fast:
        # Tile-relative pixel polynomial basis [P, 8] (identical for every
        # tile): [px^2, py^2, px*py, px, py, 1, 0, 0]. The conic quadratic
        # power = Ppix @ C becomes one small HIGHEST-precision MXU matmul;
        # tile-relative coordinates keep every term O(q), so f32 rounding
        # stays ~1e-6 (absolute pixel coords would cancel ~1e6 terms).
        pix = lax.broadcasted_iota(jnp.int32, (P, 1), 0)
        pxr = (pix % BLOCK).astype(jnp.float32)
        pyr = (pix // BLOCK).astype(jnp.float32)
        ppix = jnp.concatenate(
            [pxr * pxr, pyr * pyr, pxr * pyr, pxr, pyr,
             jnp.ones((P, 1), jnp.float32), jnp.zeros((P, 2), jnp.float32)],
            axis=1)                                        # [P, 8]
        # Strict lower-triangular ones: cum[p, i] = sum_{j<i} lm[p, j].
        # Cast i1 -> f32 -> cdt: the direct i1 -> bf16 cast trips a Mosaic
        # relayout bug on v5e ("Non-singleton logical dimension is
        # replicated in destination but not in source", measured r4).
        lt = (lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
              < lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
              ).astype(jnp.float32).astype(cdt)
        ones_col = jnp.ones((chunk, 1), cdt)

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
        d = start - base_al(start)           # sub-128 misalignment, in [0, 128)
        # count == 0 must mean ZERO chunks: the chunk-0 DMA is only ever
        # started (prologue/prefetch) for tiles with count > 0, so an
        # empty tile with d > 0 would otherwise run body(0) and wait on a
        # semaphore nothing signals — a device hang that kills the TPU
        # worker (hit on real scenes with empty tiles, e.g. the c=4
        # strong-scaling strip: 218 empty tiles with misaligned starts).
        n_chunks = jnp.where(count > 0, pl.cdiv(d + count, chunk), 0)
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

        tx = (tid % grid_x).astype(jnp.float32)
        ty = (tid // grid_x).astype(jnp.float32)
        if not fast:
            # Pixel centers of this tile, pixels on the sublane axis: [P, 1].
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
            # Entries live on lanes [d, d + count) of the aligned stream;
            # everything else in the window (the previous segment's tail,
            # padding, cascade garbage) is masked to zero rows so the
            # accumulate matmul never sees 0 * NaN.
            lane = lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            rel = lane + c * chunk
            in_range = (rel >= d) & (rel < d + count)
            g_all = jnp.where(in_range, geom_buf[slot], 0.0)
            g = g_all[:GEOM_W] if combined else g_all
            x = g[0:1, :]
            y = g[1:2, :]

            if fast:
                ca = _unpack_hi(g[F16_CONIC:F16_CONIC + 1, :])
                cb = _unpack_lo(g[F16_CONIC:F16_CONIC + 1, :])
                cc = _unpack_hi(g[F16_CONIC + 1:F16_CONIC + 2, :])
                op = _unpack_lo(g[F16_CONIC + 1:F16_CONIC + 2, :])
                # Conic quadratic on the MXU, tile-relative.
                xr = x - tx * BLOCK
                yr = y - ty * BLOCK
                coeffs = jnp.concatenate([
                    -0.5 * ca,
                    -0.5 * cc,
                    -cb,
                    ca * xr + cb * yr,
                    cb * xr + cc * yr,
                    -0.5 * ca * xr * xr - cb * xr * yr - 0.5 * cc * yr * yr,
                    jnp.zeros((2, chunk), jnp.float32),
                ], axis=0)                                   # [8, chunk]
                power = lax.dot_general(
                    ppix, coeffs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)         # [P, chunk]
                if cellbf16:
                    # One f32->bf16 cast, then the whole [P, chunk] cell
                    # chain runs at 2x VPU lane packing. The VALIDITY
                    # compares stay on the f32 operands: v5e's VPU has no
                    # bf16 compare ("Target does not support this
                    # comparison", measured r4) and the f32 test is also
                    # the exact one.
                    valid = in_range & (power <= POWER_TOL)
                    power = power.astype(cdt)
                    op = op.astype(cdt)
                    alpha = jnp.minimum(jnp.asarray(ALPHA_MAX, cdt),
                                        op * jnp.exp(power))
                    valid = valid & (alpha.astype(jnp.float32) >= ALPHA_MIN)
                else:
                    alpha = jnp.minimum(jnp.asarray(ALPHA_MAX, cdt),
                                        op * jnp.exp(power))
                    valid = (in_range & (power <= POWER_TOL)
                             & (alpha >= ALPHA_MIN))
            else:
                ca = g[2:3, :]
                cb = g[3:4, :]
                cc = g[4:5, :]
                op = g[5:6, :]
                dx = px - x                             # [P, chunk]
                dy = py - y
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                valid = in_range & (power <= 0.0) & (alpha >= ALPHA_MIN)
            alpha = jnp.where(valid, alpha, 0.0)

            # The include test and the blend weights use the transmittance
            # over ALL prior valid alphas (matching the XLA reference
            # exactly); the final-T output multiplies only the included
            # ones (CUDA semantics — the first epsilon failure permanently
            # terminates a pixel, so both agree on every included entry).
            if fast:
                # log-domain scan as one strict-lower-triangular matmul
                # (default/bf16 MXU pass; T error ~0.4% relative — the
                # fast-mode contract).
                # log1p legalizes only on f32 in v5e Mosaic; the matmul
                # operand drops back to cdt afterwards.
                lm = jnp.log1p(-alpha.astype(jnp.float32)).astype(cdt)
                cum = lax.dot_general(
                    lm, lt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # exclusive sums
                t_excl = t_test[...].astype(cdt) * jnp.exp(cum.astype(cdt))
            else:
                one_minus = 1.0 - alpha
                t_excl = t_test[...] * _exclusive_cumprod_lanes(
                    one_minus, chunk)
            # (f32 compare: v5e has no bf16 compare — see the cellbf16
            # validity note above.)
            include = valid & (
                (t_excl * (1.0 - alpha)).astype(jnp.float32) >= T_EPS)
            w = jnp.where(include, alpha * t_excl, 0.0)      # [P, chunk]

            # Feature rows F^T [acc_width, chunk]; contraction happens on
            # the lane (entry) axis for both operands — no transposes.
            if mode == "rgb":
                f_rows = g
            elif mode == "dense":
                feat_dma(slot, start, c).wait()
                fb = jnp.where(in_range, feat_buf[slot], 0.0)
                f_rows = jnp.concatenate(
                    [g, fb[: acc_width - FEAT_COL, :]], axis=0)
            elif fast:                                       # quick fast16
                r_row = _unpack_hi(g[4:5, :]).astype(cdt)
                g_row = _unpack_lo(g[4:5, :]).astype(cdt)
                b_row = _unpack_hi(g[5:6, :]).astype(cdt)
                ws = []
                for s in range(6):
                    # The packed pairs ARE bf16 bit patterns — the cdt cast
                    # is exact either way.
                    ws.append(_unpack_hi(
                        g[F16_W + s:F16_W + s + 1, :]).astype(cdt))
                    ws.append(_unpack_lo(
                        g[F16_W + s:F16_W + s + 1, :]).astype(cdt))
                idx = []
                for t in range(4):
                    # Base-256 triple decode needs f32's 24-bit mantissa
                    # (v up to ~12.6M); the decoded indices (< 256) are then
                    # exact in bf16, so the eq/mul/add expansion below runs
                    # at cdt lane packing.
                    v = g[F16_IDX + t:F16_IDX + t + 1, :]
                    i2 = jnp.floor(v * (1.0 / 65536.0))
                    r = v - 65536.0 * i2
                    i1 = jnp.floor(r * (1.0 / 256.0))
                    idx += [(r - 256.0 * i1).astype(cdt), i1.astype(cdt),
                            i2.astype(cdt)]
                nch = acc_width - F16_FEAT_COL

                if cellbf16:
                    # v5e has no bf16 compare: build the one-hot
                    # arithmetically as relu(1 - |idx - ch|) — EXACT for
                    # the integer-valued operands here (all < 256, which
                    # bf16 represents exactly), and fully lane-packed.
                    def eq1(a, b):
                        return jnp.maximum(
                            jnp.asarray(0.0, cdt),
                            jnp.asarray(1.0, cdt) - jnp.abs(a - b))
                else:
                    def eq1(a, b):
                        return (a == b).astype(cdt)

                if banded:
                    # Merged quick models give level l the index range
                    # [64l, 64(l+1)) (eval_lerf.py:333-348): compare each
                    # index only against its own 64-wide band.
                    n_levels = nch // LEVEL_BAND
                    per_level = topk // n_levels
                    ch = lax.broadcasted_iota(
                        jnp.int32, (LEVEL_BAND, 1), 0).astype(cdt)
                    bands = []
                    for lvl in range(n_levels):
                        b = jnp.zeros((LEVEL_BAND, chunk), cdt)
                        for j in range(lvl * per_level, (lvl + 1) * per_level):
                            local = idx[j] - jnp.asarray(LEVEL_BAND * lvl, cdt)
                            b = b + ws[j] * eq1(local, ch)
                        bands.append(b)
                    dense = jnp.concatenate(bands, axis=0)
                else:
                    ch = lax.broadcasted_iota(
                        jnp.int32, (nch, 1), 0).astype(cdt)
                    dense = jnp.zeros((nch, chunk), cdt)
                    for j in range(topk):
                        dense = dense + ws[j] * eq1(idx[j], ch)
                f_rows = jnp.concatenate([r_row, g_row, b_row, dense], axis=0)
            else:  # quick f32: expand packed (weights, idx pairs) on-chip
                if packed:
                    # f32pack (training): the topk<=4 weights ride the SAME
                    # 16-wide geometry row (rows wbase:wbase+topk) — one
                    # w16 gather for the whole entry state, full f32.
                    wbase = QUICK_PCOL + (topk + 1) // 2
                    fb = g[wbase:wbase + topk, :]
                elif combined:
                    fb = g_all[GEOM_W:GEOM_W + 16]  # [16, chunk]: w0..w11
                else:
                    feat_dma(slot, start, c).wait()
                    fb = jnp.where(in_range, feat_buf[slot], 0.0)
                ch = lax.broadcasted_iota(
                    jnp.int32, (acc_width - FEAT_COL, 1), 0
                ).astype(jnp.float32)
                dense = jnp.zeros((acc_width - FEAT_COL, chunk), jnp.float32)
                for j in range(topk):
                    wj = fb[j:j + 1, :]
                    pair = g[QUICK_PCOL + j // 2:QUICK_PCOL + j // 2 + 1, :]
                    hi4 = jnp.floor(pair * (1.0 / PAIR_BASE))
                    ij = pair - hi4 * PAIR_BASE if j % 2 == 0 else hi4
                    dense = dense + wj * (ij == ch).astype(jnp.float32)
                f_rows = jnp.concatenate([g[:FEAT_COL, :], dense], axis=0)

            if fast:
                # Default (bf16) MXU pass: ~1e-3 relative — the serving
                # contract; parity mode keeps HIGHEST.
                acc[...] += lax.dot_general(
                    w, f_rows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if cellbf16:
                    # Lane reduction of bf16 values via the MXU (f32
                    # accumulate) — a plain jnp.sum would accumulate at
                    # bf16 precision across 256 lanes.
                    s_inc = lax.dot_general(
                        jnp.where(include, lm, 0.0), ones_col,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)   # [P, 1]
                    t_carry[...] *= jnp.exp(s_inc)
                    t_test[...] *= jnp.exp(
                        cum[:, chunk - 1:chunk]
                        + lm[:, chunk - 1:chunk].astype(jnp.float32))
                else:
                    t_carry[...] *= jnp.exp(jnp.sum(
                        jnp.where(include, lm, 0.0), axis=1, keepdims=True))
                    # Inclusive total = exclusive sum at the last lane + lm.
                    t_test[...] *= jnp.exp(cum[:, chunk - 1:chunk]
                                           + lm[:, chunk - 1:chunk])
            else:
                acc[...] += lax.dot_general(
                    w, f_rows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)          # [P, acc_width]
                # reduce_prod is unsupported in Pallas TPU; exp-sum-log1p
                # matches the XLA reference's log1p(-alpha) accumulation.
                log_v = jnp.log1p(-alpha)
                t_carry[...] *= jnp.exp(jnp.sum(
                    jnp.where(include, log_v, 0.0), axis=1, keepdims=True))
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

        if query:
            # Fused Gram relevancy epilogue: the [P, L*K] weight-map tile
            # never leaves VMEM — only the per-prompt raw scores and the
            # per-level Gram norms are written to HBM (~10x less output
            # traffic than the 192-channel map, and the XLA-side einsum
            # passes over a ~1.6GB feature map disappear entirely).
            wm = acc[:, F16_FEAT_COL:]                       # [P, LK]
            raw = lax.dot_general(                            # [P, L*PQ]
                wm, phi_vmem[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # bf16 pass ==
            wg = lax.dot_general(                             # the XLA query's
                wm, gram_vmem[...], (((1,), (0,)), ((), ())), # bf16 einsums
                preferred_element_type=jnp.float32)           # [P, LK]
            nrm2 = lax.dot_general(
                wg * wm, band_vmem[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)              # [P, L]
            acc_out[k] = jnp.concatenate(
                [acc[:, :F16_FEAT_COL], raw, nrm2], axis=1)
        else:
            # Accumulation stays f32 in VMEM scratch; only the final HBM
            # store narrows (feat_bf16 halves the [T, P, C] map's write +
            # downstream read traffic for the serving query).
            acc_out[k] = acc[...].astype(acc_out.dtype)
        t_out[k] = t_carry[...]
        return carry

    lax.fori_loop(0, tile_batch, process_tile, 0)


@functools.partial(
    jax.jit,
    static_argnames=("grid_x", "grid_y", "mode", "out_channels", "topk",
                     "chunk", "tile_batch", "combined", "rowfmt", "banded",
                     "bf16_cells", "feat_bf16", "interpret"),
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
    rowfmt: str = "f32",        # "f32" (parity) | "fast16" (packed serving)
    banded: bool = False,       # fast16: level-banded channel expansion
    bf16_cells: bool = False,   # fast16: bf16 per-entry VPU cell math
    feat_bf16: bool = False,    # fast16: store the output tiles in bf16
    interpret: bool = False,
):
    """Returns (rgb [T, P, 3], feat [T, P, D] | None, final_T [T, P]).

    Entry arrays are field-major [W, E_pad] with E_pad large enough that any
    [128-aligned start, + n_chunks*chunk) window stays in bounds
    (to_field_major). With `combined`, geometry and the 16 feature rows
    travel in ONE [32, E] array (the cascade-binning layout); with
    rowfmt="fast16", the WHOLE quick entry state travels in one packed
    [16, E] array (pack_fast16_rows) and `entry_feat` is ignored.
    """
    return _blend_call(
        entry_geom, entry_feat, tile_start, tile_count, tile_ids, bg,
        None, None, None, grid_x=grid_x, grid_y=grid_y, mode=mode,
        out_channels=out_channels, topk=topk, chunk=chunk,
        tile_batch=tile_batch, combined=combined, rowfmt=rowfmt,
        banded=banded, bf16_cells=bf16_cells, feat_bf16=feat_bf16,
        interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("grid_x", "grid_y", "out_channels", "topk",
                     "chunk", "tile_batch", "banded", "bf16_cells",
                     "interpret"),
)
def blend_tiles_query(
    entry_geom: jnp.ndarray,    # [16, E_pad] fast16 rows, field-major
    tile_start: jnp.ndarray,
    tile_count: jnp.ndarray,
    tile_ids: jnp.ndarray,
    bg: jnp.ndarray,
    phi: jnp.ndarray,           # [L, K, PQ] codebook·phrase fold
    gram: jnp.ndarray,          # [L, K, K] codebook Gram matrices
    *,
    grid_x: int,
    grid_y: int,
    out_channels: int,          # L*K
    topk: int = 12,
    chunk: int = 256,
    tile_batch: int = 8,
    banded: bool = True,
    bf16_cells: bool = False,
    interpret: bool = False,
):
    """fast16 quick blend with the Gram relevancy query FUSED as a kernel
    epilogue: returns (rgb [T,P,3], raw [T,P,L*PQ], nrm2 [T,P,L],
    final_T [T,P]) where raw[t,p, l*PQ+q] = sum_k wm[l,k]·phi[l,k,q] and
    nrm2[t,p,l] = wm[l]·gram[l]·wm[l] — everything a relevancy heatmap
    needs (eval_lerf.py:210-220 formulation), without ever writing the
    [T, P, L*K] weight-map tiles to HBM."""
    L, K, PQ = phi.shape
    assert out_channels == L * K
    # Block-diagonal lifts so the per-level einsums become single matmuls
    # against the flat [P, L*K] accumulator rows.
    phi_mat = jnp.zeros((L * K, L * PQ), jnp.float32)
    gram_mat = jnp.zeros((L * K, L * K), jnp.float32)
    band = jnp.zeros((L * K, L), jnp.float32)
    for lvl in range(L):
        phi_mat = phi_mat.at[lvl * K:(lvl + 1) * K,
                             lvl * PQ:(lvl + 1) * PQ].set(phi[lvl])
        gram_mat = gram_mat.at[lvl * K:(lvl + 1) * K,
                               lvl * K:(lvl + 1) * K].set(gram[lvl])
        band = band.at[lvl * K:(lvl + 1) * K, lvl].set(1.0)
    dummy_feat = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)
    rgb, (raw, nrm2), final_t = _blend_call(
        entry_geom, dummy_feat, tile_start, tile_count, tile_ids, bg,
        phi_mat, gram_mat, band, grid_x=grid_x, grid_y=grid_y, mode="quick",
        out_channels=out_channels, topk=topk, chunk=chunk,
        tile_batch=tile_batch, combined=False, rowfmt="fast16",
        banded=banded, bf16_cells=bf16_cells, interpret=interpret)
    return rgb, raw, nrm2, final_t


def _blend_call(
    entry_geom, entry_feat, tile_start, tile_count, tile_ids, bg,
    query_phi, query_gram, query_band, *,
    grid_x, grid_y, mode, out_channels, topk, chunk, tile_batch,
    combined, rowfmt, banded, bf16_cells, interpret, feat_bf16=False,
):
    assert not (combined and mode == "dense"), \
        "combined rows carry only 16 feature rows"
    fast = rowfmt == "fast16"
    assert not fast or mode == "quick", "fast16 is a quick-mode format"
    query = query_phi is not None
    assert not query or fast, "the fused query rides the fast16 quick path"
    if banded:
        assert out_channels % LEVEL_BAND == 0
        assert topk % (out_channels // LEVEL_BAND) == 0
    n_local = tile_start.shape[0]
    num_tiles = grid_x * grid_y
    if mode == "rgb":
        acc_width = GEOM_W
    elif fast:
        acc_width = F16_FEAT_COL + out_channels
    else:
        acc_width = FEAT_COL + max(out_channels, 1)
    if query:
        n_raw = query_phi.shape[1]
        n_lvl = query_band.shape[1]
        out_width = F16_FEAT_COL + n_raw + n_lvl
    else:
        out_width = acc_width
    out_dt = jnp.bfloat16 if (feat_bf16 and fast and not query) \
        else jnp.float32
    geom_w = entry_geom.shape[0]
    feat_w = entry_feat.shape[0]

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
        acc_width=acc_width, out_width=out_width, topk=topk,
        tile_batch=tile_batch, combined=combined, rowfmt=rowfmt,
        banded=banded, query=query, cellbf16=bf16_cells and fast,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    inputs = [entry_geom, entry_feat]
    if query:
        for arr in (query_phi, query_gram, query_band):
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM))
            inputs.append(arr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_batch, P, out_width), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_batch, P, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, geom_w, chunk), jnp.float32),
            pltpu.VMEM((4, feat_w, chunk), jnp.float32),
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
            jax.ShapeDtypeStruct((n_pad, P, out_width), out_dt),
            jax.ShapeDtypeStruct((n_pad, P, 1), jnp.float32),
        ],
        interpret=interpret,
    )(tile_start, tile_count, tile_ids, *inputs)

    acc_t = acc_t[:n_local]
    t_t = t_t[:n_local]
    final_t = t_t[:, :, 0]                                   # [T, P]
    rgb_col = F16_RGB_COL if fast else RGB_COL
    rgb = (acc_t[:, :, rgb_col:rgb_col + 3].astype(jnp.float32)
           + final_t[..., None] * bg[None, None, :])
    if query:
        n_raw = query_phi.shape[1]
        raw = acc_t[:, :, F16_FEAT_COL:F16_FEAT_COL + n_raw]
        nrm2 = acc_t[:, :, F16_FEAT_COL + n_raw:]
        feat = (raw, nrm2)
    elif mode == "rgb":
        feat = None
    elif fast:
        feat = acc_t[:, :, F16_FEAT_COL:F16_FEAT_COL + out_channels]
    else:
        feat = acc_t[:, :, FEAT_COL:FEAT_COL + out_channels]
    return rgb, feat, final_t


def pack_gaussian_rows(xy, conic, opacities, colors):
    """Per-gaussian packed geometry rows [N, GEOM_W] (pre-gather layout)."""
    n = xy.shape[0]
    rgb = colors if colors is not None else jnp.zeros((n, 3), xy.dtype)
    return jnp.concatenate(
        [xy, conic, opacities[:, None], rgb,
         jnp.zeros((n, GEOM_W - 9), xy.dtype)], axis=1)


def pack_quick_rows(xy, conic, opacities, colors, quick_weights, quick_indices):
    """Per-gaussian packed quick state as TWO 16-wide row sets (exact f32
    parity layout; one w32 gather is ~30% slower than two fused w16 gathers
    on v5e):

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


def pack_quick_train_rows(xy, conic, opacities, colors, quick_weights,
                          quick_indices):
    """Per-gaussian packed quick state as ONE 16-wide f32 row (training
    layout, topk <= 4 — the per-level feature phase): x y conic(3) op
    rgb(3) idx-pairs(topk/2) weights(topk) pad. Exact f32 (unlike fast16),
    so training numerics are identical to the two-row layout while the
    dominant per-entry gather halves (row count x width 16 instead of
    2 x 16; XLA row gathers are row-count-bound)."""
    n, s = quick_weights.shape
    assert s % 2 == 0 and 9 + s // 2 + s <= GEOM_W, \
        "f32pack fits topk <= 4 only"
    rgb = colors if colors is not None else jnp.zeros((n, 3), xy.dtype)
    qi = quick_indices.astype(jnp.float32)
    pairs = qi[:, 0::2] + PAIR_BASE * qi[:, 1::2]      # [N, s//2]
    pad = GEOM_W - 9 - s // 2 - s
    return jnp.concatenate(
        [xy, conic, opacities[:, None], rgb, pairs, quick_weights,
         jnp.zeros((n, pad), xy.dtype)], axis=1)


def _pack2bf16(a, b):
    """Pack two values as bf16 halves of one f32 (bit container): high 16
    bits carry bf16(a), low 16 carry bf16(b). Gather/transpose/pad/select
    are all bit-preserving, so the pattern survives the XLA pack path."""
    au = lax.bitcast_convert_type(
        a.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32)
    bu = lax.bitcast_convert_type(
        b.astype(jnp.bfloat16).astype(jnp.float32), jnp.uint32)
    packed = (au & jnp.uint32(0xFFFF0000)) | (bu >> 16)
    return lax.bitcast_convert_type(packed, jnp.float32)


def pack_fast16_rows(xy, conic, opacities, colors, quick_weights,
                     quick_indices):
    """Per-gaussian packed quick state as ONE 16-wide row (fast16 layout —
    see module doc). XLA row gathers are row-count-bound on TPU, so halving
    the row count halves the dominant binning stage; the bf16 payload halves
    are the fast-mode precision contract (~1e-3)."""
    n, s = quick_weights.shape
    assert s <= 12 and s % 2 == 0
    rgb = colors if colors is not None else jnp.zeros((n, 3), jnp.float32)
    qi = quick_indices.astype(jnp.float32)
    qi = jnp.concatenate([qi, jnp.zeros((n, 12 - s), jnp.float32)], axis=1)
    qw = jnp.concatenate(
        [quick_weights, jnp.zeros((n, 12 - s), jnp.float32)], axis=1)
    # Base-256 index triples: i0 + 256*i1 + 65536*i2 <= 191*65793 < 2^24,
    # exact in f32.
    triples = (qi[:, 0::3] + 256.0 * qi[:, 1::3]
               + 65536.0 * qi[:, 2::3])                       # [N, 4]
    cols = [
        xy[:, 0:1], xy[:, 1:2],
        _pack2bf16(conic[:, 0], conic[:, 1])[:, None],
        _pack2bf16(conic[:, 2], opacities)[:, None],
        _pack2bf16(rgb[:, 0], rgb[:, 1])[:, None],
        _pack2bf16(rgb[:, 2], jnp.zeros((n,), jnp.float32))[:, None],
        triples,
    ]
    for s2 in range(6):
        cols.append(_pack2bf16(qw[:, 2 * s2], qw[:, 2 * s2 + 1])[:, None])
    return jnp.concatenate(cols, axis=1)                      # [N, 16]


def to_field_major(entries: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """[E, W] entry rows -> field-major [W, E_pad] padded so every
    128-aligned [al, + n_chunks*chunk) blend window stays in bounds."""
    e = entries.shape[0]
    target = -(-e // LANE) * LANE + chunk + LANE
    return jnp.pad(entries, ((0, target - e), (0, 0))).T
