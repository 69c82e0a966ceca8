"""Pallas TPU entry-expansion kernel for tile binning.

Replaces the XLA searchsorted-based key expansion (ops/binning.py), which is
gather-bound on TPU (~770ms at 6M entries measured on v5e), with a streaming
kernel built on the structure of the expansion: entries are emitted
gaussian-major, so the entries of one output chunk come from a *contiguous*
window of gaussians. Each grid program:

1. DMAs the program's whole gaussian span ONCE (contiguous field-major
   columns — no gather; the buffer base is 128-aligned as Mosaic requires),
   double-buffered across grid programs,
2. per 512-entry chunk, recovers each entry's source gaussian by comparing
   the entry id against 128-column sub-windows of the buffer (a [CHUNK,
   SUBW] ownership matrix); the MXU cost of the selection matmul is
   M*K/128 cycles, so per-entry cost = (columns swept)/128 cycles — small
   chunks with narrow sub-windows sweep ~3.5x fewer columns per entry than
   the old per-chunk [2048 x 512] DMA-windowed formulation (measured
   29.8ms -> ~9ms at 5.3M entries),
3. "gathers" the sub-window columns through the one-hot matrix with ONE MXU
   matmul (selection-by-matmul is exact in f32 for the packed values),
4. unpacks the tile rectangle and emits (tile_id, depth, gauss_id).

The XLA side packs these into a sortable (hi, lo) u32 key pair
(tile(13) | depth-bits[30:12] ; depth-bits[11:0] | gauss(20)): depth > 0.2
so the f32 sign bit is 0 and the bit pattern orders positive depths exactly;
gauss in the low bits reproduces the stable tie-break of the reference's
CUDA radix sort (SURVEY.md §2.3(a) stage 2). One two-operand `lax.sort`
replaces the three-operand two-key sort.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ProjectedGaussians

CHUNK = 512          # entries per chunk: the ownership matmul costs
                     # (owners-per-chunk + <=127 alignment waste)/128 MXU
                     # cycles PER ENTRY, and owners-per-chunk scales with
                     # CHUNK — smaller chunks sweep fewer columns per entry
SUBW = 128           # sub-window columns per sweep step (= one lane tile)
WBUF = 3072          # per-program gaussian span buffer (columns); covers the
                     # typical span of a program's chunks (~1550 live cols at
                     # bench density + dead-gaussian interleave + alignment);
                     # spans beyond it fall back to a per-sub-window DMA
ROW_W = 16           # packed row: x0 y0 rect_w offset gid depth rect_h grid_x
                     #             cx cy conic_a conic_b conic_c opacity pad pad
BLOCK = 16           # pixel tile side (matches ops/projection.BLOCK)
LANE = 128

GAUSS_MASK = (1 << 20) - 1

# bf16-split row table (split_pack=True): every field is carried as
# bf16-EXACT pieces — integers as base-256 digits, floats as Dekker
# triples (8+8+8 mantissa bits = all 24 of f32) — so the ownership
# selection matmul can run as a single DEFAULT-precision bf16 MXU pass
# instead of the 6-pass f32 HIGHEST one. Selection through an exact 0/1
# one-hot with f32 accumulation reproduces each piece bit-exactly, and
# the f32 recombination (digit FMAs / triple sums over non-overlapping
# mantissa ranges) is exact, so the split path is BIT-IDENTICAL to the
# f32 path — including the depth sort keys. Same HBM bytes (32 x bf16 ==
# 16 x f32). Row layout:
#   0 x0 | 1 y0 | 2 rect_w | 3..5 offset digits (65536, 256, 1)
#   6..8 gid digits | 9..11 depth triple | 12 rect_h | 13 grid_x
#   14..16 cx | 17..19 cy | 20..22 conic_a | 23..25 conic_b
#   26..28 conic_c | 29..31 opacity
SPLIT_W = 32


def _digits3(v):
    """Non-negative integer-valued f32 < 2^24 -> three base-256 digit rows
    (each < 65536/256/256 -> bf16-exact)."""
    hi = jnp.floor(v * (1.0 / 65536.0))
    r = v - hi * 65536.0
    mid = jnp.floor(r * (1.0 / 256.0))
    lo = r - mid * 256.0
    return hi, mid, lo


def _bf16_triple(v):
    """f32 -> three bf16-exact f32 addends covering the full 24-bit
    mantissa (Dekker split; exact for normal values)."""
    a = v.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = v - a
    b = r1.astype(jnp.bfloat16).astype(jnp.float32)
    c = r1 - b
    return a, b, c


def _expand_kernel(g_start_ref, rows_hbm, tile_out, depth_out, gauss_out,
                   *rest, n_gauss_cols: int, max_windows: int, n_progs: int,
                   sentinel_tile: int, exact_cull: bool, with_alpha: int,
                   group: int, inv_cull_alpha: float, split: bool = False):
    n_alpha = with_alpha * with_alpha
    alpha_out = rest[:n_alpha]
    big_buf, big_sem, spill_buf, spill_sem = rest[n_alpha:]
    p = pl.program_id(0)

    def base_for(q):
        gs0 = g_start_ref[jnp.minimum(q * group, (n_progs * group) - 1)]
        al = jnp.clip((gs0 // LANE) * LANE, 0, n_gauss_cols - WBUF)
        return pl.multiple_of(al, LANE)

    def big_dma(slot, q):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(base_for(q), WBUF)], big_buf.at[slot],
            big_sem.at[slot])

    # Double-buffered span DMA across grid programs: program p waits on the
    # copy started by p-1 (or by itself for p=0) and immediately starts
    # p+1's, so the next program's HBM traffic overlaps this one's compute.
    @pl.when(p == 0)
    def _():
        big_dma(0, 0).start()

    big_dma(p % 2, p).wait()

    @pl.when(p + 1 < n_progs)
    def _():
        big_dma((p + 1) % 2, p + 1).start()

    base = base_for(p)

    def body(g, _):
        _expand_one_chunk(
            p * group + g, g, g_start_ref, rows_hbm, tile_out, depth_out,
            gauss_out, alpha_out, big_buf.at[p % 2], base, spill_buf,
            spill_sem, n_gauss_cols=n_gauss_cols, max_windows=max_windows,
            sentinel_tile=sentinel_tile, exact_cull=exact_cull,
            subdiv=with_alpha, inv_cull_alpha=inv_cull_alpha, split=split)
        return 0

    lax.fori_loop(0, group, body, 0)


def _expand_one_chunk(c, g, g_start_ref, rows_hbm, tile_out, depth_out,
                      gauss_out, alpha_out, big, base, spill_buf, spill_sem,
                      *, n_gauss_cols: int, max_windows: int,
                      sentinel_tile: int, exact_cull: bool, subdiv: int = 0,
                      inv_cull_alpha: float = 255.0, split: bool = False):
    e0 = c * CHUNK
    gs = g_start_ref[c]
    gsf = (gs // LANE) * LANE              # 128-aligned sweep origin (>= base)

    # Entry ids of this chunk on sublanes: [CHUNK, 1].
    e_ids = (lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + e0).astype(jnp.float32)

    def loop_body(state):
        w, rows_acc, _ = state
        col0 = gsf + w * SUBW              # absolute first column, unclamped
        rel = col0 - base
        in_buf = rel + SUBW <= WBUF
        # Rare fallback: the program's span outran the buffer (heavy
        # dead-gaussian interleave) — fetch this sub-window synchronously.
        @pl.when(jnp.logical_not(in_buf))
        def _():
            start = pl.multiple_of(
                jnp.minimum(col0, n_gauss_cols - SUBW), LANE)
            cp = pltpu.make_async_copy(
                rows_hbm.at[:, pl.ds(start, SUBW)], spill_buf, spill_sem)
            cp.start()
            cp.wait()
        rel_c = pl.multiple_of(jnp.minimum(rel, WBUF - SUBW), LANE)
        win = jnp.where(in_buf, big[:, pl.ds(rel_c, SUBW)],
                        spill_buf[...])    # [ROW_W | SPLIT_W, SUBW]

        if split:
            # Recombine the [1, SUBW] compare rows in f32 (exact: digit
            # values < 2^24); the hot [CHUNK, SUBW] block is unchanged.
            off = (win[3:4, :].astype(jnp.float32) * 65536.0
                   + win[4:5, :].astype(jnp.float32) * 256.0
                   + win[5:6, :].astype(jnp.float32))
            n_tiles = (jnp.maximum(win[2:3, :].astype(jnp.float32), 0.0)
                       * jnp.maximum(win[12:13, :].astype(jnp.float32), 0.0))
        else:
            off = win[3:4, :]              # [1, SUBW] entry offsets
            n_tiles = jnp.maximum(win[2:3, :], 0.0) * \
                jnp.maximum(win[6:7, :], 0.0)
        cnt_end = off + n_tiles
        # Ownership: entry e belongs to window column j iff
        # off_j <= e < off_j + tiles_j. Columns the end-clamped fallback
        # window re-reads must not double count; folding that mask into
        # `off` on the [1, SUBW] row keeps the hot [CHUNK, SUBW] block at
        # two compares + one AND.
        col_idx = lax.broadcasted_iota(jnp.int32, (1, SUBW), 1) + \
            jnp.where(in_buf, col0, jnp.minimum(col0, n_gauss_cols - SUBW))
        fresh = col_idx >= col0
        off_m = jnp.where(fresh, off, 3.0e38)
        sel = (off_m <= e_ids) & (e_ids < cnt_end)
        if split:
            # The split table's pieces are individually bf16-exact and the
            # selector is an exact 0/1 one-hot, so a single DEFAULT bf16
            # MXU pass (f32 accumulate) reproduces every piece bit-exactly
            # — 1 pass instead of HIGHEST's 6.
            rows_acc = rows_acc + lax.dot_general(
                sel.astype(jnp.bfloat16), win, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [CHUNK, SPLIT_W]
        else:
            # HIGHEST precision: the default TPU bf16 matmul (8-bit
            # mantissa) corrupts exact integer payloads like entry offsets
            # and gauss ids. (Precision.HIGH / bf16x3 would be exact for
            # ints < 2^24 and half the passes, but Mosaic only lowers
            # DEFAULT and HIGHEST in-kernel.)
            rows_acc = rows_acc + lax.dot_general(
                sel.astype(jnp.float32), win, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)   # [CHUNK, ROW_W]

        # Covered once some window column's offset passes the chunk end
        # (offsets are nondecreasing; pad columns carry a huge offset).
        covered = jnp.max(off) > (e0 + CHUNK - 1)
        return w + 1, rows_acc, covered

    def loop_cond(state):
        w, _, covered = state
        return (w < max_windows) & jnp.logical_not(covered)

    w_exit, rows, _ = lax.while_loop(
        loop_cond, loop_body,
        (0, jnp.zeros((CHUNK, SPLIT_W if split else ROW_W), jnp.float32),
         jnp.asarray(False)))
    del w_exit                             # spill DMAs are synchronous

    # Field lanes: transpose the selected rows once, then unpack.
    rows_t = jnp.transpose(rows, (1, 0))           # [ROW_W, CHUNK]
    if split:
        def _row(i):
            return rows_t[i:i + 1, :]

        def _undig(i):
            return _row(i) * 65536.0 + _row(i + 1) * 256.0 + _row(i + 2)

        def _untrip(i):
            return _row(i) + _row(i + 1) + _row(i + 2)

        x0, y0 = _row(0), _row(1)
        rect_w = jnp.maximum(_row(2), 1.0)
        off = _undig(3)
        gid = _undig(6)
        depth = _untrip(9)
        grid_x_f = _row(13)
        owned = _row(2) * _row(12) > 0.0
    else:
        x0 = rows_t[0:1, :]
        y0 = rows_t[1:2, :]
        rect_w = jnp.maximum(rows_t[2:3, :], 1.0)
        off = rows_t[3:4, :]
        gid = rows_t[4:5, :]
        depth = rows_t[5:6, :]
        grid_x_f = rows_t[7:8, :]
        owned = rows_t[2:3, :] * rows_t[6:7, :] > 0.0

    e_lane = (lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + e0).astype(jnp.float32)
    slot = e_lane - off
    ty_rel = jnp.floor(slot / rect_w)
    tx_rel = slot - ty_rel * rect_w
    tile_x = x0 + tx_rel
    tile_y = y0 + ty_rel
    tile = tile_y * grid_x_f + tile_x

    if exact_cull:
        # Exact conic-vs-tile test: cull (gaussian, tile) entries whose
        # maximum alpha inside the tile's pixel box is below 1/255 — such
        # entries can never pass the blend's alpha >= ALPHA_MIN mask, so
        # dropping them is output-preserving (the CUDA/XLA rect binning
        # over-counts by the square-vs-ellipse ratio). The max of
        # alpha = op*exp(-q/2) over the box is at the box point minimizing
        # the quadratic q; q is centered at the splat mean, so the minimum
        # is either the interior (q=0) or on one of the four edges, where
        # the 1D minimizer has a closed form.
        if split:
            cx = _untrip(14)
            cy = _untrip(17)
            ca = jnp.maximum(_untrip(20), 1e-12)
            cb = _untrip(23)
            cc = jnp.maximum(_untrip(26), 1e-12)
            op = _untrip(29)
        else:
            cx = rows_t[8:9, :]
            cy = rows_t[9:10, :]
            ca = jnp.maximum(rows_t[10:11, :], 1e-12)
            cb = rows_t[11:12, :]
            cc = jnp.maximum(rows_t[12:13, :], 1e-12)
            op = rows_t[13:14, :]

        def box_qmin(lx, hx, ly, hy):
            """Min of q = ca u² + 2 cb u v + cc v² over [lx,hx]×[ly,hy]
            (mean-relative px): interior (q=0) or a box edge, where the 1D
            minimizer has a closed form."""
            def q(u, v):
                return ca * u * u + 2.0 * cb * u * v + cc * v * v

            def edge_u(ufix):                        # minimize over v
                v = jnp.clip(-cb * ufix / cc, ly, hy)
                return q(ufix, v)

            def edge_v(vfix):                        # minimize over u
                u = jnp.clip(-cb * vfix / ca, lx, hx)
                return q(u, vfix)

            inside = (lx <= 0.0) & (0.0 <= hx) & (ly <= 0.0) & (0.0 <= hy)
            q_min = jnp.minimum(
                jnp.minimum(edge_u(lx), edge_u(hx)),
                jnp.minimum(edge_v(ly), edge_v(hy)))
            return jnp.where(inside, 0.0, q_min)

        lx = tile_x * float(BLOCK) - cx              # box in mean-relative px
        ly = tile_y * float(BLOCK) - cy
        q_min = box_qmin(lx, lx + float(BLOCK - 1), ly, ly + float(BLOCK - 1))
        # alpha_max = op * exp(-q_min/2) >= cull_alpha (1/255 = the
        # output-preserving blend-mask bound; larger = the opt-in capped-
        # mode approximation), with a conservative epsilon so float
        # rounding never culls a borderline survivor.
        thresh = 2.0 * jnp.log(
            jnp.maximum(op, 1e-12) * inv_cull_alpha) + 1e-4
        owned = owned & (q_min <= thresh)

    tile_out[g] = jnp.where(owned, tile, float(sentinel_tile)).astype(jnp.int32)
    depth_out[g] = jnp.where(owned, depth, 0.0)
    gauss_out[g] = jnp.where(owned, gid, 0.0).astype(jnp.int32)
    if subdiv:
        # Per-entry transmittance-bound factors for the budget-capped
        # binning mode: for each of the subdiv×subdiv sub-boxes of the
        # tile, lm = log1p(-alpha_max) with alpha_max the entry's maximum
        # possible alpha anywhere in that SUB-box (clamped to the blend's
        # ALPHA_MAX=0.99 so the bound matches what the blend can multiply
        # in). Finer sub-boxes tighten the bound dramatically: a splat
        # clipping one tile corner charges only that corner's prefix, not
        # the whole tile's (measured: subdiv 1 -> 2 cuts the budget-cull's
        # output error ~100x).
        assert exact_cull, "with_alpha rides the exact-cull fields"
        side = BLOCK // subdiv
        op_c = jnp.minimum(op, 1.0)
        for i, ref in enumerate(alpha_out):
            sy, sx = divmod(i, subdiv)
            blx = lx + float(sx * side)
            bly = ly + float(sy * side)
            qm = box_qmin(blx, blx + float(side - 1),
                          bly, bly + float(side - 1))
            am = jnp.minimum(
                op_c * jnp.exp(-0.5 * jnp.maximum(qm, 0.0)), 0.99)
            ref[g] = jnp.where(owned, jnp.log1p(-am), 0.0)


@functools.partial(jax.jit, static_argnames=(
    "grid_x", "grid_y", "max_entries", "max_windows", "exact_cull",
    "with_alpha", "group", "interpret", "cull_alpha", "split_pack"))
def expand_entries_pallas(
    proj: ProjectedGaussians,
    grid_x: int,
    grid_y: int,
    max_entries: int,
    *,
    opacities=None,           # [N] activated; required when exact_cull
    max_windows: int | None = None,
    exact_cull: bool = False,
    with_alpha: int = 0,       # > 0: also emit, per entry, the
                               # transmittance-bound factors
                               # lm = log1p(-alpha_max) over each of the
                               # with_alpha × with_alpha sub-boxes of its
                               # tile (requires exact_cull) — the budget-
                               # capped binning's bound
    group: int = 16,          # chunks per grid program (overhead amortizer)
    interpret: bool = False,
    cull_alpha: float = 1.0 / 255.0,  # exact-cull alpha threshold (> 1/255
                                      # = the capped-mode approximation;
                                      # match the preprocess rect bound)
    split_pack: bool = True,  # bf16-split row table: the ownership
                              # selection matmul runs as ONE DEFAULT bf16
                              # MXU pass instead of 6-pass f32 HIGHEST —
                              # measured 22.9 -> 15.2 ms at 1M/1080p
                              # bench scale, BIT-IDENTICAL outputs (see
                              # SPLIT_W). False = the f32 table (parity
                              # cross-check).
):
    """Expand gaussians to per-entry (tile_id, depth, gauss_id).

    Returns (tile [max_entries] i32 — sentinel grid_x*grid_y for dead
    entries, depth [max_entries] f32, gauss [max_entries] i32,
    total [] i32[, *lms: with_alpha² arrays [max_entries] f32, sub-box
    row-major]).
    """
    n = proj.tiles_touched.shape[0]
    assert n <= GAUSS_MASK + 1, "gauss id must fit in 20 bits"
    # (Tile-grid size is unbounded here: pack_sort_keys switches to a
    # 3-word key above 8190 tiles, so >1080p grids sort correctly.)
    tiles = proj.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(tiles) - tiles
    total = jnp.minimum(jnp.sum(tiles), max_entries)

    n_progs = -(-(-(-max_entries // CHUNK)) // group)
    n_chunks = n_progs * group
    chunk_starts = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK
    g_start = jnp.maximum(
        jnp.searchsorted(offsets, chunk_starts, side="right").astype(jnp.int32) - 1,
        0)

    # >= SUBW huge-offset pad columns terminate every sweep, and the span
    # buffer DMA [base, base+WBUF) must stay in bounds for any base.
    n_pad = max(-(-n // LANE) * LANE + SUBW, WBUF)
    if max_windows is None:
        # Full-coverage bound: the window sweep is a dynamic while_loop that
        # exits as soon as the chunk is covered, so a large static bound is
        # free — and a small one silently DROPS entries when a chunk's owning
        # gaussians are interleaved with long culled runs.
        max_windows = -(-n_pad // SUBW)
    rect_w = jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 0)
    rect_h = jnp.maximum(proj.rect_max[:, 1] - proj.rect_min[:, 1], 0)
    if exact_cull:
        assert opacities is not None, "exact_cull needs activated opacities"
    zeros = jnp.zeros((n,), jnp.float32)
    row_w = SPLIT_W if split_pack else ROW_W
    if split_pack:
        cxs = lax.stop_gradient(proj.xy[:, 0]) if exact_cull else zeros
        cys = lax.stop_gradient(proj.xy[:, 1]) if exact_cull else zeros
        cas = lax.stop_gradient(proj.conic[:, 0]) if exact_cull else zeros
        cbs = lax.stop_gradient(proj.conic[:, 1]) if exact_cull else zeros
        ccs = lax.stop_gradient(proj.conic[:, 2]) if exact_cull else zeros
        ops_ = opacities if exact_cull else zeros
        rows = jnp.stack([
            proj.rect_min[:, 0].astype(jnp.float32),
            proj.rect_min[:, 1].astype(jnp.float32),
            jnp.where(tiles > 0, rect_w, 0).astype(jnp.float32),
            *_digits3(offsets.astype(jnp.float32)),
            *_digits3(jnp.arange(n, dtype=jnp.float32)),
            *_bf16_triple(lax.stop_gradient(proj.depth)),
            jnp.where(tiles > 0, rect_h, 0).astype(jnp.float32),
            jnp.full((n,), float(grid_x), jnp.float32),
            *_bf16_triple(cxs),
            *_bf16_triple(cys),
            *_bf16_triple(cas),
            *_bf16_triple(cbs),
            *_bf16_triple(ccs),
            *_bf16_triple(ops_),
        ], axis=0).astype(jnp.bfloat16)            # [SPLIT_W, N]
    else:
        rows = jnp.stack([
            proj.rect_min[:, 0].astype(jnp.float32),
            proj.rect_min[:, 1].astype(jnp.float32),
            jnp.where(tiles > 0, rect_w, 0).astype(jnp.float32),
            offsets.astype(jnp.float32),
            jnp.arange(n, dtype=jnp.float32),
            lax.stop_gradient(proj.depth),
            jnp.where(tiles > 0, rect_h, 0).astype(jnp.float32),
            jnp.full((n,), float(grid_x), jnp.float32),
            lax.stop_gradient(proj.xy[:, 0]) if exact_cull else zeros,
            lax.stop_gradient(proj.xy[:, 1]) if exact_cull else zeros,
            lax.stop_gradient(proj.conic[:, 0]) if exact_cull else zeros,
            lax.stop_gradient(proj.conic[:, 1]) if exact_cull else zeros,
            lax.stop_gradient(proj.conic[:, 2]) if exact_cull else zeros,
            opacities if exact_cull else zeros,
            zeros,
            zeros,
        ], axis=0)                                 # [ROW_W, N] field-major
    pad_cols = jnp.zeros((row_w, n_pad - n), rows.dtype)
    # Padding columns own no entries but terminate the window sweep — also
    # for the group-padding chunks whose entry ids exceed max_entries
    # (hence "huge", not max_entries+1). In split mode the huge value
    # rides the top offset digit (recombines to inf — never owned).
    pad_cols = pad_cols.at[3, :].set(3.0e38)
    rows = jnp.concatenate([rows, pad_cols], axis=1)

    if with_alpha:
        assert exact_cull, "with_alpha requires exact_cull"
        assert BLOCK % with_alpha == 0
    kernel = functools.partial(
        _expand_kernel, n_gauss_cols=n_pad, max_windows=max_windows,
        n_progs=n_progs, sentinel_tile=grid_x * grid_y,
        exact_cull=exact_cull, with_alpha=with_alpha, group=group,
        inv_cull_alpha=1.0 / cull_alpha, split=split_pack)

    n_outs = 3 + with_alpha * with_alpha
    out_dtypes = ([jnp.int32, jnp.float32, jnp.int32]
                  + [jnp.float32] * (with_alpha * with_alpha))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_progs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((group, 1, CHUNK), lambda p, *_: (p, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_outs)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, row_w, WBUF), rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((row_w, SUBW), rows.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, 1, CHUNK), dt)
            for dt in out_dtypes
        ],
        interpret=interpret,
    )(g_start, rows)
    tile, depth, gauss = outs[:3]

    entry_ids = jnp.arange(max_entries, dtype=jnp.int32)
    tile = tile.reshape(-1)[:max_entries]
    tile = jnp.where(entry_ids < total, tile, grid_x * grid_y)
    result = (tile, depth.reshape(-1)[:max_entries],
              gauss.reshape(-1)[:max_entries], total)
    for o in outs[3:]:
        result = result + (jnp.where(
            entry_ids < total, o.reshape(-1)[:max_entries], 0.0),)
    return result


def pack_sort_keys(tile, depth, gauss, num_tiles: int,
                   force_wide: bool = False):
    """Pack (tile, depth, gauss) into a tuple of sortable u32 key words.

    Grids up to 8190 tiles (1080p = 8160) pack into TWO words:
    hi = tile(13) | depth-bits[30:12](19);  lo = depth-bits[11:0](12) << 20
    | gauss(20). Sorting them as a stable two-key sort gives the exact
    (tile, full-precision depth, submission order) order of the reference's
    radix sort with only two u32 operands (u64 would silently truncate
    without the global x64 flag).

    Larger grids (1440p = 14,400 tiles, 4K = 32,400 — the reference's CUDA
    radix sort has no resolution ceiling, backend_renderer.py:161-246)
    return THREE words (tile, depth-bits, gauss): ~30% more sort traffic,
    paid only above 1080p. Consumers must treat the return value as an
    opaque tuple for sorted_binning_from_keys."""
    # Drop the always-zero sign bit (depth > 0 in view space): the kept 31
    # bits reproduce positive-depth f32 ordering exactly, including the LSB.
    depth_bits = lax.bitcast_convert_type(depth, jnp.uint32) & jnp.uint32(0x7FFFFFFF)
    tile_u = tile.astype(jnp.uint32)
    gauss_u = gauss.astype(jnp.uint32)
    dead = tile >= num_tiles
    # force_wide exists so tests can exercise the 3-word (>1080p) path at
    # small resolutions instead of rendering 14k interpret-mode tiles.
    if num_tiles < (1 << 13) - 1 and not force_wide:
        hi = (tile_u << 19) | (depth_bits >> 12)
        lo = ((depth_bits & jnp.uint32(0xFFF)) << 20) | gauss_u
        # Dead entries (sentinel tile) sort to the end regardless of payload.
        hi = jnp.where(dead, jnp.uint32(num_tiles) << 19, hi)
        lo = jnp.where(dead, jnp.uint32(0), lo)
        return hi, lo
    assert num_tiles < (1 << 31), "tile id must fit an i32 sentinel"
    k0 = jnp.where(dead, jnp.uint32(num_tiles), tile_u)
    k1 = jnp.where(dead, jnp.uint32(0), depth_bits)
    k2 = jnp.where(dead, jnp.uint32(0), gauss_u)
    return k0, k1, k2


def _vectorized_searchsorted_left(sorted_vals: jnp.ndarray, queries: jnp.ndarray,
                                  n_bits: int) -> jnp.ndarray:
    """First index i with sorted_vals[i] >= q, for a batch of queries.

    jnp.searchsorted / scatter lower catastrophically on TPU (~9s for 8k
    queries over 5M keys, measured on v5e); this explicit vectorized binary
    search (one small gather per step) runs in ~9ms."""
    n = sorted_vals.shape[0]
    lo = jnp.zeros_like(queries)
    hi = jnp.full_like(queries, n)

    def step(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        v = sorted_vals[jnp.minimum(mid, n - 1)]
        go_right = v < queries
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = lax.fori_loop(0, n_bits, step, (lo, hi))
    return lo


def sorted_binning_from_keys(keys, num_tiles: int, _legacy_num_tiles=None,
                             with_perm: bool = False, extra=()):
    """Sort packed keys (the pack_sort_keys tuple); derive
    (gauss_sorted, tile_start, tile_count, tile_sorted).

    with_perm=True appends the sort permutation (each sorted entry's
    pre-sort = EXPANSION slot) as a 5th output — one extra u32 sort operand
    (~0.6 ms/M entries). The training backwards use it to return per-entry
    gradients to gaussian-major expansion order with a sort instead of a
    scatter (see pallas_train._quick_vjp_bwd).

    `extra` is a tuple of additional u32 payload operands to carry through
    the sort (~3 ms/operand at 5M entries); their sorted versions are
    appended (as a tuple) after the other outputs."""
    if _legacy_num_tiles is not None:        # (hi, lo, num_tiles) call form
        keys, num_tiles = (keys, num_tiles), _legacy_num_tiles
    perm = None
    n_payload = len(extra)
    if len(keys) == 2:
        if with_perm:
            iota = jnp.arange(keys[0].shape[0], dtype=jnp.uint32)
            # Keys are unique for live entries (gauss id rides lo), so
            # the perm-carrying sort stays deterministic without stability.
            hi_sorted, lo_sorted, perm, *extra_sorted = lax.sort(
                (*keys, iota, *extra), num_keys=2, is_stable=False)
        else:
            hi_sorted, lo_sorted, *extra_sorted = lax.sort(
                (*keys, *extra), num_keys=2, is_stable=False)
        gauss_sorted = (lo_sorted & jnp.uint32(GAUSS_MASK)).astype(jnp.int32)
        tile_sorted = (hi_sorted >> 19).astype(jnp.int32)
    else:
        if with_perm:
            iota = jnp.arange(keys[0].shape[0], dtype=jnp.uint32)
            k0, _k1, k2, perm, *extra_sorted = lax.sort(
                (*keys, iota, *extra), num_keys=3, is_stable=False)
        else:
            k0, _k1, k2, *extra_sorted = lax.sort(
                (*keys, *extra), num_keys=3, is_stable=False)
        gauss_sorted = k2.astype(jnp.int32)
        tile_sorted = k0.astype(jnp.int32)
    n_bits = max(1, int(np.ceil(np.log2(tile_sorted.shape[0] + 1))) + 1)
    bounds = _vectorized_searchsorted_left(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), n_bits)
    tile_start = bounds[:num_tiles].astype(jnp.int32)
    tile_count = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
    out = (gauss_sorted, tile_start, tile_count, tile_sorted)
    if with_perm:
        out = out + (perm,)
    if n_payload:
        out = out + (tuple(extra_sorted),)
    return out


# u8 quantization step for the budget-cull's lm payload: lm is clamped to
# [log1p(-0.99), 0] ≈ [-4.7, 0] by the alpha clamp, and rounding toward 0
# only LOOSENS the bound (keeps more entries), preserving soundness w.r.t.
# the unquantized bound.
LM_QSTEP = 4.7 / 255.0


def pack_lm_words(lms):
    """Quantize per-sub-box lm arrays ([E] f32, <= 0) to u8 (rounded toward
    0) and pack 4 per u32 sort-payload word."""
    words = []
    for i in range(0, len(lms), 4):
        wrd = jnp.zeros(lms[0].shape, jnp.uint32)
        for k, lm in enumerate(lms[i:i + 4]):
            n = jnp.minimum(jnp.floor(-lm * (1.0 / LM_QSTEP)), 255.0)
            wrd = wrd | (n.astype(jnp.uint32) << (8 * k))
        words.append(wrd)
    return tuple(words)


def unpack_lm_words(words, n_box: int):
    """Inverse of pack_lm_words: [E] u32 words -> [E, n_box] f32 lm."""
    lms = []
    for i, wrd in enumerate(words):
        for k in range(min(4, n_box - 4 * i)):
            n = ((wrd >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.float32)
            lms.append(-n * LM_QSTEP)
    return jnp.stack(lms, axis=1)


def slice_windows(arr, tile_start, cap: int):
    """[E] sorted array -> [T, cap] dense windows at tile_start.

    Pads so no slice is start-clamped (XLA dynamic_slice clamps starts,
    which would silently shift a tail tile's window off its segment)."""
    a_pad = jnp.pad(arr, (0, cap))
    return jax.vmap(
        lambda st: lax.dynamic_slice(a_pad, (st,), (cap,)))(tile_start)


def budget_from_rows(xy, conic, op, tile_count, grid_x: int, cap: int,
                     subdiv: int, t_budget: float):
    """Per-tile budget counts recomputed from the gathered entry rows.

    The round-4 capped pipeline emitted per-entry transmittance-bound
    factors in the EXPANSION kernel, quantized them to u8, and carried
    them through the key sort as an extra payload operand (+~2.3 ms at
    3.4M entries), then sliced them to the window (+~2 ms). But the dense
    [T, cap] layout already gathers each entry's xy/conic/opacity for the
    blend — the bound is a pure function of those plus the tile box, so
    recomputing it HERE on dense [T*cap] lanes costs ~0.5 ms of regular
    VPU math and the sort drops back to two operands.

    Inputs are per-WINDOW-SLOT arrays ([T*cap]-shaped, entry e of tile
    t = slot t*cap + e): xy [Tcap, 2] f32, conic [Tcap, 3], op [Tcap]
    (bf16-rounded values are fine — the blend computes alpha from the
    same rounded values, so alpha_max bounds what the blend can actually
    multiply in). Returns (kept [T], sat_bound [T]) with the same
    contract as budget_counts_windowed; the budget accumulates in f32
    (<= cap=1024 terms — deterministic, no quanta needed).
    """
    t_total = tile_count.shape[0]
    slot_tile = jnp.arange(t_total * cap, dtype=jnp.int32) // cap
    tx = (slot_tile % grid_x).astype(jnp.float32)
    ty = (slot_tile // grid_x).astype(jnp.float32)
    cx = xy[:, 0]
    cy = xy[:, 1]
    ca = jnp.maximum(conic[:, 0], 1e-12)
    cb = conic[:, 1]
    cc = jnp.maximum(conic[:, 2], 1e-12)

    def box_qmin(lx, hx, ly, hy):
        def q(u, v):
            return ca * u * u + 2.0 * cb * u * v + cc * v * v

        def edge_u(ufix):
            v = jnp.clip(-cb * ufix / cc, ly, hy)
            return q(ufix, v)

        def edge_v(vfix):
            u = jnp.clip(-cb * vfix / ca, lx, hx)
            return q(u, vfix)

        inside = (lx <= 0.0) & (0.0 <= hx) & (ly <= 0.0) & (0.0 <= hy)
        q_min = jnp.minimum(
            jnp.minimum(edge_u(lx), edge_u(hx)),
            jnp.minimum(edge_v(ly), edge_v(hy)))
        return jnp.where(inside, 0.0, q_min)

    side = BLOCK // subdiv
    op_c = jnp.minimum(op, 1.0)
    lms = []
    for i in range(subdiv * subdiv):
        sy, sx = divmod(i, subdiv)
        lx = tx * float(BLOCK) + float(sx * side) - cx
        ly = ty * float(BLOCK) + float(sy * side) - cy
        qm = box_qmin(lx, lx + float(side - 1), ly, ly + float(side - 1))
        am = jnp.minimum(op_c * jnp.exp(-0.5 * jnp.maximum(qm, 0.0)), 0.99)
        lms.append(jnp.log1p(-am))
    lm = jnp.stack(lms, axis=1).reshape(t_total, cap, -1)    # [T, cap, Q]
    incap = jnp.minimum(tile_count, cap)
    slot = jnp.arange(cap, dtype=jnp.int32)
    inwin = slot[None, :] < incap[:, None]
    lm = jnp.where(inwin[..., None], lm, 0.0)
    s_excl = jnp.cumsum(lm, axis=1) - lm                     # exclusive
    logb = jnp.float32(np.log(t_budget))
    ok = jnp.any(s_excl >= logb, axis=-1) & inwin
    kept = jnp.sum(ok, axis=1).astype(jnp.int32)
    sat_bound = jnp.where((kept >= incap) & (tile_count > cap),
                          tile_count, kept)
    return kept, sat_bound


def budget_counts_windowed(words_win, tile_count, cap: int, n_box: int,
                           t_budget: float):
    """Per-tile kept-counts from lm payload windows ALREADY in the dense
    [T, cap] layout (slice_windows of the sorted pack_lm_words operands).

    Same integer-quanta math as `budget_counts` restricted to the cap
    window — bit-identical kept for every tile (the window clamp and the
    budget clamp commute) — but the whole [E] cumsum + per-tile binary
    search (a ~22-step lax.fori_loop of narrow gathers, measured 5.3 ms
    at the 986x728 load) collapses into one tiny dense [T, cap, Q] cumsum.

    Returns (kept [T] int32, sat_bound [T] int32): kept <= min(count, cap)
    is the blend count; sat_bound reports the tile's FULL pre-budget count
    wherever the budget prefix saturated the window (kept == min(count,
    cap) with count > cap) — a conservative upper bound replacing the old
    pre-clamp kept_full telemetry (max > cap still reveals saturation).
    """
    lm = unpack_lm_words(
        tuple(w.reshape(-1) for w in words_win), n_box)      # [T*cap, Q]
    t = words_win[0].shape[0]
    q = jnp.round(lm.reshape(t, cap, n_box) * (-1.0 / LM_QSTEP)
                  ).astype(jnp.int32)
    assert cap * 255 < 2 ** 31
    s_excl = jnp.cumsum(q, axis=1) - q                       # exclusive
    qbudget = jnp.int32(np.floor(-np.log(t_budget) / LM_QSTEP))
    incap = jnp.minimum(tile_count, cap)
    slot = jnp.arange(cap, dtype=jnp.int32)
    ok = (jnp.any(s_excl <= qbudget, axis=-1)
          & (slot[None, :] < incap[:, None]))
    kept = jnp.sum(ok, axis=1).astype(jnp.int32)
    sat_bound = jnp.where((kept >= incap) & (tile_count > cap),
                          tile_count, kept)
    return kept, sat_bound


def budget_counts(lm_sorted, tile_start, tile_count, t_budget: float):
    """Per-tile kept-counts under a transmittance-bound budget.

    lm_sorted [E] or [E, Q] f32: log1p(-alpha_max) per SORTED entry (<= 0;
    alpha_max is the entry's maximum possible alpha anywhere in its tile —
    or in each of Q sub-boxes of it — from the exact cull's box
    minimization). Entry j of tile t (depth order) is kept iff SOME
    sub-box's bound T_q(j) = prod_{m<j} (1 - alpha_max_m,q) >= t_budget.
    Because alpha(pixel) <= alpha_max(sub-box containing pixel), every
    pixel's true transmittance is >= its sub-box bound: the cull only
    drops entries once the bound says every pixel is saturated — an
    APPROXIMATION whose looseness shrinks with the sub-box size (measured:
    Q=4 cuts the output error ~100x vs Q=1), which is why this rides the
    opt-in settings.tile_budget mode, not the default path.

    Returns kept [T] int32, kept <= tile_count. Cost: Q [E] cumsums + a
    per-tile vectorized binary search (~1 ms each at bench scale).
    """
    if lm_sorted.ndim == 1:
        lm_sorted = lm_sorted[:, None]
    e = lm_sorted.shape[0]
    # lm values are exact u8-quantized multiples of LM_QSTEP
    # (pack_lm_words -> unpack_lm_words), so accumulate the integer quanta
    # in int32 — EXACT, deterministic cutoffs. A global f32 running sum
    # reaches 1e5-1e7 at bench scale, where its absolute rounding error
    # (~0.5-4) rivals the |log budget| ~ 14 comparison window and drifts
    # late tiles' cutoffs by a few entries.
    assert e * 255 < 2 ** 31, "int32 quanta cumsum overflows above ~8.4M"
    q = jnp.round(lm_sorted * (-1.0 / LM_QSTEP)).astype(jnp.int32)
    s = jnp.cumsum(q, axis=0)                       # [E, Q] inclusive
    # Keep while sum(lm) >= log(budget)  <=>  sum(quanta) <= qbudget.
    qbudget = jnp.int32(np.floor(-np.log(t_budget) / LM_QSTEP))
    # base = s[start-1] (0 for start == 0): [T, Q]-sized gather, cheap.
    base = jnp.where(
        (tile_start > 0)[:, None], s[jnp.maximum(tile_start - 1, 0)], 0)
    target = base + qbudget
    # Entry j>=1 kept iff any_q s[start+j-1, q] <= target_q; each s[:, q]
    # is non-decreasing on the segment, so the OR is non-increasing and
    # kept = last satisfying index + 1. Binary search per tile, vectorized
    # ([T, Q] gathers per step).
    lo = tile_start
    hi = tile_start + jnp.maximum(tile_count - 1, 0)

    def step(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        v = s[jnp.minimum(mid, e - 1)]
        go_right = jnp.any(v <= target, axis=1)
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(go_right, hi, mid))

    n_bits = max(1, int(np.ceil(np.log2(e + 1))) + 1)
    lo, hi = lax.fori_loop(0, n_bits, step, (lo, hi))
    kept = lo - tile_start + 1
    return jnp.where(tile_count > 0, jnp.minimum(kept, tile_count), 0
                     ).astype(jnp.int32)
