#!/usr/bin/env python
"""A/B timing of the post-sort entry row gather at bench scale.

The sorted-binning fast path gathers one packed 16-wide f32 row per live
entry (~4.1M rows at 1M gaussians / 1080p). XLA row gathers on v5e are
row-count-bound (~60-155M rows/s for widths 8-32), but two fused w16
gathers measured ~30% faster than one w32 in round 1 — this probes whether
splitting further (2 x w8) or narrowing the row (bf16-packed u32 x 8) buys
anything at the production width.
"""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    log("devices:", jax.devices())
    n = 1_000_000
    e = 4_100_000
    e -= e % 650  # blocky reshape below needs a multiple
    K = 8

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (e,)).astype(np.int32))
    # tile-sorted-ish index stream: sorted blocks of ~650 with random payload
    idx_blocky = jnp.sort(idx.reshape(-1, 650), axis=0).reshape(-1)

    def timeit(name, fn, rows_arg, idx_arg):
        @jax.jit
        def scanned(rows_arg, idx_arg):
            def body(c, i):
                # perturb the first index so the gather can't be hoisted
                # out of the scan as loop-invariant
                pidx = idx_arg.at[0].set(i % rows_arg.shape[0])
                o = fn(rows_arg, pidx)
                # full-array sums (fused into the gather loop) so no part
                # of any gathered row can be DCE'd away
                s = sum(jnp.sum(x) for x in o) if isinstance(o, tuple) \
                    else jnp.sum(o)
                return c + s.astype(jnp.float32), 0.0
            c, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.int32))
            return c

        t0 = time.time()
        c = scanned(rows_arg, idx_arg)
        _ = float(c)
        ct = time.time() - t0
        t0 = time.time()
        c = scanned(rows_arg, idx_arg)
        _ = float(c)
        dt = (time.time() - t0) / K * 1000
        log(f"{name:28s} compile {ct:5.1f}s  {dt:8.1f} ms")

    def g16(rows, idx):
        return rows[idx]

    def g8x2(rows, idx):
        a = rows[:, :8][idx]
        b = rows[:, 8:][idx]
        return a, b

    def g16x2_half(rows, idx):
        h = idx.shape[0] // 2
        return rows[idx[:h]], rows[idx[h:]]

    def gu32x8(rows_u32p, idx):
        return rows_u32p[idx]

    # bf16-packed: 16 f32 fields -> 8 u32 lanes (two bf16 halves per lane)
    u = lax.bitcast_convert_type(rows, jnp.uint32)
    rows_u32p = (u[:, 0::2] & jnp.uint32(0xFFFF0000)) | (u[:, 1::2] >> 16)

    timeit("w16 random", g16, rows, idx)
    timeit("w16 blocky", g16, rows, idx_blocky)
    timeit("2 x w8 random", g8x2, rows, idx)
    timeit("2 x w16 half-rows", g16x2_half, rows, idx)
    timeit("u32 x 8 bf16-packed", gu32x8, rows_u32p, idx)

    # Budget-capped mode primitives (ops/rasterize._capped_quick_binning):
    # (a) ragged slice-gather of the sorted id stream — 8160 tiles x one
    #     contiguous cap-wide u32 slice via vmapped dynamic_slice. If this
    #     runs at block rate (~MBs, <1ms) the capped layout's overhead is
    #     negligible; if XLA lowers it per-element it's ~1M-element cost.
    # (b) the [T*cap] w16 row gather that replaces the [live] one.
    t_tiles, cap = 8160, 256
    g_sorted = jnp.asarray(rng.integers(0, n, (e,)).astype(np.int32))
    t_starts = jnp.sort(jnp.asarray(
        rng.integers(0, e - cap, (t_tiles,)).astype(np.int32)))

    def slice_gather(g_sorted, starts):
        return jax.vmap(
            lambda st: lax.dynamic_slice(g_sorted, (st,), (cap,)))(starts)

    @jax.jit
    def scanned_slices(g_sorted, starts):
        def body(c, i):
            s = starts.at[0].set(i % (e - cap))
            out = slice_gather(g_sorted, s)
            return c + jnp.sum(out).astype(jnp.float32), 0.0
        c, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.int32))
        return c

    t0 = time.time()
    _ = float(scanned_slices(g_sorted, t_starts))
    ct = time.time() - t0
    t0 = time.time()
    _ = float(scanned_slices(g_sorted, t_starts))
    dt = (time.time() - t0) / K * 1000
    log(f"{'slice-gather 8160 x cap256':28s} compile {ct:5.1f}s  "
        f"{dt:8.1f} ms")

    idx_capped = jnp.asarray(
        rng.integers(0, n, (t_tiles * cap,)).astype(np.int32))
    timeit("w16 capped (T*cap rows)", g16, rows, idx_capped)


if __name__ == "__main__":
    main()
