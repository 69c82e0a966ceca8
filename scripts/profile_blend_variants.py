#!/usr/bin/env python
"""A/B attribution of the fast16 blend cost at bench scale (4.3M live
entries / 8160 tiles / 192 channels) via on-device lax.scan loops.

Timing-only variants (WRONG OUTPUTS) isolate: the exp/log transcendental
passes, the transmittance scan, the channel expansion, and the accumulate
matmul. Uses synthetic segment data shaped like the bench frame."""
import functools
import math
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from langsplatv2_tpu.ops import pallas_blend

    log("devices:", jax.devices())
    h, w = 1080, 1920
    gx, gy = -(-w // 16), -(-h // 16)
    num_tiles = gx * gy
    E = 4_300_000
    K = 8
    L, CB = 3, 64
    chunk = 256

    rng = np.random.default_rng(0)
    # Synthetic fast16 rows shaped like real ones: xy inside the tile of
    # each segment, plausible conics/opacities.
    e_pad = -(-E // 128) * 128 + chunk + 128
    counts = rng.multinomial(E, np.ones(num_tiles) / num_tiles)
    starts = (np.cumsum(counts) - counts).astype(np.int32)
    tile_of_entry = np.repeat(np.arange(num_tiles), counts)
    tx = (tile_of_entry % gx).astype(np.float32)
    ty = (tile_of_entry // gx).astype(np.float32)
    n = E
    x = tx * 16 + rng.uniform(-4, 20, n).astype(np.float32)
    y = ty * 16 + rng.uniform(-4, 20, n).astype(np.float32)
    conic = np.stack([rng.uniform(0.05, 0.3, n), rng.uniform(-0.02, 0.02, n),
                      rng.uniform(0.05, 0.3, n)], 1).astype(np.float32)
    op = rng.uniform(0.2, 0.95, n).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    qw = rng.uniform(0, 1, (n, 12)).astype(np.float32)
    qi = np.concatenate(
        [rng.integers(0, CB, (n, 4)) + lvl * CB for lvl in range(L)],
        axis=1).astype(np.float32)
    rows = pallas_blend.pack_fast16_rows(
        jnp.asarray(np.stack([x, y], 1)), jnp.asarray(conic),
        jnp.asarray(op), jnp.asarray(col), jnp.asarray(qw), jnp.asarray(qi))
    entry_geom = np.zeros((16, e_pad), np.float32)
    entry_geom[:, :E] = np.asarray(rows).T
    entry_geom = jnp.asarray(entry_geom)
    ts = jnp.asarray(starts)
    tc = jnp.asarray(counts.astype(np.int32))
    tid = jnp.arange(num_tiles, dtype=jnp.int32)
    bg = jnp.zeros(3, jnp.float32)
    eps = jnp.asarray(np.linspace(0, 1e-6, K, dtype=np.float32))

    cb = jnp.asarray(rng.normal(size=(L, CB, 512)).astype(np.float32))
    phr = rng.normal(size=(5, 512)).astype(np.float32)
    phi = jnp.einsum("lkd,pd->lkp", cb, jnp.asarray(phr))
    gram = jnp.einsum("lkd,lmd->lkm", cb, cb)

    def scan_time(name, fn, *args):
        @jax.jit
        def scanned(eps, *args):
            def body(c, e):
                return c + fn(*args, e), 0.0
            c, _ = lax.scan(body, 0.0, eps)
            return c

        t0 = time.time()
        c = scanned(eps, *args)
        _ = float(c)
        ct = time.time() - t0
        t0 = time.time()
        c = scanned(eps, *args)
        _ = float(c)
        dt = (time.time() - t0) / K * 1000
        log(f"{name:34s} compile {ct:5.1f}s  {dt:8.1f} ms")
        return dt

    def run_blend(eg, ts, tc, e, **kw):
        rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas.__wrapped__(
            eg, jnp.zeros((1, eg.shape[1]), jnp.float32),
            ts, tc, tid, bg + e, grid_x=gx, grid_y=gy, mode="quick",
            out_channels=L * CB, topk=12, chunk=kw.get("chunk", chunk),
            tile_batch=kw.get("tile_batch", 8), combined=False,
            rowfmt="fast16", banded=True, interpret=False)
        return jnp.sum(rgb_t[:, 0, 0]) + jnp.sum(feat_t[:, 0, 0])

    def run_query(eg, ts, tc, phi, gram, e, **kw):
        rgb_t, raw, nrm2, t_t = pallas_blend.blend_tiles_query.__wrapped__(
            eg, ts, tc, tid, bg + e, phi, gram, grid_x=gx, grid_y=gy,
            out_channels=L * CB, topk=12, chunk=kw.get("chunk", chunk),
            tile_batch=kw.get("tile_batch", 8), banded=True,
            interpret=False)
        return (jnp.sum(rgb_t[:, 0, 0]) + jnp.sum(raw[:, 0, 0])
                + jnp.sum(nrm2[:, 0, 0]))

    scan_time("fast16 blend (baseline)", run_blend, entry_geom, ts, tc)
    scan_time("fast16 blend+fused query", run_query, entry_geom, ts, tc,
              phi, gram)
    scan_time("tb=16", functools.partial(run_blend, tile_batch=16),
              entry_geom, ts, tc)
    scan_time("chunk=512", functools.partial(run_blend, chunk=512),
              entry_geom, ts, tc)
    scan_time("chunk=128", functools.partial(run_blend, chunk=128),
              entry_geom, ts, tc)

    # Timing-only ablations via env-style monkeypatching of kernel pieces
    # are invasive; instead measure rgb mode (no channel expansion, no
    # 192-wide accumulate) and quick f32 (VPU cumprod scan instead of the
    # log-domain matmul) to bracket the expansion/accumulate cost.
    def run_rgb(eg, ts, tc, e):
        rgb_t, _, t_t = pallas_blend.blend_tiles_pallas.__wrapped__(
            eg, jnp.zeros((1, eg.shape[1]), jnp.float32),
            ts, tc, tid, bg + e, grid_x=gx, grid_y=gy, mode="rgb",
            out_channels=0, topk=12, chunk=chunk, tile_batch=8,
            combined=False, rowfmt="f32", banded=False, interpret=False)
        return jnp.sum(rgb_t[:, 0, 0]) + jnp.sum(t_t[:, 0])

    scan_time("rgb f32 blend (no channels)", run_rgb, entry_geom, ts, tc)


if __name__ == "__main__":
    main()
