#!/usr/bin/env python
"""A/B timing of expansion-kernel variants at bench scale (1M gaussians,
1080p, 5.3M-entry budget) via on-device lax.scan loops.

Variants: window size, chunk group (per-program amortization), exact cull
on/off, and a DEFAULT-precision selection matmul (WRONG RESULTS — timing
probe only, to attribute the HIGHEST-precision 6-pass cost)."""
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
    from langsplatv2_tpu.ops import pallas_binning, projection

    log("devices:", jax.devices())
    n, h, w = 1_000_000, 1080, 1920
    gx, gy = -(-w // 16), -(-h // 16)
    budget = 5_300_000
    K = 8

    rng = np.random.default_rng(0)
    means = jnp.asarray(np.concatenate([
        rng.uniform(-4, 4, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))
    ], axis=1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004, 0.04, (n, 3)).astype(np.float32))
    rots = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    ops = jnp.asarray(rng.uniform(0.2, 0.95, (n, 1)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    projm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    eps = jnp.asarray(np.linspace(0, 1e-6, K, dtype=np.float32))

    def run(name, *, wbuf=None, group=16, cull=True, chunk=None,
            split=False):
        saved_c = pallas_binning.CHUNK
        if chunk is not None:
            pallas_binning.CHUNK = chunk
        if wbuf is not None:
            saved = pallas_binning.WBUF
            pallas_binning.WBUF = wbuf

        def one(view_i, means, scales, rots, ops, cols):
            proj = projection.preprocess(
                means, scales, rots, None, None, cols, view_i, projm,
                jnp.zeros(3), math.tan(fovx / 2), math.tan(fovy / 2),
                w, h, 0, 1.0, opacities=ops[:, 0])
            # .__wrapped__: the jitted wrapper's trace cache would not see
            # the WBUF monkeypatch (it keys on argument signatures only).
            tile, depth, gauss, total = \
                pallas_binning.expand_entries_pallas.__wrapped__(
                    proj, gx, gy, budget, opacities=ops[:, 0],
                    exact_cull=cull, group=group, max_windows=None,
                    interpret=False, split_pack=split)
            return jnp.sum(tile) + jnp.sum(gauss) * 1.0 + jnp.sum(depth)

        @jax.jit
        def scanned(view, eps, *scene):
            def body(c, e):
                return c + one(view.at[3, 0].add(e), *scene), 0.0
            c, _ = lax.scan(body, 0.0, eps)
            return c

        try:
            t0 = time.time()
            c = scanned(view, eps, means, scales, rots, ops, cols)
            _ = float(c)
            ct = time.time() - t0
            t0 = time.time()
            c = scanned(view, eps, means, scales, rots, ops, cols)
            _ = float(c)
            dt = (time.time() - t0) / K * 1000
            log(f"{name:32s} compile {ct:5.1f}s  {dt:8.1f} ms")
        finally:
            pallas_binning.CHUNK = saved_c
            if wbuf is not None:
                pallas_binning.WBUF = saved

    import os
    if os.environ.get("LSV2_EXPAND_SPLIT"):
        # bf16-split row table vs f32 HIGHEST selection (bit-identical
        # outputs; the A/B is pure speed).
        run("split C512 g16 (default)", split=True)
        run("split C1024 g8", split=True, chunk=1024, group=8)
        run("split C2048 g4", split=True, chunk=2048, group=4)
        run("split C1024 g16", split=True, chunk=1024, group=16)
        run("split C256 g32", split=True, chunk=256, group=32)
    elif os.environ.get("LSV2_EXPAND_V4"):
        run("base (C512 WBUF3072 g16)")
        run("C256 g32", chunk=256, group=32)
        run("C1024 g8", chunk=1024, group=8)
        run("g8", group=8)
        run("g32", group=32)
        run("no exact cull", cull=False)
    else:
        run("base (C512 WBUF3072 g16)")
        run("WBUF2048", wbuf=2048)
        run("WBUF4096", wbuf=4096)
        run("C256 g32", chunk=256, group=32)
        run("no exact cull", cull=False)


if __name__ == "__main__":
    main()
