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

    def run(name, *, window=None, group=4, cull=True, chunk=None):
        saved_c = pallas_binning.CHUNK
        if chunk is not None:
            pallas_binning.CHUNK = chunk
        if window is not None:
            saved = pallas_binning.WINDOW
            pallas_binning.WINDOW = window

        def one(view_i, means, scales, rots, ops, cols):
            proj = projection.preprocess(
                means, scales, rots, None, None, cols, view_i, projm,
                jnp.zeros(3), math.tan(fovx / 2), math.tan(fovy / 2),
                w, h, 0, 1.0, opacities=ops[:, 0])
            # .__wrapped__: the jitted wrapper's trace cache would not see
            # the WINDOW monkeypatch (it keys on argument signatures only).
            tile, depth, gauss, total = \
                pallas_binning.expand_entries_pallas.__wrapped__(
                    proj, gx, gy, budget, opacities=ops[:, 0],
                    exact_cull=cull, group=group, max_windows=None,
                    interpret=False)
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
            if window is not None:
                pallas_binning.WINDOW = saved

    import os
    if os.environ.get("LSV2_EXPAND_V3"):
        run("base (C2048 W512 g4)")
        run("C1024 W384 g8", chunk=1024, window=384, group=8)
        run("C1024 W256 g8", chunk=1024, window=256, group=8)
        run("C512 W256 g16", chunk=512, window=256, group=16)
        run("C1024 W384 g4", chunk=1024, window=384, group=4)
    elif os.environ.get("LSV2_EXPAND_V2"):
        run("base (C2048 W512 g4)")
        run("C4096 g2", chunk=4096, group=2)
        run("C8192 g1", chunk=8192, group=1)
        run("C4096 g4", chunk=4096, group=4)
        run("C1024 g8", chunk=1024, group=8)
    else:
        run("base (W512 g4 cull)")
        run("W384", window=384)
        run("W256", window=256)
        run("group=8", group=8)
        run("group=2", group=2)
        run("no exact cull", cull=False)


if __name__ == "__main__":
    main()
