#!/usr/bin/env python
"""Compile-check the bf16_cells fast16 kernel on the real chip.

The round-4 vpu probe measured bf16 cell math 1.54x SLOWER than f32 on
v5e (no 2x lane packing), so the flag ships off — but it must still
COMPILE (the first A/B attempt died on Mosaic's missing bf16 log1p
legalization; pallas_blend now computes log1p in f32). This is a smoke,
not a benchmark.
"""
import math
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from langsplatv2_tpu.ops import projection
    from langsplatv2_tpu.ops.rasterize import RasterizeSettings, rasterize
    from langsplatv2_tpu.utils.camera_math import (get_projection_matrix,
                                                   get_world_to_view)

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    n, h, w = 4096, 128, 256
    rng = np.random.default_rng(0)
    means = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (n, 2)), rng.uniform(1.0, 8.0, (n, 1))], 1),
        jnp.float32)
    scales = jnp.asarray(rng.uniform(0.02, 0.3, (n, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    ops = jnp.asarray(rng.uniform(0.1, 0.95, (n, 1)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    L, K, TOPK = 3, 64, 4
    qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
    qw /= qw.sum(1, keepdims=True)
    qi = np.concatenate(
        [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
    ).astype(np.float32)
    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    pm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)

    sp = RasterizeSettings(
        image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
        tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 15,
        impl="pallas", precision="bf16", bf16_cells=True)
    out = rasterize(sp, means, ops, view, pm, jnp.zeros(3, jnp.float32),
                    jnp.zeros(3, jnp.float32), scales=scales, rotations=rots,
                    colors_precomp=cols, quick_weights=jnp.asarray(qw),
                    quick_indices=jnp.asarray(qi), quick_channels=L * K)
    r = np.asarray(out.rgb)
    f = np.asarray(out.feature_map)
    print("bf16_cells compile OK; rgb finite:", bool(np.isfinite(r).all()),
          "feat finite:", bool(np.isfinite(f).all()), flush=True)


if __name__ == "__main__":
    main()
