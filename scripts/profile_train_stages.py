#!/usr/bin/env python
"""Stage-prefix timing of the feature-phase FORWARD via on-device lax.scan
loops (the only trustworthy method on this backend): each prefix of the
pipeline runs K times inside one jit with a per-iteration view jitter, so
stage cost = difference of consecutive prefixes, all within one process."""
import functools
import math
import sys
import time
import types

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from langsplatv2_tpu.models import gaussians as gm
    from langsplatv2_tpu.ops import (pallas_binning, pallas_blend,
                                     projection)
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)

    log("devices:", jax.devices())
    n, h, w = 300_000, 544, 960
    gx, gy = -(-w // 16), -(-h // 16)
    num_tiles = gx * gy
    budget = 2 ** 21
    chunk = 256
    K = 8

    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-4, 4, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))
    ], axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    model = gm.create_from_pcd(pts, cols, spatial_lr_scale=1.0)
    model = model.replace(
        opacity=jnp.asarray(rng.uniform(-1, 2, (n, 1)).astype(np.float32)),
        scaling=jnp.log(jnp.asarray(
            rng.uniform(0.004, 0.04, (n, 3)).astype(np.float32))))
    model = gm.init_language_features(model, jax.random.PRNGKey(0), 1, 64)

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    projm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    eps = jnp.asarray(np.linspace(0, 1e-6, K, dtype=np.float32))

    def prefix(stage):
        def one(view_i, m):
            out = 0.0
            qw, qi = m.get_weights_and_indices(4)
            if stage == "weights":
                return jnp.sum(qw) + jnp.sum(qi)
            proj = projection.preprocess(
                m.xyz, m.get_scaling(), m.get_rotation(), None,
                m.get_features(), None, view_i, projm, jnp.zeros(3),
                math.tan(fovx / 2), math.tan(fovy / 2), w, h,
                0, 1.0, opacities=m.get_opacity()[:, 0])
            if stage == "preprocess":
                return jnp.sum(proj.xy) + jnp.sum(proj.conic) + out
            tile, depth, gauss, total = \
                pallas_binning.expand_entries_pallas(
                    jax.tree.map(lax.stop_gradient, proj), gx, gy, budget,
                    opacities=m.get_opacity()[:, 0], exact_cull=True)
            if stage == "expand":
                return jnp.sum(tile) + jnp.sum(gauss) * 1.0
            hi, lo = pallas_binning.pack_sort_keys(tile, depth, gauss,
                                                   num_tiles)
            g_sorted, ts, tc, _ = pallas_binning.sorted_binning_from_keys(
                hi, lo, num_tiles)
            if stage == "sort":
                return jnp.sum(g_sorted) * 1.0 + jnp.sum(tc) * 1.0
            rows, wrows = pallas_blend.pack_quick_rows(
                proj.xy, proj.conic, m.get_opacity()[:, 0], proj.rgb,
                qw, qi)
            eg = pallas_blend.to_field_major(
                lax.stop_gradient(rows)[g_sorted], chunk)
            ef = pallas_blend.to_field_major(
                lax.stop_gradient(wrows)[g_sorted], chunk)
            if stage == "gather":
                return jnp.sum(eg[:, ::997]) + jnp.sum(ef[:, ::997])
            tid = jnp.arange(num_tiles, dtype=jnp.int32)
            rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
                eg, ef, ts, tc, tid, jnp.zeros(3), grid_x=gx, grid_y=gy,
                mode="quick", out_channels=64, topk=12, chunk=chunk)
            return jnp.sum(rgb_t[:, 0, 0]) + jnp.sum(feat_t[:, 0, 0])

        @jax.jit
        def scanned(m, eps):
            def body(c, e):
                return c + one(view.at[3, 0].add(e), m), 0.0
            c, _ = lax.scan(body, 0.0, eps)
            return c

        t0 = time.time()
        c = scanned(model, eps)
        _ = float(c)
        compile_t = time.time() - t0
        t0 = time.time()
        c = scanned(model, eps)
        _ = float(c)
        dt = (time.time() - t0) / K * 1000
        log(f"prefix {stage:12s} compile {compile_t:5.1f}s  {dt:7.1f} ms")
        return dt

    stages = ["weights", "preprocess", "expand", "sort", "gather", "blend"]
    times = [prefix(s) for s in stages]
    log("\nstage deltas:")
    prev = 0.0
    for s, t in zip(stages, times):
        log(f"  {s:12s} +{t - prev:7.1f} ms  (prefix {t:7.1f})")
        prev = t


if __name__ == "__main__":
    main()
