#!/usr/bin/env python
"""On-TPU validation + stage timing for the cascade binning fast path.

Compares cascade vs sort binning outputs at moderate scale, then times the
full quick frame both ways at bench scale (1M gaussians, 1080p) with
on-device repetition (host-fetch probe; block_until_ready under-reports on
the axon backend)."""
import math
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_scene(n, h, w, seed=0):
    import jax.numpy as jnp
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)

    rng = np.random.default_rng(seed)
    means = np.concatenate([
        rng.uniform(-4, 4, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.004, 0.04, (n, 3)).astype(np.float32)
    rotations = rng.normal(size=(n, 4)).astype(np.float32)
    opacities = rng.uniform(0.2, 0.95, (n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    L, K, TOPK = 3, 64, 4
    qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
    qw /= qw.sum(1, keepdims=True)
    qi = np.concatenate(
        [rng.integers(0, K, (n, TOPK)) + lvl * K for lvl in range(L)], axis=1
    ).astype(np.float32)
    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    proj = jnp.asarray(w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T,
                       jnp.float32)
    return dict(means=jnp.asarray(means), scales=jnp.asarray(scales),
                rots=jnp.asarray(rotations), ops=jnp.asarray(opacities),
                cols=jnp.asarray(colors), qw=jnp.asarray(qw),
                qi=jnp.asarray(qi), view=view, proj=proj,
                fovx=fovx, fovy=fovy)


def main():
    import jax
    import jax.numpy as jnp
    from langsplatv2_tpu.ops.rasterize import RasterizeSettings, rasterize

    log("devices:", jax.devices())

    # --- correctness at moderate scale ------------------------------------
    n, h, w = 200_000, 544, 960
    sc = make_scene(n, h, w, seed=3)
    settings = RasterizeSettings(
        image_height=h, image_width=w, tanfovx=math.tan(sc["fovx"] / 2),
        tanfovy=math.tan(sc["fovy"] / 2), sh_degree=0,
        max_entries=1_500_000, impl="pallas")

    def frame(binning, s=settings, scene=sc):
        out = rasterize(
            s._replace(binning=binning), scene["means"], scene["ops"],
            scene["view"], scene["proj"], jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32), scales=scene["scales"],
            rotations=scene["rots"], colors_precomp=scene["cols"],
            quick_weights=scene["qw"], quick_indices=scene["qi"],
            quick_channels=192)
        return out.rgb, out.feature_map, out.total_entries

    t0 = time.time()
    rs, fs, ts = jax.jit(lambda: frame("sort"))()
    _ = float(rs[0, 0, 0])
    log(f"sort compile+run: {time.time()-t0:.1f}s entries={int(ts)}")
    t0 = time.time()
    rc, fc, tc = jax.jit(lambda: frame("cascade"))()
    _ = float(rc[0, 0, 0])
    log(f"cascade compile+run: {time.time()-t0:.1f}s entries={int(tc)}")
    log("rgb maxdiff:", float(jnp.abs(rc - rs).max()),
        "feat maxdiff:", float(jnp.abs(fc - fs).max()))

    # --- timing at bench scale --------------------------------------------
    n, h, w = 1_000_000, 1080, 1920
    sc = make_scene(n, h, w, seed=0)
    settings = RasterizeSettings(
        image_height=h, image_width=w, tanfovx=math.tan(sc["fovx"] / 2),
        tanfovy=math.tan(sc["fovy"] / 2), sh_degree=0,
        max_entries=5_300_000, impl="pallas")

    for binning in ["cascade", "sort"]:
        f = jax.jit(lambda b=binning: frame(b, settings, sc))
        t0 = time.time()
        out = f()
        _ = float(out[0][0, 0, 0])
        log(f"{binning}: compile+first {time.time()-t0:.1f}s "
            f"entries={int(out[2])}")
        reps = 10
        t0 = time.time()
        o = None
        for _i in range(reps):
            del o
            o = f()
        for x in o:
            _ = float(jnp.asarray(x).ravel()[0])
        dt = (time.time() - t0) / reps
        log(f"{binning}: {dt*1000:.1f} ms/frame = {1/dt:.2f} FPS")


if __name__ == "__main__":
    main()
