"""Multi-device scaling benchmark: rays/s vs device count.

North-star target (BASELINE.md): >= 80% rays/s scaling efficiency at 2+
hosts, measured at 1 chip / 1 host / N hosts. Single-chip hardware is what
this environment exposes, so by default this harness runs the tile-sharded
renderer on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_
count=N) to validate the sharded program and measure *relative* scaling of
the identical pjit/shard_map program; on a real slice it runs unmodified
over ICI (JAX_PLATFORMS unset, no flags).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py
Prints one JSON line per device count plus a summary efficiency line.
"""
import json
import math
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax

    # jax may be pre-imported by sitecustomize (axon TPU plugin), in which
    # case the JAX_PLATFORMS env var is read too late — apply it here
    # (backend initialization is still lazy at this point).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    from langsplatv2_tpu.ops.rasterize import RasterizeSettings
    from langsplatv2_tpu.parallel import make_device_mesh, rasterize_sharded
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)

    n_dev = len(jax.devices())
    on_cpu = jax.devices()[0].platform == "cpu"
    # CPU-mesh validation runs small; a real slice runs LERF-scale.
    if on_cpu:
        N, H, W, ME = 20_000, 256, 512, 2 ** 17
    else:
        N, H, W, ME = 1_000_000, 1080, 1920, 2 ** 23
    L, K, TOPK = 3, 64, 4

    rng = np.random.default_rng(0)
    means = np.concatenate([
        rng.uniform(-4, 4, (N, 2)), rng.uniform(2.0, 12.0, (N, 1))
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.004, 0.08, (N, 3)).astype(np.float32)
    rotations = rng.normal(size=(N, 4)).astype(np.float32)
    opacities = rng.uniform(0.2, 0.95, (N, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    feats = rng.uniform(0, 1, (N, K)).astype(np.float32)

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * W / H)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    proj = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    campos = jnp.zeros(3, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    settings = RasterizeSettings(
        image_height=H, image_width=W,
        tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2),
        sh_degree=0, max_entries=ME, tile_cap=1024, tile_batch=8,
        impl="xla")

    args = tuple(map(jnp.asarray, (means, opacities, scales, rotations,
                                   colors, feats)))

    if on_cpu:
        log("NOTE: virtual CPU mesh shares one physical core - these numbers "
            "validate the sharded program, not scaling; run on a real slice "
            "for efficiency measurements.")
    # Duplicated-work isolation (round-4 VERDICT #5b): in the tile-sharded
    # program, preprocess + binning run REPLICATED on every shard (P()
    # in_specs) — a per-shard constant that does not shrink with c (the
    # Amdahl term), while the blend is the part that actually divides.
    # Measure the replicated prefix alone so the artifact separates
    # "duplicated work" from CPU-mesh oversubscription.
    from langsplatv2_tpu.ops import binning as binning_mod
    from langsplatv2_tpu.ops import projection as projection_mod

    @jax.jit
    def prebin_only(means, op, sc, rot, col):
        prj = projection_mod.preprocess(
            means, sc, rot, None, None, col, view, proj, campos,
            settings.tanfovx, settings.tanfovy, W, H, 0, 1.0)
        b = binning_mod.bin_gaussians(prj, settings.grid_x, settings.grid_y,
                                      settings.max_entries)
        return jnp.sum(b.gauss_id) + jnp.sum(prj.xy)

    _ = float(prebin_only(*args[:5]))
    n_frames0 = 3 if on_cpu else 10
    t0 = time.time()
    for _ in range(n_frames0):
        r = prebin_only(*args[:5])
    _ = float(r)
    prebin_ms = (time.time() - t0) / n_frames0 * 1e3
    print(json.dumps({
        "metric": "sharded_replicated_prefix_ms",
        "value": round(prebin_ms, 2),
        "note": ("preprocess+binning replicated per tile shard (P() "
                 "in_specs) — the constant per-shard term; on real chips "
                 "it runs concurrently per chip and bounds speedup, on "
                 "this oversubscribed CPU mesh it also multiplies total "
                 "work by c"),
    }))

    results = {}
    num_tiles_total = settings.grid_x * settings.grid_y
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev]
    for c in counts:
        mesh = make_device_mesh(n_data=1, n_tile=c,
                                devices=jax.devices()[:c])

        @jax.jit
        def frame(means, op, sc, rot, col, f):
            rgb, fmap, radii, final_t = rasterize_sharded(
                mesh, settings, means, op, view, proj, campos, bg,
                scales=sc, rotations=rot, colors_precomp=col, features=f)
            return rgb, fmap

        out = frame(*args)
        _ = float(jnp.asarray(out[0][0, 0, 0]))  # compile + settle
        n_frames = 3 if on_cpu else 10
        t0 = time.time()
        for _ in range(n_frames):
            out = frame(*args)
        _ = float(jnp.asarray(out[0][0, 0, 0]))
        dt = (time.time() - t0) / n_frames
        rays_s = H * W / dt
        results[c] = rays_s
        per = -(-num_tiles_total // c)
        pad_frac = (per * c - num_tiles_total) / num_tiles_total
        print(json.dumps({
            "metric": "sharded_render_rays_per_s",
            "devices": c,
            "value": round(rays_s / 1e6, 3),
            "unit": "Mrays/s",
            "frame_ms": round(dt * 1e3, 2),
            # Enumerated overhead terms (VERDICT #5b):
            "replicated_prefix_ms": round(prebin_ms, 2),
            "replicated_prefix_frac": round(prebin_ms / (dt * 1e3), 4),
            "padding_tile_frac": round(pad_frac, 4),
        }))

    if len(results) > 1:
        base = results[counts[0]]
        best = max(counts)
        eff = results[best] / (base * best / counts[0])
        print(json.dumps({
            "metric": "scaling_efficiency",
            "devices": best,
            "value": round(eff, 4),
            "unit": "fraction_of_linear",
        }))

    # Gaussian-sharded mode (binning all-to-all, parallel/gauss_sharded.py):
    # Mip-NeRF360-scale scenes where Gaussians cannot be replicated.
    from jax.sharding import Mesh
    from langsplatv2_tpu.parallel import rasterize_gauss_sharded

    from jax import lax
    from jax.sharding import PartitionSpec as P
    from langsplatv2_tpu.parallel.sharding import shard_map

    for c in [c for c in counts if c > 1 and N % c == 0]:
        mesh = Mesh(np.asarray(jax.devices()[:c]), ("gauss",))
        cap = -(-ME // (c * max(c // 2, 1)) // 128) * 128

        @jax.jit
        def gframe(means, op, sc, rot, col):
            rgb, fmap, final_t, total, dropped, _radii = rasterize_gauss_sharded(
                mesh, settings, means, op, view, proj, campos, bg,
                scales=sc, rotations=rot, colors_precomp=col,
                pair_capacity=cap)
            return rgb, dropped

        out = gframe(*args[:5])
        _ = float(jnp.asarray(out[0][0, 0, 0]))
        n_frames = 3 if on_cpu else 10
        t0 = time.time()
        for _ in range(n_frames):
            out = gframe(*args[:5])
        _ = float(jnp.asarray(out[0][0, 0, 0]))
        dt = (time.time() - t0) / n_frames

        # Collective/compute split: time the binning exchange's
        # lax.all_to_all ALONE at the exact payload the frame ships
        # ([C, cap, 18] f32 per shard: 16 row fields + 2 key words) —
        # collective_fraction = a2a time / whole-frame time. On a real
        # slice this rides ICI; on the virtual CPU mesh it is a memcpy
        # and only validates the program + payload sizing.
        wp = 18
        a2a = shard_map(
            lambda b: lax.all_to_all(b, "gauss", split_axis=0,
                                     concat_axis=0),
            mesh=mesh, in_specs=(P("gauss"),), out_specs=P("gauss"),
            check_rep=False)
        a2a_j = jax.jit(a2a)
        buf = jnp.ones((c * c, cap, wp), jnp.float32)
        r = a2a_j(buf)
        _ = float(jnp.asarray(r).ravel()[0])
        t0 = time.time()
        for _ in range(n_frames):
            r = a2a_j(buf)
        _ = float(jnp.asarray(r).ravel()[0])
        a2a_dt = (time.time() - t0) / n_frames

        print(json.dumps({
            "metric": "gauss_sharded_render_rays_per_s",
            "devices": c,
            "value": round(H * W / dt / 1e6, 3),
            "unit": "Mrays/s",
            "dropped": int(out[1]),
            "frame_ms": round(dt * 1e3, 2),
            "a2a_ms": round(a2a_dt * 1e3, 3),
            "a2a_bytes_per_chip": c * cap * wp * 4,
            "collective_fraction": round(a2a_dt / dt, 4),
        }))


if __name__ == "__main__":
    main()
