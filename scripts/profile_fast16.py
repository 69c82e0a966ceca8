#!/usr/bin/env python
"""Per-stage timing of the fast16 quick frame on the real TPU.

Stages are jitted separately (also exposing per-stage compile cost —
bench.py's monolithic frame compile regressed and this locates it).
"""
import functools
import math
import sys
import time

import numpy as np


def log(*a, **kw):
    print(*a, file=sys.stderr, flush=True, **kw)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from langsplatv2_tpu.ops import projection, pallas_binning, pallas_blend
    from langsplatv2_tpu.ops import rasterize_tiles
    sys.path.insert(0, "scripts")
    from bench_cascade import make_scene

    log("devices:", jax.devices())
    n, h, w = 1_000_000, 1080, 1920
    sc = make_scene(n, h, w, seed=0)
    gx, gy = -(-w // 16), -(-h // 16)
    num_tiles = gx * gy
    budget = 5_300_000
    chunk = 256
    L, K, NPOS, NNEG = 3, 64, 1, 4

    def timeit(name, fn, *args, reps=10, **kw):
        t0 = time.time()
        out = fn(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        log(f"{name:28s} compile {time.time() - t0:6.1f}s", end=" ")
        t0 = time.time()
        o = None
        for _i in range(reps):
            del o
            o = fn(*args, **kw)
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
        log(f"run {(time.time() - t0) / reps * 1000:8.2f} ms")
        return out

    # All device arrays are jit ARGUMENTS: closed-over arrays become inlined
    # constants and blow up the remote compile (the 310s/464s compile bomb).
    @jax.jit
    def prep(means, scales, rots, cols, ops, qw, qi, view, projm):
        proj = projection.preprocess(
            means, scales, rots, None, None, cols,
            view, projm, jnp.zeros(3),
            math.tan(sc["fovx"] / 2), math.tan(sc["fovy"] / 2), w, h, 0, 1.0,
            opacities=ops[:, 0])
        rows = pallas_blend.pack_fast16_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb, qw, qi)
        return proj, rows

    proj, rows = timeit(
        "preprocess+fast16 pack", prep, sc["means"], sc["scales"],
        sc["rots"], sc["cols"], sc["ops"], sc["qw"], sc["qi"], sc["view"],
        sc["proj"])

    expand = jax.jit(functools.partial(
        pallas_binning.expand_entries_pallas.__wrapped__, grid_x=gx,
        grid_y=gy, max_entries=budget, exact_cull=True, max_windows=None,
        interpret=False))
    tile, depth, gauss, total = timeit(
        "pallas expansion (exact cull)", expand, proj,
        opacities=sc["ops"][:, 0])
    log(f"  total entries: {int(total)}")

    @jax.jit
    def sort_stage(tile, depth, gauss):
        hi, lo = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        return pallas_binning.sorted_binning_from_keys(hi, lo, num_tiles)

    g_sorted, tile_start, tile_count, _ = timeit(
        "key pack + sort + ranges", sort_stage, tile, depth, gauss)

    @jax.jit
    def gather_stage(rows, g_sorted):
        return pallas_blend.to_field_major(rows[g_sorted], chunk)

    entry_geom = timeit("fast16 pack gather (w16)", gather_stage, rows,
                        g_sorted)

    dummy = jnp.zeros((1, entry_geom.shape[1]), jnp.float32)
    tid = jnp.arange(num_tiles, dtype=jnp.int32)
    bg = jnp.zeros(3, jnp.float32)
    blend = jax.jit(functools.partial(
        pallas_blend.blend_tiles_pallas, grid_x=gx, grid_y=gy, mode="quick",
        out_channels=L * K, topk=12, chunk=chunk, rowfmt="fast16",
        banded=True))
    rgb_t, feat_t, t_t = timeit(
        "fast16 blend (192ch banded)", blend, entry_geom, dummy,
        tile_start, tile_count, tid, bg)

    # Parity-mode blend for comparison (two-array f32 rows).
    @jax.jit
    def gather2(xy, conic, ops, rgb, qw, qi, g_sorted):
        r, wr = pallas_blend.pack_quick_rows(xy, conic, ops[:, 0], rgb,
                                             qw, qi)
        return (pallas_blend.to_field_major(r[g_sorted], chunk),
                pallas_blend.to_field_major(wr[g_sorted], chunk))

    eg2, ef2 = timeit("f32 pack gather (2x w16)", gather2, proj.xy,
                      proj.conic, sc["ops"], proj.rgb, sc["qw"], sc["qi"],
                      g_sorted)
    blend2 = jax.jit(functools.partial(
        pallas_blend.blend_tiles_pallas, grid_x=gx, grid_y=gy, mode="quick",
        out_channels=L * K, topk=12, chunk=chunk))
    timeit("f32 blend (192ch)", blend2, eg2, ef2, tile_start, tile_count,
           tid, bg)

    # Gram query on tiles.
    rng = np.random.default_rng(1)
    phrases = rng.normal(size=(NPOS + NNEG, 512)).astype(np.float32)
    phrases /= np.linalg.norm(phrases, axis=1, keepdims=True)
    cb = jnp.asarray(rng.normal(size=(L, K, 512)).astype(np.float32))
    phi = jnp.einsum("lkd,pd->lkp", cb, jnp.asarray(phrases))
    gram = jnp.einsum("lkd,lmd->lkm", cb, cb)

    @jax.jit
    def query(tiles, phi, gram):
        t, p, _ = tiles.shape
        wm = tiles.reshape(t * p, L, K).astype(jnp.bfloat16)
        raw = jnp.einsum("qlk,lkp->lqp", wm, phi.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        wg = jnp.einsum("qlk,lkm->lqm", wm, gram.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        nrm2 = jnp.sum(wg * wm.transpose(1, 0, 2), axis=-1)
        sim = raw / (jnp.sqrt(jnp.maximum(nrm2, 0.0))[..., None] + 1e-10)
        pos = sim[..., :NPOS]
        neg = sim[..., NPOS:]
        pair = jnp.stack([
            jnp.broadcast_to(pos[..., None], pos.shape + (NNEG,)),
            jnp.broadcast_to(neg[:, :, None, :], pos.shape + (NNEG,)),
        ], axis=-1)
        relev = jax.nn.softmax(10.0 * pair, axis=-1)[..., 0].min(-1)
        heat = rasterize_tiles.tiles_to_image(
            relev.transpose(1, 0, 2).reshape(t, p, L * NPOS), gx, gy, h, w)
        return heat

    timeit("gram query + heat assembly", query, feat_t, phi, gram)

    @jax.jit
    def rgb_assemble(rgb_t):
        return rasterize_tiles.tiles_to_image(rgb_t, gx, gy, h, w)

    timeit("rgb assembly", rgb_assemble, rgb_t)


if __name__ == "__main__":
    main()
