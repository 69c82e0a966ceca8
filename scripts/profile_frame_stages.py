#!/usr/bin/env python
"""Stage-prefix timing of the BENCH quick frame (1M gaussians, 1080p,
fast16) via on-device lax.scan loops — the only trustworthy method on this
backend. Also runs the round-3 architecture A/B experiments:

- gather vs transpose split (is the "unattributed" time the field-major
  rewrite?)
- live-entry fraction after exact cull (can the gather/blend run on a
  tighter post-cull budget? dead entries sort to the END, so live entries
  are a prefix of the sorted order)
- payload-through-sort: lax.sort carrying 2/4/16 extra payload operands
  (would eliminate the post-sort gather + transpose entirely if sort cost
  scales sub-linearly with operand bytes)
"""
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
    from langsplatv2_tpu.ops import pallas_binning, pallas_blend, projection
    from langsplatv2_tpu.ops import rasterize_tiles

    log("devices:", jax.devices())
    n, h, w = 1_000_000, 1080, 1920
    gx, gy = -(-w // 16), -(-h // 16)
    num_tiles = gx * gy
    budget = 5_300_000
    chunk = 256
    K = 8
    L, CB, NPOS, NNEG = 3, 64, 1, 4
    TOPK = 12

    rng = np.random.default_rng(0)
    means = jnp.asarray(np.concatenate([
        rng.uniform(-4, 4, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))
    ], axis=1).astype(np.float32))
    scales = jnp.asarray(rng.uniform(0.004, 0.04, (n, 3)).astype(np.float32))
    rots = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    ops = jnp.asarray(rng.uniform(0.2, 0.95, (n, 1)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    qw = rng.uniform(0, 1, (n, TOPK)).astype(np.float32)
    qw = jnp.asarray(qw / qw.sum(1, keepdims=True))
    qi = jnp.asarray(np.concatenate(
        [rng.integers(0, CB, (n, 4)) + lvl * CB for lvl in range(L)],
        axis=1).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(L, CB, 512)).astype(np.float32))
    phrases = rng.normal(size=(NPOS + NNEG, 512)).astype(np.float32)
    phrases /= np.linalg.norm(phrases, axis=1, keepdims=True)
    phi = jnp.einsum("lkd,pd->lkp", cb, jnp.asarray(phrases))
    gram = jnp.einsum("lkd,lmd->lkm", cb, cb)

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    projm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    eps = jnp.asarray(np.linspace(0, 1e-6, K, dtype=np.float32))

    scene = (means, scales, rots, ops, cols, qw, qi, phi, gram)

    def pipeline(stage, view_i, means, scales, rots, ops, cols, qw, qi,
                 phi, gram):
        proj = projection.preprocess(
            means, scales, rots, None, None, cols, view_i, projm,
            jnp.zeros(3), math.tan(fovx / 2), math.tan(fovy / 2), w, h,
            0, 1.0, opacities=ops[:, 0])
        if stage == "preprocess":
            return jnp.sum(proj.xy) + jnp.sum(proj.conic)
        rows = pallas_blend.pack_fast16_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb, qw, qi)
        if stage == "pack16":
            return jnp.sum(rows * rows)
        tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
            proj, gx, gy, budget, opacities=ops[:, 0], exact_cull=True)
        if stage == "expand":
            return jnp.sum(tile) + jnp.sum(gauss) * 1.0
        hi, lo = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        if stage == "sort2":
            hs, ls = lax.sort((hi, lo), num_keys=2, is_stable=False)
            return jnp.sum(hs * 1.0) + jnp.sum(ls * 1.0)
        if stage == "sort4":
            hs, ls, p0, p1 = lax.sort((hi, lo, lo, hi), num_keys=2,
                                      is_stable=False)
            return (jnp.sum(hs * 1.0) + jnp.sum(ls * 1.0)
                    + jnp.sum(p0 * 1.0) + jnp.sum(p1 * 1.0))
        if stage == "sort6":
            res = lax.sort((hi, lo, lo, hi, lo, hi), num_keys=2,
                           is_stable=False)
            return sum(jnp.sum(r * 1.0) for r in res)
        if stage == "sort18":
            pay = [jnp.zeros_like(hi)] * 16
            res = lax.sort(tuple([hi, lo] + pay), num_keys=2,
                           is_stable=False)
            return sum(jnp.sum(r * 1.0) for r in res[:4])
        g_sorted, ts, tc, _ = pallas_binning.sorted_binning_from_keys(
            hi, lo, num_tiles)
        if stage == "ranges":
            return jnp.sum(g_sorted) * 1.0 + jnp.sum(tc) * 1.0
        if stage == "nlive":
            return jnp.sum(tc)
        gathered = rows[g_sorted]
        if stage == "gather":
            return jnp.sum(gathered * gathered)
        eg = pallas_blend.to_field_major(gathered, chunk)
        if stage == "fieldmajor":
            return jnp.sum(eg * eg)
        ef = jnp.zeros((1, eg.shape[1]), jnp.float32)
        tid = jnp.arange(num_tiles, dtype=jnp.int32)
        rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
            eg, ef, ts, tc, tid, jnp.zeros(3), grid_x=gx, grid_y=gy,
            mode="quick", out_channels=L * CB, topk=TOPK, chunk=chunk,
            rowfmt="fast16", banded=True)
        if stage == "blend":
            return jnp.sum(rgb_t[:, 0, 0]) + jnp.sum(feat_t[:, 0, 0])
        # gram query + heat assembly (the bench frame's tail)
        t, p, _ = feat_t.shape
        wm = feat_t.reshape(t * p, L, CB).astype(jnp.bfloat16)
        raw = jnp.einsum("qlk,lkp->lqp", wm, phi.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        wg = jnp.einsum("qlk,lkm->lqm", wm, gram.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        nrm2 = jnp.sum(wg * wm.transpose(1, 0, 2), axis=-1)
        sim = raw / (jnp.sqrt(jnp.maximum(nrm2, 0.0))[..., None] + 1e-10)
        pos, neg = sim[..., :NPOS], sim[..., NPOS:]
        pair = jnp.stack([
            jnp.broadcast_to(pos[..., None], pos.shape + (NNEG,)),
            jnp.broadcast_to(neg[:, :, None, :], pos.shape + (NNEG,)),
        ], axis=-1)
        relev = jax.nn.softmax(10.0 * pair, axis=-1)[..., 0].min(-1)
        heat = rasterize_tiles.tiles_to_image(
            relev.transpose(1, 0, 2).reshape(t, p, L * NPOS), gx, gy, h, w)
        return jnp.sum(rgb_t[:, 0, 0]) + heat[0, 0, 0]

    def run(stage):
        @jax.jit
        def scanned(view, eps, *scene):
            def body(c, e):
                return c + pipeline(stage, view.at[3, 0].add(e), *scene), 0.0
            c, _ = lax.scan(body, 0.0, eps)
            return c

        t0 = time.time()
        c = scanned(view, eps, *scene)
        _ = float(c)
        compile_t = time.time() - t0
        t0 = time.time()
        c = scanned(view, eps, *scene)
        _ = float(c)
        dt = (time.time() - t0) / K * 1000
        log(f"prefix {stage:12s} compile {compile_t:5.1f}s  {dt:8.1f} ms")
        return dt

    # Live-entry fraction (single dispatch, exactness diagnostic).
    @jax.jit
    def live_count(view, *scene):
        return (pipeline("nlive", view, *scene),)

    nl = int(live_count(view, *scene)[0])
    log(f"live entries after exact cull: {nl} "
        f"({nl / budget * 100:.1f}% of budget {budget})")

    stages = ["preprocess", "pack16", "expand", "sort2", "sort4", "sort6",
              "sort18", "ranges", "gather", "fieldmajor", "blend", "query"]
    times = {}
    for s in stages:
        times[s] = run(s)

    log("\nstage deltas (pipeline order):")
    order = ["preprocess", "pack16", "expand", "sort2", "ranges", "gather",
             "fieldmajor", "blend", "query"]
    prev = 0.0
    for s in order:
        log(f"  {s:12s} +{times[s] - prev:8.1f} ms  (prefix {times[s]:8.1f})")
        prev = times[s]
    log("\nsort payload scaling: "
        f"2-op {times['sort2'] - times['expand']:.1f} ms, "
        f"4-op {times['sort4'] - times['expand']:.1f} ms, "
        f"6-op {times['sort6'] - times['expand']:.1f} ms, "
        f"18-op {times['sort18'] - times['expand']:.1f} ms")


if __name__ == "__main__":
    main()
