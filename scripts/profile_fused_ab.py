#!/usr/bin/env python
"""Fused-vs-unfused Gram query A/B on the CAPPED 986x728 serving frame.

Round 4 measured unfused as the winner on the round-4 structure; the
round-5 rows-based capped pipeline changed the blend's input layout and
the unfused tail's matmul shape (block-diagonal), so re-decide with a
same-window A/B. Env: LSV2_MAX_ENTRIES, LSV2_BUDGET/CAP/SUBDIV,
LSV2_CULL_ALPHA (as profile_capped_stages).
"""
import math
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from langsplatv2_tpu.ops.rasterize import (RasterizeSettings, rasterize,
                                               rasterize_quick_query)
    from langsplatv2_tpu.ops import rasterize_tiles
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)

    log("devices:", jax.devices())
    n = int(os.environ.get("LSV2_PROF_N", 1_000_000))
    h = int(os.environ.get("LSV2_PROF_H", 728))
    w = int(os.environ.get("LSV2_PROF_W", 986))
    budget_t = float(os.environ.get("LSV2_BUDGET", 1e-6))
    cap = int(os.environ.get("LSV2_CAP", 128))
    subdiv = int(os.environ.get("LSV2_SUBDIV", 2))
    cull_alpha = float(os.environ.get("LSV2_CULL_ALPHA", 1.0 / 255.0))
    max_entries = int(os.environ.get("LSV2_MAX_ENTRIES", 3_400_000))
    K_REP = 10
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
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    projm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    eps = jnp.asarray(np.linspace(0, 1e-6, K_REP, dtype=np.float32))
    tset = RasterizeSettings(
        image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
        tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=max_entries,
        impl="pallas", binning="sort", precision="bf16", assemble=False,
        tile_budget=budget_t, tile_budget_cap=cap,
        tile_budget_subdiv=subdiv, cull_alpha=cull_alpha)
    gx, gy = tset.grid_x, tset.grid_y
    scene = (means, ops, scales, rots, cols, qw, qi)

    def relev_tail(raw_t, nrm2_t, rgb_t):
        t, p, _ = raw_t.shape
        pq = NPOS + NNEG
        raw = raw_t.reshape(t * p, L, pq).transpose(1, 0, 2)
        nrm2 = nrm2_t.reshape(t * p, L).T
        sim = raw / (jnp.sqrt(jnp.maximum(nrm2, 0.0))[..., None] + 1e-10)
        pos, neg = sim[..., :NPOS], sim[..., NPOS:]
        # Exact 2-way-softmax identity: softmax([pos,neg])[0] =
        # sigmoid(10*(pos-neg)), monotone in -neg -> min over negs =
        # sigmoid(10*(pos - max(neg))).
        relev = jax.nn.sigmoid(
            10.0 * (pos - jnp.max(neg, axis=-1, keepdims=True)))
        heat = rasterize_tiles.tiles_to_image(
            relev.transpose(1, 0, 2).reshape(t, p, L * NPOS), gx, gy, h, w)
        return heat

    def frame_fused(v, *sc):
        rgb, raw_t, nrm2_t, _ft, _r, tot, live = rasterize_quick_query(
            tset, sc[0], sc[1], v, projm, jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32), scales=sc[2], rotations=sc[3],
            colors_precomp=sc[4], quick_weights=sc[5], quick_indices=sc[6],
            phi=phi, gram=gram, quick_channels=L * CB)
        heat = relev_tail(raw_t, nrm2_t, None)
        return rgb[0, 0, 0] + heat[0, 0, 0]

    def frame_unfused(v, *sc):
        out = rasterize(
            tset, sc[0], sc[1], v, projm, jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32), scales=sc[2], rotations=sc[3],
            colors_precomp=sc[4], quick_weights=sc[5], quick_indices=sc[6],
            quick_channels=L * CB)
        t, p, _ = out.feature_map.shape
        lk = L * CB
        pq = NPOS + NNEG
        phi_mat = jnp.zeros((lk, L * pq), jnp.bfloat16)
        gram_mat = jnp.zeros((lk, lk), jnp.bfloat16)
        for lvl in range(L):
            phi_mat = phi_mat.at[lvl * CB:(lvl + 1) * CB,
                                 lvl * pq:(lvl + 1) * pq].set(
                                     phi[lvl].astype(jnp.bfloat16))
            gram_mat = gram_mat.at[lvl * CB:(lvl + 1) * CB,
                                   lvl * CB:(lvl + 1) * CB].set(
                                       gram[lvl].astype(jnp.bfloat16))
        wm = out.feature_map.reshape(t * p, lk).astype(jnp.bfloat16)
        raw_t = jnp.einsum("qc,cd->qd", wm, phi_mat,
                           preferred_element_type=jnp.float32
                           ).reshape(t, p, -1)
        wg = jnp.einsum("qc,cd->qd", wm, gram_mat,
                        preferred_element_type=jnp.float32)
        nrm2_t = jnp.sum((wg * wm).reshape(t * p, L, CB), axis=-1
                         ).reshape(t, p, L)
        heat = relev_tail(raw_t, nrm2_t, None)
        return out.rgb[0, 0, 0] + heat[0, 0, 0]

    for name, fr in (("unfused", frame_unfused), ("fused", frame_fused)):
        @jax.jit
        def scanned(view, eps, *sc):
            def body(c, e):
                return c + fr(view.at[3, 0].add(e), *sc), 0.0
            c, _ = lax.scan(body, 0.0, eps)
            return c

        t0 = time.time()
        _ = float(scanned(view, eps, *scene))
        log(f"{name}: compile {time.time() - t0:.1f}s")
        for _ in range(3):
            t0 = time.time()
            _ = float(scanned(view, eps, *scene))
            dt = (time.time() - t0) / K_REP * 1000
            log(f"{name}: {dt:.1f} ms/frame = {1000 / dt:.2f} FPS")


if __name__ == "__main__":
    main()
