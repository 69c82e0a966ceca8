#!/usr/bin/env python
"""Temporal-coherence serving probe at the reference load (986x728, 1M
gaussians): steady-frame FPS against a frozen binning (ops/temporal.py),
rebin-frame rate, effective FPS at a rebin-every-R policy, and the
relevancy error-vs-pose-delta curve (the evidence behind the serving
threshold). Standalone twin of bench.py's temporal block for fast
iteration; env knobs: LSV2_PROF_H/W/N, LSV2_BUDGET, LSV2_CAP, LSV2_SUBDIV,
LSV2_CULL_ALPHA, LSV2_MAX_ENTRIES, LSV2_STEP_PX (orbit step, default 2).
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
    from langsplatv2_tpu.ops import temporal
    from langsplatv2_tpu.ops.rasterize import (RasterizeSettings,
                                               rasterize_quick_query)
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
    step_px = float(os.environ.get("LSV2_STEP_PX", 2.0))
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
    f_px = 0.5 * w / math.tan(fovx / 2)

    def pose_at(theta):
        c, s = math.cos(theta), math.sin(theta)
        rw = np.asarray(w2c).copy()
        ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        rw[:3, :3] = ry @ rw[:3, :3]
        v = jnp.asarray(rw.T, jnp.float32)
        p = jnp.asarray(
            rw.T @ get_projection_matrix(0.01, 100, fovx, fovy).T,
            jnp.float32)
        return v, p

    view, projm = pose_at(0.0)
    tset = RasterizeSettings(
        image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
        tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=max_entries,
        impl="pallas", binning="sort", precision="bf16", assemble=False,
        tile_budget=budget_t, tile_budget_cap=cap,
        tile_budget_subdiv=subdiv, cull_alpha=cull_alpha)
    log(f"load: {n} gaussians {w}x{h} budget {budget_t:g} cap {cap} "
        f"subdiv {subdiv} cull {cull_alpha:g} step {step_px}px")

    @jax.jit
    def bin_cache_fn(view, proj, means, op, sc, rot, col, qw, qi):
        cache, _ = temporal.quick_bin_cache(
            tset, means, op, view, proj, jnp.zeros(3, jnp.float32),
            scales=sc, rotations=rot, colors_precomp=col,
            quick_weights=qw, quick_indices=qi)
        return cache

    scene = (means, ops, scales, rots, cols, qw, qi)
    t0 = time.time()
    cache = jax.block_until_ready(bin_cache_fn(view, projm, *scene))
    log(f"bin compile+first: {time.time() - t0:.1f}s; kept="
        f"{int(cache.kept.sum())} max_tile={int(cache.max_tile_count)} "
        f"live={int(cache.live_total)} entries={int(cache.total_entries)}")
    if int(cache.total_entries) >= max_entries:
        raise RuntimeError("probe budget saturated; raise LSV2_MAX_ENTRIES")

    path = [pose_at(step_px / f_px * (i + 1)) for i in range(K_REP)]
    views_t = jnp.stack([v for v, _ in path])
    projs_t = jnp.stack([p for _, p in path])

    @jax.jit
    def steady_scan(cache, views, projs, phi, gram):
        def body(carry, vp):
            v, p = vp
            rgb_t, raw, nrm2, _t = temporal.rasterize_quick_steady(
                tset, cache, v, p, jnp.zeros(3, jnp.float32),
                quick_channels=L * CB, topk=TOPK, phi=phi, gram=gram)
            return carry + rgb_t[0, 0, 0] + raw[0, 0, 0], 0.0

        acc, _ = jax.lax.scan(body, 0.0, (views, projs))
        return acc

    t0 = time.time()
    _ = float(steady_scan(cache, views_t, projs_t, phi, gram))
    log(f"steady scan compile+first: {time.time() - t0:.1f}s")
    for _ in range(3):
        t0 = time.time()
        _ = float(steady_scan(cache, views_t, projs_t, phi, gram))
        log(f"steady frames: {K_REP / (time.time() - t0):.2f} FPS")

    NB = 5
    t0 = time.time()
    for i in range(NB):
        c2 = bin_cache_fn(views_t[i], projs_t[i], *scene)
    jax.block_until_ready(c2)
    fps_bin = NB / (time.time() - t0)
    log(f"rebin frames (host dispatch): {fps_bin:.2f} FPS")

    # Error vs pose delta.
    @jax.jit
    def steady_q(cache, v, p):
        return temporal.rasterize_quick_steady(
            tset, cache, v, p, jnp.zeros(3, jnp.float32),
            quick_channels=L * CB, topk=TOPK, phi=phi, gram=gram)

    @jax.jit
    def fresh_q(v, p):
        return rasterize_quick_query(
            tset, means, ops, v, p, jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32), scales=scales, rotations=rots,
            colors_precomp=cols, quick_weights=qw, quick_indices=qi,
            phi=phi, gram=gram, quick_channels=L * CB)

    def relev_of(raw_t, nrm2_t):
        t, p, _ = raw_t.shape
        raw = np.asarray(raw_t).reshape(t * p, L, NPOS + NNEG)
        nrm = np.sqrt(np.maximum(np.asarray(nrm2_t).reshape(t * p, L), 0.0))
        sim = raw / (nrm[..., None] + 1e-10)
        pos, neg = sim[..., :NPOS], sim[..., NPOS:]
        pair = np.stack([
            np.broadcast_to(pos[..., None], pos.shape + (NNEG,)),
            np.broadcast_to(neg[:, :, None, :], pos.shape + (NNEG,)),
        ], axis=-1)
        ex = np.exp(10.0 * (pair - pair.max(-1, keepdims=True)))
        return (ex[..., 0] / ex.sum(-1)).min(-1)

    for px in (0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0):
        v, p = pose_at(px / f_px)
        _, raw_s, nrm_s, _ = steady_q(cache, v, p)
        fq = fresh_q(v, p)
        r_s, r_f = relev_of(raw_s, nrm_s), relev_of(fq[1], fq[2])
        m_s, m_f = r_s > 0.5, r_f > 0.5
        union = np.logical_or(m_s, m_f).sum()
        iou = np.logical_and(m_s, m_f).sum() / union if union else 1.0
        d = np.abs(r_s - r_f)
        log(f"err @ {px:5.1f}px: max {d.max():.4f} mean {d.mean():.6f} "
            f"mask IoU {iou:.4f}")


if __name__ == "__main__":
    main()
