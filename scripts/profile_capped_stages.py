#!/usr/bin/env python
"""Stage-prefix timing of the budget-CAPPED quick frame (settings.tile_budget
mode) at the reference eval load (986x728) and optionally 1080p.

The round-4 bench measured the capped 728p frame at 22.04 FPS (45.4 ms)
while the exact-path stage model predicts ~32 ms for it — this profiler
attributes the difference stage by stage, on-device (lax.scan loops, the
only trustworthy timing on this backend):

  preprocess -> pack16 -> expand+alpha (with_alpha=subdiv sub-box bounds)
  -> sort+payload (1 extra lm word) -> budget (int-quanta cumsum + binary
  search) -> slice ([T, cap] dynamic-slice layout) -> gather (T*cap w16
  rows) -> blend (fixed <=cap segments) -> query (gram relevancy tail)

Env knobs: LSV2_PROF_H/W (default 728/986), LSV2_PROF_N (1M),
LSV2_BUDGET (1e-6), LSV2_CAP (128), LSV2_SUBDIV (2),
LSV2_MAX_ENTRIES (2.6M at 728p scale).
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
    from langsplatv2_tpu.ops import pallas_binning, pallas_blend, projection
    from langsplatv2_tpu.ops import rasterize_tiles

    log("devices:", jax.devices())
    n = int(os.environ.get("LSV2_PROF_N", 1_000_000))
    h = int(os.environ.get("LSV2_PROF_H", 728))
    w = int(os.environ.get("LSV2_PROF_W", 986))
    budget_t = float(os.environ.get("LSV2_BUDGET", 1e-6))
    cap = int(os.environ.get("LSV2_CAP", 128))
    subdiv = int(os.environ.get("LSV2_SUBDIV", 2))
    max_entries = int(os.environ.get("LSV2_MAX_ENTRIES", 2_600_000))
    cull_alpha = float(os.environ.get("LSV2_CULL_ALPHA", 1.0 / 255.0))
    gx, gy = -(-w // 16), -(-h // 16)
    num_tiles = gx * gy
    chunk = 256
    K = 8
    L, CB, NPOS, NNEG = 3, 64, 1, 4
    TOPK = 12
    n_box = subdiv * subdiv
    log(f"load: {n} gaussians, {w}x{h} ({num_tiles} tiles), "
        f"budget {budget_t}, cap {cap}, subdiv {subdiv}, "
        f"max_entries {max_entries}, cull_alpha {cull_alpha:g}")

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
            0, 1.0, opacities=ops[:, 0], cull_alpha=cull_alpha)
        if stage == "preprocess":
            return jnp.sum(proj.xy) + jnp.sum(proj.conic)
        rows = pallas_blend.pack_fast16_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb, qw, qi)
        if stage == "pack16":
            return jnp.sum(rows * rows)
        tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
            proj, gx, gy, max_entries, opacities=ops[:, 0], exact_cull=True,
            cull_alpha=cull_alpha)
        if stage == "expand":
            return jnp.sum(tile) + jnp.sum(gauss) * 1.0
        keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        g_sorted, tile_start, tile_count, _ts = \
            pallas_binning.sorted_binning_from_keys(keys, num_tiles)
        if stage == "sortpay":
            return jnp.sum(g_sorted) * 1.0 + jnp.sum(tile_count) * 1.0
        g2 = pallas_binning.slice_windows(g_sorted, tile_start, cap
                                          ).reshape(-1)
        if stage == "slice":
            return jnp.sum(g2) * 1.0
        gathered = rows[g2]
        if stage == "gather":
            return jnp.sum(gathered * gathered)
        # Budget recomputed from the gathered rows (round-5 structure:
        # pallas_binning.budget_from_rows via the fast16 field unpack).
        xyg = gathered[:, 0:2]
        cag = pallas_blend._unpack_hi(gathered[:, 2])
        cbg = pallas_blend._unpack_lo(gathered[:, 2])
        ccg = pallas_blend._unpack_hi(gathered[:, 3])
        opg = pallas_blend._unpack_lo(gathered[:, 3])
        kept, _sat = pallas_binning.budget_from_rows(
            xyg, jnp.stack([cag, cbg, ccg], axis=1), opg, tile_count,
            gx, cap, subdiv, budget_t)
        if stage == "budget":
            return jnp.sum(kept) * 1.0 + jnp.sum(gathered[:, 0])
        eg = pallas_blend.to_field_major(gathered, chunk)
        if stage == "fieldmajor":
            return jnp.sum(eg * eg) + jnp.sum(kept) * 1.0
        dense_start = jnp.arange(num_tiles, dtype=jnp.int32) * cap
        tid = jnp.arange(num_tiles, dtype=jnp.int32)
        ef = jnp.zeros((1, eg.shape[1]), jnp.float32)
        rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
            eg, ef, dense_start, kept, tid, jnp.zeros(3), grid_x=gx,
            grid_y=gy, mode="quick", out_channels=L * CB, topk=TOPK,
            chunk=chunk, rowfmt="fast16", banded=True)
        if stage == "blend":
            return jnp.sum(rgb_t[:, 0, 0]) + jnp.sum(feat_t[:, 0, 0])
        # gram query + heat assembly (the bench frame's tail). Default =
        # the Pallas one-pass query (bench default; the XLA einsums
        # materialize the [Q, L*K] f32 `wg` in HBM); LSV2_XLA_QUERY=1
        # profiles the round-4 block-diag einsum form instead.
        t, p, _ = feat_t.shape
        lk = L * CB
        pq = NPOS + NNEG
        if os.environ.get("LSV2_XLA_QUERY", "0") == "1":
            phi_mat = jnp.zeros((lk, L * pq), jnp.bfloat16)
            gram_mat = jnp.zeros((lk, lk), jnp.bfloat16)
            for lvl in range(L):
                phi_mat = phi_mat.at[lvl * CB:(lvl + 1) * CB,
                                     lvl * pq:(lvl + 1) * pq].set(
                                         phi[lvl].astype(jnp.bfloat16))
                gram_mat = gram_mat.at[lvl * CB:(lvl + 1) * CB,
                                       lvl * CB:(lvl + 1) * CB].set(
                                           gram[lvl].astype(jnp.bfloat16))
            wm = feat_t.reshape(t * p, lk).astype(jnp.bfloat16)
            raw = jnp.einsum("qc,cd->qd", wm, phi_mat,
                             preferred_element_type=jnp.float32
                             ).reshape(t * p, L, pq).transpose(1, 0, 2)
            wg = jnp.einsum("qc,cd->qd", wm, gram_mat,
                            preferred_element_type=jnp.float32)
            nrm2 = jnp.sum((wg * wm).reshape(t * p, L, CB), axis=-1).T
        else:
            from langsplatv2_tpu.ops.pallas_query import query_map_tiles
            raw_t, nrm2_t = query_map_tiles(
                feat_t.astype(jnp.bfloat16), phi, gram)
            raw = raw_t.reshape(t * p, L, pq).transpose(1, 0, 2)
            nrm2 = nrm2_t.reshape(t * p, L).T
        sim = raw / (jnp.sqrt(jnp.maximum(nrm2, 0.0))[..., None] + 1e-10)
        pos, neg = sim[..., :NPOS], sim[..., NPOS:]
        relev = jax.nn.sigmoid(
            10.0 * (pos - jnp.max(neg, axis=-1, keepdims=True)))
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

    stages = ["preprocess", "pack16", "expand", "sortpay", "slice",
              "gather", "budget", "fieldmajor", "blend", "query"]
    times = {}
    for s in stages:
        times[s] = run(s)

    log("\nstage deltas (pipeline order):")
    prev = 0.0
    for s in stages:
        log(f"  {s:12s} +{times[s] - prev:8.1f} ms  (prefix {times[s]:8.1f})")
        prev = times[s]


if __name__ == "__main__":
    main()
