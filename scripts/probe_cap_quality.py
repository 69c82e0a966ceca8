#!/usr/bin/env python
"""CPU quality probe for the budget-capped mode's tile_budget_cap knob.

The chip A/B (run_chip_queue2.sh) measures SPEED at cap 64 vs 128; this
probe measures what that cap costs in QUALITY on a scene dense enough
that the cap actually binds (per-tile entry counts in the hundreds):
relevancy-mask IoU vs the exact path + max RGB error, per cap, at the
shipped budget. Run with JAX_PLATFORMS=cpu.
"""
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from langsplatv2_tpu.ops import projection
    from langsplatv2_tpu.ops.rasterize import (RasterizeSettings,
                                               rasterize_quick_query)
    from langsplatv2_tpu.utils.camera_math import (get_projection_matrix,
                                                   get_world_to_view)

    n, h, w = 12000, 96, 128
    rng = np.random.default_rng(0)
    # Clustered depth stack: many overlapping splats per tile.
    means = jnp.asarray(np.concatenate(
        [rng.uniform(-1.6, 1.6, (n, 2)), rng.uniform(1.0, 10.0, (n, 1))], 1),
        jnp.float32)
    scales = jnp.asarray(rng.uniform(0.03, 0.25, (n, 3)), jnp.float32)
    rots = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    ops = jnp.asarray(rng.uniform(0.05, 0.9, (n, 1)), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    L, K, TOPK, PQ = 3, 64, 4, 2
    qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
    qw /= qw.sum(1, keepdims=True)
    qi = np.concatenate(
        [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
    ).astype(np.float32)
    cb = rng.normal(size=(L, K, 32)).astype(np.float32)
    phrases = rng.normal(size=(PQ, 32)).astype(np.float32)
    phrases /= np.linalg.norm(phrases, axis=1, keepdims=True)
    phi = jnp.einsum("lkd,pd->lkp", jnp.asarray(cb), jnp.asarray(phrases))
    gram = jnp.einsum("lkd,lmd->lkm", jnp.asarray(cb), jnp.asarray(cb))
    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    pm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)

    sp = RasterizeSettings(
        image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
        tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 18,
        tile_cap=2048, impl="pallas", precision="bf16", assemble=False)
    common = dict(scales=scales, rotations=rots, colors_precomp=cols,
                  quick_weights=jnp.asarray(qw), quick_indices=jnp.asarray(qi),
                  phi=phi, gram=gram, quick_channels=L * K)
    args = (means, ops, view, pm, jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32))

    def run(settings):
        rgb, raw_t, nrm2_t, _, _, tot, _ = rasterize_quick_query(
            settings, *args, **common)
        raw = np.asarray(raw_t).reshape(-1, L, PQ)
        nrm = np.sqrt(np.maximum(np.asarray(nrm2_t).reshape(-1, L), 0))
        sim = raw / (nrm[..., None] + 1e-10)
        return np.asarray(rgb), sim, int(tot)

    rgb_ref, sim_ref, tot = run(sp)
    m_ref = sim_ref > 0.18
    print(f"scene: {n} gaussians {w}x{h}, {tot} entries over "
          f"{sp.grid_x * sp.grid_y} tiles "
          f"(mean {tot / (sp.grid_x * sp.grid_y):.0f}/tile)", flush=True)
    for budget in (1e-6,):
        for cap in (128, 256):
            rgb_c, sim_c, _ = run(sp._replace(
                tile_budget=budget, tile_budget_cap=cap))
            m_c = sim_c > 0.18
            union = np.logical_or(m_ref, m_c).sum()
            iou = np.logical_and(m_ref, m_c).sum() / max(union, 1)
            print(f"budget {budget:g} cap {cap:4d}: relevancy IoU "
                  f"{iou:.4f}  rgb max|err| {np.abs(rgb_c - rgb_ref).max():.4f}"
                  f"  mean|err| {np.abs(rgb_c - rgb_ref).mean():.5f}",
                  flush=True)


if __name__ == "__main__":
    main()
