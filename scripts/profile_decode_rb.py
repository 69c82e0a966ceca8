#!/usr/bin/env python
"""A/B the streamed 512-d decode's rows-per-block (RB) at the reference
load: bench_unfused (f32 tiles, RB=1) measured 11.02 FPS; bench_final
(bf16 tiles, RB=4) measured 7.96 — this isolates which change cost it.
On-device lax.scan over 10 frames per variant, one chip window.
"""
import math
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from langsplatv2_tpu.ops.rasterize import RasterizeSettings, rasterize
    from langsplatv2_tpu.utils.camera_math import (get_projection_matrix,
                                                   get_world_to_view)

    log("devices:", jax.devices())
    N, lH, lW = 1_000_000, 728, 986
    L, K, TOPK, CLIP_D = 3, 64, 4, 512
    rng = np.random.default_rng(0)
    means_d = jnp.asarray(np.concatenate(
        [rng.uniform(-4, 4, (N, 2)), rng.uniform(2.0, 12.0, (N, 1))], 1),
        jnp.float32)
    sc_d = jnp.asarray(rng.uniform(0.005, 0.06, (N, 3)), jnp.float32)
    rot_d = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    op_d = jnp.asarray(rng.uniform(0.05, 0.95, (N, 1)), jnp.float32)
    col_d = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    qw = rng.uniform(0, 1, (N, L * TOPK)).astype(np.float32)
    qw /= qw.sum(1, keepdims=True)
    qi = np.concatenate(
        [rng.integers(0, K, (N, TOPK)) + l * K for l in range(L)], 1
    ).astype(np.float32)
    qw_d, qi_d = jnp.asarray(qw), jnp.asarray(qi)
    cb_d = jnp.asarray(rng.normal(size=(L, K, CLIP_D)).astype(np.float32))
    fovy = math.radians(60)
    lfovx = 2 * math.atan(math.tan(fovy / 2) * lW / lH)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    lproj = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, lfovx, fovy).T, jnp.float32)

    dset = RasterizeSettings(
        image_height=lH, image_width=lW, tanfovx=math.tan(lfovx / 2),
        tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=3_366_912,
        live_entries=2_715_648, impl="pallas", binning="sort",
        precision="bf16", assemble=False)
    gx, gy = dset.grid_x, dset.grid_y

    def make_scan(RB):
        def frame(view_i):
            out = rasterize(
                dset, means_d, op_d, view_i, lproj,
                jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                scales=sc_d, rotations=rot_d, colors_precomp=col_d,
                quick_weights=qw_d, quick_indices=qi_d,
                quick_channels=L * K)
            ft = out.feature_map.reshape(gy, gx * 256, L, K)
            cbm = cb_d.astype(jnp.bfloat16)
            buf = jnp.zeros((L * CLIP_D, lH, lW), jnp.bfloat16)

            def rows_block(i0, nr):
                wm = jax.lax.dynamic_slice_in_dim(
                    ft, i0, nr, 0).astype(jnp.bfloat16)
                wm = wm.reshape(nr * gx * 256, L, K)
                feats = jnp.einsum("qlk,lkd->qld", wm, cbm,
                                   preferred_element_type=jnp.float32)
                feats = feats * jax.lax.rsqrt(
                    jnp.sum(feats * feats, -1, keepdims=True) + 1e-10)
                block = feats.astype(jnp.bfloat16).reshape(
                    nr, gx, 16, 16, L * CLIP_D)
                return block.transpose(4, 0, 2, 1, 3).reshape(
                    L * CLIP_D, nr * 16, gx * 16)[:, :, :lW]

            full_rows = lH // 16
            nb = full_rows // RB

            def body(b, buf):
                return jax.lax.dynamic_update_slice(
                    buf, rows_block(b * RB, RB), (0, b * RB * 16, 0))

            buf = jax.lax.fori_loop(0, nb, body, buf)
            done = nb * RB
            if full_rows - done:
                buf = jax.lax.dynamic_update_slice(
                    buf, rows_block(done, full_rows - done),
                    (0, done * 16, 0))
            if lH % 16:
                buf = jax.lax.dynamic_update_slice(
                    buf, rows_block(full_rows, 1)[:, :lH % 16, :],
                    (0, full_rows * 16, 0))
            return out.rgb, buf

        @jax.jit
        def scanned(view, eps):
            def body(c, e):
                rgb, img = frame(view.at[3, 0].add(e))
                return c + rgb[0, 0, 0] + img[0, 0, 0].astype(
                    jnp.float32), 0.0
            c, _ = jax.lax.scan(body, 0.0, eps)
            return c
        return scanned

    KREP = 10
    eps = jnp.asarray(np.linspace(0, 1e-6, KREP, dtype=np.float32))
    for RB in (1, 2, 4):
        fn = make_scan(RB)
        t0 = time.time()
        _ = float(fn(view, eps))
        log(f"RB={RB} compile+first {time.time() - t0:.1f}s")
        t0 = time.time()
        _ = float(fn(view, eps))
        fps = KREP / (time.time() - t0)
        log(f"RB={RB}: {fps:.2f} FPS ({1000 / fps:.1f} ms/frame)")


if __name__ == "__main__":
    main()
