"""Benchmark: language-feature rendering FPS on the real TPU chip.

Headline metric matching the reference's claim (450+ FPS merged 3-level
quick render on an A100 at LERF resolutions, README.md:1,50; BASELINE.md):
frames/second of the full quick path — streaming Pallas rasterization of the
192-channel coefficient map + 3x codebook decode to 512-d CLIP space (bf16)
+ L2 normalize — on a synthetic LERF-scale scene (1M gaussians, 1080p).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Component timings go to stderr for trend tracking. Timing forces a host
fetch per measurement (block_until_ready under-reports on this backend).
"""
import json
import math
import sys
import time

import numpy as np

BASELINE_FPS = 450.0  # reference title claim (A100)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from langsplatv2_tpu.ops.rasterize import RasterizeSettings, rasterize

    log("devices:", jax.devices())

    # LERF-like scale: ~1M gaussians after 30k RGB iters; 1080p frame.
    N = 1_000_000
    H, W = 1080, 1920
    L, K, TOPK = 3, 64, 4

    rng = np.random.default_rng(0)
    means = np.concatenate([
        rng.uniform(-4, 4, (N, 2)), rng.uniform(2.0, 12.0, (N, 1))
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.004, 0.04, (N, 3)).astype(np.float32)
    rotations = rng.normal(size=(N, 4)).astype(np.float32)
    opacities = rng.uniform(0.2, 0.95, (N, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    qw = rng.uniform(0, 1, (N, L * TOPK)).astype(np.float32)
    qw /= qw.sum(1, keepdims=True)
    qi = np.concatenate(
        [rng.integers(0, K, (N, TOPK)) + lvl * K for lvl in range(L)], axis=1
    ).astype(np.float32)
    codebooks = rng.normal(size=(L, K, 512)).astype(np.float32)

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * W / H)
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    proj = jnp.asarray(w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T,
                       jnp.float32)

    settings = RasterizeSettings(
        image_height=H, image_width=W,
        tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2),
        sh_degree=0, max_entries=5_300_000, impl="pallas")

    (means_d, op_d, sc_d, rot_d, col_d, qw_d, qi_d, cb_d) = jax.device_put((
        jnp.asarray(means), jnp.asarray(opacities), jnp.asarray(scales),
        jnp.asarray(rotations), jnp.asarray(colors), jnp.asarray(qw),
        jnp.asarray(qi), jnp.asarray(codebooks)))

    @jax.jit
    def frame_weightmap(view, proj):
        out = rasterize(
            settings, means_d, op_d, view, proj, jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32),
            scales=sc_d, rotations=rot_d, colors_precomp=col_d,
            quick_weights=qw_d, quick_indices=qi_d, quick_channels=L * K)
        return out.rgb, out.feature_map, out.total_entries

    @jax.jit
    def decode(wmap):
        # 3-level codebook lift to CLIP space + L2 normalize, bf16 output,
        # pixel-chunked so the f32 intermediate never exceeds ~1.6GB
        # ([3, 512, H, W] f32 would not even fit once in HBM).
        n_chunks = 8
        flat = wmap.reshape(L, K, n_chunks, (H * W) // n_chunks)
        flat = flat.transpose(2, 0, 1, 3).astype(jnp.bfloat16)  # [C, L, K, P/C]

        def one(chunk):
            feats = jnp.einsum("lkd,lkp->ldp", cb_d.astype(jnp.bfloat16),
                               chunk, preferred_element_type=jnp.float32)
            feats = feats * jax.lax.rsqrt(
                jnp.sum(feats * feats, axis=1, keepdims=True) + 1e-10)
            return feats.astype(jnp.bfloat16)

        out = jax.lax.map(one, flat)                   # [C, L, 512, P/C]
        return out.transpose(1, 2, 0, 3).reshape(L, 512, H * W)

    def full_frame(view, proj):
        rgb, wmap, tot = frame_weightmap(view, proj)
        return rgb, decode(wmap), tot

    t0 = time.time()
    rgb, feats, tot = full_frame(view, proj)
    probe = float(jnp.asarray(rgb[0, 0, 0]))
    log(f"compile+first frame: {time.time() - t0:.1f}s entries={int(tot)}")
    if int(tot) >= settings.max_entries:
        log("WARNING: entry budget saturated - output may be truncated")
    log("rgb finite:", bool(jnp.isfinite(rgb).all()),
        "feat finite:", bool(jnp.isfinite(feats).all()))
    del rgb, feats  # the decoded map is 6.4GB; two frames must never coexist

    def fps_of(fn, n=10):
        out = None
        t0 = time.time()
        for _ in range(n):
            del out
            out = fn(view, proj)
        # Force one element of EVERY output: for full_frame the decode is a
        # separate jit computation enqueued after the weight-map render, so
        # forcing only rgb would leave the last decode outside the window.
        for o in out:
            _ = float(jnp.asarray(o).ravel()[0])
        return n / (time.time() - t0)

    fps_wmap = fps_of(frame_weightmap)
    log(f"weight-map render only: {fps_wmap:.2f} FPS")
    fps = fps_of(full_frame)
    log(f"full quick path: {fps:.2f} FPS")

    print(json.dumps({
        "metric": "language_feature_render_fps_1080p",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit the JSON contract line
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "language_feature_render_fps_1080p",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": str(e)[:200],
        }))
