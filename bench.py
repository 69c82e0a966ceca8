"""Benchmark: language-feature rendering FPS on the real TPU chip.

Headline metric matching the reference's claim (450+ FPS merged 3-level
quick render on an A100 at LERF resolutions, README.md:1,50; BASELINE.md):
frames/second of the full quick path — 192-channel coefficient blend +
3x codebook decode + L2 normalize — on a synthetic LERF-scale scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Smaller configs are also timed and reported on stderr for trend tracking.
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
    from langsplatv2_tpu.ops import RasterizeSettings, rasterize

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
    campos = jnp.zeros(3, jnp.float32)

    settings = RasterizeSettings(
        image_height=H, image_width=W,
        tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2),
        sh_degree=0, max_entries=2 ** 22, tile_cap=1024, tile_batch=32)

    dev_args = jax.device_put((
        jnp.asarray(means), jnp.asarray(opacities), jnp.asarray(scales),
        jnp.asarray(rotations), jnp.asarray(colors), jnp.asarray(qw),
        jnp.asarray(qi), jnp.asarray(codebooks)))
    (means_d, op_d, sc_d, rot_d, col_d, qw_d, qi_d, cb_d) = dev_args

    @jax.jit
    def frame(view, proj, campos):
        out = rasterize(
            settings, means_d, op_d, view, proj, campos,
            jnp.zeros(3, jnp.float32),
            scales=sc_d, rotations=rot_d, colors_precomp=col_d,
            quick_weights=qw_d, quick_indices=qi_d, quick_channels=L * K)
        wmap = out.feature_map
        flat = wmap.reshape(L, K, H * W)
        feats = jnp.einsum("lkd,lkp->ldp", cb_d, flat,
                           preferred_element_type=jnp.float32)
        feats = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-10)
        return out.rgb, feats

    t0 = time.time()
    rgb, feats = frame(view, proj, campos)
    jax.block_until_ready((rgb, feats))
    log(f"compile+first frame: {time.time() - t0:.1f}s")
    log("rgb finite:", bool(jnp.isfinite(rgb).all()),
        "feat finite:", bool(jnp.isfinite(feats).all()))

    n_frames = 20
    t0 = time.time()
    for _ in range(n_frames):
        rgb, feats = frame(view, proj, campos)
    jax.block_until_ready((rgb, feats))
    dt = time.time() - t0
    fps = n_frames / dt

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
