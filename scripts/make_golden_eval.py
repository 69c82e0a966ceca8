#!/usr/bin/env python
"""Generate (or verify) the golden eval fixture.

Pins the END-TO-END relevancy/IoU/localization numerics of the eval stack
on a deterministic dense synthetic scene — decode path, gram path, oracle
(XLA) and streaming (Pallas interpret) rasterizers all checked against one
committed reference (tests/golden/eval_golden.npz). Real LERF data and
OpenCLIP weights cannot enter this environment (zero egress), so this
fixture is the strongest available regression pin: any refactor that
shifts the relevancy pipeline beyond float tolerance fails the golden test
(tests/test_golden_eval.py). Generated on the CPU backend (the test's
platform) for bit-comparable floats.

Usage: python scripts/make_golden_eval.py [--write]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "eval_golden.npz")

H, W = 160, 224
N = 2000
L, K, TOPK = 3, 64, 4
NPROMPT = 3


def compute():
    import jax
    import jax.numpy as jnp
    from langsplatv2_tpu.eval import processing
    from langsplatv2_tpu.eval.openclip import HashBackend, OpenCLIPNetwork
    from langsplatv2_tpu.models import gaussians as gm
    from langsplatv2_tpu.ops import RasterizeSettings, rasterize
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)
    import math

    rng = np.random.default_rng(42)
    means = np.concatenate([
        rng.uniform(-3, 3, (N, 2)), rng.uniform(2.0, 9.0, (N, 1))
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.02, 0.12, (N, 3)).astype(np.float32)
    rots = rng.normal(size=(N, 4)).astype(np.float32)
    ops = rng.uniform(0.3, 0.95, (N, 1)).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    qw = rng.uniform(0, 1, (N, L * TOPK)).astype(np.float32)
    qw /= qw.sum(1, keepdims=True)
    qi = np.concatenate(
        [rng.integers(0, K, (N, TOPK)) + lvl * K for lvl in range(L)], 1
    ).astype(np.float32)
    codebooks = rng.normal(size=(L, K, 512)).astype(np.float32)
    codebooks /= np.linalg.norm(codebooks, axis=2, keepdims=True)

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * W / H)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    pm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)

    settings = RasterizeSettings(
        image_height=H, image_width=W, tanfovx=math.tan(fovx / 2),
        tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 17,
        tile_cap=2048, tile_batch=4)

    def wmap_of(impl):
        out = rasterize(
            settings._replace(impl=impl), jnp.asarray(means),
            jnp.asarray(ops), view, pm, jnp.zeros(3, jnp.float32),
            jnp.zeros(3, jnp.float32), scales=jnp.asarray(scales),
            rotations=jnp.asarray(rots), colors_precomp=jnp.asarray(cols),
            quick_weights=jnp.asarray(qw), quick_indices=jnp.asarray(qi),
            quick_channels=L * K)
        return out.feature_map

    wmap_x = wmap_of("xla")
    wmap_p = wmap_of("pallas")

    clip = OpenCLIPNetwork(backend="hash")
    assert isinstance(clip.backend, HashBackend)
    clip.set_positives([f"prompt {i}" for i in range(NPROMPT)])

    cb = jnp.asarray(codebooks)
    # Gram-trick relevancy straight from the weight map.
    rel_gram = clip.get_max_across_from_weights(wmap_x, cb)    # [L, P, H, W]
    # Decode path: lift to 512-d, normalize, relevancy per level.
    flat = wmap_x.reshape(L, K, H * W)
    feats = jnp.einsum("lkd,lkp->ldp", cb, flat)
    feats = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-10)
    # get_max_across_quick consumes channel-last [L, H, W, 512] maps.
    rel_decode = clip.get_max_across_quick(
        jnp.transpose(feats.reshape(L, 512, H, W), (0, 2, 3, 1)))

    # Segmentation + localization machinery (eval_lerf.py:111-200 parity
    # path) over the full [levels, prompts, H, W] relevancy stack.
    prompts = [f"prompt {i}" for i in range(NPROMPT)]
    gt_masks, gt_boxes = {}, {}
    for k, p in enumerate(prompts):
        m = np.zeros((H, W), np.uint8)
        y0, x0 = 20 + 30 * k, 30 + 40 * k
        m[y0:y0 + 60, x0:x0 + 80] = 1
        gt_masks[p] = m
        gt_boxes[p] = np.asarray([[x0, y0, x0 + 80, y0 + 60]])
    chosen_iou, chosen_lvl, _ = processing.segmentation_process(
        rel_gram, 0.4, gt_masks, prompts)
    acc = processing.localization_process(rel_gram, gt_boxes, prompts)

    return {
        "wmap_checksum": np.asarray(
            jnp.sum(wmap_x * jnp.cos(jnp.arange(wmap_x.size).reshape(
                wmap_x.shape) * 1e-3))),
        "wmap_pallas_maxdiff": np.asarray(jnp.abs(wmap_p - wmap_x).max()),
        "rel_gram": np.asarray(rel_gram, np.float32),
        "rel_decode_maxdiff": np.asarray(
            jnp.abs(rel_decode - rel_gram).max()),
        "chosen_iou": np.asarray(chosen_iou, np.float32),
        "chosen_lvl": np.asarray(chosen_lvl, np.int32),
        "localization_hits": np.asarray(acc, np.int32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")
    vals = compute()
    if args.write:
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **vals)
        print(f"wrote {GOLDEN}")
        for k, v in vals.items():
            if np.asarray(v).size <= 4:
                print(f"  {k} = {np.asarray(v)}")
    else:
        ref = np.load(GOLDEN)
        for k in ref.files:
            np.testing.assert_allclose(vals[k], ref[k], atol=1e-5,
                                       err_msg=k)
        print("golden eval fixture verified")


if __name__ == "__main__":
    main()
