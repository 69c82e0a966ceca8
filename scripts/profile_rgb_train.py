#!/usr/bin/env python
"""RGB (geometry) training throughput on the real TPU: XLA autodiff pipeline
vs Pallas forward + Pallas backward (ops/pallas_rgb_train.py), measured with
an on-device lax.scan loop at LERF scale (544x960, 300k gaussians)."""
import math
import sys
import time
import types

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from langsplatv2_tpu.models import gaussians as gm
    from langsplatv2_tpu.models.renderer import make_settings
    from langsplatv2_tpu.train import trainer
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)

    log("devices:", jax.devices())
    n, h, w = 300_000, 544, 960

    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-4, 4, (n, 2)), rng.uniform(2.0, 12.0, (n, 1))
    ], axis=1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    model = gm.create_from_pcd(pts, cols, spatial_lr_scale=1.0)
    model = model.replace(
        opacity=jnp.asarray(rng.uniform(-1, 2, (n, 1)).astype(np.float32)),
        scaling=jnp.log(jnp.asarray(
            rng.uniform(0.004, 0.04, (n, 3)).astype(np.float32))))

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    proj = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    campos = jnp.zeros(3, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))

    cam = types.SimpleNamespace(
        image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
        tanfovy=math.tan(fovy / 2))
    opt = types.SimpleNamespace(
        position_lr_init=0.00016, position_lr_final=0.0000016,
        position_lr_delay_mult=0.01, position_lr_max_steps=30000,
        feature_lr=0.0025, opacity_lr=0.05, scaling_lr=0.005,
        rotation_lr=0.001, lambda_dssim=0.2)
    optimizer = trainer.make_rgb_optimizer(opt, 1.0)
    opt_state = optimizer.init(trainer.rgb_params(model))

    for impl in ("pallas", "xla"):
        # The XLA autodiff path allocates [tiles, P, cap]-shaped temps in
        # its backward — at this scale it OOMs beyond cap ~512 (the reason
        # the Pallas backward exists); the Pallas path has no cap tensor.
        cap = 2048 if impl == "pallas" else 512
        settings = make_settings(cam, 0, 1.0, 2 ** 21, cap, 16, impl=impl)
        step = trainer.make_rgb_train_step(settings, optimizer, 0.2)

        try:
            t0 = time.time()
            m1, os1, met = step(model, opt_state, view, proj, campos, bg, gt)
            l0 = float(met["loss"])
        except Exception as e:
            log(f"[{impl}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        log(f"[{impl}] compile+first step: {time.time() - t0:.1f}s "
            f"loss={l0:.5f} visible={int(met['num_visible'])}")

        kscan = 6

        @jax.jit
        def multi(model, opt_state, view, proj, campos, bg, gt):
            def body(carry, _):
                m, os_ = carry
                m, os_, met = step(m, os_, view, proj, campos, bg, gt)
                return (m, os_), met["loss"]

            (m, os_), ls = jax.lax.scan(body, (model, opt_state), None,
                                        length=kscan)
            return m, os_, ls

        try:
            t0 = time.time()
            _, _, ls = multi(model, opt_state, view, proj, campos, bg, gt)
            _ = float(ls[-1])
            log(f"[{impl}] scan compile+first: {time.time() - t0:.1f}s "
                f"losses {np.asarray(ls)[:2]}")
            t0 = time.time()
            _, _, ls = multi(model, opt_state, view, proj, campos, bg, gt)
            _ = float(ls[-1])
            dt = (time.time() - t0) / kscan
            log(f"[{impl}] scan: {dt * 1000:.1f} ms/step = {1 / dt:.2f} it/s")
        except Exception as e:
            log(f"[{impl}] scan FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
