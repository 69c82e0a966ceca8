#!/usr/bin/env python
"""Capped feature-train step dissection at the trainer's ACTUAL config.

profile_train.py times the standalone forward in image-assemble mode, but
the gram-loss step runs tiles mode (assemble=False) — its numbers are not
comparable to the step. This script dissects the capped step exactly as
make_feature_train_step builds it (tiles-mode render, gram_cos_loss_tiles,
value_and_grad, GroupedOptimizer update) so the fused-backward work can be
attributed honestly. Reference scale: 544x960 / 300k gaussians / L=1 K=64
topk=4 (the fork's 3090 Ti logs ~11.4 it/s, training_log.txt).
"""
import math
import os
import sys
import time
import types

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from langsplatv2_tpu.models import gaussians as gm
    from langsplatv2_tpu.models.renderer import make_settings, render
    from langsplatv2_tpu.train import trainer
    from langsplatv2_tpu.train.trainer import (
        feature_params, gram_cos_loss_tiles)
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)

    log("devices:", jax.devices())
    n, h, w = 300_000, 544, 960
    nseg = 512

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
    model = gm.init_language_features(model, jax.random.PRNGKey(0), 1, 64)

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    proj = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    campos = jnp.zeros(3, jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    cam = types.SimpleNamespace(
        image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
        tanfovy=math.tan(fovy / 2))
    budget = int(os.environ.get("LSV2_BUDGET", 2 ** 21))
    settings = make_settings(
        cam, 0, 1.0, budget, 2048, 16,
        tile_budget=float(os.environ.get("LSV2_TILE_BUDGET", "1e-6")),
        tile_budget_cap=int(os.environ.get("LSV2_TILE_CAP", "128")),
        tile_budget_subdiv=int(os.environ.get("LSV2_TILE_SUBDIV", "2")))
    ca = float(os.environ.get("LSV2_CULL_ALPHA", "0"))
    if ca > 0:
        settings = settings._replace(cull_alpha=ca)
    sett_tiles = settings._replace(assemble=False)

    table = jnp.asarray(rng.normal(size=(nseg, 512)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, nseg, (h, w)).astype(np.int32))

    K = 8
    eps = jnp.asarray(np.linspace(0, 1e-7, K, dtype=np.float32))

    def scan_time(name, fn, *args):
        @jax.jit
        def scanned(eps, *args):
            def body(c, e):
                return c + fn(*args, e), 0.0
            c, _ = lax.scan(body, 0.0, eps)
            return c

        t0 = time.time()
        _ = float(scanned(eps, *args))
        ct = time.time() - t0
        t0 = time.time()
        _ = float(scanned(eps, *args))
        dt = (time.time() - t0) / K * 1000
        log(f"{name:40s} compile {ct:6.1f}s  {dt:8.2f} ms")
        return dt

    # 1. tiles-mode forward render (what the gram step runs)
    def fwd_tiles(m, e):
        out = render(sett_tiles, m.replace(opacity=m.opacity + e), view,
                     proj, campos, bg, include_feature=True, topk=4)
        return jnp.sum(out.language_feature_weight_map[::37, ::29, :2])

    t_fwd = scan_time("fwd render (tiles mode)", fwd_tiles, model)

    # 2. forward + gram loss (tiles)
    def fwd_loss(m, e):
        out = render(sett_tiles, m.replace(opacity=m.opacity + e), view,
                     proj, campos, bg, include_feature=True, topk=4)
        return gram_cos_loss_tiles(
            m.codebooks, out.language_feature_weight_map, table, seg, 0)

    t_fl = scan_time("fwd + gram loss", fwd_loss, model)

    # 3. fwd + loss + backward (value_and_grad over feature params)
    def fwd_bwd(m, e):
        m = m.replace(opacity=m.opacity + e)

        def lf(params):
            mm = m.replace(**params)
            out = render(sett_tiles, mm, view, proj, campos, bg,
                         include_feature=True, topk=4)
            return gram_cos_loss_tiles(
                mm.codebooks, out.language_feature_weight_map, table, seg, 0)

        loss, grads = jax.value_and_grad(lf)(feature_params(m))
        return loss + jnp.sum(grads["language_logits"][::977, :2])

    t_fb = scan_time("fwd + loss + bwd", fwd_bwd, model)

    # 4. full step (adds get_weights_and_indices + Adam)
    opt = types.SimpleNamespace(language_feature_lr=0.0025)
    optimizer = trainer.make_feature_optimizer(opt)
    opt_state = optimizer.init(feature_params(model))
    step = trainer.make_feature_train_step(
        settings, optimizer, topk=4, loss_space="gram")

    @jax.jit
    def multi(model, opt_state, view, proj, campos, bg, table, seg):
        def body(carry, _):
            m, os_ = carry
            m, os_, met = step(m, os_, view, proj, campos, bg, table, seg,
                               layer_idx=0)
            return (m, os_), met["loss"]
        (m, os_), ls = jax.lax.scan(body, (model, opt_state), None, length=8)
        return m, os_, ls

    t0 = time.time()
    m2, os2, ls = multi(model, opt_state, view, proj, campos, bg, table, seg)
    _ = float(ls[-1])
    log(f"step scan compile+first: {time.time() - t0:.1f}s "
        f"losses {np.asarray(ls)[:3]}")
    t0 = time.time()
    m2, os2, ls = multi(model, opt_state, view, proj, campos, bg, table, seg)
    _ = float(ls[-1])
    t_step = (time.time() - t0) / 8 * 1000
    log(f"{'FULL STEP (scan)':40s} {'':14s}  {t_step:8.2f} ms "
        f"= {1000 / t_step:.2f} it/s")

    log("--- deltas ---")
    log(f"gram loss fwd        : {t_fl - t_fwd:7.2f} ms")
    log(f"backward (replay+red): {t_fb - t_fl:7.2f} ms")
    log(f"weights+adam+misc    : {t_step - t_fb:7.2f} ms")


if __name__ == "__main__":
    main()
