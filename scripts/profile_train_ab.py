#!/usr/bin/env python
"""Same-session FULL-STEP A/Bs for the capped feature train step.

Standalone stage probes overstate (no cross-stage fusion), so config
levers are judged here by the only trustworthy number: the on-device scan
time of the COMPLETE step, all variants in one process/window.

Variants (each a (name, settings-transform) pair):
  base       : shipped config (budget 2^21, tile_budget 1e-6, cap 128)
  budget1M   : max_entries 2^20 — live is ~630k at this scene, so the
               expansion/sort carry far fewer dead slots
  budget768k : max_entries 786432 — tighter still (overflow telemetry
               must stay clean: live_total < budget)
  cull32     : cull_alpha 1/32 (the serving-mode expansion cut, opt-in
               approximate)
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
    from langsplatv2_tpu.models import gaussians as gm
    from langsplatv2_tpu.models.renderer import make_settings
    from langsplatv2_tpu.train import trainer
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

    table = jnp.asarray(rng.normal(size=(nseg, 512)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, nseg, (h, w)).astype(np.int32))
    opt = types.SimpleNamespace(language_feature_lr=0.0025)
    optimizer = trainer.make_feature_optimizer(opt)

    def base_settings(budget):
        return make_settings(
            cam, 0, 1.0, budget, 2048, 16,
            tile_budget=1e-6, tile_budget_cap=128, tile_budget_subdiv=2)

    variants = [
        ("base  (budget 2^21)", base_settings(2 ** 21), None),
        ("budget 2^20", base_settings(2 ** 20), None),
        ("budget 768k", base_settings(786432), None),
        ("768k + XLA gram", base_settings(786432), "1"),
        ("cull 1/32", base_settings(2 ** 21)._replace(cull_alpha=1 / 32),
         None),
    ]

    for name, settings, xla_gram in variants:
        if xla_gram is None:
            os.environ.pop("LSV2_XLA_GRAM", None)
        else:
            os.environ["LSV2_XLA_GRAM"] = xla_gram
        step = trainer.make_feature_train_step(
            settings, optimizer, topk=4, loss_space="gram")
        opt_state = optimizer.init(trainer.feature_params(model))

        @jax.jit
        def multi(model, opt_state, view, proj, campos, bg, table, seg):
            def body(carry, _):
                m, os_ = carry
                m, os_, met = step(m, os_, view, proj, campos, bg, table,
                                   seg, layer_idx=0)
                return (m, os_), (met["loss"], met["live_total"])
            (m, os_), ls = jax.lax.scan(body, (model, opt_state), None,
                                        length=8)
            return m, os_, ls

        t0 = time.time()
        m2, os2, (ls, lt) = multi(model, opt_state, view, proj, campos, bg,
                                  table, seg)
        _ = float(ls[-1])
        ct = time.time() - t0
        t0 = time.time()
        m2, os2, (ls, lt) = multi(model, opt_state, view, proj, campos, bg,
                                  table, seg)
        _ = float(ls[-1])
        dt = (time.time() - t0) / 8 * 1000
        log(f"{name:22s} compile {ct:6.1f}s  {dt:7.2f} ms = "
            f"{1000 / dt:6.2f} it/s  loss[0]={float(ls[0]):.5f} "
            f"live={int(lt[0])}")


if __name__ == "__main__":
    main()
