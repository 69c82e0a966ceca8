#!/usr/bin/env python
"""Feature-phase training throughput on the real TPU.

Measures the gram-space cosine step (train/trainer.py) at the reference
fork's config scale (540x960, 300k gaussians, L=1 K=64 topk=4, its 3090 Ti
logged ~11.4 it/s) two ways:

1. `scan`: K steps chained inside ONE jit via lax.scan — pure device
   throughput, no tunnel RTT (the honest number).
2. `chain`: K dependent host dispatches — includes per-dispatch tunnel
   overhead (what a naive loop pays on axon).
"""
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
    import os
    budget = int(os.environ.get("LSV2_BUDGET", 2 ** 21))
    # A/B knobs: LSV2_LIVE (live-prefix clamp; the trainer sizes this
    # adaptively, here set it to the scene's measured live total rounded
    # up), LSV2_TILE_BUDGET/_CAP/_SUBDIV (budget-capped training mode).
    settings = make_settings(
        cam, 0, 1.0, budget, 2048, 16,
        live_entries=int(os.environ.get("LSV2_LIVE", "0")),
        tile_budget=float(os.environ.get("LSV2_TILE_BUDGET", "0")),
        tile_budget_cap=int(os.environ.get("LSV2_TILE_CAP", "128")),
        tile_budget_subdiv=int(os.environ.get("LSV2_TILE_SUBDIV", "2")))
    ca = float(os.environ.get("LSV2_CULL_ALPHA", "0"))
    if ca > 0:
        settings = settings._replace(cull_alpha=ca)

    table = jnp.asarray(rng.normal(size=(nseg, 512)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, nseg, (h, w)).astype(np.int32))

    opt = types.SimpleNamespace(language_feature_lr=0.0025)
    optimizer = trainer.make_feature_optimizer(opt)
    opt_state = optimizer.init(trainer.feature_params(model))
    step = trainer.make_feature_train_step(
        settings, optimizer, topk=4, loss_space="gram")

    # --- stage dissection --------------------------------------------------
    import jax.numpy as jnp2
    from langsplatv2_tpu.models.renderer import render
    from langsplatv2_tpu.train.trainer import (feature_params, gram_cos_loss)

    def timeit(name, fn, *a, reps=5):
        out = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.time()
        o = None
        for _i in range(reps):
            del o
            o = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
        log(f"{name:32s} {(time.time() - t0) / reps * 1000:8.1f} ms")
        return out

    fwd = jax.jit(lambda m: render(settings, m, view, proj, campos, bg,
                                   include_feature=True, topk=4))
    out0 = timeit("forward render (quick repr)", fwd, model)
    wmap = out0.language_feature_weight_map

    lossfn = jax.jit(lambda wm: gram_cos_loss(
        model.codebooks, wm, table, seg, 0))
    timeit("gram loss fwd", lossfn, wmap)

    def fwd_loss(m):
        o = render(settings, m, view, proj, campos, bg,
                   include_feature=True, topk=4)
        return gram_cos_loss(m.codebooks, o.language_feature_weight_map,
                             table, seg, 0)

    vg = jax.jit(lambda m: jax.value_and_grad(
        lambda p: fwd_loss(m.replace(**p)))(feature_params(m)))
    timeit("fwd+bwd (value_and_grad)", vg, model)

    # --- single dispatch (compile + warm) ---------------------------------
    t0 = time.time()
    m1, os1, met = step(model, opt_state, view, proj, campos, bg, table, seg,
                        layer_idx=0)
    l0 = float(met["loss"])
    log(f"compile+first step: {time.time() - t0:.1f}s loss={l0:.4f}")

    # --- dependent host chain ---------------------------------------------
    k = 10
    m, os_ = m1, os1
    t0 = time.time()
    for _ in range(k):
        m, os_, met = step(m, os_, view, proj, campos, bg, table, seg,
                           layer_idx=0)
    _ = float(met["loss"])
    dt = (time.time() - t0) / k
    log(f"chain: {dt * 1000:.1f} ms/step = {1 / dt:.2f} it/s (incl. tunnel)")

    # --- camera-batched step (LSV2_CAM_BATCH > 1) --------------------------
    # cam_batch=B runs B cameras in ONE jitted step with the top-k weights
    # pass and Adam amortized over the group (trainer.
    # make_feature_train_step_batched); per-iteration cost = step time / B.
    cam_batch = int(os.environ.get("LSV2_CAM_BATCH", "0"))
    if cam_batch > 1:
        bstep = trainer.make_feature_train_step_batched(
            settings, optimizer, topk=4, loss_space="gram")
        views_b = jnp.broadcast_to(view, (cam_batch, 4, 4))
        projs_b = jnp.broadcast_to(proj, (cam_batch, 4, 4))
        camposs_b = jnp.broadcast_to(campos, (cam_batch, 3))
        tables_b = jnp.broadcast_to(table, (cam_batch,) + table.shape)
        segs_b = jnp.broadcast_to(seg, (cam_batch,) + seg.shape)
        do_update = jnp.asarray(True)
        t0 = time.time()
        mb, osb, metb = bstep(model, opt_state, views_b, projs_b, camposs_b,
                              bg, tables_b, segs_b, do_update, layer_idx=0)
        _ = float(metb["loss"])
        log(f"batched(B={cam_batch}) compile+first: {time.time() - t0:.1f}s")
        kb = 6
        mb, osb = model, opt_state
        t0 = time.time()
        for _ in range(kb):
            mb, osb, metb = bstep(mb, osb, views_b, projs_b, camposs_b,
                                  bg, tables_b, segs_b, do_update,
                                  layer_idx=0)
        _ = float(metb["loss"])
        dt = (time.time() - t0) / (kb * cam_batch)
        log(f"batched chain: {dt * 1000:.1f} ms/iter = {1 / dt:.2f} it/s "
            f"(incl. tunnel, /{cam_batch})")

    # --- scan inside one jit ----------------------------------------------
    kscan = 8

    @jax.jit
    def multi(model, opt_state, view, proj, campos, bg, table, seg):
        def body(carry, _):
            m, os_ = carry
            m, os_, met = step(
                m, os_, view, proj, campos, bg, table, seg, layer_idx=0)
            return (m, os_), met["loss"]

        (m, os_), ls = jax.lax.scan(body, (model, opt_state), None,
                                    length=kscan)
        return m, os_, ls

    t0 = time.time()
    m2, os2, ls = multi(model, opt_state, view, proj, campos, bg, table, seg)
    _ = float(ls[-1])
    log(f"scan compile+first: {time.time() - t0:.1f}s "
        f"losses {np.asarray(ls)[:3]}...")
    t0 = time.time()
    m2, os2, ls = multi(model, opt_state, view, proj, campos, bg, table, seg)
    _ = float(ls[-1])
    dt = (time.time() - t0) / kscan
    log(f"scan: {dt * 1000:.1f} ms/step = {1 / dt:.2f} it/s (device)")


if __name__ == "__main__":
    main()
