#!/usr/bin/env python
"""Sub-stage attribution of the CAPPED feature-train step (on-device scans).

profile_train_capped.py brackets the step into fwd / loss / bwd / update;
this probes the individual stages inside those brackets so kernel work can
be aimed at the measured-biggest one. Each probe is its own jitted scan
over K=8 iterations with an epsilon jitter (constant-folding guard).
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
    from langsplatv2_tpu.models.renderer import make_settings
    from langsplatv2_tpu.ops import pallas_binning, pallas_blend, projection
    from langsplatv2_tpu.ops.rasterize import (
        _capped_quick_binning, _capped_kept_from_rows)
    from langsplatv2_tpu.train import trainer
    from langsplatv2_tpu.train.trainer import (
        feature_params, gram_cos_loss_tiles)
    from langsplatv2_tpu.utils import sparse_codes
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
    projm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    campos = jnp.zeros(3, jnp.float32)
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
    gx, gy = settings.grid_x, settings.grid_y
    num_tiles = gx * gy
    cap = settings.tile_budget_cap

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

    # --- per-stage inputs (one real forward's intermediates) ---------------
    qw0, qi0 = model.get_weights_and_indices(4)
    proj0 = projection.preprocess(
        model.xyz, jnp.exp(model.scaling), model.rotation, None, None,
        jnp.zeros((n, 3), jnp.float32), view, projm, campos, settings.tanfovx, settings.tanfovy,
        w, h, 0, 1.0, opacities=jax.nn.sigmoid(model.opacity[:, 0]))
    ops_act = jax.nn.sigmoid(model.opacity)
    g2, dense_start, raw_counts, total = _capped_quick_binning(
        settings, proj0, ops_act, False)
    rows0 = pallas_blend.pack_quick_train_rows(
        proj0.xy, proj0.conic, ops_act[:, 0], proj0.rgb, qw0, qi0)
    rows_cap0 = rows0[g2]
    kept0, sat0, live0 = _capped_kept_from_rows(
        settings, rows_cap0, raw_counts, "f32")
    log(f"live entries {int(jnp.sum(raw_counts))}, kept {int(jnp.sum(kept0))},"
        f" T*cap {num_tiles * cap}")

    # 1. weights pass
    def weights(logits, e):
        qw, qi = sparse_codes.get_weights_and_indices(logits + e, 4)
        return jnp.sum(qw[::977]) + jnp.sum(qi[::977])
    scan_time("get_weights_and_indices [300k,64]", weights,
              model.language_logits[:, :64])

    # 1b. weights pass fwd+bwd (as the step differentiates it)
    def weights_vg(logits, e):
        def f(lg):
            qw, _qi = sparse_codes.get_weights_and_indices(lg, 4)
            return jnp.sum(qw * qw)
        v, g = jax.value_and_grad(f)(logits + e)
        return v + jnp.sum(g[::977])
    scan_time("weights pass fwd+bwd", weights_vg,
              model.language_logits[:, :64])

    # 2. preprocess
    def prep(means, e):
        p = projection.preprocess(
            means + e, jnp.exp(model.scaling), model.rotation, None, None,
            jnp.zeros((n, 3), jnp.float32), view, projm, campos, settings.tanfovx,
            settings.tanfovy, w, h, 0, 1.0,
            opacities=jax.nn.sigmoid(model.opacity[:, 0]))
        return jnp.sum(p.xy[::977]) + jnp.sum(p.conic[::977])
    scan_time("preprocess 300k", prep, model.xyz)

    # 3. expand + sort + slice (capped binning, minus the row work)
    def binning(xy, e):
        p = proj0._replace(xy=xy + e)
        g2_, _ds, rc, _tot = _capped_quick_binning(
            settings, p, ops_act, False)
        return jnp.sum(g2_[::977].astype(jnp.float32)) + jnp.sum(
            rc[::37].astype(jnp.float32))
    scan_time("capped binning (expand+sort+slice)", binning, proj0.xy)

    # 4. row pack + gather
    def rowgather(qw, e):
        rows = pallas_blend.pack_quick_train_rows(
            proj0.xy, proj0.conic, ops_act[:, 0], proj0.rgb, qw + e, qi0)
        rc = rows[g2]
        return jnp.sum(rc[::977, :2])
    scan_time("pack rows + [T*cap] gather", rowgather, qw0)

    # 5. budget from rows
    def budg(rows_cap, e):
        kept, sat, live = _capped_kept_from_rows(
            settings, rows_cap + e, raw_counts, "f32")
        return jnp.sum(kept[::7].astype(jnp.float32))
    scan_time("budget_from_rows", budg, rows_cap0)

    # 6. blend (f32pack quick, chunk=cap)
    entry_geom0 = pallas_blend.to_field_major(rows_cap0, cap)
    entry_feat0 = jnp.zeros((1, entry_geom0.shape[1]), jnp.float32)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    bgv = jnp.zeros(3, jnp.float32)

    def blend(entry_geom, e):
        rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
            entry_geom + e, entry_feat0, dense_start, kept0, tile_ids, bgv,
            grid_x=gx, grid_y=gy, mode="quick", out_channels=64, topk=4,
            chunk=cap, rowfmt="f32pack", interpret=False)
        return jnp.sum(feat_t[::37, ::29, :2])
    scan_time("blend (quick f32pack, chunk=cap)", blend, entry_geom0)

    # 7. gram loss fwd + bwd on real-shaped wmap tiles
    wmap0 = jnp.asarray(
        rng.normal(size=(num_tiles, 256, 64)).astype(np.float32))

    def gram_fwd(wmap, e):
        return gram_cos_loss_tiles(model.codebooks, wmap + e, table, seg, 0)
    scan_time("gram loss fwd", gram_fwd, wmap0)

    def gram_vg(wmap, e):
        def f(args):
            cb, wm = args
            return gram_cos_loss_tiles(cb, wm, table, seg, 0)
        v, (gcb, gwm) = jax.value_and_grad(f)((model.codebooks, wmap + e))
        return v + jnp.sum(gwm[::37, ::29, :2]) + jnp.sum(gcb[:, ::7, ::5])
    scan_time("gram loss fwd+bwd", gram_vg, wmap0)

    # 7b. gram-loss lookup chunk A/B (lax.map step-count vs VMEM pressure)
    for ch in (8192, 16384, 32768):
        def gram_vg_c(wmap, e, ch=ch):
            def f(args):
                cb, wm = args
                return gram_cos_loss_tiles(cb, wm, table, seg, 0, chunk=ch)
            v, (gcb, gwm) = jax.value_and_grad(f)(
                (model.codebooks, wmap + e))
            return v + jnp.sum(gwm[::37, ::29, :2]) + jnp.sum(gcb[:, ::7, ::5])
        scan_time(f"gram loss fwd+bwd chunk={ch}", gram_vg_c, wmap0)

    # 8. replay backward (fused topk kernel) at capped shapes
    from langsplatv2_tpu.ops import pallas_train
    g_tiles0 = jnp.asarray(
        rng.normal(size=(num_tiles, 256, 64)).astype(np.float32))

    def replay(entry_geom, kept, e):
        d = pallas_train.feature_grads_topk_pallas(
            entry_geom, kept, tile_ids, g_tiles0 + e,
            grid_x=gx, grid_y=gy, feat_k=64, topk=4, cap=cap)
        return jnp.sum(d[:2, ::977])
    scan_time("FUSED replay+project kernel", replay, entry_geom0, kept0)

    # 8b. old dense replay kernel for comparison
    def replay_old(entry_geom, kept, e):
        d = pallas_train.feature_grads_pallas(
            entry_geom, dense_start, kept, tile_ids, g_tiles0 + e,
            grid_x=gx, grid_y=gy, feat_k=64, chunk=cap)
        return jnp.sum(d[::977, :2])
    scan_time("old dense replay kernel", replay_old, entry_geom0, kept0)

    # 9. reduction: transpose + pad + scatter w64
    e_tot = num_tiles * cap
    dproj0 = jnp.asarray(
        rng.normal(size=(8, e_tot)).astype(np.float32))

    def reduce_(dproj, e):
        dcols = jnp.pad((dproj + e).T, ((0, 0), (0, 56)))
        d_qw = jnp.zeros((n, 64), jnp.float32).at[g2].add(dcols)[:, :4]
        return jnp.sum(d_qw[::977])
    scan_time("reduction transpose+pad+scatter", reduce_, dproj0)

    # 10. Adam update (feature groups)
    opt = types.SimpleNamespace(language_feature_lr=0.0025)
    optimizer = trainer.make_feature_optimizer(opt)
    params0 = feature_params(model)
    opt_state0 = optimizer.init(params0)
    grads0 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape).astype(np.float32)),
        params0)

    def adam(params, opt_state, grads, e):
        g2_ = jax.tree_util.tree_map(lambda a: a + e, grads)
        newp, news = optimizer.update(g2_, opt_state, params)
        return jnp.sum(newp["language_logits"][::977, :2])
    scan_time("Adam update (logits+codebooks)", adam, params0, opt_state0,
              grads0)


if __name__ == "__main__":
    main()
