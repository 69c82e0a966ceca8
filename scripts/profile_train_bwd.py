#!/usr/bin/env python
"""Backward-pass attribution for the feature train step (on-device scan
loops). The round-2 profile attributed the forward (~62 ms) but left the
backward+update (~115 ms) unexplained; this times each backward component
standalone on residual-shaped arrays so the sum can be compared against
the measured fwd+bwd delta."""
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
    from jax import lax
    from langsplatv2_tpu.models import gaussians as gm
    from langsplatv2_tpu.models.renderer import make_settings, render
    from langsplatv2_tpu.ops import pallas_train
    from langsplatv2_tpu.train import trainer
    from langsplatv2_tpu.train.trainer import feature_params, gram_cos_loss_tiles
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)

    log("devices:", jax.devices())
    n, h, w = 300_000, 544, 960
    nseg = 512
    K = 8
    budget = 2 ** 21

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
    bg = jnp.zeros(3, jnp.float32)
    cam = types.SimpleNamespace(
        image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
        tanfovy=math.tan(fovy / 2))
    settings = make_settings(cam, 0, 1.0, budget, 2048, 16)
    gx, gy = settings.grid_x, settings.grid_y
    num_tiles = gx * gy

    table = jnp.asarray(rng.normal(size=(nseg, 512)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, nseg, (h, w)).astype(np.int32))
    eps = jnp.asarray(np.linspace(0, 1e-6, K, dtype=np.float32))

    def scan_time(name, fn, *args):
        """fn(*args, e) -> scalar; timed K times inside one jit."""
        @jax.jit
        def scanned(eps, *args):
            def body(c, e):
                return c + fn(*args, e), 0.0
            c, _ = lax.scan(body, 0.0, eps)
            return c

        t0 = time.time()
        c = scanned(eps, *args)
        _ = float(c)
        ct = time.time() - t0
        t0 = time.time()
        c = scanned(eps, *args)
        _ = float(c)
        dt = (time.time() - t0) / K * 1000
        log(f"{name:36s} compile {ct:5.1f}s  {dt:8.1f} ms")
        return dt

    # Residual-shaped arrays from one real forward.
    sett_tiles = settings._replace(assemble=False)
    out = render(sett_tiles, model, view, projm, campos, bg,
                 include_feature=True, topk=4)
    wmap_t = jax.block_until_ready(out.language_feature_weight_map)
    t_tiles = wmap_t.shape[0]
    e_pad = -(-budget // 128) * 128 + 256 + 128
    entry_geom = jnp.asarray(
        rng.normal(size=(16, e_pad)).astype(np.float32))
    g_sorted = jnp.asarray(
        rng.integers(0, n, budget).astype(np.int32))
    # Realistic segment structure: ~1.6M live entries over 2040 tiles.
    counts = rng.multinomial(1_600_000, np.ones(num_tiles) / num_tiles)
    tile_start = jnp.asarray(
        (np.cumsum(counts) - counts).astype(np.int32))
    tile_count = jnp.asarray(counts.astype(np.int32))
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    g_tiles = jnp.asarray(
        rng.normal(size=(num_tiles, 256, 64)).astype(np.float32))
    dfeat = jnp.asarray(
        rng.normal(size=(e_pad, 128)).astype(np.float32))
    qi = jnp.asarray(rng.integers(0, 64, (n, 4)).astype(np.float32))

    # 1. W-replay backward kernel
    def replay(entry_geom, tile_start, tile_count, tile_ids, g_tiles, e):
        d = pallas_train.feature_grads_pallas(
            entry_geom, tile_start, tile_count, tile_ids,
            g_tiles + e, grid_x=gx, grid_y=gy, feat_k=64)
        return jnp.sum(d[::977, :2])

    scan_time("replay kernel (W-replay)", replay, entry_geom, tile_start,
              tile_count, tile_ids, g_tiles)

    # 2. per-gaussian scatter-add [E,64] -> [N,64]
    def scatter(dfeat, g_sorted, e):
        d = jnp.zeros((n, 64), jnp.float32).at[g_sorted].add(
            dfeat[:budget, :64] + e)
        return jnp.sum(d[::977, :2])

    scan_time("scatter-add E->N (w64)", scatter, dfeat, g_sorted)

    # 3. top-k slice back (compare+einsum)
    def slice_back(dfeat, qi, e):
        d_dense = dfeat[:n, :64] + e
        ch = jnp.arange(64, dtype=jnp.int32)
        onehot = (qi.astype(jnp.int32)[:, :, None]
                  == ch[None, None, :]).astype(jnp.float32)
        d_qw = jnp.einsum("nc,njc->nj", d_dense, onehot,
                          precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(d_qw[::977])

    scan_time("d_qw one-hot einsum", slice_back, dfeat, qi)

    # 4. gram loss fwd+bwd on the tile map
    def gram_vjp(wmap_t, table, seg, e):
        def f(wm):
            return gram_cos_loss_tiles(model.codebooks, wm, table, seg, 0)
        val, gr = jax.value_and_grad(f)(wmap_t + e)
        return val + jnp.sum(gr[::977, 0, 0])

    scan_time("gram loss fwd+bwd", gram_vjp, wmap_t, table, seg)

    # 5. weights computation fwd+bwd + adam-sized update
    opt = types.SimpleNamespace(language_feature_lr=0.0025)
    optimizer = trainer.make_feature_optimizer(opt)
    opt_state = optimizer.init(feature_params(model))

    def weights_bwd(model, opt_state, e):
        def f(p):
            m = model.replace(**p)
            qw, qidx = m.get_weights_and_indices(4)
            return jnp.sum(qw * (1.0 + e)) + jnp.sum(m.codebooks ** 2)
        val, gr = jax.value_and_grad(f)(feature_params(model))
        newp, _ = optimizer.update(gr, opt_state, feature_params(model))
        return val + jnp.sum(newp["language_logits"][::977, 0])

    scan_time("weights fwd+bwd + adam", weights_bwd, model, opt_state)

    # Reference totals
    step = trainer.make_feature_train_step(
        settings._replace(assemble=False), optimizer, topk=4,
        loss_space="gram")

    def full(model, opt_state, e):
        m, os_, met = step.__wrapped__(
            model, opt_state, view.at[3, 0].add(e), projm, campos, bg,
            table, seg, layer_idx=0)
        return met["loss"] + jnp.sum(m.language_logits[::977, 0])

    scan_time("FULL train step", full, model, opt_state)

    def fwd_only(model, e):
        o = render(sett_tiles, model, view.at[3, 0].add(e), projm, campos,
                   bg, include_feature=True, topk=4)
        return jnp.sum(o.language_feature_weight_map[::977, 0, 0])

    scan_time("forward render only", fwd_only, model)


if __name__ == "__main__":
    main()
