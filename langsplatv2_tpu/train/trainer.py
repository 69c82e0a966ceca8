"""Jitted training steps + host-side training loops.

Parity target: reference `train.py` — phase A (RGB 3DGS with densify/prune,
loss (1-l)L1 + l(1-SSIM)) and phase C (language features on frozen geometry,
cosine and/or L1 on masked CLIP maps with the layer curriculum). The hot
step is one jit-compiled function per camera geometry; densification is a
separately-jitted rare path; everything dynamic (camera choice, logging,
checkpoints) stays on host.
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as gm
from ..models.gaussians import GaussianModel
from ..models.renderer import make_settings, render
from ..utils import losses
from ..utils.schedules import expon_lr_func
from .optimizers import GroupedOptimizer, adam_group, zero_moment_rows, zero_group_moments

RGB_PARAM_NAMES = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")
FEATURE_PARAM_NAMES = ("language_logits", "codebooks")


def rgb_params(model: GaussianModel) -> dict:
    return {k: getattr(model, k) for k in RGB_PARAM_NAMES}


def feature_params(model: GaussianModel) -> dict:
    return {k: getattr(model, k) for k in FEATURE_PARAM_NAMES}


def make_rgb_optimizer(opt, spatial_lr_scale: float,
                       accum_iter: int = 1) -> GroupedOptimizer:
    """Six param groups with the reference LRs (gaussian_model.py:244-257).

    `accum_iter` keys the xyz LR schedule to the TRUE iteration when
    gradient accumulation makes optimizer steps rarer than iterations
    (reference update_learning_rate(iteration), train.py:131)."""
    xyz_schedule = expon_lr_func(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    return GroupedOptimizer({
        "xyz": adam_group(xyz_schedule, every=accum_iter),
        "features_dc": adam_group(opt.feature_lr),
        "features_rest": adam_group(opt.feature_lr / 20.0),
        "opacity": adam_group(opt.opacity_lr),
        "scaling": adam_group(opt.scaling_lr),
        "rotation": adam_group(opt.rotation_lr),
    })


def make_feature_optimizer(opt) -> GroupedOptimizer:
    """One LR for logits + codebooks (gaussian_model.py:234-238)."""
    return GroupedOptimizer({
        "language_logits": adam_group(opt.language_feature_lr),
        "codebooks": adam_group(opt.language_feature_lr),
    })


# ---------------------------------------------------------------------------
# RGB phase
# ---------------------------------------------------------------------------

def make_rgb_train_step(settings, optimizer: GroupedOptimizer, lambda_dssim: float,
                        accum_iter: int = 1):
    """Returns jitted (model, opt_state, cam_arrays, gt_image) -> (model,
    opt_state, metrics). cam_arrays = (view, proj, campos, bg).

    With accum_iter > 1 the signature gains a gradient-accumulation carry and
    a traced `do_update` flag (reference train.py:261 steps the optimizer
    only when iteration % accum_iter == 0; torch sums .grad between steps,
    including the viewspace grads the densify stats read)."""
    if accum_iter > 1:
        return _make_rgb_train_step_accum(settings, optimizer, lambda_dssim)

    @jax.jit
    def step(model: GaussianModel, opt_state, view, proj, campos, bg, gt_image):
        params = rgb_params(model)
        dummy = jnp.zeros((model.capacity, 2), jnp.float32)

        def loss_fn(params, dummy):
            m = model.replace(**params)
            out = render(settings, m, view, proj, campos, bg, means2d_dummy=dummy)
            l1 = losses.l1_loss(out.render, gt_image)
            loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (
                1.0 - losses.ssim(out.render, gt_image)
            )
            return loss, (out, l1)

        (loss, (out, l1)), (grads, dummy_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, dummy)

        # Dead (padding) rows must never move: their forward contribution is
        # masked to zero, but masked-out branches can still leak NaN
        # cotangents through jnp.where — hard-zero them.
        live = model.live
        grads = {k: jnp.where(live.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0)
                 for k, g in grads.items()}
        new_params, opt_state = optimizer.update(grads, opt_state, params)
        model = model.replace(**new_params)

        # Densification statistics (train.py:249-252): track max screen radius
        # and accumulate viewspace positional gradient norms for visible
        # gaussians. Cheap, so fused into every step; the caller decides when
        # to act on them.
        vis = out.visibility_filter
        model = model.replace(
            max_radii2d=jnp.where(
                vis, jnp.maximum(model.max_radii2d, out.radii.astype(jnp.float32)),
                model.max_radii2d,
            ),
            xyz_gradient_accum=model.xyz_gradient_accum + jnp.where(
                vis[:, None],
                jnp.linalg.norm(dummy_grad[:, :2], axis=-1, keepdims=True), 0.0),
            denom=model.denom + jnp.where(vis[:, None], 1.0, 0.0),
        )
        metrics = {
            "loss": loss, "l1": l1,
            "num_visible": vis.sum(),
            "max_tile_count": out.max_tile_count,
            "total_entries": out.total_entries,
        }
        return model, opt_state, metrics

    return step


def _make_rgb_train_step_accum(settings, optimizer: GroupedOptimizer,
                               lambda_dssim: float):
    """RGB step with torch-style gradient accumulation: grads (including the
    means2D carrier the densification stats read) SUM across iterations and
    the optimizer applies the running sum when `do_update` is set
    (reference train.py:261 + torch .grad accumulation semantics)."""

    @jax.jit
    def step(model: GaussianModel, opt_state, accum, view, proj, campos, bg,
             gt_image, do_update):
        params = rgb_params(model)
        dummy = jnp.zeros((model.capacity, 2), jnp.float32)

        def loss_fn(params, dummy):
            m = model.replace(**params)
            out = render(settings, m, view, proj, campos, bg, means2d_dummy=dummy)
            l1 = losses.l1_loss(out.render, gt_image)
            loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (
                1.0 - losses.ssim(out.render, gt_image)
            )
            return loss, (out, l1)

        (loss, (out, l1)), (grads, dummy_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, dummy)

        live = model.live
        grads = {k: jnp.where(live.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0)
                 for k, g in grads.items()}
        grads = jax.tree_util.tree_map(jnp.add, accum["grads"], grads)
        means2d_sum = accum["means2d"] + dummy_grad

        def apply_update(_):
            new_params, new_opt = optimizer.update(grads, opt_state, params)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, grads)
            return new_params, new_opt, zeros, jnp.zeros_like(means2d_sum)

        def keep_accumulating(_):
            return params, opt_state, grads, means2d_sum

        new_params, opt_state_out, grads_out, means2d_out = jax.lax.cond(
            do_update, apply_update, keep_accumulating, None)
        model = model.replace(**new_params)

        # Densification stats read the RUNNING viewspace grad sum, exactly
        # like the reference reads .grad before zero_grad (train.py:249-263).
        vis = out.visibility_filter
        model = model.replace(
            max_radii2d=jnp.where(
                vis, jnp.maximum(model.max_radii2d, out.radii.astype(jnp.float32)),
                model.max_radii2d,
            ),
            xyz_gradient_accum=model.xyz_gradient_accum + jnp.where(
                vis[:, None],
                jnp.linalg.norm(means2d_sum[:, :2], axis=-1, keepdims=True), 0.0),
            denom=model.denom + jnp.where(vis[:, None], 1.0, 0.0),
        )
        metrics = {
            "loss": loss, "l1": l1,
            "num_visible": vis.sum(),
            "max_tile_count": out.max_tile_count,
            "total_entries": out.total_entries,
        }
        accum_out = {"grads": grads_out, "means2d": means2d_out}
        return model, opt_state_out, accum_out, metrics

    return step


def init_rgb_accum(model: GaussianModel):
    return {
        "grads": jax.tree_util.tree_map(jnp.zeros_like, rgb_params(model)),
        "means2d": jnp.zeros((model.capacity, 2), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Language-feature phase
# ---------------------------------------------------------------------------

def gram_cos_loss(codebooks, weight_map, gt_table, seg_map, layer_idx,
                  eps: float = 1e-8, chunk: int = 4096):
    """The reference feature loss cos_loss(feat*mask, gt*mask)
    (train.py:160-167 + loss_utils.py:24) computed WITHOUT materializing
    either 512-d pixel map.

    With feat_p = sum_i C_i^T w_ip and gt_p = table[seg_p]:

        sim_p = (sum_i w_ip . phi_i[seg_p]) / (max(|feat_p|, eps) * max(|gt_p|, eps))
        |feat_p|^2 = sum_ij w_ip^T (C_i C_j^T) w_jp

    so one [S, (l+1)K + 1] per-segment right-hand side (phi_i = table @ C_i^T
    plus the gt norms) and the KxK Gram matrices carry the whole loss in
    K-dim space. The per-pixel segment lookup is a chunked one-hot MXU
    matmul (exact selection at HIGHEST; XLA gathers are row-rate-bound and
    scatter/bincount into small targets is pathological on TPU). The
    training step then uploads only the compact GT (table + seg map, ~2.6MB
    at 540x960) instead of the decoded [512, H, W] map (~1GB) — removing
    the host->device transfer that dominated the feature-phase step.

    Residual-curriculum gradients match the reference exactly: layers < l
    enter by value with stop_grad (train.py:155-156, gaussian_model.py:533-543
    detach), layer l trains through both its weights and its codebook.
    Masked pixels (seg == -1) match an all-zero one-hot row: sim 0, like the
    reference's cos of two zero vectors under the eps clamp.
    """
    L, K, D = codebooks.shape
    lay = int(layer_idx)
    H, W = seg_map.shape
    hw = H * W
    w = weight_map.reshape(L, K, hw)
    return _gram_cos_core(codebooks, w, seg_map.reshape(-1), hw, lay,
                          eps=eps, chunk=chunk, gt_table=gt_table)


def gram_cos_loss_tiles(codebooks, wmap_tiles, gt_table, seg_map, layer_idx,
                        eps: float = 1e-8, chunk: int = 4096):
    """gram_cos_loss on TILE-layout weight maps ([T, P, L*K], the
    assemble=False rasterizer output): the [L*K, H, W] image scatter is
    skipped entirely — the seg map is tiled instead (a [H, W] int reshuffle,
    ~400x smaller). Identical value/gradients to the image-layout loss."""
    from ..ops.projection import BLOCK

    L, K, D = codebooks.shape
    lay = int(layer_idx)
    H, W = seg_map.shape
    t, p, _ = wmap_tiles.shape
    grid_x, grid_y = -(-W // BLOCK), -(-H // BLOCK)
    seg_p = jnp.pad(seg_map, ((0, grid_y * BLOCK - H),
                              (0, grid_x * BLOCK - W)), constant_values=-1)
    seg_t = seg_p.reshape(grid_y, BLOCK, grid_x, BLOCK).transpose(
        0, 2, 1, 3).reshape(t * p)
    w = wmap_tiles.reshape(t * p, L, K).transpose(1, 2, 0)   # [L, K, Q]
    # Padding pixels carry seg -1: zero one-hot row -> sim 0, so dividing
    # by the true H*W reproduces the image-layout mean exactly.
    return _gram_cos_core(codebooks, w, seg_t, H * W, lay, eps=eps,
                          chunk=chunk, gt_table=gt_table)


def _gram_cos_core(codebooks, w, seg_flat, hw, lay, *, eps, chunk, gt_table,
                   reduce: str = "mean"):
    """Shared core: w [L, K, Q] per-pixel coefficients in any pixel order,
    seg_flat [Q] segment ids (-1 = masked/padding), hw = the true pixel
    count the mean divides by (Q >= hw pixels beyond the image must carry
    seg -1: their sim is 0, so the sum is unaffected).

    reduce="mean" returns the loss 1 - sum(sim)/hw; reduce="sum" returns
    the raw sum(sim) so tile-sharded callers can psum partial sums across
    shards before normalizing (the loss is linear in the per-pixel sims)."""
    L, K, D = codebooks.shape
    q = seg_flat.shape[0]
    cbs = [jax.lax.stop_gradient(codebooks[i]) if i < lay else codebooks[i]
           for i in range(lay + 1)]
    ws = [jax.lax.stop_gradient(w[i]) if i < lay else w[i]
          for i in range(lay + 1)]

    s_rows = gt_table.shape[0]
    phis = [gt_table @ jnp.transpose(c) for c in cbs]        # [S, K] each
    gt_n = jnp.linalg.norm(gt_table, axis=1, keepdims=True)  # [S, 1]
    rhs = jnp.concatenate(phis + [gt_n], axis=1)             # [S, (l+1)K+1]

    n_chunks = -(-q // chunk)
    seg_c = jnp.pad(seg_flat, (0, n_chunks * chunk - q),
                    constant_values=-1).reshape(n_chunks, chunk)
    sids = jnp.arange(s_rows, dtype=jnp.int32)[None, :]

    def lookup(seg_chunk):
        onehot = (seg_chunk[:, None] == sids).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [chunk, width]

    looked = jax.lax.map(lookup, seg_c)                      # [nc, chunk, width]
    looked = looked.reshape(n_chunks * chunk, -1)[:q]
    gt_n_pix = looked[:, -1]                                 # [Q]

    num = jnp.zeros((q,), jnp.float32)
    for i in range(lay + 1):
        num = num + jnp.sum(ws[i] * looked[:, i * K:(i + 1) * K].T, axis=0)

    n2 = jnp.zeros((q,), jnp.float32)
    for i in range(lay + 1):
        for j in range(lay + 1):
            gij = cbs[i] @ jnp.transpose(cbs[j])             # [K, K]
            n2 = n2 + jnp.sum(ws[i] * (gij @ ws[j]), axis=0)
    # sqrt has an infinite derivative at 0: pixels no gaussian covers have
    # n2 == 0 exactly, and 0 * inf through the eps-max would poison every
    # gradient with NaN (same guard as losses.safe_norm).
    covered = n2 > 0
    nrm = jnp.where(covered, jnp.sqrt(jnp.where(covered, n2, 1.0)), 0.0)

    sim = num / (jnp.maximum(nrm, eps) * jnp.maximum(gt_n_pix, eps))
    if reduce == "sum":
        return jnp.sum(sim)
    return 1.0 - jnp.sum(sim) / hw


def _tiles_gram_loss_fn():
    """Tile-layout gram loss for the Pallas route: the fused Pallas
    forward+backward (ops/pallas_gram.py — value/grad-parity-tested
    against the XLA core) by default; LSV2_XLA_GRAM=1 selects the XLA
    formulation for A/Bs."""
    import os

    if os.environ.get("LSV2_XLA_GRAM") == "1":
        return gram_cos_loss_tiles
    from ..ops.pallas_gram import gram_loss_fused
    return gram_loss_fused


def make_feature_train_step(
    settings,
    optimizer: GroupedOptimizer,
    topk: int,
    use_cos_loss: bool = True,
    use_l1_loss: bool = False,
    normalize: bool = False,
    accum_iter: int = 1,
    loss_space: str = "pixel",
):
    """Feature-phase step (train.py:146-167): geometry frozen, optimize
    logits + codebooks against the masked 2D CLIP map. `layer_idx` is static
    (the curriculum changes it at most vq_layer_num times per run).

    loss_space selects the GT representation the step consumes:
    - "pixel": (gt_feature [512, H, W], feature_mask [1, H, W]) — the
      reference's literal formulation; required for l1/normalize.
    - "gram": (gt_table [S, 512], seg_map [H, W] int32) — the cosine loss
      in K-dim Gram space (gram_cos_loss), mathematically identical, with
      ~400x less host->device GT traffic per step. Cos-only.

    With accum_iter > 1 the step gains a gradient-accumulation carry dict and
    a traced `do_update` flag (reference train.py:261)."""
    gram = loss_space == "gram"
    if gram:
        assert use_cos_loss and not use_l1_loss and not normalize, \
            "gram loss space implements the cosine loss only"
    # On the Pallas route the weight map stays in tile layout and the gram
    # loss consumes it directly — the [L*K, H, W] image scatter never runs.
    from ..ops.rasterize import _pallas_supported

    tiles_mode = gram and (
        settings.impl == "pallas"
        or (settings.impl == "auto" and _pallas_supported()))
    render_settings = settings._replace(assemble=False) if tiles_mode \
        else settings
    tiles_loss = _tiles_gram_loss_fn()

    def compute_grads(model, view, proj, campos, bg, gt_a, gt_b, layer_idx):
        params = feature_params(model)

        def loss_fn(params):
            m = model.replace(**params)
            out = render(render_settings, m, view, proj, campos, bg,
                         include_feature=True, topk=topk)
            # live_total sizes the live-prefix budget (Pallas route only;
            # -1 elsewhere). Threaded as aux so train_features can grow
            # settings.live_entries when a viewpoint overflows it.
            live = (jnp.asarray(-1, jnp.int32) if out.live_total is None
                    else out.live_total)
            tot = out.total_entries
            if gram:
                lf = tiles_loss if tiles_mode else gram_cos_loss
                loss = lf(
                    m.codebooks, out.language_feature_weight_map,
                    gt_a, gt_b, layer_idx)
                return loss, (jnp.asarray(0.0), live, tot)
            gt_feature, feature_mask = gt_a, gt_b
            feat = m.compute_layer_feature_map(
                out.language_feature_weight_map, layer_idx)
            if normalize:
                feat = feat / (jnp.linalg.norm(feat, axis=0, keepdims=True) + 1e-10)
            mask = feature_mask.astype(feat.dtype)
            loss = 0.0
            l1 = jnp.asarray(0.0)
            if use_cos_loss:
                loss = loss + losses.cos_loss(feat * mask, gt_feature * mask)
            if use_l1_loss:
                l1 = losses.l1_loss(feat * mask, gt_feature * mask)
                loss = loss + l1
            return loss, (l1, live, tot)

        (loss, (l1, live, tot)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # Dead (padding) rows must not drift: their logits get no gradient
        # because opacity is forced to 0, but guard explicitly anyway.
        grads["language_logits"] = jnp.where(
            model.live[:, None], grads["language_logits"], 0.0)
        return params, grads, loss, l1, live, tot

    if accum_iter > 1:
        @partial(jax.jit, static_argnames=("layer_idx",))
        def step_accum(model: GaussianModel, opt_state, accum, view, proj,
                       campos, bg, gt_a, gt_b, do_update,
                       layer_idx: int = 0):
            params, grads, loss, l1, live, tot = compute_grads(
                model, view, proj, campos, bg, gt_a, gt_b, layer_idx)
            grads = jax.tree_util.tree_map(jnp.add, accum, grads)

            def apply_update(_):
                new_params, new_opt = optimizer.update(grads, opt_state, params)
                return new_params, new_opt, jax.tree_util.tree_map(
                    jnp.zeros_like, grads)

            new_params, opt_state_out, accum_out = jax.lax.cond(
                do_update, apply_update,
                lambda _: (params, opt_state, grads), None)
            model = model.replace(**new_params)
            return model, opt_state_out, accum_out, {
                "loss": loss, "l1": l1, "live_total": live,
                "total_entries": tot}

        return step_accum

    @partial(jax.jit, static_argnames=("layer_idx",))
    def step(model: GaussianModel, opt_state, view, proj, campos, bg,
             gt_a, gt_b, layer_idx: int = 0):
        params, grads, loss, l1, live, tot = compute_grads(
            model, view, proj, campos, bg, gt_a, gt_b, layer_idx)
        new_params, opt_state = optimizer.update(grads, opt_state, params)
        model = model.replace(**new_params)
        return model, opt_state, {"loss": loss, "l1": l1, "live_total": live,
                                  "total_entries": tot}

    return step


def make_feature_train_step_batched(
    settings,
    optimizer: GroupedOptimizer,
    topk: int,
    loss_space: str = "gram",
):
    """Camera-batched feature step: B cameras rendered in ONE jit via
    lax.scan, gradients summed, one optimizer update — semantically
    identical to accum_iter=B sequential steps (torch .grad summing,
    reference train.py:261) but with the per-model work amortized:

    - the sparse-code top-k forward (get_weights_and_indices) runs once
      per group (hoisted out of the scan via render's precomputed_quick);
      its backward runs once on the scan-accumulated d(quick_weights);
    - the Adam update runs once per group.

    At production scale those two blocks are ~49 ms of a 162 ms step
    (ROADMAP feature-step attribution), so B=4 models to ~1.3x it/s on
    top of any per-camera render savings. Gram loss space only (the
    shipped cosine-only default)."""
    assert loss_space == "gram", "batched feature step implements gram only"
    from ..ops.rasterize import _pallas_supported

    tiles_mode = (settings.impl == "pallas"
                  or (settings.impl == "auto" and _pallas_supported()))
    render_settings = settings._replace(assemble=False) if tiles_mode \
        else settings
    tiles_loss = _tiles_gram_loss_fn()

    @partial(jax.jit, static_argnames=("layer_idx",))
    def step(model: GaussianModel, opt_state, views, projs, camposs, bg,
             gt_tables, seg_maps, do_update, layer_idx: int = 0):
        """views [B,4,4], projs [B,4,4], camposs [B,3], gt_tables [B,S,512],
        seg_maps [B,H,W]. `do_update` (traced bool) skips the optimizer
        apply — the reference never steps on the final iteration
        (train.py:261 quirk, matching the accum path's flag). Returns
        per-camera losses [B] in metrics."""
        params = feature_params(model)

        def loss_fn(params):
            m = model.replace(**params)
            qw, qi = m.get_weights_and_indices(topk)

            def body(carry, xs):
                view, proj, campos, ga, gb = xs
                out = render(render_settings, m, view, proj, campos, bg,
                             include_feature=True, topk=topk,
                             precomputed_quick=(qw, qi))
                live = (jnp.asarray(-1, jnp.int32) if out.live_total is None
                        else out.live_total)
                lf = tiles_loss if tiles_mode else gram_cos_loss
                loss = lf(m.codebooks, out.language_feature_weight_map,
                          ga, gb, layer_idx)
                return carry + loss, (loss, live, out.total_entries)

            total, (losses_b, lives, tots) = jax.lax.scan(
                body, jnp.asarray(0.0, jnp.float32),
                (views, projs, camposs, gt_tables, seg_maps))
            return total, (losses_b, lives, tots)

        (loss_sum, (losses_b, lives, tots)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads["language_logits"] = jnp.where(
            model.live[:, None], grads["language_logits"], 0.0)
        new_params, opt_state_out = jax.lax.cond(
            do_update,
            lambda _: optimizer.update(grads, opt_state, params),
            lambda _: (params, opt_state), None)
        model = model.replace(**new_params)
        return model, opt_state_out, {
            "loss": loss_sum, "losses": losses_b,
            "live_total": jnp.max(lives),
            "total_entries": jnp.max(tots)}

    return step


# ---------------------------------------------------------------------------
# Densification driver (host-side rare path)
# ---------------------------------------------------------------------------

def run_densify(model: GaussianModel, opt_state, key, opt, extent: float,
                max_screen_size: float):
    """Jitted densify + optimizer-state surgery, with host-side capacity
    growth on overflow (SURVEY.md §7 hard part 3)."""
    while True:
        new_model, overflow, placed = gm.densify_and_prune(
            model, key,
            max_grad=opt.densify_grad_threshold, min_opacity=0.005,
            extent=extent, max_screen_size=max_screen_size,
            percent_dense=opt.percent_dense,
        )
        if int(overflow) == 0:
            opt_state = zero_moment_rows(opt_state, placed)
            return new_model, opt_state
        # Grow capacity (power-of-two-ish) and retry; optimizer state grows
        # with zero rows, matching appended-zero Adam state.
        old_cap = model.capacity
        new_cap = max(old_cap + int(overflow), int(old_cap * 1.5))
        new_cap = -(-new_cap // 256) * 256
        model = gm.grow_capacity(model, new_cap)
        opt_state = jax.tree_util.tree_map(
            lambda leaf: _grow_rows(leaf, old_cap, new_cap), opt_state)


def _grow_rows(leaf, old_cap: int, new_cap: int):
    if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == old_cap:
        pad = [(0, new_cap - old_cap)] + [(0, 0)] * (leaf.ndim - 1)
        return jnp.pad(leaf, pad)
    return leaf


def apply_opacity_reset(model: GaussianModel, opt_state):
    """reset_opacity + zero the opacity group's Adam moments
    (gaussian_model.py:308-311 + replace_tensor_to_optimizer)."""
    model = gm.reset_opacity(model)
    return model, zero_group_moments(opt_state, "opacity")


# ---------------------------------------------------------------------------
# Host training loops
# ---------------------------------------------------------------------------

@dataclass
class TrainLogs:
    losses: list = field(default_factory=list)
    ema_loss: float = 0.0
    events: list = field(default_factory=list)


def camera_arrays(camera, bg):
    return (
        jnp.asarray(camera.world_view_transform),
        jnp.asarray(camera.full_proj_transform),
        jnp.asarray(camera.camera_center),
        jnp.asarray(bg, jnp.float32),
    )


def _gui_poll(model: GaussianModel, bg_color, iteration: int,
              iterations: int, source_path: str, max_entries: int,
              tile_cap: int) -> None:
    """Serve any pending SIBR viewer request from the hot loop (reference
    train.py:115-128). No-op unless serve.network_gui.init() was called."""
    from ..serve import network_gui
    from ..models.renderer import make_settings, render

    if network_gui.listener is None:
        return

    def render_fn(cam, shs_py, cov_py, scaling_mod):
        settings = make_settings(cam, model.active_sh_degree,
                                 scaling_mod or 1.0, max_entries, tile_cap, 16)
        out = render(settings, model,
                     jnp.asarray(cam.world_view_transform, jnp.float32),
                     jnp.asarray(cam.full_proj_transform, jnp.float32),
                     jnp.asarray(cam.camera_center, jnp.float32),
                     jnp.asarray(bg_color, jnp.float32),
                     convert_shs_python=bool(shs_py),
                     compute_cov3d_python=bool(cov_py))
        img = jnp.clip(out.render, 0.0, 1.0) * 255.0
        return np.asarray(img).astype(np.uint8).transpose(1, 2, 0)

    network_gui.poll(render_fn, source_path, iteration, iterations)


def train_rgb(
    model: GaussianModel,
    cameras: list,
    opt,
    extent: float,
    *,
    iterations: int | None = None,
    first_iter: int = 0,
    bg_color=(0, 0, 0),
    white_background: bool = False,
    seed: int = 0,
    tile_cap: int = 1024,
    max_entries: int = 2 ** 21,
    accum_iter: int = 1,
    opt_state=None,
    on_iteration: Callable[[int, GaussianModel, Any, dict], None] | None = None,
    gui_source_path: str | None = None,
    impl: str = "auto",
):
    """Phase-A loop (reference train.py:114-267). `impl="pallas"` uses the
    streaming Pallas forward + the RGB-phase Pallas backward
    (ops/pallas_rgb_train.py) instead of the XLA pipeline. When
    `serve.network_gui.init()` has been called and `gui_source_path` is
    set, each iteration first serves any pending SIBR viewer request
    (reference train.py:115-128).

    `on_iteration(iteration, model, opt_state, metrics)` makes the live
    optimizer state available to checkpoint callbacks (the reference's
    capture() persists Adam moments, gaussian_model.py:67-101).

    Returns (model, opt_state, logs)."""
    iterations = iterations or opt.iterations
    optimizer = make_rgb_optimizer(opt, model.spatial_lr_scale, accum_iter)
    if opt_state is None:
        opt_state = optimizer.init(rgb_params(model))
    accum = init_rgb_accum(model) if accum_iter > 1 else None
    rng = random.Random(seed)
    key = jax.random.PRNGKey(seed)
    logs = TrainLogs()

    # One compiled step per camera geometry (all LERF cameras share one).
    step_cache: dict[tuple, Callable] = {}

    def get_step(camera, sh_degree):
        sig = (camera.image_height, camera.image_width,
               round(camera.tanfovx, 9), round(camera.tanfovy, 9), sh_degree)
        if sig not in step_cache:
            settings = make_settings(camera, sh_degree, 1.0, max_entries,
                                     tile_cap, tile_batch=16, impl=impl)
            step_cache[sig] = make_rgb_train_step(
                settings, optimizer, opt.lambda_dssim, accum_iter)
        return step_cache[sig]

    viewpoint_stack: list = []
    for iteration in range(first_iter + 1, iterations + 1):
        if gui_source_path is not None:
            _gui_poll(model, bg_color, iteration, iterations,
                      gui_source_path, max_entries, tile_cap)
        if iteration % 1000 == 0:
            model = model.one_up_sh_degree()
        if not viewpoint_stack:
            viewpoint_stack = list(cameras)
        cam = viewpoint_stack.pop(rng.randint(0, len(viewpoint_stack) - 1))

        step = get_step(cam, model.active_sh_degree)
        view, proj, campos, bg = camera_arrays(cam, bg_color)
        gt = jnp.asarray(cam.image)
        if accum is None:
            model, opt_state, metrics = step(
                model, opt_state, view, proj, campos, bg, gt)
        else:
            # Reference quirk preserved: the optimizer never steps on the
            # final iteration (train.py:261 `iteration < opt.iterations`).
            do_update = jnp.asarray(
                iteration < iterations and iteration % accum_iter == 0)
            model, opt_state, accum, metrics = step(
                model, opt_state, accum, view, proj, campos, bg, gt, do_update)

        loss = float(metrics["loss"])
        logs.ema_loss = 0.4 * loss + 0.6 * logs.ema_loss
        logs.losses.append(loss)

        # Densification schedule (train.py:246-258).
        if iteration < opt.densify_until_iter:
            if iteration > opt.densify_from_iter and \
                    iteration % opt.densification_interval == 0:
                size_threshold = 20.0 if iteration > opt.opacity_reset_interval else 0.0
                key, sub = jax.random.split(key)
                # Bundle the grad accumulator with the optimizer state: both
                # get the same row surgery (grow + zero reallocated rows).
                bundle = (opt_state, accum) if accum is not None else opt_state
                model, bundle = run_densify(
                    model, bundle, sub, opt, extent, size_threshold)
                opt_state, accum = bundle if accum is not None else (bundle, None)
                logs.events.append((iteration, "densify", int(model.num_live)))
            if iteration % opt.opacity_reset_interval == 0 or (
                    white_background and iteration == opt.densify_from_iter):
                model, opt_state = apply_opacity_reset(model, opt_state)
                if accum is not None:
                    accum["grads"]["opacity"] = jnp.zeros_like(
                        accum["grads"]["opacity"])
                logs.events.append((iteration, "opacity_reset", None))

        if on_iteration is not None:
            on_iteration(iteration, model, opt_state, metrics)
    return model, opt_state, logs


def train_features(
    model: GaussianModel,
    cameras: list,
    opt,
    lf_dir: str,
    feature_level: int,
    *,
    iterations: int = 10_000,
    first_iter: int = 0,
    topk: int = 4,
    use_cos_loss: bool = True,
    use_l1_loss: bool = False,
    normalize: bool = False,
    bg_color=(0, 0, 0),
    seed: int = 0,
    tile_cap: int = 1024,
    max_entries: int = 2 ** 21,
    accum_iter: int = 1,
    cam_batch: int = 1,
    align_iterations=(),
    tile_budget: float = 0.0,
    tile_budget_cap: int = 128,
    tile_budget_subdiv: int = 2,
    cull_alpha: float = 1.0 / 255.0,
    impl: str = "auto",
    opt_state=None,
    feature_cache: dict | None = None,
    on_iteration: Callable[[int, GaussianModel, Any, dict], None] | None = None,
    gui_source_path: str | None = None,
):
    """Phase-C loop (reference train.py language branch). Geometry frozen.

    The cosine-only configuration (the shipped default, train.sh:4) runs the
    step in Gram loss space: compact GT (segment table + seg map) goes to
    device instead of the decoded [512, H, W] map, cutting per-step GT
    transfer ~400x. l1/normalize configurations use the pixel-space step.

    `cam_batch > 1` (gram config only) renders groups of cameras in one
    jitted step with accumulation semantics; `align_iterations` lists
    iterations whose on_iteration callback persists or evaluates state
    (checkpoints, test evals) — in cam_batch mode those become group
    boundaries, because mid-group callbacks observe the group-end state
    (the sequential paths ignore it).

    `feature_cache` maps camera.image_name -> GT arrays to avoid re-loading
    npys every epoch; pass {} to enable caching."""
    assert model.language_logits is not None and model.codebooks is not None
    optimizer = make_feature_optimizer(opt)
    if opt_state is None:
        opt_state = optimizer.init(feature_params(model))
    accum = (jax.tree_util.tree_map(jnp.zeros_like, feature_params(model))
             if accum_iter > 1 else None)
    rng = random.Random(seed)
    logs = TrainLogs()
    layer_num = model.codebooks.shape[0]
    gram = use_cos_loss and not use_l1_loss and not normalize
    loss_space = "gram" if gram else "pixel"

    step_cache: dict[tuple, Callable] = {}
    # Adaptive live-prefix budget per camera signature: 0 = full budget
    # (the first step per sig measures live_total); after that the step is
    # rebuilt with a clamped prefix, and any later viewpoint that overflows
    # it grows the budget and re-runs (pallas_train live-prefix contract).
    live_budget: dict[tuple, int] = {}
    # Adaptive EXPANSION budget per camera signature (capped mode only):
    # the dense [T, cap] layout has no live-prefix clamp, but the
    # expansion/sort buffer (max_entries) still pads every step. Geometry
    # is frozen in the feature phase, so each camera's expansion total is
    # a constant: the first step per sig runs at the configured budget
    # (exact — nothing can truncate), then the step is rebuilt with the
    # buffer sized to the measured total (measured +17% it/s at the
    # reference scale). A later same-sig viewpoint with a larger total
    # grows the buffer and redoes the step pre-update.
    exp_budget: dict[tuple, int] = {}

    def _grow_budget(lt: int) -> int:
        return min(max_entries, -(-int(lt * 1.3 + 32768) // 65536) * 65536)

    def cam_sig(camera):
        # (jit re-specializes per GT table shape on its own; the coarse
        # s_pad grid in get_gt keeps that to a few variants.)
        return (camera.image_height, camera.image_width,
                round(camera.tanfovx, 9), round(camera.tanfovy, 9))

    def get_step(camera, sig, batched=False):
        # Budget-capped mode (tile_budget > 0) replaces the live-prefix
        # clamp entirely — the dense [T, cap] layout is fixed-size, so
        # the adaptive budget machinery never rebuilds the step.
        live = 0 if tile_budget > 0.0 else live_budget.get(sig, 0)
        ebud = (exp_budget.get(sig, max_entries) if tile_budget > 0.0
                else max_entries)
        key = sig + (live, ebud, batched)
        if key not in step_cache:
            settings = make_settings(camera, model.active_sh_degree, 1.0,
                                     ebud, tile_cap, tile_batch=16,
                                     impl=impl, live_entries=live,
                                     tile_budget=tile_budget,
                                     tile_budget_cap=tile_budget_cap,
                                     tile_budget_subdiv=tile_budget_subdiv,
                                     cull_alpha=cull_alpha)
            if batched:
                step_cache[key] = make_feature_train_step_batched(
                    settings, optimizer, topk, loss_space="gram")
            else:
                step_cache[key] = make_feature_train_step(
                    settings, optimizer, topk, use_cos_loss, use_l1_loss,
                    normalize, accum_iter, loss_space=loss_space)
        return step_cache[key]

    def curriculum_layer(it):
        # Layer curriculum (reference train.py:155-156) — shared by the
        # sequential and camera-batched loops so the schedule can never
        # diverge between them.
        return min(int(it / 10000 * layer_num), layer_num - 1)

    def get_gt(cam):
        if feature_cache is not None and cam.image_name in feature_cache:
            return feature_cache[cam.image_name]
        if gram:
            table, seg = cam.get_language_feature_compact(lf_dir, feature_level)
            # Pad the table to a coarse grid so different cameras share one
            # compiled step (padded rows are never selected by any seg id).
            s_pad = -(-max(table.shape[0], 1) // 512) * 512
            table = np.pad(table, ((0, s_pad - table.shape[0]), (0, 0)))
            pair = (jnp.asarray(table), jnp.asarray(seg))
        else:
            feat, mask = cam.get_language_feature(lf_dir, feature_level)
            pair = (jnp.asarray(feat), jnp.asarray(mask))
        if feature_cache is not None:
            feature_cache[cam.image_name] = pair
        return pair

    if cam_batch > 1:
        # Camera-batched mode: groups of cam_batch iterations run in ONE
        # jitted step (scan over cameras, summed grads, single update) —
        # gradient-accumulation semantics with the top-k weights forward/
        # backward and Adam amortized across the group
        # (make_feature_train_step_batched). Opt-in via --cam_batch.
        #
        # Group boundaries are phase-aligned to ABSOLUTE multiples of
        # cam_batch (groups end at iteration % cam_batch == 0, like
        # accum_iter's update cadence), and additionally split at
        # curriculum layer changes (layer_idx is jit-static; accum_iter
        # would mix the two layers' gradients into one update there —
        # the only cadence divergence, by at most one group) and at
        # `align_iterations` (checkpoint/test marks): mid-group
        # on_iteration callbacks observe the GROUP-END model/opt_state,
        # so any iteration whose callback persists or evaluates state
        # must be a group end. After a split group the next group
        # re-aligns to the absolute phase.
        if not gram:
            raise ValueError(
                "cam_batch > 1 requires the gram (cosine-only) config "
                "(--cos_loss without --l1_loss/--normalize)")
        if accum_iter != 1:
            raise ValueError(
                "cam_batch already accumulates; combining with accum_iter "
                "is unsupported")
        sigs = {cam_sig(c) for c in cameras}
        if len(sigs) != 1:
            raise ValueError(
                "cam_batch > 1 needs one shared camera (H, W, fov) "
                f"signature across the dataset; got {len(sigs)}")
        align = set(align_iterations or ())

        viewpoint_stack = []
        iteration = first_iter + 1
        while iteration <= iterations:
            if gui_source_path is not None:
                _gui_poll(model, bg_color, iteration, iterations,
                          gui_source_path, max_entries, tile_cap)
            layer_idx = curriculum_layer(iteration)
            # Group size: up to the next absolute cam_batch boundary,
            # clamped by the remaining iterations, the current curriculum
            # segment, and any align mark inside the group.
            g_max = cam_batch - ((iteration - 1) % cam_batch)
            g = 1
            while (g < g_max and iteration + g <= iterations
                   and curriculum_layer(iteration + g) == layer_idx
                   and (iteration + g - 1) not in align):
                g += 1
            cams = []
            for _ in range(g):
                if not viewpoint_stack:
                    viewpoint_stack = list(cameras)
                cams.append(viewpoint_stack.pop(
                    rng.randint(0, len(viewpoint_stack) - 1)))
            sig = cam_sig(cams[0])
            arrs = [camera_arrays(c, bg_color) for c in cams]
            bg = arrs[0][3]
            views = jnp.stack([a[0] for a in arrs])
            projs = jnp.stack([a[1] for a in arrs])
            camposs = jnp.stack([a[2] for a in arrs])
            gts = [get_gt(c) for c in cams]
            # Tables are already padded to a coarse 512-row grid; pad to
            # the group max so the batch stacks (padded rows are never
            # selected by any seg id).
            s_max = max(t.shape[0] for t, _ in gts)
            gt_tables = jnp.stack([
                jnp.pad(t, ((0, s_max - t.shape[0]), (0, 0)))
                for t, _ in gts])
            seg_maps = jnp.stack([s for _, s in gts])
            group_end = iteration + g - 1
            do_update = jnp.asarray(group_end < iterations)
            while True:
                step = get_step(cams[0], sig, batched=True)
                prev = (model, opt_state)
                model, opt_state, metrics = step(
                    model, opt_state, views, projs, camposs, bg,
                    gt_tables, seg_maps, do_update, layer_idx=layer_idx)
                lt = int(metrics.get("live_total", -1))
                if lt < 0:                  # non-Pallas route: no telemetry
                    break
                if tile_budget > 0.0:
                    tot = int(metrics.get("total_entries", 0))
                    cur = exp_budget.get(sig, 0)
                    if cur == 0:
                        exp_budget[sig] = _grow_budget(tot)
                        break
                    if tot <= cur:
                        break
                    # A viewpoint in the group expanded past the sized
                    # buffer: grow and redo the whole group pre-update.
                    model, opt_state = prev
                    exp_budget[sig] = _grow_budget(tot)
                    continue
                cur = live_budget.get(sig, 0)
                if cur == 0:
                    live_budget[sig] = _grow_budget(lt)
                    break
                if lt <= cur:
                    break
                # The clamp dropped real entries on some camera in the
                # group: grow and redo the whole group pre-update.
                model, opt_state = prev
                live_budget[sig] = _grow_budget(lt)
            if gui_source_path is not None:
                # Second poll per group: a group spans up to cam_batch
                # iterations of wall time, so poll after the step too to
                # keep viewer latency within half a group.
                _gui_poll(model, bg_color, iteration + g - 1, iterations,
                          gui_source_path, max_entries, tile_cap)
            losses_b = np.asarray(metrics["losses"])
            for j in range(g):
                loss = float(losses_b[j])
                logs.ema_loss = 0.4 * loss + 0.6 * logs.ema_loss
                logs.losses.append(loss)
                if on_iteration is not None:
                    on_iteration(iteration + j, model, opt_state, {
                        "loss": jnp.asarray(losses_b[j]),
                        "live_total": metrics["live_total"]})
            iteration += g
        return model, opt_state, logs

    viewpoint_stack: list = []
    for iteration in range(first_iter + 1, iterations + 1):
        if gui_source_path is not None:
            _gui_poll(model, bg_color, iteration, iterations,
                      gui_source_path, max_entries, tile_cap)
        if not viewpoint_stack:
            viewpoint_stack = list(cameras)
        cam = viewpoint_stack.pop(rng.randint(0, len(viewpoint_stack) - 1))
        layer_idx = curriculum_layer(iteration)

        sig = cam_sig(cam)
        view, proj, campos, bg = camera_arrays(cam, bg_color)
        gt_feat, gt_mask = get_gt(cam)
        while True:
            step = get_step(cam, sig)
            prev = (model, opt_state, accum)
            if accum is None:
                model, opt_state, metrics = step(
                    model, opt_state, view, proj, campos, bg, gt_feat,
                    gt_mask, layer_idx=layer_idx)
            else:
                do_update = jnp.asarray(
                    iteration < iterations and iteration % accum_iter == 0)
                model, opt_state, accum, metrics = step(
                    model, opt_state, accum, view, proj, campos, bg, gt_feat,
                    gt_mask, do_update, layer_idx=layer_idx)
            lt = int(metrics.get("live_total", -1))
            if lt < 0:                      # non-Pallas route: no telemetry
                break
            if tile_budget > 0.0:
                # Capped layout: size the EXPANSION buffer to the scene
                # instead (see exp_budget above).
                tot = int(metrics.get("total_entries", 0))
                cur = exp_budget.get(sig, 0)
                if cur == 0:
                    exp_budget[sig] = _grow_budget(tot)
                    break
                if tot <= cur:
                    break
                model, opt_state, accum = prev
                exp_budget[sig] = _grow_budget(tot)
                continue
            cur = live_budget.get(sig, 0)
            if cur == 0:
                # First step ran at the full budget (exact) — tighten for
                # the rest of the run.
                live_budget[sig] = _grow_budget(lt)
                break
            if lt <= cur:
                break
            # The clamp dropped real entries: grow the budget and redo
            # this iteration from the pre-step state.
            model, opt_state, accum = prev
            live_budget[sig] = _grow_budget(lt)

        loss = float(metrics["loss"])
        logs.ema_loss = 0.4 * loss + 0.6 * logs.ema_loss
        logs.losses.append(loss)
        if on_iteration is not None:
            on_iteration(iteration, model, opt_state, metrics)
    return model, opt_state, logs
