"""Multi-chip sharding of the rasterizer and training steps.

The reference is strictly single-GPU (SURVEY.md §2.4); this distribution
layer is additive and TPU-native:

- Mesh axes ``("data", "tile")``: cameras (viewpoints) shard over ``data``
  (the reference trains 1 camera/step; batching viewpoints is the natural DP
  axis), pixel tiles shard over ``tile`` (the "sequence parallelism" of
  splatting — each chip blends a strip of the image against replicated
  Gaussians, the shard_map analogue of the CUDA block-per-tile grid).
- Per-Gaussian preprocessing + binning are replicated (cheap: O(N) vs the
  O(pixels*entries) blend); Gaussian-sharded binning with an all-to-all is
  the planned Mip-NeRF360-scale extension.
- Gradients: shard_map's transpose turns each shard's scatter-add into a
  ``psum`` over (data, tile) for the replicated Gaussian/codebook params —
  the deterministic TPU replacement for CUDA backward atomics, riding ICI.

Everything compiles under jit with static shapes; `dryrun_multichip` in
__graft_entry__.py validates the full step on an N-device CPU mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map as _shard_map_api

def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
    # jax>=0.8 moved shard_map to jax.shard_map with check_vma kwarg.
    return _shard_map_api(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)

from ..ops import binning, projection, rasterize_tiles
from ..ops.rasterize import RasterizeSettings
from ..models.gaussians import GaussianModel
from ..models.renderer import RenderOutput
from ..utils import losses
from .. import __version__  # noqa: F401  (keeps package import self-contained)


def make_device_mesh(n_data: int = 1, n_tile: int | None = None,
                     devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_tile = n_tile or (len(devices) // n_data)
    assert n_data * n_tile <= len(devices)
    dev = np.asarray(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(dev, ("data", "tile"))


def _padded_tile_ids(num_tiles: int, n_shards: int) -> jnp.ndarray:
    per = -(-num_tiles // n_shards)
    ids = jnp.arange(n_shards * per, dtype=jnp.int32)
    # Out-of-range ids act as empty tiles inside blend_tiles.
    return jnp.where(ids < num_tiles, ids, num_tiles)


def rasterize_sharded(
    mesh: Mesh,
    settings: RasterizeSettings,
    means3d, opacities, viewmatrix, projmatrix, campos, bg,
    scales=None, rotations=None, cov3d_precomp=None,
    shs=None, colors_precomp=None, features=None,
    quick_weights=None, quick_indices=None, quick_channels: int = 192,
):
    """Tile-sharded forward render over `mesh`'s "tile" axis (Gaussians
    replicated). Mirrors ops.rasterize's interface; returns RasterizeOutput-
    compatible fields (rgb, feature_map, radii, final_transmittance)."""
    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    n_tile_shards = mesh.shape["tile"]

    proj = projection.preprocess(
        means3d, scales, rotations, cov3d_precomp, shs, colors_precomp,
        viewmatrix, projmatrix, campos, settings.tanfovx, settings.tanfovy,
        W, H, settings.sh_degree, settings.scale_modifier,
    )
    if quick_weights is not None:
        onehot = jax.nn.one_hot(quick_indices.astype(jnp.int32), quick_channels,
                                dtype=quick_weights.dtype)
        blend_features = jnp.einsum("ns,nsc->nc", quick_weights, onehot)
    else:
        blend_features = features

    binned = binning.bin_gaussians(proj, grid_x, grid_y, settings.max_entries)
    tile_ids = _padded_tile_ids(num_tiles, n_tile_shards)

    def local_blend(xy, conic, op, colors, feats, b_gauss, b_start, b_count,
                    tile_ids_local):
        b = binning.BinnedTiles(b_gauss, None, b_start, b_count, None)
        rgb, feat, final_t = rasterize_tiles.blend_tiles(
            xy, conic, op, colors, feats, b, grid_x, grid_y, bg,
            settings.tile_cap, settings.tile_batch, tile_ids=tile_ids_local,
        )
        if feat is None:
            feat = jnp.zeros(rgb.shape[:-1] + (0,), rgb.dtype)
        return rgb, feat, final_t

    feats_in = blend_features if blend_features is not None else jnp.zeros(
        (means3d.shape[0], 0), jnp.float32)

    rgb_t, feat_t, final_t = shard_map(
        local_blend, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P("tile")),
        out_specs=(P("tile"), P("tile"), P("tile")),
        check_rep=False,
    )(proj.xy, proj.conic, opacities[:, 0], proj.rgb, feats_in,
      binned.gauss_id, binned.tile_start, binned.tile_count, tile_ids)

    rgb_t = rgb_t[:num_tiles]
    feat_t = feat_t[:num_tiles]
    final_t = final_t[:num_tiles]
    rgb = rasterize_tiles.tiles_to_image(rgb_t, grid_x, grid_y, H, W)
    feature_map = (
        rasterize_tiles.tiles_to_image(feat_t, grid_x, grid_y, H, W)
        if feat_t.shape[-1] else None
    )
    final_map = rasterize_tiles.tiles_to_image(
        final_t[..., None], grid_x, grid_y, H, W)[0]
    return rgb, feature_map, proj.radius, final_map


def make_sharded_feature_loss(
    mesh: Mesh,
    settings: RasterizeSettings,
    topk: int,
    layer_idx: int = 0,
    use_cos_loss: bool = True,
    use_l1_loss: bool = False,
):
    """The differentiable sharded loss used by the sharded train step; also
    exposed for gradient-parity tests."""
    return _build_sharded_loss(mesh, settings, topk, layer_idx,
                               use_cos_loss, use_l1_loss)


def make_sharded_feature_train_step(
    mesh: Mesh,
    settings: RasterizeSettings,
    optimizer,
    topk: int,
    layer_idx: int = 0,
    use_cos_loss: bool = True,
    use_l1_loss: bool = False,
    loss_space: str | None = None,
):
    """Language-feature training step with viewpoint-batch DP over "data"
    and pixel-tile SP over "tile"; logits/codebook grads all-reduced by the
    shard_map transpose. Camera batch arrays have leading dim B divisible by
    mesh.shape['data'].

    loss_space (default: "gram" for cos-only configs, else "pixel") selects
    the GT representation, exactly like the single-chip trainer:
    - "gram": (gt_tables [B, S, 512], seg_maps [B, H, W] int32) — the
      cosine loss in K-dim Gram space. Per-camera GT is ~400x smaller than
      the decoded pixel map AND each tile shard works purely in K-dim
      space (no per-shard 512-d decode). The per-pixel sim sums psum
      across ("data", "tile") before normalizing — the loss is linear in
      them, so gradients match the single-chip gram step exactly.
    - "pixel": (gt_feats [B, 512, H, W], gt_masks [B, 1, H, W]) — the
      reference's literal formulation; required for l1.

    Returns jitted (model, opt_state, views[B,4,4], projs[B,4,4],
    campos[B,3], bg[3], gt_a, gt_b) -> (model, opt_state, metrics).
    """
    from ..train.trainer import feature_params

    if loss_space is None:
        loss_space = "gram" if (use_cos_loss and not use_l1_loss) else "pixel"
    if loss_space == "gram":
        assert use_cos_loss and not use_l1_loss, \
            "gram loss space implements the cosine loss only"
        sharded_loss = _build_sharded_gram_loss(mesh, settings, topk,
                                                layer_idx)
    else:
        sharded_loss = _build_sharded_loss(mesh, settings, topk, layer_idx,
                                           use_cos_loss, use_l1_loss)

    @jax.jit
    def step(model, opt_state, views, projs, camposs, bg, gt_a, gt_b):
        params = feature_params(model)
        loss, grads = jax.value_and_grad(sharded_loss)(
            params, model, views, projs, camposs, bg, gt_a, gt_b)
        new_params, opt_state = optimizer.update(grads, opt_state, params)
        return model.replace(**new_params), opt_state, {"loss": loss}

    return step


def make_sharded_gram_loss(mesh, settings, topk, layer_idx=0):
    """The gram-space sharded loss (exposed for gradient-parity tests)."""
    return _build_sharded_gram_loss(mesh, settings, topk, layer_idx)


def _build_sharded_gram_loss(
    mesh: Mesh,
    settings: RasterizeSettings,
    topk: int,
    layer_idx: int,
):
    """Tile+data-sharded gram-space cosine loss.

    Mirrors trainer.gram_cos_loss_tiles (single chip): each tile shard
    blends its tiles' [P, L*K] weight maps, looks up its pixels' segment
    rows from the replicated compact GT table, and reduces a partial
    sum(sim); the psum over ("data", "tile") then yields the exact global
    mean. gt_tables are sharded over "data" with the cameras."""
    from ..train.trainer import _gram_cos_core

    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    tile_ids_full = _padded_tile_ids(num_tiles, n_tile)
    Ppix = rasterize_tiles.P

    def sim_sum_one_camera(model: GaussianModel, view, proj_m, campos, bg,
                           gt_table, seg_map, tile_ids_local):
        proj = projection.preprocess(
            model.xyz, model.get_scaling(), model.get_rotation(), None,
            model.get_features(), None, view, proj_m, campos,
            settings.tanfovx, settings.tanfovy, W, H,
            model.active_sh_degree, 1.0,
        )
        weights = model.get_render_weights(topk)
        binned = binning.bin_gaussians(proj, grid_x, grid_y,
                                       settings.max_entries)
        _, feat_t, _ = rasterize_tiles.blend_tiles(
            proj.xy, proj.conic, model.get_opacity()[:, 0], proj.rgb,
            weights, binned, grid_x, grid_y, bg, settings.tile_cap,
            settings.tile_batch, tile_ids=tile_ids_local,
        )
        T_local = feat_t.shape[0]
        L, K, _D = model.codebooks.shape

        # This shard's pixels' segment ids; off-grid tiles and the padding
        # rows/cols of edge tiles carry -1 (sim contribution 0).
        seg_p = jnp.pad(seg_map, ((0, grid_y * projection.BLOCK - H),
                                  (0, grid_x * projection.BLOCK - W)),
                        constant_values=-1)
        seg_tiles = seg_p.reshape(
            grid_y, projection.BLOCK, grid_x, projection.BLOCK
        ).transpose(0, 2, 1, 3).reshape(num_tiles, Ppix)
        safe = jnp.minimum(tile_ids_local, num_tiles - 1)
        in_range = tile_ids_local < num_tiles
        seg_local = jnp.where(in_range[:, None], seg_tiles[safe], -1)

        w = feat_t.reshape(T_local * Ppix, L, K).transpose(1, 2, 0)
        return _gram_cos_core(
            model.codebooks, w, seg_local.reshape(-1), H * W, layer_idx,
            eps=1e-8, chunk=4096, gt_table=gt_table, reduce="sum")

    def sharded_loss(params, model, views, projs, camposs, bg,
                     gt_tables, seg_maps):
        model = model.replace(**params)

        def shard_fn(model, bg, views, projs, camposs, gt_tables, seg_maps,
                     tile_ids_local):
            sim = 0.0
            B_local = views.shape[0]
            for b in range(B_local):
                sim = sim + sim_sum_one_camera(
                    model, views[b], projs[b], camposs[b], bg,
                    gt_tables[b], seg_maps[b], tile_ids_local)
            total = jax.lax.psum(sim, ("data", "tile"))
            # loss = mean_b (1 - S_b / HW) = 1 - sum_b S_b / (B * HW):
            # linear in the per-pixel sims, so partial sums suffice.
            return 1.0 - total / (B_local * n_data * H * W)

        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"),
                      P("data"), P("data"), P("tile")),
            out_specs=P(),
            check_rep=False,
        )(model, bg, views, projs, camposs, gt_tables, seg_maps,
          tile_ids_full)

    return sharded_loss


def _build_sharded_loss(
    mesh: Mesh,
    settings: RasterizeSettings,
    topk: int,
    layer_idx: int,
    use_cos_loss: bool,
    use_l1_loss: bool,
):
    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    tile_ids_full = _padded_tile_ids(num_tiles, n_tile)

    data_spec_cam = P("data")

    def loss_one_camera(model: GaussianModel, view, proj_m, campos, bg,
                        gt_feat, gt_mask, tile_ids_local):
        """Per-(camera, tile-shard) partial loss numerator/denominator."""
        proj = projection.preprocess(
            model.xyz, model.get_scaling(), model.get_rotation(), None,
            model.get_features(), None, view, proj_m, campos,
            settings.tanfovx, settings.tanfovy, W, H,
            model.active_sh_degree, 1.0,
        )
        weights = model.get_render_weights(topk)
        binned = binning.bin_gaussians(proj, grid_x, grid_y, settings.max_entries)
        _, feat_t, _ = rasterize_tiles.blend_tiles(
            proj.xy, proj.conic, model.get_opacity()[:, 0], proj.rgb, weights,
            binned, grid_x, grid_y, bg, settings.tile_cap, settings.tile_batch,
            tile_ids=tile_ids_local,
        )
        # Decode this shard's tiles to CLIP space: [T_local*P pixels].
        L, K, D = model.codebooks.shape
        T_local = feat_t.shape[0]
        flat = feat_t.reshape(T_local * rasterize_tiles.P, L * K)
        feat = None
        for i in range(layer_idx + 1):
            layer = flat[:, i * K:(i + 1) * K] @ model.codebooks[i]
            if feat is not None:
                layer = layer + jax.lax.stop_gradient(feat)
            feat = layer  # [T_local*P, D]

        # Gather GT pixels for these tiles (gt maps padded to the tile grid).
        gt_tiles = _image_to_tiles(gt_feat, grid_x, grid_y)      # [T, P, D]
        mask_tiles = _image_to_tiles(gt_mask.astype(jnp.float32), grid_x, grid_y)
        valid_tiles = _image_to_tiles(jnp.ones((1, H, W)), grid_x, grid_y)
        safe = jnp.minimum(tile_ids_local, num_tiles - 1)
        in_range = (tile_ids_local < num_tiles).astype(jnp.float32)
        gt_local = gt_tiles[safe].reshape(T_local * rasterize_tiles.P, D)
        m_local = (mask_tiles[safe][..., 0] * in_range[:, None]).reshape(-1)
        # In-image pixels (padding rows/cols of edge tiles excluded so the
        # cross-shard mean equals the single-device H*W mean exactly; a
        # feature-masked pixel still contributes the constant 1-cos(0,0)=1
        # like the reference's unmasked mean).
        valid = (valid_tiles[safe][..., 0] * in_range[:, None]).reshape(-1)

        pn = losses.safe_norm(feat * m_local[:, None], axis=1)
        gn = losses.safe_norm(gt_local * m_local[:, None], axis=1)
        sim = (feat * gt_local).sum(1) * (m_local ** 2) / (pn * gn)
        cos_sum = jnp.sum(valid * (1.0 - sim))
        l1_sum = jnp.sum(jnp.abs(feat - gt_local) * m_local[:, None]
                         * valid[:, None])
        count = jnp.asarray(H * W, jnp.float32)
        total = 0.0
        if use_cos_loss:
            total = total + cos_sum / count
        if use_l1_loss:
            total = total + l1_sum / (count * D)
        return total

    def sharded_loss(params, model, views, projs, camposs, bg,
                     gt_feats, gt_masks):
        model = model.replace(**params)

        def shard_fn(model, bg, views, projs, camposs, gt_feats, gt_masks,
                     tile_ids_local):
            # The model pytree MUST flow through shard_map as an explicit
            # replicated argument: gradients of closure-captured tracers are
            # not psum'd across shards.
            # views etc: [B/n_data, ...]; tile_ids_local: [T/n_tile]
            per_cam = 0.0
            B_local = views.shape[0]
            for b in range(B_local):
                per_cam = per_cam + loss_one_camera(
                    model, views[b], projs[b], camposs[b], bg,
                    gt_feats[b], gt_masks[b], tile_ids_local)
            # Global mean over all cameras and all tile shards.
            total = jax.lax.psum(per_cam, ("data", "tile"))
            return total / (B_local * n_data)

        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), data_spec_cam, data_spec_cam, data_spec_cam,
                      data_spec_cam, data_spec_cam, P("tile")),
            out_specs=P(),
            check_rep=False,
        )(model, bg, views, projs, camposs, gt_feats, gt_masks, tile_ids_full)

    return sharded_loss


def make_sharded_rgb_loss(mesh: Mesh, settings: RasterizeSettings,
                          lambda_dssim: float):
    """The differentiable sharded RGB loss (exposed for parity tests):
    (params, dummy, model, views, projs, camposs, bg, gts) ->
    (loss, (l1, radii [B, N]))."""
    return _build_sharded_rgb_loss(mesh, settings, lambda_dssim)


def make_sharded_rgb_train_step(mesh: Mesh, settings: RasterizeSettings,
                                optimizer, lambda_dssim: float):
    """RGB/geometry-phase training step: viewpoint DP over "data", pixel-tile
    SP over "tile", per-Gaussian parameter gradients psum'd by the shard_map
    transpose (SURVEY §2.4 row 4 — the reference trains geometry on ONE GPU,
    train.py:169-258; this is the additive TPU scaling path).

    Gaussians stay replicated; each tile shard blends its strip; the
    rendered tiles are all-gathered (a [3, H, W] image is a few MB over ICI)
    so the 11x11 SSIM window sees the full image — the gather's transpose
    routes pixel cotangents back to the owning strip, and every
    per-Gaussian gradient (xyz/scaling/rotation/opacity/SH, plus the
    means2D NDC carrier the densification stats read) arrives as one psum.

    Densification runs host-side between steps exactly like the single-chip
    flow (train.trainer.run_densify): the model is one logical replicated
    pytree, so capacity growth re-pads identically on every shard by
    construction (a capacity change just triggers one new jit
    specialization of this step).

    Batched-stats contract (B = views.shape[0] cameras per step, divisible
    by mesh.shape['data']): the loss is the camera MEAN (like the sharded
    feature step); xyz_gradient_accum grows by the norm of the summed-
    over-batch viewspace gradient for gaussians visible in >= 1 camera,
    denom counts visible cameras, max_radii2d takes the batch max. At B=1
    this reproduces the single-chip make_rgb_train_step exactly.

    Returns jitted (model, opt_state, views [B,4,4], projs [B,4,4],
    camposs [B,3], bg [3], gt_images [B,3,H,W]) -> (model, opt_state,
    metrics).
    """
    from ..train.trainer import rgb_params

    sharded_loss = _build_sharded_rgb_loss(mesh, settings, lambda_dssim)
    n_data = mesh.shape["data"]

    @jax.jit
    def step(model, opt_state, views, projs, camposs, bg, gt_images):
        assert views.shape[0] % n_data == 0, \
            "camera batch must divide the data axis"
        params = rgb_params(model)
        dummy = jnp.zeros((model.capacity, 2), jnp.float32)

        def loss_fn(params, dummy):
            return sharded_loss(params, dummy, model, views, projs,
                                camposs, bg, gt_images)

        (loss, (l1, radii)), (grads, dummy_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, dummy)

        # Dead (padding) rows must never move (same guard as the
        # single-chip step: masked forwards can still leak NaN cotangents).
        live = model.live
        grads = {k: jnp.where(live.reshape((-1,) + (1,) * (g.ndim - 1)),
                              g, 0.0)
                 for k, g in grads.items()}
        new_params, opt_state = optimizer.update(grads, opt_state, params)
        model = model.replace(**new_params)

        # Densification statistics (reference train.py:249-252), batched.
        vis_b = radii > 0                                  # [B, N]
        vis_any = vis_b.any(axis=0)
        rad_max = radii.astype(jnp.float32).max(axis=0)
        model = model.replace(
            max_radii2d=jnp.where(
                vis_any, jnp.maximum(model.max_radii2d, rad_max),
                model.max_radii2d),
            xyz_gradient_accum=model.xyz_gradient_accum + jnp.where(
                vis_any[:, None],
                jnp.linalg.norm(dummy_grad[:, :2], axis=-1, keepdims=True),
                0.0),
            denom=model.denom + vis_b.sum(axis=0).astype(jnp.float32)[:, None],
        )
        metrics = {"loss": loss, "l1": l1, "num_visible": vis_any.sum()}
        return model, opt_state, metrics

    return step


def _build_sharded_rgb_loss(mesh: Mesh, settings: RasterizeSettings,
                            lambda_dssim: float):
    H, W = settings.image_height, settings.image_width
    grid_x, grid_y = settings.grid_x, settings.grid_y
    num_tiles = grid_x * grid_y
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    tile_ids_full = _padded_tile_ids(num_tiles, n_tile)
    scale_vec = np.array([0.5 * W, 0.5 * H], np.float32)

    def render_tiles_one(model: GaussianModel, dummy, view, proj_m, campos,
                         bg, tile_ids_local):
        proj = projection.preprocess(
            model.xyz, model.get_scaling(), model.get_rotation(), None,
            model.get_features(), None, view, proj_m, campos,
            settings.tanfovx, settings.tanfovy, W, H,
            model.active_sh_degree, settings.scale_modifier)
        # NDC-scale viewspace gradient carrier (single-chip contract:
        # ops/rasterize.py means2d_dummy) — value zero, gradient read by
        # the densification stats.
        xy = proj.xy + dummy * jnp.asarray(scale_vec)
        binned = binning.bin_gaussians(proj, grid_x, grid_y,
                                       settings.max_entries)
        feats = jnp.zeros((model.xyz.shape[0], 0), jnp.float32)
        rgb_t, _, _ = rasterize_tiles.blend_tiles(
            xy, proj.conic, model.get_opacity()[:, 0], proj.rgb, feats,
            binned, grid_x, grid_y, bg, settings.tile_cap,
            settings.tile_batch, tile_ids=tile_ids_local)
        return rgb_t, proj.radius

    def sharded_loss(params, dummy, model, views, projs, camposs, bg, gts):
        model = model.replace(**params)

        def shard_fn(model, dummy, bg, views, projs, camposs, gts,
                     tile_ids_local):
            loss_sum = 0.0
            l1_sum = 0.0
            radii = []
            B_local = views.shape[0]
            for b in range(B_local):
                rgb_t, radius = render_tiles_one(
                    model, dummy, views[b], projs[b], camposs[b], bg,
                    tile_ids_local)
                # SSIM's 11x11 window crosses tile-strip borders: gather
                # the full tile set (strips are contiguous in axis order)
                # and compute the exact full-image loss on every shard.
                full_t = jax.lax.all_gather(rgb_t, "tile", tiled=True)
                rgb = rasterize_tiles.tiles_to_image(
                    full_t[:num_tiles], grid_x, grid_y, H, W)
                l1 = losses.l1_loss(rgb, gts[b])
                loss_sum = loss_sum + (1.0 - lambda_dssim) * l1 + \
                    lambda_dssim * (1.0 - losses.ssim(rgb, gts[b]))
                l1_sum = l1_sum + l1
                radii.append(radius)
            # Every tile shard of a data row computes the identical
            # full-image loss; dividing by n_tile makes the global psum the
            # camera mean, and routes exactly one cotangent to each strip.
            denom = B_local * n_data * n_tile
            loss = jax.lax.psum(loss_sum / denom, ("data", "tile"))
            l1m = jax.lax.psum(l1_sum / denom, ("data", "tile"))
            return loss, (l1m, jnp.stack(radii))

        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P("data"), P("data"),
                      P("data"), P("tile")),
            out_specs=(P(), (P(), P("data"))),
            check_rep=False,
        )(model, dummy, bg, views, projs, camposs, gts, tile_ids_full)

    return sharded_loss


def _image_to_tiles(img: jnp.ndarray, grid_x: int, grid_y: int) -> jnp.ndarray:
    """[C, H, W] -> [num_tiles, P, C], zero-padding to the tile grid."""
    B = projection.BLOCK
    C, H, W = img.shape
    img = jnp.pad(img, ((0, 0), (0, grid_y * B - H), (0, grid_x * B - W)))
    img = img.reshape(C, grid_y, B, grid_x, B)
    return img.transpose(1, 3, 2, 4, 0).reshape(grid_y * grid_x, B * B, C)
