"""Render façade: camera + GaussianModel -> images/maps.

Parity target: reference `gaussian_renderer/__init__.py` `render()` — the
same three mutually exclusive language modes (off / training / quick), the
same optional python-side SH->color and covariance precompute switches, and
the same output bundle {render, language_feature_weight_map, viewspace
gradient carrier, visibility_filter, radii}.

TPU shape: the façade only assembles static `RasterizeSettings` (hashable ->
one compile per camera geometry) and arrays; all compute lives in
`langsplatv2_tpu.ops`. The means2D gradient carrier is a functional input
(pass `means2d_dummy` of zeros and differentiate w.r.t. it) instead of
torch's retain_grad side channel.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

from ..ops import RasterizeSettings, rasterize
from ..ops.projection import sh_to_color
from .gaussians import GaussianModel


class RenderOutput(NamedTuple):
    render: jnp.ndarray                      # [3, H, W]
    language_feature_weight_map: Any         # [D, H, W] or None
    visibility_filter: jnp.ndarray           # [C] bool
    radii: jnp.ndarray                       # [C] int32
    final_transmittance: jnp.ndarray         # [H, W]
    max_tile_count: jnp.ndarray              # [] overflow telemetry
    total_entries: jnp.ndarray               # [] overflow telemetry
    # [] int32 or None: entries surviving the exact cull (pre live-prefix
    # clamp) — sizes settings.live_entries; live_total > live_entries
    # means the clamp dropped real entries.
    live_total: jnp.ndarray | None = None


def make_settings(
    camera,
    sh_degree: int,
    scaling_modifier: float = 1.0,
    max_entries: int = 2 ** 21,
    tile_cap: int = 1024,
    tile_batch: int = 16,
    impl: str = "auto",
    live_entries: int = 0,
    tile_budget: float = 0.0,
    tile_budget_cap: int = 128,
    tile_budget_subdiv: int = 2,
    cull_alpha: float = 1.0 / 255.0,
) -> RasterizeSettings:
    return RasterizeSettings(
        image_height=int(camera.image_height),
        image_width=int(camera.image_width),
        tanfovx=float(camera.tanfovx),
        tanfovy=float(camera.tanfovy),
        sh_degree=sh_degree,
        scale_modifier=scaling_modifier,
        max_entries=max_entries,
        tile_cap=tile_cap,
        tile_batch=tile_batch,
        impl=impl,
        live_entries=live_entries,
        tile_budget=tile_budget,
        tile_budget_cap=tile_budget_cap,
        tile_budget_subdiv=tile_budget_subdiv,
        cull_alpha=cull_alpha,
    )


def render(
    settings: RasterizeSettings,
    model: GaussianModel,
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    bg_color: jnp.ndarray,
    *,
    include_feature: bool = False,
    quick_render: bool = False,
    topk: int = 4,
    override_color: jnp.ndarray | None = None,
    convert_shs_python: bool = False,
    compute_cov3d_python: bool = False,
    means2d_dummy: jnp.ndarray | None = None,
    precomputed_quick: tuple | None = None,
) -> RenderOutput:
    scales = rotations = cov3d = None
    if compute_cov3d_python:
        cov3d = model.get_covariance(settings.scale_modifier)
    else:
        scales = model.get_scaling()
        rotations = model.get_rotation()

    shs = colors_precomp = None
    if override_color is not None:
        colors_precomp = override_color
    elif convert_shs_python:
        colors_precomp = sh_to_color(
            model.get_features(), model.xyz, campos, model.active_sh_degree
        )
    else:
        shs = model.get_features()

    features = quick_weights = quick_indices = None
    quick_channels = 0
    quick_train = False
    if quick_render:
        assert model.quick_weights is not None and model.quick_indices is not None, \
            "None Value Error"  # matches reference assert message intent
        quick_weights = model.quick_weights
        quick_indices = model.quick_indices
        # Channel count: one codebook's worth per merged level.
        n_levels = model.codebooks.shape[0]
        quick_channels = n_levels * model.codebooks.shape[1]
    elif include_feature:
        # Training mode: the dense sparsified field [N, L*K] and the
        # compact top-k pairs scatter to the SAME blended map; the compact
        # form keeps the per-entry state two w16 gathers on TPU
        # (ops/pallas_train.py quick-train VJP) and its weight gradients
        # chain to the logits through get_weights_and_indices.
        # `precomputed_quick` lets a camera-batched train step compute the
        # (weights, indices) pair ONCE outside its per-camera scan — the
        # top-k forward and its backward then run once per optimizer group
        # instead of once per camera (trainer.make_feature_train_step_batched).
        if precomputed_quick is not None:
            quick_weights, quick_indices = precomputed_quick
        else:
            quick_weights, quick_indices = model.get_weights_and_indices(topk)
        L, K, _ = model.codebooks.shape
        quick_channels = L * K
        quick_train = True

    out = rasterize(
        settings,
        model.xyz,
        model.get_opacity(),
        viewmatrix,
        projmatrix,
        campos,
        bg_color,
        scales=scales,
        rotations=rotations,
        cov3d_precomp=cov3d,
        shs=shs,
        colors_precomp=colors_precomp,
        features=features,
        quick_weights=quick_weights,
        quick_indices=quick_indices,
        quick_channels=quick_channels,
        means2d_dummy=means2d_dummy,
        quick_train=quick_train,
    )
    return RenderOutput(
        render=out.rgb,
        language_feature_weight_map=out.feature_map,
        visibility_filter=out.radii > 0,
        radii=out.radii,
        final_transmittance=out.final_transmittance,
        max_tile_count=out.max_tile_count,
        total_entries=out.total_entries,
        live_total=out.live_total,
    )


def render_camera(camera, model: GaussianModel, bg_color, **kwargs) -> RenderOutput:
    """Convenience wrapper taking a scene Camera object."""
    settings = make_settings(
        camera, model.active_sh_degree,
        kwargs.pop("scaling_modifier", 1.0),
        kwargs.pop("max_entries", 2 ** 21),
        kwargs.pop("tile_cap", 1024),
        kwargs.pop("tile_batch", 16),
    )
    return render(
        settings, model,
        jnp.asarray(camera.world_view_transform),
        jnp.asarray(camera.full_proj_transform),
        jnp.asarray(camera.camera_center),
        jnp.asarray(bg_color),
        **kwargs,
    )
