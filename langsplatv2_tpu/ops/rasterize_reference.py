"""Oracle rasterizer: exact per-pixel semantics, pure jnp, O(pixels x N).

This is the executable specification every fast kernel is tested against
(SURVEY.md §7 step 2). It reproduces the CUDA tile rasterizer's observable
behavior exactly, including its quirks:

- a Gaussian contributes to a pixel only if the pixel's 16x16 tile lies in
  the Gaussian's touched-tile rectangle (so tail truncation at tile borders
  matches the tiled kernel bit-for-bit in masking terms),
- blend order is (depth, then submission index) — stable sort on view z,
- alpha = min(0.99, opacity * exp(power)); contributions with power > 0 or
  alpha < 1/255 are skipped entirely (they do not attenuate T),
- front-to-back termination: a Gaussian is applied only while
  T * (1 - alpha) >= 1e-4; once that test fails nothing later is applied,
- background is composited onto RGB only; the language/feature channels get
  no background term (reference gaussian_renderer/__init__.py:42 passes bg
  for RGB; eval normalizes feature maps instead, eval_lerf.py:218).

The parallel-form transmittance used here (exp of exclusive-cumsum of
log1p(-alpha)) is mathematically identical to the sequential product and is
what the production tile kernel uses too, so gradient structure matches.

Differentiability: JAX autodiff through this function yields the oracle
gradients for parity tests. The sort order and the culling/tile decisions are
treated as non-differentiable (stop_gradient), matching the CUDA backward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .projection import BLOCK, preprocess

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _blend_weights_for_pixel(
    px: jnp.ndarray,          # [] pixel x (continuous coordinate = index)
    py: jnp.ndarray,          # [] pixel y
    order_xy: jnp.ndarray,     # [M, 2] depth-sorted means
    order_conic: jnp.ndarray,  # [M, 3]
    order_opacity: jnp.ndarray,  # [M]
    order_covers: jnp.ndarray,   # [M] bool: does this Gaussian's tile rect cover this pixel's tile
) -> jnp.ndarray:
    """Per-pixel blend weights w_j = alpha_j * T_j for the depth-sorted list."""
    d = jnp.stack([order_xy[:, 0] - px, order_xy[:, 1] - py], axis=-1)  # [M,2]
    a, b, c = order_conic[:, 0], order_conic[:, 1], order_conic[:, 2]
    power = -0.5 * (a * d[:, 0] ** 2 + c * d[:, 1] ** 2) - b * d[:, 0] * d[:, 1]
    alpha = jnp.minimum(ALPHA_MAX, order_opacity * jnp.exp(power))
    valid = order_covers & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(valid, alpha, 0.0)
    # Transmittance before gaussian j: product over i<j of (1-alpha_i).
    log_t = jnp.cumsum(jnp.log1p(-alpha)) - jnp.log1p(-alpha)
    T = jnp.exp(log_t)
    include = valid & (T * (1.0 - alpha) >= T_EPS)
    w = jnp.where(include, alpha * T, 0.0)
    alpha_included = jnp.where(include, alpha, 0.0)
    return w, alpha_included


def rasterize_reference(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,          # [N, 1] activated
    scales: jnp.ndarray | None,
    rotations: jnp.ndarray | None,
    cov3d_precomp: jnp.ndarray | None,
    shs: jnp.ndarray | None,         # [N, K, 3]
    colors_precomp: jnp.ndarray | None,
    features: jnp.ndarray | None,    # [N, D] extra blended channels (language weights)
    viewmatrix: jnp.ndarray,
    projmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    tanfovx: float,
    tanfovy: float,
    image_width: int,
    image_height: int,
    sh_degree: int,
    bg: jnp.ndarray,                 # [3]
    scale_modifier: float = 1.0,
    means2d_dummy: jnp.ndarray | None = None,  # [N, 2] zeros; carries NDC-space grads
):
    """Returns (rgb [3,H,W], feature_map [D,H,W] or None, radii [N], final_T [H,W])."""
    proj = preprocess(
        means3d, scales, rotations, cov3d_precomp, shs, colors_precomp,
        viewmatrix, projmatrix, campos, tanfovx, tanfovy,
        image_width, image_height, sh_degree, scale_modifier,
    )
    xy = proj.xy
    if means2d_dummy is not None:
        # Densification-stat gradient carrier, in NDC units like the CUDA
        # dL_dmean2D (which folds the 0.5*W ndc->pix factor into the grad).
        scale_vec = jnp.array([0.5 * image_width, 0.5 * image_height], xy.dtype)
        xy = xy + means2d_dummy * scale_vec

    # Depth-stable order over all N (culled entries pushed to the end).
    sort_depth = jnp.where(proj.radius > 0, proj.depth, jnp.inf)
    order = jnp.argsort(lax.stop_gradient(sort_depth), stable=True)

    o_xy = xy[order]
    o_conic = proj.conic[order]
    o_op = opacities[:, 0][order]
    o_rgb = proj.rgb[order]
    o_rect_min = proj.rect_min[order]
    o_rect_max = proj.rect_max[order]
    o_radius = proj.radius[order]
    o_feat = features[order] if features is not None else None

    ys = jnp.arange(image_height)
    xs = jnp.arange(image_width)

    def pixel(py, px):
        tile_x = px // BLOCK
        tile_y = py // BLOCK
        covers = (
            (o_radius > 0)
            & (o_rect_min[:, 0] <= tile_x) & (tile_x < o_rect_max[:, 0])
            & (o_rect_min[:, 1] <= tile_y) & (tile_y < o_rect_max[:, 1])
        )
        w, alpha_incl = _blend_weights_for_pixel(
            px.astype(jnp.float32), py.astype(jnp.float32),
            o_xy, o_conic, o_op, covers,
        )
        rgb = w @ o_rgb  # [3]
        # Final transmittance: product of (1 - alpha) over applied gaussians.
        final_t = jnp.exp(jnp.sum(jnp.log1p(-alpha_incl)))
        out = rgb + final_t * bg
        feat = w @ o_feat if o_feat is not None else jnp.zeros((0,))
        return out, feat, final_t

    pixel_vv = jax.vmap(jax.vmap(pixel, in_axes=(None, 0)), in_axes=(0, None))
    rgb_hw, feat_hw, final_t = pixel_vv(ys, xs)
    rgb_out = jnp.transpose(rgb_hw, (2, 0, 1))
    feat_out = jnp.transpose(feat_hw, (2, 0, 1)) if features is not None else None
    return rgb_out, feat_out, proj.radius, final_t
