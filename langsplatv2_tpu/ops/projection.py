"""Per-Gaussian preprocessing: culling, EWA projection, conic, radius, SH->RGB.

Semantics parity with the CUDA rasterizer's `preprocess` stage (contract in
SURVEY.md §2.3(a); behavior documented from the public
diff-gaussian-rasterization design which the reference extends):

- frustum cull at view-space depth <= 0.2,
- 3D covariance Sigma = (R S)(R S)^T from activated scale/rotation (or a
  precomputed 6-vector),
- EWA splat: cov2d = J Sigma_view J^T with the focal-plane clamp at
  1.3 * tan(fov/2) and a +0.3 screen-space dilation on the diagonal,
- conic = inverse covariance; screen radius = ceil(3 * sqrt(max eigenvalue)),
- tile rectangle in BLOCK x BLOCK tile units; radius=0 or zero-area rect
  means culled,
- SH -> RGB for the camera-to-Gaussian direction, clamped at 0 from below.

Everything is batched jnp over NAussians — this stage is embarrassingly
parallel and lives happily in XLA (fused elementwise + small matmuls); the
Pallas effort is reserved for binning/blending.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils import sh as sh_mod
from ..utils.camera_math import ndc_to_pixel

BLOCK = 16  # tile side in pixels, matching the 16x16 CUDA thread-block tiles


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities. All arrays are length N."""

    xy: jnp.ndarray        # [N, 2] pixel-space means
    depth: jnp.ndarray     # [N] view-space z (sort key)
    conic: jnp.ndarray     # [N, 3] inverse 2D covariance (a, b, c)
    radius: jnp.ndarray    # [N] int32 screen radius in pixels (0 = culled)
    rgb: jnp.ndarray | None  # [N, 3] view-dependent colors (None if precomputed)
    rect_min: jnp.ndarray  # [N, 2] int32 inclusive tile-rect min (x, y)
    rect_max: jnp.ndarray  # [N, 2] int32 exclusive tile-rect max (x, y)
    tiles_touched: jnp.ndarray  # [N] int32 number of touched tiles


def project_gaussians(
    means3d: jnp.ndarray,          # [N, 3]
    scales: jnp.ndarray | None,    # [N, 3] activated scales
    rotations: jnp.ndarray | None, # [N, 4] quaternions (w,x,y,z)
    cov3d_precomp: jnp.ndarray | None,  # [N, 6] or None
    viewmatrix: jnp.ndarray,       # [4, 4] transposed W2C (row-vector convention)
    projmatrix: jnp.ndarray,       # [4, 4] transposed full projection
    tanfovx: float,
    tanfovy: float,
    image_width: int,
    image_height: int,
    scale_modifier: float = 1.0,
    opacities: jnp.ndarray | None = None,  # [N] activated (tight-rect bound)
    cull_alpha: float = 1.0 / 255.0,  # tight-rect alpha threshold; > 1/255
                                      # is an opt-in approximation (capped
                                      # serving mode) — see RasterizeSettings
):
    """Project means and covariances. Returns (xy, depth, conic, radius-ish
    internals) packaged by `preprocess` below; split out for testability."""
    N = means3d.shape[0]
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    # Homogeneous transforms as explicit scalar-broadcast FMAs on [N]
    # vectors: the [N, 4] @ [4, 4] matmul form pads K=4 -> 8 and N=4 ->
    # 128 on the MXU (measured as the preprocess stage's largest term at
    # 1M gaussians); four fused multiply-add chains on flat [N] lanes is
    # the shape the VPU wants. Row-vector convention as before.
    def hrow(m, j):
        return mx * m[0, j] + my * m[1, j] + mz * m[2, j] + m[3, j]

    pv_x = hrow(viewmatrix, 0)
    pv_y = hrow(viewmatrix, 1)
    depth = hrow(viewmatrix, 2)
    in_front = depth > 0.2

    p_w = 1.0 / (hrow(projmatrix, 3) + 1e-7)
    p_proj_x = hrow(projmatrix, 0) * p_w
    p_proj_y = hrow(projmatrix, 1) * p_w

    focal_x = image_width / (2.0 * tanfovx)
    focal_y = image_height / (2.0 * tanfovy)

    # EWA: clamp the view-space point to the 1.3x focal plane before building J.
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz = depth
    txtz = pv_x / tz
    tytz = pv_y / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    # J rows: d(pix)/d(view) — [fx/tz, 0, -fx tx/tz^2] and
    # [0, fy/tz, -fy ty/tz^2]. Fold M = J W (W = world->view rotation) into
    # two [N, 3] row vectors and contract cov3d with them directly: the
    # [N, 3, 3] sigma_view/cov2d einsum intermediates of the naive EWA chain
    # cost HBM round-trips at runtime and minutes of XLA fusion search at
    # compile on this backend.
    W = viewmatrix[:3, :3].T  # world->view rotation (math convention)
    j0 = (focal_x / tz)[:, None]
    j2 = (-focal_x * tx / (tz * tz))[:, None]
    k1 = (focal_y / tz)[:, None]
    k2 = (-focal_y * ty / (tz * tz))[:, None]
    m0 = j0 * W[0][None, :] + j2 * W[2][None, :]      # [N, 3]
    m1 = k1 * W[1][None, :] + k2 * W[2][None, :]
    if cov3d_precomp is not None:
        # m . Sigma . m' from the 6 unique entries — no [N, 3, 3] tensor.
        xx, xy_, xz, yy, yz, zz = [cov3d_precomp[:, i] for i in range(6)]

        def quad(p, q):
            return (p[:, 0] * q[:, 0] * xx + p[:, 1] * q[:, 1] * yy
                    + p[:, 2] * q[:, 2] * zz
                    + (p[:, 0] * q[:, 1] + p[:, 1] * q[:, 0]) * xy_
                    + (p[:, 0] * q[:, 2] + p[:, 2] * q[:, 0]) * xz
                    + (p[:, 1] * q[:, 2] + p[:, 2] * q[:, 1]) * yz)

        a = quad(m0, m0) + 0.3
        b = quad(m0, m1)
        c = quad(m1, m1) + 0.3
    else:
        # Sigma = R diag(s^2) R^T contracted against m0/m1 in closed form:
        # with u = R^T m0 and v = R^T m1 (per-axis [N] vectors from the
        # quaternion polynomials), m.Sigma.m' = sum_k s_k^2 u_k v_k. Pure
        # elementwise VPU math — the quat_to_rotmat / L@L^T formulation
        # materializes three [N, 3, 3] HBM tensors and batched 3x3 matmuls
        # whose layouts XLA pads badly on TPU (measured: preprocess was the
        # second-largest exact-frame stage at 1M gaussians).
        qn = rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True)
        r, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
        R00 = 1 - 2 * (y * y + z * z)
        R01 = 2 * (x * y - r * z)
        R02 = 2 * (x * z + r * y)
        R10 = 2 * (x * y + r * z)
        R11 = 1 - 2 * (x * x + z * z)
        R12 = 2 * (y * z - r * x)
        R20 = 2 * (x * z - r * y)
        R21 = 2 * (y * z + r * x)
        R22 = 1 - 2 * (x * x + y * y)
        s2 = jnp.square(scale_modifier * scales)  # [N, 3]
        u0 = m0[:, 0] * R00 + m0[:, 1] * R10 + m0[:, 2] * R20
        u1 = m0[:, 0] * R01 + m0[:, 1] * R11 + m0[:, 2] * R21
        u2 = m0[:, 0] * R02 + m0[:, 1] * R12 + m0[:, 2] * R22
        v0 = m1[:, 0] * R00 + m1[:, 1] * R10 + m1[:, 2] * R20
        v1 = m1[:, 0] * R01 + m1[:, 1] * R11 + m1[:, 2] * R21
        v2 = m1[:, 0] * R02 + m1[:, 1] * R12 + m1[:, 2] * R22
        a = s2[:, 0] * u0 * u0 + s2[:, 1] * u1 * u1 + s2[:, 2] * u2 * u2 + 0.3
        b = s2[:, 0] * u0 * v0 + s2[:, 1] * u1 * v1 + s2[:, 2] * u2 * v2
        c = s2[:, 0] * v0 * v0 + s2[:, 1] * v1 * v1 + s2[:, 2] * v2 * v2 + 0.3
    det = a * c - b * b
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))

    xy = jnp.stack(
        [ndc_to_pixel(p_proj_x, image_width), ndc_to_pixel(p_proj_y, image_height)],
        axis=-1,
    )

    visible = in_front & det_ok
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    if opacities is None:
        return xy, depth, conic, radius, None, None
    # Opacity-aware per-axis extents: alpha = op*exp(-q/2) >= 1/255 only
    # within |dx| <= sqrt(2*ln(255*op)*cov_xx) (and likewise dy) — the
    # tightest axis-aligned box of the alpha support. Intersected with the
    # reference's 3-sigma radius square this removes only tiles no pixel of
    # which can ever pass the blend's alpha >= 1/255 mask, so binning
    # shrinks with bit-identical rendered output (ceil + 1px guard absorbs
    # float rounding).
    two_l = 2.0 * jnp.log(jnp.maximum(opacities, 1e-12) / cull_alpha)
    dead = two_l <= 0.0  # opacity < cull_alpha never blends anywhere
    ext_x = jnp.ceil(jnp.sqrt(jnp.maximum(two_l * a, 0.0))) + 1.0
    ext_y = jnp.ceil(jnp.sqrt(jnp.maximum(two_l * c, 0.0))) + 1.0
    ext_x = jnp.where(dead, 0.0, jnp.minimum(radius_f, ext_x))
    ext_y = jnp.where(dead, 0.0, jnp.minimum(radius_f, ext_y))
    zero = jnp.zeros_like(ext_x)
    ext_x = jnp.where(visible & ~dead, ext_x, zero)
    ext_y = jnp.where(visible & ~dead, ext_y, zero)
    radius = jnp.where(dead, 0, radius)
    return xy, depth, conic, radius, ext_x, ext_y


def tile_rect(xy, radius, image_width: int, image_height: int,
              ext_x=None, ext_y=None):
    """Inclusive-min/exclusive-max touched tile rectangle per Gaussian
    (CUDA getRect parity). When per-axis extents are given (opacity-aware
    tight box, see project_gaussians) they replace the radius square."""
    grid_x = (image_width + BLOCK - 1) // BLOCK
    grid_y = (image_height + BLOCK - 1) // BLOCK
    rx = radius.astype(jnp.float32) if ext_x is None else ext_x
    ry = radius.astype(jnp.float32) if ext_y is None else ext_y
    rect_min = jnp.stack(
        [
            jnp.clip(jnp.floor((xy[:, 0] - rx) / BLOCK), 0, grid_x).astype(jnp.int32),
            jnp.clip(jnp.floor((xy[:, 1] - ry) / BLOCK), 0, grid_y).astype(jnp.int32),
        ],
        axis=-1,
    )
    rect_max = jnp.stack(
        [
            jnp.clip(jnp.floor((xy[:, 0] + rx + BLOCK - 1) / BLOCK), 0, grid_x).astype(jnp.int32),
            jnp.clip(jnp.floor((xy[:, 1] + ry + BLOCK - 1) / BLOCK), 0, grid_y).astype(jnp.int32),
        ],
        axis=-1,
    )
    tiles = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    empty = (rx <= 0.0) | (ry <= 0.0)
    tiles = jnp.where(empty, 0, tiles)
    return rect_min, rect_max, tiles


def sh_to_color(
    shs: jnp.ndarray,       # [N, K, 3]
    means3d: jnp.ndarray,   # [N, 3]
    campos: jnp.ndarray,    # [3]
    sh_degree: int,
) -> jnp.ndarray:
    """View-dependent SH color, clamped at 0 (CUDA computeColorFromSH parity;
    the clamp's gradient masking falls out of jnp.maximum autodiff)."""
    dirs = means3d - campos[None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    # eval_sh expects [..., C, K] coefficient layout.
    result = sh_mod.eval_sh(sh_degree, jnp.swapaxes(shs, -1, -2), dirs)
    return jnp.maximum(result + 0.5, 0.0)


def preprocess(
    means3d,
    scales,
    rotations,
    cov3d_precomp,
    shs,
    colors_precomp,
    viewmatrix,
    projmatrix,
    campos,
    tanfovx: float,
    tanfovy: float,
    image_width: int,
    image_height: int,
    sh_degree: int,
    scale_modifier: float = 1.0,
    opacities=None,
    cull_alpha: float = 1.0 / 255.0,
) -> ProjectedGaussians:
    xy, depth, conic, radius, ext_x, ext_y = project_gaussians(
        means3d, scales, rotations, cov3d_precomp,
        viewmatrix, projmatrix, tanfovx, tanfovy,
        image_width, image_height, scale_modifier, opacities=opacities,
        cull_alpha=cull_alpha,
    )
    rect_min, rect_max, tiles = tile_rect(
        xy, radius, image_width, image_height, ext_x=ext_x, ext_y=ext_y)
    # A Gaussian with an empty rect is culled (radius forced to 0).
    radius = jnp.where(tiles > 0, radius, 0)
    tiles = jnp.where(radius > 0, tiles, 0)

    if colors_precomp is not None:
        rgb = colors_precomp
    elif shs is not None:
        rgb = sh_to_color(shs, means3d, campos, sh_degree)
    else:
        rgb = None
    return ProjectedGaussians(xy, depth, conic, radius, rgb, rect_min, rect_max, tiles)
