"""Training losses: L1/L2, cosine, SSIM, PSNR.

Parity targets: reference `utils/loss_utils.py` (11x11 Gaussian-window SSIM
with sigma=1.5, same-padding; cosine loss over the channel axis) and
`utils/image_utils.py` (mse/psnr). The SSIM window convolution runs as a
depthwise `lax.conv_general_dilated`, which XLA fuses well on TPU.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def l1_loss(pred, gt):
    return jnp.abs(pred - gt).mean()


def l2_loss(pred, gt):
    return ((pred - gt) ** 2).mean()


def mse(pred, gt):
    """Per-image MSE over flattened pixels, keeping the leading batch dim
    (reference image_utils.py:14-15)."""
    return ((pred - gt) ** 2).reshape(pred.shape[0], -1).mean(1, keepdims=True)


def psnr(pred, gt):
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse(pred, gt)))


def safe_norm(x, axis, eps: float = 1e-8):
    """L2 norm clamped below at eps, with a finite gradient at x=0.

    `sqrt(sum(x^2))` has a 0/0 NaN gradient at exactly zero vectors (e.g.
    pixels no Gaussian touches); the where-guard routes the gradient to the
    constant branch there, matching torch's clamp_min semantics in the
    backward (the zero-vector's norm contributes no gradient)."""
    sq = (x * x).sum(axis=axis)
    safe = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
    return jnp.maximum(jnp.where(sq > 0, safe, 0.0), eps)


def cos_loss(pred, gt, axis: int = 0, eps: float = 1e-8):
    """1 - mean cosine similarity along `axis` (reference loss_utils.py:24-25).

    Matches torch.nn.functional.cosine_similarity's eps clamp semantics:
    each vector's norm is clamped below at `eps`.
    """
    pn = safe_norm(pred, axis, eps)
    gn = safe_norm(gt, axis, eps)
    sim = (pred * gt).sum(axis=axis) / (pn * gn)
    return 1.0 - sim.mean()


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32)
    g = jnp.exp(-((xs - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


@partial(jax.jit, static_argnames=("window_size", "size_average"))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11, size_average: bool = True):
    """SSIM over [C,H,W] or [B,C,H,W] images (reference loss_utils.py:41-71)."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    channel = img1.shape[-3]
    window = _gaussian_window(window_size, 1.5).astype(img1.dtype)
    # Depthwise conv: kernel [C*1, 1, K, K] with feature_group_count=C.
    kernel = jnp.tile(window[None, None], (channel, 1, 1, 1))
    pad = window_size // 2

    def conv(x):
        return lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=channel,
        )

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq = mu1 ** 2
    mu2_sq = mu2 ** 2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    C1 = 0.01 ** 2
    C2 = 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
