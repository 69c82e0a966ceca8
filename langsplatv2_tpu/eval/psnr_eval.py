"""RGB quality evaluation (PSNR over held-out cameras).

Parity target: reference `eval_araba.py` — PSNR over the test split (or the
first 10 train cameras when no test split exists).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.renderer import make_settings, render
from ..utils.losses import psnr


def evaluate_psnr(model, cameras, bg=(0.0, 0.0, 0.0), limit: int | None = None):
    """Returns (mean_psnr, per_camera list)."""
    cams = cameras[:limit] if limit else cameras
    values = []
    bg = jnp.asarray(bg, jnp.float32)
    for cam in cams:
        settings = make_settings(cam, model.active_sh_degree)
        out = render(settings, model,
                     jnp.asarray(cam.world_view_transform),
                     jnp.asarray(cam.full_proj_transform),
                     jnp.asarray(cam.camera_center), bg)
        pred = jnp.clip(out.render, 0.0, 1.0)[None]
        gt = jnp.clip(jnp.asarray(cam.image), 0.0, 1.0)[None]
        values.append(float(psnr(pred, gt)[0, 0]))
    return float(np.mean(values)) if values else 0.0, values
