"""Shared synthetic-scene builders for rasterizer tests."""
import math

import numpy as np
import jax.numpy as jnp

from langsplatv2_tpu.utils import camera_math as cm


def make_camera(height, width, fov_deg=60.0, R=None, t=None, znear=0.01, zfar=100.0):
    """Camera matrices in the reference convention (transposed, row-vector).

    Default pose: identity rotation, camera at origin looking down +z.
    Returns dict with viewmatrix, projmatrix, campos, tanfovx, tanfovy.
    """
    fovy = math.radians(fov_deg)
    fovx = 2 * math.atan(math.tan(fovy / 2) * width / height)
    R = np.eye(3) if R is None else R
    t = np.zeros(3) if t is None else t
    w2c = cm.get_world_to_view(R, t)
    view = w2c.T  # transposed storage
    proj = cm.get_projection_matrix(znear, zfar, fovx, fovy)
    full = view @ proj.T
    campos = np.linalg.inv(view)[3, :3]
    return {
        "viewmatrix": jnp.asarray(view, jnp.float32),
        "projmatrix": jnp.asarray(full, jnp.float32),
        "campos": jnp.asarray(campos, jnp.float32),
        "tanfovx": math.tan(fovx / 2),
        "tanfovy": math.tan(fovy / 2),
    }


def random_gaussians(rng, n, feat_dim=0, sh_degree=0, z_range=(2.0, 8.0), spread=2.0):
    """Random Gaussians in front of the default camera."""
    out = {
        "means3d": jnp.asarray(np.concatenate([
            rng.uniform(-spread, spread, (n, 2)),
            rng.uniform(*z_range, (n, 1)),
        ], axis=1).astype(np.float32)),
        "scales": jnp.asarray(rng.uniform(0.03, 0.3, (n, 3)).astype(np.float32)),
        "rotations": jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        "opacities": jnp.asarray(rng.uniform(0.2, 0.95, (n, 1)).astype(np.float32)),
    }
    ncoef = (sh_degree + 1) ** 2
    shs = rng.normal(size=(n, ncoef, 3)).astype(np.float32) * 0.3
    shs[:, 0, :] = rng.uniform(0.1, 1.5, (n, 3))
    out["shs"] = jnp.asarray(shs)
    if feat_dim:
        out["features"] = jnp.asarray(rng.uniform(0, 1, (n, feat_dim)).astype(np.float32))
    return out
