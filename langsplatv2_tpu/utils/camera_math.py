"""Camera and projection math.

Parity targets: reference `utils/graphics_utils.py` conventions —
- world->view matrices are stored *transposed* (row-vector convention:
  ``x_view_h = x_world_h @ world_view_transform``),
- the perspective projection maps z into [0, 1] with ``z_sign = +1``,
- ``full_proj_transform = world_view_transform @ projection_matrix.T``.

All functions are pure NumPy-compatible jnp; host-side camera setup may call
them with NumPy arrays.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np


class BasicPointCloud(NamedTuple):
    points: np.ndarray   # [N, 3]
    colors: np.ndarray   # [N, 3] in [0, 1]
    normals: np.ndarray  # [N, 3]


def get_world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
) -> np.ndarray:
    """4x4 world-to-camera matrix (reference graphics_utils.py:38-49).

    `R` is the camera-to-world rotation as stored by COLMAP readers
    (i.e. the transpose of the world-to-camera rotation); `t` is the
    world-to-camera translation. `translate`/`scale` recenter and rescale
    the camera position in world space (nerf++-style normalization).
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0

    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.float32(np.linalg.inv(C2W))


def get_projection_matrix(znear: float, zfar: float, fov_x: float, fov_y: float) -> np.ndarray:
    """Perspective projection, z in [0,1] (reference graphics_utils.py:51-71)."""
    tan_half_fov_y = math.tan(fov_y / 2)
    tan_half_fov_x = math.tan(fov_x / 2)

    top = tan_half_fov_y * znear
    right = tan_half_fov_x * znear

    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def ndc_to_pixel(ndc, size):
    """NDC in [-1,1] -> continuous pixel coordinate (CUDA ndc2Pix parity)."""
    return ((ndc + 1.0) * size - 1.0) * 0.5
