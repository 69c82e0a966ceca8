"""Rotations, covariance construction, parameter activations.

Parity targets: reference `utils/general_utils.py:75-110` (build_rotation,
build_scaling_rotation, strip_symmetric) and `scene/gaussian_model.py:27-43`
(activation functions). Everything is batched jnp; no per-element Python.
"""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize quaternions [..., 4] (w,x,y,z) -> rotation matrices [..., 3, 3].

    Matches reference general_utils.py:78-99 (normalizes internally).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s) for batched scale [...,3] and quaternion [...,4]."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]  # scales the columns of R


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray, scaling_modifier: float, q: jnp.ndarray
) -> jnp.ndarray:
    """3D covariance Sigma = L L^T, returned as the 6 upper-triangular entries
    [xx, xy, xz, yy, yz, zz] (reference gaussian_model.py:28-33 +
    general_utils.py:63-76)."""
    L = build_scaling_rotation(scaling_modifier * scaling, q)
    cov = L @ jnp.swapaxes(L, -1, -2)
    return strip_symmetric(cov)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] upper triangle [xx, xy, xz, yy, yz, zz]."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def unstrip_symmetric(c6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# Parameter activations (reference gaussian_model.py:27-43)
def scaling_activation(s):
    return jnp.exp(s)


def scaling_inverse_activation(s):
    return jnp.log(s)


def opacity_activation(o):
    return jax_sigmoid(o)


def opacity_inverse_activation(o):
    return inverse_sigmoid(o)


def rotation_activation(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))
