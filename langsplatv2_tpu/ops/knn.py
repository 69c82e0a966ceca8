"""k-nearest-neighbor mean squared distance (scale initialization).

Parity target: `simple_knn._C.distCUDA2(points) -> [N]` — the mean squared
distance from each point to its 3 nearest neighbors, used once at model init
to size Gaussian scales (reference scene/gaussian_model.py:194-195; contract
in SURVEY.md §2.3(b)).

TPU design: exact chunked pairwise distances with a running top-3 merge —
the [chunk, N] distance matrix is an MXU matmul via the
|a|^2 - 2 a.b + |b|^2 expansion, and chunking keeps memory bounded. Runs
once per scene; N up to a few hundred thousand is fine.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("k", "chunk"))
def mean_sq_dist_knn(points: jnp.ndarray, k: int = 3, chunk: int = 2048) -> jnp.ndarray:
    """[N, 3] -> [N] mean squared distance to the k nearest neighbors
    (excluding self)."""
    n = points.shape[0]
    padded = -(-n // chunk) * chunk
    pts_pad = jnp.pad(points, ((0, padded - n), (0, 0)))
    sq = (points ** 2).sum(-1)  # [N]
    sq_pad = jnp.pad(sq, (0, padded - n), constant_values=jnp.inf)

    def body(i, out):
        block = lax.dynamic_slice_in_dim(pts_pad, i * chunk, chunk)       # [B, 3]
        bsq = lax.dynamic_slice_in_dim(sq_pad, i * chunk, chunk)          # [B]
        d2 = (
            bsq[:, None]
            - 2.0 * (block @ points.T)
            + sq[None, :]
        )  # [B, N]
        # Mask self-distance: global row index == column index.
        rows = i * chunk + jnp.arange(chunk)
        self_mask = rows[:, None] == jnp.arange(n)[None, :]
        d2 = jnp.where(self_mask, jnp.inf, jnp.maximum(d2, 0.0))
        # k smallest = -top_k(-d2)
        neg_top, _ = lax.top_k(-d2, k)
        mean_k = (-neg_top).mean(axis=1)
        return lax.dynamic_update_slice_in_dim(out, mean_k, i * chunk, axis=0)

    out = jnp.zeros((padded,), points.dtype)
    out = lax.fori_loop(0, padded // chunk, body, out)
    return out[:n]


def mean_sq_dist_3nn(points: jnp.ndarray) -> jnp.ndarray:
    """distCUDA2 drop-in."""
    return mean_sq_dist_knn(points, k=3)
