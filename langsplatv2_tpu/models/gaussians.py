"""The Gaussian scene model as a JAX pytree with static padded capacity.

Logical parity with the reference `scene/gaussian_model.py` GaussianModel:
same raw parameters (`xyz, features_dc, features_rest, scaling, rotation,
opacity` + language `logits [N, L*K]`, `codebooks [L, K, 512]` and the
inference-only quick `weights/indices [N, L*k]`), same activations, the same
densify/clone/split/prune rules and the same checkpoint schema (12/14-field
logical tuple, gaussian_model.py:67-139).

TPU-first difference: the Gaussian count is *padded to a static capacity*
with a boolean `live` mask so every training step compiles once; densify /
prune write into free slots with masked scatters instead of torch's
optimizer-state surgery (SURVEY.md §7 step 5, hard part 3). Capacity growth
(rare) happens host-side by reallocating the pytree.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils import transforms as tf
from ..utils.sh import rgb_to_sh
from ..utils.sparse_codes import softmax_to_topk_soft_code, get_weights_and_indices


def _pad(arr: jnp.ndarray, capacity: int) -> jnp.ndarray:
    n = arr.shape[0]
    if n == capacity:
        return arr
    pad_width = [(0, capacity - n)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad_width)


def _pad_rotation(arr: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Pad quaternion rows with the identity rotation. Zero-padding would
    make rotation_activation produce NaN (normalize of a zero vector), and
    NaNs in a masked-out branch still poison gradients through jnp.where."""
    n = arr.shape[0]
    if n == capacity:
        return arr
    return _pad(arr, capacity).at[n:, 0].set(1.0)


@struct.dataclass
class GaussianModel:
    # Raw (pre-activation) parameters, padded to `capacity` rows.
    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray        # [C, 3] log-scale
    rotation: jnp.ndarray       # [C, 4] unnormalized quaternion (w,x,y,z)
    opacity: jnp.ndarray        # [C, 1] logit opacity
    live: jnp.ndarray           # [C] bool

    # Language-feature parameters (None until the feature phase).
    language_logits: Any = None     # [C, L*K]
    codebooks: Any = None           # [L, K, 512]
    # Quick-render (inference-only) merged representation.
    quick_weights: Any = None       # [C, S]
    quick_indices: Any = None       # [C, S]

    # Densification statistics.
    max_radii2d: jnp.ndarray | None = None       # [C]
    xyz_gradient_accum: jnp.ndarray | None = None  # [C, 1]
    denom: jnp.ndarray | None = None             # [C, 1]

    # Static metadata.
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)
    spatial_lr_scale: float = struct.field(pytree_node=False, default=1.0)

    # ---- derived quantities (activations, gaussian_model.py:141-182) ----
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_live(self) -> jnp.ndarray:
        return jnp.sum(self.live)

    def get_scaling(self):
        return tf.scaling_activation(self.scaling)

    def get_rotation(self):
        return tf.rotation_activation(self.rotation)

    def get_opacity(self):
        """Activated opacity, forced to 0 on dead (padding) rows so they can
        never contribute nor receive gradients."""
        return jnp.where(self.live[:, None], tf.opacity_activation(self.opacity), 0.0)

    def get_features(self):
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0):
        return tf.covariance_from_scaling_rotation(
            self.get_scaling(), scaling_modifier, self.rotation
        )

    def get_render_weights(self, k: int):
        """Per-layer softmax->top-k sparsified coefficients, concatenated to
        [C, L*K] (gaussian_model.py:510-518)."""
        L, K, _ = self.codebooks.shape
        outs = [
            softmax_to_topk_soft_code(self.language_logits[:, i * K:(i + 1) * K], k)
            for i in range(L)
        ]
        return jnp.concatenate(outs, axis=-1).astype(jnp.float32)

    def get_weights_and_indices(self, k: int):
        """Compact per-layer (weights, indices), each [C, L*k], with indices
        offset by layer*K — the quick-render merge input (vq_utils.py:26-40 +
        eval_lerf.py:333-342)."""
        L, K, _ = self.codebooks.shape
        ws, idxs = [], []
        for i in range(L):
            w, idx = get_weights_and_indices(self.language_logits[:, i * K:(i + 1) * K], k)
            ws.append(w)
            idxs.append(idx + i * K)
        return jnp.concatenate(ws, axis=-1), jnp.concatenate(idxs, axis=-1)

    # ---- codebook decode (gaussian_model.py:520-549) ----
    def compute_layer_feature_map(self, weight_map: jnp.ndarray, layer_idx) -> jnp.ndarray:
        """Residual decode up to `layer_idx`: each layer's contribution is
        codebook^T @ weights; previous layers are detached (the training
        curriculum, train.py:155-156). weight_map: [L*K, H, W] -> [512, H, W]."""
        L, K, D = self.codebooks.shape
        _, H, W = weight_map.shape
        flat = weight_map.reshape(L * K, H * W)
        feat = None
        for i in range(int(layer_idx) + 1):
            layer = jnp.einsum(
                "kd,kp->dp", self.codebooks[i], flat[i * K:(i + 1) * K],
                preferred_element_type=jnp.float32,
            )
            if feat is not None:
                layer = layer + jax.lax.stop_gradient(feat)
            feat = layer
        return feat.reshape(D, H, W)

    def compute_final_feature_map(self, weight_map: jnp.ndarray) -> jnp.ndarray:
        """Single-matmul decode over all layers (gaussian_model.py:545-549)."""
        L, K, D = self.codebooks.shape
        _, H, W = weight_map.shape
        flat = weight_map.reshape(L * K, H * W)
        feat = jnp.einsum("kd,kp->dp", self.codebooks.reshape(L * K, D), flat,
                          preferred_element_type=jnp.float32)
        return feat.reshape(D, H, W)

    def one_up_sh_degree(self) -> "GaussianModel":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    spatial_lr_scale: float,
    max_sh_degree: int = 3,
    capacity: int | None = None,
    knn_mean_sq_dist: np.ndarray | None = None,
) -> GaussianModel:
    """Initialize from a point cloud (gaussian_model.py:184-210): scale from
    mean 3-NN squared distance, identity rotation, opacity 0.1."""
    from ..ops.knn import mean_sq_dist_3nn

    n = points.shape[0]
    capacity = capacity or n
    assert capacity >= n
    pts = jnp.asarray(points, jnp.float32)
    if knn_mean_sq_dist is None:
        dist2 = mean_sq_dist_3nn(pts)
    else:
        dist2 = jnp.asarray(knn_mean_sq_dist, jnp.float32)
    dist2 = jnp.maximum(dist2, 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    ncoef = (max_sh_degree + 1) ** 2
    fused_color = rgb_to_sh(jnp.asarray(colors, jnp.float32))
    features_dc = fused_color[:, None, :]                       # [N, 1, 3]
    features_rest = jnp.zeros((n, ncoef - 1, 3), jnp.float32)

    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opacities = tf.inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    live = jnp.zeros((capacity,), bool).at[:n].set(True)

    return GaussianModel(
        xyz=_pad(pts, capacity),
        features_dc=_pad(features_dc, capacity),
        features_rest=_pad(features_rest, capacity),
        scaling=_pad(scales, capacity),
        rotation=_pad_rotation(rots, capacity),
        opacity=_pad(opacities, capacity),
        live=live,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity, 1), jnp.float32),
        denom=jnp.zeros((capacity, 1), jnp.float32),
        active_sh_degree=0,
        max_sh_degree=max_sh_degree,
        spatial_lr_scale=float(spatial_lr_scale),
    )


def init_language_features(
    model: GaussianModel,
    key: jax.Array,
    vq_layer_num: int,
    codebook_size: int,
    clip_dim: int = 512,
    codebooks: jnp.ndarray | None = None,
) -> GaussianModel:
    """Attach fresh language logits + codebooks (gaussian_model.py:217-231).
    `codebooks` may come from residual k-means init (train.py:78-85)."""
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (model.capacity, vq_layer_num * codebook_size))
    if codebooks is None:
        codebooks = jax.random.normal(k2, (vq_layer_num, codebook_size, clip_dim))
    return model.replace(language_logits=logits, codebooks=codebooks)


# ---------------------------------------------------------------------------
# Densification (padded-capacity, fully jitted)
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=(0,))
def add_densification_stats(
    model: GaussianModel, means2d_grad: jnp.ndarray, update_filter: jnp.ndarray
) -> GaussianModel:
    """Accumulate view-space positional gradient norms for visible gaussians
    (gaussian_model.py:505-508)."""
    norm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1, keepdims=True)
    upd = update_filter[:, None]
    return model.replace(
        xyz_gradient_accum=model.xyz_gradient_accum + jnp.where(upd, norm, 0.0),
        denom=model.denom + jnp.where(upd, 1.0, 0.0),
    )


def _scatter_rows(dst: jnp.ndarray, slot_idx: jnp.ndarray, src: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """Write src rows into dst at slot_idx where valid (invalid rows write to
    a scratch row beyond... clipped to last row then restored by mask)."""
    # Route invalid writes to row 0 with a no-op value: use scatter with
    # drop-out-of-bounds semantics by sending invalid to capacity (OOB).
    idx = jnp.where(valid, slot_idx, dst.shape[0])
    return dst.at[idx].set(src, mode="drop")


@partial(jax.jit, static_argnames=("n_split", "max_screen_size"))
def densify_and_prune(
    model: GaussianModel,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,   # 0 = disabled
    percent_dense: float,
    n_split: int = 2,
):
    """One densification round (gaussian_model.py:448-503):

    - clone: small gaussians (max scale <= percent_dense*extent) with
      avg view-grad >= max_grad are duplicated as-is;
    - split: large ones are replaced by n_split samples drawn from their own
      ellipsoid, scales shrunk by 1/(0.8*n_split);
    - prune: opacity < min_opacity, or (when max_screen_size is set) world
      scale > 0.1*extent. Faithful quirk: the reference's screen-radius prune
      (`max_radii2D > max_screen_size`) can never fire because
      densification_postfix zeroes max_radii2D immediately before the prune
      (gaussian_model.py:444-446,495-501), so it is deliberately omitted.

    The reference's prune also covers freshly added children (it runs on the
    concatenated population), so children failing the prune criteria are
    simply never placed here.

    New gaussians go into dead slots in index order. Returns
    (model, overflow_count, placed_mask); overflow > 0 means capacity was
    insufficient (host should `grow_capacity` and re-run this round — the
    excess children were dropped). `placed_mask` [C] marks slots that
    received a new gaussian — the trainer zeroes their optimizer moments,
    the equivalent of the reference's cat_tensors_to_optimizer appending
    zero exp_avg rows (gaussian_model.py:398-422).
    """
    C = model.capacity
    denom_ok = model.denom[:, 0] > 0
    grads = jnp.where(denom_ok, model.xyz_gradient_accum[:, 0] /
                      jnp.maximum(model.denom[:, 0], 1.0), 0.0)
    scaling = model.get_scaling()
    max_scale = scaling.max(axis=1)
    opacity = tf.opacity_activation(model.opacity[:, 0])

    hot = model.live & (grads >= max_grad)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # Prune of pre-existing rows (split originals always removed).
    prune = model.live & (opacity < min_opacity)
    if max_screen_size > 0:
        prune = prune | (model.live & (max_scale > 0.1 * extent))
    prune = prune | split_mask
    live_after_prune = model.live & ~prune

    # Children that would immediately fail the post-densification prune are
    # never placed (clone children share the parent's opacity/scale; split
    # children have shrunken scale).
    child_max_scale = max_scale / (0.8 * n_split)
    ws_ok_split = (max_screen_size <= 0) | (child_max_scale <= 0.1 * extent)
    clone_keep = clone_mask & (opacity >= min_opacity)
    split_keep = split_mask & (opacity >= min_opacity) & ws_ok_split

    # Split samples: xyz drawn from the parent ellipsoid.
    eps = jax.random.normal(key, (n_split, C, 3))
    R = tf.quat_to_rotmat(model.rotation)                         # [C, 3, 3]
    samples = jnp.einsum("cij,ncj->nci", R, eps * scaling[None])  # [n_split, C, 3]
    split_xyz = model.xyz[None] + samples
    split_scaling = jnp.log(jnp.maximum(scaling / (0.8 * n_split), 1e-30))

    # Slot allocation: candidate rows are ordered (clones, split copy 0,
    # split copy 1, ...); the r-th kept candidate goes to the r-th free slot.
    wants = jnp.concatenate([clone_keep] + [split_keep] * n_split).astype(jnp.int32)
    want_rank = jnp.cumsum(wants) - wants
    total_new = wants.sum()
    free = ~live_after_prune
    n_free = free.sum()
    overflow = jnp.maximum(total_new - n_free, 0)

    slot_of_rank = jnp.nonzero(free, size=C, fill_value=C)[0]
    fits = (wants > 0) & (want_rank < n_free)
    dest = slot_of_rank[jnp.clip(want_rank, 0, C - 1)]

    def place(field, clone_rows, split_rows):
        """clone_rows [C, ...]; split_rows [n_split, C, ...]."""
        rows = jnp.concatenate([clone_rows[None], split_rows], axis=0)
        rows = rows.reshape((1 + n_split) * C, *clone_rows.shape[1:])
        return _scatter_rows(field, dest, rows, fits)

    def bcast(x):
        return jnp.broadcast_to(x[None], (n_split,) + x.shape)

    new_model = model.replace(
        xyz=place(model.xyz, model.xyz, split_xyz),
        scaling=place(model.scaling, model.scaling, bcast(split_scaling)),
        features_dc=place(model.features_dc, model.features_dc, bcast(model.features_dc)),
        features_rest=place(model.features_rest, model.features_rest, bcast(model.features_rest)),
        opacity=place(model.opacity, model.opacity, bcast(model.opacity)),
        rotation=place(model.rotation, model.rotation, bcast(model.rotation)),
        live=_scatter_rows(live_after_prune, dest, jnp.ones_like(wants, bool), fits),
        # Stats reset after densification (densification_postfix).
        xyz_gradient_accum=jnp.zeros_like(model.xyz_gradient_accum),
        denom=jnp.zeros_like(model.denom),
        max_radii2d=jnp.zeros_like(model.max_radii2d),
    )
    placed = _scatter_rows(jnp.zeros((C,), bool), dest, jnp.ones_like(wants, bool), fits)
    return new_model, overflow, placed


@partial(jax.jit, donate_argnums=(0,))
def reset_opacity(model: GaussianModel) -> GaussianModel:
    """Clamp activated opacity to <= 0.01 (gaussian_model.py:308-311)."""
    new = tf.inverse_sigmoid(jnp.minimum(tf.opacity_activation(model.opacity), 0.01))
    return model.replace(opacity=new)


def grow_capacity(model: GaussianModel, new_capacity: int) -> GaussianModel:
    """Host-side capacity reallocation (rare; triggered by densify overflow)."""
    assert new_capacity >= model.capacity

    def pad_field(x):
        return _pad(x, new_capacity) if x is not None else None

    return model.replace(
        xyz=pad_field(model.xyz),
        features_dc=pad_field(model.features_dc),
        features_rest=pad_field(model.features_rest),
        scaling=pad_field(model.scaling),
        rotation=_pad_rotation(model.rotation, new_capacity),
        opacity=pad_field(model.opacity),
        live=pad_field(model.live),
        language_logits=pad_field(model.language_logits),
        quick_weights=pad_field(model.quick_weights),
        quick_indices=pad_field(model.quick_indices),
        max_radii2d=pad_field(model.max_radii2d),
        xyz_gradient_accum=pad_field(model.xyz_gradient_accum),
        denom=pad_field(model.denom),
    )


def compact(model: GaussianModel) -> GaussianModel:
    """Host-side: drop padding, keeping live rows only (for export)."""
    live = np.asarray(model.live)
    idx = np.nonzero(live)[0]

    def take(x):
        return None if x is None else jnp.asarray(np.asarray(x)[idx])

    return model.replace(
        xyz=take(model.xyz), features_dc=take(model.features_dc),
        features_rest=take(model.features_rest), scaling=take(model.scaling),
        rotation=take(model.rotation), opacity=take(model.opacity),
        live=jnp.ones((len(idx),), bool),
        language_logits=take(model.language_logits),
        quick_weights=take(model.quick_weights),
        quick_indices=take(model.quick_indices),
        max_radii2d=take(model.max_radii2d),
        xyz_gradient_accum=take(model.xyz_gradient_accum),
        denom=take(model.denom),
    )
