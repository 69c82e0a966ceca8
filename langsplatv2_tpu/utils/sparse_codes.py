"""Sparse coefficient codes over the global codebook.

Parity targets: reference `utils/vq_utils.py:9-40` (softmax -> top-k mask ->
renormalize-to-1, dense and compact forms) and `utils/vq_utils.py:43-104`
(residual k-means codebook initialization — reimplemented as a JAX mini-batch
k-means instead of sklearn, so it runs on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _topk_onehots(y: jnp.ndarray, k: int):
    """Top-k of y [N, K] by (value desc, index asc tie-break — lax.top_k
    semantics) as k (index column [N], value column [N], one-hot [N, K])
    triples, via iterative masked max.

    Scatter/gather-free on purpose: lax.top_k + take_along_axis +
    .at[].set lower to per-element gathers/scatters on TPU (~90M elem/s,
    ~40 ms/step at production scale, with narrow-scatter VJPs); the
    compare/select formulation is pure VPU and its VJP is select-based."""
    n, K = y.shape
    c_iota = jnp.arange(K, dtype=jnp.int32)[None, :]
    ym = y
    cols = []
    for _ in range(k):
        vmax = jnp.max(ym, axis=1, keepdims=True)
        is_max = ym == vmax
        cmin = jnp.min(jnp.where(is_max, c_iota, K), axis=1, keepdims=True)
        sel = c_iota == cmin                                  # [N, K] one-hot
        v = jnp.sum(jnp.where(sel, y, 0.0), axis=1)           # grads -> lane
        cols.append((cmin[:, 0], v, sel))
        ym = jnp.where(sel, -jnp.inf, ym)
    return cols


@partial(jax.jit, static_argnames=("k",))
def softmax_to_topk_soft_code(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Dense sparse-coefficient field: softmax over the codebook axis, keep the
    top-k entries, renormalize them to sum to 1 (+1e-10).

    logits: [N, K] -> [N, K] with at most k non-zeros per row.
    (reference vq_utils.py:9-24)
    """
    y = jax.nn.softmax(logits, axis=1)
    mask = None
    for _idx, _v, sel in _topk_onehots(y, k):
        mask = sel if mask is None else (mask | sel)
    y_topk = jnp.where(mask, y, 0.0)
    return y_topk / (y_topk.sum(axis=1, keepdims=True) + 1e-10)


@partial(jax.jit, static_argnames=("k",))
def get_weights_and_indices(logits: jnp.ndarray, k: int):
    """Compact form: ([N,k] weights, [N,k] float indices), both ordered by
    ascending codebook index — matching the reference's nonzero-extraction
    traversal order (vq_utils.py:26-40).

    The renormalized weights are computed as a softmax over the SELECTED
    logits — mathematically identical to the reference's
    topk(softmax)/(sum+1e-10) (to ~1e-10 relative, the renorm eps), but
    with gradients that are EXACTLY zero on non-selected logits. The
    reference formulation's backward analytically cancels on those slots
    but leaves f32 cancellation noise (~1e-8), which Adam amplifies into
    an O(lr)-per-step random walk of every untrained logit; the local
    softmax kills that noise at the source (and makes gradient
    accumulation order-independent — trainer.make_feature_train_step_batched
    relies on it for parity with the sequential path)."""
    # Selection by raw logits: softmax is strictly monotone per row, so
    # top-k by logits == top-k by softmax(logits) with identical
    # tie-breaks — the [N, K] softmax (3 full passes) is selection-only
    # waste here (the weights softmax below runs on the SELECTED logits).
    cols = [(i, jnp.sum(jnp.where(sel, logits, 0.0), axis=1))
            for i, _v, sel in _topk_onehots(logits, k)]
    # Ascending-index order via a column-wise bubble sorting network
    # (k(k-1)/2 compare-exchanges of whole [N] columns — no argsort, no
    # take_along_axis; the selected indices are distinct so the order is
    # unique).
    for hi in range(k - 1, 0, -1):
        for j in range(hi):
            ia, va = cols[j]
            ib, vb = cols[j + 1]
            swap = ia > ib
            cols[j] = (jnp.where(swap, ib, ia), jnp.where(swap, vb, va))
            cols[j + 1] = (jnp.where(swap, ia, ib), jnp.where(swap, va, vb))
    idx = jnp.stack([c[0] for c in cols], axis=1)
    lsel = jnp.stack([c[1] for c in cols], axis=1)   # selected logits [N, k]
    weights = jax.nn.softmax(lsel, axis=1)
    return weights.astype(jnp.float32), idx.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Residual vector quantization codebook init (k-means on TPU)
# ---------------------------------------------------------------------------

def _assign(points: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """Nearest-center assignment via the |p|^2 - 2 p.c + |c|^2 expansion, which
    keeps the distance computation on the MXU ([M,D] @ [D,K])."""
    dots = points @ centers.T  # [M, K]
    c2 = (centers ** 2).sum(-1)  # [K]
    return jnp.argmin(c2[None, :] - 2.0 * dots, axis=1)


def _kmeans_pp_init(key: jax.Array, points: jnp.ndarray, num_clusters: int) -> jnp.ndarray:
    """k-means++ seeding: each next center drawn with probability proportional
    to the squared distance to the nearest chosen center (sklearn's default
    init, which the reference relies on via MiniBatchKMeans)."""
    M = points.shape[0]
    keys = jax.random.split(key, num_clusters)
    first = points[jax.random.randint(keys[0], (), 0, M)]
    centers = jnp.zeros((num_clusters,) + points.shape[1:], points.dtype).at[0].set(first)
    min_d2 = ((points - first) ** 2).sum(-1)

    def body(i, carry):
        centers, min_d2 = carry
        probs = min_d2 / jnp.maximum(min_d2.sum(), 1e-30)
        idx = jax.random.choice(jax.random.fold_in(keys[1], i), M, p=probs)
        nxt = points[idx]
        centers = centers.at[i].set(nxt)
        min_d2 = jnp.minimum(min_d2, ((points - nxt) ** 2).sum(-1))
        return centers, min_d2

    centers, _ = lax.fori_loop(1, num_clusters, body, (centers, min_d2))
    return centers


@partial(jax.jit, static_argnames=("num_clusters", "iters", "batch_size"))
def minibatch_kmeans(
    key: jax.Array,
    points: jnp.ndarray,
    num_clusters: int,
    iters: int = 50,
    batch_size: int = 16384,
) -> jnp.ndarray:
    """Mini-batch k-means (Sculley 2010, as used by sklearn MiniBatchKMeans in
    the reference): per batch, assign to nearest center and move each center
    toward its batch mean with a per-center 1/count learning rate.

    Returns centers [num_clusters, D].
    """
    M, D = points.shape
    init_key, batch_key = jax.random.split(key)
    centers0 = _kmeans_pp_init(init_key, points, num_clusters)
    counts0 = jnp.zeros((num_clusters,), jnp.float32)

    def step(carry, bkey):
        centers, counts = carry
        bidx = jax.random.randint(bkey, (batch_size,), 0, M)
        batch = points[bidx]
        assign = _assign(batch, centers)
        onehot = jax.nn.one_hot(assign, num_clusters, dtype=jnp.float32)  # [B,K]
        batch_counts = onehot.sum(0)  # [K]
        batch_sums = onehot.T @ batch  # [K, D]
        new_counts = counts + batch_counts
        lr = batch_counts / jnp.maximum(new_counts, 1.0)
        batch_means = batch_sums / jnp.maximum(batch_counts, 1.0)[:, None]
        centers = centers + lr[:, None] * (batch_means - centers)
        return (centers, new_counts), None

    keys = jax.random.split(batch_key, iters)
    (centers, _), _ = lax.scan(step, (centers0, counts0), keys)
    return centers


def residual_kmeans_codebooks(
    key: jax.Array,
    features: jnp.ndarray,
    num_levels: int,
    num_clusters: int,
    iters: int = 50,
    batch_size: int = 16384,
) -> jnp.ndarray:
    """Fit per-level codebooks on successive quantization residuals
    (reference vq_utils.py:56-70). Returns [num_levels, num_clusters, D]."""
    residuals = features
    books = []
    for level in range(num_levels):
        key, sub = jax.random.split(key)
        centers = minibatch_kmeans(sub, residuals, num_clusters, iters, batch_size)
        assign = _assign(residuals, centers)
        residuals = residuals - centers[assign]
        books.append(centers)
    return jnp.stack(books, axis=0)
