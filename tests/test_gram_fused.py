"""Parity: the fused Pallas gram loss (ops/pallas_gram.py) vs the XLA
formulation (trainer.gram_cos_loss_tiles) — value AND gradients, across
curriculum layers, with seg=-1 masked/padding pixels and uncovered
(all-zero-weight) pixels. The XLA core is itself grad-exactness-pinned
against the reference's pixel-space loss (test_training.py), so parity
here chains to the reference contract."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplatv2_tpu.ops.pallas_gram import gram_loss_fused
from langsplatv2_tpu.train.trainer import gram_cos_loss_tiles


def _case(rng, L, K, grid_x, grid_y, h, w, nseg, zero_frac=0.1):
    t = grid_x * grid_y
    P = 256
    wmap = rng.normal(size=(t, P, L * K)).astype(np.float32)
    # some pixels with no coverage at all (n2 == 0 exactly)
    mask = rng.uniform(size=(t, P)) < zero_frac
    wmap[mask] = 0.0
    seg = rng.integers(0, nseg, (h, w)).astype(np.int32)
    seg[rng.uniform(size=(h, w)) < 0.05] = -1      # masked pixels
    table = rng.normal(size=(nseg, 512)).astype(np.float32)
    codebooks = rng.normal(size=(L, K, 512)).astype(np.float32)
    return (jnp.asarray(codebooks), jnp.asarray(wmap), jnp.asarray(table),
            jnp.asarray(seg))


@pytest.mark.parametrize("L,lay", [(1, 0), (2, 0), (2, 1), (3, 2)])
def test_fused_matches_xla(L, lay):
    rng = np.random.default_rng(7 + L * 10 + lay)
    K, grid_x, grid_y = 64, 5, 3
    h, w = 41, 77                                   # ragged -> padding tiles
    cb, wmap, table, seg = _case(rng, L, K, grid_x, grid_y, h, w, nseg=96)

    def xla_loss(args):
        cb, wm = args
        return gram_cos_loss_tiles(cb, wm, table, seg, lay)

    def fused_loss(args):
        cb, wm = args
        return gram_loss_fused(cb, wm, table, seg, lay, grid_x, grid_y,
                               interpret=True)

    v_x, (gcb_x, gwm_x) = jax.value_and_grad(xla_loss)((cb, wmap))
    v_f, (gcb_f, gwm_f) = jax.value_and_grad(fused_loss)((cb, wmap))

    np.testing.assert_allclose(float(v_f), float(v_x), rtol=2e-6)
    # Uncovered (zero-weight) pixels carry huge eps-clamp gradients
    # (~1/eps, the XLA core's — and the reference's — semantics), so the
    # weight-map comparison is scale-normalized like the other VJP tests.
    sw = max(1.0, float(np.abs(np.asarray(gwm_x)).max()))
    np.testing.assert_allclose(np.asarray(gwm_f) / sw,
                               np.asarray(gwm_x) / sw, atol=2e-6)
    sc = max(1e-6, float(np.abs(np.asarray(gcb_x)).max()))
    np.testing.assert_allclose(np.asarray(gcb_f) / sc,
                               np.asarray(gcb_x) / sc, atol=2e-6)


def test_fused_matches_xla_upstream_cotangent():
    """Non-unit upstream cotangent scales all three grads linearly."""
    rng = np.random.default_rng(3)
    L, K, grid_x, grid_y, h, w = 1, 64, 4, 2, 32, 64
    cb, wmap, table, seg = _case(rng, L, K, grid_x, grid_y, h, w, nseg=64)

    def f(args):
        cb, wm = args
        return 3.5 * gram_loss_fused(cb, wm, table, seg, 0, grid_x, grid_y,
                                     interpret=True)

    def g(args):
        cb, wm = args
        return 3.5 * gram_cos_loss_tiles(cb, wm, table, seg, 0)

    v_f, (gcb_f, gwm_f) = jax.value_and_grad(f)((cb, wmap))
    v_x, (gcb_x, gwm_x) = jax.value_and_grad(g)((cb, wmap))
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=2e-6)
    sw = max(1.0, float(np.abs(np.asarray(gwm_x)).max()))
    np.testing.assert_allclose(np.asarray(gwm_f) / sw,
                               np.asarray(gwm_x) / sw, atol=5e-6)
    sc = max(1e-6, float(np.abs(np.asarray(gcb_x)).max()))
    np.testing.assert_allclose(np.asarray(gcb_f) / sc,
                               np.asarray(gcb_x) / sc, atol=5e-6)
