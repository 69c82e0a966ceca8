"""Parity test for ops/pallas_query.query_map_tiles (interpret mode).

The kernel must reproduce bench.py's unfused block-diagonal query einsums
(the serving contract, reference semantics eval_lerf.py:210-220):
    raw  = wm @ blockdiag(phi)        # [T, P, L*PQ]
    nrm2 = band-sum((wm @ blockdiag(gram)) * wm)   # [T, P, L]
"""
import numpy as np
import jax.numpy as jnp

from langsplatv2_tpu.ops.pallas_query import query_map_tiles


def _xla_query(wm_tiles, phi, gram, mm_dt):
    t, p, c = wm_tiles.shape
    L, K, PQ = phi.shape
    phi_mat = jnp.zeros((c, L * PQ), mm_dt)
    gram_mat = jnp.zeros((c, c), mm_dt)
    for lvl in range(L):
        phi_mat = phi_mat.at[lvl * K:(lvl + 1) * K,
                             lvl * PQ:(lvl + 1) * PQ].set(
                                 phi[lvl].astype(mm_dt))
        gram_mat = gram_mat.at[lvl * K:(lvl + 1) * K,
                               lvl * K:(lvl + 1) * K].set(
                                   gram[lvl].astype(mm_dt))
    wm = wm_tiles.astype(mm_dt).reshape(t * p, c)
    raw = jnp.einsum("qc,cd->qd", wm, phi_mat,
                     preferred_element_type=jnp.float32).reshape(t, p, -1)
    wg = jnp.einsum("qc,cd->qd", wm, gram_mat,
                    preferred_element_type=jnp.float32)
    nrm2 = jnp.sum((wg * wm.astype(jnp.float32)).reshape(t * p, L, K),
                   axis=-1).reshape(t, p, L)
    return raw, nrm2


def _case(rng, t, L, K, PQ, dtype):
    wm = jnp.asarray(
        rng.standard_normal((t, 256, L * K)).astype(np.float32)
    ).astype(dtype)
    phi = jnp.asarray(rng.standard_normal((L, K, PQ)).astype(np.float32))
    # Gram of random codebooks: symmetric PSD like the real one.
    cb = rng.standard_normal((L, K, 32)).astype(np.float32)
    gram = jnp.asarray(np.einsum("lkd,lmd->lkm", cb, cb))
    return wm, phi, gram


def test_query_matches_xla_f32():
    rng = np.random.default_rng(0)
    wm, phi, gram = _case(rng, t=5, L=3, K=64, PQ=7, dtype=jnp.float32)
    raw_p, nrm2_p = query_map_tiles(wm, phi, gram, tile_batch=2,
                                    interpret=True)
    raw_x, nrm2_x = _xla_query(wm, phi, gram, jnp.float32)
    np.testing.assert_allclose(np.asarray(raw_p), np.asarray(raw_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrm2_p), np.asarray(nrm2_x),
                               rtol=1e-4, atol=1e-4)


def test_query_matches_xla_single_level_uneven_tiles():
    """L=1 (training-shape) + tile count not divisible by tile_batch."""
    rng = np.random.default_rng(1)
    wm, phi, gram = _case(rng, t=7, L=1, K=64, PQ=3, dtype=jnp.float32)
    raw_p, nrm2_p = query_map_tiles(wm, phi, gram, tile_batch=4,
                                    interpret=True)
    raw_x, nrm2_x = _xla_query(wm, phi, gram, jnp.float32)
    assert raw_p.shape == (7, 256, 3) and nrm2_p.shape == (7, 256, 1)
    np.testing.assert_allclose(np.asarray(raw_p), np.asarray(raw_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrm2_p), np.asarray(nrm2_x),
                               rtol=1e-4, atol=1e-4)
