"""Standalone Pallas Gram-relevancy query over rendered weight-map tiles.

The unfused XLA query (bench.py / eval paths; reference semantics
eval_lerf.py:210-220) computes

    raw  = wm @ phi_mat                     # [Q, L*PQ]
    wg   = wm @ gram_mat                    # [Q, L*K]  (MATERIALIZED)
    nrm2 = band-sum(wg * wm)                # [Q, L]

with wm the [T, P, L*K] weight-map tiles flattened to Q = T*P rows. XLA
materializes the f32 intermediate `wg` in HBM — at the reference 728p
load that is ~560 MB written + read back, ~6x the useful traffic, and
the measured stage sits at 6.9 ms (46.7 GB/s effective).

This kernel computes all three contractions per tile while the tile is
in VMEM: one read of the bf16 map, one small write. Auto-pipelined
BlockSpec grid (Pallas double-buffers the tile DMA); the matmuls are the
same DEFAULT bf16 MXU passes the XLA einsums use, so outputs match the
unfused query bit-for-bit up to f32 accumulation order (parity-tested at
1e-5). Fusing into the BLEND epilogue was measured SLOWER (competes with
the blend's VPU cells — ROADMAP round-4 A/B); standalone, the query is
pure-BW + MXU with nothing to compete against.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 256  # pixels per tile (16 x 16), the blend's tile layout


def _query_kernel(wm_ref, phi_ref, gram_ref, band_ref, raw_ref, nrm2_ref,
                  *, tile_batch: int):
    wm = wm_ref[...]                                  # [tb, P, C] bf16|f32
    c = wm.shape[-1]
    wm2 = wm.reshape(tile_batch * P, c)
    raw = lax.dot_general(                            # [tb*P, L*PQ]
        wm2, phi_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    wg = lax.dot_general(                             # [tb*P, C] (VMEM only)
        wm2, gram_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    nrm2 = lax.dot_general(                           # [tb*P, L]
        wg * wm2.astype(jnp.float32), band_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)
    raw_ref[...] = raw.reshape(tile_batch, P, -1)
    nrm2_ref[...] = nrm2.reshape(tile_batch, P, -1)


@functools.partial(jax.jit, static_argnames=("tile_batch", "interpret"))
def query_map_tiles(wm_tiles: jnp.ndarray,   # [T, P, L*K] bf16 or f32
                    phi: jnp.ndarray,        # [L, K, PQ] f32
                    gram: jnp.ndarray,       # [L, K, K] f32
                    tile_batch: int = 8,
                    interpret: bool = False):
    """Returns (raw [T, P, L*PQ] f32, nrm2 [T, P, L] f32).

    Matches the unfused block-diagonal bf16 query einsums (the serving
    contract) with ONE HBM pass over the map."""
    t, p, c = wm_tiles.shape
    assert p == P, "weight-map tiles must be [T, 256, C]"
    L, K, PQ = phi.shape
    assert c == L * K
    mm_dt = wm_tiles.dtype
    # Block-diagonal lifts (one flat matmul per contraction; per-level
    # einsums waste >90% of each MXU pass on N-padding).
    phi_mat = jnp.zeros((c, L * PQ), mm_dt)
    gram_mat = jnp.zeros((c, c), mm_dt)
    band = jnp.zeros((c, L), jnp.float32)
    for lvl in range(L):
        phi_mat = phi_mat.at[lvl * K:(lvl + 1) * K,
                             lvl * PQ:(lvl + 1) * PQ].set(
                                 phi[lvl].astype(mm_dt))
        gram_mat = gram_mat.at[lvl * K:(lvl + 1) * K,
                               lvl * K:(lvl + 1) * K].set(
                                   gram[lvl].astype(mm_dt))
        band = band.at[lvl * K:(lvl + 1) * K, lvl].set(1.0)

    n_prog = -(-t // tile_batch)
    t_pad = n_prog * tile_batch
    if t_pad != t:
        wm_tiles = jnp.pad(wm_tiles, ((0, t_pad - t), (0, 0), (0, 0)))

    kernel = functools.partial(_query_kernel, tile_batch=tile_batch)
    raw, nrm2 = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((tile_batch, P, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, L * PQ), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, L), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_batch, P, L * PQ), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile_batch, P, L), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, P, L * PQ), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, P, L), jnp.float32),
        ],
        interpret=interpret,
    )(wm_tiles, phi_mat, gram_mat, band)
    return raw[:t], nrm2[:t]
