"""Fused Pallas gram-space cosine loss (forward + hand-derived backward).

The XLA formulation (train/trainer.py _gram_cos_core — itself the
TPU-native rewrite of the reference's per-pixel 512-d cosine loss,
reference train.py:160-167 + loss_utils.py:24) is measured at ~21 ms
fwd+bwd standalone at the production training load (544x960, 300k
gaussians): the [Q, S] segment one-hot is materialized in HBM once for
the forward lookup and again for the backward's codebook reduction, and
the per-pixel sim/norm chains each cost full [Q]-sized passes.

This kernel fuses the whole loss per 16x16 tile in VMEM:

  forward   onehot([P, S]) built from the tile's seg ids in VMEM, the
            phi/gt-norm lookup and the Gram quadratic form run on the MXU
            ([P,S]x[S,M], [P,M]x[M,M] at HIGHEST), the sim chain is a
            [P]-vector epilogue, and only per-program partial loss sums
            reach HBM.
  backward  ONE kernel recomputes the forward in VMEM (inputs are tiny:
            rhs [S, M+1], Gfull [M, M]) and emits all three gradient
            streams in the same pass: d_wmap tiles (blocked output),
            d_phi[S, K] and the stacked d_Gram[M, K] — both accumulated
            across ALL programs in a revisited VMEM block via the
            MXU products onehot^T @ (d_num * w_l) and W^T @ (d_n2 * w_l).

Gradient semantics match jax.grad of the XLA core exactly (same
covered/eps guards, maximum tie handling, stop-grad layer structure);
tests pin value+grad parity on CPU interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 256          # pixels per 16x16 tile
HI = lax.Precision.HIGHEST


def _chain(num, n2, gtnp, eps):
    """The per-pixel sim chain, exactly as the XLA core writes it."""
    covered = n2 > 0.0
    n2g = jnp.where(covered, n2, 1.0)
    nrm = jnp.where(covered, jnp.sqrt(n2g), 0.0)
    a = jnp.maximum(nrm, eps)
    b = jnp.maximum(gtnp, eps)
    sim = num / (a * b)
    return covered, n2g, nrm, a, b, sim


def _dmax(x, c):
    """d/dx maximum(x, c): 1 where x>c, 0.5 at the tie (jnp.maximum's
    gradient convention), 0 below."""
    return jnp.where(x > c, 1.0, jnp.where(x == c, 0.5, 0.0))


def _fwd_kernel(seg_ref, w_ref, rhs_ref, g_ref, out_ref, *,
                tb: int, m: int, s_rows: int, eps: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sid = lax.broadcasted_iota(jnp.int32, (P, s_rows), 1)
    ones_m = jnp.ones((m, 1), jnp.float32)
    total = jnp.zeros((1, 1), jnp.float32)
    for k in range(tb):
        seg = seg_ref[k]                                   # [P] int32
        onehot = (seg[:, None] == sid).astype(jnp.float32)  # [P, S]
        looked = lax.dot_general(
            onehot, rhs_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI)  # [P, M+1pad]
        lookedphi = looked[:, :m]
        gtnp = looked[:, m:m + 1]                          # [P, 1]
        w = w_ref[k]                                       # [P, M]
        num = lax.dot_general(w * lookedphi, ones_m,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=HI)                # [P, 1]
        wg = lax.dot_general(w, g_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=HI)                 # [P, M]
        n2 = lax.dot_general(w * wg, ones_m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=HI)                 # [P, 1]
        _cov, _n2g, _nrm, a, b, sim = _chain(num, n2, gtnp, eps)
        total = total + jnp.sum(sim, axis=0, keepdims=True)
    # Mosaic cannot store scalars to VMEM: add the [1,1] total broadcast
    # across the whole 128-lane row (every lane carries the same partial
    # sum; the wrapper reads lane 0).
    out_ref[...] += jnp.broadcast_to(total, (1, 128))


def _bwd_kernel(seg_ref, w_ref, rhs_ref, g_ref,
                dw_ref, dphi_ref, dgstack_ref, *,
                tb: int, m: int, k_l: int, lay: int, s_rows: int,
                eps: float, inv_hw: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dphi_ref[...] = jnp.zeros_like(dphi_ref)
        dgstack_ref[...] = jnp.zeros_like(dgstack_ref)

    sid = lax.broadcasted_iota(jnp.int32, (P, s_rows), 1)
    ones_m = jnp.ones((m, 1), jnp.float32)
    lo = lay * k_l
    dphi_acc = jnp.zeros((s_rows, k_l), jnp.float32)
    dg_acc = jnp.zeros((m, k_l), jnp.float32)
    for k in range(tb):
        seg = seg_ref[k]
        onehot = (seg[:, None] == sid).astype(jnp.float32)
        looked = lax.dot_general(
            onehot, rhs_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI)
        lookedphi = looked[:, :m]
        gtnp = looked[:, m:m + 1]
        w = w_ref[k]
        num = lax.dot_general(w * lookedphi, ones_m,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=HI)
        wg = lax.dot_general(w, g_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=HI)
        n2 = lax.dot_general(w * wg, ones_m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=HI)
        covered, n2g, nrm, a, b, _sim = _chain(num, n2, gtnp, eps)

        d_sim = jnp.full((P, 1), -inv_hw, jnp.float32)
        inv_ab = 1.0 / (a * b)
        d_num = d_sim * inv_ab                              # [P, 1]
        d_a = -d_sim * num * inv_ab / a
        d_nrm = d_a * _dmax(nrm, eps)
        d_n2 = jnp.where(covered, d_nrm * 0.5 / jnp.sqrt(n2g), 0.0)

        w_l = w[:, lo:lo + k_l]                             # [P, K]
        # d_w: computed full-width, masked to the trained layer's lane
        # block (other layers are stop-grad zero; Mosaic has no
        # dynamic_update_slice, and the full-width FMA is free on the VPU)
        lane = lax.broadcasted_iota(jnp.int32, (1, m), 1)
        inblk = (lane >= lo) & (lane < lo + k_l)
        dw_ref[k] = jnp.where(inblk, d_num * lookedphi + 2.0 * d_n2 * wg,
                              0.0)

        d_lk = d_num * w_l                                  # [P, K]
        dphi_acc = dphi_acc + lax.dot_general(
            onehot, d_lk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI)  # [S, K]
        u = d_n2 * w_l
        dg_acc = dg_acc + lax.dot_general(
            w, u, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI)  # [M, K]
    dphi_ref[...] += dphi_acc
    dgstack_ref[...] += dg_acc


@functools.partial(jax.jit, static_argnames=("lay", "tb", "eps", "interpret"))
def _gram_fwd_pallas(seg_tiles, w_tiles, rhs, gfull, *, lay, tb, eps,
                     interpret):
    t = seg_tiles.shape[0]
    m = gfull.shape[0]
    s_rows = rhs.shape[0]
    n_prog = -(-t // tb)
    t_pad = n_prog * tb
    seg_tiles = jnp.pad(seg_tiles, ((0, t_pad - t), (0, 0)),
                        constant_values=-1)
    w_tiles = jnp.pad(w_tiles, ((0, t_pad - t), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tb=tb, m=m, s_rows=s_rows, eps=eps),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((tb, P), lambda i: (i, 0)),
            pl.BlockSpec((tb, P, m), lambda i: (i, 0, 0)),
            pl.BlockSpec(rhs.shape, lambda i: (0, 0)),
            pl.BlockSpec(gfull.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=interpret,
    )(seg_tiles, w_tiles, rhs, gfull)
    return out[0, 0]


@functools.partial(jax.jit,
                   static_argnames=("lay", "k_l", "tb", "eps", "inv_hw",
                                    "interpret"))
def _gram_bwd_pallas(seg_tiles, w_tiles, rhs, gfull, *, lay, k_l, tb, eps,
                     inv_hw, interpret):
    t = seg_tiles.shape[0]
    m = gfull.shape[0]
    s_rows = rhs.shape[0]
    n_prog = -(-t // tb)
    t_pad = n_prog * tb
    seg_tiles = jnp.pad(seg_tiles, ((0, t_pad - t), (0, 0)),
                        constant_values=-1)
    w_tiles = jnp.pad(w_tiles, ((0, t_pad - t), (0, 0), (0, 0)))

    dw, dphi, dgstack = pl.pallas_call(
        functools.partial(_bwd_kernel, tb=tb, m=m, k_l=k_l, lay=lay,
                          s_rows=s_rows, eps=eps, inv_hw=inv_hw),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((tb, P), lambda i: (i, 0)),
            pl.BlockSpec((tb, P, m), lambda i: (i, 0, 0)),
            pl.BlockSpec(rhs.shape, lambda i: (0, 0)),
            pl.BlockSpec(gfull.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tb, P, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((s_rows, k_l), lambda i: (0, 0)),
            pl.BlockSpec((m, k_l), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, P, m), jnp.float32),
            jax.ShapeDtypeStruct((s_rows, k_l), jnp.float32),
            jax.ShapeDtypeStruct((m, k_l), jnp.float32),
        ],
        interpret=interpret,
    )(seg_tiles, w_tiles, rhs, gfull)
    return dw[:t], dphi, dgstack


def _prep(codebooks, gt_table, lay):
    """rhs [S, M+pad] (phi columns + gt-norm column, lane-padded) and the
    block Gram matrix Gfull [M, M], with the XLA core's stop-grad layer
    structure applied to the VALUES (grads are assembled manually)."""
    L, K, D = codebooks.shape
    cbs = [lax.stop_gradient(codebooks[i]) if i < lay else codebooks[i]
           for i in range(lay + 1)]
    phis = [gt_table @ jnp.transpose(c) for c in cbs]       # [S, K] each
    gt_n = jnp.linalg.norm(gt_table, axis=1, keepdims=True)
    rhs = jnp.concatenate(phis + [gt_n], axis=1)            # [S, M+1]
    call = jnp.concatenate(cbs, axis=0)                     # [M, D]
    gfull = call @ jnp.transpose(call)                      # [M, M]
    m = (lay + 1) * K
    pad = -(-(m + 1) // 128) * 128 - (m + 1)
    rhs = jnp.pad(rhs, ((0, 0), (0, pad)))
    return rhs, gfull, m, K, D, L


def _seg_to_tiles(seg_map, t, grid_x, grid_y):
    from .projection import BLOCK
    H, W = seg_map.shape
    seg_p = jnp.pad(seg_map, ((0, grid_y * BLOCK - H),
                              (0, grid_x * BLOCK - W)), constant_values=-1)
    return seg_p.reshape(grid_y, BLOCK, grid_x, BLOCK).transpose(
        0, 2, 1, 3).reshape(t, BLOCK * BLOCK)


def gram_loss_fused(codebooks, wmap_tiles, gt_table, seg_map, layer_idx,
                    grid_x: int | None = None, grid_y: int | None = None,
                    eps: float = 1e-8, tb: int = 8,
                    interpret: bool = False):
    """User-facing fused gram loss on tile-layout weight maps — the same
    signature shape as trainer.gram_cos_loss_tiles (the tile grid is
    derived from the seg map when not given).

    Value and gradients (w.r.t. codebooks and wmap_tiles) match
    trainer.gram_cos_loss_tiles; the mean divides by the true image pixel
    count H*W derived from seg_map.shape."""
    from .projection import BLOCK
    H, W = seg_map.shape
    if grid_x is None:
        grid_x = -(-W // BLOCK)
    if grid_y is None:
        grid_y = -(-H // BLOCK)
    assert wmap_tiles.shape[0] == grid_x * grid_y, (
        wmap_tiles.shape, grid_x, grid_y)
    return _gram_fused_vjp(codebooks, wmap_tiles, gt_table, seg_map,
                           int(layer_idx), H * W, grid_x, grid_y, eps, tb,
                           interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _gram_fused_vjp(codebooks, wmap_tiles, gt_table, seg_map, lay, hw,
                    grid_x, grid_y, eps, tb, interpret):
    out, _ = _gram_fused_fwd(codebooks, wmap_tiles, gt_table, seg_map, lay,
                             hw, grid_x, grid_y, eps, tb, interpret)
    return out


def _gram_fused_fwd(codebooks, wmap_tiles, gt_table, seg_map, lay, hw,
                    grid_x, grid_y, eps, tb, interpret):
    from .rasterize import _pallas_supported
    interp = interpret or not _pallas_supported()
    rhs, gfull, m, K, D, L = _prep(codebooks, gt_table, lay)
    t = wmap_tiles.shape[0]
    seg_tiles = _seg_to_tiles(seg_map, t, grid_x, grid_y)
    w_used = wmap_tiles[:, :, :m]
    total = _gram_fwd_pallas(seg_tiles, w_used, rhs, gfull, lay=lay, tb=tb,
                             eps=eps, interpret=interp)
    loss = 1.0 - total / hw
    return loss, (codebooks, wmap_tiles, gt_table, seg_tiles)


def _gram_fused_bwd(lay, hw, grid_x, grid_y, eps, tb, interpret, res, g):
    from .rasterize import _pallas_supported
    interp = interpret or not _pallas_supported()
    codebooks, wmap_tiles, gt_table, seg_tiles = res
    L, K, D = codebooks.shape
    rhs, gfull, m, _K, _D, _L = _prep(codebooks, gt_table, lay)
    w_used = wmap_tiles[:, :, :m]
    dw, dphi, dgstack = _gram_bwd_pallas(
        seg_tiles, w_used, rhs, gfull, lay=lay, k_l=K, tb=tb, eps=eps,
        inv_hw=1.0 / hw, interpret=interp)
    # d_wmap: trained-layer slice from the kernel (already zero elsewhere
    # within [:, :, :m]); layers above `lay` never enter the loss.
    LK = wmap_tiles.shape[2]
    d_wmap = jnp.pad(dw, ((0, 0), (0, 0), (0, LK - m))) * g
    # d_codebooks[lay]:
    #   phi path: phis_l = table @ C_l^T  ->  d_C_l += d_phi^T @ table
    #   gram path: Gfull blocks G_jl = C_j C_l^T; d_G symmetric ->
    #     d_C_l += 2 sum_j d_G_jl^T @ C_j, with d_G_jl stacked in dgstack.
    cbs_vals = codebooks[:lay + 1]                        # [l+1, K, D] values
    d_cl = jnp.transpose(dphi) @ gt_table                 # [K, D]
    dg_blocks = dgstack.reshape(lay + 1, K, K)            # d_G_jl per j
    d_cl = d_cl + 2.0 * jnp.einsum(
        "jab,jad->bd", dg_blocks, cbs_vals, precision=HI)
    d_codebooks = jnp.zeros_like(codebooks).at[lay].set(d_cl * g)
    return d_codebooks, d_wmap, None, None


_gram_fused_vjp.defvjp(_gram_fused_fwd, _gram_fused_bwd)
