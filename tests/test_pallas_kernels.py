"""Parity tests for the Pallas streaming kernels (interpret mode on CPU).

The Pallas fast path (ops/pallas_binning.py + ops/pallas_blend.py) must
reproduce the XLA reference pipeline exactly: same binning (entry multiset,
per-tile depth order, stable ties) and same blend semantics (alpha masks,
T_EPS inclusion, background composition). Compiled-mode parity against the
same oracle is exercised on hardware by bench.py and was validated on a
real v5e (max |rgb| diff 6.5e-5, pure fma-ordering noise at the alpha
threshold).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from langsplatv2_tpu.ops import binning, projection, rasterize_tiles
from langsplatv2_tpu.ops import pallas_binning, pallas_blend
from langsplatv2_tpu.ops.rasterize import RasterizeSettings, rasterize
from langsplatv2_tpu.utils.camera_math import (
    get_world_to_view, get_projection_matrix)


def _scene(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.uniform(-2, 2, (n, 2)), rng.uniform(1.0, 8.0, (n, 1))], 1
    ).astype(np.float32)
    scales = rng.uniform(0.02, 0.3, (n, 3)).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    ops = jnp.asarray(rng.uniform(0.1, 0.95, (n, 1)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    pm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    proj = projection.preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots), None,
        None, cols, view, pm, jnp.zeros(3, jnp.float32),
        math.tan(fovx / 2), math.tan(fovy / 2), w, h, 0, 1.0)
    return means, scales, rots, ops, cols, view, pm, proj, fovx, fovy


class TestPallasExpansion:
    def test_matches_xla_binning(self):
        h, w = 128, 160
        *_, proj, fovx, fovy = _scene(3000, h, w, seed=1)
        gx, gy = -(-w // 16), -(-h // 16)
        num_tiles = gx * gy
        me = 2 ** 15

        binned = binning.bin_gaussians(proj, gx, gy, me)
        tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
            proj, gx, gy, me, interpret=True)
        assert int(total) == int(binned.total_entries)

        hi, lo = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        g_sorted, t_start, t_count, _ = pallas_binning.sorted_binning_from_keys(
            hi, lo, num_tiles)
        np.testing.assert_array_equal(np.asarray(t_start),
                                      np.asarray(binned.tile_start))
        np.testing.assert_array_equal(np.asarray(t_count),
                                      np.asarray(binned.tile_count))
        tot = int(total)
        np.testing.assert_array_equal(np.asarray(g_sorted[:tot]),
                                      np.asarray(binned.gauss_id[:tot]))

    def test_wide_grid_key_sort_matches_lexsort(self):
        """Above 8190 tiles pack_sort_keys switches to a 3-word key; the
        derived (tile, depth, gauss) order must equal a host lexsort at a
        4K-scale grid (240x135 = 32,400 tiles)."""
        rng = np.random.default_rng(11)
        e = 20_000
        num_tiles = 240 * 135
        tile = rng.integers(0, num_tiles, e).astype(np.int32)
        tile[rng.uniform(size=e) < 0.05] = num_tiles       # dead sentinels
        depth = rng.uniform(0.2, 50.0, e).astype(np.float32)
        gauss = rng.permutation(e).astype(np.int32)

        keys = pallas_binning.pack_sort_keys(
            jnp.asarray(tile), jnp.asarray(depth), jnp.asarray(gauss),
            num_tiles)
        assert len(keys) == 3
        g_sorted, t_start, t_count, tile_sorted = \
            pallas_binning.sorted_binning_from_keys(keys, num_tiles)

        order = np.lexsort((gauss, depth.view(np.uint32), tile))
        live = tile[order] < num_tiles
        np.testing.assert_array_equal(
            np.asarray(g_sorted)[:live.sum()], gauss[order][live])
        np.testing.assert_array_equal(
            np.asarray(tile_sorted)[:live.sum()], tile[order][live])
        counts = np.bincount(tile[tile < num_tiles], minlength=num_tiles)
        np.testing.assert_array_equal(np.asarray(t_count), counts)

    def test_wide_key_render_matches_two_word(self, monkeypatch):
        """The 3-word (>1080p) sort-key path must reproduce the 2-word
        path pixel-for-pixel (reference CUDA sort has no resolution
        ceiling, backend_renderer.py:161-246). Exercised at small
        resolution via force_wide — the full 1440p grid is covered at the
        binning level by test_1440p_binning_matches_xla (rendering 14k
        interpret-mode tiles costs minutes for no extra coverage)."""
        n, h, w = 800, 80, 112
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=7)
        rng = np.random.default_rng(7)
        L, K, TOPK = 1, 64, 4
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qi = rng.integers(0, K, (n, L * TOPK)).astype(np.float32)
        bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
        common = dict(
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=jnp.asarray(qw),
            quick_indices=jnp.asarray(qi), quick_channels=L * K)
        s = RasterizeSettings(
            image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
            tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 13,
            tile_cap=512, tile_batch=4, impl="pallas")
        narrow = rasterize(s, jnp.asarray(means), ops, view, pm,
                           jnp.zeros(3, jnp.float32), bg, **common)
        import functools as _ft
        orig = pallas_binning.pack_sort_keys
        monkeypatch.setattr(pallas_binning, "pack_sort_keys",
                            _ft.partial(orig, force_wide=True))
        wide = rasterize(s, jnp.asarray(means), ops, view, pm,
                         jnp.zeros(3, jnp.float32), bg, **common)
        np.testing.assert_allclose(wide.rgb, narrow.rgb, atol=0)
        np.testing.assert_allclose(wide.feature_map, narrow.feature_map,
                                   atol=0)

    @pytest.mark.slow
    def test_1440p_binning_matches_xla(self):
        """At a real 1440p grid (160x90 = 14,400 tiles > the 2-word key's
        13-bit field) the 3-word binning must agree with the XLA
        reference: same entry multiset per tile, same depth order."""
        n, h, w = 300, 1440, 2560
        means, scales, rots, ops, cols, view, pm, _, fovx, fovy = _scene(
            n, h, w, seed=7)
        # Small splats keep the entry total under the test budget at 3.7MP.
        scales = (np.random.default_rng(7)
                  .uniform(0.005, 0.05, (n, 3)).astype(np.float32))
        proj = projection.preprocess(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots),
            None, None, cols, view, pm, jnp.zeros(3, jnp.float32),
            math.tan(fovx / 2), math.tan(fovy / 2), w, h, 0, 1.0)
        gx, gy = -(-w // 16), -(-h // 16)
        num_tiles = gx * gy
        me = 2 ** 14
        binned = binning.bin_gaussians(proj, gx, gy, me)
        tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
            proj, gx, gy, me, interpret=True)
        assert int(total) == int(binned.total_entries)
        keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        assert len(keys) == 3                       # the wide path engaged
        g_sorted, tile_start, tile_count, _ = \
            pallas_binning.sorted_binning_from_keys(keys, num_tiles)
        np.testing.assert_array_equal(
            np.asarray(tile_start), np.asarray(binned.tile_start))
        np.testing.assert_array_equal(
            np.asarray(tile_count), np.asarray(binned.tile_count))
        t = int(binned.total_entries)
        np.testing.assert_array_equal(
            np.asarray(g_sorted)[:t], np.asarray(binned.gauss_id)[:t])

    def test_overflow_clamps_to_budget(self):
        h, w = 64, 64
        *_, proj, fovx, fovy = _scene(2000, h, w, seed=2)
        gx, gy = 4, 4
        tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
            proj, gx, gy, 512, interpret=True)
        assert int(total) <= 512
        assert tile.shape == (512,)


class TestPallasBlend:
    @pytest.fixture()
    def setup(self):
        h, w = 64, 96
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            500, h, w)
        gx, gy = -(-w // 16), -(-h // 16)
        binned = binning.bin_gaussians(proj, gx, gy, 2 ** 13)
        bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
        tid = jnp.arange(gx * gy, dtype=jnp.int32)
        return proj, ops, binned, gx, gy, bg, tid

    def test_rgb_mode(self, setup):
        proj, ops, binned, gx, gy, bg, tid = setup
        rgb_ref, _, t_ref = rasterize_tiles.blend_tiles(
            proj.xy, proj.conic, ops[:, 0], proj.rgb, None, binned,
            gx, gy, bg, 512, 4)
        rows = pallas_blend.pack_gaussian_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb)
        geom = pallas_blend.to_field_major(rows[binned.gauss_id], 256)
        dummy = jnp.zeros((1, geom.shape[1]), jnp.float32)
        rgb_p, _, t_p = pallas_blend.blend_tiles_pallas(
            geom, dummy, binned.tile_start, binned.tile_count, tid, bg,
            grid_x=gx, grid_y=gy, mode="rgb", out_channels=0, chunk=256,
            interpret=True)
        np.testing.assert_allclose(rgb_p, rgb_ref, atol=2e-5)
        np.testing.assert_allclose(t_p, t_ref, atol=2e-5)

    def test_quick_mode_packed_pairs(self, setup):
        proj, ops, binned, gx, gy, bg, tid = setup
        n = proj.xy.shape[0]
        rng = np.random.default_rng(3)
        L, K, TOPK = 3, 64, 4
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
        ).astype(np.float32)
        onehot = jax.nn.one_hot(qi.astype(np.int32), L * K, dtype=jnp.float32)
        dense = jnp.einsum("ns,nsc->nc", jnp.asarray(qw), onehot)
        _, feat_ref, _ = rasterize_tiles.blend_tiles(
            proj.xy, proj.conic, ops[:, 0], proj.rgb, dense, binned,
            gx, gy, bg, 512, 4)

        qrows, wrows = pallas_blend.pack_quick_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb,
            jnp.asarray(qw), jnp.asarray(qi))
        qgeom = pallas_blend.to_field_major(qrows[binned.gauss_id], 256)
        qfeat = pallas_blend.to_field_major(wrows[binned.gauss_id], 256)
        rgb_q, feat_q, _ = pallas_blend.blend_tiles_pallas(
            qgeom, qfeat, binned.tile_start, binned.tile_count, tid, bg,
            grid_x=gx, grid_y=gy, mode="quick", out_channels=L * K,
            topk=L * TOPK, chunk=256, interpret=True)
        np.testing.assert_allclose(feat_q, feat_ref, atol=2e-5)

    def test_empty_tile_with_misaligned_start(self, setup):
        """A REAL tile with count == 0 whose start is not 128-aligned must
        produce zero output and — critically — zero chunk iterations: the
        chunk-0 DMA is only started for tiles with count > 0, so an empty
        tile that entered the chunk loop would wait on a semaphore nothing
        signals (device hang; killed the TPU worker on the c=4
        strong-scaling strip, 218 empty tiles). Regression for
        pallas_blend n_chunks."""
        proj, ops, binned, gx, gy, bg, tid = setup
        rows = pallas_blend.pack_gaussian_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb)
        geom = pallas_blend.to_field_major(rows[binned.gauss_id], 256)
        dummy = jnp.zeros((1, geom.shape[1]), jnp.float32)
        # Empty a mid-grid tile whose start is misaligned (d > 0), the
        # exact shape of the hang.
        counts = np.asarray(binned.tile_count).copy()
        starts = np.asarray(binned.tile_start).copy()
        victims = np.nonzero((starts % 128 != 0) & (counts > 0))[0]
        assert victims.size > 0, "scene must yield a misaligned start"
        v = int(victims[0])
        counts[v] = 0
        rgb_p, _, t_p = pallas_blend.blend_tiles_pallas(
            geom, dummy, jnp.asarray(starts), jnp.asarray(counts), tid, bg,
            grid_x=gx, grid_y=gy, mode="rgb", out_channels=0, chunk=256,
            interpret=True)
        # The emptied tile renders pure background with full transmittance.
        np.testing.assert_allclose(
            np.asarray(rgb_p)[v], np.tile(np.asarray(bg), (256, 1)),
            atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_p)[v], 1.0, atol=1e-6)

    def test_dense_mode(self, setup):
        proj, ops, binned, gx, gy, bg, tid = setup
        n = proj.xy.shape[0]
        feats = jnp.asarray(
            np.random.default_rng(4).uniform(0, 1, (n, 64)).astype(np.float32))
        _, feat_ref, _ = rasterize_tiles.blend_tiles(
            proj.xy, proj.conic, ops[:, 0], proj.rgb, feats, binned,
            gx, gy, bg, 512, 4)
        rows = pallas_blend.pack_gaussian_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb)
        geom = pallas_blend.to_field_major(rows[binned.gauss_id], 256)
        ef = pallas_blend.to_field_major(feats[binned.gauss_id], 256)
        _, feat_d, _ = pallas_blend.blend_tiles_pallas(
            geom, ef, binned.tile_start, binned.tile_count, tid, bg,
            grid_x=gx, grid_y=gy, mode="dense", out_channels=64, chunk=256,
            interpret=True)
        np.testing.assert_allclose(feat_d, feat_ref, atol=2e-5)


class TestFastPathEndToEnd:
    def test_quick_rasterize_matches_xla(self):
        n, h, w = 800, 80, 112
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=2)
        rng = np.random.default_rng(2)
        L, K, TOPK = 3, 64, 4
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
        ).astype(np.float32)
        bg = jnp.asarray([0.2, 0.1, 0.4], jnp.float32)
        common = dict(
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=jnp.asarray(qw),
            quick_indices=jnp.asarray(qi), quick_channels=L * K)
        sx = RasterizeSettings(
            image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
            tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 13,
            tile_cap=512, tile_batch=4, impl="xla")
        ox = rasterize(sx, jnp.asarray(means), ops, view, pm,
                       jnp.zeros(3, jnp.float32), bg, **common)
        op_ = rasterize(sx._replace(impl="pallas"), jnp.asarray(means), ops,
                        view, pm, jnp.zeros(3, jnp.float32), bg, **common)
        np.testing.assert_allclose(op_.rgb, ox.rgb, atol=3e-5)
        np.testing.assert_allclose(op_.feature_map, ox.feature_map, atol=3e-5)
        np.testing.assert_allclose(op_.final_transmittance,
                                   ox.final_transmittance, atol=3e-5)

    def test_quick_fast16_close_to_parity(self):
        """precision="bf16" (fast16 packed single-gather serving path) must
        stay within the documented ~1e-2 envelope of the parity path, and
        assemble=False must return the same feature map in tile layout."""
        from langsplatv2_tpu.ops import rasterize_tiles as rt

        n, h, w = 800, 80, 112
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=2)
        rng = np.random.default_rng(2)
        L, K, TOPK = 3, 64, 4
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
        ).astype(np.float32)
        bg = jnp.asarray([0.2, 0.1, 0.4], jnp.float32)
        common = dict(
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=jnp.asarray(qw),
            quick_indices=jnp.asarray(qi), quick_channels=L * K)
        sp = RasterizeSettings(
            image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
            tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 13,
            tile_cap=512, tile_batch=4, impl="pallas", binning="sort")
        ref = rasterize(sp, jnp.asarray(means), ops, view, pm,
                        jnp.zeros(3, jnp.float32), bg, **common)
        fast = rasterize(sp._replace(precision="bf16"), jnp.asarray(means),
                         ops, view, pm, jnp.zeros(3, jnp.float32), bg,
                         **common)
        # bf16-packed conic/opacity/weights: ~0.4% relative; compare against
        # the value scale of each map.
        np.testing.assert_allclose(fast.rgb, ref.rgb, atol=2e-2)
        np.testing.assert_allclose(fast.feature_map, ref.feature_map,
                                   atol=2e-2)
        np.testing.assert_allclose(fast.final_transmittance,
                                   ref.final_transmittance, atol=2e-2)

        tiles = rasterize(sp._replace(precision="bf16", assemble=False),
                          jnp.asarray(means), ops, view, pm,
                          jnp.zeros(3, jnp.float32), bg, **common)
        gx, gy = sp.grid_x, sp.grid_y
        assert tiles.feature_map.shape == (gx * gy, 256, L * K)
        reassembled = rt.tiles_to_image(tiles.feature_map, gx, gy, h, w)
        np.testing.assert_allclose(reassembled, fast.feature_map, atol=1e-6)

        # bf16 cell math (2x VPU lane packing) must stay inside the
        # documented ~1e-2-relative fast-mode envelope of the parity path.
        cells = rasterize(
            sp._replace(precision="bf16", bf16_cells=True),
            jnp.asarray(means), ops, view, pm, jnp.zeros(3, jnp.float32),
            bg, **common)
        np.testing.assert_allclose(cells.rgb, ref.rgb, atol=4e-2)
        np.testing.assert_allclose(cells.feature_map, ref.feature_map,
                                   atol=4e-2)
        np.testing.assert_allclose(cells.final_transmittance,
                                   ref.final_transmittance, atol=4e-2)

    def test_fused_query_matches_unfused(self):
        """The kernel-fused Gram query (rasterize_quick_query) must match
        the XLA query computed from the unfused fast16 weight-map tiles:
        raw[l,q,p] = sum_k wm[l,k] phi[l,k,p], nrm2[l,q] = wm Gram wm."""
        from langsplatv2_tpu.ops.rasterize import rasterize_quick_query

        n, h, w = 800, 80, 112
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=2)
        rng = np.random.default_rng(3)
        L, K, TOPK, PQ = 3, 64, 4, 5
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
        ).astype(np.float32)
        cb = rng.normal(size=(L, K, 64)).astype(np.float32)
        phrases = rng.normal(size=(PQ, 64)).astype(np.float32)
        phi = jnp.einsum("lkd,pd->lkp", jnp.asarray(cb), jnp.asarray(phrases))
        gram = jnp.einsum("lkd,lmd->lkm", jnp.asarray(cb), jnp.asarray(cb))
        bg = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
        sp = RasterizeSettings(
            image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
            tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 13,
            tile_cap=512, tile_batch=4, impl="pallas", binning="sort",
            precision="bf16", assemble=False,
            # f32 output tiles: compare the fused kernel against the
            # unquantized unfused reference so the tolerance stays at the
            # bf16-einsum envelope, not einsum + one output quantization.
            feat_bf16=False)
        unfused = rasterize(
            sp, jnp.asarray(means), ops, view, pm, jnp.zeros(3, jnp.float32),
            bg, scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=jnp.asarray(qw),
            quick_indices=jnp.asarray(qi), quick_channels=L * K)
        wm = np.asarray(unfused.feature_map).reshape(-1, L, K)  # [Q, L, K]
        raw_ref = np.einsum("qlk,lkp->qlp", wm, np.asarray(phi))
        wg = np.einsum("qlk,lkm->qlm", wm, np.asarray(gram))
        nrm2_ref = np.einsum("qlk,qlk->ql", wg, wm)

        rgb, raw_t, nrm2_t, final_t, radii, total, live = \
            rasterize_quick_query(
                sp, jnp.asarray(means), ops, view, pm,
                jnp.zeros(3, jnp.float32), bg,
                scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
                colors_precomp=cols, quick_weights=jnp.asarray(qw),
                quick_indices=jnp.asarray(qi), phi=phi, gram=gram,
                quick_channels=L * K)
        assert raw_t.shape == (sp.grid_x * sp.grid_y, 256, L * PQ)
        assert nrm2_t.shape == (sp.grid_x * sp.grid_y, 256, L)
        raw = np.asarray(raw_t).reshape(-1, L, PQ)
        nrm2 = np.asarray(nrm2_t).reshape(-1, L)
        scale_r = np.abs(raw_ref).max() + 1e-6
        scale_n = np.abs(nrm2_ref).max() + 1e-6
        # In-kernel matmuls use the same bf16-pass fidelity as the XLA
        # einsum query; only FMA ordering differs (the unfused reference
        # runs with feat_bf16=False so no output quantization is absorbed).
        np.testing.assert_allclose(raw / scale_r, raw_ref / scale_r,
                                   atol=5e-3)
        np.testing.assert_allclose(nrm2 / scale_n, nrm2_ref / scale_n,
                                   atol=5e-3)
        np.testing.assert_allclose(rgb, unfused.rgb, atol=1e-5)
        assert int(live) == int(np.asarray(live))

        # The fused query with bf16 cell math: same answer at the ~1e-2
        # relative fast-mode envelope.
        _, raw_c, nrm2_c, _, _, _, _ = rasterize_quick_query(
            sp._replace(bf16_cells=True), jnp.asarray(means), ops, view, pm,
            jnp.zeros(3, jnp.float32), bg,
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=jnp.asarray(qw),
            quick_indices=jnp.asarray(qi), phi=phi, gram=gram,
            quick_channels=L * K)
        np.testing.assert_allclose(
            np.asarray(raw_c).reshape(-1, L, PQ) / scale_r,
            raw_ref / scale_r, atol=3e-2)
        np.testing.assert_allclose(
            np.asarray(nrm2_c).reshape(-1, L) / scale_n,
            nrm2_ref / scale_n, atol=3e-2)

    def test_live_entries_prefix_is_output_preserving(self):
        """Sizing the gather/blend to the post-cull live total (dead
        entries sort to the end) must not change any output pixel."""
        n, h, w = 800, 80, 112
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=4)
        rng = np.random.default_rng(4)
        L, K, TOPK = 3, 64, 4
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
        ).astype(np.float32)
        bg = jnp.asarray([0.2, 0.1, 0.4], jnp.float32)
        common = dict(
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=jnp.asarray(qw),
            quick_indices=jnp.asarray(qi), quick_channels=L * K)
        sp = RasterizeSettings(
            image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
            tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 13,
            tile_cap=512, tile_batch=4, impl="pallas", binning="sort")
        full = rasterize(sp, jnp.asarray(means), ops, view, pm,
                         jnp.zeros(3, jnp.float32), bg, **common)
        n_live = int(full.live_total)
        assert 0 < n_live < 2 ** 13  # the cull must actually kill entries
        live_budget = -(-n_live // 128) * 128
        tight = rasterize(sp._replace(live_entries=live_budget),
                          jnp.asarray(means), ops, view, pm,
                          jnp.zeros(3, jnp.float32), bg, **common)
        np.testing.assert_allclose(tight.rgb, full.rgb, atol=1e-6)
        np.testing.assert_allclose(tight.feature_map, full.feature_map,
                                   atol=1e-6)
        assert int(tight.live_total) == n_live

        # An under-sized live budget must clamp loudly, not corrupt: the
        # reported live_total still exceeds the budget.
        clamped = rasterize(sp._replace(live_entries=128),
                            jnp.asarray(means), ops, view, pm,
                            jnp.zeros(3, jnp.float32), bg, **common)
        assert int(clamped.live_total) == n_live > 128


class TestBudgetCappedBinning:
    def test_budget_counts_matches_numpy(self):
        rng = np.random.default_rng(0)
        t_counts = np.array([0, 1, 5, 40, 3], np.int32)
        starts = np.concatenate([[0], np.cumsum(t_counts)[:-1]]).astype(
            np.int32)
        e = int(t_counts.sum()) + 7                   # trailing dead pad
        alpha = rng.uniform(0.05, 0.9, e).astype(np.float32)
        lm = np.log1p(-alpha)
        lm[t_counts.sum():] = 0.0
        budget = 1e-2
        kept = pallas_binning.budget_counts(
            jnp.asarray(lm), jnp.asarray(starts), jnp.asarray(t_counts),
            budget)
        logb = np.log(budget)
        for t in range(len(t_counts)):
            want = 0
            p = 0.0
            for j in range(t_counts[t]):
                if p < logb:
                    break
                want += 1
                p += lm[starts[t] + j]
            assert int(kept[t]) == want, (t, int(kept[t]), want)

    def _quick_scene(self, seed=4):
        n, h, w = 800, 80, 112
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=seed)
        rng = np.random.default_rng(seed)
        L, K, TOPK = 3, 64, 4
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
        ).astype(np.float32)
        bg = jnp.asarray([0.2, 0.1, 0.4], jnp.float32)
        common = dict(
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=jnp.asarray(qw),
            quick_indices=jnp.asarray(qi), quick_channels=L * K)
        sp = RasterizeSettings(
            image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
            tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 13,
            tile_cap=512, tile_batch=4, impl="pallas", binning="sort",
            precision="bf16")
        args = (jnp.asarray(means), ops, view, pm,
                jnp.zeros(3, jnp.float32), bg)
        return sp, args, common

    def test_tiny_budget_is_output_preserving(self):
        """With a budget below any reachable bound (scene alphas <= 0.95,
        so per-sub-box prefixes stay above log(1e-300)) and a cap above
        the max tile depth, the capped layout must reproduce the standard
        fast16 path (same entries per tile, aligned instead of ragged)."""
        sp, args, common = self._quick_scene()
        # feat_bf16 off: the structural check compares f32 tiles so a
        # genuine sub-1e-2 regression in the capped layout cannot hide
        # under bf16 output quantization.
        sp = sp._replace(feat_bf16=False)
        full = rasterize(sp, *args, **common)
        assert int(full.max_tile_count) <= 256
        capped = rasterize(
            sp._replace(tile_budget=1e-300, tile_budget_cap=256),
            *args, **common)
        np.testing.assert_allclose(capped.rgb, full.rgb, atol=1e-5)
        np.testing.assert_allclose(capped.feature_map, full.feature_map,
                                   atol=1e-5)
        np.testing.assert_allclose(capped.final_transmittance,
                                   full.final_transmittance, atol=1e-5)
        assert int(capped.live_total) == int(full.live_total)

    def test_aggressive_budget_drops_and_stays_close(self):
        """A serving-grade budget must actually cut entries while keeping
        the output within the (sub-box-bound) error scale."""
        sp, args, common = self._quick_scene()
        full = rasterize(sp, *args, **common)
        capped = rasterize(
            sp._replace(tile_budget=1e-6, tile_budget_cap=128),
            *args, **common)
        assert int(capped.live_total) < int(full.live_total)
        assert np.isfinite(np.asarray(capped.rgb)).all()
        d = np.abs(np.asarray(capped.rgb) - np.asarray(full.rgb))
        assert d.max() < 2e-1 and d.mean() < 5e-3, (d.max(), d.mean())
        df = np.abs(np.asarray(capped.feature_map)
                    - np.asarray(full.feature_map))
        assert df.max() < 2e-1 and df.mean() < 5e-3, (df.max(), df.mean())

        # Finer sub-boxes must tighten the bound: subdiv=4 keeps more
        # entries and lands closer to the exact output.
        fine = rasterize(
            sp._replace(tile_budget=1e-6, tile_budget_cap=128,
                        tile_budget_subdiv=4),
            *args, **common)
        d4 = np.abs(np.asarray(fine.rgb) - np.asarray(full.rgb))
        assert int(fine.live_total) >= int(capped.live_total)
        assert d4.max() <= d.max() + 1e-6

    def test_fused_query_capped(self):
        """rasterize_quick_query honors tile_budget: tiny budget + big cap
        reproduces its own standard output."""
        from langsplatv2_tpu.ops.rasterize import rasterize_quick_query

        sp, args, common = self._quick_scene()
        rng = np.random.default_rng(5)
        L, K, PQ = 3, 64, 5
        cb = rng.normal(size=(L, K, 32)).astype(np.float32)
        phrases = rng.normal(size=(PQ, 32)).astype(np.float32)
        phi = jnp.einsum("lkd,pd->lkp", jnp.asarray(cb), jnp.asarray(phrases))
        gram = jnp.einsum("lkd,lmd->lkm", jnp.asarray(cb), jnp.asarray(cb))
        sp = sp._replace(assemble=False)
        kw = dict(common)
        kw.pop("quick_channels")
        ref = rasterize_quick_query(sp, *args, **kw, phi=phi, gram=gram,
                                    quick_channels=192)
        cap = rasterize_quick_query(
            sp._replace(tile_budget=1e-300, tile_budget_cap=256),
            *args, **kw, phi=phi, gram=gram, quick_channels=192)
        np.testing.assert_allclose(cap[0], ref[0], atol=1e-5)   # rgb
        np.testing.assert_allclose(cap[1], ref[1], atol=1e-4)   # raw
        np.testing.assert_allclose(cap[2], ref[2], atol=1e-4)   # nrm2

    def test_capped_relevancy_iou(self):
        """Eval-metric validation of the approximate mode: the relevancy
        masks (cosine sim thresholded the way the LERF eval does) from a
        serving-grade budget must overlap the exact masks at IoU >= 0.95."""
        from langsplatv2_tpu.ops.rasterize import rasterize_quick_query

        sp, args, common = self._quick_scene()
        rng = np.random.default_rng(6)
        L, K, PQ = 3, 64, 2
        cb = rng.normal(size=(L, K, 32)).astype(np.float32)
        phrases = rng.normal(size=(PQ, 32)).astype(np.float32)
        phrases /= np.linalg.norm(phrases, axis=1, keepdims=True)
        phi = jnp.einsum("lkd,pd->lkp", jnp.asarray(cb), jnp.asarray(phrases))
        gram = jnp.einsum("lkd,lmd->lkm", jnp.asarray(cb), jnp.asarray(cb))
        sp = sp._replace(assemble=False)
        kw = dict(common)
        kw.pop("quick_channels")

        def masks(settings):
            _, raw_t, nrm2_t, _, _, _, _ = rasterize_quick_query(
                settings, *args, **kw, phi=phi, gram=gram,
                quick_channels=192)
            raw = np.asarray(raw_t).reshape(-1, L, PQ)
            nrm = np.sqrt(np.maximum(np.asarray(nrm2_t).reshape(-1, L), 0))
            sim = raw / (nrm[..., None] + 1e-10)
            return sim > 0.18                       # mid-scale threshold

        m_ref = masks(sp)
        m_cap = masks(sp._replace(tile_budget=1e-6, tile_budget_cap=128))
        inter = np.logical_and(m_ref, m_cap).sum()
        union = np.logical_or(m_ref, m_cap).sum()
        assert union > 0                            # threshold actually cuts
        iou = inter / union
        assert iou >= 0.95, iou


class TestDenseCustomVJP:
    def test_feature_grads_match_xla_autodiff(self):
        n, h, w = 300, 48, 64
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.uniform(0, 1, (n, 64)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(64, h, w)).astype(np.float32))

        def make_loss(impl):
            st = RasterizeSettings(
                image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
                tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 12,
                tile_cap=256, tile_batch=4, impl=impl)

            def loss(f):
                out = rasterize(
                    st, jnp.asarray(means), ops, view, pm,
                    jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                    scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
                    colors_precomp=cols, features=f)
                return jnp.sum(out.feature_map * cot)
            return loss

        v_x, g_x = jax.value_and_grad(make_loss("xla"))(feats)
        v_p, g_p = jax.value_and_grad(make_loss("pallas"))(feats)
        np.testing.assert_allclose(v_p, v_x, rtol=1e-5)
        np.testing.assert_allclose(g_p, g_x, atol=3e-5)


class TestQuickTrainVJP:
    def test_weight_grads_match_xla_autodiff(self):
        """Feature training via the top-k representation (quick_train=True):
        the Pallas quick forward + W-replay backward must match the XLA
        differentiable quick path's d(quick_weights)."""
        n, h, w = 300, 48, 64
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w)
        rng = np.random.default_rng(0)
        K, TOPK = 64, 4
        logits = rng.normal(size=(n, K)).astype(np.float32)
        from langsplatv2_tpu.utils.sparse_codes import get_weights_and_indices
        qw0, qi = get_weights_and_indices(jnp.asarray(logits), TOPK)
        cot = jnp.asarray(rng.normal(size=(K, h, w)).astype(np.float32))

        def make_loss(impl, live_entries=0):
            st = RasterizeSettings(
                image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
                tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 12,
                tile_cap=256, tile_batch=4, impl=impl,
                live_entries=live_entries)

            def loss(qw):
                out = rasterize(
                    st, jnp.asarray(means), ops, view, pm,
                    jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                    scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
                    colors_precomp=cols, quick_weights=qw, quick_indices=qi,
                    quick_channels=K, quick_train=True)
                return jnp.sum(out.feature_map * cot), out.live_total
            return lambda qw: loss(qw)[0], loss

        v_x, g_x = jax.value_and_grad(make_loss("xla")[0])(qw0)
        v_p, g_p = jax.value_and_grad(make_loss("pallas")[0])(qw0)
        np.testing.assert_allclose(v_p, v_x, rtol=1e-5)
        np.testing.assert_allclose(g_p, g_x, atol=3e-5)

        # live-prefix clamp (settings.live_entries, trainer contract):
        # value and grads identical when the prefix covers live_total
        _, live_total = make_loss("pallas")[1](qw0)
        live = -(-int(live_total) // 128) * 128
        assert live < 2 ** 12, "test scene must leave slack for the clamp"
        v_l, g_l = jax.value_and_grad(make_loss("pallas", live)[0])(qw0)
        np.testing.assert_allclose(v_l, v_p, rtol=1e-6)
        np.testing.assert_allclose(g_l, g_p, atol=1e-6)

    def test_capped_mode_grads(self):
        """Budget-capped TRAINING (settings.tile_budget on the quick-train
        route): at an uncrossable budget with a covering cap the forward
        and d(quick_weights) must reproduce the standard Pallas path; at a
        serving-grade budget entries must actually drop with finite,
        close grads."""
        n, h, w = 300, 48, 64
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w)
        rng = np.random.default_rng(0)
        K, TOPK = 64, 4
        logits = rng.normal(size=(n, K)).astype(np.float32)
        from langsplatv2_tpu.utils.sparse_codes import get_weights_and_indices
        qw0, qi = get_weights_and_indices(jnp.asarray(logits), TOPK)
        cot = jnp.asarray(rng.normal(size=(K, h, w)).astype(np.float32))

        def make_loss(budget, cap=256):
            st = RasterizeSettings(
                image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
                tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 12,
                tile_cap=256, tile_batch=4, impl="pallas",
                tile_budget=budget, tile_budget_cap=cap)

            def loss(qw):
                out = rasterize(
                    st, jnp.asarray(means), ops, view, pm,
                    jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                    scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
                    colors_precomp=cols, quick_weights=qw, quick_indices=qi,
                    quick_channels=K, quick_train=True)
                return jnp.sum(out.feature_map * cot), out.live_total
            return lambda qw: loss(qw)[0], loss

        v_ref, g_ref = jax.value_and_grad(make_loss(0.0)[0])(qw0)
        v_cap, g_cap = jax.value_and_grad(make_loss(1e-300)[0])(qw0)
        np.testing.assert_allclose(v_cap, v_ref, rtol=1e-5)
        np.testing.assert_allclose(g_cap, g_ref, atol=1e-5)

        # Aggressive budget: entries drop, grads stay finite and close.
        _, lt_ref = make_loss(0.0)[1](qw0)
        v_a, g_a = jax.value_and_grad(make_loss(1e-6, cap=128)[0])(qw0)
        _, lt_a = make_loss(1e-6, cap=128)[1](qw0)
        assert int(lt_a) < int(lt_ref)
        assert np.isfinite(np.asarray(g_a)).all()
        denom = max(float(jnp.abs(g_ref).max()), 1e-8)
        assert float(jnp.abs(g_a - g_ref).max()) / denom < 0.2


class TestRGBCustomVJP:
    def test_geometry_grads_match_xla_autodiff(self):
        """RGB-phase backward (pallas_rgb_train.py): d(means3D, opacity,
        scales, rotations, colors, means2D carrier) must match the XLA
        reference pipeline's autodiff — the SURVEY §2.3(a).4 backward
        contract for the geometry phase."""
        n, h, w = 300, 48, 64
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w)
        rng = np.random.default_rng(1)
        cot_rgb = jnp.asarray(rng.normal(size=(3, h, w)).astype(np.float32))
        cot_t = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))
        bg = jnp.asarray([0.3, 0.1, 0.2], jnp.float32)

        def make_loss(impl):
            st = RasterizeSettings(
                image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
                tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 12,
                tile_cap=256, tile_batch=4, impl=impl, binning="sort")

            def loss(means3d, op_, sc, ro, co, dummy):
                out = rasterize(
                    st, means3d, op_, view, pm, jnp.zeros(3, jnp.float32),
                    bg, scales=sc, rotations=ro, colors_precomp=co,
                    means2d_dummy=dummy)
                return (jnp.sum(out.rgb * cot_rgb)
                        + jnp.sum(out.final_transmittance * cot_t))
            return loss

        args = (jnp.asarray(means), ops, jnp.asarray(scales),
                jnp.asarray(rots), cols, jnp.zeros((n, 2), jnp.float32))
        v_x, g_x = jax.value_and_grad(
            make_loss("xla"), argnums=(0, 1, 2, 3, 4, 5))(*args)
        v_p, g_p = jax.value_and_grad(
            make_loss("pallas"), argnums=(0, 1, 2, 3, 4, 5))(*args)
        np.testing.assert_allclose(v_p, v_x, rtol=1e-4)
        names = ("means3d", "opacity", "scales", "rotations", "colors",
                 "means2d")
        for nm, gp, gx in zip(names, g_p, g_x):
            scale = max(1e-3, float(jnp.abs(gx).max()))
            np.testing.assert_allclose(
                np.asarray(gp) / scale, np.asarray(gx) / scale, atol=5e-5,
                err_msg=nm)


class TestCascadeBinning:
    """Partition-cascade binning (ops/pallas_cascade.py) must reproduce the
    sort+gather pipeline exactly: same per-tile entry multisets, same depth
    order, same (depth-bits, gauss-id) tie-break, same exact-cull set."""

    def _quick(self, n):
        rng = np.random.default_rng(7)
        L, K, TOPK = 3, 64, 4
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
        ).astype(np.float32)
        return jnp.asarray(qw), jnp.asarray(qi), L * K

    @pytest.mark.parametrize("hw,seed", [((80, 112), 2), ((160, 288), 5)])
    def test_quick_matches_xla_multiband(self, hw, seed):
        """160x288 -> 18x10 tile grid: 2 bands x 3 supertile columns, so all
        four cascade levels do real routing (not 1-bucket passthroughs)."""
        h, w = hw
        n = 900
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=seed)
        qw, qi, qc = self._quick(n)
        bg = jnp.asarray([0.3, 0.2, 0.1], jnp.float32)
        common = dict(
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=qw, quick_indices=qi,
            quick_channels=qc)
        sx = RasterizeSettings(
            image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
            tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 17,
            tile_cap=2048, tile_batch=4, impl="xla")
        ox = rasterize(sx, jnp.asarray(means), ops, view, pm,
                       jnp.zeros(3, jnp.float32), bg, **common)
        oc = rasterize(sx._replace(impl="pallas", binning="cascade"),
                       jnp.asarray(means), ops, view, pm,
                       jnp.zeros(3, jnp.float32), bg, **common)
        np.testing.assert_allclose(oc.rgb, ox.rgb, atol=3e-5)
        np.testing.assert_allclose(oc.feature_map, ox.feature_map, atol=3e-5)
        np.testing.assert_allclose(oc.final_transmittance,
                                   ox.final_transmittance, atol=3e-5)

    def test_segments_match_sort_binning(self):
        """Tile segments (count + depth-ordered gaussian identity) must equal
        the packed-key sort path's, including exact-cull decisions."""
        from langsplatv2_tpu.ops import pallas_binning, pallas_cascade

        n, h, w = 700, 96, 144  # grid 9x6: 1 band boundary in y, 2 in x
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=9)
        gx, gy = 9, 6
        num_tiles = gx * gy
        tile, depth, gauss, _ = pallas_binning.expand_entries_pallas(
            proj, gx, gy, 2 ** 13, opacities=ops[:, 0], exact_cull=True,
            interpret=True)
        hi, lo = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        g_sorted, ts, tc, _ = pallas_binning.sorted_binning_from_keys(
            hi, lo, num_tiles)
        ts, tc = np.asarray(ts), np.asarray(tc)
        g_sorted = np.asarray(g_sorted)

        geom_rows, feat_rows = pallas_cascade.pack_cascade_rows(
            proj, ops[:, 0], None, None)
        entries, cts, ctc, tot, ovf = pallas_cascade.cascade_binning(
            geom_rows, feat_rows, proj.depth, gx, gy, budget4=2 ** 13,
            interpret=True)
        entries, cts, ctc = np.asarray(entries), np.asarray(cts), np.asarray(ctc)
        assert not bool(ovf)
        assert int(tot) == tc.sum()
        xyv = np.asarray(proj.xy)
        for t in range(num_tiles):
            assert ctc[t] == tc[t], (t, ctc[t], tc[t])
            sort_xy = xyv[g_sorted[ts[t]:ts[t] + tc[t]]]
            casc_x = entries[0, cts[t]:cts[t] + ctc[t]]
            casc_y = entries[1, cts[t]:cts[t] + ctc[t]]
            np.testing.assert_array_equal(sort_xy[:, 0], casc_x, err_msg=f"tile {t}")
            np.testing.assert_array_equal(sort_xy[:, 1], casc_y, err_msg=f"tile {t}")

    def test_budget_overflow_flag(self):
        from langsplatv2_tpu.ops import pallas_cascade

        n, h, w = 700, 96, 144
        means, scales, rots, ops, cols, view, pm, proj, fovx, fovy = _scene(
            n, h, w, seed=9)
        geom_rows, feat_rows = pallas_cascade.pack_cascade_rows(
            proj, ops[:, 0], None, None)
        _, _, ctc, tot, ovf = pallas_cascade.cascade_binning(
            geom_rows, feat_rows, proj.depth, 9, 6, budget4=512,
            interpret=True)
        assert bool(ovf)
        assert int(tot) <= 512


class TestCullAlpha:
    """settings.cull_alpha: the opt-in expansion-side approximation for the
    capped serving mode (raise the exact-cull alpha threshold; tile rects
    shrink to the same bound). Default 1/255 stays output-preserving (the
    whole existing parity suite pins that); this pins the knob itself."""

    def test_higher_cull_drops_entries_and_stays_close(self):
        tb = TestBudgetCappedBinning()
        sp, args, common = tb._quick_scene()
        exact = rasterize(sp, *args, **common)
        capped = rasterize(
            sp._replace(tile_budget=1e-6, tile_budget_cap=128),
            *args, **common)
        culled = rasterize(
            sp._replace(tile_budget=1e-6, tile_budget_cap=128,
                        cull_alpha=1.0 / 32.0),
            *args, **common)
        assert int(culled.total_entries) < int(capped.total_entries)
        assert int(culled.live_total) <= int(capped.live_total)
        d = np.abs(np.asarray(culled.rgb) - np.asarray(exact.rgb))
        assert d.max() < 2e-1 and d.mean() < 1e-2, (d.max(), d.mean())
        df = np.abs(np.asarray(culled.feature_map)
                    - np.asarray(exact.feature_map))
        assert df.max() < 2e-1 and df.mean() < 1e-2, (df.max(), df.mean())

    def test_cull_alpha_relevancy_iou(self):
        """The eval-metric gate at the serving config (budget 1e-6 /
        cap 128 / cull 1/32): relevancy masks vs exact at IoU >= 0.95 —
        the same pin the tile_budget mode ships under."""
        from langsplatv2_tpu.ops.rasterize import rasterize_quick_query

        tb = TestBudgetCappedBinning()
        sp, args, common = tb._quick_scene()
        rng = np.random.default_rng(6)
        L, K, PQ = 3, 64, 2
        cb = rng.normal(size=(L, K, 32)).astype(np.float32)
        phrases = rng.normal(size=(PQ, 32)).astype(np.float32)
        phrases /= np.linalg.norm(phrases, axis=1, keepdims=True)
        phi = jnp.einsum("lkd,pd->lkp", jnp.asarray(cb), jnp.asarray(phrases))
        gram = jnp.einsum("lkd,lmd->lkm", jnp.asarray(cb), jnp.asarray(cb))
        sp = sp._replace(assemble=False)
        kw = dict(common)
        kw.pop("quick_channels")

        def masks(settings):
            _, raw_t, nrm2_t, _, _, _, _ = rasterize_quick_query(
                settings, *args, **kw, phi=phi, gram=gram,
                quick_channels=192)
            raw = np.asarray(raw_t).reshape(-1, L, PQ)
            nrm = np.sqrt(np.maximum(np.asarray(nrm2_t).reshape(-1, L), 0))
            sim = raw / (nrm[..., None] + 1e-10)
            return sim > 0.18

        m_ref = masks(sp)
        m_cull = masks(sp._replace(tile_budget=1e-6, tile_budget_cap=128,
                                   cull_alpha=1.0 / 32.0))
        inter = np.logical_and(m_ref, m_cull).sum()
        union = np.logical_or(m_ref, m_cull).sum()
        assert union > 0
        assert inter / union >= 0.95, inter / union
