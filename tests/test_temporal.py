"""Temporal-coherence binning reuse (ops/temporal.py).

Contract under test:
- a steady frame at the SAME pose as the bin frame reproduces the fresh
  budget-capped render exactly (same entries, same math — the cache is a
  re-gather, not an approximation, at delta = 0),
- the approximation error grows with the pose delta and is small at
  serving-scale deltas,
- entries pushed behind the near plane by camera motion are masked, not
  rendered as ghosts.

Reference behavior covered: the interactive serving loop
`backend_renderer.py:161-246` (smooth camera paths re-rendered per
request).
"""
import math

import jax.numpy as jnp
import numpy as np

from langsplatv2_tpu.ops import rasterize_tiles
from langsplatv2_tpu.ops.rasterize import RasterizeSettings, rasterize
from langsplatv2_tpu.ops import temporal
from langsplatv2_tpu.utils.camera_math import (
    get_world_to_view, get_projection_matrix)


def _rot_y(theta):
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _camera(h, w, R=None, t=None):
    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * w / h)
    R = np.eye(3) if R is None else R
    t = np.zeros(3) if t is None else t
    w2c = get_world_to_view(R, t)
    view = jnp.asarray(w2c.T, jnp.float32)
    pm = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T, jnp.float32)
    campos = jnp.asarray(np.linalg.inv(w2c.T)[3, :3], jnp.float32)
    return view, pm, campos, fovx, fovy


class TestTemporalReuse:
    def _scene(self, seed=4, n=800, h=80, w=112):
        rng = np.random.default_rng(seed)
        means = np.concatenate(
            [rng.uniform(-2, 2, (n, 2)), rng.uniform(1.0, 8.0, (n, 1))], 1
        ).astype(np.float32)
        scales = rng.uniform(0.02, 0.3, (n, 3)).astype(np.float32)
        rots = rng.normal(size=(n, 4)).astype(np.float32)
        ops = jnp.asarray(rng.uniform(0.1, 0.95, (n, 1)).astype(np.float32))
        cols = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        L, K, TOPK = 3, 64, 4
        qw = rng.uniform(0, 1, (n, L * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [rng.integers(0, K, (n, TOPK)) + l * K for l in range(L)], 1
        ).astype(np.float32)
        view, pm, campos, fovx, fovy = _camera(h, w)
        sp = RasterizeSettings(
            image_height=h, image_width=w, tanfovx=math.tan(fovx / 2),
            tanfovy=math.tan(fovy / 2), sh_degree=0, max_entries=2 ** 13,
            tile_cap=512, tile_batch=4, impl="pallas", binning="sort",
            precision="bf16", tile_budget=1e-6, tile_budget_cap=128)
        scene = dict(
            means3d=jnp.asarray(means), opacities=ops,
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=cols, quick_weights=jnp.asarray(qw),
            quick_indices=jnp.asarray(qi))
        return sp, scene, (h, w), fovx

    def _fresh(self, sp, scene, view, pm, campos, bg):
        """Fresh capped render through the SAME cov3d formulation the
        steady path uses (cov3d_precomp), so delta=0 comparisons are
        float-exact rather than tolerance games."""
        cov3d = temporal.build_cov3d(scene["scales"], scene["rotations"])
        return rasterize(
            sp, scene["means3d"], scene["opacities"], view, pm, campos, bg,
            cov3d_precomp=cov3d, colors_precomp=scene["colors_precomp"],
            quick_weights=scene["quick_weights"],
            quick_indices=scene["quick_indices"], quick_channels=192)

    def test_same_pose_is_exact(self):
        sp, scene, (h, w), _ = self._scene()
        view, pm, campos, *_ = _camera(h, w)
        bg = jnp.asarray([0.2, 0.1, 0.4], jnp.float32)

        cache, _ = temporal.quick_bin_cache(
            sp, scene["means3d"], scene["opacities"], view, pm, campos,
            scales=scene["scales"], rotations=scene["rotations"],
            colors_precomp=scene["colors_precomp"],
            quick_weights=scene["quick_weights"],
            quick_indices=scene["quick_indices"])
        rgb_t, feat_t, t_t = temporal.rasterize_quick_steady(
            sp, cache, view, pm, bg, quick_channels=192, topk=12)
        rgb = rasterize_tiles.tiles_to_image(rgb_t, sp.grid_x, sp.grid_y,
                                             h, w)
        feat = rasterize_tiles.tiles_to_image(
            feat_t.astype(jnp.float32), sp.grid_x, sp.grid_y, h, w)

        fresh = self._fresh(sp, scene, view, pm, campos, bg)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(fresh.rgb),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(feat),
                                   np.asarray(fresh.feature_map), atol=1e-6)
        assert int(cache.live_total) == int(fresh.live_total)

    def test_error_grows_with_pose_delta(self):
        sp, scene, (h, w), fovx = self._scene()
        view0, pm0, campos0, *_ = _camera(h, w)
        bg = jnp.zeros(3, jnp.float32)
        cache, _ = temporal.quick_bin_cache(
            sp, scene["means3d"], scene["opacities"], view0, pm0, campos0,
            scales=scene["scales"], rotations=scene["rotations"],
            colors_precomp=scene["colors_precomp"],
            quick_weights=scene["quick_weights"],
            quick_indices=scene["quick_indices"])

        f_px = 0.5 * w / math.tan(fovx / 2)

        def err_at(px):
            theta = px / f_px
            view, pm, campos, *_ = _camera(h, w, R=_rot_y(theta))
            rgb_t, _, _ = temporal.rasterize_quick_steady(
                sp, cache, view, pm, bg, quick_channels=192, topk=12)
            rgb = rasterize_tiles.tiles_to_image(
                rgb_t, sp.grid_x, sp.grid_y, h, w)
            fresh = self._fresh(sp, scene, view, pm, campos, bg)
            d = np.abs(np.asarray(rgb) - np.asarray(fresh.rgb))
            return float(d.mean())

        e_small = err_at(1.0)
        e_big = err_at(12.0)
        assert np.isfinite(e_small) and np.isfinite(e_big)
        assert e_small < 2e-2, e_small       # ~1 px drift: small mean error
        assert e_big > e_small               # drift error is monotone-ish

    def test_behind_camera_entries_masked(self):
        sp, scene, (h, w), _ = self._scene()
        view0, pm0, campos0, *_ = _camera(h, w)
        bg = jnp.zeros(3, jnp.float32)
        cache, _ = temporal.quick_bin_cache(
            sp, scene["means3d"], scene["opacities"], view0, pm0, campos0,
            scales=scene["scales"], rotations=scene["rotations"],
            colors_precomp=scene["colors_precomp"],
            quick_weights=scene["quick_weights"],
            quick_indices=scene["quick_indices"])
        # Teleport far forward: most cached entries are now behind the
        # camera. Output must stay finite with no NaN/ghost blow-ups.
        view, pm, campos, *_ = _camera(h, w, t=np.array([0, 0, -6.0]))
        rgb_t, feat_t, t_t = temporal.rasterize_quick_steady(
            sp, cache, view, pm, bg, quick_channels=192, topk=12)
        assert np.isfinite(np.asarray(rgb_t)).all()
        assert np.isfinite(np.asarray(feat_t, dtype=np.float32)).all()
        assert np.isfinite(np.asarray(t_t)).all()

    def test_fused_query_steady_is_deterministic_and_finite(self):
        sp, scene, (h, w), _ = self._scene()
        view, pm, campos, *_ = _camera(h, w)
        bg = jnp.zeros(3, jnp.float32)
        rng = np.random.default_rng(7)
        L, K, PQ = 3, 64, 2
        cb = rng.normal(size=(L, K, 32)).astype(np.float32)
        phrases = rng.normal(size=(PQ, 32)).astype(np.float32)
        phi = jnp.einsum("lkd,pd->lkp", jnp.asarray(cb), jnp.asarray(phrases))
        gram = jnp.einsum("lkd,lmd->lkm", jnp.asarray(cb), jnp.asarray(cb))

        cache, _ = temporal.quick_bin_cache(
            sp, scene["means3d"], scene["opacities"], view, pm, campos,
            scales=scene["scales"], rotations=scene["rotations"],
            colors_precomp=scene["colors_precomp"],
            quick_weights=scene["quick_weights"],
            quick_indices=scene["quick_indices"])
        rgb_t, raw_t, nrm2_t, t_t = temporal.rasterize_quick_steady(
            sp, cache, view, pm, bg, quick_channels=192, topk=12,
            phi=phi, gram=gram)

        # rasterize_quick_query has no cov3d_precomp arg (it activates
        # scales/rotations itself), so pin determinism of the fused steady
        # path against a second independently built cache instead.
        cache2, _ = temporal.quick_bin_cache(
            sp, scene["means3d"], scene["opacities"], view, pm, campos,
            scales=scene["scales"], rotations=scene["rotations"],
            colors_precomp=scene["colors_precomp"],
            quick_weights=scene["quick_weights"],
            quick_indices=scene["quick_indices"])
        rgb2, raw2, nrm22, t2 = temporal.rasterize_quick_steady(
            sp, cache2, view, pm, bg, quick_channels=192, topk=12,
            phi=phi, gram=gram)
        np.testing.assert_array_equal(np.asarray(rgb_t), np.asarray(rgb2))
        np.testing.assert_array_equal(np.asarray(raw_t), np.asarray(raw2))
        assert np.isfinite(np.asarray(raw_t)).all()
        assert np.isfinite(np.asarray(nrm2_t)).all()

    def test_motion_px(self):
        c2w = np.eye(4)
        assert temporal.motion_px(c2w, c2w, 1000, math.radians(60)) == 0.0
        c2w2 = np.eye(4)
        c2w2[:3, :3] = _rot_y(0.01)
        f = 0.5 * 1000 / math.tan(math.radians(60) / 2)
        got = temporal.motion_px(c2w, c2w2, 1000, math.radians(60))
        assert abs(got - f * 0.01) < 0.2
        c2w3 = np.eye(4)
        c2w3[2, 3] = 0.1
        got_t = temporal.motion_px(c2w, c2w3, 1000, math.radians(60),
                                   z_ref=2.0)
        assert abs(got_t - f * 0.05) < 1e-3
