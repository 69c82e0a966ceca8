"""Multi-chip tests on the 8-device CPU mesh: the tile-sharded renderer and
the sharded feature training step must match their single-device versions
(allclose), and gradients must be correctly psum'd across shards."""
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplatv2_tpu.models import gaussians as gm
from langsplatv2_tpu.models.renderer import make_settings, render
from langsplatv2_tpu.ops import RasterizeSettings, rasterize
from langsplatv2_tpu.parallel import (
    make_device_mesh, rasterize_sharded, make_sharded_feature_train_step)
from langsplatv2_tpu.train import trainer
from langsplatv2_tpu.train.trainer import (
    make_feature_optimizer, make_feature_train_step, feature_params)
from scene_fixtures import make_camera, random_gaussians

H, W = 48, 64

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def jrun(fn, *args):
    """Run an eager composition under ONE jit: op-by-op eager dispatch on
    an 8-device CPU mesh costs ~20-50ms per op (hundreds of tiny compiles
    the persistent cache refuses to store); a single traced compile is both
    faster cold and persistently cached for repeat suite runs."""
    return jax.jit(fn)(*args)


def settings_for(cam, **over):
    base = dict(image_height=H, image_width=W, tanfovx=cam["tanfovx"],
                tanfovy=cam["tanfovy"], sh_degree=0, max_entries=2 ** 14,
                tile_cap=256, tile_batch=2)
    base.update(over)
    return RasterizeSettings(**base)


class TestShardedRender:
    @pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (1, 4)])
    def test_matches_single_device(self, rng, mesh_shape):
        g = random_gaussians(rng, 150, feat_dim=16)
        cam = make_camera(H, W)
        settings = settings_for(cam)
        mesh = make_device_mesh(*mesh_shape)

        single = jrun(lambda: rasterize(
            settings, g["means3d"], g["opacities"],
            cam["viewmatrix"], cam["projmatrix"], cam["campos"], jnp.zeros(3),
            scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
            features=g["features"]))
        rgb_s, feat_s, radii_s, final_s = jrun(lambda: rasterize_sharded(
            mesh, settings, g["means3d"], g["opacities"],
            cam["viewmatrix"], cam["projmatrix"], cam["campos"], jnp.zeros(3),
            scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
            features=g["features"]))
        np.testing.assert_allclose(np.asarray(rgb_s), np.asarray(single.rgb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(feat_s), np.asarray(single.feature_map), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(radii_s), np.asarray(single.radii))

    def test_quick_mode_sharded(self, rng):
        n = 80
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = settings_for(cam)
        mesh = make_device_mesh(1, 8)
        qw = jnp.asarray(rng.uniform(0, 1, (n, 12)).astype(np.float32))
        qi = jnp.asarray(rng.integers(0, 192, (n, 12)).astype(np.float32))
        single = jrun(lambda: rasterize(
            settings, g["means3d"], g["opacities"],
            cam["viewmatrix"], cam["projmatrix"], cam["campos"], jnp.zeros(3),
            scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
            quick_weights=qw, quick_indices=qi, quick_channels=192))
        _, feat_s, _, _ = jrun(lambda: rasterize_sharded(
            mesh, settings, g["means3d"], g["opacities"],
            cam["viewmatrix"], cam["projmatrix"], cam["campos"], jnp.zeros(3),
            scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
            quick_weights=qw, quick_indices=qi, quick_channels=192))
        np.testing.assert_allclose(
            np.asarray(feat_s), np.asarray(single.feature_map), atol=1e-5)


class TestShardedTraining:
    def _setup(self, rng, n=60):
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        model = gm.create_from_pcd(
            np.asarray(g["means3d"]), np.full((n, 3), 0.5, np.float32), 1.0)
        model = model.replace(opacity=jnp.full((n, 1), 1.0))
        model = gm.init_language_features(model, jax.random.PRNGKey(3), 1, 16)
        gt_feat = np.zeros((512, H, W), np.float32)
        gt_feat[0] = 1.0
        gt_mask = np.ones((1, H, W), np.float32)
        return g, cam, model, jnp.asarray(gt_feat), jnp.asarray(gt_mask)

    # (2, 4) exercises both mesh axes (data AND tile) — the strictly more
    # general case; the pure-tile (1, 8) layout is covered by the cheap
    # render-parity tests above. These tests are compile-dominated
    # (~100-200s per mesh shape on one CPU core), so one shape each.
    @pytest.mark.parametrize("mesh_shape", [(2, 4)])
    def test_sharded_loss_and_grads_match_unsharded(self, rng, mesh_shape):
        """Compare losses and GRADIENTS (psum'd across shards) against the
        single-device path. Post-Adam params are deliberately not compared:
        the first Adam step is sign descent (g/|g|), so benign float
        reassociation across shards would flip updates by 2*lr."""
        from langsplatv2_tpu.models.renderer import render as facade_render
        from langsplatv2_tpu.parallel import sharding as sh
        from langsplatv2_tpu.utils import losses as L

        g, cam, model, gt_feat, gt_mask = self._setup(rng)
        settings = settings_for(cam)

        def unsharded_loss(params):
            m = model.replace(**params)
            out = facade_render(settings, m, cam["viewmatrix"], cam["projmatrix"],
                                cam["campos"], jnp.zeros(3),
                                include_feature=True, topk=4)
            feat = m.compute_layer_feature_map(out.language_feature_weight_map, 0)
            mask = gt_mask.astype(feat.dtype)
            return L.cos_loss(feat * mask, gt_feat * mask)

        params = feature_params(model)
        loss_ref, grads_ref = jrun(jax.value_and_grad(unsharded_loss), params)

        mesh = make_device_mesh(*mesh_shape)
        B = mesh.shape["data"]
        opt = types.SimpleNamespace(language_feature_lr=0.01)
        optimizer = make_feature_optimizer(opt)
        step = make_sharded_feature_train_step(mesh, settings, optimizer,
                                               topk=4, loss_space="pixel")

        # Recover loss + grads from the sharded step by probing its internals
        # through one update with a zero-LR optimizer clone: instead, call the
        # sharded loss directly.
        views = jnp.tile(cam["viewmatrix"][None], (B, 1, 1))
        projs = jnp.tile(cam["projmatrix"][None], (B, 1, 1))
        camposs = jnp.tile(cam["campos"][None], (B, 1))
        gt_feats = jnp.tile(gt_feat[None], (B, 1, 1, 1))
        gt_masks = jnp.tile(gt_mask[None], (B, 1, 1, 1))

        # Use the module's sharded loss builder via the step factory's
        # closure equivalent: rebuild it directly.
        sharded_step = step  # runs one Adam update; also returns the loss
        _, _, met = sharded_step(
            model, optimizer.init(params), views, projs, camposs,
            jnp.zeros(3), gt_feats, gt_masks)
        np.testing.assert_allclose(float(met["loss"]), float(loss_ref), rtol=1e-5)

        sharded_loss = sh.make_sharded_feature_loss(mesh, settings, topk=4)
        grads_sh = jrun(lambda p: jax.grad(sharded_loss)(
            p, model, views, projs, camposs, jnp.zeros(3),
            gt_feats, gt_masks), params)
        for k in grads_ref:
            a, b = np.asarray(grads_sh[k]), np.asarray(grads_ref[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                       err_msg=k)

    @pytest.mark.parametrize("mesh_shape", [(2, 4)])
    def test_sharded_gram_loss_and_grads_match_unsharded(self, rng,
                                                         mesh_shape):
        """The gram-space sharded step (the production fast path: compact
        [S,512]+seg GT, K-dim tile-shard math, psum of partial sim sums)
        must reproduce the single-chip gram loss and gradients."""
        from langsplatv2_tpu.models.renderer import render as facade_render
        from langsplatv2_tpu.parallel import sharding as sh
        from langsplatv2_tpu.train.trainer import gram_cos_loss

        g, cam, model, _, _ = self._setup(rng)
        settings = settings_for(cam)
        S = 7
        table = rng.normal(size=(S, 512)).astype(np.float32)
        table /= np.linalg.norm(table, axis=1, keepdims=True)
        seg = rng.integers(-1, S, (H, W)).astype(np.int32)
        table_d, seg_d = jnp.asarray(table), jnp.asarray(seg)

        def unsharded_loss(params):
            m = model.replace(**params)
            out = facade_render(settings, m, cam["viewmatrix"],
                                cam["projmatrix"], cam["campos"],
                                jnp.zeros(3), include_feature=True, topk=4)
            return gram_cos_loss(m.codebooks,
                                 out.language_feature_weight_map,
                                 table_d, seg_d, 0)

        params = feature_params(model)
        loss_ref, grads_ref = jrun(jax.value_and_grad(unsharded_loss), params)

        mesh = make_device_mesh(*mesh_shape)
        B = mesh.shape["data"]
        views = jnp.tile(cam["viewmatrix"][None], (B, 1, 1))
        projs = jnp.tile(cam["projmatrix"][None], (B, 1, 1))
        camposs = jnp.tile(cam["campos"][None], (B, 1))
        tables = jnp.tile(table_d[None], (B, 1, 1))
        segs = jnp.tile(seg_d[None], (B, 1, 1))

        sharded_loss = sh.make_sharded_gram_loss(mesh, settings, topk=4)
        loss_sh, grads_sh = jrun(lambda p: jax.value_and_grad(sharded_loss)(
            p, model, views, projs, camposs, jnp.zeros(3), tables, segs),
            params)
        np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                                   rtol=1e-5)
        for k in grads_ref:
            a, b = np.asarray(grads_sh[k]), np.asarray(grads_ref[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                       err_msg=k)

        # And the step must train with the compact GT.
        opt = types.SimpleNamespace(language_feature_lr=0.05)
        optimizer = make_feature_optimizer(opt)
        step = make_sharded_feature_train_step(mesh, settings, optimizer,
                                               topk=4)
        m2, _, met = step(model, optimizer.init(params), views, projs,
                          camposs, jnp.zeros(3), tables, segs)
        np.testing.assert_allclose(float(met["loss"]), float(loss_ref),
                                   rtol=1e-5)

    def test_sharded_training_reduces_loss(self, rng):
        g, cam, model, gt_feat, gt_mask = self._setup(rng)
        settings = settings_for(cam)
        opt = types.SimpleNamespace(language_feature_lr=0.05)
        optimizer = make_feature_optimizer(opt)
        opt_state = optimizer.init(feature_params(model))
        mesh = make_device_mesh(2, 4)
        step = make_sharded_feature_train_step(mesh, settings, optimizer,
                                               topk=4, loss_space="pixel")
        B = 2
        views = jnp.tile(cam["viewmatrix"][None], (B, 1, 1))
        projs = jnp.tile(cam["projmatrix"][None], (B, 1, 1))
        camposs = jnp.tile(cam["campos"][None], (B, 1))
        gt_feats = jnp.tile(gt_feat[None], (B, 1, 1, 1))
        gt_masks = jnp.tile(gt_mask[None], (B, 1, 1, 1))
        losses = []
        for _ in range(15):
            model, opt_state, met = step(
                model, opt_state, views, projs, camposs, jnp.zeros(3),
                gt_feats, gt_masks)
            losses.append(float(met["loss"]))
        assert losses[-1] < losses[0] * 0.9, losses


class TestGaussSharded:
    """Gaussian-sharded binning + all-to-all exchange (SURVEY §2.4 row 3):
    per-tile images must equal the single-device Pallas sort path exactly
    (same entries, same global depth order, same tie-breaks)."""

    def _mesh(self, c=8):
        import numpy as _np
        from jax.sharding import Mesh
        return Mesh(_np.asarray(jax.devices()[:c]), ("gauss",))

    def test_rgb_matches_single_device(self, rng):
        from langsplatv2_tpu.parallel import rasterize_gauss_sharded

        n = 160  # divisible by 8
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = settings_for(cam, max_entries=2 ** 13)
        single = jrun(lambda: rasterize(
            settings._replace(impl="pallas", binning="sort"),
            g["means3d"], g["opacities"], cam["viewmatrix"],
            cam["projmatrix"], cam["campos"], jnp.zeros(3),
            scales=g["scales"], rotations=g["rotations"],
            colors_precomp=jnp.asarray(
                np.random.default_rng(0).uniform(0, 1, (n, 3)), jnp.float32)))
        cols = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (n, 3)), jnp.float32)
        rgb, feat, final_t, total, dropped, _radii = jrun(
            lambda: rasterize_gauss_sharded(
                self._mesh(), settings, g["means3d"], g["opacities"],
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                jnp.zeros(3), scales=g["scales"], rotations=g["rotations"],
                colors_precomp=cols, pair_capacity=2048))
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(single.rgb),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(final_t),
                                   np.asarray(single.final_transmittance),
                                   atol=2e-5)

    def test_quick_matches_single_device(self, rng):
        from langsplatv2_tpu.parallel import rasterize_gauss_sharded

        n = 160
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = settings_for(cam, max_entries=2 ** 13)
        r2 = np.random.default_rng(7)
        L_, K_, TOPK = 3, 64, 4
        qw = r2.uniform(0, 1, (n, L_ * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [r2.integers(0, K_, (n, TOPK)) + l * K_ for l in range(L_)], 1
        ).astype(np.float32)
        cols = jnp.asarray(r2.uniform(0, 1, (n, 3)), jnp.float32)
        common = dict(scales=g["scales"], rotations=g["rotations"],
                      colors_precomp=cols)
        single = jrun(lambda: rasterize(
            settings._replace(impl="pallas", binning="sort"),
            g["means3d"], g["opacities"], cam["viewmatrix"],
            cam["projmatrix"], cam["campos"], jnp.zeros(3),
            quick_weights=jnp.asarray(qw), quick_indices=jnp.asarray(qi),
            quick_channels=L_ * K_, **common))
        rgb, feat, final_t, total, dropped, _radii = jrun(
            lambda: rasterize_gauss_sharded(
                self._mesh(), settings, g["means3d"], g["opacities"],
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                jnp.zeros(3), quick_weights=jnp.asarray(qw),
                quick_indices=jnp.asarray(qi), quick_channels=L_ * K_,
                pair_capacity=2048, **common))
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(feat),
                                   np.asarray(single.feature_map), atol=2e-5)

    def test_quick_matches_single_device_wide_keys(self, rng, monkeypatch):
        """The 3-word exchanged key (>8190 tiles or global N > 2^20 — the
        2-word layout would OR global-id bits into the depth mantissa) must
        be pixel-exact too. Forced via _key_words at test scale."""
        from langsplatv2_tpu.parallel import gauss_sharded
        from langsplatv2_tpu.parallel import rasterize_gauss_sharded

        monkeypatch.setattr(gauss_sharded, "_key_words", lambda *a: 3)
        n = 160
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = settings_for(cam, max_entries=2 ** 13)
        r2 = np.random.default_rng(7)
        L_, K_, TOPK = 3, 64, 4
        qw = r2.uniform(0, 1, (n, L_ * TOPK)).astype(np.float32)
        qw /= qw.sum(1, keepdims=True)
        qi = np.concatenate(
            [r2.integers(0, K_, (n, TOPK)) + l * K_ for l in range(L_)], 1
        ).astype(np.float32)
        cols = jnp.asarray(r2.uniform(0, 1, (n, 3)), jnp.float32)
        common = dict(scales=g["scales"], rotations=g["rotations"],
                      colors_precomp=cols)
        single = jrun(lambda: rasterize(
            settings._replace(impl="pallas", binning="sort"),
            g["means3d"], g["opacities"], cam["viewmatrix"],
            cam["projmatrix"], cam["campos"], jnp.zeros(3),
            quick_weights=jnp.asarray(qw), quick_indices=jnp.asarray(qi),
            quick_channels=L_ * K_, **common))
        rgb, feat, final_t, total, dropped, _radii = jrun(
            lambda: rasterize_gauss_sharded(
                self._mesh(), settings, g["means3d"], g["opacities"],
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                jnp.zeros(3), quick_weights=jnp.asarray(qw),
                quick_indices=jnp.asarray(qi), quick_channels=L_ * K_,
                pair_capacity=2048, **common))
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(feat),
                                   np.asarray(single.feature_map), atol=2e-5)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(single.rgb),
                                   atol=2e-5)

    def test_overflow_reported(self, rng):
        from langsplatv2_tpu.parallel import rasterize_gauss_sharded

        n = 1600  # 200 gaussians/chip x 2 tiles/dest >> pair_capacity 128
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = settings_for(cam, max_entries=2 ** 13)
        # Huge splats: every gaussian touches every tile, so each (src, dst)
        # pair gets ~n/8 * tiles_per entries >> 128.
        *_, dropped, _radii = jrun(lambda: rasterize_gauss_sharded(
            self._mesh(), settings, g["means3d"], g["opacities"],
            cam["viewmatrix"], cam["projmatrix"], cam["campos"],
            jnp.zeros(3), scales=jnp.full((n, 3), 1.0),
            rotations=g["rotations"], pair_capacity=128))
        assert int(dropped) > 0

    def test_in_shard_sh_and_facade_routing(self, rng):
        """SH colors evaluated IN-SHARD (no colors_precomp requirement)
        must match the single-device SH render, via the rasterize() facade
        routing (settings.binning="gauss" + mesh)."""
        n = 160
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = settings_for(cam, max_entries=2 ** 13)
        single = jrun(lambda: rasterize(
            settings._replace(impl="pallas", binning="sort"),
            g["means3d"], g["opacities"], cam["viewmatrix"],
            cam["projmatrix"], cam["campos"], jnp.zeros(3),
            scales=g["scales"], rotations=g["rotations"], shs=g["shs"]))
        out = jrun(lambda: rasterize(
            settings._replace(binning="gauss", pair_capacity=2048),
            g["means3d"], g["opacities"], cam["viewmatrix"],
            cam["projmatrix"], cam["campos"], jnp.zeros(3),
            scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
            mesh=self._mesh()))
        assert int(out.dropped_entries) == 0
        np.testing.assert_allclose(np.asarray(out.rgb),
                                   np.asarray(single.rgb), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out.radii),
                                      np.asarray(single.radii))

    def test_pressure_near_overflow_telemetry_and_clamp(self, rng):
        """Thousands of gaussians (512/shard) with pair_capacity stepped
        across the overflow boundary: a generous capacity must be
        pixel-exact with dropped == 0; a starved one must REPORT drops
        while forward outputs and training gradients stay finite (the
        clamp truncates each (src, dst) segment, never corrupts)."""
        from langsplatv2_tpu.ops.pallas_train import rasterize_quick_train
        from langsplatv2_tpu.parallel import rasterize_gauss_sharded
        from langsplatv2_tpu.parallel.gauss_sharded import (
            rasterize_gauss_sharded_feature_train)

        n = 4096
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = settings_for(cam, max_entries=2 ** 15, assemble=True)
        r2 = np.random.default_rng(29)
        K_, TOPK = 64, 4
        qw = jnp.asarray(r2.uniform(0, 1, (n, TOPK)), jnp.float32)
        qi = jnp.asarray(r2.integers(0, K_, (n, TOPK)), jnp.float32)
        cols = jnp.asarray(r2.uniform(0, 1, (n, 3)), jnp.float32)
        common = dict(scales=g["scales"], rotations=g["rotations"],
                      colors_precomp=cols)

        single = jrun(lambda: rasterize(
            settings._replace(impl="pallas", binning="sort"),
            g["means3d"], g["opacities"], cam["viewmatrix"],
            cam["projmatrix"], cam["campos"], jnp.zeros(3),
            quick_weights=qw, quick_indices=qi, quick_channels=K_,
            **common))

        def run_fwd(cap):
            return jrun(lambda: rasterize_gauss_sharded(
                self._mesh(), settings, g["means3d"], g["opacities"],
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                jnp.zeros(3), quick_weights=qw, quick_indices=qi,
                quick_channels=K_, pair_capacity=cap, **common))

        # Generous capacity: exact parity, zero drops.
        rgb, feat, _, total, dropped, _ = run_fwd(2048)
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(feat),
                                   np.asarray(single.feature_map),
                                   atol=2e-5)
        # Starved capacity (128 slots per (src,dst) pair << the dense
        # center tiles): telemetry must fire, outputs must stay finite.
        rgb2, feat2, _, total2, dropped2, _ = run_fwd(128)
        assert int(dropped2) > 0
        assert int(total2) == int(total)  # pre-exchange totals unchanged
        assert np.isfinite(np.asarray(rgb2)).all()
        assert np.isfinite(np.asarray(feat2)).all()

        # Training backward under overflow: gradients finite, and exact
        # at a generous capacity.
        probe = jnp.asarray(r2.standard_normal((K_, H, W)), jnp.float32)

        def loss_sharded(qw_, cap):
            _, f, *_ = rasterize_gauss_sharded_feature_train(
                self._mesh(), settings, g["means3d"], g["opacities"],
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                jnp.zeros(3), qw_, qi, K_, colors_precomp=cols,
                pair_capacity=cap, **{k: common[k]
                                      for k in ("scales", "rotations")})
            return jnp.sum(f * probe)

        def loss_single(qw_):
            _, f, *_ = rasterize_quick_train(
                settings._replace(impl="pallas", binning="sort"),
                g["means3d"], g["opacities"], cam["viewmatrix"],
                cam["projmatrix"], cam["campos"], jnp.zeros(3),
                g["scales"], g["rotations"], None, cols, qw_, qi, K_)
            return jnp.sum(f * probe)

        d_ref = jrun(jax.grad(loss_single), qw)
        d_ok = jrun(lambda q: jax.grad(loss_sharded)(q, 2048), qw)
        np.testing.assert_allclose(np.asarray(d_ok), np.asarray(d_ref),
                                   atol=1e-4, rtol=1e-4)
        d_starved = jrun(lambda q: jax.grad(loss_sharded)(q, 128), qw)
        assert np.isfinite(np.asarray(d_starved)).all()

    def test_feature_train_grads_match_single_device(self, rng):
        """d(quick_weights) through the exchange (replay on the tile owner,
        reverse all-to-all, scatter onto the Gaussian shard) must equal the
        single-chip quick-train VJP's gradient."""
        from langsplatv2_tpu.ops.pallas_train import rasterize_quick_train
        from langsplatv2_tpu.parallel.gauss_sharded import (
            rasterize_gauss_sharded_feature_train)

        n = 160
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = settings_for(cam, max_entries=2 ** 13, assemble=True)
        r2 = np.random.default_rng(11)
        K_, TOPK = 64, 4  # one level (training is per-level)
        qw = r2.uniform(0, 1, (n, TOPK)).astype(np.float32)
        qi = r2.integers(0, K_, (n, TOPK)).astype(np.float32)
        cols = jnp.asarray(r2.uniform(0, 1, (n, 3)), jnp.float32)
        probe = jnp.asarray(r2.standard_normal((K_, H, W)), jnp.float32)
        common = dict(scales=g["scales"], rotations=g["rotations"])

        def loss_single(qw_):
            _, feat, *_ = rasterize_quick_train(
                settings._replace(impl="pallas", binning="sort"),
                g["means3d"], g["opacities"], cam["viewmatrix"],
                cam["projmatrix"], cam["campos"], jnp.zeros(3),
                g["scales"], g["rotations"], None, cols, qw_,
                jnp.asarray(qi), K_)
            return jnp.sum(feat * probe)

        def loss_sharded(qw_):
            _, feat, *_ = rasterize_gauss_sharded_feature_train(
                self._mesh(), settings, g["means3d"], g["opacities"],
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                jnp.zeros(3), qw_, jnp.asarray(qi), K_,
                colors_precomp=cols, pair_capacity=2048, **common)
            return jnp.sum(feat * probe)

        l1, d1 = jrun(jax.value_and_grad(loss_single), jnp.asarray(qw))
        l2, d2 = jrun(jax.value_and_grad(loss_sharded), jnp.asarray(qw))
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   atol=1e-4, rtol=1e-4)


class TestShardedRGBTraining:
    """RGB/geometry-phase sharded training (SURVEY §2.4 row 4): per-Gaussian
    parameter grads (and the means2D densify carrier) psum'd across the
    (data, tile) mesh must match the single-chip step; densification must
    round-trip under the mesh."""

    LAMBDA = 0.2

    def _setup(self, rng, n=40):
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        pts = np.asarray(g["means3d"])
        cols = np.asarray(jax.nn.sigmoid(np.asarray(g["shs"])[:, 0, :] * 2))
        target = gm.create_from_pcd(pts, cols, spatial_lr_scale=1.0)
        # Anisotropic scaling + random orientations: with create_from_pcd's
        # isotropic init the rotation gradient is exactly zero (pure float
        # noise), which the scaled parity comparison would amplify.
        r0 = np.random.default_rng(23)
        target = target.replace(
            opacity=jnp.full((n, 1), 2.0),
            scaling=target.scaling + jnp.asarray(
                r0.normal(0, 0.6, target.scaling.shape), jnp.float32),
            rotation=jnp.asarray(
                r0.normal(0, 1, target.rotation.shape), jnp.float32),
        )
        settings = settings_for(cam)
        out = jrun(lambda: render(
            settings, target, cam["viewmatrix"], cam["projmatrix"],
            cam["campos"], jnp.zeros(3)))
        gt = jnp.asarray(out.render)
        # Perturbed start: same support, recoverable by gradient descent.
        r2 = np.random.default_rng(17)
        model = target.replace(
            xyz=target.xyz + jnp.asarray(
                r2.normal(0, 0.03, target.xyz.shape), jnp.float32),
            opacity=jnp.full((n, 1), 0.5),
        )
        return cam, settings, model, gt

    def test_rgb_loss_and_grads_match_unsharded(self, rng):
        from langsplatv2_tpu.parallel import sharding as sh
        from langsplatv2_tpu.utils import losses as L

        cam, settings, model, gt = self._setup(rng)

        def unsharded(params, dummy):
            m = model.replace(**params)
            out = render(settings, m, cam["viewmatrix"], cam["projmatrix"],
                         cam["campos"], jnp.zeros(3), means2d_dummy=dummy)
            l1 = L.l1_loss(out.render, gt)
            loss = (1 - self.LAMBDA) * l1 + self.LAMBDA * (
                1.0 - L.ssim(out.render, gt))
            return loss, out.radii

        params = trainer.rgb_params(model)
        dummy = jnp.zeros((model.capacity, 2), jnp.float32)
        (loss_ref, radii_ref), (g_ref, d_ref) = jrun(
            lambda p, d: jax.value_and_grad(
                unsharded, argnums=(0, 1), has_aux=True)(p, d),
            params, dummy)

        mesh = make_device_mesh(2, 4)
        B = mesh.shape["data"]
        sloss = sh.make_sharded_rgb_loss(mesh, settings, self.LAMBDA)
        views = jnp.tile(cam["viewmatrix"][None], (B, 1, 1))
        projs = jnp.tile(cam["projmatrix"][None], (B, 1, 1))
        camposs = jnp.tile(cam["campos"][None], (B, 1))
        gts = jnp.tile(gt[None], (B, 1, 1, 1))

        def f(p, d):
            loss, (l1, radii) = sloss(p, d, model, views, projs, camposs,
                                      jnp.zeros(3), gts)
            return loss, radii

        (loss_sh, radii_sh), (g_sh, d_sh) = jrun(
            lambda p, d: jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True)(p, d), params, dummy)

        np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(radii_sh[0]),
                                      np.asarray(radii_ref))
        for k in g_ref:
            a, b = np.asarray(g_sh[k]), np.asarray(g_ref[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                       err_msg=k)
        scale = np.abs(np.asarray(d_ref)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(d_sh) / scale,
                                   np.asarray(d_ref) / scale, atol=5e-4,
                                   err_msg="means2d carrier grad")

    def test_sharded_rgb_step_trains_and_densifies(self, rng):
        from langsplatv2_tpu.parallel import make_sharded_rgb_train_step

        cam, settings, model, gt = self._setup(rng)
        opt_ns = types.SimpleNamespace(
            position_lr_init=0.002, position_lr_final=0.0002,
            position_lr_delay_mult=0.01, position_lr_max_steps=1000,
            feature_lr=0.0025, opacity_lr=0.05, scaling_lr=0.005,
            rotation_lr=0.001, percent_dense=0.01,
            densify_grad_threshold=1e-8)
        optimizer = trainer.make_rgb_optimizer(opt_ns, 1.0)
        opt_state = optimizer.init(trainer.rgb_params(model))
        mesh = make_device_mesh(2, 4)
        step = make_sharded_rgb_train_step(mesh, settings, optimizer,
                                           self.LAMBDA)
        B = mesh.shape["data"]
        views = jnp.tile(cam["viewmatrix"][None], (B, 1, 1))
        projs = jnp.tile(cam["projmatrix"][None], (B, 1, 1))
        camposs = jnp.tile(cam["campos"][None], (B, 1))
        gts = jnp.tile(gt[None], (B, 1, 1, 1))

        losses_l = []
        for _ in range(8):
            model, opt_state, met = step(model, opt_state, views, projs,
                                         camposs, jnp.zeros(3), gts)
            losses_l.append(float(met["loss"]))
        assert losses_l[-1] < losses_l[0], losses_l
        # The sharded step populated the densify stats (psum'd means2D).
        assert float(jnp.max(model.xyz_gradient_accum)) > 0.0
        assert float(jnp.max(model.denom)) >= 8.0

        # Densify under the mesh: host-side surgery on the replicated
        # pytree, then the NEXT sharded step runs at the new capacity.
        n_live_before = int(jnp.sum(model.live))
        model, opt_state = trainer.run_densify(
            model, opt_state, jax.random.PRNGKey(0), opt_ns,
            extent=2.0, max_screen_size=0.0)
        assert int(jnp.sum(model.live)) > n_live_before  # split/clone ran
        model, opt_state, met = step(model, opt_state, views, projs,
                                     camposs, jnp.zeros(3), gts)
        assert np.isfinite(float(met["loss"]))
        assert np.isfinite(np.asarray(model.xyz)).all()


class TestDistributedBootstrap:
    def test_single_process_noop(self):
        from langsplatv2_tpu.parallel import (initialize_distributed,
                                              sync_hosts)
        assert initialize_distributed() is False
        sync_hosts()  # no-op, must not raise
