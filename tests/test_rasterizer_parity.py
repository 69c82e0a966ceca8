"""Parity: production tile rasterizer vs the per-pixel oracle.

Forward images, language-feature maps, and gradients must allclose
(BASELINE.md render-parity target; the oracle itself encodes the CUDA
semantics documented in SURVEY.md §2.3(a))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplatv2_tpu.ops import RasterizeSettings, rasterize
from langsplatv2_tpu.ops.rasterize_reference import rasterize_reference
from scene_fixtures import make_camera, random_gaussians

H, W = 48, 64


def run_both(g, cam, feat=None, quick=None, sh_degree=0, bg=None):
    bg = jnp.zeros(3) if bg is None else bg
    settings = RasterizeSettings(
        image_height=H, image_width=W,
        tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
        sh_degree=sh_degree, max_entries=2 ** 14, tile_cap=512, tile_batch=4,
    )
    quick_kwargs = {}
    feat_for_oracle = feat
    if quick is not None:
        qw, qi, qc = quick
        quick_kwargs = dict(quick_weights=qw, quick_indices=qi, quick_channels=qc)
        onehot = jax.nn.one_hot(qi.astype(jnp.int32), qc)
        feat_for_oracle = jnp.einsum("ns,nsc->nc", qw, onehot)
    out = rasterize(
        settings,
        g["means3d"], g["opacities"],
        cam["viewmatrix"], cam["projmatrix"], cam["campos"], bg,
        scales=g["scales"], rotations=g["rotations"],
        shs=g["shs"], features=feat, **quick_kwargs,
    )
    ref_rgb, ref_feat, ref_radii, ref_t = rasterize_reference(
        g["means3d"], g["opacities"], g["scales"], g["rotations"], None,
        g["shs"], None, feat_for_oracle,
        cam["viewmatrix"], cam["projmatrix"], cam["campos"],
        cam["tanfovx"], cam["tanfovy"], W, H, sh_degree, bg,
    )
    return out, (ref_rgb, ref_feat, ref_radii, ref_t)


class TestForwardParity:
    def test_rgb_forward(self, rng):
        g = random_gaussians(rng, 200)
        cam = make_camera(H, W)
        out, (ref_rgb, _, ref_radii, ref_t) = run_both(g, cam)
        assert int(out.max_tile_count) <= 512
        np.testing.assert_array_equal(np.asarray(out.radii), np.asarray(ref_radii))
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref_rgb), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.final_transmittance), np.asarray(ref_t), atol=1e-5
        )

    def test_rgb_forward_sh3(self, rng):
        g = random_gaussians(rng, 150, sh_degree=3)
        cam = make_camera(H, W)
        out, (ref_rgb, *_rest) = run_both(g, cam, sh_degree=3)
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref_rgb), atol=1e-5)

    def test_rgb_with_background(self, rng):
        g = random_gaussians(rng, 50)
        cam = make_camera(H, W)
        bg = jnp.array([0.2, 0.5, 0.8])
        out, (ref_rgb, *_rest) = run_both(g, cam, bg=bg)
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref_rgb), atol=1e-5)
        # Un-hit pixels show pure background.
        corner_ok = np.asarray(out.final_transmittance) > 0.999
        assert corner_ok.any()

    def test_feature_forward_64ch(self, rng):
        g = random_gaussians(rng, 120, feat_dim=64)
        cam = make_camera(H, W)
        out, (ref_rgb, ref_feat, *_rest) = run_both(g, cam, feat=g["features"])
        assert out.feature_map.shape == (64, H, W)
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref_rgb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.feature_map), np.asarray(ref_feat), atol=1e-5)

    def test_quick_mode_192ch(self, rng):
        n = 100
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        qw = jnp.asarray(rng.uniform(0, 1, (n, 12)).astype(np.float32))
        qw = qw / qw.sum(1, keepdims=True)
        qi = jnp.asarray(
            np.concatenate(
                [rng.integers(0, 64, (n, 4)) + 64 * lvl for lvl in range(3)], axis=1
            ).astype(np.float32)
        )
        out, (_, ref_feat, *_rest) = run_both(g, cam, quick=(qw, qi, 192))
        assert out.feature_map.shape == (192, H, W)
        np.testing.assert_allclose(np.asarray(out.feature_map), np.asarray(ref_feat), atol=1e-5)

    def test_rotated_camera(self, rng):
        g = random_gaussians(rng, 100)
        # Camera rotated 10 degrees about y, shifted.
        th = np.radians(10)
        Rm = np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
        )
        cam = make_camera(H, W, R=Rm, t=np.array([0.1, -0.2, 0.3]))
        out, (ref_rgb, *_rest) = run_both(g, cam)
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref_rgb), atol=1e-5)

    def test_empty_scene(self, rng):
        g = random_gaussians(rng, 10, z_range=(-5.0, -1.0))  # all behind camera
        cam = make_camera(H, W)
        out, (ref_rgb, *_rest) = run_both(g, cam)
        assert (np.asarray(out.radii) == 0).all()
        np.testing.assert_allclose(np.asarray(out.rgb), 0.0, atol=1e-7)


class TestGradientParity:
    def _grads(self, fn, args):
        loss_grad = jax.grad(fn, argnums=tuple(range(len(args))))
        return loss_grad(*args)

    def test_grads_match_oracle(self, rng):
        n = 80
        g = random_gaussians(rng, n, feat_dim=8)
        cam = make_camera(H, W)
        key = jax.random.PRNGKey(0)
        wr = jax.random.normal(key, (3, H, W))
        wf = jax.random.normal(key, (8, H, W))
        settings = RasterizeSettings(
            image_height=H, image_width=W,
            tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
            sh_degree=0, max_entries=2 ** 14, tile_cap=512, tile_batch=4,
        )
        dummy = jnp.zeros((n, 2))

        def loss_tile(means, scales, rots, ops, shs, feats, dummy):
            out = rasterize(
                settings, means, ops,
                cam["viewmatrix"], cam["projmatrix"], cam["campos"], jnp.zeros(3),
                scales=scales, rotations=rots, shs=shs, features=feats,
                means2d_dummy=dummy,
            )
            return jnp.sum(out.rgb * wr) + jnp.sum(out.feature_map * wf)

        def loss_ref(means, scales, rots, ops, shs, feats, dummy):
            rgb, feat, _, _ = rasterize_reference(
                means, ops, scales, rots, None, shs, None, feats,
                cam["viewmatrix"], cam["projmatrix"], cam["campos"],
                cam["tanfovx"], cam["tanfovy"], W, H, 0, jnp.zeros(3),
                means2d_dummy=dummy,
            )
            return jnp.sum(rgb * wr) + jnp.sum(feat * wf)

        args = (g["means3d"], g["scales"], g["rotations"], g["opacities"],
                g["shs"], g["features"], dummy)
        gt = self._grads(loss_tile, args)
        gr = self._grads(loss_ref, args)
        names = ["means3d", "scales", "rotations", "opacities", "shs", "features", "means2d"]
        for name, a, b in zip(names, gt, gr):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-5, err_msg=name)

    def test_grad_finite_differences(self, rng):
        """Opacity gradient vs central finite differences through the tile path."""
        n = 30
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)
        settings = RasterizeSettings(
            image_height=H, image_width=W,
            tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
            sh_degree=0, max_entries=2 ** 12, tile_cap=256, tile_batch=4,
        )

        def loss(ops):
            out = rasterize(
                settings, g["means3d"], ops,
                cam["viewmatrix"], cam["projmatrix"], cam["campos"], jnp.zeros(3),
                scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
            )
            return jnp.sum(out.rgb ** 2)

        grad = np.asarray(jax.grad(loss)(g["opacities"]))
        eps = 1e-3
        for i in [0, 7, 19]:
            delta = np.zeros((n, 1), np.float32)
            delta[i, 0] = eps
            lp = float(loss(g["opacities"] + delta))
            lm = float(loss(g["opacities"] - delta))
            fd = (lp - lm) / (2 * eps)
            np.testing.assert_allclose(grad[i, 0], fd, rtol=2e-2, atol=1e-4)

    def test_no_grad_for_invisible(self, rng):
        g = random_gaussians(rng, 20, z_range=(-5.0, -1.0))
        cam = make_camera(H, W)
        settings = RasterizeSettings(
            image_height=H, image_width=W,
            tanfovx=cam["tanfovx"], tanfovy=cam["tanfovy"],
            sh_degree=0, max_entries=2 ** 10, tile_cap=128, tile_batch=4,
        )

        def loss(means):
            out = rasterize(
                settings, means, g["opacities"],
                cam["viewmatrix"], cam["projmatrix"], cam["campos"], jnp.zeros(3),
                scales=g["scales"], rotations=g["rotations"], shs=g["shs"],
            )
            return jnp.sum(out.rgb)

        grad = np.asarray(jax.grad(loss)(g["means3d"]))
        np.testing.assert_allclose(grad, 0.0, atol=1e-7)
