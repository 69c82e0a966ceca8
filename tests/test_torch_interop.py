"""Interop with the reference's torch checkpoints (chkpnt*.pth).

The tuples are built HERE with torch, following the reference capture()
schema exactly (reference scene/gaussian_model.py:67-139, train.py:265-267),
then loaded through langsplatv2_tpu.models.torch_interop — a
reference-trained checkpoint must evaluate/serve here unchanged.
"""
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from langsplatv2_tpu.models import gaussians as gm
from langsplatv2_tpu.models import io as mio
from langsplatv2_tpu.models.torch_interop import (
    capture_tuple_from_model, convert_torch_adam_state,
    load_torch_checkpoint, save_torch_checkpoint)


def _reference_style_tuple(n=50, include_feature=False, seed=0,
                           sh_degree=3, L=1, K=16):
    """Build the reference capture() tuple from raw torch tensors — the
    exact shapes/ordering gaussian_model.py:67-101 persists."""
    g = torch.Generator().manual_seed(seed)
    coeffs = (sh_degree + 1) ** 2
    xyz = torch.randn(n, 3, generator=g)
    f_dc = torch.randn(n, 1, 3, generator=g)
    f_rest = torch.randn(n, coeffs - 1, 3, generator=g)
    scaling = torch.randn(n, 3, generator=g) - 3.0
    rotation = torch.randn(n, 4, generator=g)
    opacity = torch.randn(n, 1, generator=g)
    max_radii2d = torch.zeros(n)
    grad_accum = torch.zeros(n, 1)
    denom = torch.zeros(n, 1)
    opt_dict = {"state": {}, "param_groups": []}
    base = (sh_degree, xyz, f_dc, f_rest, scaling, rotation, opacity)
    tail = (max_radii2d, grad_accum, denom, opt_dict, 4.25)
    if include_feature:
        logits = torch.randn(n, L * K, generator=g)
        codebooks = torch.randn(L, K, 512, generator=g)
        return base + (logits, codebooks) + tail
    return base + tail


class TestLoadReferenceCheckpoint:
    def test_rgb_12_tuple(self, tmp_path):
        tup = _reference_style_tuple(include_feature=False)
        path = str(tmp_path / "chkpnt30000.pth")
        torch.save((tup, 30000), path)
        model, it, opt_dict = load_torch_checkpoint(path)
        assert it == 30000
        assert model.language_logits is None and model.codebooks is None
        assert model.active_sh_degree == 3
        assert model.spatial_lr_scale == pytest.approx(4.25)
        np.testing.assert_array_equal(np.asarray(model.xyz), tup[1].numpy())
        np.testing.assert_array_equal(np.asarray(model.features_dc),
                                      tup[2].numpy())
        np.testing.assert_array_equal(np.asarray(model.features_rest),
                                      tup[3].numpy())
        np.testing.assert_array_equal(np.asarray(model.scaling),
                                      tup[4].numpy())
        np.testing.assert_array_equal(np.asarray(model.rotation),
                                      tup[5].numpy())
        np.testing.assert_array_equal(np.asarray(model.opacity),
                                      tup[6].numpy())
        assert bool(model.live.all())

    def test_feature_14_tuple(self, tmp_path):
        tup = _reference_style_tuple(include_feature=True)
        path = str(tmp_path / "chkpnt10000.pth")
        torch.save((tup, 10000), path)
        model, it, _ = load_torch_checkpoint(path)
        assert it == 10000
        np.testing.assert_array_equal(np.asarray(model.language_logits),
                                      tup[7].numpy())
        np.testing.assert_array_equal(np.asarray(model.codebooks),
                                      tup[8].numpy())

    def test_capacity_padding(self, tmp_path):
        tup = _reference_style_tuple(n=20)
        path = str(tmp_path / "c.pth")
        torch.save((tup, 1), path)
        model, _, _ = load_torch_checkpoint(path, capacity=64)
        assert model.xyz.shape[0] == 64
        assert int(model.num_live) == 20
        # Padding rotations must be the identity quaternion (NaN guard).
        np.testing.assert_array_equal(
            np.asarray(model.rotation[20:, 0]), np.ones(44, np.float32))

    def test_auto_dispatch_and_resolve(self, tmp_path):
        tup = _reference_style_tuple(n=10)
        d = tmp_path / "model"
        d.mkdir()
        torch.save((tup, 7), str(d / "chkpnt7.pth"))
        p = mio.resolve_checkpoint(str(d), 7)
        assert p.endswith(".pth")
        model, it = mio.load_checkpoint_auto(p)
        assert it == 7 and model.xyz.shape[0] == 10
        # A native npz beside it wins.
        mio.save_checkpoint(str(d / "chkpnt7.npz"), model, None, 7)
        assert mio.resolve_checkpoint(str(d), 7).endswith(".npz")


class TestRoundTrip:
    def test_export_load_render_parity(self, tmp_path):
        """Native model -> reference .pth -> load -> identical render as
        the native npz checkpoint of the same model."""
        rng = np.random.default_rng(3)
        n = 80
        pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                        rng.uniform(3, 6, n)], 1).astype(np.float32)
        cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        model = gm.create_from_pcd(pts, cols, spatial_lr_scale=1.0,
                                   max_sh_degree=1)
        model = gm.init_language_features(model, jax.random.PRNGKey(1), 1, 16)

        pth = str(tmp_path / "chkpnt5.pth")
        npz = str(tmp_path / "chkpnt5.npz")
        save_torch_checkpoint(pth, model, 5)
        mio.save_checkpoint(npz, model, None, 5)
        m_t, it_t = mio.load_checkpoint_auto(pth)
        m_n, it_n = mio.load_checkpoint_auto(npz)
        assert it_t == it_n == 5

        from langsplatv2_tpu.ops.rasterize import (RasterizeSettings,
                                                   rasterize)
        from tests.scene_fixtures import make_camera

        cam = make_camera(48, 64)
        sp = RasterizeSettings(
            image_height=48, image_width=64, tanfovx=cam["tanfovx"],
            tanfovy=cam["tanfovy"], sh_degree=1,
            max_entries=2 ** 12, tile_cap=256, tile_batch=4, impl="xla")
        bg = jnp.zeros(3, jnp.float32)

        def render(m):
            return rasterize(
                sp, m.xyz, m.get_opacity(), cam["viewmatrix"],
                cam["projmatrix"], cam["campos"], bg,
                scales=m.get_scaling(), rotations=m.get_rotation(),
                shs=m.get_features()).rgb

        np.testing.assert_allclose(np.asarray(render(m_t)),
                                   np.asarray(render(m_n)),
                                   atol=1e-6)

    def test_reference_roundtrip_tuple_identity(self, tmp_path):
        """load(export(load(tuple))) preserves every tensor bit-exactly."""
        tup = _reference_style_tuple(n=30, include_feature=True)
        p1 = str(tmp_path / "a.pth")
        torch.save((tup, 3), p1)
        model, _, _ = load_torch_checkpoint(p1)
        p2 = str(tmp_path / "b.pth")
        save_torch_checkpoint(p2, model, 3)
        (tup2, it2) = torch.load(p2, weights_only=False)
        assert it2 == 3 and len(tup2) == 14
        for i in (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11):
            np.testing.assert_array_equal(tup[i].numpy(), tup2[i].numpy(),
                                          err_msg=f"slot {i}")
        assert tup2[0] == tup[0]
        assert tup2[13] == pytest.approx(tup[13])


class TestAdamStateConversion:
    def _torch_rgb_adam(self, n=12, steps=3, seed=0):
        g = torch.Generator().manual_seed(seed)
        params = {
            "xyz": torch.randn(n, 3, generator=g, requires_grad=True),
            "f_dc": torch.randn(n, 1, 3, generator=g, requires_grad=True),
            "f_rest": torch.randn(n, 3, 3, generator=g, requires_grad=True),
            "opacity": torch.randn(n, 1, generator=g, requires_grad=True),
            "scaling": torch.randn(n, 3, generator=g, requires_grad=True),
            "rotation": torch.randn(n, 4, generator=g, requires_grad=True),
        }
        groups = [{"params": [p], "lr": 1e-3, "name": k}
                  for k, p in params.items()]
        optim = torch.optim.Adam(groups, lr=0.0, eps=1e-15)
        for _ in range(steps):
            optim.zero_grad()
            loss = sum((p ** 2).sum() for p in params.values())
            loss.backward()
            optim.step()
        return params, optim

    def test_rgb_moments_land_in_groups(self):
        from langsplatv2_tpu.train.optimizers import (GroupedOptimizer,
                                                      adam_group)

        n, cap = 12, 16
        tparams, toptim = self._torch_rgb_adam(n=n, steps=3)
        opt_dict = toptim.state_dict()

        ours = GroupedOptimizer({k: adam_group(1e-3) for k in (
            "xyz", "features_dc", "features_rest", "opacity", "scaling",
            "rotation")})
        jparams = {
            "xyz": jnp.zeros((cap, 3)),
            "features_dc": jnp.zeros((cap, 1, 3)),
            "features_rest": jnp.zeros((cap, 3, 3)),
            "opacity": jnp.zeros((cap, 1)),
            "scaling": jnp.zeros((cap, 3)),
            "rotation": jnp.zeros((cap, 4)),
        }
        template = ours.init(jparams)
        state = convert_torch_adam_state(opt_dict, template, cap)

        ref = {"xyz": "xyz", "f_dc": "features_dc", "f_rest": "features_rest",
               "opacity": "opacity", "scaling": "scaling",
               "rotation": "rotation"}
        for idx, (tk, ok) in enumerate(ref.items()):
            st = opt_dict["state"][idx]
            adam = state[ok][0]
            assert int(adam.count) == 3
            np.testing.assert_allclose(np.asarray(adam.mu[:n]),
                                       st["exp_avg"].numpy(), atol=1e-7)
            np.testing.assert_allclose(np.asarray(adam.nu[:n]),
                                       st["exp_avg_sq"].numpy(), atol=1e-7)
            # Padding rows keep zero moments.
            assert float(jnp.abs(adam.mu[n:]).max()) == 0.0

    def test_feature_phase_group(self):
        from langsplatv2_tpu.train.optimizers import (GroupedOptimizer,
                                                      adam_group)

        n, L, K = 10, 1, 16
        logits = torch.randn(n, L * K, requires_grad=True)
        codebooks = torch.randn(L, K, 512, requires_grad=True)
        optim = torch.optim.Adam(
            [{"params": [logits, codebooks], "lr": 2.5e-3,
              "name": "language_feature"}], lr=0.0, eps=1e-15)
        for _ in range(2):
            optim.zero_grad()
            ((logits ** 2).sum() + (codebooks ** 2).sum()).backward()
            optim.step()

        ours = GroupedOptimizer({"language_logits": adam_group(2.5e-3),
                                 "codebooks": adam_group(2.5e-3)})
        template = ours.init({"language_logits": jnp.zeros((n, L * K)),
                              "codebooks": jnp.zeros((L, K, 512))})
        state = convert_torch_adam_state(optim.state_dict(), template, n)
        np.testing.assert_allclose(
            np.asarray(state["language_logits"][0].mu),
            optim.state_dict()["state"][0]["exp_avg"].numpy(), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(state["codebooks"][0].nu),
            optim.state_dict()["state"][1]["exp_avg_sq"].numpy(), atol=1e-7)
        assert int(state["codebooks"][0].count) == 2
