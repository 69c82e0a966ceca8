"""Tests: PLY codec, COLMAP parsers, dataset/camera assembly, model PLY and
checkpoint round-trips, kNN init."""
import json
import math
import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from langsplatv2_tpu.scene import ply, colmap, dataset
from langsplatv2_tpu.scene.cameras import Camera
from langsplatv2_tpu.scene.scene import Scene
from langsplatv2_tpu.models import gaussians as gm
from langsplatv2_tpu.models import io as mio
from langsplatv2_tpu.ops.knn import mean_sq_dist_3nn


class TestPly:
    def test_roundtrip_binary(self, tmp_path, rng):
        dtype = [("x", "<f4"), ("y", "<f4"), ("red", "u1")]
        arr = np.empty(10, dtype=dtype)
        arr["x"] = rng.normal(size=10).astype(np.float32)
        arr["y"] = rng.normal(size=10).astype(np.float32)
        arr["red"] = rng.integers(0, 255, 10)
        p = str(tmp_path / "t.ply")
        ply.write_ply(p, arr)
        back = ply.read_ply(p)["vertex"]
        np.testing.assert_array_equal(back["x"], arr["x"])
        np.testing.assert_array_equal(back["red"], arr["red"])

    def test_read_ascii(self, tmp_path):
        p = str(tmp_path / "a.ply")
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                    "property float x\nproperty float y\nend_header\n"
                    "1.5 2.5\n3.0 4.0\n")
        v = ply.read_ply(p)["vertex"]
        np.testing.assert_allclose(v["x"], [1.5, 3.0])
        np.testing.assert_allclose(v["y"], [2.5, 4.0])


class TestColmap:
    def _make_sparse(self, tmp_path, rng, n_imgs=9, n_pts=50):
        sparse = tmp_path / "sparse" / "0"
        os.makedirs(sparse)
        cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                       np.array([60.0, 60.0, 32.0, 24.0]))}
        colmap.write_intrinsics_binary(str(sparse / "cameras.bin"), cams)
        images = {}
        for i in range(1, n_imgs + 1):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            images[i] = colmap.ColmapImage(i, q, rng.normal(size=3), 1, f"img_{i:03d}.png")
        colmap.write_extrinsics_binary(str(sparse / "images.bin"), images)
        xyz = rng.normal(size=(n_pts, 3))
        rgb = rng.uniform(size=(n_pts, 3))
        colmap.write_points3d_binary(str(sparse / "points3D.bin"), xyz, rgb)
        return cams, images, xyz, rgb

    def test_binary_roundtrip(self, tmp_path, rng):
        cams, images, xyz, rgb = self._make_sparse(tmp_path, rng)
        sparse = str(tmp_path / "sparse" / "0")
        rc = colmap.read_intrinsics_binary(os.path.join(sparse, "cameras.bin"))
        assert rc[1].model == "PINHOLE"
        np.testing.assert_allclose(rc[1].params, cams[1].params)
        ri = colmap.read_extrinsics_binary(os.path.join(sparse, "images.bin"))
        assert len(ri) == len(images)
        np.testing.assert_allclose(ri[3].qvec, images[3].qvec)
        assert ri[3].name == images[3].name
        rx, rrgb, _ = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
        np.testing.assert_allclose(rx, xyz, atol=1e-12)
        np.testing.assert_allclose(rrgb, rgb, atol=1 / 255)

    def test_qvec_rotmat_orthonormal(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = colmap.qvec_to_rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) > 0.999

    def test_scene_assembly(self, tmp_path, rng):
        self._make_sparse(tmp_path, rng)
        imgdir = tmp_path / "images"
        os.makedirs(imgdir)
        for i in range(1, 10):
            Image.fromarray(
                (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
            ).save(imgdir / f"img_{i:03d}.png")
        scene = Scene(str(tmp_path), str(tmp_path / "out"), resolution=1,
                      eval_split=True, shuffle=False)
        # llffhold=8: 9 cams -> 2 test (idx 0, 8), 7 train.
        assert len(scene.get_train_cameras()) == 7
        assert len(scene.get_test_cameras()) == 2
        assert scene.cameras_extent > 0
        cam = scene.get_train_cameras()[0]
        assert cam.image.shape == (3, 48, 64)
        # Artifacts written like the reference Scene.
        assert os.path.exists(tmp_path / "out" / "cameras.json")
        assert os.path.exists(tmp_path / "out" / "input.ply")
        with open(tmp_path / "out" / "cameras.json") as f:
            assert len(json.load(f)) == 9


class TestCamera:
    def test_matrix_conventions(self, rng):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        cam = Camera(colmap_id=0, R=q, T=rng.normal(size=3), FoVx=1.0, FoVy=0.8,
                     image=np.zeros((3, 24, 32), np.float32), image_name="x", uid=0)
        # full_proj = view @ proj (both transposed-stored).
        np.testing.assert_allclose(
            cam.full_proj_transform,
            cam.world_view_transform @ cam.projection_matrix, atol=1e-6)
        # camera center: transforming it to view space gives the origin.
        p = np.append(cam.camera_center, 1.0) @ cam.world_view_transform
        np.testing.assert_allclose(p[:3], 0, atol=1e-4)

    def test_language_feature_gather(self, tmp_path):
        H, W = 8, 10
        cam = Camera(colmap_id=0, R=np.eye(3), T=np.zeros(3), FoVx=1.0, FoVy=0.8,
                     image=np.zeros((3, H, W), np.float32), image_name="im0", uid=0)
        seg = -np.ones((4, H, W), np.int32)
        seg[1, :4] = 0
        seg[1, 4:] = 1
        feats = np.stack([np.full(512, 2.0), np.full(512, 3.0)]).astype(np.float32)
        np.save(tmp_path / "im0_s.npy", seg)
        np.save(tmp_path / "im0_f.npy", feats)
        f, mask = cam.get_language_feature(str(tmp_path), 1)
        assert f.shape == (512, H, W)
        assert mask.all()
        np.testing.assert_allclose(f[0, :4], 2.0)
        np.testing.assert_allclose(f[0, 4:], 3.0)
        _, mask0 = cam.get_language_feature(str(tmp_path), 0)
        assert not mask0.any()

    def test_language_feature_resize(self, tmp_path):
        H, W = 8, 10
        cam = Camera(colmap_id=0, R=np.eye(3), T=np.zeros(3), FoVx=1.0, FoVy=0.8,
                     image=np.zeros((3, H, W), np.float32), image_name="im0", uid=0)
        seg = np.zeros((4, 4, 5), np.int32)  # half-res seg map
        feats = np.full((1, 512), 7.0, np.float32)
        np.save(tmp_path / "im0_s.npy", seg)
        np.save(tmp_path / "im0_f.npy", feats)
        f, mask = cam.get_language_feature(str(tmp_path), 2)
        assert f.shape == (512, H, W)
        np.testing.assert_allclose(f, 7.0)


class TestKnn:
    def test_vs_numpy_bruteforce(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3].mean(1)
        got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts)))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_chunk_boundary(self, rng):
        pts = rng.normal(size=(2050, 3)).astype(np.float32)  # > one chunk
        got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts)))
        assert got.shape == (2050,)
        assert (got > 0).all() and np.isfinite(got).all()


class TestModelIO:
    def _model(self, rng, n=50, cap=64):
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        return gm.create_from_pcd(pts, cols, spatial_lr_scale=1.5, capacity=cap)

    def test_create_from_pcd(self, rng):
        m = self._model(rng)
        assert m.capacity == 64
        assert int(m.num_live) == 50
        # Dead rows render invisible.
        assert np.asarray(m.get_opacity())[50:].max() == 0.0
        np.testing.assert_allclose(np.asarray(m.get_opacity())[:50], 0.1, atol=1e-6)
        assert m.features_rest.shape == (64, 15, 3)
        # SH DC encodes the colors.
        from langsplatv2_tpu.utils.sh import sh_to_rgb
        np.testing.assert_allclose(
            np.asarray(sh_to_rgb(m.features_dc[:50, 0])),
            np.asarray(rng.bit_generator.state and 0) * 0 +
            np.asarray(m.features_dc[:50, 0]) * 0.28209479177387814 + 0.5,
            atol=1e-6,
        )

    def test_ply_roundtrip(self, tmp_path, rng):
        m = self._model(rng)
        p = str(tmp_path / "pc.ply")
        mio.save_ply(m, p)
        m2 = mio.load_ply(p, max_sh_degree=3)
        assert m2.capacity == 50
        np.testing.assert_allclose(np.asarray(m2.xyz), np.asarray(m.xyz)[:50], atol=1e-6)
        np.testing.assert_allclose(np.asarray(m2.features_dc), np.asarray(m.features_dc)[:50], atol=1e-6)
        np.testing.assert_allclose(np.asarray(m2.features_rest), np.asarray(m.features_rest)[:50], atol=1e-6)
        np.testing.assert_allclose(np.asarray(m2.scaling), np.asarray(m.scaling)[:50], atol=1e-6)
        np.testing.assert_allclose(np.asarray(m2.opacity), np.asarray(m.opacity)[:50], atol=1e-6)
        assert m2.active_sh_degree == 3  # load_ply sets max degree

    def test_checkpoint_roundtrip(self, tmp_path, rng):
        import optax

        m = self._model(rng)
        m = gm.init_language_features(m, __import__("jax").random.PRNGKey(0), 1, 16)
        opt = optax.adam(1e-3)
        state = opt.init({"logits": m.language_logits, "codebooks": m.codebooks})
        p = str(tmp_path / "chk.npz")
        mio.save_checkpoint(p, m, state, 1234, extra={"phase": "feature"})
        m2, state2, it, extra = mio.load_checkpoint(p, m, state)
        assert it == 1234 and extra["phase"] == "feature"
        np.testing.assert_array_equal(np.asarray(m2.language_logits), np.asarray(m.language_logits))
        np.testing.assert_array_equal(np.asarray(m2.codebooks), np.asarray(m.codebooks))
        assert m2.spatial_lr_scale == m.spatial_lr_scale


class TestDensify:
    def test_densify_clone_and_split(self, rng):
        import jax

        n, cap = 20, 64
        m = gm.create_from_pcd(
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.uniform(size=(n, 3)).astype(np.float32), 1.0, capacity=cap)
        # Mark gaussians 0..4 as high-gradient; make 0,1 small (clone) and
        # 2,3,4 large (split).
        accum = np.zeros((cap, 1), np.float32)
        accum[:5] = 10.0
        denom = np.zeros((cap, 1), np.float32)
        denom[:5] = 1.0
        scaling = np.asarray(m.scaling).copy()
        scaling[2:5] = np.log(5.0)   # large
        scaling[:2] = np.log(0.001)  # small
        m = m.replace(
            xyz_gradient_accum=jnp.asarray(accum), denom=jnp.asarray(denom),
            scaling=jnp.asarray(scaling))
        extent = 1.0
        m2, overflow, _ = gm.densify_and_prune(
            m, jax.random.PRNGKey(0), max_grad=1.0, min_opacity=0.005,
            extent=extent, max_screen_size=0.0, percent_dense=0.01)
        assert int(overflow) == 0
        # 20 - 3 split originals + 2 clones + 6 split children = 25
        assert int(m2.num_live) == 25
        # Stats reset.
        assert float(jnp.sum(m2.xyz_gradient_accum)) == 0.0

    def test_prune_low_opacity(self, rng):
        import jax
        from langsplatv2_tpu.utils.transforms import inverse_sigmoid

        n, cap = 10, 16
        m = gm.create_from_pcd(
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.uniform(size=(n, 3)).astype(np.float32), 1.0, capacity=cap)
        op = np.asarray(m.opacity).copy()
        op[:4] = np.asarray(inverse_sigmoid(jnp.asarray(0.001)))
        m = m.replace(opacity=jnp.asarray(op))
        m2, _, _ = gm.densify_and_prune(
            m, jax.random.PRNGKey(0), max_grad=1e9, min_opacity=0.005,
            extent=1.0, max_screen_size=0.0, percent_dense=0.01)
        assert int(m2.num_live) == 6

    def test_overflow_and_grow(self, rng):
        import jax

        n = 10
        m = gm.create_from_pcd(
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.uniform(size=(n, 3)).astype(np.float32), 1.0, capacity=n)
        accum = np.full((n, 1), 10.0, np.float32)
        denom = np.ones((n, 1), np.float32)
        m = m.replace(xyz_gradient_accum=jnp.asarray(accum), denom=jnp.asarray(denom),
                      scaling=jnp.full((n, 3), np.log(0.001)))
        m2, overflow, _ = gm.densify_and_prune(
            m, jax.random.PRNGKey(0), max_grad=1.0, min_opacity=0.005,
            extent=1.0, max_screen_size=0.0, percent_dense=0.01)
        assert int(overflow) == 10  # all want to clone, no free slots
        grown = gm.grow_capacity(m, 32)
        assert grown.capacity == 32
        m3, overflow3, placed3 = gm.densify_and_prune(
            grown, jax.random.PRNGKey(0), max_grad=1.0, min_opacity=0.005,
            extent=1.0, max_screen_size=0.0, percent_dense=0.01)
        assert int(overflow3) == 0
        assert int(m3.num_live) == 20
