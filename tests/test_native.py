"""Native C++ data-path runtime vs the pure-numpy reference path."""
import os
import struct

import numpy as np
import pytest

from langsplatv2_tpu import native
from langsplatv2_tpu.scene import colmap
from langsplatv2_tpu.scene.cameras import Camera

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)")


def _write_features(tmp_path, name, levels=4, h=37, w=53, n_seg=17, d=512,
                    f16=False, seed=0):
    rng = np.random.default_rng(seed)
    seg = rng.integers(-1, n_seg, (levels, h, w)).astype(np.int32)
    feat = rng.normal(size=(n_seg, d)).astype(np.float16 if f16 else np.float32)
    np.save(os.path.join(tmp_path, name + "_s.npy"), seg)
    np.save(os.path.join(tmp_path, name + "_f.npy"), feat)
    return seg, feat


def _numpy_reference(seg, feat, level, H, W):
    s = seg[level]
    if s.shape != (H, W):
        import cv2
        s = cv2.resize(s, (W, H), interpolation=cv2.INTER_NEAREST)
    mask = s != -1
    gathered = feat.astype(np.float32)[s]
    return np.transpose(gathered, (2, 0, 1)), mask[None]


class TestFeatureLoader:
    @pytest.mark.parametrize("f16", [False, True])
    def test_same_resolution(self, tmp_path, f16):
        seg, feat = _write_features(str(tmp_path), "img0", f16=f16)
        H, W = seg.shape[1:]
        out = native.load_language_feature(
            str(tmp_path / "img0_s.npy"), str(tmp_path / "img0_f.npy"),
            2, H, W)
        assert out is not None
        got_f, got_m = out
        ref_f, ref_m = _numpy_reference(seg, feat, 2, H, W)
        np.testing.assert_array_equal(got_m, ref_m)
        np.testing.assert_allclose(got_f, ref_f, rtol=0, atol=0)

    def test_resized(self, tmp_path):
        seg, feat = _write_features(str(tmp_path), "img1", h=24, w=31)
        H, W = 48, 62  # exact 2x keeps cv2/floor nearest unambiguous
        out = native.load_language_feature(
            str(tmp_path / "img1_s.npy"), str(tmp_path / "img1_f.npy"),
            1, H, W)
        assert out is not None
        got_f, got_m = out
        ref_f, ref_m = _numpy_reference(seg, feat, 1, H, W)
        np.testing.assert_array_equal(got_m, ref_m)
        np.testing.assert_allclose(got_f, ref_f)

    def test_camera_integration(self, tmp_path):
        seg, feat = _write_features(str(tmp_path), "cam", h=32, w=48)
        cam = Camera(
            colmap_id=0, R=np.eye(3), T=np.zeros(3), FoVx=1.0, FoVy=0.8,
            image=np.zeros((3, 32, 48), np.float32), image_name="cam", uid=0)
        f, m = cam.get_language_feature(str(tmp_path), 1)
        ref_f, ref_m = _numpy_reference(seg, feat, 1, 32, 48)
        np.testing.assert_array_equal(np.asarray(m), ref_m)
        np.testing.assert_allclose(np.asarray(f), ref_f)


class TestPoints3D:
    def test_binary_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        n = 57
        xyz = rng.normal(size=(n, 3))
        rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)
        err = rng.uniform(0, 2, n)
        path = tmp_path / "points3D.bin"
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", n))
            for i in range(n):
                f.write(struct.pack("<Q", i))
                f.write(struct.pack("<ddd", *xyz[i]))
                f.write(struct.pack("<BBB", *rgb[i]))
                f.write(struct.pack("<d", err[i]))
                track = rng.integers(0, 5)
                f.write(struct.pack("<Q", track))
                f.write(b"\0" * (8 * int(track)))
        out = native.read_points3d_bin(str(path))
        assert out is not None
        np.testing.assert_allclose(out[0], xyz)
        np.testing.assert_array_equal(out[1], rgb)
        np.testing.assert_allclose(out[2], err)
        # and through the colmap reader (native-accelerated)
        x2, c2, e2 = colmap.read_points3d_binary(str(path))
        np.testing.assert_allclose(x2, xyz)
        np.testing.assert_allclose(c2, rgb / 255.0)
