"""End-to-end CLI / shell-orchestration smoke tests.

Pins the operational tail the reference exercises by hand: the
run_all_levels.sh pipeline (reference run_all_levels.sh:24-62) must run both
phases end-to-end on a tiny synthetic scene, produce checkpoints at the
documented paths (RGB phase in <OUT>_-1/ — train.py appends the feature
level, reference train.py:354), and those checkpoints must carry optimizer
state (reference capture() persists Adam moments, gaussian_model.py:67-101).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_scene(root, rng, n_imgs=9, n_pts=60):
    from PIL import Image

    from langsplatv2_tpu.scene import colmap

    sparse = root / "sparse" / "0"
    os.makedirs(sparse)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([60.0, 60.0, 32.0, 24.0]))}
    colmap.write_intrinsics_binary(str(sparse / "cameras.bin"), cams)
    images = {}
    for i in range(1, n_imgs + 1):
        images[i] = colmap.ColmapImage(
            i, np.array([1.0, 0, 0, 0]), np.array([0.0, 0.0, 4.0]), 1,
            f"img_{i:03d}.png")
    colmap.write_extrinsics_binary(str(sparse / "images.bin"), images)
    xyz = np.concatenate(
        [rng.uniform(-1, 1, (n_pts, 2)), rng.uniform(1.0, 3.0, (n_pts, 1))], 1)
    colmap.write_points3d_binary(str(sparse / "points3D.bin"), xyz,
                                 rng.uniform(size=(n_pts, 3)))

    imgdir = root / "images"
    os.makedirs(imgdir)
    for i in range(1, n_imgs + 1):
        Image.fromarray(
            (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
        ).save(imgdir / f"img_{i:03d}.png")

    # Precomputed language features (the preprocess contract): per image a
    # seg map [4, H, W] and a feature table [N_seg, 512].
    lf = root / "language_features"
    os.makedirs(lf)
    feats = rng.normal(size=(2, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    for i in range(1, n_imgs + 1):
        seg = np.zeros((4, 48, 64), np.int32)
        seg[:, :, 32:] = 1
        np.save(lf / f"img_{i:03d}_s.npy", seg)
        np.save(lf / f"img_{i:03d}_f.npy", feats)


@pytest.mark.slow
def test_run_all_levels_pipeline(tmp_path, rng):
    _build_scene(tmp_path / "scene", rng)
    out = tmp_path / "out" / "model"
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               ITER_RGB="12", ITER_FEAT="8",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=1").strip())
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "run_all_levels.sh"),
         str(tmp_path / "scene"), str(out), "1"],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]

    # RGB phase artifacts live in <OUT>_-1/ (feature_level default -1).
    rgb_ckpt = f"{out}_-1/chkpnt12.npz"
    assert os.path.exists(rgb_ckpt), os.listdir(os.path.dirname(str(out)))
    feat_ckpt = f"{out}_1/chkpnt8.npz"
    assert os.path.exists(feat_ckpt)
    assert os.path.exists(f"{out}_1/point_cloud/iteration_8/point_cloud.ply")

    # Both checkpoints must persist optimizer state (nonzero Adam moments).
    for path, expect_feature in [(rgb_ckpt, False), (feat_ckpt, True)]:
        with np.load(path, allow_pickle=False) as data:
            manifest = json.loads(str(data["manifest"]))
            assert manifest["num_opt_leaves"] > 0, path
            assert manifest["include_feature"] == expect_feature
            opt_leaves = [data[f"opt/{i}"]
                          for i in range(manifest["num_opt_leaves"])]
            assert any(np.any(leaf != 0) for leaf in opt_leaves
                       if hasattr(leaf, "ndim") and leaf.ndim >= 1), path
            if expect_feature:
                assert "model/language_logits" in data
                assert "model/codebooks" in data


@pytest.mark.slow
def test_eval_psnr_cli(tmp_path, rng):
    """scripts/eval_psnr.py must load the latest checkpoint, render the
    cameras, and report a finite mean PSNR (reference eval_araba.py:13-51
    incl. the no-test-split -> first-10-train-cameras fallback)."""
    _build_scene(tmp_path / "scene", rng)
    out = tmp_path / "out" / "m"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=1").strip())
    p1 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train.py"),
         "-s", str(tmp_path / "scene"), "-m", str(out),
         "--iterations", "5", "--checkpoint_iterations", "5"],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert p1.returncode == 0, p1.stdout[-2000:] + p1.stderr[-2000:]
    p2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_psnr.py"),
         "-s", str(tmp_path / "scene"), "-m", f"{out}_-1", "--quiet"],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert p2.returncode == 0, p2.stdout[-2000:] + p2.stderr[-2000:]
    line = [l for l in p2.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["num_images"] > 0
    assert np.isfinite(res["mean_psnr"]) and res["mean_psnr"] > 0


@pytest.mark.slow
def test_train_cli_resume_restores_opt_state(tmp_path, rng):
    """Same-phase resume must restore Adam moments from the checkpoint."""
    _build_scene(tmp_path / "scene", rng)
    out = tmp_path / "out" / "m"
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=1").strip())
    base = [sys.executable, os.path.join(REPO, "scripts", "train.py"),
            "-s", str(tmp_path / "scene"), "-m", str(out)]
    p1 = subprocess.run(
        base + ["--iterations", "6", "--checkpoint_iterations", "6",
                "--save_iterations", "6"],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert p1.returncode == 0, p1.stdout[-4000:] + p1.stderr[-4000:]
    ckpt = f"{out}_-1/chkpnt6.npz"
    assert os.path.exists(ckpt)
    p2 = subprocess.run(
        base + ["--start_checkpoint", ckpt, "--iterations", "8",
                "--checkpoint_iterations", "8", "--save_iterations", "8"],
        env=env, capture_output=True, text=True, timeout=600, cwd=REPO)
    assert p2.returncode == 0, p2.stdout[-4000:] + p2.stderr[-4000:]
    assert "resuming with fresh moments" not in p2.stdout + p2.stderr
    assert os.path.exists(f"{out}_-1/chkpnt8.npz")
