"""Tests for the eval stack: relevancy math, mask processing, metrics, and
the merged quick-render LERF path."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplatv2_tpu.eval import processing
from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork, HashBackend
from langsplatv2_tpu.eval import lerf
from langsplatv2_tpu.models import gaussians as gm
from scene_fixtures import make_camera, random_gaussians


class TestRelevancy:
    def _net(self):
        return OpenCLIPNetwork(backend="hash")

    def test_relevancy_favors_matching_direction(self):
        net = self._net()
        net.set_positives(["cat"])
        pos_dir = np.asarray(net.pos_embeds[0])
        neg_dir = np.asarray(net.neg_embeds[0])
        embed = jnp.asarray(np.stack([pos_dir, neg_dir, -pos_dir]))
        rel = np.asarray(net.get_relevancy(embed, 0))
        assert rel.shape == (3, 2)
        # Pixel aligned with the positive phrase scores high, others low.
        assert rel[0, 0] > 0.9
        assert rel[1, 0] < 0.5
        assert rel[2, 0] < 0.2
        # Rows are probability pairs.
        np.testing.assert_allclose(rel.sum(axis=1), 1.0, atol=1e-5)

    def test_quick_matches_loop(self):
        net = self._net()
        net.set_positives(["cat", "dog"])
        rng = np.random.default_rng(0)
        sem = rng.normal(size=(3, 6, 8, 512)).astype(np.float32)
        sem /= np.linalg.norm(sem, axis=-1, keepdims=True)
        slow = np.asarray(net.get_max_across(jnp.asarray(sem)))
        quick = np.asarray(net.get_max_across_quick(jnp.asarray(sem)))
        np.testing.assert_allclose(quick, slow, atol=1e-5)

    def test_semantic_map(self):
        net = self._net()
        net.set_semantics(["apple", "banana"])
        a = np.asarray(net.semantic_embeds[0])
        b = np.asarray(net.semantic_embeds[1])
        neg = np.asarray(net.neg_embeds[0])
        sem = jnp.asarray(np.stack([a, b, neg]).reshape(1, 1, 3, 512))
        pred = np.asarray(net.get_semantic_map(sem))
        assert pred.tolist() == [[[0, 1, -1]]]


class TestProcessing:
    def test_avg_pool_count_include_pad_false(self):
        # Against a tiny hand-computed case: kernel 3, padding 1.
        x = jnp.asarray(np.arange(9, dtype=np.float32).reshape(3, 3))
        out = np.asarray(processing.avg_pool_same(x, 3, 1))
        # Corner (0,0): mean of the 4 in-bounds values {0,1,3,4} = 2.0
        assert out[0, 0] == pytest.approx(2.0)
        # Center: mean of all 9 = 4.0
        assert out[1, 1] == pytest.approx(4.0)

    def test_heatmap_to_mask_thresholding(self):
        h = np.zeros((64, 64), np.float32)
        h[20:40, 20:40] = 1.0
        blended, mask = processing.heatmap_to_mask(jnp.asarray(h), 0.4)
        mask = np.asarray(mask)
        # The hot square survives; the background does not.
        assert mask[30, 30] == 1
        assert mask[5, 5] == 0

    def test_segmentation_iou_perfect(self):
        h = np.zeros((2, 1, 64, 64), np.float32)  # 2 levels, 1 prompt
        h[0, 0, 16:32, 16:32] = 1.0               # level 0 matches GT
        h[1, 0, 40:48, 40:48] = 0.6               # level 1 weaker elsewhere
        gt = np.zeros((64, 64), bool)
        gt[16:32, 16:32] = True
        ious, lvls, iou_all = processing.segmentation_process(
            jnp.asarray(h), 0.4, {"obj": gt}, ["obj"])
        assert lvls == [0]
        assert ious[0] > 0.8

    def test_localization_hit_and_miss(self):
        # Hot square well away from borders (count_include_pad=False boosts
        # border windows, so a border-adjacent lone pixel would localize to
        # the corner — faithful torch behavior).
        h = np.zeros((1, 1, 64, 64), np.float32)
        h[0, 0, 28:36, 28:36] = 1.0
        bboxes_hit = {"obj": np.array([24, 24, 40, 40])}   # x1 y1 x2 y2
        bboxes_miss = {"obj": np.array([50, 2, 62, 12])}
        assert processing.localization_process(h, bboxes_hit, ["obj"]) == 1
        assert processing.localization_process(h, bboxes_miss, ["obj"]) == 0

    def test_polygon_to_mask(self):
        mask = processing.polygon_to_mask((10, 10), [[1, 1], [8, 1], [8, 8], [1, 8]])
        assert mask[5, 5] and not mask[0, 0]


class TestLerfQuickPath:
    def test_merge_and_render(self, rng):
        n = 40
        H, W = 48, 64
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)

        class FakeCam:
            world_view_transform = np.asarray(cam["viewmatrix"])
            full_proj_transform = np.asarray(cam["projmatrix"])
            camera_center = np.asarray(cam["campos"])
            tanfovx = cam["tanfovx"]
            tanfovy = cam["tanfovy"]
            image_height, image_width = H, W

        models = []
        for lvl in range(3):
            m = gm.create_from_pcd(
                np.asarray(g["means3d"]), np.full((n, 3), 0.5, np.float32), 1.0)
            m = m.replace(opacity=jnp.full((n, 1), 1.5))
            m = gm.init_language_features(m, jax.random.PRNGKey(lvl), 1, 64)
            models.append(m)
        merged = lerf.merge_level_models(models)
        assert merged.quick_weights.shape == (n, 12)
        assert merged.codebooks.shape == (3, 64, 512)
        # Indices occupy disjoint per-level ranges.
        qi = np.asarray(merged.quick_indices)
        for lvl in range(3):
            chunk = qi[:, lvl * 4:(lvl + 1) * 4]
            assert (chunk >= lvl * 64).all() and (chunk < (lvl + 1) * 64).all()

        from langsplatv2_tpu.models.renderer import make_settings
        settings = make_settings(FakeCam(), 0, 1.0, 2 ** 14, 256, 8)
        feats = lerf.render_language_feature_map_quick(
            merged, settings,
            jnp.asarray(cam["viewmatrix"]), jnp.asarray(cam["projmatrix"]),
            jnp.asarray(cam["campos"]), jnp.zeros(3))
        assert feats.shape == (3, 512, H, W)
        norms = np.linalg.norm(np.asarray(feats), axis=1)
        # Where anything rendered, decoded features are unit-norm.
        assert norms.max() == pytest.approx(1.0, abs=1e-4)

    def test_nonquick_evaluate_agrees_with_quick(self, rng):
        """The non-quick `evaluate` (3 separate models, full per-level
        decode — reference eval_lerf.py:223-291) must agree with the
        merged quick path on the same scene: the quick representation is
        an exact repackaging of each model's top-k weights."""
        n = 40
        H, W = 48, 64
        g = random_gaussians(rng, n)
        cam = make_camera(H, W)

        class FakeCam:
            world_view_transform = np.asarray(cam["viewmatrix"])
            full_proj_transform = np.asarray(cam["projmatrix"])
            camera_center = np.asarray(cam["campos"])
            tanfovx = cam["tanfovx"]
            tanfovy = cam["tanfovy"]
            image_height, image_width = H, W

        models = []
        for lvl in range(3):
            m = gm.create_from_pcd(
                np.asarray(g["means3d"]), np.full((n, 3), 0.5, np.float32),
                1.0)
            m = m.replace(opacity=jnp.full((n, 1), 1.5))
            m = gm.init_language_features(m, jax.random.PRNGKey(lvl), 1, 64)
            models.append(m)
        merged = lerf.merge_level_models(models)

        mask = np.zeros((H, W), bool)
        mask[10:30, 20:44] = True
        gt_ann = {"0": {"cup": {"mask": mask,
                                "bboxes": np.array([20, 10, 44, 30])}}}
        net = OpenCLIPNetwork(backend="hash")
        cams = [FakeCam()]
        r_quick = lerf.evaluate_quick(merged, cams, gt_ann, (H, W), net,
                                      gram_relevancy=False)
        r_full = lerf.evaluate(models, cams, gt_ann, (H, W), net)
        assert r_full["num_prompts"] == r_quick["num_prompts"] == 1
        np.testing.assert_allclose(r_full["mean_iou"], r_quick["mean_iou"],
                                   atol=1e-5)
        assert (r_full["localization_accuracy"]
                == r_quick["localization_accuracy"])

    def test_gt_parsing(self, tmp_path):
        ann = {
            "info": {"name": "frame_00001.jpg", "height": 32, "width": 40},
            "objects": [
                {"category": "cup", "bbox": [2, 3, 10, 12],
                 "segmentation": [[2, 3], [10, 3], [10, 12], [2, 12]]},
                {"category": "cup", "bbox": [20, 20, 30, 28],
                 "segmentation": [[20, 20], [30, 20], [30, 28], [20, 28]]},
            ],
        }
        with open(tmp_path / "frame_00001.json", "w") as f:
            json.dump(ann, f)
        gt_ann, (h, w), _ = lerf.eval_gt_lerfdata(str(tmp_path))
        assert (h, w) == (32, 40)
        assert "0" in gt_ann and "cup" in gt_ann["0"]
        # Two boxes stacked into one entry with a union mask.
        assert gt_ann["0"]["cup"]["bboxes"].reshape(-1, 4).shape[0] == 2
        assert gt_ann["0"]["cup"]["mask"][5, 5]
        assert gt_ann["0"]["cup"]["mask"][24, 24]


class TestGramRelevancy:
    def test_matches_decoded_relevancy(self):
        from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork

        net = OpenCLIPNetwork(backend="hash")
        net.set_positives(["red apple", "blue chair", "grass"])
        rng = np.random.default_rng(0)
        L, K, H, W = 3, 64, 24, 32
        cb = jnp.asarray(rng.normal(size=(L, K, 512)).astype(np.float32))
        wm = jnp.asarray(np.abs(rng.normal(size=(L * K, H, W))).astype(np.float32))

        flat = wm.reshape(L, K, H * W)
        feats = jnp.einsum("lkd,lkp->ldp", cb, flat)
        feats = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-10)
        sem = feats.reshape(L, 512, H, W).transpose(0, 2, 3, 1)
        ref = net.get_max_across_quick(sem)
        fast = net.get_max_across_from_weights(wm, cb)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)
