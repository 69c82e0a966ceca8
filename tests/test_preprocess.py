"""Preprocess pipeline tests with a synthetic mask generator (no SAM)."""
import numpy as np
import pytest

from langsplatv2_tpu.preprocess import masks as mask_ops
from langsplatv2_tpu.preprocess.pipeline import PreprocessPipeline


def make_mask(h, w, y0, y1, x0, x1, iou=0.9, stab=0.95):
    seg = np.zeros((h, w), bool)
    seg[y0:y1, x0:x1] = True
    return {
        "segmentation": seg,
        "bbox": [x0, y0, x1 - x0, y1 - y0],
        "predicted_iou": iou,
        "stability_score": stab,
    }


class TestMaskNMS:
    def test_duplicate_suppressed(self):
        h = w = 32
        m1 = make_mask(h, w, 4, 20, 4, 20, iou=0.95)
        m2 = make_mask(h, w, 5, 20, 4, 20, iou=0.90)  # near-duplicate, lower score
        m3 = make_mask(h, w, 22, 30, 22, 30, iou=0.92)
        seg = np.stack([m["segmentation"] for m in (m1, m2, m3)])
        scores = np.array([0.95 * 0.95, 0.90 * 0.95, 0.92 * 0.95])
        keep = mask_ops.mask_nms(seg, scores, iou_thr=0.7, score_thr=0.1)
        assert 0 in keep and 2 in keep and 1 not in keep

    def test_low_scores_fall_back_to_top3(self):
        h = w = 16
        ms = [make_mask(h, w, i, i + 4, 0, 8) for i in range(0, 12, 4)]
        seg = np.stack([m["segmentation"] for m in ms])
        scores = np.array([0.05, 0.04, 0.03])  # all below score_thr
        keep = mask_ops.mask_nms(seg, scores, iou_thr=0.9, score_thr=0.5)
        assert len(keep) == 3  # top-3 fallback

    def test_inner_overlap_suppression(self):
        # Small mask almost entirely inside a big one, but the big one only
        # slightly covered -> the small one gets inner-suppressed when the
        # product rule fires.
        h = w = 64
        big = make_mask(h, w, 0, 60, 0, 60, iou=0.9)
        small = make_mask(h, w, 10, 18, 10, 18, iou=0.89)
        seg = np.stack([big["segmentation"], small["segmentation"]])
        scores = np.array([0.9, 0.89])
        # intersection/area_small = 1.0 >= 0.85; intersection/area_big ~ 0.018 < 0.5
        # inner = 1 - 1.0*0.018 = 0.982 > 1 - inner_thr(0.5) -> suppressed
        keep = mask_ops.mask_nms(seg, scores, iou_thr=0.7, score_thr=0.1,
                                 inner_thr=0.5)
        assert 0 in keep and 1 not in keep

    def test_masks_update_filters_levels(self):
        h = w = 32
        lvl1 = [make_mask(h, w, 0, 16, 0, 16), make_mask(h, w, 1, 16, 0, 16)]
        lvl2 = [make_mask(h, w, 16, 30, 16, 30)]
        out1, out2 = mask_ops.masks_update(lvl1, lvl2, iou_thr=0.8,
                                           score_thr=0.7, inner_thr=0.5)
        assert len(out1) == 1 and len(out2) == 1


class TestCrops:
    def test_pad_img_square(self):
        img = np.ones((10, 4, 3), np.uint8) * 7
        out = mask_ops.pad_img(img)
        assert out.shape == (10, 10, 3)
        assert (out[:, 3:7] == 7).all()
        assert (out[:, :3] == 0).all()

    def test_mask_to_segmap(self):
        h = w = 32
        image = np.full((h, w, 3), 128, np.uint8)
        ms = [make_mask(h, w, 0, 16, 0, 32), make_mask(h, w, 16, 32, 0, 32)]
        tiles, seg = mask_ops.mask_to_segmap(ms, image)
        assert tiles.shape == (2, 3, 224, 224)
        assert (seg[:16] == 0).all() and (seg[16:] == 1).all()


class TestPipeline:
    def _generator(self, image):
        h, w = image.shape[:2]
        half = [make_mask(h, w, 0, h // 2, 0, w), make_mask(h, w, h // 2, h, 0, w)]
        quad = [make_mask(h, w, 0, h // 2, 0, w // 2),
                make_mask(h, w, 0, h // 2, w // 2, w),
                make_mask(h, w, h // 2, h, 0, w // 2),
                make_mask(h, w, h // 2, h, w // 2, w)]
        whole = [make_mask(h, w, 0, h, 0, w)]
        return (half, quad, half, whole)  # default, s, m, l

    def test_process_image_contract(self, tmp_path):
        rng = np.random.default_rng(0)
        image = (rng.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
        pipe = PreprocessPipeline(self._generator, clip_backend="hash")
        features, seg_map = pipe.process_image(image)
        # 2 + 4 + 2 + 1 masks across levels.
        assert features.shape == (9, 512)
        np.testing.assert_allclose(np.linalg.norm(features, axis=1), 1.0, rtol=1e-5)
        assert seg_map.shape == (4, 64, 64)
        # Cross-level cumulative offsets: level 1 ids start at 2, level 3 at 8.
        assert set(np.unique(seg_map[0])) == {0, 1}
        assert set(np.unique(seg_map[1])) == {2, 3, 4, 5}
        assert set(np.unique(seg_map[3])) == {8}
        # Save path writes the npy contract files.
        pipe.run([image], ["im0.png"], str(tmp_path))
        s = np.load(tmp_path / "im0_s.npy")
        f = np.load(tmp_path / "im0_f.npy")
        assert s.shape == (4, 64, 64) and f.shape == (9, 512)
        # Contract with Camera.get_language_feature: ids index rows of f.
        assert s.max() == f.shape[0] - 1


class TestClusterSegmenter:
    """The weights-free fallback segmenter must carry the whole preprocess
    stage end-to-end: SAM-contract mask dicts -> NMS -> crops -> CLIP ->
    the _s/_f npy contract that Camera.get_language_feature(_compact)
    consumes."""

    def test_end_to_end_npy_contract(self, tmp_path):
        from langsplatv2_tpu.preprocess.pipeline import (
            ClusterMaskGenerator, PreprocessPipeline)

        rng = np.random.default_rng(0)
        img = np.zeros((64, 96, 3), np.uint8)
        img[:, :48] = [200, 40, 40]      # two clear color regions
        img[:, 48:] = [40, 40, 200]
        img[20:40, 30:60] = [40, 200, 40]  # an object straddling both
        img = np.clip(img.astype(np.int32)
                      + rng.integers(-8, 8, img.shape), 0, 255).astype(np.uint8)

        gen = ClusterMaskGenerator()
        levels = gen(img)
        assert len(levels) == 4 and all(len(l) > 0 for l in levels)
        for m in levels[0]:
            assert set(m) >= {"segmentation", "bbox", "predicted_iou",
                              "stability_score"}
            assert m["segmentation"].shape == img.shape[:2]

        pipe = PreprocessPipeline(gen, clip_backend="hash")
        pipe.run([img], ["img_001.png"], str(tmp_path))
        seg = np.load(tmp_path / "img_001_s.npy")
        feats = np.load(tmp_path / "img_001_f.npy")
        assert seg.shape == (4, 64, 96) and seg.dtype.kind == "i"
        assert feats.shape[1] == 512
        assert seg.max() == feats.shape[0] - 1   # shared-table indexing
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)

        # The training-side consumer reads it back.
        from langsplatv2_tpu.scene.cameras import Camera
        cam = Camera(0, np.eye(3), np.zeros(3), 1.0, 0.8,
                     np.zeros((3, 64, 96), np.float32), "img_001", 0)
        table, seg1 = cam.get_language_feature_compact(str(tmp_path), 1)
        assert table.shape == feats.shape
        assert seg1.shape == (64, 96)
