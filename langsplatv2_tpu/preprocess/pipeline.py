"""Preprocessing pipeline: images -> per-pixel CLIP feature tables.

Parity target: reference `preprocess.py` `create()` (113-174) +
`sam_encoder` (296-329): per image, 4-granularity SAM masks -> NMS ->
crop/pad/224 tiles -> CLIP-encode -> `<img>_s.npy` seg-index map [4, H, W]
(levels default/s/m/l with cumulative cross-level index offsets) +
`<img>_f.npy` features [N_seg, 512].

The SAM mask generator is pluggable (this environment has neither the
segment-anything fork nor its ViT-H weights): `SamMaskGenerator` uses the
real model when importable; any callable `image -> 4 lists of mask dicts`
works (tests use a synthetic generator). CLIP encoding goes through
eval.openclip backends.
"""
from __future__ import annotations

import os
from typing import Callable

import numpy as np

from . import masks as mask_ops
from ..eval.openclip import make_backend

LEVELS = ("default", "s", "m", "l")


class SamMaskGenerator:
    """Wraps the segment-anything-langsplat 4-granularity generator
    (reference preprocess.py:362-372: points_per_side=32, crop_n_layers=1,
    ViT-H). Import-gated."""

    def __init__(self, checkpoint: str, model_type: str = "vit_h",
                 points_per_side: int = 32):
        from segment_anything import SamAutomaticMaskGenerator, sam_model_registry

        sam = sam_model_registry[model_type](checkpoint=checkpoint)
        self.generator = SamAutomaticMaskGenerator(
            model=sam,
            points_per_side=points_per_side,
            pred_iou_thresh=0.7,
            box_nms_thresh=0.7,
            stability_score_thresh=0.85,
            crop_n_layers=1,
            crop_n_points_downscale_factor=1,
            min_mask_region_area=100,
        )

    def __call__(self, image: np.ndarray):
        return self.generator.generate(image)  # 4-tuple in the langsplat fork


class ClusterMaskGenerator:
    """Weights-free 4-granularity segmenter: k-means over (color, position)
    features followed by connected-component splitting, one clustering per
    granularity (finer = more clusters, mirroring SAM's s/m/l ordering).

    This is NOT a SAM substitute semantically — it exists so the whole
    preprocess stage (mask NMS, crop/pad/224, seg-index bookkeeping, CLIP
    encoding, the _s/_f npy contract) runs end-to-end in environments
    where the SAM checkpoint cannot exist, and as a baseline segmenter for
    scenes where color regions track objects. Mask dicts carry the same
    keys the SAM wrapper produces (segmentation, bbox, predicted_iou,
    stability_score — SURVEY.md §2.3(c))."""

    # clusters per granularity: 0=default, 1=s(fine), 2=m, 3=l(coarse)
    LEVEL_CLUSTERS = (24, 48, 16, 6)

    def __init__(self, seed: int = 42, min_area: int | None = None,
                 position_weight: float = 0.5):
        self.seed = seed
        self.min_area = min_area   # None: adaptive, ~hw/1000 in [16, 256]
        self.position_weight = position_weight

    def _masks_for(self, image: np.ndarray, k: int):
        import cv2

        h, w = image.shape[:2]
        min_area = (self.min_area if self.min_area is not None
                    else int(np.clip(h * w // 1000, 16, 256)))
        k = max(2, min(k, h * w // (4 * min_area)))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        feats = np.concatenate([
            image.reshape(h * w, -1).astype(np.float32) / 255.0,
            (self.position_weight * yy / h).reshape(-1, 1),
            (self.position_weight * xx / w).reshape(-1, 1),
        ], axis=1)
        # cv2.kmeans: fast, deterministic with a fixed seed via the
        # KMEANS_PP init on a fixed RNG state.
        cv2.setRNGSeed(self.seed)
        _, labels, _ = cv2.kmeans(
            feats, k, None,
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 10, 1.0),
            1, cv2.KMEANS_PP_CENTERS)
        labels = labels.reshape(h, w)
        out = []
        for c in range(k):
            cluster = (labels == c).astype(np.uint8)
            if cluster.sum() < min_area:
                continue
            n_cc, cc = cv2.connectedComponents(cluster)
            for comp in range(1, n_cc):
                seg = cc == comp
                area = int(seg.sum())
                if area < min_area:
                    continue
                ys, xs = np.nonzero(seg)
                x0, y0 = int(xs.min()), int(ys.min())
                out.append({
                    "segmentation": seg,
                    "bbox": [x0, y0, int(xs.max()) - x0 + 1,
                             int(ys.max()) - y0 + 1],
                    "predicted_iou": 1.0,
                    "stability_score": 1.0,
                })
        return out

    def __call__(self, image: np.ndarray):
        out = []
        for k in self.LEVEL_CLUSTERS:
            masks = self._masks_for(image, k)
            if not masks:
                # Degenerate inputs (tiny/noise images): a full-frame mask
                # keeps the level non-empty, which the pipeline requires.
                h, w = image.shape[:2]
                masks = [{
                    "segmentation": np.ones((h, w), bool),
                    "bbox": [0, 0, w, h],
                    "predicted_iou": 1.0,
                    "stability_score": 1.0,
                }]
            out.append(masks)
        return tuple(out)


class PreprocessPipeline:
    def __init__(self, mask_generator: Callable, clip_backend: str = "auto"):
        self.mask_generator = mask_generator
        self.clip = make_backend(clip_backend)

    def encode_image_tiles(self, tiles: np.ndarray) -> np.ndarray:
        emb = np.asarray(self.clip.encode_image(tiles), np.float32)
        return emb / np.linalg.norm(emb, axis=-1, keepdims=True)

    def process_image(self, image: np.ndarray):
        """image [H, W, 3] uint8 RGB -> (features [N, 512], seg_map [4, H, W]).

        Level seg ids are offset cumulatively so all levels index one shared
        feature table (reference create(), preprocess.py:140-157)."""
        levels = self.mask_generator(image)
        levels = mask_ops.masks_update(
            *levels, iou_thr=0.8, score_thr=0.7, inner_thr=0.5)

        embeds, seg_maps, lengths = [], [], []
        for masks_lvl in levels:
            assert len(masks_lvl) > 0, "level produced no masks"
            tiles, seg_map = mask_ops.mask_to_segmap(masks_lvl, image)
            embeds.append(self.encode_image_tiles(tiles))
            seg_maps.append(seg_map)
            lengths.append(len(masks_lvl))

        offsets = np.cumsum([0] + lengths[:-1])
        stacked = []
        for j, seg_map in enumerate(seg_maps):
            s = seg_map.copy()
            if j > 0:
                assert s.max() == lengths[j] - 1
                s[s != -1] += offsets[j]
            stacked.append(s)
        features = np.concatenate(embeds, axis=0)
        return features, np.stack(stacked, axis=0)

    def run(self, image_list: list[np.ndarray], name_list: list[str],
            save_folder: str) -> None:
        os.makedirs(save_folder, exist_ok=True)
        for img, name in zip(image_list, name_list):
            features, seg_map = self.process_image(img)
            base = os.path.join(save_folder, os.path.splitext(name)[0])
            np.save(base + "_s.npy", seg_map)
            np.save(base + "_f.npy", features)


def create(image_list, data_list, save_folder, mask_generator,
           clip_backend: str = "auto"):
    """Reference-compatible entry (preprocess.py:113)."""
    PreprocessPipeline(mask_generator, clip_backend).run(
        image_list, data_list, save_folder)


def load_images(dataset_path: str, resize_max: int = 1080) -> tuple[list, list]:
    """Load + auto-resize dataset images (reference preprocess.py:374-400:
    height capped at 1080)."""
    import cv2

    img_folder = os.path.join(dataset_path, "images")
    names = sorted(os.listdir(img_folder))
    images, kept = [], []
    for name in names:
        path = os.path.join(img_folder, name)
        img = cv2.imread(path)
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if img.shape[0] > resize_max:
            scale = resize_max / img.shape[0]
            img = cv2.resize(
                img, (round(img.shape[1] * scale), resize_max),
                interpolation=cv2.INTER_LINEAR)
        images.append(img)
        kept.append(name)
    return images, kept
