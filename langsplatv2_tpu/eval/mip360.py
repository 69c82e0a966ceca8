"""Mip-NeRF360 open-vocabulary benchmark driver.

Parity target: reference `eval_mip_nerf360.py` — labelme GT like LERF,
rendered feature maps resized to the GT resolution before relevancy
(eval_mip_nerf360.py:195,223,300-302), and level choice by mean relevancy
inside the GT mask (144-149). mask_thresh 0.4. This is also the
large-scene config driving the Gaussian-count scaling work
(BASELINE.md config 5).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import processing
from .lerf import eval_gt_lerfdata, render_language_feature_map_quick  # shared GT format
from .openclip import OpenCLIPNetwork
from ..models.renderer import make_settings


def resize_feature_map(feats: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinearly resize [L, C, H, W] -> [L, C, height, width] (the torch
    transforms.Resize equivalent used on rendered maps)."""
    import jax.image

    L, C, H, W = feats.shape
    return jax.image.resize(feats, (L, C, height, width), method="bilinear")


def segmentation_process_mask_score(valid_map, thresh, gt_masks, prompts):
    """Level chosen by mean relevancy inside the *GT* mask
    (eval_mip_nerf360.py:144-149); IoU machinery shared with LERF."""
    n_head, n_prompt = valid_map.shape[:2]
    chosen_iou_list, chosen_lvl_list = [], []
    for k in range(n_prompt):
        gt = jnp.asarray(gt_masks[prompts[k]].astype(np.uint8))
        ious, scores = [], []
        for i in range(n_head):
            blended, mask_pred = processing.heatmap_to_mask(valid_map[i, k], thresh)
            ious.append(float(processing.iou(gt, mask_pred)))
            gt_f = np.asarray(gt, np.float32)
            scores.append(float((np.asarray(blended) * gt_f).sum() /
                                max(gt_f.sum(), 1.0)))
        chosen = int(np.argmax(scores))
        chosen_iou_list.append(ious[chosen])
        chosen_lvl_list.append(chosen)
    return chosen_iou_list, chosen_lvl_list


def evaluate(models, cameras, gt_ann, image_shape,
             clip_model: OpenCLIPNetwork | None = None,
             mask_thresh: float = 0.4, logger=None):
    """Non-quick Mip-NeRF360 evaluation: separate per-level models, full
    per-level decode (the reference `evaluate` formulation) — the quick
    merge cross-check."""
    from .lerf import render_language_feature_map_full

    clip_model = clip_model or OpenCLIPNetwork()
    gt_h, gt_w = image_shape
    bg = jnp.zeros(3, jnp.float32)
    chosen_iou_all = []
    acc_num = 0
    total = 0

    for j_str, img_ann in gt_ann.items():
        cam = cameras[int(j_str)]
        feats = render_language_feature_map_full(models, cam, bg)
        if feats.shape[-2:] != (gt_h, gt_w):
            feats = resize_feature_map(feats, gt_h, gt_w)
        sem_map = jnp.transpose(feats, (0, 2, 3, 1))
        prompts = list(img_ann.keys())
        clip_model.set_positives(prompts)
        valid_map = clip_model.get_max_across_quick(sem_map)

        masks = {p: img_ann[p]["mask"] for p in prompts}
        bboxes = {p: img_ann[p]["bboxes"] for p in prompts}
        c_iou, c_lvl = segmentation_process_mask_score(
            valid_map, mask_thresh, masks, prompts)
        acc = processing.localization_process(np.asarray(valid_map), bboxes,
                                              prompts)
        chosen_iou_all.extend(c_iou)
        acc_num += acc
        total += len(prompts)
        if logger:
            logger.info(f"frame {j_str}: iou {c_iou} lvl {c_lvl}")

    return {
        "mean_iou": float(np.mean(chosen_iou_all)) if chosen_iou_all else 0.0,
        "localization_accuracy": acc_num / max(total, 1),
        "num_prompts": total,
    }


def evaluate_quick(merged_model, cameras, gt_ann, image_shape,
                   clip_model: OpenCLIPNetwork | None = None,
                   mask_thresh: float = 0.4, logger=None):
    clip_model = clip_model or OpenCLIPNetwork()
    gt_h, gt_w = image_shape
    bg = jnp.zeros(3, jnp.float32)
    chosen_iou_all = []
    acc_num = 0
    total = 0

    for j_str, img_ann in gt_ann.items():
        cam = cameras[int(j_str)]
        settings = make_settings(cam, merged_model.active_sh_degree)
        feats = render_language_feature_map_quick(
            merged_model, settings,
            jnp.asarray(cam.world_view_transform),
            jnp.asarray(cam.full_proj_transform),
            jnp.asarray(cam.camera_center), bg)
        if feats.shape[-2:] != (gt_h, gt_w):
            feats = resize_feature_map(feats, gt_h, gt_w)
        sem_map = jnp.transpose(feats, (0, 2, 3, 1))
        prompts = list(img_ann.keys())
        clip_model.set_positives(prompts)
        valid_map = clip_model.get_max_across_quick(sem_map)

        masks = {p: img_ann[p]["mask"] for p in prompts}
        bboxes = {p: img_ann[p]["bboxes"] for p in prompts}
        c_iou, c_lvl = segmentation_process_mask_score(
            valid_map, mask_thresh, masks, prompts)
        acc = processing.localization_process(np.asarray(valid_map), bboxes, prompts)
        chosen_iou_all.extend(c_iou)
        acc_num += acc
        total += len(prompts)
        if logger:
            logger.info(f"frame {j_str}: iou {c_iou} lvl {c_lvl}")

    return {
        "mean_iou": float(np.mean(chosen_iou_all)) if chosen_iou_all else 0.0,
        "localization_accuracy": acc_num / max(total, 1),
        "num_prompts": total,
    }
