"""3D-OVS benchmark driver.

Parity target: reference `eval_3d_ovs.py` — per-frame mask-folder GT
(255->1 pngs, 'wood wall' ordered last), mIoU over prompts with
mask_thresh 0.25, and the 'room' special case that (a) skips the last two
prompts and (b) picks the level by mean relevancy inside the predicted mask
(excluding level 0).
"""
from __future__ import annotations

import os
from collections import defaultdict
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from . import processing
from .lerf import render_language_feature_map_quick, _vis_mask_save  # noqa: F401
from .openclip import OpenCLIPNetwork
from ..models.renderer import make_settings


def eval_gt_ovsdata(mask_dir: str, output_path: str | None = None):
    """Reference eval_3d_ovs.py:58-100. Returns (gt_ann, frame_ids)."""
    import cv2

    gt_ann = {}
    frame_ids = []
    for frame_id in sorted(os.listdir(mask_dir)):
        if "txt" in frame_id:
            continue
        frame_dir = os.path.join(mask_dir, frame_id)
        if not os.path.isdir(frame_dir):
            continue
        names = [n for n in os.listdir(frame_dir) if n != "wood wall.png"]
        if "wood wall.png" in os.listdir(frame_dir):
            names.append("wood wall.png")  # always ordered last
        img_ann = defaultdict(dict)
        for name in names:
            prompt = os.path.splitext(name)[0]
            mask = cv2.imread(os.path.join(frame_dir, name))
            mask[mask == 255] = 1
            img_ann[prompt]["mask"] = mask[:, :, 0]
            if output_path is not None:
                save = Path(output_path) / "gt" / frame_id / f"{prompt}.jpg"
                save.parent.mkdir(exist_ok=True, parents=True)
                _vis_mask_save(mask[:, :, 0], str(save))
        gt_ann[frame_id] = img_ann
        frame_ids.append(frame_id)
    return gt_ann, frame_ids


def segmentation_process_room(valid_map, thresh, gt_masks, prompts):
    """Room variant (eval_3d_ovs.py:109-213): skip the last 2 prompts; level
    chosen by mean relevancy inside the predicted mask, levels 1+ only."""
    import cv2

    n_head, n_prompt, h, w = valid_map.shape
    chosen_iou_list, chosen_lvl_list = [], []
    for k in range(n_prompt - 2):
        ious, scores = [], []
        for i in range(n_head):
            blended, mask_pred = processing.heatmap_to_mask(valid_map[i, k], thresh)
            gt = gt_masks[prompts[k]]
            if gt.shape != (h, w):
                gt = cv2.resize(gt, (w, h), interpolation=cv2.INTER_NEAREST)
            ious.append(float(processing.iou(jnp.asarray(gt.astype(np.uint8)),
                                            mask_pred)))
            mask_f = np.asarray(mask_pred, np.float32)
            denom = mask_f.sum()
            score = float((np.asarray(blended) * mask_f).sum() / denom) \
                if denom > 0 else 0.0
            scores.append(score)
        scores[0] = 0.0  # level 0 excluded from selection (loop starts at 1)
        chosen = int(np.argmax(scores))
        chosen_iou_list.append(ious[chosen])
        chosen_lvl_list.append(chosen)
    return chosen_iou_list, chosen_lvl_list


def evaluate(models, cameras_by_frame: dict, gt_ann: dict,
             clip_model: OpenCLIPNetwork | None = None,
             mask_thresh: float = 0.25, scene_name: str = "",
             logger=None):
    """Non-quick 3D-OVS evaluation (reference `evaluate`,
    eval_3d_ovs.py:289-341): separate per-level models, full per-level
    decode (lerf.render_language_feature_map_full). Same metrics as
    evaluate_quick — the merge cross-check."""
    from .lerf import render_language_feature_map_full

    clip_model = clip_model or OpenCLIPNetwork()
    bg = jnp.zeros(3, jnp.float32)
    chosen_iou_all = []

    for frame_id, img_ann in gt_ann.items():
        cam = cameras_by_frame[frame_id]
        prompts = list(img_ann.keys())
        clip_model.set_positives(prompts)
        feats = render_language_feature_map_full(models, cam, bg)
        sem_map = jnp.transpose(feats, (0, 2, 3, 1))
        valid_map = clip_model.get_max_across_quick(sem_map)
        masks = {p: img_ann[p]["mask"] for p in prompts}
        if scene_name == "room":
            c_iou, c_lvl = segmentation_process_room(
                np.asarray(valid_map), mask_thresh, masks, prompts)
        else:
            c_iou, c_lvl, _ = processing.segmentation_process(
                valid_map, mask_thresh, masks, prompts)
        chosen_iou_all.extend(c_iou)
        if logger:
            logger.info(f"frame {frame_id}: iou {c_iou} lvl {c_lvl}")

    return {
        "mean_iou": float(np.mean(chosen_iou_all)) if chosen_iou_all else 0.0,
        "num_prompts": len(chosen_iou_all),
    }


def evaluate_quick(merged_model, cameras_by_frame: dict, gt_ann: dict,
                   clip_model: OpenCLIPNetwork | None = None,
                   mask_thresh: float = 0.25, scene_name: str = "",
                   logger=None, gram_relevancy: bool = True):
    """3D-OVS quick evaluation (reference evaluate_quick,
    eval_3d_ovs.py:289-435). `cameras_by_frame[frame_id]` -> Camera."""
    from ..models.renderer import render

    clip_model = clip_model or OpenCLIPNetwork()
    bg = jnp.zeros(3, jnp.float32)
    chosen_iou_all = []

    for frame_id, img_ann in gt_ann.items():
        cam = cameras_by_frame[frame_id]
        settings = make_settings(cam, merged_model.active_sh_degree)
        prompts = list(img_ann.keys())
        clip_model.set_positives(prompts)
        if gram_relevancy:
            # Codebook-folded query straight from the weight map (identical
            # result, no [L, 512, H, W] materialization; see eval/lerf.py).
            out = render(settings, merged_model,
                         jnp.asarray(cam.world_view_transform),
                         jnp.asarray(cam.full_proj_transform),
                         jnp.asarray(cam.camera_center), bg,
                         quick_render=True)
            valid_map = clip_model.get_max_across_from_weights(
                out.language_feature_weight_map, merged_model.codebooks)
        else:
            feats = render_language_feature_map_quick(
                merged_model, settings,
                jnp.asarray(cam.world_view_transform),
                jnp.asarray(cam.full_proj_transform),
                jnp.asarray(cam.camera_center), bg)
            sem_map = jnp.transpose(feats, (0, 2, 3, 1))
            valid_map = clip_model.get_max_across_quick(sem_map)
        masks = {p: img_ann[p]["mask"] for p in prompts}
        if scene_name == "room":
            c_iou, c_lvl = segmentation_process_room(
                np.asarray(valid_map), mask_thresh, masks, prompts)
        else:
            c_iou, c_lvl, _ = processing.segmentation_process(
                valid_map, mask_thresh, masks, prompts)
        chosen_iou_all.extend(c_iou)
        if logger:
            logger.info(f"frame {frame_id}: iou {c_iou} lvl {c_lvl}")

    return {
        "mean_iou": float(np.mean(chosen_iou_all)) if chosen_iou_all else 0.0,
        "num_prompts": len(chosen_iou_all),
    }
