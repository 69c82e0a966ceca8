"""LERF open-vocabulary benchmark driver.

Parity target: reference `eval_lerf.py` — labelme GT parsing, the merged
3-level quick-render path (one 192-channel pass + per-level codebook decode
+ L2 normalization), mean chosen-IoU and localization accuracy.
"""
from __future__ import annotations

import glob
import json
import os
from collections import defaultdict
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianModel
from ..models.renderer import make_settings, render
from . import processing
from .openclip import OpenCLIPNetwork


def eval_gt_lerfdata(json_folder: str, output_path: str | None = None):
    """Parse labelme GT (reference eval_lerf.py:61-102). Returns
    (gt_ann, (h, w), img_paths)."""
    gt_json_paths = sorted(glob.glob(os.path.join(json_folder, "frame_*.json")))
    img_paths = sorted(glob.glob(os.path.join(json_folder, "frame_*.jpg")))
    gt_ann = {}
    h = w = 0
    for js_path in gt_json_paths:
        img_ann = defaultdict(dict)
        with open(js_path) as f:
            gt_data = json.load(f)
        h, w = gt_data["info"]["height"], gt_data["info"]["width"]
        idx = int(gt_data["info"]["name"].split("_")[-1].split(".jpg")[0]) - 1
        for prompt_data in gt_data["objects"]:
            label = prompt_data["category"]
            box = np.asarray(prompt_data["bbox"]).reshape(-1)
            mask = processing.polygon_to_mask((h, w), prompt_data["segmentation"])
            if img_ann[label].get("mask", None) is not None:
                mask = processing.stack_mask(img_ann[label]["mask"], mask)
                img_ann[label]["bboxes"] = np.concatenate(
                    [img_ann[label]["bboxes"].reshape(-1, 4), box.reshape(-1, 4)],
                    axis=0)
            else:
                img_ann[label]["bboxes"] = box
            img_ann[label]["mask"] = mask
            if output_path is not None:
                save_path = Path(output_path) / "gt" / \
                    gt_data["info"]["name"].split(".jpg")[0] / f"{label}.jpg"
                save_path.parent.mkdir(exist_ok=True, parents=True)
                _vis_mask_save(mask, str(save_path))
        gt_ann[f"{idx}"] = img_ann
    return gt_ann, (h, w), img_paths


def _vis_mask_save(mask: np.ndarray, path: str):
    import cv2

    cv2.imwrite(path, (mask.astype(np.uint8) * 255))


def merge_level_models(models: list[GaussianModel], topk: int = 4) -> GaussianModel:
    """Merge independently trained per-level models into one quick-render
    model: weights/indices [N, levels*topk] with indices offset by
    level*codebook_size; codebooks stacked [levels, K, 512]
    (reference eval_lerf.py:320-348 — topk threaded through like
    eval_lerf.py:334's --topk, backend_renderer.py:104-128)."""
    base = models[0]
    ws, idxs, books = [], [], []
    for lvl, m in enumerate(models):
        K = m.codebooks.shape[1]
        w, idx = m.get_weights_and_indices(k=topk)
        ws.append(w)
        idxs.append(idx + 0)  # get_weights_and_indices already offsets per
        # layer within a model; offset across LEVELS here:
        idxs[-1] = idxs[-1] + lvl * K * m.codebooks.shape[0]
        books.append(m.codebooks)
    return base.replace(
        quick_weights=jnp.concatenate(ws, axis=1),
        quick_indices=jnp.concatenate(idxs, axis=1),
        codebooks=jnp.concatenate(books, axis=0),
    )


def render_language_feature_map_quick(model: GaussianModel, settings, view,
                                      proj, campos, bg) -> jnp.ndarray:
    """One-pass 192-channel quick render + per-level decode + L2 normalize
    (reference eval_lerf.py:210-220). Returns [levels, 512, H, W]."""
    out = render(settings, model, view, proj, campos, bg, quick_render=True)
    wmap = out.language_feature_weight_map
    L, K, D = model.codebooks.shape
    _, H, W = wmap.shape
    flat = wmap.reshape(L, K, H * W)
    feats = jnp.einsum("lkd,lkn->ldn", model.codebooks, flat,
                       preferred_element_type=jnp.float32)
    feats = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-10)
    return feats.reshape(L, D, H, W)


def render_language_feature_map_full(models: list[GaussianModel], cam, bg
                                     ) -> jnp.ndarray:
    """Non-quick formulation (reference `evaluate`, eval_lerf.py:223-291):
    each independently trained per-level model renders ITS OWN dense
    weight map, decoded to CLIP space and L2-normalized. Returns
    [levels, 512, H, W] — the cross-check that validates quick-mode
    merging (merge_level_models + one 192-channel pass) on real
    checkpoints."""
    from ..models.renderer import render

    view = jnp.asarray(cam.world_view_transform)
    proj = jnp.asarray(cam.full_proj_transform)
    campos = jnp.asarray(cam.camera_center)
    feats = []
    for m in models:
        settings = make_settings(cam, m.active_sh_degree)
        out = render(settings, m, view, proj, campos, bg,
                     include_feature=True, topk=4)
        wmap = out.language_feature_weight_map        # [L*K, H, W]
        feat = m.compute_layer_feature_map(wmap, m.codebooks.shape[0] - 1)
        feat = feat / (jnp.linalg.norm(feat, axis=0, keepdims=True) + 1e-10)
        feats.append(feat)
    return jnp.stack(feats, axis=0)


def evaluate(
    models: list[GaussianModel],
    cameras: list,
    gt_ann: dict,
    image_shape: tuple[int, int],
    clip_model: OpenCLIPNetwork | None = None,
    mask_thresh: float = 0.4,
    logger=None,
):
    """Non-quick benchmark (reference `evaluate`, eval_lerf.py:223-291):
    the three separate level models are evaluated with the full per-level
    decode instead of the merged single-pass quick render. Same metrics as
    evaluate_quick; agreement between the two validates the merge."""
    clip_model = clip_model or OpenCLIPNetwork()
    chosen_iou_all, chosen_lvl_list = [], []
    acc_num = 0
    total_prompts = 0
    bg = jnp.zeros(3, jnp.float32)

    for j_str, img_ann in gt_ann.items():
        cam = cameras[int(j_str)]
        prompts = list(img_ann.keys())
        clip_model.set_positives(prompts)
        feats = render_language_feature_map_full(models, cam, bg)
        sem_map = jnp.transpose(feats, (0, 2, 3, 1))   # [L, H, W, 512]
        valid_map = clip_model.get_max_across_quick(sem_map)

        masks = {p: img_ann[p]["mask"] for p in prompts}
        bboxes = {p: img_ann[p]["bboxes"] for p in prompts}
        c_iou, c_lvl, _ = processing.segmentation_process(
            valid_map, mask_thresh, masks, prompts)
        acc = processing.localization_process(
            np.asarray(valid_map), bboxes, prompts)
        chosen_iou_all.extend(c_iou)
        chosen_lvl_list.extend(c_lvl)
        acc_num += acc
        total_prompts += len(prompts)
        if logger:
            logger.info(
                f"frame {j_str}: iou {c_iou} lvl {c_lvl} acc {acc}/{len(prompts)}")

    mean_iou = float(np.mean(chosen_iou_all)) if chosen_iou_all else 0.0
    return {
        "mean_iou": mean_iou,
        "localization_accuracy": acc_num / max(total_prompts, 1),
        "chosen_levels": chosen_lvl_list,
        "num_prompts": total_prompts,
    }


def evaluate_quick(
    merged_model: GaussianModel,
    cameras: list,
    gt_ann: dict,
    image_shape: tuple[int, int],
    clip_model: OpenCLIPNetwork | None = None,
    mask_thresh: float = 0.4,
    logger=None,
    gram_relevancy: bool = True,
):
    """Quick-path benchmark over the annotated eval frames
    (reference evaluate_quick, eval_lerf.py:293-371).

    `cameras[j]` must correspond to annotation key str(j). Returns dict with
    mean chosen IoU and localization accuracy."""
    clip_model = clip_model or OpenCLIPNetwork()
    chosen_iou_all, chosen_lvl_list = [], []
    acc_num = 0
    total_prompts = 0
    bg = jnp.zeros(3, jnp.float32)

    for j_str, img_ann in gt_ann.items():
        j = int(j_str)
        cam = cameras[j]
        settings = make_settings(cam, merged_model.active_sh_degree)
        prompts = list(img_ann.keys())
        clip_model.set_positives(prompts)
        if gram_relevancy:
            # Production query path: relevancy straight from the 192-ch
            # weight map via codebook-folded phrases + Gram normalization —
            # numerically identical to decoding [L, 512, H, W] first, but
            # the CLIP-space map is never materialized.
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
            sem_map = jnp.transpose(feats, (0, 2, 3, 1))  # [L, H, W, 512]
            valid_map = clip_model.get_max_across_quick(sem_map)

        masks = {p: img_ann[p]["mask"] for p in prompts}
        bboxes = {p: img_ann[p]["bboxes"] for p in prompts}
        c_iou, c_lvl, _ = processing.segmentation_process(
            valid_map, mask_thresh, masks, prompts)
        acc = processing.localization_process(
            np.asarray(valid_map), bboxes, prompts)
        chosen_iou_all.extend(c_iou)
        chosen_lvl_list.extend(c_lvl)
        acc_num += acc
        total_prompts += len(prompts)
        if logger:
            logger.info(f"frame {j}: iou {c_iou} lvl {c_lvl} acc {acc}/{len(prompts)}")

    mean_iou = float(np.mean(chosen_iou_all)) if chosen_iou_all else 0.0
    loc_acc = acc_num / max(total_prompts, 1)
    return {
        "mean_iou": mean_iou,
        "localization_accuracy": loc_acc,
        "chosen_levels": chosen_lvl_list,
        "num_prompts": total_prompts,
    }
