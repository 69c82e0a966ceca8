"""SAM mask post-processing: NMS, crops, segmentation maps.

Parity target: reference `preprocess.py:191-330` — the same mask NMS rules
(IoU suppression + the asymmetric "inner overlap" suppression with the
same 0.5/0.85 area-ratio gates and top-3 fallbacks), the same crop->pad->
224x224 tile preparation and per-level seg-map assembly.

TPU-first difference: the reference computes the IoU / inner-overlap
matrices with an O(M^2) Python double loop over mask pairs; here both come
from ONE boolean-matmul (masks_flat @ masks_flat.T on the MXU) + elementwise
math.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def mask_iou_matrices(masks: np.ndarray):
    """masks [M, H, W] bool -> (iou [M, M], inter [M, M], areas [M])
    computed via a single matmul."""
    M = masks.shape[0]
    flat = jnp.asarray(masks.reshape(M, -1), jnp.float32)
    inter = flat @ flat.T                       # [M, M] intersection counts
    areas = jnp.diagonal(inter)
    union = areas[:, None] + areas[None, :] - inter
    iou = inter / jnp.maximum(union, 1.0)
    return np.asarray(iou), np.asarray(inter), np.asarray(areas)


def mask_nms(masks: np.ndarray, scores: np.ndarray, iou_thr: float = 0.7,
             score_thr: float = 0.1, inner_thr: float = 0.2) -> np.ndarray:
    """Mask NMS with inner-overlap suppression (reference preprocess.py:215-279).

    masks: [M, H, W] bool; scores: [M]. Returns selected original indices.
    """
    order = np.argsort(-scores, kind="stable")
    scores_ord = scores[order]
    masks_ord = masks[order]

    iou, inter, areas = mask_iou_matrices(masks_ord)
    M = len(scores)

    ratio_i = inter / np.maximum(areas[:, None], 1.0)   # inter/area_i
    ratio_j = inter / np.maximum(areas[None, :], 1.0)   # inter/area_j
    inner = 1.0 - ratio_j * ratio_i
    # Pair (i, j), i<j in score order: j mostly inside i (asymmetric gates).
    upper_cond = (ratio_i < 0.5) & (ratio_j >= 0.85)
    lower_cond = (ratio_i >= 0.85) & (ratio_j < 0.5)

    inner_u = np.where(upper_cond, inner, 0.0)
    inner_l = np.where(lower_cond, inner, 0.0).T

    iu = np.triu(iou, k=1)
    iou_max = iu.max(axis=0) if M else np.zeros(0)
    inner_u = np.triu(inner_u, k=1)
    inner_max_u = inner_u.max(axis=0) if M else np.zeros(0)
    inner_l = np.tril(inner_l, k=1)
    inner_max_l = inner_l.max(axis=0) if M else np.zeros(0)

    keep = iou_max <= iou_thr
    keep_conf = scores_ord > score_thr
    keep_inner_u = inner_max_u <= 1 - inner_thr
    keep_inner_l = inner_max_l <= 1 - inner_thr

    top3 = np.argsort(-scores_ord, kind="stable")[:3]
    if keep_conf.sum() == 0:
        keep_conf[top3] = True
    if keep_inner_u.sum() == 0:
        keep_inner_u[top3] = True
    if keep_inner_l.sum() == 0:
        keep_inner_l[top3] = True

    keep = keep & keep_conf & keep_inner_u & keep_inner_l
    return order[keep]


def masks_update(*mask_levels, iou_thr=0.8, score_thr=0.7, inner_thr=0.5):
    """Filter each level's SAM mask list (reference preprocess.py:281-294).
    Each mask is a dict with 'segmentation', 'predicted_iou',
    'stability_score'."""
    out = []
    for masks_lvl in mask_levels:
        if not masks_lvl:
            out.append(masks_lvl)
            continue
        seg = np.stack([m["segmentation"] for m in masks_lvl])
        iou_pred = np.asarray([m["predicted_iou"] for m in masks_lvl])
        stability = np.asarray([m["stability_score"] for m in masks_lvl])
        scores = stability * iou_pred
        keep = set(mask_nms(seg, scores, iou_thr, score_thr, inner_thr).tolist())
        out.append([m for i, m in enumerate(masks_lvl) if i in keep])
    return tuple(out)


def get_seg_img(mask: dict, image: np.ndarray) -> np.ndarray:
    """Black out the background, crop the bbox (reference preprocess.py:191)."""
    image = image.copy()
    image[mask["segmentation"] == 0] = np.array([0, 0, 0], np.uint8)
    x, y, w, h = np.int32(mask["bbox"])
    return image[y:y + h, x:x + w, ...]


def pad_img(img: np.ndarray) -> np.ndarray:
    """Center-pad to square (reference preprocess.py:198-206)."""
    h, w, _ = img.shape
    side = max(w, h)
    pad = np.zeros((side, side, 3), np.uint8)
    if h > w:
        pad[:, (h - w) // 2:(h - w) // 2 + w, :] = img
    else:
        pad[(w - h) // 2:(w - h) // 2 + h, :, :] = img
    return pad


def mask_to_segmap(masks: list[dict], image: np.ndarray):
    """Masks -> (tiles [M, 3, 224, 224] float, seg_map [H, W] int32 with -1
    for unassigned; later masks overwrite earlier ones — reference
    mask2segmap, preprocess.py:304-317)."""
    import cv2

    tiles = []
    seg_map = -np.ones(image.shape[:2], np.int32)
    for i, mask in enumerate(masks):
        seg_img = get_seg_img(mask, image)
        tiles.append(cv2.resize(pad_img(seg_img), (224, 224)))
        seg_map[mask["segmentation"]] = i
    tiles_arr = np.stack(tiles).astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    return tiles_arr, seg_map
