"""Relevancy-map post-processing and metrics.

Parity target: reference `eval_lerf.py:104-200` (and the identical machinery
in eval_3d_ovs.py / eval_mip_nerf360.py):

- 29x29 average-pool smoothing with count_include_pad=False semantics,
  blended 0.5*(avg + raw),
- min-max normalization into [-1, 1] then clip to [0, 1],
- threshold -> binary mask -> 7x7 avg-pool majority smoothing,
- per-level IoU against GT masks; level chosen by max smoothed relevancy,
- localization: smoothed argmax inside any GT bbox.

All implemented as windowed reductions that XLA fuses on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def avg_pool_same(x: jnp.ndarray, kernel: int, padding: int) -> jnp.ndarray:
    """[H, W] average pool, stride 1, count_include_pad=False (torch
    AvgPool2d parity: border windows divide by the number of in-bounds
    elements)."""
    sums = lax.reduce_window(
        x, 0.0, lax.add, (kernel, kernel), (1, 1),
        [(padding, padding), (padding, padding)])
    counts = lax.reduce_window(
        jnp.ones_like(x), 0.0, lax.add, (kernel, kernel), (1, 1),
        [(padding, padding), (padding, padding)])
    return sums / counts


def smooth_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """7x7 majority smoothing (reference smooth_cuda, eval_lerf.py:104-109)."""
    avg = avg_pool_same(mask.astype(jnp.float32), 7, 3)
    return (avg > 0.5).astype(jnp.uint8)


def heatmap_to_mask(valid: jnp.ndarray, thresh: float):
    """One level/prompt heatmap [H, W] -> (smoothed_heatmap, binary mask)
    (reference segmentation_process_cuda inner loop, eval_lerf.py:121-137)."""
    avg = avg_pool_same(valid, 29, 14)
    blended = 0.5 * (avg + valid)
    out = blended - blended.min()
    out = out / (blended.max() - blended.min() + 1e-9)
    out = out * 2.0 - 1.0
    out = jnp.clip(out, 0.0, 1.0)
    mask = (out > thresh).astype(jnp.uint8)
    return blended, smooth_mask(mask)


def iou(mask_a: jnp.ndarray, mask_b: jnp.ndarray) -> jnp.ndarray:
    inter = jnp.sum(jnp.logical_and(mask_a, mask_b))
    union = jnp.sum(jnp.logical_or(mask_a, mask_b))
    return inter / union


def segmentation_process(valid_map: jnp.ndarray, thresh: float,
                         gt_masks: dict[str, np.ndarray], prompts: list[str]):
    """valid_map [levels, prompts, H, W] relevancy -> per-prompt
    (chosen IoU, chosen level) with the level picked by max smoothed
    relevancy (eval_lerf.py:111-156).

    Returns (chosen_iou_list, chosen_lvl_list, iou_all dict)."""
    n_head, n_prompt = valid_map.shape[:2]
    chosen_iou_list, chosen_lvl_list, iou_all = [], [], {}
    for k in range(n_prompt):
        gt = jnp.asarray(gt_masks[prompts[k]].astype(np.uint8))
        ious, scores = [], []
        for i in range(n_head):
            blended, mask_pred = heatmap_to_mask(valid_map[i, k], thresh)
            ious.append(float(iou(gt, mask_pred)))
            scores.append(float(blended.max()))
        iou_all[prompts[k]] = ious
        chosen = int(np.argmax(scores))
        chosen_iou_list.append(ious[chosen])
        chosen_lvl_list.append(chosen)
    return chosen_iou_list, chosen_lvl_list, iou_all


def localization_process(valid_map: jnp.ndarray,
                         gt_bboxes: dict[str, np.ndarray],
                         prompts: list[str]) -> int:
    """Count prompts whose smoothed-relevancy argmax falls inside any GT bbox
    (eval_lerf.py:158-200). Returns the number of correctly localized
    prompts."""
    n_head, n_prompt, h, w = valid_map.shape
    acc_num = 0
    for k in range(n_prompt):
        scores, coords = [], []
        for i in range(n_head):
            avg = avg_pool_same(valid_map[i, k], 29, 14)
            score = float(avg.max())
            yx = np.argwhere(np.asarray(avg) == score)
            scores.append(score)
            coords.append(yx)
        head = int(np.argmax(scores))
        coord_final = coords[head]
        hit = False
        for box in np.asarray(gt_bboxes[prompts[k]]).reshape(-1, 4):
            x1, y1, x2, y2 = box
            x_min, x_max = min(x1, x2), max(x1, x2)
            y_min, y_max = min(y1, y2), max(y1, y2)
            for y, x in coord_final:
                if x_min <= x <= x_max and y_min <= y <= y_max:
                    acc_num += 1
                    hit = True
                    break
            if hit:
                break
    return acc_num


def polygon_to_mask(shape: tuple[int, int], points) -> np.ndarray:
    """Rasterize a polygon (labelme segmentation) to a binary mask
    (reference eval/utils.py:97-103)."""
    import cv2

    mask = np.zeros(shape, dtype=np.uint8)
    pts = np.asarray(points, np.int32).reshape(-1, 2)
    cv2.fillPoly(mask, [pts], 1)
    return mask.astype(bool)


def stack_mask(mask_base: np.ndarray, mask_add: np.ndarray) -> np.ndarray:
    """Union of GT masks for repeated labels (reference eval/utils.py:104)."""
    return np.logical_or(mask_base, mask_add)


def mode_smooth(mask: np.ndarray) -> np.ndarray:
    """5x5 mode filter (reference eval/utils.py:61-70 `smooth`)."""
    from scipy.ndimage import generic_filter  # scipy is available

    def mode_fn(vals):
        vals = vals.astype(np.int64)
        return np.bincount(vals).argmax()

    return generic_filter(mask.astype(np.int64), mode_fn, size=5).astype(mask.dtype)
