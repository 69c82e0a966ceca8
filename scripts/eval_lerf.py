#!/usr/bin/env python
"""LERF benchmark CLI (reference eval_lerf.py __main__).

Usage mirrors the reference quick path:
  python scripts/eval_lerf.py --dataset_name teatime \
      --path_root <datasets_root> --output_root <out> \
      --ckpt_root <models_root> --iteration 10000 --mask_thresh 0.4
The three per-level models are expected at
  <ckpt_root>/<scene>_<idx>_<level>/chkpnt<iteration>.npz for level 1..3.
"""
import json
import logging
import os
import sys
from argparse import ArgumentParser
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_logger(name, log_file, log_level=logging.INFO):
    logger = logging.getLogger(name)
    handler = logging.StreamHandler()
    logger.addHandler(handler)
    if log_file is not None:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file, "w")
        logger.addHandler(fh)
    logger.setLevel(log_level)
    return logger


def main():
    parser = ArgumentParser()
    parser.add_argument("--dataset_name", type=str, required=True)
    parser.add_argument("--path_root", type=str, required=True,
                        help="root containing <scene>/ with colmap data + label/")
    parser.add_argument("--ckpt_root", type=str, required=True)
    parser.add_argument("--output_root", type=str, default="eval_out")
    parser.add_argument("--iteration", type=int, default=10000)
    parser.add_argument("--index", type=int, default=1,
                        help="run index in the model dir naming <scene>_<idx>_<level>")
    parser.add_argument("--mask_thresh", type=float, default=0.4)
    parser.add_argument("--levels", nargs="+", type=int, default=[1, 2, 3])
    parser.add_argument("--topk", type=int, default=4)
    parser.add_argument("--clip_backend", type=str, default="auto")
    parser.add_argument("--resolution", type=int, default=-1)
    # Reference `evaluate` (eval_lerf.py:223-291): the three level models
    # evaluated separately with the full per-level decode instead of the
    # merged quick render — the merge cross-check.
    parser.add_argument("--no-quick", dest="quick", action="store_false",
                        default=True)
    args = parser.parse_args()

    from langsplatv2_tpu.eval import lerf
    from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork
    from langsplatv2_tpu.models.io import (load_checkpoint_auto,
                                           resolve_checkpoint)
    from langsplatv2_tpu.scene.scene import Scene

    scene_dir = os.path.join(args.path_root, args.dataset_name)
    out_dir = os.path.join(args.output_root, args.dataset_name)
    os.makedirs(out_dir, exist_ok=True)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    logger = get_logger(args.dataset_name, os.path.join(out_dir, f"{ts}.log"))

    gt_ann, (gt_h, gt_w), img_paths = lerf.eval_gt_lerfdata(
        os.path.join(scene_dir, "label"), out_dir)

    models = []
    for level in args.levels:
        ckpt = resolve_checkpoint(
            os.path.join(args.ckpt_root,
                         f"{args.dataset_name}_{args.index}_{level}"),
            args.iteration)
        model, _ = load_checkpoint_auto(ckpt)
        models.append(model)
    merged = lerf.merge_level_models(models, topk=args.topk)

    scene = Scene(scene_dir, model_path="", resolution=args.resolution,
                  eval_split=False, shuffle=False)
    cameras = scene.get_train_cameras()

    clip_model = OpenCLIPNetwork(backend=args.clip_backend)
    if args.quick:
        results = lerf.evaluate_quick(
            merged, cameras, gt_ann, (gt_h, gt_w), clip_model,
            mask_thresh=args.mask_thresh, logger=logger)
    else:
        results = lerf.evaluate(
            models, cameras, gt_ann, (gt_h, gt_w), clip_model,
            mask_thresh=args.mask_thresh, logger=logger)
    logger.info(json.dumps(results))
    print(json.dumps({"mean_iou": results["mean_iou"],
                      "localization_accuracy": results["localization_accuracy"]}))


if __name__ == "__main__":
    main()
