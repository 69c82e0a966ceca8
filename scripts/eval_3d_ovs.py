#!/usr/bin/env python
"""3D-OVS benchmark CLI (reference eval_3d_ovs.py __main__; mask_thresh 0.25
per eval_3d_ovs.sh)."""
import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = ArgumentParser()
    parser.add_argument("--dataset_name", type=str, required=True)
    parser.add_argument("--path_root", type=str, required=True)
    parser.add_argument("--ckpt_root", type=str, required=True)
    parser.add_argument("--output_root", type=str, default="eval_out")
    parser.add_argument("--iteration", type=int, default=10000)
    parser.add_argument("--index", type=int, default=1)
    parser.add_argument("--mask_thresh", type=float, default=0.25)
    parser.add_argument("--levels", nargs="+", type=int, default=[1, 2, 3])
    parser.add_argument("--topk", type=int, default=4)
    parser.add_argument("--clip_backend", type=str, default="auto")
    parser.add_argument("--resolution", type=int, default=-1)
    parser.add_argument("--no-quick", dest="quick", action="store_false",
                        default=True)
    args = parser.parse_args()

    from langsplatv2_tpu.eval import lerf, ovs
    from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork
    from langsplatv2_tpu.models.io import (load_checkpoint_auto,
                                           resolve_checkpoint)
    from langsplatv2_tpu.scene.scene import Scene

    scene_dir = os.path.join(args.path_root, args.dataset_name)
    out_dir = os.path.join(args.output_root, args.dataset_name)
    gt_ann, frame_ids = ovs.eval_gt_ovsdata(
        os.path.join(scene_dir, "segmentations"), out_dir)

    models = []
    for level in args.levels:
        ckpt = resolve_checkpoint(
            os.path.join(args.ckpt_root,
                         f"{args.dataset_name}_{args.index}_{level}"),
            args.iteration)
        models.append(load_checkpoint_auto(ckpt)[0])
    merged = lerf.merge_level_models(models, topk=args.topk)

    scene = Scene(scene_dir, model_path="", resolution=args.resolution,
                  eval_split=False, shuffle=False)
    cameras = {c.image_name: c for c in scene.get_train_cameras()}
    cams_by_frame = {fid: cameras[fid] for fid in frame_ids if fid in cameras}

    clip_model = OpenCLIPNetwork(backend=args.clip_backend)
    if args.quick:
        results = ovs.evaluate_quick(
            merged, cams_by_frame, gt_ann, clip_model,
            mask_thresh=args.mask_thresh, scene_name=args.dataset_name)
    else:
        results = ovs.evaluate(
            models, cams_by_frame, gt_ann, clip_model,
            mask_thresh=args.mask_thresh, scene_name=args.dataset_name)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
