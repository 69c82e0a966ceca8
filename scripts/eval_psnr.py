#!/usr/bin/env python
"""RGB reconstruction PSNR over a scene's test split (reference
eval_araba.py:13-51: load a checkpoint, render every test camera, report
per-image and mean PSNR; falls back to the first 10 train cameras when the
scene has no test split, like the reference)."""
import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = ArgumentParser(description="RGB PSNR evaluation")
    parser.add_argument("-s", "--source_path", type=str, required=True)
    parser.add_argument("-m", "--model_path", type=str, required=True,
                        help="model dir containing chkpnt<iteration>.npz")
    parser.add_argument("--iteration", type=int, default=-1,
                        help="-1 = highest checkpoint iteration found")
    parser.add_argument("--resolution", type=int, default=-1)
    parser.add_argument("--white_background", action="store_true")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args()

    from langsplatv2_tpu.eval.psnr_eval import evaluate_psnr
    from langsplatv2_tpu.models.io import load_checkpoint_auto
    from langsplatv2_tpu.scene.scene import Scene

    if args.iteration == -1:
        import glob
        import re

        cands = glob.glob(os.path.join(args.model_path, "chkpnt*.npz"))
        if not cands:
            sys.exit(f"no checkpoints under {args.model_path}")
        args.iteration = max(
            int(re.search(r"chkpnt(\d+)\.npz$", c).group(1)) for c in cands)
    ckpt = os.path.join(args.model_path, f"chkpnt{args.iteration}.npz")
    print(f"Loading model from {ckpt}")
    model, _ = load_checkpoint_auto(ckpt)

    scene = Scene(args.source_path, model_path="", resolution=args.resolution,
                  eval_split=True, shuffle=False)
    cameras = scene.get_test_cameras()
    if not cameras:
        print("No test cameras found - using first 10 train cameras.")
        cameras = scene.get_train_cameras()[:10]
    print(f"Evaluating on {len(cameras)} images...")

    bg = (1.0, 1.0, 1.0) if args.white_background else (0.0, 0.0, 0.0)
    mean_psnr, per_cam = evaluate_psnr(model, cameras, bg=bg,
                                       limit=args.limit)
    if not args.quiet:
        for cam, p in zip(cameras, per_cam):
            print(f"Image {cam.image_name}: PSNR = {p:.4f}")
    print(f"Average PSNR: {mean_psnr:.4f}")
    print(json.dumps({"mean_psnr": mean_psnr, "num_images": len(per_cam)}))


if __name__ == "__main__":
    main()
