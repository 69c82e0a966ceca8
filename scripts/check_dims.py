"""Shape sanity-check for preprocessed language features.

Parity target: reference `check_dims.py` — prints the camera image shape and
the SAM seg-map shape for one frame so resolution mismatches are obvious
before training. Extended with the feature-table shape and per-level
segment counts (the bookkeeping asserted at reference preprocess.py:153,163).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def check_shapes(dataset_path: str, image_name: str) -> None:
    img_path = None
    for ext in (".jpg", ".png", ".JPG", ".jpeg"):
        cand = os.path.join(dataset_path, "images", image_name + ext)
        if os.path.exists(cand):
            img_path = cand
            break

    feat_dir = os.path.join(dataset_path, "language_features")
    seg_map = np.load(os.path.join(feat_dir, image_name + "_s.npy"))
    feats = np.load(os.path.join(feat_dir, image_name + "_f.npy"))

    if img_path is not None:
        from PIL import Image

        with Image.open(img_path) as im:
            print(f"Image Shape: ({im.height}, {im.width}, 3)")
    else:
        print("Image: not found (checked images/<name>.{jpg,png})")
    print(f"Seg Map Shape: {seg_map.shape}")
    print(f"Feature Table Shape: {feats.shape}")
    for lvl in range(seg_map.shape[0]):
        ids = seg_map[lvl]
        n = int(ids.max()) + 1 if (ids >= 0).any() else 0
        cover = float((ids >= 0).mean())
        print(f"  level {lvl}: {n} segments, {cover:.1%} pixels assigned")
    if int(seg_map.max()) >= feats.shape[0]:
        print("ERROR: seg map references rows beyond the feature table!")
        sys.exit(1)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--image_name", default="frame_00001")
    args = parser.parse_args()
    check_shapes(args.dataset_path, args.image_name)
