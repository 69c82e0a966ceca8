"""Camera-ordering determinism probe.

Parity target: reference `find_debug_frame.py` — seeds the RNG the same way
train.py does, builds the Scene, and prints the first training camera, so a
debug render can be pinned to the exact frame the training loop sees first.
"""
import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from langsplatv2_tpu.scene.scene import Scene  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--source_path", required=True)
    parser.add_argument("-m", "--model_path", default="/tmp/find_debug_frame")
    parser.add_argument("-r", "--resolution", type=int, default=-1)
    parser.add_argument("--seed", type=int, default=0,
                        help="must match the train.py --seed in use")
    args = parser.parse_args()

    # Match scripts/train.py's RNG state exactly (reference safe_state).
    random.seed(args.seed)
    np.random.seed(args.seed)

    scene = Scene(args.source_path, args.model_path,
                  resolution=args.resolution)
    cams = scene.get_train_cameras()
    print(f"First Training Camera Name: {cams[0].image_name}")
    print(f"Train/test split: {len(cams)}/{len(scene.get_test_cameras())}")
    for i, c in enumerate(cams[:5]):
        print(f"  [{i}] {c.image_name}  {c.image_width}x{c.image_height}")


if __name__ == "__main__":
    main()
