#!/usr/bin/env python
"""Visualize preprocessed 2D language features (reference
inspect_features.py): per-level seg maps + CLIP similarity maps for a
prompt, as a sanity check on preprocessing before training."""
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = ArgumentParser()
    parser.add_argument("--lf_path", type=str, required=True)
    parser.add_argument("--image_name", type=str, required=True,
                        help="basename without _s/_f suffix")
    parser.add_argument("--prompt", type=str, default="object")
    parser.add_argument("--output", type=str, default="inspect_result.png")
    parser.add_argument("--clip_backend", type=str, default="auto")
    args = parser.parse_args()

    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork

    seg = np.load(os.path.join(args.lf_path, args.image_name + "_s.npy"))
    feats = np.load(os.path.join(args.lf_path, args.image_name + "_f.npy"))
    print(f"seg {seg.shape} ids [{seg.min()}, {seg.max()}], "
          f"features {feats.shape}")

    clip = OpenCLIPNetwork(backend=args.clip_backend)
    text = np.asarray(clip.encode_text([args.prompt]))
    text = text / np.linalg.norm(text, axis=-1, keepdims=True)

    plt.figure(figsize=(20, 10))
    for lvl in range(4):
        plt.subplot(2, 4, lvl + 1)
        plt.title(f"seg level {lvl}")
        plt.imshow(seg[lvl], cmap="tab20")
        plt.axis("off")

        sim = np.zeros(seg[lvl].shape, np.float32)
        valid = seg[lvl] >= 0
        sim[valid] = (feats[seg[lvl][valid]] @ text[0])
        plt.subplot(2, 4, 4 + lvl + 1)
        plt.title(f"sim '{args.prompt}' level {lvl}")
        plt.imshow(sim, cmap="jet")
        plt.colorbar()
        plt.axis("off")
    plt.savefig(args.output, bbox_inches="tight")
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
