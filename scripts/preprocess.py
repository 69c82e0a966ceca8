#!/usr/bin/env python
"""Preprocessing CLI (reference preprocess.py __main__): SAM 4-level
segmentation + CLIP encoding -> language_features/<img>_{s,f}.npy.

  python scripts/preprocess.py --dataset_path <scene> \
      [--sam_ckpt ckpts/sam_vit_h_4b8939.pth] [--clip_backend auto]
"""
import os
import random
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def seed_everything(seed: int):
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def main():
    parser = ArgumentParser()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--resolution", type=int, default=1080)
    parser.add_argument("--sam_ckpt", type=str,
                        default="ckpts/sam_vit_h_4b8939.pth")
    parser.add_argument("--clip_backend", type=str, default="auto")
    # "sam_jax": the TPU-native Flax port (needs only the checkpoint file
    #            + torch for the one-time weight conversion);
    # "sam": the torch ViT-H generator (needs checkpoint + package);
    # "cluster": weights-free color/position k-means fallback;
    # "auto": sam_jax, then torch sam, then cluster.
    parser.add_argument("--mask_backend", type=str, default="auto",
                        choices=["auto", "sam_jax", "sam", "cluster"])
    args = parser.parse_args()
    seed_everything(42)

    from langsplatv2_tpu.preprocess.pipeline import (
        ClusterMaskGenerator, PreprocessPipeline, SamMaskGenerator,
        load_images)

    images, names = load_images(args.dataset_path, args.resolution)
    print(f"loaded {len(images)} images")
    def jax_sam():
        from langsplatv2_tpu.preprocess.sam_jax import JaxSamMaskGenerator
        return JaxSamMaskGenerator(checkpoint=args.sam_ckpt)

    if args.mask_backend == "sam_jax":
        mask_generator = jax_sam()
    elif args.mask_backend == "sam":
        mask_generator = SamMaskGenerator(args.sam_ckpt)
    elif args.mask_backend == "cluster":
        mask_generator = ClusterMaskGenerator()
    else:
        try:
            mask_generator = jax_sam()
        except Exception as e1:
            try:
                mask_generator = SamMaskGenerator(args.sam_ckpt)
            except Exception as e2:
                print(f"SAM unavailable (jax: {e1}; torch: {e2}); using "
                      "the cluster fallback segmenter")
                mask_generator = ClusterMaskGenerator()
    pipeline = PreprocessPipeline(mask_generator, args.clip_backend)
    save_folder = os.path.join(args.dataset_path, "language_features")
    pipeline.run(images, names, save_folder)
    print(f"saved language features to {save_folder}")


if __name__ == "__main__":
    main()
