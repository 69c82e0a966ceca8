#!/usr/bin/env python
"""Single-prompt heatmap demo frames (reference demo_prompt.py): render a
similarity heatmap video sequence over every Nth camera with the
"smart contrast" sim**4 boost + absolute threshold."""
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = ArgumentParser()
    parser.add_argument("--ckpt_paths", nargs="+", type=str, required=True)
    parser.add_argument("--iteration", type=int, default=10000)
    parser.add_argument("--source_path", type=str, required=True)
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--threshold", type=float, default=0.22)
    parser.add_argument("--every", type=int, default=20)
    parser.add_argument("--resolution", type=int, default=-1)
    parser.add_argument("--output_dir", type=str, default="demo_frames")
    parser.add_argument("--clip_backend", type=str, default="auto")
    parser.add_argument("--topk", type=int, default=4)
    args = parser.parse_args()

    import cv2
    import numpy as np
    import jax.numpy as jnp

    from langsplatv2_tpu.eval.lerf import (
        merge_level_models, render_language_feature_map_quick)
    from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork
    from langsplatv2_tpu.models.io import (load_checkpoint_auto,
                                           resolve_checkpoint)
    from langsplatv2_tpu.models.renderer import make_settings, render
    from langsplatv2_tpu.scene.scene import Scene

    models = [load_checkpoint_auto(
        resolve_checkpoint(p, args.iteration))[0]
        for p in args.ckpt_paths]
    merged = merge_level_models(models, topk=args.topk)

    scene = Scene(args.source_path, model_path="", resolution=args.resolution,
                  shuffle=False)
    cameras = scene.get_train_cameras()[::args.every]
    clip = OpenCLIPNetwork(backend=args.clip_backend)
    text = np.asarray(clip.encode_text([args.prompt]))
    text = text / np.linalg.norm(text, axis=-1, keepdims=True)
    os.makedirs(args.output_dir, exist_ok=True)
    bg = jnp.zeros(3, jnp.float32)

    for i, cam in enumerate(cameras):
        settings = make_settings(cam, merged.active_sh_degree)
        view = jnp.asarray(cam.world_view_transform)
        proj = jnp.asarray(cam.full_proj_transform)
        campos = jnp.asarray(cam.camera_center)
        rgb = np.clip(np.asarray(
            render(settings, merged, view, proj, campos, bg).render
        ).transpose(1, 2, 0), 0, 1)
        lf = np.asarray(render_language_feature_map_quick(
            merged, settings, view, proj, campos, bg))  # [L, 512, H, W]
        lf_sum = lf.sum(axis=0)
        lf_sum = lf_sum / (np.linalg.norm(lf_sum, axis=0, keepdims=True) + 1e-10)
        sim = np.einsum("dhw,d->hw", lf_sum, text[0])
        # Smart contrast: power boost + absolute threshold
        # (reference demo_prompt.py:110-158).
        sim = np.clip(sim, 0, 1) ** 4
        sim = np.where(sim > args.threshold ** 4, sim, 0.0)
        if sim.max() > 0:
            sim = sim / sim.max()
        heat = cv2.applyColorMap((sim * 255).astype(np.uint8), cv2.COLORMAP_JET)
        heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB) / 255.0
        blend = np.where(sim[..., None] > 0, rgb * 0.4 + heat * 0.6, rgb)
        out_path = os.path.join(args.output_dir, f"frame_{i:04d}.png")
        cv2.imwrite(out_path, cv2.cvtColor(
            (blend * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
        print(out_path)


if __name__ == "__main__":
    main()
