#!/usr/bin/env python
"""Debug render tool (reference debug_renderer.py): load a checkpoint, print
logit statistics, render RGB + per-prompt similarity panels to PNG."""
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--source_path", type=str, required=True)
    parser.add_argument("--resolution", type=int, default=-1)
    parser.add_argument("--camera_index", type=int, default=0)
    parser.add_argument("--prompts", nargs="+", type=str,
                        default=["car", "tree", "road"])
    parser.add_argument("--topk", type=int, default=4)
    parser.add_argument("--output", type=str, default="debug_render_result.png")
    parser.add_argument("--clip_backend", type=str, default="auto")
    args = parser.parse_args()

    import numpy as np
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from langsplatv2_tpu.models.io import load_checkpoint_auto
    from langsplatv2_tpu.models.renderer import make_settings, render
    from langsplatv2_tpu.scene.scene import Scene
    from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork

    model, it = load_checkpoint_auto(args.checkpoint)
    print(f"checkpoint iteration {it}, {int(model.num_live)} live gaussians")
    if model.language_logits is not None:
        logits = np.asarray(model.language_logits)
        print(f"logits: mean {logits.mean():.4f} std {logits.std():.4f} "
              f"min {logits.min():.4f} max {logits.max():.4f}")

    scene = Scene(args.source_path, model_path="", resolution=args.resolution,
                  shuffle=False)
    cam = scene.get_train_cameras()[args.camera_index]
    settings = make_settings(cam, model.active_sh_degree)
    bg = jnp.zeros(3, jnp.float32)
    view = jnp.asarray(cam.world_view_transform)
    proj = jnp.asarray(cam.full_proj_transform)
    campos = jnp.asarray(cam.camera_center)

    out = render(settings, model, view, proj, campos, bg)
    rgb = np.clip(np.asarray(out.render).transpose(1, 2, 0), 0, 1)

    panels = 1 + (len(args.prompts) if model.language_logits is not None else 0)
    plt.figure(figsize=(5 * panels, 5))
    plt.subplot(1, panels, 1)
    plt.title(f"RGB (iter {it})")
    plt.imshow(rgb)
    plt.axis("off")

    if model.language_logits is not None:
        clip = OpenCLIPNetwork(backend=args.clip_backend)
        text = np.asarray(clip.encode_text(args.prompts))
        text = text / np.linalg.norm(text, axis=-1, keepdims=True)
        outf = render(settings, model, view, proj, campos, bg,
                      include_feature=True, topk=args.topk)
        feat = model.compute_final_feature_map(outf.language_feature_weight_map)
        feat = np.asarray(feat)
        feat = feat / (np.linalg.norm(feat, axis=0, keepdims=True) + 1e-10)
        sims = np.einsum("dhw,pd->hwp", feat, text)
        for i, prompt in enumerate(args.prompts):
            plt.subplot(1, panels, i + 2)
            plt.title(f"Sim: {prompt}")
            plt.imshow(sims[..., i], cmap="jet")
            plt.colorbar()
            plt.axis("off")

    plt.savefig(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
