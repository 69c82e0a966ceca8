#!/usr/bin/env python
"""Training CLI.

Parity target: reference `train.py` __main__ — same flags (ModelParams /
OptimizationParams / PipelineParams groups plus --start_checkpoint,
--cos_loss/--l1_loss/--normalize, --topk, test/save/checkpoint iteration
lists), same two phases:

  RGB:      python scripts/train.py -s <scene> -m <out>
  feature:  python scripts/train.py -s <scene> -m <out> --include_feature \
                --start_checkpoint <out>/chkpnt30000.npz --feature_level L \
                --cos_loss --topk 4

Model dir artifacts mirror the reference: cfg_args[.json], cameras.json,
input.ply, point_cloud/iteration_N/point_cloud.ply, chkpntN.npz.
"""
import os
import sys
from argparse import ArgumentParser, Namespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = ArgumentParser(description="Training script parameters")
    from langsplatv2_tpu.train.config import (
        ModelParams, OptimizationParams, PipelineParams, save_cfg_args)

    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[2000, 4000, 6000, 8000, 10_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[2000, 4000, 6000, 8000, 10_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[2000, 4000, 6000, 8000, 10_000, 30_000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    # SIBR remote-viewer bridge (reference train.py:344-345 + network_gui);
    # opt-in here so headless runs never bind a port.
    parser.add_argument("--gui", action="store_true", default=False)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--cos_loss", action="store_true", default=False)
    parser.add_argument("--l1_loss", action="store_true", default=False)
    parser.add_argument("--normalize", action="store_true", default=False)
    parser.add_argument("--accum_iter", type=int, default=1)
    parser.add_argument(
        "--cam_batch", type=int, default=1,
        help="Feature phase, gram config only: render N cameras per jitted"
             " step (summed grads, one update — accumulation semantics)"
             " with the top-k weights pass and Adam amortized over the"
             " group")
    parser.add_argument("--topk", type=int, default=1)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tile_cap", type=int, default=1024)
    parser.add_argument("--max_entries", type=int, default=2 ** 21)
    parser.add_argument(
        "--tile_budget", type=float, default=0.0,
        help="Feature phase only: opt-in budget-capped binning — blend and"
             " differentiate only each tile's transmittance-bound-visible"
             " depth prefix in a dense [tiles, cap] layout (approximate;"
             " error scale ~ budget; 0 disables)")
    parser.add_argument("--tile_budget_cap", type=int, default=128)
    parser.add_argument("--tile_budget_subdiv", type=int, default=2)
    parser.add_argument(
        "--cull_alpha", type=float, default=1.0 / 255.0,
        help="expansion exact-cull alpha threshold; > 1/255 is an "
             "approximation for the capped mode (see RasterizeSettings)")
    # Rasterizer implementation for the RGB phase: "auto" selects the
    # Pallas forward + RGB Pallas backward on real TPUs and the XLA
    # autodiff pipeline elsewhere; "xla"/"pallas" force one path.
    parser.add_argument("--impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas"])
    # Capture a jax.profiler trace of iterations [100, 110) to this dir
    # (SURVEY §5 tracing; the reference only has CUDA event timers).
    parser.add_argument("--profile_dir", type=str, default=None)
    args = parser.parse_args()
    args.save_iterations.append(args.iterations)
    # The reference appends the feature level to the model dir (train.py:354).
    args.model_path = args.model_path + f"_{args.feature_level}"
    print("Optimizing " + args.model_path)

    from langsplatv2_tpu.utils.system import safe_state
    safe_state(args.quiet, seed=args.seed)

    dataset = lp.extract(args)
    opt = op.extract(args)
    os.makedirs(args.model_path, exist_ok=True)
    save_cfg_args(args.model_path, Namespace(**vars(args)))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from langsplatv2_tpu.scene.scene import Scene
    from langsplatv2_tpu.models import gaussians as gm
    from langsplatv2_tpu.models import io as mio
    from langsplatv2_tpu.train import trainer
    from langsplatv2_tpu.utils.sparse_codes import residual_kmeans_codebooks

    if args.gui:
        from langsplatv2_tpu.serve import network_gui
        network_gui.init(args.ip, args.port)

    scene = Scene(dataset.source_path, args.model_path, images=dataset.images,
                  resolution=dataset.resolution,
                  white_background=dataset.white_background,
                  eval_split=dataset.eval)
    cameras = scene.get_train_cameras()
    bg = (1.0, 1.0, 1.0) if dataset.white_background else (0.0, 0.0, 0.0)

    first_iter = 0
    resume_ckpt_path = None
    if opt.include_feature:
        if not args.start_checkpoint:
            raise ValueError("checkpoint missing!!!!!")

    if args.start_checkpoint:
        model, ckpt_iter = load_any_checkpoint(
            args.start_checkpoint, dataset.sh_degree)
        if model.language_logits is None and opt.include_feature:
            first_iter = 0  # fresh feature phase from an RGB checkpoint
        else:
            first_iter = ckpt_iter
            resume_ckpt_path = args.start_checkpoint  # same-phase resume:
            # restore Adam moments once the optimizer template exists below.
    else:
        cap = int(np.asarray(scene.points).shape[0])
        model = gm.create_from_pcd(
            np.asarray(scene.points, np.float32),
            np.asarray(scene.colors, np.float32),
            spatial_lr_scale=scene.cameras_extent,
            max_sh_degree=dataset.sh_degree,
            capacity=-(-cap // 256) * 256)

    import json as _json
    from langsplatv2_tpu.models.renderer import make_settings, render
    from langsplatv2_tpu.utils import losses as _losses

    metrics_file = open(os.path.join(args.model_path, "metrics.jsonl"), "a")
    test_cams = scene.get_test_cameras()
    # Reference training_report samples 5 spaced train cameras alongside the
    # test split (train.py:303-306).
    train_sample = ([cameras[idx % len(cameras)] for idx in range(5, 30, 5)]
                    if cameras else [])

    def eval_split(model, cams):
        l1s, psnrs = [], []
        for cam in cams:
            settings = make_settings(cam, model.active_sh_degree, 1.0,
                                     args.max_entries, args.tile_cap, 16)
            out = render(settings, model,
                         jnp.asarray(cam.world_view_transform),
                         jnp.asarray(cam.full_proj_transform),
                         jnp.asarray(cam.camera_center),
                         jnp.asarray(bg, jnp.float32))
            img = jnp.clip(out.render, 0.0, 1.0)
            gt = jnp.asarray(cam.image)
            l1s.append(float(_losses.l1_loss(img, gt)))
            psnrs.append(float(_losses.psnr(img[None], gt[None])[0, 0]))
        return float(np.mean(l1s)), float(np.mean(psnrs))

    def maybe_profile(iteration):
        if args.profile_dir is None:
            return
        if iteration == 100:
            jax.profiler.start_trace(args.profile_dir)
        elif iteration == 110:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}")

    def training_report(iteration, model, metrics, phase):
        maybe_profile(iteration)
        """Scalar rows to metrics.jsonl every 10 iters; test-split L1/PSNR at
        --test_iterations (reference train.py:292-328, with JSONL standing in
        for tensorboard in this environment)."""
        if iteration % 10 == 0 or iteration in args.test_iterations:
            row = {"iter": iteration, "phase": phase,
                   "loss": round(float(metrics["loss"]), 6),
                   "num_live": int(model.num_live)}
            if "l1" in metrics:
                row["l1"] = round(float(metrics["l1"]), 6)
            metrics_file.write(_json.dumps(row) + "\n")
            metrics_file.flush()
        if iteration in args.test_iterations:
            for split, cams in (("test", test_cams), ("train", train_sample)):
                if not cams:
                    continue
                l1, ps = eval_split(model, cams)
                print(f"\n[ITER {iteration}] Evaluating {split}: "
                      f"L1 {l1:.6f} PSNR {ps:.3f}")
                metrics_file.write(_json.dumps(
                    {"iter": iteration, "phase": phase, "split": split,
                     "l1": round(l1, 6), "psnr": round(ps, 4)}) + "\n")
                metrics_file.flush()

    def save_outputs(iteration, model, opt_state, phase):
        if iteration in args.save_iterations:
            out = os.path.join(args.model_path, "point_cloud",
                               f"iteration_{iteration}", "point_cloud.ply")
            mio.save_ply(model, out)
        if iteration in args.checkpoint_iterations or iteration == args.iterations:
            # Persist Adam moments like the reference's capture()
            # (gaussian_model.py:67-101) so resumes keep optimizer state.
            mio.save_checkpoint(
                os.path.join(args.model_path, f"chkpnt{iteration}.npz"),
                model, opt_state, iteration, extra={"phase": phase})

    def restore_opt_state(model, make_params, make_opt):
        """Same-phase resume: rebuild the optimizer template and load the
        checkpoint's Adam moments into it (None when shapes mismatch)."""
        if resume_ckpt_path is None:
            return None
        template = make_opt().init(make_params(model))
        try:
            if resume_ckpt_path.endswith((".pth", ".pt")):
                # Reference torch checkpoint: convert its Adam state dict
                # into our per-group optax moments.
                from langsplatv2_tpu.models.torch_interop import (
                    convert_torch_adam_state, load_torch_checkpoint)
                _, _, opt_dict = load_torch_checkpoint(resume_ckpt_path)
                return convert_torch_adam_state(
                    opt_dict, template, model.capacity)
            _, opt_state, _, _ = mio.load_checkpoint(
                resume_ckpt_path, model, template)
            return opt_state
        except Exception as e:
            print(f"WARNING: could not restore optimizer state ({e}); "
                  "resuming with fresh moments")
            return None

    if opt.include_feature:
        # Codebook init from the 2D CLIP features (reference train.py:78-85).
        feats = load_2d_features(dataset.lf_path)
        model = gm.init_language_features(
            model, jax.random.PRNGKey(args.seed),
            opt.vq_layer_num, opt.codebook_size)
        if feats is not None:
            books = residual_kmeans_codebooks(
                jax.random.PRNGKey(args.seed + 1), jnp.asarray(feats),
                opt.vq_layer_num, opt.codebook_size)
            model = model.replace(codebooks=books)

        def on_iter(it, m, opt_state, metrics):
            if it % 100 == 0:
                print(f"Iter {it} Loss: {float(metrics['loss']):.6f}")
            training_report(it, m, metrics, "feature")
            save_outputs(it, m, opt_state, "feature")

        init_opt_state = restore_opt_state(
            model, trainer.feature_params,
            lambda: trainer.make_feature_optimizer(opt))
        model, final_opt_state, logs = trainer.train_features(
            model, cameras, opt, dataset.lf_path, dataset.feature_level,
            iterations=args.iterations, first_iter=first_iter,
            topk=args.topk, use_cos_loss=args.cos_loss,
            use_l1_loss=args.l1_loss, normalize=args.normalize,
            bg_color=bg, seed=args.seed, tile_cap=args.tile_cap,
            max_entries=args.max_entries, accum_iter=args.accum_iter,
            cam_batch=args.cam_batch,
            align_iterations=(set(args.checkpoint_iterations)
                              | set(args.save_iterations)
                              | set(args.test_iterations)
                              | {args.iterations}),
            tile_budget=args.tile_budget,
            tile_budget_cap=args.tile_budget_cap,
            tile_budget_subdiv=args.tile_budget_subdiv,
            cull_alpha=args.cull_alpha,
            opt_state=init_opt_state, feature_cache={},
            on_iteration=on_iter,
            gui_source_path=dataset.source_path if args.gui else None)
    else:
        def on_iter(it, m, opt_state, metrics):
            if it % 100 == 0:
                print(f"Iter {it} Loss: {float(metrics['loss']):.6f} "
                      f"live: {int(m.num_live)}")
            training_report(it, m, metrics, "rgb")
            save_outputs(it, m, opt_state, "rgb")

        init_opt_state = restore_opt_state(
            model, trainer.rgb_params,
            lambda: trainer.make_rgb_optimizer(opt, model.spatial_lr_scale,
                                               args.accum_iter))
        model, final_opt_state, logs = trainer.train_rgb(
            model, cameras, opt, scene.cameras_extent,
            iterations=args.iterations, first_iter=first_iter,
            bg_color=bg, white_background=dataset.white_background,
            seed=args.seed, tile_cap=args.tile_cap,
            max_entries=args.max_entries, accum_iter=args.accum_iter,
            opt_state=init_opt_state, on_iteration=on_iter,
            gui_source_path=dataset.source_path if args.gui else None,
            impl=args.impl)

    save_outputs(args.iterations, model, final_opt_state,
                 "feature" if opt.include_feature else "rgb")
    print("\nTraining complete.")


def load_any_checkpoint(path: str, sh_degree: int):
    """Load an npz checkpoint without a template (self-describing format)."""
    from langsplatv2_tpu.models.io import load_checkpoint_auto

    return load_checkpoint_auto(path, sh_degree)


def load_2d_features(lf_path: str):
    import glob

    import numpy as np

    names = glob.glob(os.path.join(lf_path, "*f.npy"))
    if not names:
        return None
    return np.concatenate([np.load(n) for n in names], axis=0)


if __name__ == "__main__":
    main()
