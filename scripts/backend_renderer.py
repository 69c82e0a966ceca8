#!/usr/bin/env python
"""ZMQ render server CLI (reference backend_renderer.py __main__).

  python scripts/backend_renderer.py --ckpt_paths <m1> <m2> <m3> \
      --iteration 10000 --zmq_port 5555
Each <mi> is a feature-model dir containing chkpnt<iteration>.npz.
"""
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = ArgumentParser()
    parser.add_argument("--ckpt_paths", nargs="+", type=str, required=True)
    parser.add_argument("--iteration", type=int, default=10000)
    parser.add_argument("--zmq_port", type=int, default=5555)
    parser.add_argument("--white_background", action="store_true")
    parser.add_argument("--clip_backend", type=str, default="auto")
    parser.add_argument("--topk", type=int, default=4)
    parser.add_argument("--bf16_cells", action="store_true",
                        help="bf16 VPU cell math in the fast16 blend "
                             "(~1e-2 relative, 2x VPU lane packing)")
    parser.add_argument("--tile_budget", type=float, default=0.0,
                        help="> 0: budget-capped binning — per-tile work "
                             "bounded by a transmittance budget "
                             "(approximate; see RasterizeSettings)")
    parser.add_argument("--tile_budget_cap", type=int, default=256)
    parser.add_argument("--tile_budget_subdiv", type=int, default=2)
    args = parser.parse_args()

    from langsplatv2_tpu.eval.lerf import merge_level_models
    from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork
    from langsplatv2_tpu.models.io import (load_checkpoint_auto,
                                           resolve_checkpoint)
    from langsplatv2_tpu.serve.backend import BackendRenderer

    models = []
    for path in args.ckpt_paths:
        ckpt = resolve_checkpoint(path, args.iteration)
        model, _ = load_checkpoint_auto(ckpt)
        models.append(model)
    merged = merge_level_models(models, topk=args.topk)

    bg = (1.0, 1.0, 1.0) if args.white_background else (0.0, 0.0, 0.0)
    server = BackendRenderer(
        merged, zmq_port=args.zmq_port, background=bg,
        clip_model=OpenCLIPNetwork(backend=args.clip_backend),
        bf16_cells=args.bf16_cells, tile_budget=args.tile_budget,
        tile_budget_cap=args.tile_budget_cap,
        tile_budget_subdiv=args.tile_budget_subdiv)
    server.run()


if __name__ == "__main__":
    main()
