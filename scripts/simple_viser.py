#!/usr/bin/env python
"""RGB-only PLY splat viewer (reference simple_viser.py): load a trained
point_cloud.ply and serve it as viser gaussian splats (no backend needed)."""
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = ArgumentParser()
    parser.add_argument("--ply_path", type=str, required=True)
    parser.add_argument("--port", type=int, default=8081)
    parser.add_argument("--max_sh_degree", type=int, default=3)
    args = parser.parse_args()

    import numpy as np

    try:
        import viser
    except ImportError:
        print("viser is not installed in this environment; "
              "install it to use the interactive viewer")
        sys.exit(1)

    from langsplatv2_tpu.models.io import load_ply
    from langsplatv2_tpu.utils.sh import sh_to_rgb
    from langsplatv2_tpu.utils import transforms as tf
    import jax.numpy as jnp

    model = load_ply(args.ply_path, max_sh_degree=args.max_sh_degree)
    centers = np.asarray(model.xyz)
    rgbs = np.clip(np.asarray(sh_to_rgb(model.features_dc[:, 0])), 0, 1)
    opacities = np.asarray(tf.opacity_activation(model.opacity))
    cov6 = np.asarray(model.get_covariance())
    covs = np.asarray(tf.unstrip_symmetric(jnp.asarray(cov6)))

    server = viser.ViserServer(port=args.port)
    server.scene.add_gaussian_splats(
        "/splats", centers=centers, rgbs=rgbs,
        opacities=opacities, covariances=covs)
    print(f"serving {len(centers)} splats on :{args.port}")
    import time

    while True:
        time.sleep(1.0)


if __name__ == "__main__":
    main()
