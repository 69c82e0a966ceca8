"""Model persistence: 3DGS PLY export/import and full checkpoints.

Parity targets:
- PLY schema exactly as reference `scene/gaussian_model.py:269-350`
  (x,y,z, nx,ny,nz, f_dc_*, f_rest_* in channel-major order, opacity,
  scale_*, rot_*; geometry only — no language fields).
- Checkpoint: the logical content of the reference capture()/restore()
  12/14-tuple (gaussian_model.py:67-139) — params, densification stats,
  optimizer state, spatial_lr_scale, iteration — stored as an .npz of the
  flattened pytree plus a JSON manifest (the orbax-free equivalent that
  works host-side without a TPU runtime).
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .gaussians import GaussianModel, compact
from ..scene import ply as plyio


def save_ply(model: GaussianModel, path: str) -> None:
    m = compact(model)
    n = m.xyz.shape[0]
    xyz = np.asarray(m.xyz, np.float32)
    # channel-major flatten: [N, coeffs, 3] -> [N, 3, coeffs] -> [N, 3*coeffs]
    f_dc = np.asarray(m.features_dc, np.float32).transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(m.features_rest, np.float32).transpose(0, 2, 1).reshape(n, -1)
    opacity = np.asarray(m.opacity, np.float32)
    scale = np.asarray(m.scaling, np.float32)
    rot = np.asarray(m.rotation, np.float32)

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
             + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
             + ["opacity"]
             + [f"scale_{i}" for i in range(scale.shape[1])]
             + [f"rot_{i}" for i in range(rot.shape[1])])
    attrs = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc, f_rest, opacity, scale, rot], axis=1
    ).astype(np.float32)
    arr = np.rec.fromarrays(attrs.T, names=names, formats=["<f4"] * len(names))
    plyio.write_ply(path, np.asarray(arr))


def load_ply(path: str, max_sh_degree: int = 3,
             capacity: int | None = None) -> GaussianModel:
    data = plyio.read_ply(path)["vertex"]
    n = len(data)
    xyz = np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float32)
    opacity = np.asarray(data["opacity"], np.float32)[:, None]

    f_dc = np.stack([data[f"f_dc_{i}"] for i in range(3)], axis=1).astype(np.float32)
    n_rest = 3 * ((max_sh_degree + 1) ** 2 - 1)
    rest_names = sorted(
        [p for p in data.dtype.names if p.startswith("f_rest_")],
        key=lambda x: int(x.split("_")[-1]),
    )
    assert len(rest_names) == n_rest, (len(rest_names), n_rest)
    f_rest = np.stack([data[p] for p in rest_names], axis=1).astype(np.float32)
    f_rest = f_rest.reshape(n, 3, (max_sh_degree + 1) ** 2 - 1)

    scale_names = sorted([p for p in data.dtype.names if p.startswith("scale_")],
                         key=lambda x: int(x.split("_")[-1]))
    scales = np.stack([data[p] for p in scale_names], axis=1).astype(np.float32)
    rot_names = sorted([p for p in data.dtype.names if p.startswith("rot")],
                       key=lambda x: int(x.split("_")[-1]))
    rots = np.stack([data[p] for p in rot_names], axis=1).astype(np.float32)

    capacity = capacity or n
    from .gaussians import _pad

    live = jnp.zeros((capacity,), bool).at[:n].set(True)
    return GaussianModel(
        xyz=_pad(jnp.asarray(xyz), capacity),
        features_dc=_pad(jnp.asarray(f_dc)[:, None, :], capacity),
        features_rest=_pad(jnp.asarray(f_rest.transpose(0, 2, 1)), capacity),
        scaling=_pad(jnp.asarray(scales), capacity),
        rotation=_pad(jnp.asarray(rots), capacity),
        opacity=_pad(jnp.asarray(opacity), capacity),
        live=live,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity, 1), jnp.float32),
        denom=jnp.zeros((capacity, 1), jnp.float32),
        active_sh_degree=max_sh_degree,
        max_sh_degree=max_sh_degree,
    )


# ---------------------------------------------------------------------------
# Full checkpoints (pytree npz)
# ---------------------------------------------------------------------------

MODEL_FIELDS = (
    "xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity",
    "live", "language_logits", "codebooks", "quick_weights", "quick_indices",
    "max_radii2d", "xyz_gradient_accum", "denom",
)


def save_checkpoint(path: str, model: GaussianModel, opt_state, iteration: int,
                    extra: dict | None = None) -> None:
    """Store model + optimizer state + iteration — the logical superset of
    the reference's (capture(), iteration) torch.save 12/14-tuple. Model
    fields are saved by NAME so checkpoints are self-describing; optimizer
    state is saved as an indexed flattened pytree (restoring it requires a
    matching template, exactly like torch's load_state_dict)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for f in MODEL_FIELDS:
        v = getattr(model, f)
        if v is not None:
            arrays[f"model/{f}"] = np.asarray(v)
    opt_flat, _ = jax.tree_util.tree_flatten(opt_state)
    for i, leaf in enumerate(opt_flat):
        arrays[f"opt/{i}"] = np.asarray(leaf)
    manifest = {
        "iteration": int(iteration),
        "num_opt_leaves": len(opt_flat),
        "active_sh_degree": model.active_sh_degree,
        "max_sh_degree": model.max_sh_degree,
        "spatial_lr_scale": model.spatial_lr_scale,
        "include_feature": model.language_logits is not None,
        "extra": extra or {},
    }
    np.savez(path, manifest=json.dumps(manifest), **arrays)


def load_checkpoint(path: str, model_template: GaussianModel, opt_state_template):
    """Restore. Returns (model, opt_state, iteration, extra); opt_state is
    the template when the checkpoint carries none."""
    model, iteration, extra, opt_flat = _load_parts(path)
    if opt_flat and opt_state_template is not None:
        _, treedef = jax.tree_util.tree_flatten(opt_state_template)
        opt_state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in opt_flat])
    else:
        opt_state = opt_state_template
    return model, opt_state, iteration, extra


def load_checkpoint_auto(path: str, sh_degree: int = 3):
    """Template-free restore of the model part. Returns (model, iteration).

    Dispatches on extension: ``.pth``/``.pt`` loads a reference-produced
    torch checkpoint (the capture 12/14-tuple, gaussian_model.py:67-139);
    anything else is our native npz."""
    if path.endswith((".pth", ".pt")):
        from .torch_interop import load_torch_checkpoint
        model, iteration, _ = load_torch_checkpoint(
            path, max_sh_degree=sh_degree)
        return model, iteration
    model, iteration, _, _ = _load_parts(path)
    return model, iteration


def resolve_checkpoint(dirpath: str, iteration: int) -> str:
    """Find ``chkpnt<iteration>`` in a model dir: native .npz first, then
    the reference's .pth — evals/serve accept either artifact."""
    for ext in (".npz", ".pth", ".pt"):
        p = os.path.join(dirpath, f"chkpnt{iteration}{ext}")
        if os.path.exists(p):
            return p
    return os.path.join(dirpath, f"chkpnt{iteration}.npz")


def _load_parts(path: str):
    with np.load(path, allow_pickle=False) as data:
        manifest = json.loads(str(data["manifest"]))
        fields = {}
        for f in MODEL_FIELDS:
            key = f"model/{f}"
            fields[f] = jnp.asarray(data[key]) if key in data else None
        opt_flat = [data[f"opt/{i}"] for i in range(manifest.get("num_opt_leaves", 0))]
    model = GaussianModel(
        **fields,
        active_sh_degree=manifest["active_sh_degree"],
        max_sh_degree=manifest["max_sh_degree"],
        spatial_lr_scale=manifest["spatial_lr_scale"],
    )
    return model, manifest["iteration"], manifest["extra"], opt_flat
