"""Interop with the reference's torch checkpoints (`chkpnt*.pth`).

The reference persists training state as
``torch.save((gaussians.capture(include_feature), iteration), ...)`` where
the capture tuple has 12 entries (RGB phase) or 14 (feature phase — adds
language logits + codebooks); see reference `scene/gaussian_model.py:67-139`
and `train.py:265-267`. This module loads that tuple into a
:class:`GaussianModel` (and optionally converts its torch-Adam state into
our per-group optax state), and can export a reference-schema tuple back,
so a reference-trained model can be evaluated/served here and vice versa.

torch is used only as a (de)serialization library — all compute stays JAX.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from .gaussians import GaussianModel, _pad, _pad_rotation

# Reference RGB-phase param-group order (gaussian_model.py:245-252) -> our
# GroupedOptimizer group names (train/optimizers.py). torch Adam state is
# keyed by the global param index in this order.
_RGB_GROUPS = ("xyz", "features_dc", "features_rest", "opacity",
               "scaling", "rotation")
# Feature phase: ONE group "language_feature" holding [logits, codebooks]
# (gaussian_model.py:235-237) -> params 0 and 1.
_FEATURE_GROUPS = ("language_logits", "codebooks")


def _np(t) -> np.ndarray:
    """torch tensor (any device/dtype) -> float32 numpy."""
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    return np.asarray(arr, np.float32)


def load_torch_checkpoint(path: str, capacity: int | None = None,
                          max_sh_degree: int = 3):
    """Load a reference ``chkpnt*.pth`` into (model, iteration, opt_dict).

    ``opt_dict`` is the raw torch Adam ``state_dict()`` carried by the
    tuple (slot 10/12), for :func:`convert_torch_adam_state`; callers that
    only render can ignore it.
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    model_args, iteration = payload
    model, opt_dict = model_from_capture_tuple(
        model_args, capacity=capacity, max_sh_degree=max_sh_degree)
    return model, int(iteration), opt_dict


def model_from_capture_tuple(model_args, capacity: int | None = None,
                             max_sh_degree: int = 3):
    """Reference capture() 12/14-tuple -> (GaussianModel, opt_dict)."""
    if len(model_args) == 14:
        (active_sh, xyz, f_dc, f_rest, scaling, rotation, opacity,
         logits, codebooks, max_radii2d, grad_accum, denom, opt_dict,
         spatial_lr_scale) = model_args
    elif len(model_args) == 12:
        (active_sh, xyz, f_dc, f_rest, scaling, rotation, opacity,
         max_radii2d, grad_accum, denom, opt_dict,
         spatial_lr_scale) = model_args
        logits = codebooks = None
    else:
        raise ValueError(
            f"unrecognized capture tuple length {len(model_args)} "
            "(expected 12 or 14; reference gaussian_model.py:103-138)")

    xyz = _np(xyz)
    n = xyz.shape[0]
    capacity = capacity or n
    if capacity < n:
        raise ValueError(f"capacity {capacity} < checkpoint rows {n}")

    def padf(t, like_n=True):
        a = jnp.asarray(_np(t))
        return _pad(a, capacity) if like_n else a

    # Densification stats may be empty tensors in eval-saved checkpoints.
    def pad_stat(t, shape):
        a = _np(t)
        if a.size == 0:
            return jnp.zeros((capacity,) + shape[1:], jnp.float32)
        return _pad(jnp.asarray(a.reshape((n,) + shape[1:])), capacity)

    live = jnp.zeros((capacity,), bool).at[:n].set(True)
    model = GaussianModel(
        xyz=padf(xyz),
        features_dc=padf(f_dc),
        features_rest=padf(f_rest),
        scaling=padf(scaling),
        rotation=_pad_rotation(jnp.asarray(_np(rotation)), capacity),
        opacity=padf(opacity),
        live=live,
        language_logits=None if logits is None else padf(logits),
        codebooks=None if codebooks is None else jnp.asarray(_np(codebooks)),
        max_radii2d=pad_stat(max_radii2d, (n,)),
        xyz_gradient_accum=pad_stat(grad_accum, (n, 1)),
        denom=pad_stat(denom, (n, 1)),
        active_sh_degree=int(active_sh),
        max_sh_degree=max_sh_degree,
        spatial_lr_scale=float(spatial_lr_scale),
    )
    return model, opt_dict


def convert_torch_adam_state(opt_dict: dict, template_state: dict,
                             capacity: int) -> dict:
    """torch Adam ``state_dict()`` -> our GroupedOptimizer state.

    ``template_state`` comes from ``GroupedOptimizer.init(params)`` (it
    fixes the chain structure / leaf shapes); moments (exp_avg/exp_avg_sq)
    and step counts are copied in, padded to ``capacity`` rows. Groups
    absent from the torch state (fresh feature phase, or a template with
    more groups) keep their template zeros.
    """
    if not opt_dict or not opt_dict.get("state"):
        return template_state
    groups = opt_dict.get("param_groups", [])
    names = [g.get("name", "") for g in groups]
    if names and names[0] == "language_feature":
        order = _FEATURE_GROUPS
    else:
        # Map reference group names to ours positionally (the reference's
        # param index IS the group index in the RGB phase: 1 param/group).
        ref_to_ours = {"xyz": "xyz", "f_dc": "features_dc",
                       "f_rest": "features_rest", "opacity": "opacity",
                       "scaling": "scaling", "rotation": "rotation"}
        order = tuple(ref_to_ours.get(nm, nm) for nm in names) \
            if names else _RGB_GROUPS

    out = dict(template_state)
    for idx, ours in enumerate(order):
        if ours not in out or idx not in opt_dict["state"]:
            continue
        st = opt_dict["state"][idx]
        step = st.get("step", 0)
        step = int(step.item()) if hasattr(step, "item") else int(step)
        mu = _np(st["exp_avg"])
        nu = _np(st["exp_avg_sq"])
        if mu.shape[0] != capacity and ours != "codebooks":
            mu = np.asarray(_pad(jnp.asarray(mu), capacity))
            nu = np.asarray(_pad(jnp.asarray(nu), capacity))
        out[ours] = _fill_adam_leaves(out[ours], step, jnp.asarray(mu),
                                      jnp.asarray(nu))
    return out


def _fill_adam_leaves(group_state, step: int, mu, nu):
    """Rebuild one group's optax chain state with the torch moments. The
    chain is (scale_by_adam, scale | scale_by_schedule): state[0] is a
    ScaleByAdamState namedtuple (count, mu, nu); a schedule tail also
    carries a count."""
    adam_st = group_state[0]._replace(
        count=jnp.asarray(step, jnp.int32), mu=mu, nu=nu)
    rest = []
    for s in group_state[1:]:
        # namedtuple field check ('count' is also a tuple METHOD, so
        # hasattr would match every state including EmptyState)
        if "count" in getattr(s, "_fields", ()):
            s = s._replace(count=jnp.asarray(step, jnp.int32))
        rest.append(s)
    return (adam_st,) + tuple(rest)


def capture_tuple_from_model(model: GaussianModel, include_feature: bool,
                             opt_dict: dict | None = None):
    """GaussianModel -> the reference capture() tuple (torch tensors, live
    rows only) — the export half of the interop."""
    import torch

    from .gaussians import compact

    m = compact(model)
    n = m.xyz.shape[0]

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32).copy())

    opt_dict = opt_dict if opt_dict is not None else \
        {"state": {}, "param_groups": []}
    stats = (
        t(m.max_radii2d if m.max_radii2d is not None
          else np.zeros((n,), np.float32)),
        t(m.xyz_gradient_accum if m.xyz_gradient_accum is not None
          else np.zeros((n, 1), np.float32)),
        t(m.denom if m.denom is not None else np.zeros((n, 1), np.float32)),
    )
    base = (int(m.active_sh_degree), t(m.xyz), t(m.features_dc),
            t(m.features_rest), t(m.scaling), t(m.rotation), t(m.opacity))
    if include_feature:
        if m.language_logits is None or m.codebooks is None:
            raise ValueError("model has no language features to capture")
        return base + (t(m.language_logits), t(m.codebooks)) + stats + (
            opt_dict, float(m.spatial_lr_scale))
    return base + stats + (opt_dict, float(m.spatial_lr_scale))


def save_torch_checkpoint(path: str, model: GaussianModel, iteration: int,
                          include_feature: bool | None = None,
                          opt_dict: dict | None = None) -> None:
    """Write a reference-loadable ``chkpnt*.pth``."""
    import torch

    if include_feature is None:
        include_feature = model.language_logits is not None
    torch.save((capture_tuple_from_model(model, include_feature, opt_dict),
                int(iteration)), path)
