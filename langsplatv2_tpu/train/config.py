"""Config / flag system.

Parity target: reference `arguments/__init__.py` — reflection-based param
groups where a leading underscore in the attribute name creates a one-letter
shorthand flag, `extract()` filters parsed args back into a group object,
and the trained model dir persists the full config for eval-time merging
(`get_combined_args`, CLI overrides win).

Difference by design: persisted config is JSON (`cfg_args.json`) rather than
an eval()'d repr — but `load_combined_args` still reads a legacy
`cfg_args` Namespace-repr file for compatibility with reference-produced
model directories.
"""
from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser, Namespace


class GroupParams:
    pass


class ParamGroup:
    def __init__(self, parser: ArgumentParser, name: str, fill_none: bool = False):
        group = parser.add_argument_group(name)
        for key, value in vars(self).items():
            shorthand = False
            if key.startswith("_"):
                shorthand = True
                key = key[1:]
            t = type(value)
            value = value if not fill_none else None
            flags = ["--" + key] + (["-" + key[0:1]] if shorthand else [])
            if t is bool:
                group.add_argument(*flags, default=value, action="store_true")
            else:
                group.add_argument(*flags, default=value, type=t)

    def extract(self, args) -> GroupParams:
        group = GroupParams()
        for k, v in vars(args).items():
            if k in vars(self) or ("_" + k) in vars(self):
                setattr(group, k, v)
        return group


class ModelParams(ParamGroup):
    def __init__(self, parser, sentinel: bool = False):
        self.sh_degree = 3
        self._source_path = ""
        self._model_path = ""
        self._language_features_name = "language_features"
        self._images = "images"
        self._resolution = -1
        self._white_background = False
        self._feature_level = -1
        self.data_device = "tpu"
        self.eval = False
        super().__init__(parser, "Loading Parameters", sentinel)

    def extract(self, args) -> GroupParams:
        g = super().extract(args)
        g.source_path = os.path.abspath(g.source_path)
        g.lf_path = os.path.join(g.source_path, g.language_features_name)
        return g


class PipelineParams(ParamGroup):
    def __init__(self, parser):
        self.convert_SHs_python = False
        self.compute_cov3D_python = False
        self.debug = False
        super().__init__(parser, "Pipeline Parameters")


class OptimizationParams(ParamGroup):
    def __init__(self, parser):
        self.iterations = 30_000
        self.position_lr_init = 0.00016
        self.position_lr_final = 0.0000016
        self.position_lr_delay_mult = 0.01
        self.position_lr_max_steps = 30_000
        self.feature_lr = 0.0025
        self.opacity_lr = 0.05
        self.language_feature_lr = 0.0025
        self.include_feature = False
        self.quick_render = False
        self.vq_layer_num = 1
        self.codebook_size = 64
        self.scaling_lr = 0.005
        self.rotation_lr = 0.001
        self.percent_dense = 0.01
        self.lambda_dssim = 0.2
        self.densification_interval = 100
        self.opacity_reset_interval = 3000
        self.densify_from_iter = 500
        self.densify_until_iter = 15_000
        self.densify_grad_threshold = 0.0002
        super().__init__(parser, "Optimization Parameters")


def save_cfg_args(model_path: str, args: Namespace) -> None:
    """Persist config (reference train.py:281-282 writes repr; we write both
    the legacy repr for tool compat and a JSON copy)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write("Namespace(" + ", ".join(
            f"{k}={v!r}" for k, v in sorted(vars(args).items())
        ) + ")")
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(vars(args), f, indent=1, default=str)


def load_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """Merge persisted train config with CLI overrides (CLI wins;
    reference get_combined_args, arguments/__init__.py:99-119)."""
    args_cmdline = parser.parse_args(sys.argv[1:] if argv is None else argv)
    merged: dict = {}
    model_path = getattr(args_cmdline, "model_path", None)
    if model_path:
        json_path = os.path.join(model_path, "cfg_args.json")
        legacy_path = os.path.join(model_path, "cfg_args")
        if os.path.exists(json_path):
            with open(json_path) as f:
                merged.update(json.load(f))
        elif os.path.exists(legacy_path):
            with open(legacy_path) as f:
                # Legacy format is a repr'd Namespace.
                merged.update(vars(eval(f.read(), {"Namespace": Namespace})))
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)
