"""Per-parameter-group Adam with explicit state surgery.

Parity target: the reference's torch Adam with named param groups
(gaussian_model.py:244-259, eps=1e-15) plus the "optimizer-state surgery"
used by densification (prune/cat/replace, gaussian_model.py:352-422).

TPU shape: params are a flat dict {name: array}; each group has its own
optax chain so per-group state (Adam moments) stays addressable by name —
zeroing moments for reallocated gaussian slots or after opacity reset is a
masked where(), not a structural rebuild.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

ADAM_EPS = 1e-15  # reference gaussian_model.py:259


def adam_group(lr: float | Callable, every: int = 1) -> optax.GradientTransformation:
    """Adam(b1=.9, b2=.999, eps=1e-15) with constant or scheduled LR.

    A scheduled LR receives the 1-based iteration (the reference calls
    update_learning_rate(iteration) before each step, train.py:131). With
    gradient accumulation the optimizer only steps every `every`-th
    iteration, so the stored update count advances `every`x slower than the
    reference's iteration counter — `every` rescales it so scheduled groups
    still see the true iteration (update u happens at iteration
    (u+1)*every)."""
    if callable(lr):
        return optax.chain(
            optax.scale_by_adam(eps=ADAM_EPS),
            optax.scale_by_schedule(lambda count: -lr((count + 1) * every)),
        )
    return optax.chain(optax.scale_by_adam(eps=ADAM_EPS), optax.scale(-lr))


class GroupedOptimizer:
    """A dict-of-groups optimizer: {param_name: transformation}."""

    def __init__(self, groups: dict[str, optax.GradientTransformation]):
        self.groups = groups

    def init(self, params: dict[str, jnp.ndarray]):
        return {k: self.groups[k].init(params[k]) for k in params}

    def update(self, grads: dict, state: dict, params: dict):
        new_params, new_state = {}, {}
        for k, g in grads.items():
            updates, new_state[k] = self.groups[k].update(g, state[k], params[k])
            new_params[k] = params[k] + updates
        return new_params, new_state


def zero_moment_rows(opt_state, mask: jnp.ndarray):
    """Zero Adam first/second moments for rows where mask is True (leaves
    whose leading dim matches the mask length). Equivalent of appending
    zero-state rows in the reference's cat_tensors_to_optimizer."""
    n = mask.shape[0]

    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == n:
            shaped = mask.reshape((n,) + (1,) * (leaf.ndim - 1))
            return jnp.where(shaped, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree_util.tree_map(fix, opt_state)


def zero_group_moments(opt_state: dict, name: str):
    """Zero all moments of one named group (reference
    replace_tensor_to_optimizer after opacity reset)."""
    def fix(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1:
            return jnp.zeros_like(leaf)
        return leaf

    return {**opt_state, name: jax.tree_util.tree_map(fix, opt_state[name])}
