"""LPIPS perceptual distance in JAX.

Parity target: the reference vendors `lpipsPyTorch/` (modules/lpips.py,
networks.py, utils.py — imported nowhere in the reference tree, carried from
3DGS for optional RGB quality eval, SURVEY.md §2.1). This is the TPU-native
equivalent: the VGG16 / AlexNet feature trunks and the LPIPS linear heads
expressed as pure-JAX functions over a parameter pytree.

Pretrained weights cannot be downloaded in an air-gapped environment (the
reference has the same constraint — its lpipsPyTorch downloads torchvision
weights on first use). `load_torch_state_dict` converts a locally provided
torchvision VGG16/AlexNet state dict plus the LPIPS linear-head weights into
the pytree this module consumes; `random_params` gives a deterministic
random-weight instance so the computation path stays testable end-to-end.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, kernel, stride, padding, has_pool_before) per conv layer,
# with feature taps after each ReLU block matching lpips.networks.
_VGG16_CFG = [
    (64, 3, 1), (64, 3, 1), ("pool",), (128, 3, 1), (128, 3, 1), ("pool",),
    (256, 3, 1), (256, 3, 1), (256, 3, 1), ("pool",),
    (512, 3, 1), (512, 3, 1), (512, 3, 1), ("pool",),
    (512, 3, 1), (512, 3, 1), (512, 3, 1),
]
# ReLU indices (within conv sequence) after which LPIPS taps features.
_VGG16_TAPS = [1, 3, 6, 9, 12]          # relu1_2, 2_2, 3_3, 4_3, 5_3
_VGG16_TAP_CH = [64, 128, 256, 512, 512]

_ALEX_CFG = [
    (64, 11, 4, 2), ("pool",), (192, 5, 1, 2), ("pool",),
    (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1),
]
_ALEX_TAPS = [0, 1, 2, 3, 4]
_ALEX_TAP_CH = [64, 192, 384, 256, 256]

# ImageNet normalization used by lpips (scaling_layer shift/scale).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None]


def _vgg_features(params, x):
    feats = []
    conv_i = 0
    relu_i = 0
    for layer in _VGG16_CFG:
        if layer[0] == "pool":
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            continue
        w, b = params["convs"][conv_i]
        x = jax.nn.relu(_conv(x, w, b, stride=layer[2], padding=1))
        if relu_i in _VGG16_TAPS:
            feats.append(x)
        conv_i += 1
        relu_i += 1
    return feats


def _alex_features(params, x):
    feats = []
    conv_i = 0
    for layer in _ALEX_CFG:
        if layer[0] == "pool":
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
            continue
        w, b = params["convs"][conv_i]
        x = jax.nn.relu(_conv(x, w, b, stride=layer[2], padding=layer[3]))
        feats.append(x)
        conv_i += 1
    return feats


def _normalize_tensor(x, eps=1e-10):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=1, keepdims=True) + eps)


@functools.partial(jax.jit, static_argnames=("net",))
def lpips(params: Any, img0: jnp.ndarray, img1: jnp.ndarray,
          net: str = "vgg") -> jnp.ndarray:
    """LPIPS distance between [N, 3, H, W] images in [0, 1].

    Matches lpipsPyTorch/modules/lpips.py: images scaled to [-1, 1],
    ImageNet-normalized, per-tap unit-normalized feature differences,
    1x1-conv linear heads, spatial mean, summed over taps.
    """
    def prep(x):
        x = 2.0 * x - 1.0
        return (x - jnp.asarray(_SHIFT)[None, :, None, None]) / (
            jnp.asarray(_SCALE)[None, :, None, None])

    trunk = _vgg_features if net == "vgg" else _alex_features
    f0 = trunk(params, prep(img0))
    f1 = trunk(params, prep(img1))
    total = 0.0
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
        head = params["heads"][i]                     # [C] nonneg weights
        total = total + jnp.mean(
            jnp.sum(d * head[None, :, None, None], axis=1), axis=(1, 2))
    return total


def random_params(net: str = "vgg", seed: int = 0):
    """Deterministic random-weight LPIPS instance (for tests / smoke runs
    where pretrained weights are unavailable)."""
    rng = np.random.default_rng(seed)
    cfg = _VGG16_CFG if net == "vgg" else _ALEX_CFG
    taps = _VGG16_TAP_CH if net == "vgg" else _ALEX_TAP_CH
    convs = []
    cin = 3
    for layer in cfg:
        if layer[0] == "pool":
            continue
        cout, k = layer[0], layer[1]
        w = (rng.normal(size=(cout, cin, k, k)) / np.sqrt(cin * k * k)
             ).astype(np.float32)
        b = np.zeros(cout, np.float32)
        convs.append((jnp.asarray(w), jnp.asarray(b)))
        cin = cout
    heads = [jnp.asarray(np.abs(rng.normal(size=c)).astype(np.float32) / c)
             for c in taps]
    return {"convs": convs, "heads": heads}


def load_torch_state_dict(trunk_state: dict, heads_state: dict,
                          net: str = "vgg"):
    """Convert torchvision trunk weights (``vgg16(...).features`` /
    ``alexnet(...).features`` state dict) + LPIPS linear-head weights
    (``lins.{i}.model.1.weight``) into this module's param pytree."""
    def to_np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    convs = []
    idx = sorted(
        {int(k.split(".")[0]) for k in trunk_state if k.endswith(".weight")})
    for i in idx:
        convs.append((jnp.asarray(to_np(trunk_state[f"{i}.weight"])),
                      jnp.asarray(to_np(trunk_state[f"{i}.bias"]))))
    n_taps = len(_VGG16_TAPS if net == "vgg" else _ALEX_TAPS)
    heads = []
    for i in range(n_taps):
        for key in (f"lins.{i}.model.1.weight", f"lin{i}.model.1.weight"):
            if key in heads_state:
                heads.append(jnp.asarray(to_np(heads_state[key])[:, :, 0, 0][0]))
                break
        else:
            raise KeyError(f"missing LPIPS head {i}")
    return {"convs": convs, "heads": heads}
