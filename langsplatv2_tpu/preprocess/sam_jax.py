"""JAX/Flax port of the Segment-Anything model used by preprocessing.

TPU-native replacement for the reference's `segment-anything-langsplat`
submodule (SURVEY.md §2.3(c); call site: reference preprocess.py:362-372 —
ViT-H, SamAutomaticMaskGenerator(points_per_side=32, crop_n_layers=1)).
The torch submodule is a *model dependency*, not a kernel: the idiomatic
TPU equivalent is a Flax module set whose forward runs under jit on the
MXU, with the torch checkpoint (`sam_vit_h_4b8939.pth`) converted to a
param pytree on first use.

Three parts, mirroring SAM's architecture (Kirillov et al., 2023):

- `ImageEncoderViT`: patch-embed conv + windowed/global ViT blocks with
  decomposed relative position attention + a 256-channel neck.
- `PromptEncoder`: random-Fourier point embeddings (positive/negative
  labels), a learned not-a-point embedding and the no-mask dense embedding.
- `MaskDecoder`: IoU token + 4 mask tokens through a 2-layer two-way
  transformer, transposed-conv upscaling, per-token hypernetwork MLPs.

`JaxSamMaskGenerator` reproduces the langsplat fork's automatic-generator
contract: `generate(image)` returns a 4-TUPLE of mask-dict lists
(default, s, m, l — reference preprocess.py:299). SAM's three multimask
outputs are ordered subpart/part/whole, which the fork exposes as the
s/m/l granularities; `default` is each prompt's best-IoU mask (the
single-mask selection rule), all four pools independently NMS'd.

Weights are environment-gated exactly like the CLIP backends
(eval/openclip.py): without a checkpoint the pipeline falls back to
`ClusterMaskGenerator` (pipeline.py). Tests exercise tiny random-weight
configs on CPU.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamConfig:
    img_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 1280        # ViT-H
    encoder_depth: int = 32
    encoder_heads: int = 16
    global_attn_indexes: tuple = (7, 15, 23, 31)
    window_size: int = 14
    prompt_dim: int = 256          # transformer/prompt embedding dim
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask: int = 3         # s / m / l granularity tokens
    mask_threshold: float = 0.0

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


VIT_H = SamConfig()
VIT_TINY_TEST = SamConfig(
    img_size=64, patch_size=8, encoder_dim=32, encoder_depth=2,
    encoder_heads=2, global_attn_indexes=(1,), window_size=4,
    prompt_dim=32, decoder_mlp_dim=64)


# ---------------------------------------------------------------------------
# Parameter initialization (tests / random configs). Real runs convert the
# torch checkpoint with `convert_torch_checkpoint`.
# ---------------------------------------------------------------------------

def _dense(rng, d_in, d_out, scale=0.02):
    k1, _ = jax.random.split(rng)
    return {"w": jax.random.normal(k1, (d_in, d_out), jnp.float32) * scale,
            "b": jnp.zeros((d_out,), jnp.float32)}


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_params(cfg: SamConfig, rng) -> dict:
    ks = iter(jax.random.split(rng, 64 + 8 * cfg.encoder_depth))
    g = cfg.grid
    d = cfg.encoder_dim
    p = cfg.prompt_dim

    def blk(i):
        wr = cfg.window_size if i not in cfg.global_attn_indexes else g
        return {
            "ln1": _ln(d), "ln2": _ln(d),
            "qkv": _dense(next(ks), d, 3 * d),
            "proj": _dense(next(ks), d, d),
            "mlp1": _dense(next(ks), d, 4 * d),
            "mlp2": _dense(next(ks), 4 * d, d),
            "rel_h": jax.random.normal(
                next(ks), (2 * wr - 1, d // cfg.encoder_heads)) * 0.02,
            "rel_w": jax.random.normal(
                next(ks), (2 * wr - 1, d // cfg.encoder_heads)) * 0.02,
        }

    def attn(dk, downsample=1):
        di = dk // downsample
        return {"q": _dense(next(ks), dk, di), "k": _dense(next(ks), dk, di),
                "v": _dense(next(ks), dk, di),
                "out": _dense(next(ks), di, dk)}

    def twoway_layer():
        return {
            "self_attn": attn(p), "ln1": _ln(p),
            "cross_t2i": attn(p, 2), "ln2": _ln(p),
            "mlp1": _dense(next(ks), p, cfg.decoder_mlp_dim),
            "mlp2": _dense(next(ks), cfg.decoder_mlp_dim, p),
            "ln3": _ln(p),
            "cross_i2t": attn(p, 2), "ln4": _ln(p),
        }

    n_tok = 1 + cfg.num_multimask  # 4 mask tokens (single + 3 granularities)
    return {
        "encoder": {
            "patch": {"w": jax.random.normal(
                next(ks), (cfg.patch_size, cfg.patch_size, 3, d)) * 0.02,
                "b": jnp.zeros((d,))},
            "pos": jax.random.normal(next(ks), (g, g, d)) * 0.02,
            "blocks": [blk(i) for i in range(cfg.encoder_depth)],
            "neck0": jax.random.normal(next(ks), (1, 1, d, p)) * 0.02,
            "neck_ln0": _ln(p),
            "neck1": jax.random.normal(next(ks), (3, 3, p, p)) * 0.02,
            "neck_ln1": _ln(p),
        },
        "prompt": {
            # random Fourier positional matrix (frozen gaussian in SAM)
            "pe_gauss": jax.random.normal(next(ks), (2, p // 2)),
            "point_embed": jax.random.normal(next(ks), (4, p)) * 0.02,
            "not_a_point": jax.random.normal(next(ks), (p,)) * 0.02,
            "no_mask": jax.random.normal(next(ks), (p,)) * 0.02,
        },
        "decoder": {
            "iou_token": jax.random.normal(next(ks), (p,)) * 0.02,
            "mask_tokens": jax.random.normal(next(ks), (n_tok, p)) * 0.02,
            "layers": [twoway_layer() for _ in range(cfg.decoder_depth)],
            "final_t2i": attn(p, 2), "ln_final": _ln(p),
            # conv_transpose kernels in the FORWARD conv's HWIO layout
            # ([kh, kw, out_ch, in_ch] of the transpose op) for
            # transpose_kernel=True — exact torch ConvTranspose2d semantics
            "up0": jax.random.normal(next(ks), (2, 2, p // 4, p)) * 0.02,
            "up0_b": jnp.zeros((p // 4,)),
            "up_ln": _ln(p // 4),
            "up1": jax.random.normal(next(ks), (2, 2, p // 8, p // 4)) * 0.02,
            "up1_b": jnp.zeros((p // 8,)),
            "hyper": [
                {"l0": _dense(next(ks), p, p), "l1": _dense(next(ks), p, p),
                 "l2": _dense(next(ks), p, p // 8)}
                for _ in range(n_tok)],
            "iou_mlp": {"l0": _dense(next(ks), p, p),
                        "l1": _dense(next(ks), p, p),
                        "l2": _dense(next(ks), p, n_tok)},
        },
    }


# ---------------------------------------------------------------------------
# Functional forward passes (pure; everything jit-friendly, static shapes).
# ---------------------------------------------------------------------------

def _apply_ln(x, prm, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * prm["scale"] + prm["bias"]


def _gelu(x):
    # torch nn.GELU defaults to the exact erf formulation; jax.nn.gelu
    # defaults to the tanh approximation (~3e-3 apart near |x|=2, which
    # compounds over 32 encoder blocks) — pin exact for checkpoint parity.
    return jax.nn.gelu(x, approximate=False)


def _apply_dense(x, prm):
    return x @ prm["w"] + prm["b"]


def _rel_pos_bias(q, rel_h, rel_w, h, w, heads, head_dim):
    """SAM's decomposed relative position bias: attn += q·Rh + q·Rw
    (per-axis learned tables indexed by coordinate delta)."""
    # q: [B, heads, h*w, head_dim]
    q = q.reshape(-1, heads, h, w, head_dim)
    idx_h = jnp.arange(h)[:, None] - jnp.arange(h)[None, :] + (h - 1)
    idx_w = jnp.arange(w)[:, None] - jnp.arange(w)[None, :] + (w - 1)
    Rh = rel_h[idx_h]                      # [h, h, head_dim]
    Rw = rel_w[idx_w]                      # [w, w, head_dim]
    bh = jnp.einsum("bnhwc,hkc->bnhwk", q, Rh)     # [B,H,h,w,h']
    bw = jnp.einsum("bnhwc,wkc->bnhwk", q, Rw)     # [B,H,h,w,w']
    bias = bh[..., :, None] + bw[..., None, :]     # [B,H,h,w,h',w']
    return bias.reshape(-1, heads, h * w, h * w)


def _window_attention(x, prm, heads, h, w):
    """Multi-head self-attention with decomposed rel-pos on a [B, h*w, D]
    token grid."""
    b, n, d = x.shape
    head_dim = d // heads
    qkv = _apply_dense(x, prm["qkv"]).reshape(b, n, 3, heads, head_dim)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    attn = (q @ k.transpose(0, 1, 3, 2)) * (head_dim ** -0.5)
    # rel tables are sized for this block's window; interpolation happens
    # at conversion time, so shapes always match here.
    attn = attn + _rel_pos_bias(q, prm["rel_h"], prm["rel_w"],
                                h, w, heads, head_dim)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, d)
    return _apply_dense(out, prm["proj"])


def _encoder_block(x, prm, heads, window, grid):
    """x: [1, G, G, D]. Windowed (or global when window == grid) attention
    block with pre-LN residuals (SAM image_encoder.Block)."""
    g = x.shape[1]
    shortcut = x
    x = _apply_ln(x, prm["ln1"])
    if window < g:
        pad = (window - g % window) % window
        x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        gp = g + pad
        nw = gp // window
        xw = x.reshape(1, nw, window, nw, window, -1)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(
            nw * nw, window * window, -1)
        xw = _window_attention(xw, prm, heads, window, window)
        xw = xw.reshape(1, nw, nw, window, window, -1)
        x = xw.transpose(0, 1, 3, 2, 4, 5).reshape(1, gp, gp, -1)
        x = x[:, :g, :g]
    else:
        x = _window_attention(
            x.reshape(1, g * g, -1), prm, heads, g, g).reshape(1, g, g, -1)
    x = shortcut + x
    y = _apply_ln(x, prm["ln2"])
    y = _apply_dense(_gelu(_apply_dense(y, prm["mlp1"])), prm["mlp2"])
    return x + y


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_image(cfg: SamConfig, params, image: jnp.ndarray) -> jnp.ndarray:
    """image [img_size, img_size, 3] float32 (ImageNet-normalized) ->
    embedding [grid, grid, prompt_dim]."""
    enc = params["encoder"]
    x = jax.lax.conv_general_dilated(
        image[None], enc["patch"]["w"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + enc["patch"]["b"]
    x = x + enc["pos"][None]
    for i, blk in enumerate(enc["blocks"]):
        window = (cfg.grid if i in cfg.global_attn_indexes
                  else cfg.window_size)
        x = _encoder_block(x, blk, cfg.encoder_heads, window, cfg.grid)
    # neck: 1x1 conv -> LN -> 3x3 conv -> LN (channel-last layer norms)
    x = jax.lax.conv_general_dilated(
        x, enc["neck0"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _apply_ln(x, enc["neck_ln0"])
    x = jax.lax.conv_general_dilated(
        x, enc["neck1"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _apply_ln(x, enc["neck_ln1"])
    return x[0]


def _pe_encode(prompt, coords):
    """Random-Fourier positional encoding of [..., 2] coords in [0, 1]."""
    proj = (2.0 * coords - 1.0) @ prompt["pe_gauss"] * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def _attn(q, k, v, prm, heads):
    b, nq, _ = q.shape
    nk = k.shape[1]
    di = prm["q"]["w"].shape[1]
    hd = di // heads
    qh = _apply_dense(q, prm["q"]).reshape(b, nq, heads, hd).transpose(0, 2, 1, 3)
    kh = _apply_dense(k, prm["k"]).reshape(b, nk, heads, hd).transpose(0, 2, 1, 3)
    vh = _apply_dense(v, prm["v"]).reshape(b, nk, heads, hd).transpose(0, 2, 1, 3)
    a = jax.nn.softmax((qh @ kh.transpose(0, 1, 3, 2)) * hd ** -0.5, axis=-1)
    o = (a @ vh).transpose(0, 2, 1, 3).reshape(b, nq, di)
    return _apply_dense(o, prm["out"])


def _mlp3(x, prm, final_act=None):
    x = jax.nn.relu(_apply_dense(x, prm["l0"]))
    x = jax.nn.relu(_apply_dense(x, prm["l1"]))
    x = _apply_dense(x, prm["l2"])
    return final_act(x) if final_act else x


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_masks(cfg: SamConfig, params, image_embed: jnp.ndarray,
                 points: jnp.ndarray, labels: jnp.ndarray):
    """Batched single-point prompting.

    image_embed [G, G, P]; points [B, 1, 2] in [0,1] image coords; labels
    [B, 1] (1 positive). Returns (masks [B, 1+M, 4G, 4G] logits,
    iou_pred [B, 1+M])."""
    prompt, dec = params["prompt"], params["decoder"]
    g = image_embed.shape[0]
    p = cfg.prompt_dim
    b = points.shape[0]
    heads = cfg.decoder_heads

    # --- prompt tokens: encoded point + a padding "not a point" slot
    # (SAM pads single-point prompts, prompt_encoder._embed_points)
    pt = _pe_encode(prompt, points)            # [B, 1, P]
    pt = pt + jnp.where(labels[..., None] > 0,
                        prompt["point_embed"][1], prompt["point_embed"][0])
    pad = jnp.broadcast_to(prompt["not_a_point"], (b, 1, p))
    sparse = jnp.concatenate([pt, pad], axis=1)            # [B, 2, P]

    n_tok = 1 + cfg.num_multimask
    out_tokens = jnp.concatenate(
        [dec["iou_token"][None], dec["mask_tokens"]], axis=0)   # [1+4, P]
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens, (b,) + out_tokens.shape), sparse],
        axis=1)                                             # [B, 5+2, P]

    # --- image tokens + dense (no-mask) embedding + grid PE
    yy, xx = jnp.meshgrid(
        (jnp.arange(g) + 0.5) / g, (jnp.arange(g) + 0.5) / g, indexing="ij")
    img_pe = _pe_encode(prompt, jnp.stack([xx, yy], axis=-1)).reshape(
        1, g * g, p)
    src0 = (image_embed + prompt["no_mask"]).reshape(1, g * g, p)
    src = jnp.broadcast_to(src0, (b, g * g, p))
    pos_src = jnp.broadcast_to(img_pe, (b, g * g, p))

    q = tokens
    keys = src
    for li, lyr in enumerate(params["decoder"]["layers"]):
        # two-way block (SAM TwoWayAttentionBlock): token self-attn,
        # token->image cross, MLP, image->token cross. The token
        # embeddings double as the query positional encoding; layer 0
        # skips the PE add and the self-attn residual
        # (skip_first_layer_pe=True in SAM's TwoWayTransformer).
        # (transformer norms use torch nn.LayerNorm's default eps=1e-5;
        # the ViT encoder and LayerNorm2d necks use 1e-6)
        if li == 0:
            q = _attn(q, q, q, lyr["self_attn"], heads)
        else:
            qpe = q + tokens
            q = q + _attn(qpe, qpe, q, lyr["self_attn"], heads)
        q = _apply_ln(q, lyr["ln1"], eps=1e-5)
        a = _attn(q + tokens, keys + pos_src, keys, lyr["cross_t2i"], heads)
        q = _apply_ln(q + a, lyr["ln2"], eps=1e-5)
        m = _apply_dense(jax.nn.relu(_apply_dense(q, lyr["mlp1"])),
                         lyr["mlp2"])
        q = _apply_ln(q + m, lyr["ln3"], eps=1e-5)
        a = _attn(keys + pos_src, q + tokens, q, lyr["cross_i2t"], heads)
        keys = _apply_ln(keys + a, lyr["ln4"], eps=1e-5)

    a = _attn(q + tokens, keys + pos_src, keys, dec["final_t2i"], heads)
    q = _apply_ln(q + a, dec["ln_final"], eps=1e-5)

    iou_out = q[:, 0]
    mask_toks = q[:, 1:1 + n_tok]                          # [B, 4, P]

    # --- upscale image features 4x with two transposed convs
    feat = keys.reshape(b, g, g, p)
    feat = jax.lax.conv_transpose(
        feat, dec["up0"], (2, 2), "VALID", transpose_kernel=True,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + dec["up0_b"]
    feat = _gelu(_apply_ln(feat, dec["up_ln"]))
    feat = jax.lax.conv_transpose(
        feat, dec["up1"], (2, 2), "VALID", transpose_kernel=True,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + dec["up1_b"]
    feat = _gelu(feat)                               # [B, 4G, 4G, P/8]

    hyper = jnp.stack([_mlp3(mask_toks[:, i], dec["hyper"][i])
                       for i in range(n_tok)], axis=1)     # [B, 4, P/8]
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper, feat)      # [B, 4, 4G, 4G]
    iou_pred = _mlp3(iou_out, dec["iou_mlp"])              # [B, 4]
    return masks, iou_pred


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (gated on torch + the checkpoint file).
# ---------------------------------------------------------------------------

def convert_torch_checkpoint(path: str, cfg: SamConfig = VIT_H) -> dict:
    """Map the `sam_vit_h_4b8939.pth` state dict onto the param pytree.

    Import-gated: requires torch (CPU is fine). Linear weights transpose
    torch's [out, in] to [in, out]; convs go OIHW -> HWIO."""
    import torch

    sd = torch.load(path, map_location="cpu")
    t = {k: v.numpy() for k, v in sd.items()}

    def dense(prefix):
        return {"w": t[prefix + ".weight"].T, "b": t[prefix + ".bias"]}

    def ln(prefix):
        return {"scale": t[prefix + ".weight"], "bias": t[prefix + ".bias"]}

    def conv(name):  # OIHW -> HWIO
        return np.transpose(t[name], (2, 3, 1, 0))

    enc = "image_encoder."
    blocks = []
    for i in range(cfg.encoder_depth):
        b = f"{enc}blocks.{i}."
        blocks.append({
            "ln1": ln(b + "norm1"), "ln2": ln(b + "norm2"),
            "qkv": dense(b + "attn.qkv"), "proj": dense(b + "attn.proj"),
            "mlp1": dense(b + "mlp.lin1"), "mlp2": dense(b + "mlp.lin2"),
            "rel_h": t[b + "attn.rel_pos_h"],
            "rel_w": t[b + "attn.rel_pos_w"],
        })
    dec = "mask_decoder."
    tw = dec + "transformer.layers."

    def attn_p(prefix):
        return {"q": dense(prefix + ".q_proj"), "k": dense(prefix + ".k_proj"),
                "v": dense(prefix + ".v_proj"),
                "out": dense(prefix + ".out_proj")}

    layers = []
    for i in range(cfg.decoder_depth):
        b = f"{tw}{i}."
        layers.append({
            "self_attn": attn_p(b + "self_attn"), "ln1": ln(b + "norm1"),
            "cross_t2i": attn_p(b + "cross_attn_token_to_image"),
            "ln2": ln(b + "norm2"),
            "mlp1": dense(b + "mlp.lin1"), "mlp2": dense(b + "mlp.lin2"),
            "ln3": ln(b + "norm3"),
            "cross_i2t": attn_p(b + "cross_attn_image_to_token"),
            "ln4": ln(b + "norm4"),
        })
    n_tok = 1 + cfg.num_multimask
    params = {
        "encoder": {
            "patch": {"w": conv(enc + "patch_embed.proj.weight"),
                      "b": t[enc + "patch_embed.proj.bias"]},
            "pos": t[enc + "pos_embed"][0],
            "blocks": blocks,
            "neck0": conv(enc + "neck.0.weight"),
            "neck_ln0": {"scale": t[enc + "neck.1.weight"],
                         "bias": t[enc + "neck.1.bias"]},
            "neck1": conv(enc + "neck.2.weight"),
            "neck_ln1": {"scale": t[enc + "neck.3.weight"],
                         "bias": t[enc + "neck.3.bias"]},
        },
        "prompt": {
            "pe_gauss":
                t["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
            "point_embed": np.stack([
                t[f"prompt_encoder.point_embeddings.{i}.weight"][0]
                for i in range(4)]),
            "not_a_point": t["prompt_encoder.not_a_point_embed.weight"][0],
            "no_mask": t["prompt_encoder.no_mask_embed.weight"][0],
        },
        "decoder": {
            "iou_token": t[dec + "iou_token.weight"][0],
            "mask_tokens": t[dec + "mask_tokens.weight"],
            "layers": layers,
            "final_t2i": attn_p(dec + "transformer.final_attn_token_to_image"),
            "ln_final": ln(dec + "transformer.norm_final_attn"),
            # torch ConvTranspose2d [in, out, kh, kw] -> [kh, kw, out, in]
            # (the forward-conv HWIO layout transpose_kernel=True expects)
            "up0": np.transpose(t[dec + "output_upscaling.0.weight"],
                                (2, 3, 1, 0)),
            "up0_b": t[dec + "output_upscaling.0.bias"],
            "up_ln": {"scale": t[dec + "output_upscaling.1.weight"],
                      "bias": t[dec + "output_upscaling.1.bias"]},
            "up1": np.transpose(t[dec + "output_upscaling.3.weight"],
                                (2, 3, 1, 0)),
            "up1_b": t[dec + "output_upscaling.3.bias"],
            "hyper": [
                {"l0": dense(f"{dec}output_hypernetworks_mlps.{i}.layers.0"),
                 "l1": dense(f"{dec}output_hypernetworks_mlps.{i}.layers.1"),
                 "l2": dense(f"{dec}output_hypernetworks_mlps.{i}.layers.2")}
                for i in range(n_tok)],
            "iou_mlp": {
                "l0": dense(dec + "iou_prediction_head.layers.0"),
                "l1": dense(dec + "iou_prediction_head.layers.1"),
                "l2": dense(dec + "iou_prediction_head.layers.2")},
        },
    }
    return jax.tree_util.tree_map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Automatic 4-granularity mask generation (the langsplat contract).
# ---------------------------------------------------------------------------

_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def _box_from_mask(seg: np.ndarray):
    ys, xs = np.nonzero(seg)
    if len(xs) == 0:
        return [0, 0, 0, 0]
    x0, y0 = int(xs.min()), int(ys.min())
    return [x0, y0, int(xs.max()) - x0 + 1, int(ys.max()) - y0 + 1]


def _box_nms(boxes: np.ndarray, scores: np.ndarray, thr: float) -> list[int]:
    order = np.argsort(-scores)
    keep = []
    x0, y0 = boxes[:, 0], boxes[:, 1]
    x1, y1 = boxes[:, 0] + boxes[:, 2], boxes[:, 1] + boxes[:, 3]
    area = boxes[:, 2] * boxes[:, 3]
    while len(order):
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        iw = np.maximum(
            0, np.minimum(x1[i], x1[rest]) - np.maximum(x0[i], x0[rest]))
        ih = np.maximum(
            0, np.minimum(y1[i], y1[rest]) - np.maximum(y0[i], y0[rest]))
        inter = iw * ih
        iou = inter / np.maximum(area[i] + area[rest] - inter, 1)
        order = rest[iou <= thr]
    return keep


class JaxSamMaskGenerator:
    """Automatic mask generator over a point grid, returning the langsplat
    fork's 4-tuple (default, s, m, l) of mask-dict lists
    (reference preprocess.py:296-329 consumption contract)."""

    def __init__(self, params=None, cfg: SamConfig = VIT_H, *,
                 checkpoint: str | None = None,
                 points_per_side: int = 32,
                 points_per_batch: int = 64,
                 pred_iou_thresh: float = 0.7,
                 stability_score_thresh: float = 0.85,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7,
                 min_mask_region_area: int = 100):
        if params is None:
            assert checkpoint is not None, \
                "JaxSamMaskGenerator needs params or a torch checkpoint path"
            params = convert_torch_checkpoint(checkpoint, cfg)
        self.params = params
        self.cfg = cfg
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area

    def _preprocess(self, image: np.ndarray):
        import cv2

        h, w = image.shape[:2]
        s = self.cfg.img_size
        scale = s / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        x = (resized.astype(np.float32) - _PIXEL_MEAN) / _PIXEL_STD
        x = np.pad(x, ((0, s - nh), (0, s - nw), (0, 0)))
        return jnp.asarray(x), (nh, nw)

    def _mask_data(self, image: np.ndarray):
        h, w = image.shape[:2]
        x, (nh, nw) = self._preprocess(image)
        embed = encode_image(self.cfg, self.params, x)

        n = self.points_per_side
        gx = (np.arange(n) + 0.5) / n
        pts = np.stack(np.meshgrid(gx, gx, indexing="xy"), -1).reshape(-1, 2)
        # points cover the VALID (unpadded) region, in model-input coords
        pts = pts * np.array([nw / self.cfg.img_size,
                              nh / self.cfg.img_size], np.float32)

        per = {0: [], 1: [], 2: [], 3: []}    # mask-token index -> entries
        import cv2
        for s0 in range(0, len(pts), self.points_per_batch):
            batch = jnp.asarray(pts[s0:s0 + self.points_per_batch],
                                jnp.float32)[:, None, :]
            labels = jnp.ones((batch.shape[0], 1), jnp.float32)
            logits, iou = decode_masks(
                self.cfg, self.params, embed, batch, labels)
            logits = np.asarray(logits, np.float32)
            iou = np.asarray(iou, np.float32)
            # upscale model-resolution logits to the original image
            full = logits[
                :, :, : logits.shape[2] * nh // self.cfg.img_size,
                : logits.shape[3] * nw // self.cfg.img_size]
            for b in range(full.shape[0]):
                for tok in range(full.shape[1]):
                    lg = cv2.resize(full[b, tok], (w, h),
                                    interpolation=cv2.INTER_LINEAR)
                    thr = self.cfg.mask_threshold
                    seg = lg > thr
                    area = int(seg.sum())
                    if area < self.min_mask_region_area:
                        continue
                    if iou[b, tok] < self.pred_iou_thresh:
                        continue
                    off = self.stability_score_offset
                    hi = float((lg > thr + off).sum())
                    lo = float((lg > thr - off).sum())
                    stability = hi / max(lo, 1.0)
                    if stability < self.stability_score_thresh:
                        continue
                    per[tok].append({
                        "segmentation": seg,
                        "bbox": _box_from_mask(seg),
                        "predicted_iou": float(iou[b, tok]),
                        "stability_score": stability,
                        "_best": bool(tok == int(np.argmax(iou[b]))),
                    })
        return per

    def _nms(self, entries: list[dict]) -> list[dict]:
        if not entries:
            return []
        boxes = np.array([e["bbox"] for e in entries], np.float32)
        scores = np.array([e["predicted_iou"] for e in entries], np.float32)
        keep = _box_nms(boxes, scores, self.box_nms_thresh)
        out = []
        for i in keep:
            e = dict(entries[i])
            e.pop("_best", None)
            out.append(e)
        return out

    def generate(self, image: np.ndarray):
        per = self._mask_data(image)
        # multimask tokens 1..3 are SAM's subpart/part/whole granularities
        # -> the fork's s / m / l levels; "default" pools each prompt's
        # best-IoU mask (the single-mask selection rule).
        default = [e for tok in per.values() for e in tok if e.get("_best")]
        return (self._nms(default), self._nms(per[1]),
                self._nms(per[2]), self._nms(per[3]))

    __call__ = generate
