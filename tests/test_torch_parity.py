"""Torch↔JAX converter parity (VERDICT round-3 item #4).

The SAM and LPIPS checkpoint converters had only ever been exercised on
random JAX pytrees; torch (cpu) IS available here, so these tests pin the
mapping end-to-end: build torch nn.Modules structured EXACTLY like the
upstream models (segment_anything module tree / torchvision .features
layout / lpipsPyTorch heads) so that state_dict() emits the authentic key
schema by construction, run the official torch forward semantics, convert
the state dict, and assert the JAX forward reproduces the torch output.

Covers: key naming (a schema mismatch KeyErrors in the converter), weight
orientation (torch [out,in] linear vs JAX [in,out]; OIHW vs HWIO convs;
ConvTranspose2d [in,out,kh,kw]), and layer semantics (erf-GELU, LN eps,
decomposed rel-pos attention, two-way transformer wiring, window
partition, LPIPS normalize/taps).

Reference call sites: preprocess.py:351,362-372 (SAM ViT-H),
lpipsPyTorch/modules/{lpips,networks,utils}.py (vendored LPIPS).
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from langsplatv2_tpu.preprocess import sam_jax
from langsplatv2_tpu.preprocess.sam_jax import (
    VIT_TINY_TEST, convert_torch_checkpoint, decode_masks, encode_image)
from langsplatv2_tpu.eval import lpips as lpips_jax

CFG = VIT_TINY_TEST


# ---------------------------------------------------------------------------
# Mini torch SAM — module tree mirrors segment_anything exactly so
# state_dict() keys match the real sam_vit_h_4b8939.pth schema.
# ---------------------------------------------------------------------------

class LayerNorm2d(nn.Module):
    """segment_anything.modeling.common.LayerNorm2d (channel-dim LN on
    NCHW, eps 1e-6)."""

    def __init__(self, ch, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(ch))
        self.bias = nn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class MLPBlock(nn.Module):
    def __init__(self, dim, mlp_dim, act):
        super().__init__()
        self.lin1 = nn.Linear(dim, mlp_dim)
        self.lin2 = nn.Linear(mlp_dim, dim)
        self.act = act()

    def forward(self, x):
        return self.lin2(self.act(self.lin1(x)))


def window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // ws, ws, wp // ws, ws, c)
    win = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, c)
    return win, (hp, wp)


def window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.view(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, hp, wp, -1)
    return x[:, :h, :w, :].contiguous()


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size):
    q_h, q_w = q_size
    k_h, k_w = k_size
    # equal q/k sizes: index tables by coordinate delta + (size - 1)
    idx_h = torch.arange(q_h)[:, None] - torch.arange(k_h)[None] + k_h - 1
    idx_w = torch.arange(q_w)[:, None] - torch.arange(k_w)[None] + k_w - 1
    Rh = rel_pos_h[idx_h]
    Rw = rel_pos_w[idx_w]
    b, _, dim = q.shape
    r_q = q.reshape(b, q_h, q_w, dim)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = (attn.view(b, q_h, q_w, k_h, k_w) + rel_h[:, :, :, :, None]
            + rel_w[:, :, :, None, :]).view(b, q_h * q_w, k_h * k_w)
    return attn


class EncAttention(nn.Module):
    """segment_anything image_encoder.Attention (decomposed rel-pos)."""

    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        hd = dim // heads
        self.rel_pos_h = nn.Parameter(torch.zeros(2 * input_size - 1, hd))
        self.rel_pos_w = nn.Parameter(torch.zeros(2 * input_size - 1, hd))

    def forward(self, x):
        b, h, w, _ = x.shape
        qkv = self.qkv(x).reshape(
            b, h * w, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, b * self.num_heads, h * w, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = add_decomposed_rel_pos(
            attn, q, self.rel_pos_h, self.rel_pos_w, (h, w), (h, w))
        attn = attn.softmax(dim=-1)
        x = (attn @ v).view(b, self.num_heads, h, w, -1).permute(
            0, 2, 3, 1, 4).reshape(b, h, w, -1)
        return self.proj(x)


class EncBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio, window_size, input_size):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = EncAttention(
            dim, heads, window_size if window_size > 0 else input_size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MLPBlock(dim, int(dim * mlp_ratio), nn.GELU)
        self.window_size = window_size

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class PatchEmbed(nn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    def forward(self, x):
        return self.proj(x).permute(0, 2, 3, 1)


class ImageEncoderViT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        g, d = cfg.grid, cfg.encoder_dim
        self.patch_embed = PatchEmbed(cfg.patch_size, d)
        self.pos_embed = nn.Parameter(torch.zeros(1, g, g, d))
        self.blocks = nn.ModuleList([
            EncBlock(d, cfg.encoder_heads, 4.0,
                     0 if i in cfg.global_attn_indexes else cfg.window_size,
                     g)
            for i in range(cfg.encoder_depth)])
        self.neck = nn.Sequential(
            nn.Conv2d(d, cfg.prompt_dim, 1, bias=False),
            LayerNorm2d(cfg.prompt_dim),
            nn.Conv2d(cfg.prompt_dim, cfg.prompt_dim, 3, padding=1,
                      bias=False),
            LayerNorm2d(cfg.prompt_dim))

    def forward(self, x):
        x = self.patch_embed(x) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


class PositionEmbeddingRandom(nn.Module):
    def __init__(self, num_pos_feats):
        super().__init__()
        self.register_buffer(
            "positional_encoding_gaussian_matrix",
            torch.randn(2, num_pos_feats))

    def encode(self, coords):       # [..., 2] in [0, 1]
        coords = 2 * coords - 1
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2 * math.pi * coords
        return torch.cat([torch.sin(coords), torch.cos(coords)], dim=-1)


class PromptEncoder(nn.Module):
    def __init__(self, p):
        super().__init__()
        self.pe_layer = PositionEmbeddingRandom(p // 2)
        self.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, p) for _ in range(4)])
        self.not_a_point_embed = nn.Embedding(1, p)
        self.no_mask_embed = nn.Embedding(1, p)
        # mask-prompt downscaler: unused by the converter but part of the
        # real checkpoint schema — present to prove extra keys are ignored.
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, 4, 2, 2), LayerNorm2d(4), nn.GELU(),
            nn.Conv2d(4, 16, 2, 2), LayerNorm2d(16), nn.GELU(),
            nn.Conv2d(16, p, 1))


class DecAttention(nn.Module):
    """segment_anything transformer.Attention (optional downsample)."""

    def __init__(self, dim, heads, downsample_rate=1):
        super().__init__()
        self.internal_dim = dim // downsample_rate
        self.num_heads = heads
        self.q_proj = nn.Linear(dim, self.internal_dim)
        self.k_proj = nn.Linear(dim, self.internal_dim)
        self.v_proj = nn.Linear(dim, self.internal_dim)
        self.out_proj = nn.Linear(self.internal_dim, dim)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        b, n, c = q.shape
        nh = self.num_heads

        def split(x):
            return x.reshape(b, x.shape[1], nh, c // nh).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        attn = (q @ k.permute(0, 1, 3, 2)) / math.sqrt(c // nh)
        attn = torch.softmax(attn, dim=-1)
        out = (attn @ v).transpose(1, 2).flatten(2)
        return self.out_proj(out)


class TwoWayAttentionBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_first_layer_pe):
        super().__init__()
        self.self_attn = DecAttention(dim, heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn_token_to_image = DecAttention(dim, heads, 2)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLPBlock(dim, mlp_dim, nn.ReLU)
        self.norm3 = nn.LayerNorm(dim)
        self.norm4 = nn.LayerNorm(dim)
        self.cross_attn_image_to_token = DecAttention(dim, heads, 2)
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(queries + self.mlp(queries))
        q = queries + query_pe
        k = keys + key_pe
        keys = self.norm4(
            keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TwoWayTransformer(nn.Module):
    def __init__(self, depth, dim, heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList([
            TwoWayAttentionBlock(dim, heads, mlp_dim, i == 0)
            for i in range(depth)])
        self.final_attn_token_to_image = DecAttention(dim, heads, 2)
        self.norm_final_attn = nn.LayerNorm(dim)

    def forward(self, image_embedding, image_pe, point_embedding):
        # image_embedding/image_pe: [B, C, H, W] -> [B, HW, C]
        src = image_embedding.flatten(2).permute(0, 2, 1)
        pos = image_pe.flatten(2).permute(0, 2, 1)
        queries, keys = point_embedding, src
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, pos)
        q = queries + point_embedding
        k = keys + pos
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class MLP3(nn.Module):
    def __init__(self, d_in, hidden, d_out):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(d_in, hidden), nn.Linear(hidden, hidden),
             nn.Linear(hidden, d_out)])

    def forward(self, x):
        x = F.relu(self.layers[0](x))
        x = F.relu(self.layers[1](x))
        return self.layers[2](x)


class MaskDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        p = cfg.prompt_dim
        n_tok = 1 + cfg.num_multimask
        self.transformer = TwoWayTransformer(
            cfg.decoder_depth, p, cfg.decoder_heads, cfg.decoder_mlp_dim)
        self.iou_token = nn.Embedding(1, p)
        self.mask_tokens = nn.Embedding(n_tok, p)
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(p, p // 4, 2, stride=2),
            LayerNorm2d(p // 4), nn.GELU(),
            nn.ConvTranspose2d(p // 4, p // 8, 2, stride=2), nn.GELU())
        self.output_hypernetworks_mlps = nn.ModuleList(
            [MLP3(p, p, p // 8) for _ in range(n_tok)])
        self.iou_prediction_head = MLP3(p, p, n_tok)

    def predict_masks(self, image_embeddings, image_pe, sparse):
        out_tok = torch.cat(
            [self.iou_token.weight, self.mask_tokens.weight], dim=0)
        out_tok = out_tok.unsqueeze(0).expand(sparse.shape[0], -1, -1)
        tokens = torch.cat((out_tok, sparse), dim=1)
        src = image_embeddings.expand(tokens.shape[0], -1, -1, -1)
        pos_src = image_pe.expand(tokens.shape[0], -1, -1, -1)
        b, c, h, w = src.shape
        hs, src = self.transformer(src, pos_src, tokens)
        iou_tok = hs[:, 0, :]
        n_tok = self.mask_tokens.num_embeddings
        mask_toks = hs[:, 1:1 + n_tok, :]
        src = src.transpose(1, 2).view(b, c, h, w)
        upscaled = self.output_upscaling(src)
        hyper = torch.stack([
            self.output_hypernetworks_mlps[i](mask_toks[:, i, :])
            for i in range(n_tok)], dim=1)
        b, c2, h2, w2 = upscaled.shape
        masks = (hyper @ upscaled.view(b, c2, h2 * w2)).view(b, -1, h2, w2)
        return masks, self.iou_prediction_head(iou_tok)


class MiniSam(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        torch.manual_seed(0)
        self.image_encoder = ImageEncoderViT(cfg)
        self.prompt_encoder = PromptEncoder(cfg.prompt_dim)
        self.mask_decoder = MaskDecoder(cfg)
        # real checkpoints have trained (non-degenerate) weights everywhere;
        # randomize every parameter so orientation bugs can't hide behind
        # zeros/identity initializers.
        with torch.no_grad():
            for prm in self.parameters():
                prm.copy_(torch.randn_like(prm) * 0.05)


def torch_sam_forward(model: MiniSam, cfg, image_np, points_np, labels_np):
    """Official SAM forward on [0,1]-normalized point coords (the JAX
    decode_masks convention)."""
    model.eval()
    with torch.no_grad():
        img = torch.from_numpy(image_np).permute(2, 0, 1)[None]
        embed = model.image_encoder(img)                 # [1, P, G, G]

        pe = model.prompt_encoder
        pts = torch.from_numpy(points_np)                # [B, 1, 2]
        lbl = torch.from_numpy(labels_np)                # [B, 1]
        pt = pe.pe_layer.encode(pts)
        pt = pt + torch.where(
            (lbl[..., None] > 0), pe.point_embeddings[1].weight[0],
            pe.point_embeddings[0].weight[0])
        pad = pe.not_a_point_embed.weight[0].expand(
            pts.shape[0], 1, -1)
        sparse = torch.cat([pt, pad], dim=1)

        g = embed.shape[-1]
        ar = (torch.arange(g, dtype=torch.float32) + 0.5) / g
        yy, xx = torch.meshgrid(ar, ar, indexing="ij")
        img_pe = pe.pe_layer.encode(torch.stack([xx, yy], dim=-1))
        img_pe = img_pe.permute(2, 0, 1)[None]           # [1, P, G, G]
        dense = pe.no_mask_embed.weight[0][None, :, None, None]

        masks, iou = model.mask_decoder.predict_masks(
            embed + dense, img_pe, sparse)
    return (embed[0].permute(1, 2, 0).numpy(), masks.numpy(), iou.numpy())


class TestSamTorchParity:
    @pytest.fixture(scope="class")
    def converted(self, tmp_path_factory):
        model = MiniSam(CFG)
        path = tmp_path_factory.mktemp("sam") / "mini_sam.pth"
        torch.save(model.state_dict(), str(path))
        params = convert_torch_checkpoint(str(path), CFG)
        return model, params

    def test_state_dict_schema_covers_converter(self, converted):
        model, params = converted
        # every leaf landed (shapes transposed where expected)
        enc = params["encoder"]
        d, p, g = CFG.encoder_dim, CFG.prompt_dim, CFG.grid
        assert enc["patch"]["w"].shape == (CFG.patch_size, CFG.patch_size,
                                           3, d)
        assert enc["pos"].shape == (g, g, d)
        assert enc["neck0"].shape == (1, 1, d, p)
        assert params["decoder"]["up0"].shape == (2, 2, p // 4, p)
        assert params["decoder"]["layers"][0]["cross_t2i"]["q"]["w"].shape \
            == (p, p // 2)

    def test_encoder_matches_torch(self, converted):
        model, params = converted
        rng = np.random.default_rng(1)
        img = rng.standard_normal(
            (CFG.img_size, CFG.img_size, 3)).astype(np.float32)
        emb_t, _, _ = torch_sam_forward(
            model, CFG, img, np.zeros((1, 1, 2), np.float32),
            np.ones((1, 1), np.float32))
        emb_j = np.asarray(encode_image(CFG, params, jnp.asarray(img)))
        np.testing.assert_allclose(emb_j, emb_t, atol=2e-5, rtol=1e-4)

    def test_decoder_matches_torch(self, converted):
        model, params = converted
        rng = np.random.default_rng(2)
        img = rng.standard_normal(
            (CFG.img_size, CFG.img_size, 3)).astype(np.float32)
        pts = rng.uniform(0.1, 0.9, (3, 1, 2)).astype(np.float32)
        lbl = np.ones((3, 1), np.float32)
        _, masks_t, iou_t = torch_sam_forward(model, CFG, img, pts, lbl)
        emb_j = encode_image(CFG, params, jnp.asarray(img))
        masks_j, iou_j = decode_masks(
            CFG, params, emb_j, jnp.asarray(pts), jnp.asarray(lbl))
        np.testing.assert_allclose(np.asarray(iou_j), iou_t, atol=2e-5,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(masks_j), masks_t, atol=5e-5,
                                   rtol=1e-4)

    def test_negative_label_uses_embedding_zero(self, converted):
        model, params = converted
        rng = np.random.default_rng(3)
        img = rng.standard_normal(
            (CFG.img_size, CFG.img_size, 3)).astype(np.float32)
        pts = rng.uniform(0.2, 0.8, (2, 1, 2)).astype(np.float32)
        lbl = np.zeros((2, 1), np.float32)
        _, masks_t, iou_t = torch_sam_forward(model, CFG, img, pts, lbl)
        emb_j = encode_image(CFG, params, jnp.asarray(img))
        masks_j, iou_j = decode_masks(
            CFG, params, emb_j, jnp.asarray(pts), jnp.asarray(lbl))
        np.testing.assert_allclose(np.asarray(masks_j), masks_t, atol=5e-5,
                                   rtol=1e-4)


# ---------------------------------------------------------------------------
# LPIPS: torchvision .features layout + lpipsPyTorch heads and math.
# ---------------------------------------------------------------------------

def _tv_vgg16_features():
    """torchvision vgg16().features module layout (indices 0..30)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    return nn.Sequential(*layers)


def _tv_alexnet_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(), nn.MaxPool2d(3, 2))


_TAP_RELU = {"vgg": [3, 8, 15, 22, 29], "alex": [1, 4, 7, 9, 11]}
_TAP_CH = {"vgg": [64, 128, 256, 512, 512],
           "alex": [64, 192, 384, 256, 256]}


def torch_lpips_ref(features, heads, x0, x1, net):
    """lpipsPyTorch/modules math verbatim: scaling layer, tapped features,
    unit-normalize (x / (||x|| + 1e-10)), squared diff, 1x1 linear heads,
    spatial mean, sum over taps."""
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def prep(x):
        return (2 * x - 1 - shift) / scale

    def taps(x):
        outs = []
        for i, m in enumerate(features):
            x = m(x)
            if i in _TAP_RELU[net]:
                outs.append(x)
        return outs

    with torch.no_grad():
        f0, f1 = taps(prep(x0)), taps(prep(x1))
        total = torch.zeros(x0.shape[0])
        for (a, b), h in zip(zip(f0, f1), heads):
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb) ** 2
            lin = F.conv2d(d, h)                 # [N, 1, H, W]
            total = total + lin.mean(dim=(1, 2, 3))
    return total.numpy()


class TestLpipsTorchParity:
    @pytest.mark.parametrize("net", ["vgg", "alex"])
    def test_matches_torch(self, net):
        torch.manual_seed(4)
        feats = (_tv_vgg16_features() if net == "vgg"
                 else _tv_alexnet_features())
        with torch.no_grad():
            for prm in feats.parameters():
                prm.copy_(torch.randn_like(prm)
                          * (2.0 / math.sqrt(prm.numel() / prm.shape[0])))
        heads = [torch.rand(1, c, 1, 1) * 0.1 for c in _TAP_CH[net]]
        heads_state = {f"lins.{i}.model.1.weight": h
                       for i, h in enumerate(heads)}
        params = lpips_jax.load_torch_state_dict(
            feats.state_dict(), heads_state, net=net)

        rng = np.random.default_rng(5)
        x0 = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
        x1 = np.clip(x0 + rng.normal(0, 0.1, x0.shape), 0, 1
                     ).astype(np.float32)
        ref = torch_lpips_ref(feats, heads,
                              torch.from_numpy(x0), torch.from_numpy(x1),
                              net)
        got = np.asarray(lpips_jax.lpips(
            params, jnp.asarray(x0), jnp.asarray(x1), net=net))
        assert ref.shape == got.shape == (2,)
        assert float(ref.min()) > 0.0
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    def test_alt_head_key_form(self):
        """lpips also publishes heads as lin{i}.model.1.weight — the loader
        accepts both."""
        feats = _tv_alexnet_features()
        heads_state = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
                       for i, c in enumerate(_TAP_CH["alex"])}
        params = lpips_jax.load_torch_state_dict(
            feats.state_dict(), heads_state, net="alex")
        assert len(params["heads"]) == 5
        assert params["heads"][1].shape == (192,)
