"""Tests for the Flax SAM port (preprocess/sam_jax.py) on a tiny
random-weight config — shapes, determinism, the 4-granularity generator
contract (reference preprocess.py:296-329), and torch checkpoint
conversion (gated on torch)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from langsplatv2_tpu.preprocess import sam_jax  # noqa: E402

CFG = sam_jax.VIT_TINY_TEST


@pytest.fixture(scope="module")
def params():
    return sam_jax.init_params(CFG, jax.random.PRNGKey(0))


def test_encode_image_shape(params):
    x = jnp.zeros((CFG.img_size, CFG.img_size, 3), jnp.float32)
    emb = sam_jax.encode_image(CFG, params, x)
    assert emb.shape == (CFG.grid, CFG.grid, CFG.prompt_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_decode_masks_shapes_and_determinism(params):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (CFG.img_size, CFG.img_size, 3)).astype(np.float32))
    emb = sam_jax.encode_image(CFG, params, x)
    pts = jnp.asarray([[[0.3, 0.4]], [[0.7, 0.2]]], jnp.float32)
    labels = jnp.ones((2, 1), jnp.float32)
    masks, iou = sam_jax.decode_masks(CFG, params, emb, pts, labels)
    n_tok = 1 + CFG.num_multimask
    assert masks.shape == (2, n_tok, 4 * CFG.grid, 4 * CFG.grid)
    assert iou.shape == (2, n_tok)
    m2, i2 = sam_jax.decode_masks(CFG, params, emb, pts, labels)
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(iou), np.asarray(i2))
    # different prompts must give different masks (the prompt actually
    # reaches the decoder)
    assert not np.allclose(np.asarray(masks[0]), np.asarray(masks[1]))


def test_generator_contract(params):
    rng = np.random.default_rng(1)
    img = (rng.uniform(0, 60, (48, 64, 3))).astype(np.uint8)
    img[10:30, 20:50] = [200, 180, 40]     # a bright object
    gen = sam_jax.JaxSamMaskGenerator(
        params, CFG, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        min_mask_region_area=1)
    levels = gen(img)
    assert isinstance(levels, tuple) and len(levels) == 4
    total = 0
    for masks in levels:
        for m in masks:
            assert m["segmentation"].shape == img.shape[:2]
            assert m["segmentation"].dtype == bool
            assert len(m["bbox"]) == 4
            assert "predicted_iou" in m and "stability_score" in m
            assert "_best" not in m
            total += 1
    assert total > 0


def test_box_nms_suppresses_duplicates():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [40, 40, 5, 5]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.5], np.float32)
    keep = sam_jax._box_nms(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_torch_checkpoint_conversion(tmp_path):
    torch = pytest.importorskip("torch")
    cfg = CFG
    d, p = cfg.encoder_dim, cfg.prompt_dim
    n_tok = 1 + cfg.num_multimask
    sd = {}

    def dense(prefix, din, dout):
        sd[prefix + ".weight"] = torch.randn(dout, din) * 0.02
        sd[prefix + ".bias"] = torch.zeros(dout)

    def ln(prefix, dim):
        sd[prefix + ".weight"] = torch.ones(dim)
        sd[prefix + ".bias"] = torch.zeros(dim)

    enc = "image_encoder."
    sd[enc + "patch_embed.proj.weight"] = torch.randn(
        d, 3, cfg.patch_size, cfg.patch_size) * 0.02
    sd[enc + "patch_embed.proj.bias"] = torch.zeros(d)
    sd[enc + "pos_embed"] = torch.randn(1, cfg.grid, cfg.grid, d) * 0.02
    for i in range(cfg.encoder_depth):
        b = f"{enc}blocks.{i}."
        ln(b + "norm1", d)
        ln(b + "norm2", d)
        dense(b + "attn.qkv", d, 3 * d)
        dense(b + "attn.proj", d, d)
        dense(b + "mlp.lin1", d, 4 * d)
        dense(b + "mlp.lin2", 4 * d, d)
        wr = cfg.window_size if i not in cfg.global_attn_indexes else cfg.grid
        hd = d // cfg.encoder_heads
        sd[b + "attn.rel_pos_h"] = torch.randn(2 * wr - 1, hd) * 0.02
        sd[b + "attn.rel_pos_w"] = torch.randn(2 * wr - 1, hd) * 0.02
    sd[enc + "neck.0.weight"] = torch.randn(p, d, 1, 1) * 0.02
    sd[enc + "neck.1.weight"] = torch.ones(p)
    sd[enc + "neck.1.bias"] = torch.zeros(p)
    sd[enc + "neck.2.weight"] = torch.randn(p, p, 3, 3) * 0.02
    sd[enc + "neck.3.weight"] = torch.ones(p)
    sd[enc + "neck.3.bias"] = torch.zeros(p)

    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = \
        torch.randn(2, p // 2)
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = torch.randn(1, p)
    sd["prompt_encoder.not_a_point_embed.weight"] = torch.randn(1, p)
    sd["prompt_encoder.no_mask_embed.weight"] = torch.randn(1, p)

    dec = "mask_decoder."
    sd[dec + "iou_token.weight"] = torch.randn(1, p)
    sd[dec + "mask_tokens.weight"] = torch.randn(n_tok, p)
    for i in range(cfg.decoder_depth):
        b = f"{dec}transformer.layers.{i}."
        for a in ("self_attn", "cross_attn_token_to_image",
                  "cross_attn_image_to_token"):
            di = p if a == "self_attn" else p // 2
            dense(b + a + ".q_proj", p, di)
            dense(b + a + ".k_proj", p, di)
            dense(b + a + ".v_proj", p, di)
            dense(b + a + ".out_proj", di, p)
        for j in range(1, 5):
            ln(b + f"norm{j}", p)
        dense(b + "mlp.lin1", p, cfg.decoder_mlp_dim)
        dense(b + "mlp.lin2", cfg.decoder_mlp_dim, p)
    for a, di in (("final_attn_token_to_image", p // 2),):
        dense(f"{dec}transformer.{a}.q_proj", p, di)
        dense(f"{dec}transformer.{a}.k_proj", p, di)
        dense(f"{dec}transformer.{a}.v_proj", p, di)
        dense(f"{dec}transformer.{a}.out_proj", di, p)
    ln(dec + "transformer.norm_final_attn", p)
    sd[dec + "output_upscaling.0.weight"] = torch.randn(p, p // 4, 2, 2)
    sd[dec + "output_upscaling.0.bias"] = torch.zeros(p // 4)
    sd[dec + "output_upscaling.1.weight"] = torch.ones(p // 4)
    sd[dec + "output_upscaling.1.bias"] = torch.zeros(p // 4)
    sd[dec + "output_upscaling.3.weight"] = torch.randn(p // 4, p // 8, 2, 2)
    sd[dec + "output_upscaling.3.bias"] = torch.zeros(p // 8)
    for i in range(n_tok):
        b = f"{dec}output_hypernetworks_mlps.{i}.layers."
        dense(b + "0", p, p)
        dense(b + "1", p, p)
        dense(b + "2", p, p // 8)
    dense(dec + "iou_prediction_head.layers.0", p, p)
    dense(dec + "iou_prediction_head.layers.1", p, p)
    dense(dec + "iou_prediction_head.layers.2", p, n_tok)

    path = str(tmp_path / "tiny_sam.pth")
    torch.save(sd, path)
    params = sam_jax.convert_torch_checkpoint(path, cfg)
    x = jnp.zeros((cfg.img_size, cfg.img_size, 3), jnp.float32)
    emb = sam_jax.encode_image(cfg, params, x)
    masks, iou = sam_jax.decode_masks(
        cfg, params, emb, jnp.asarray([[[0.5, 0.5]]], jnp.float32),
        jnp.ones((1, 1), jnp.float32))
    assert np.isfinite(np.asarray(masks)).all()
    assert np.isfinite(np.asarray(iou)).all()
