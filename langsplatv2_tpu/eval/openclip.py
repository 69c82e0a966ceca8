"""OpenCLIP text/image encoding + relevancy maps, TPU-native.

Parity target: reference `eval/openclip_encoder.py` — the same canonical
negative phrases, pairwise softmax(10*[pos, neg]) relevancy with
min-over-negatives, `get_max_across` / vectorized `get_max_across_quick`,
and `get_semantic_map`. The relevancy math runs in JAX (batched einsums on
the MXU).

Backends: text/image encoding is pluggable because this environment cannot
download CLIP weights (zero egress) and open_clip is not installed:

- ``OpenClipBackend``    — the real ViT-B-16 laion2b_s34b_b88k when
                           open_clip + weights are present,
- ``TransformersBackend``— HF CLIP when transformers weights are cached,
- ``HashBackend``        — deterministic pseudo-embeddings (unit-norm,
                           stable across processes) for tests and offline
                           smoke runs; NOT semantically meaningful.

`OpenCLIPNetwork(backend="auto")` picks the first one that works.
"""
from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

CLIP_DIM = 512
CANONICAL_NEGATIVES = ("object", "things", "stuff", "texture")


# ---------------------------------------------------------------------------
# Encoding backends
# ---------------------------------------------------------------------------

class HashBackend:
    """Deterministic unit-norm pseudo-embeddings from a SHA-256 of the text.
    Semantically meaningless but stable — two runs agree, identical prompts
    collide, distinct prompts are near-orthogonal in 512-d."""

    name = "hash"

    def encode_text(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), CLIP_DIM), np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little")
            v = np.random.default_rng(seed).standard_normal(CLIP_DIM)
            out[i] = v / np.linalg.norm(v)
        return out

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        flat = images.reshape(images.shape[0], -1)
        out = np.empty((len(flat), CLIP_DIM), np.float32)
        for i, row in enumerate(flat):
            seed = int.from_bytes(
                hashlib.sha256(row.tobytes()).digest()[:8], "little")
            v = np.random.default_rng(seed).standard_normal(CLIP_DIM)
            out[i] = v / np.linalg.norm(v)
        return out


class OpenClipBackend:
    """Real OpenCLIP ViT-B-16 (reference preprocess.py:28-30). Raises
    ImportError/OSError when open_clip or weights are unavailable."""

    name = "open_clip"

    def __init__(self, model_type="ViT-B-16", pretrained="laion2b_s34b_b88k"):
        import open_clip  # noqa — optional dependency
        import torch

        self._torch = torch
        model, _, _ = open_clip.create_model_and_transforms(
            model_type, pretrained=pretrained)
        model.eval()
        self.model = model
        self.tokenizer = open_clip.get_tokenizer(model_type)

    def encode_text(self, texts: list[str]) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            tok = torch.cat([self.tokenizer(p) for p in texts])
            return self.model.encode_text(tok).float().cpu().numpy()

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        torch = self._torch
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        x = (images - mean[:, None, None]) / std[:, None, None]
        with torch.no_grad():
            return self.model.encode_image(
                torch.from_numpy(x)).float().cpu().numpy()


class TransformersBackend:
    """HF CLIP (laion/CLIP-ViT-B-16-laion2B-s34b-b88k) via transformers."""

    name = "transformers"

    def __init__(self, model_id="laion/CLIP-ViT-B-16-laion2B-s34b-b88k"):
        from transformers import CLIPModel, CLIPProcessor  # noqa

        self.model = CLIPModel.from_pretrained(model_id,
                                               local_files_only=True)
        self.processor = CLIPProcessor.from_pretrained(model_id,
                                                       local_files_only=True)

    def encode_text(self, texts: list[str]) -> np.ndarray:
        import torch

        inputs = self.processor(text=texts, return_tensors="pt", padding=True)
        with torch.no_grad():
            return self.model.get_text_features(**inputs).cpu().numpy()

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        import torch

        inputs = self.processor(
            images=[im.transpose(1, 2, 0) for im in images], return_tensors="pt")
        with torch.no_grad():
            return self.model.get_image_features(**inputs).cpu().numpy()


class FlaxClipBackend:
    """HF Flax CLIP — the encoder itself runs through JAX/XLA on the TPU
    (the reference runs OpenCLIP on the training GPU, preprocess.py:28-30;
    this is the TPU-native equivalent for eval/serving-time text and crop
    encoding). Weights come from the same laion checkpoint, converted from
    the torch state dict on first load (`from_pt=True`); raises when the
    checkpoint is not present in the local HF cache (zero-egress
    environments fall back like the other real backends)."""

    name = "flax"

    def __init__(self, model_id="laion/CLIP-ViT-B-16-laion2B-s34b-b88k"):
        from transformers import CLIPProcessor, FlaxCLIPModel  # noqa

        # local_files_only: fail instantly when the checkpoint is not in
        # the local HF cache instead of burning minutes of network retries
        # (zero-egress environments).
        self.model = FlaxCLIPModel.from_pretrained(
            model_id, from_pt=True, local_files_only=True)
        self.processor = CLIPProcessor.from_pretrained(
            model_id, local_files_only=True)

    def encode_text(self, texts: list[str]) -> np.ndarray:
        inputs = self.processor(text=texts, return_tensors="np", padding=True)
        return np.asarray(self.model.get_text_features(**inputs))

    def encode_image(self, images: np.ndarray) -> np.ndarray:
        inputs = self.processor(
            images=[im.transpose(1, 2, 0) for im in images],
            return_tensors="np")
        return np.asarray(self.model.get_image_features(**inputs))


def make_backend(name: str = "auto"):
    if name == "hash":
        return HashBackend()
    if name == "open_clip":
        return OpenClipBackend()
    if name == "transformers":
        return TransformersBackend()
    if name == "flax":
        return FlaxClipBackend()
    assert name == "auto", name
    for cls in (FlaxClipBackend, OpenClipBackend, TransformersBackend):
        try:
            return cls()
        except Exception:
            continue
    return HashBackend()


# ---------------------------------------------------------------------------
# Relevancy network
# ---------------------------------------------------------------------------

class OpenCLIPNetwork:
    def __init__(self, backend: str = "auto"):
        self.backend = make_backend(backend)
        self.negatives = CANONICAL_NEGATIVES
        self.positives: tuple[str, ...] = (" ",)
        self.neg_embeds = self._embed(list(self.negatives))
        self.pos_embeds = self._embed(list(self.positives))
        self.semantic_embeds = None

    def _embed(self, texts: list[str]) -> jnp.ndarray:
        e = jnp.asarray(self.backend.encode_text(texts), jnp.float32)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    def encode_text(self, texts: list[str]) -> jnp.ndarray:
        return jnp.asarray(self.backend.encode_text(texts), jnp.float32)

    def encode_image(self, images: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.backend.encode_image(images), jnp.float32)

    def set_positives(self, texts: list[str]) -> None:
        self.positives = tuple(texts)
        self.pos_embeds = self._embed(list(texts))

    def set_semantics(self, texts: list[str]) -> None:
        self.semantic_labels = tuple(texts)
        self.semantic_embeds = self._embed(list(texts))

    def get_relevancy(self, embed: jnp.ndarray, positive_id: int) -> jnp.ndarray:
        """embed [M, 512] -> [M, 2] pairwise softmax probs for the hardest
        negative (reference openclip_encoder.py:41-56)."""
        phrases = jnp.concatenate([self.pos_embeds, self.neg_embeds], axis=0)
        output = embed @ phrases.T                           # [M, P+N]
        pos = output[:, positive_id:positive_id + 1]         # [M, 1]
        neg = output[:, len(self.positives):]                # [M, N]
        sims = jnp.stack(
            [jnp.broadcast_to(pos, neg.shape), neg], axis=-1)  # [M, N, 2]
        softmax = jax.nn.softmax(10.0 * sims, axis=-1)
        best = jnp.argmin(softmax[..., 0], axis=1)           # hardest negative
        return jnp.take_along_axis(
            softmax, best[:, None, None], axis=1)[:, 0, :]   # [M, 2]

    def get_max_across(self, sem_map: jnp.ndarray) -> jnp.ndarray:
        """sem_map [levels, H, W, 512] -> relevancy [levels, phrases, H, W]
        via the per-phrase loop (reference get_max_across)."""
        n_levels, h, w, _ = sem_map.shape
        rows = []
        for i in range(n_levels):
            flat = sem_map[i].reshape(h * w, -1)
            phr = [self.get_relevancy(flat, j)[:, 0] for j in range(len(self.positives))]
            rows.append(jnp.stack(phr))
        return jnp.stack(rows).reshape(n_levels, len(self.positives), h, w)

    def get_max_across_quick(self, sem_map: jnp.ndarray) -> jnp.ndarray:
        """Vectorized [levels, H*W, P, N, 2] relevancy
        (reference get_max_across_quick)."""
        n_levels, h, w, c = sem_map.shape
        n_phr, n_neg = len(self.positives), len(self.negatives)
        flat = sem_map.reshape(n_levels, h * w, c)
        phrases = jnp.concatenate([self.pos_embeds, self.neg_embeds], axis=0)
        sim = jnp.einsum("nqc,pc->nqp", flat, phrases)
        pos = sim[..., :n_phr]                                # [L, HW, P]
        neg = sim[..., n_phr:]                                # [L, HW, N]
        sims = jnp.stack([
            jnp.broadcast_to(pos[..., None], pos.shape + (n_neg,)),
            jnp.broadcast_to(neg[:, :, None, :], pos.shape + (n_neg,)),
        ], axis=-1)                                           # [L, HW, P, N, 2]
        softmax = jax.nn.softmax(10.0 * sims, axis=-1)
        min_pos = softmax[..., 0].min(axis=-1)                # [L, HW, P]
        return jnp.transpose(min_pos, (0, 2, 1)).reshape(n_levels, n_phr, h, w)

    def get_semantic_map(self, sem_map: jnp.ndarray) -> jnp.ndarray:
        """Argmax semantic labeling; >= num_positives (i.e. a negative wins)
        becomes -1 (reference get_semantic_map)."""
        assert self.semantic_embeds is not None
        n_levels, h, w, c = sem_map.shape
        pos_num = self.semantic_embeds.shape[0]
        phrases = jnp.concatenate([self.semantic_embeds, self.neg_embeds], axis=0)
        out = jnp.einsum("nhwc,pc->nhwp", sem_map, phrases)
        pred = jnp.argmax(out, axis=-1)
        return jnp.where(pred >= pos_num, -1, pred)

    def get_max_across_from_weights(
        self, weight_map: jnp.ndarray, codebooks: jnp.ndarray
    ) -> jnp.ndarray:
        """Relevancy straight from the rasterized coefficient map — the
        TPU-native production query path.

        The reference decodes [levels, 512, H, W] CLIP maps and dots them
        with the phrase embeddings (eval_lerf.py:210-220 + get_max_across_
        quick). But relevancy only needs phrase similarities of the
        *normalized* feature, and with feat_l = C_l^T w:

            sim = (w . (C_l @ phrase)) / sqrt(w^T (C_l C_l^T) w)

        so folding the codebook into the phrases (Phi [K, P+N]) and a
        per-level Gram matrix (G [K, K]) computes identical similarities in
        K-dimensional space: O(K(P+N) + K^2) per pixel instead of
        O(512(K+P+N)), and the 512-d map (6.4GB at 1080p) never exists.

        weight_map: [L*K, H, W] rasterized coefficients (quick render).
        codebooks:  [L, K, 512].
        Returns [L, num_positives, H, W] relevancy, matching
        get_max_across_quick on the decoded maps to float tolerance.
        """
        L, K, D = codebooks.shape
        h, w = weight_map.shape[1:]
        n_phr, n_neg = len(self.positives), len(self.negatives)
        phrases = jnp.concatenate([self.pos_embeds, self.neg_embeds], axis=0)

        wm = weight_map.reshape(L, K, h * w)
        phi = jnp.einsum("lkd,pd->lkp", codebooks, phrases)     # [L, K, P+N]
        gram = jnp.einsum("lkd,lmd->lkm", codebooks, codebooks)  # [L, K, K]

        raw = jnp.einsum("lkq,lkp->lqp", wm, phi)                # [L, HW, P+N]
        nrm2 = jnp.einsum("lkq,lkm,lmq->lq", wm, gram, wm)       # [L, HW]
        nrm = jnp.sqrt(jnp.maximum(nrm2, 0.0))
        sim = raw / (nrm[..., None] + 1e-10)

        pos = sim[..., :n_phr]
        neg = sim[..., n_phr:]
        sims = jnp.stack([
            jnp.broadcast_to(pos[..., None], pos.shape + (n_neg,)),
            jnp.broadcast_to(neg[:, :, None, :], pos.shape + (n_neg,)),
        ], axis=-1)
        softmax = jax.nn.softmax(10.0 * sims, axis=-1)
        min_pos = softmax[..., 0].min(axis=-1)
        return jnp.transpose(min_pos, (0, 2, 1)).reshape(L, n_phr, h, w)
