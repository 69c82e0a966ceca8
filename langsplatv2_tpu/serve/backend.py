"""Interactive render server (ZMQ REP).

Parity target: reference `backend_renderer.py` — the same JSON request
protocol on :5555 ({c2w, width, height, fov_y, prompt, threshold,
show_heatmap} -> JPEG bytes), the same merged quick-render model, the same
"LangSplat normalization" of similarity heatmaps (min-max -> [-1,1] ->
clip[0,1]) with the raw-max threshold / tiny-range suppression, and the same
JET 50/50 blend.

TPU shape: the render path is one jitted function per (width, height)
request geometry; camera construction happens host-side.
"""
from __future__ import annotations

import json
import math
import traceback

import numpy as np

from ..models.gaussians import GaussianModel
from ..models.renderer import render
from ..ops.rasterize import RasterizeSettings
from ..eval.lerf import render_language_feature_map_quick
from ..eval.openclip import OpenCLIPNetwork


def apply_langsplat_normalization(similarity: np.ndarray) -> np.ndarray:
    """Highlight the top half of the dynamic range
    (reference backend_renderer.py:38-55)."""
    raw_min, raw_max = similarity.min(), similarity.max()
    similarity = (similarity - raw_min) / (raw_max - raw_min + 1e-9)
    similarity = similarity * 2 - 1
    return np.clip(similarity, 0, 1)


class BackendRenderer:
    """ZMQ REP server around a merged quick-render model."""

    def __init__(self, model: GaussianModel, *,
                 zmq_port: int = 5555,
                 background=(0.0, 0.0, 0.0),
                 clip_model: OpenCLIPNetwork | None = None,
                 znear: float = 0.01, zfar: float = 100.0,
                 max_entries: int = 2 ** 21, tile_cap: int = 1024,
                 bf16_cells: bool = False,
                 tile_budget: float = 0.0, tile_budget_cap: int = 128,
                 tile_budget_subdiv: int = 2):
        self.model = model
        self.background = np.asarray(background, np.float32)
        self.clip_model = clip_model or OpenCLIPNetwork()
        self.znear, self.zfar = znear, zfar
        self.max_entries, self.tile_cap = max_entries, tile_cap
        # Optional approximations beyond fast16 (see RasterizeSettings):
        # bf16 VPU cell math, and the budget-capped binning that bounds
        # per-tile work for interactive streams.
        self.bf16_cells = bf16_cells
        self.tile_budget = tile_budget
        self.tile_budget_cap = tile_budget_cap
        self.tile_budget_subdiv = tile_budget_subdiv
        self.current_prompt = ""
        self.zmq_port = zmq_port
        self._settings_cache: dict[tuple, RasterizeSettings] = {}
        self.context = self.socket = None

    # -- camera construction (reference backend_renderer.py:130-159) --
    def _camera(self, c2w: np.ndarray, width: int, height: int, fov_y: float):
        fov_x = 2 * np.arctan(np.tan(fov_y / 2) * (width / height))
        w2c = np.linalg.inv(c2w)
        view = w2c.T.astype(np.float32)
        from ..utils.camera_math import get_projection_matrix

        proj = get_projection_matrix(self.znear, self.zfar, fov_x, fov_y).T
        full = (view @ proj).astype(np.float32)
        campos = c2w[:3, 3].astype(np.float32)
        key = (width, height, round(fov_x, 9), round(fov_y, 9))
        if key not in self._settings_cache:
            # Serving uses the fast16 precision mode: single packed entry
            # gather + bf16 blend (~1e-3 from parity — invisible in a JPEG
            # heatmap/preview stream).
            self._settings_cache[key] = RasterizeSettings(
                image_height=height, image_width=width,
                tanfovx=math.tan(fov_x / 2), tanfovy=math.tan(fov_y / 2),
                sh_degree=self.model.active_sh_degree,
                max_entries=self.max_entries, tile_cap=self.tile_cap,
                tile_batch=32, precision="bf16",
                bf16_cells=self.bf16_cells,
                tile_budget=self.tile_budget,
                tile_budget_cap=self.tile_budget_cap,
                tile_budget_subdiv=self.tile_budget_subdiv)
        return self._settings_cache[key], view, full, campos

    def render_request(self, request: dict) -> np.ndarray:
        """Process one request dict -> [H, W, 3] float image in [0,1]."""
        import jax.numpy as jnp

        c2w = np.array(request["c2w"], np.float32)
        width, height = int(request["width"]), int(request["height"])
        fov_y = float(request["fov_y"])
        prompt = request.get("prompt", "")
        threshold = float(request.get("threshold", 0.22))
        show_heatmap = bool(request.get("show_heatmap", False))

        if prompt and prompt != self.current_prompt:
            self.clip_model.set_positives([prompt])
            self.current_prompt = prompt

        settings, view, full, campos = self._camera(c2w, width, height, fov_y)
        out = render(settings, self.model, jnp.asarray(view), jnp.asarray(full),
                     jnp.asarray(campos), jnp.asarray(self.background))
        rgb = np.asarray(out.render).transpose(1, 2, 0)
        final_img = rgb

        if show_heatmap and self.current_prompt:
            # Gram-trick query: the reference decodes [L, 512, H, W], sums
            # levels, normalizes and dots with the text embedding
            # (backend_renderer.py:16-36,204-228). Folding the codebooks
            # into the text embedding and the norm into cross-level Gram
            # matrices computes the identical similarity from the 192-ch
            # weight map — the 512-d map never exists.
            out_q = render(settings, self.model, jnp.asarray(view),
                           jnp.asarray(full), jnp.asarray(campos),
                           jnp.asarray(self.background), quick_render=True)
            wmap = out_q.language_feature_weight_map      # [L*K, H, W]
            text = np.asarray(self.clip_model.encode_text([self.current_prompt]))
            text = text / np.linalg.norm(text, axis=-1, keepdims=True)
            cb = self.model.codebooks                     # [L, K, 512]
            L, K, _ = cb.shape
            h, w = wmap.shape[1:]
            wm = wmap.reshape(L, K, h * w)
            # Reference semantics: per-level L2-normalized features are
            # SUMMED, then the sum is normalized against the text embed.
            phi = jnp.einsum("lkd,d->lk", cb, jnp.asarray(text[0]))
            gram = jnp.einsum("lkd,jmd->ljkm", cb, cb)    # [L, L, K, K]
            cross = jnp.einsum("lkp,ljkm,jmp->ljp", wm, gram, wm)
            s = jnp.sqrt(jnp.maximum(
                jnp.diagonal(cross, axis1=0, axis2=1).T, 0.0)) + 1e-10  # [L, P]
            num = jnp.sum(jnp.einsum("lkp,lk->lp", wm, phi) / s, axis=0)
            nrm2 = jnp.sum(cross / (s[:, None, :] * s[None, :, :]), axis=(0, 1))
            sim_j = num / (jnp.sqrt(jnp.maximum(nrm2, 0.0)) + 1e-10)
            sim = np.asarray(sim_j).reshape(h, w)

            raw_max = sim.max()
            range_val = raw_max - sim.min()
            if raw_max < threshold or range_val < 0.02:
                sim = np.zeros_like(sim)
            else:
                sim = apply_langsplat_normalization(sim)
            import cv2

            heat = cv2.applyColorMap((sim * 255).astype(np.uint8), cv2.COLORMAP_JET)
            heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB) / 255.0
            final_img = rgb * 0.5 + heat * 0.5
        return np.clip(final_img, 0, 1)

    def run(self):
        import cv2
        import zmq

        # Socket binding is deferred to serve time so render_request stays
        # testable without network side effects.
        self.context = zmq.Context()
        self.socket = self.context.socket(zmq.REP)
        self.socket.bind(f"tcp://*:{self.zmq_port}")
        print(f"Backend Renderer listening on port {self.zmq_port}")

        while True:
            try:
                message = self.socket.recv()
                request = json.loads(message)
                img = self.render_request(request)
                _, buffer = cv2.imencode(
                    ".jpg", cv2.cvtColor((img * 255).astype(np.uint8),
                                         cv2.COLOR_RGB2BGR))
                self.socket.send(buffer.tobytes())
            except KeyboardInterrupt:
                break
            except Exception:
                traceback.print_exc()
                self.socket.send(b"ERROR")
