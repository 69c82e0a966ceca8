"""Interactive render server (ZMQ REP, optional pipelined ROUTER).

Parity target: reference `backend_renderer.py` — the same JSON request
protocol on :5555 ({c2w, width, height, fov_y, prompt, threshold,
show_heatmap} -> JPEG bytes), the same merged quick-render model, the same
"LangSplat normalization" of similarity heatmaps (min-max -> [-1,1] ->
clip[0,1]) with the raw-max threshold / tiny-range suppression, and the same
JET 50/50 blend.

TPU shape: one jitted function per (request geometry, heatmap, compose)
computes the WHOLE frame on device — quick render, Gram-trick similarity,
and (compose="device") the normalization + JET colormap + 50/50 blend +
uint8 quantization — so a frame is ONE dispatch and the readback is
H*W*3 bytes instead of two f32 maps. Dispatch and finalize are split
(`dispatch_request` / `finalize_frame`) so a serving loop can overlap
frame N+1's dispatch with frame N's device compute + readback
(`run_pipelined`, a ROUTER socket holding up to `depth` requests in
flight; the REP `run` keeps exact reference protocol semantics).
"""
from __future__ import annotations

import json
import math
import traceback
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..models.gaussians import GaussianModel
from ..models.renderer import render
from ..ops.rasterize import RasterizeSettings
from ..eval.openclip import OpenCLIPNetwork


def apply_langsplat_normalization(similarity: np.ndarray) -> np.ndarray:
    """Highlight the top half of the dynamic range
    (reference backend_renderer.py:38-55)."""
    raw_min, raw_max = similarity.min(), similarity.max()
    similarity = (similarity - raw_min) / (raw_max - raw_min + 1e-9)
    similarity = similarity * 2 - 1
    return np.clip(similarity, 0, 1)


def jet_colormap(x):
    """Classic analytic JET ramp on device (x in [0,1] -> [..., 3] RGB).

    Matches cv2.COLORMAP_JET's piecewise-linear ramp to within LUT
    quantization (cv2 tabulates the same function at 256 points); used by
    the compose="device" path where the colormap must run in-jit.
    """
    import jax.numpy as jnp

    v = jnp.clip(x, 0.0, 1.0)
    r = jnp.clip(1.5 - jnp.abs(4.0 * v - 3.0), 0.0, 1.0)
    g = jnp.clip(1.5 - jnp.abs(4.0 * v - 2.0), 0.0, 1.0)
    b = jnp.clip(1.5 - jnp.abs(4.0 * v - 1.0), 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)


@dataclass
class PendingFrame:
    """A dispatched (not yet read back) frame: device arrays + host meta."""
    rgb: Any                      # [H, W, 3] f32 device (or u8 composited)
    sim: Any = None               # [H, W] f32 device or None
    composited: bool = False      # True -> rgb already has the heatmap baked
    threshold: float = 0.22
    meta: dict = field(default_factory=dict)


class BackendRenderer:
    """ZMQ server around a merged quick-render model."""

    def __init__(self, model: GaussianModel, *,
                 zmq_port: int = 5555,
                 background=(0.0, 0.0, 0.0),
                 clip_model: OpenCLIPNetwork | None = None,
                 znear: float = 0.01, zfar: float = 100.0,
                 max_entries: int = 2 ** 21, tile_cap: int = 1024,
                 bf16_cells: bool = False,
                 tile_budget: float = 0.0, tile_budget_cap: int = 128,
                 tile_budget_subdiv: int = 2,
                 compose: str = "host",
                 pose_cache: bool = True,
                 temporal_reuse_px: float = 0.0,
                 reuse_zref: float = 2.0):
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
        # compose="host": cv2 JET + blend on host (bit-exact reference
        # parity). compose="device": normalization + analytic JET + blend +
        # uint8 in-jit — readback shrinks to H*W*3 bytes (streaming mode).
        assert compose in ("host", "device"), compose
        self.compose = compose
        self.current_prompt = ""
        self.zmq_port = zmq_port
        self._settings_cache: dict[tuple, RasterizeSettings] = {}
        self._frame_cache: dict[tuple, Any] = {}
        self._prompt_phi: dict[str, Any] = {}
        self._gram = None
        self.context = self.socket = None
        # Temporal coherence: the viser frontend polls at 100 Hz and
        # re-sends the SAME camera whenever the user is reading the scene,
        # typing a prompt, or dragging the threshold slider — so a
        # pose-unchanged request is the common serving case. The pose
        # cache keeps the last rendered pose's device arrays (rgb + the
        # [L*K, H, W] weight map, bf16) and re-runs only the query +
        # compose tail (~1/4 of the frame); an identical FULL request
        # (pose+prompt+threshold) reuses the encoded JPEG outright.
        # Bit-exact: a cache hit replays the same pose's blend output.
        self.pose_cache_enabled = pose_cache
        self._pose_key: tuple | None = None     # (c2w bytes, w, h, fovy, hm)
        self._pose_entry: dict[str, Any] | None = None
        self._jpeg_key: tuple | None = None
        self._jpeg_bytes: bytes | None = None
        # Temporal-coherence binning reuse (ops/temporal.py): when the
        # estimated image motion since the last bin frame stays under
        # temporal_reuse_px, the frame reuses the frozen [T, cap] binning
        # and runs ONLY the dense EWA + blend — no expansion, sort, budget
        # scan, or gather (the measured majority of the capped frame).
        # 0 disables (every frame re-bins, exact capped semantics).
        # Requires the budget-capped serving mode (tile_budget > 0).
        if temporal_reuse_px > 0.0 and tile_budget <= 0.0:
            raise ValueError(
                "temporal_reuse_px needs the budget-capped serving mode "
                "(tile_budget > 0)")
        self.temporal_reuse_px = temporal_reuse_px
        self.reuse_zref = reuse_zref
        self._tc_cache = None          # ops.temporal.BinCache (device)
        self._tc_c2w: np.ndarray | None = None    # bin pose
        self._tc_key: tuple | None = None          # (w, h, fovy)
        self.cache_hits = {"pose": 0, "jpeg": 0, "miss": 0,
                           "steady": 0, "rebin": 0}

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

    # -- prompt-derived device constants (cached per prompt string) --
    def _phi_gram(self, prompt: str):
        import jax.numpy as jnp

        if prompt not in self._prompt_phi:
            text = np.asarray(self.clip_model.encode_text([prompt]))
            text = text / np.linalg.norm(text, axis=-1, keepdims=True)
            self._prompt_phi[prompt] = jnp.einsum(
                "lkd,d->lk", self.model.codebooks, jnp.asarray(text[0]))
        if self._gram is None:
            cb = self.model.codebooks
            self._gram = jnp.einsum("lkd,jmd->ljkm", cb, cb)  # [L, L, K, K]
        return self._prompt_phi[prompt], self._gram

    # -- query + compose tail (shared by the full frame and pose-cache
    #    hits, so a hit replays EXACTLY the miss path's math) --
    @staticmethod
    def _query_compose(rgb, wm16, phi, gram, threshold, L, K, compose_dev):
        import jax.numpy as jnp

        h, w = wm16.shape[1:]
        # Reference semantics: per-level L2-normalized features are
        # SUMMED, then the sum is normalized against the text embed
        # (backend_renderer.py:204-228). Same math as the 4-index
        # einsum formulation, restructured as two flat [LK, LK] matmuls:
        # with f_l = cb_l^T wm_l, the per-level norm s_l comes from the
        # BLOCK-DIAGONAL Gram (s_l^2 = <wm_l, G_ll wm_l>) and
        # |sum_l f_l/s_l|^2 = <wms, G_full wms> with wms = wm_l/s_l —
        # the [L, L, P] cross tensor never materializes. bf16 operands
        # (the fast-mode contract), f32 accumulation.
        lk = L * K
        wm = wm16.reshape(lk, h * w)
        gd = jnp.zeros((lk, lk), jnp.bfloat16)
        gf = jnp.zeros((lk, lk), jnp.bfloat16)
        if gram.ndim == 4:
            # [L, L, K, K] cross-level Gram (serve _phi_gram form).
            for lv in range(L):
                for jv in range(L):
                    gf = gf.at[lv * K:(lv + 1) * K,
                               jv * K:(jv + 1) * K].set(
                                   gram[lv, jv].astype(jnp.bfloat16))
            for lv in range(L):
                gd = gd.at[lv * K:(lv + 1) * K, lv * K:(lv + 1) * K].set(
                    gram[lv, lv].astype(jnp.bfloat16))
        else:
            # [L, K, K] per-level diagonal blocks.
            for lv in range(L):
                gd = gd.at[lv * K:(lv + 1) * K,
                           lv * K:(lv + 1) * K].set(
                               gram[lv].astype(jnp.bfloat16))
            gf = gd
        wg_d = jnp.einsum("cp,cd->dp", wm, gd,
                          preferred_element_type=jnp.float32)   # [LK, P]
        s2 = jnp.sum((wg_d * wm).reshape(L, K, h * w), axis=1)  # [L, P]
        s = jnp.sqrt(jnp.maximum(s2, 0.0)) + 1e-10
        wms = (wm.reshape(L, K, h * w) / s[:, None, :]).reshape(lk, h * w)
        wms16 = wms.astype(jnp.bfloat16)
        wg_f = jnp.einsum("cp,cd->dp", wms16, gf,
                          preferred_element_type=jnp.float32)
        nrm2 = jnp.sum(wg_f * wms, axis=0)                      # [P]
        num = jnp.sum(phi.astype(jnp.bfloat16).reshape(lk, 1) * wms,
                      axis=0)
        sim = (num / (jnp.sqrt(jnp.maximum(nrm2, 0.0)) + 1e-10)
               ).reshape(h, w)
        if not compose_dev:
            return rgb, sim
        # Device composition: LangSplat normalization + suppression +
        # JET + 50/50 blend, quantized — the tunnel carries u8 pixels.
        raw_max, raw_min = sim.max(), sim.min()
        simn = jnp.clip(
            (sim - raw_min) / (raw_max - raw_min + 1e-9) * 2 - 1, 0, 1)
        simn = jnp.where(
            (raw_max < threshold) | (raw_max - raw_min < 0.02),
            0.0, simn)
        img = jnp.clip(rgb * 0.5 + jet_colormap(simn) * 0.5, 0.0, 1.0)
        return (img * 255.0 + 0.5).astype(jnp.uint8), None

    # -- the per-geometry jitted frame (ONE dispatch per request) --
    def _frame_fn(self, settings: RasterizeSettings, heatmap: bool):
        import jax
        import jax.numpy as jnp

        key = (settings, heatmap, self.compose)
        if key in self._frame_cache:
            return self._frame_cache[key]
        compose_dev = self.compose == "device"
        L, K, _ = self.model.codebooks.shape

        @jax.jit
        def frame(model, view, full, campos, bg, phi, gram, threshold):
            if not heatmap:
                out = render(settings, model, view, full, campos, bg)
                rgb = out.render.transpose(1, 2, 0)
                return rgb, None, rgb, None
            # Gram-trick query: the reference decodes [L, 512, H, W], sums
            # levels, normalizes and dots with the text embedding
            # (backend_renderer.py:16-36,204-228). Folding the codebooks
            # into the text embedding and the norm into cross-level Gram
            # matrices computes the identical similarity from the 192-ch
            # weight map — the 512-d map never exists. The quick render
            # already produces the RGB preview, so one render covers both.
            out_q = render(settings, model, view, full, campos, bg,
                           quick_render=True)
            rgb = out_q.render.transpose(1, 2, 0)
            wm16 = out_q.language_feature_weight_map.astype(jnp.bfloat16)
            vis, sim = BackendRenderer._query_compose(
                rgb, wm16, phi, gram, threshold, L, K, compose_dev)
            # rgb + wm16 ride along as device arrays for the pose cache
            # (never read back — staying in HBM costs nothing).
            return vis, sim, rgb, wm16

        self._frame_cache[key] = frame
        return frame

    # -- pose-cache hit: query + compose only (blend inputs replayed) --
    def _hit_fn(self, hw_key: tuple):
        import jax

        key = ("hit", hw_key, self.compose)
        if key in self._frame_cache:
            return self._frame_cache[key]
        compose_dev = self.compose == "device"
        L, K, _ = self.model.codebooks.shape

        @jax.jit
        def hit(rgb, wm16, phi, gram, threshold):
            return BackendRenderer._query_compose(
                rgb, wm16, phi, gram, threshold, L, K, compose_dev)

        self._frame_cache[key] = hit
        return hit

    # -- temporal-coherence frames (ops/temporal.py binning reuse) --
    def _tc_frame_fns(self, settings, heatmap: bool):
        """(bin_frame, steady_frame) jits for the temporal serving mode.

        bin_frame re-bins at the request pose and returns the frozen
        BinCache alongside the frame; steady_frame renders against a
        cached binning with ONLY the dense EWA + blend (no expansion /
        sort / budget / slice / gather — the measured majority of the
        capped frame). Reference use case: backend_renderer.py:161-246."""
        import jax
        import jax.numpy as jnp

        key = ("tc", settings, heatmap, self.compose)
        if key in self._frame_cache:
            return self._frame_cache[key]
        compose_dev = self.compose == "device"
        L, K, _ = self.model.codebooks.shape
        topk = int(self.model.quick_weights.shape[1])
        from ..ops import temporal
        from ..ops import rasterize_tiles

        H, W = settings.image_height, settings.image_width
        gx, gy = settings.grid_x, settings.grid_y

        def tail(rgb_t, feat_t, phi, gram, threshold):
            rgb = rasterize_tiles.tiles_to_image(
                rgb_t, gx, gy, H, W).transpose(1, 2, 0)
            if not heatmap:
                return rgb, None, rgb, None
            wm16 = rasterize_tiles.tiles_to_image(
                feat_t.astype(jnp.bfloat16), gx, gy, H, W)
            vis, sim = BackendRenderer._query_compose(
                rgb, wm16, phi, gram, threshold, L, K, compose_dev)
            return vis, sim, rgb, wm16

        @jax.jit
        def bin_frame(model, view, full, campos, bg, phi, gram, threshold):
            cache, _ = temporal.quick_bin_cache(
                settings, model.xyz, model.get_opacity(), view, full,
                campos, scales=model.get_scaling(),
                rotations=model.get_rotation(), shs=model.get_features(),
                quick_weights=model.quick_weights,
                quick_indices=model.quick_indices)
            rgb_t, feat_t, _ = temporal.rasterize_quick_steady(
                settings, cache, view, full, bg, quick_channels=L * K,
                topk=topk)
            return (*tail(rgb_t, feat_t, phi, gram, threshold), cache)

        @jax.jit
        def steady_frame(cache, view, full, bg, phi, gram, threshold):
            rgb_t, feat_t, _ = temporal.rasterize_quick_steady(
                settings, cache, view, full, bg, quick_channels=L * K,
                topk=topk)
            return tail(rgb_t, feat_t, phi, gram, threshold)

        self._frame_cache[key] = (bin_frame, steady_frame)
        return bin_frame, steady_frame

    def _tc_dispatch(self, settings, heatmap, c2w, width, height, fov_y,
                     view, full, campos, phi, gram, threshold):
        """Temporal-mode dispatch: steady frame when the estimated image
        motion since the bin pose is under temporal_reuse_px, else re-bin
        (and refresh the frozen binning)."""
        import jax.numpy as jnp
        from ..ops import temporal

        bin_frame, steady_frame = self._tc_frame_fns(settings, heatmap)
        bg = jnp.asarray(self.background)
        geo_key = (width, height, round(fov_y, 9), heatmap)
        fov_x = 2 * np.arctan(np.tan(fov_y / 2) * (width / height))
        if (self._tc_cache is not None and self._tc_key == geo_key
                and temporal.motion_px(self._tc_c2w, c2w, width, fov_x,
                                       self.reuse_zref)
                <= self.temporal_reuse_px):
            self.cache_hits["steady"] += 1
            vis, sim, raw_rgb, wm16 = steady_frame(
                self._tc_cache, jnp.asarray(view), jnp.asarray(full), bg,
                phi, gram, jnp.float32(threshold))
        else:
            self.cache_hits["rebin"] += 1
            vis, sim, raw_rgb, wm16, cache = bin_frame(
                self.model, jnp.asarray(view), jnp.asarray(full),
                jnp.asarray(campos), bg, phi, gram, jnp.float32(threshold))
            self._tc_cache = cache
            self._tc_c2w = np.array(c2w, np.float32)
            self._tc_key = geo_key
        return vis, sim, raw_rgb, wm16

    # -- dispatch / finalize (the double-buffering seam) --
    def dispatch_request(self, request: dict) -> PendingFrame:
        """Enqueue one request's device work; returns without any host
        sync so the caller can overlap readback of a previous frame."""
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

        heatmap = bool(show_heatmap and self.current_prompt)
        settings, view, full, campos = self._camera(c2w, width, height, fov_y)
        if heatmap:
            phi, gram = self._phi_gram(self.current_prompt)
        else:
            # Structure-stable placeholders (the jit ignores them).
            phi = gram = jnp.zeros((), jnp.float32)

        pose_key = (c2w.tobytes(), width, height, round(fov_y, 9), heatmap)
        if (self.pose_cache_enabled and pose_key == self._pose_key
                and self._pose_entry is not None):
            # Pose unchanged (prompt/threshold may differ): replay the
            # cached blend output through the query+compose tail only —
            # preprocess/expand/sort/gather/blend all skipped, bit-exact.
            self.cache_hits["pose"] += 1
            entry = self._pose_entry
            if not heatmap:
                rgb, sim = entry["rgb"], None
            else:
                hit = self._hit_fn((width, height))
                rgb, sim = hit(entry["rgb"], entry["wm16"], phi, gram,
                               jnp.float32(threshold))
            return PendingFrame(
                rgb=rgb, sim=sim,
                composited=heatmap and self.compose == "device",
                threshold=threshold)

        if self.temporal_reuse_px > 0.0:
            vis, sim, raw_rgb, wm16 = self._tc_dispatch(
                settings, heatmap, c2w, width, height, fov_y,
                view, full, campos, phi, gram, threshold)
        else:
            self.cache_hits["miss"] += 1
            frame = self._frame_fn(settings, heatmap)
            vis, sim, raw_rgb, wm16 = frame(
                self.model, jnp.asarray(view), jnp.asarray(full),
                jnp.asarray(campos), jnp.asarray(self.background),
                phi, gram, jnp.float32(threshold))
        if self.pose_cache_enabled:
            self._pose_key = pose_key
            self._pose_entry = {"rgb": raw_rgb, "wm16": wm16}
        return PendingFrame(rgb=vis, sim=sim,
                            composited=heatmap and self.compose == "device",
                            threshold=threshold)

    def finalize_frame(self, pending: PendingFrame,
                       as_uint8: bool = False) -> np.ndarray:
        """Block on the device arrays and produce the [H, W, 3] image
        (float in [0,1], or uint8 when as_uint8)."""
        rgb = np.asarray(pending.rgb)
        if pending.composited:
            return rgb if as_uint8 else rgb.astype(np.float32) / 255.0
        if pending.sim is None:
            final_img = np.clip(rgb, 0, 1)
        else:
            sim = np.asarray(pending.sim)
            raw_max = sim.max()
            range_val = raw_max - sim.min()
            if raw_max < pending.threshold or range_val < 0.02:
                sim = np.zeros_like(sim)
            else:
                sim = apply_langsplat_normalization(sim)
            import cv2

            heat = cv2.applyColorMap((sim * 255).astype(np.uint8),
                                     cv2.COLORMAP_JET)
            heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB) / 255.0
            final_img = np.clip(rgb * 0.5 + heat * 0.5, 0, 1)
        if as_uint8:
            return (final_img * 255).astype(np.uint8)
        return final_img

    def render_request(self, request: dict) -> np.ndarray:
        """Process one request dict -> [H, W, 3] float image in [0,1]."""
        return self.finalize_frame(self.dispatch_request(request))

    @staticmethod
    def _encode_jpeg(img_u8: np.ndarray) -> bytes:
        import cv2

        _, buffer = cv2.imencode(
            ".jpg", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
        return buffer.tobytes()

    def run(self):
        """Reference-parity REQ/REP loop: strict alternation, one frame in
        flight (the protocol itself serializes request N+1 behind reply N)."""
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
                # Byte-identical request (the frontend's 100 Hz repoll of
                # an unchanged camera/prompt/threshold): resend the
                # encoded JPEG — zero device work, zero host encode.
                if (self.pose_cache_enabled and message == self._jpeg_key
                        and self._jpeg_bytes is not None):
                    self.cache_hits["jpeg"] += 1
                    self.socket.send(self._jpeg_bytes)
                    continue
                request = json.loads(message)
                img = self.finalize_frame(self.dispatch_request(request),
                                          as_uint8=True)
                jpeg = self._encode_jpeg(img)
                if self.pose_cache_enabled:
                    self._jpeg_key, self._jpeg_bytes = message, jpeg
                self.socket.send(jpeg)
            except KeyboardInterrupt:
                break
            except Exception:
                traceback.print_exc()
                self.socket.send(b"ERROR")

    # -- fetch/encode worker (overlaps device compute with host readback) --
    def _finalize_pool(self):
        """Single worker thread for finalize (device->host fetch) + JPEG
        encode. Both release the GIL (the fetch blocks on the transport,
        cv2 encodes in native code), so the serving loop keeps dispatching
        frame N+1's device work while frame N is fetched and encoded —
        the measured serve/device gap is exactly this serialization
        (round-4 VERDICT #3). One worker keeps completion in-order per
        frame; the ROUTER loop preserves reply order by draining the
        future queue FIFO."""
        if getattr(self, "_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="lsv2-finalize")
        return self._pool

    def finalize_async(self, pending: PendingFrame):
        """Submit finalize+encode to the worker thread; returns a Future
        of the JPEG bytes."""
        def work():
            img = self.finalize_frame(pending, as_uint8=True)
            return self._encode_jpeg(img)

        return self._finalize_pool().submit(work)

    def run_pipelined(self, depth: int = 2):
        """Double-buffered loop on a ROUTER socket: up to `depth` requests
        in flight. Frame N+1's dispatch (host camera math + tunnel
        enqueue) overlaps frame N's device compute, and a finalize worker
        thread overlaps frame N's readback + JPEG encode with both.
        Clients connect with a DEALER keeping `depth` requests outstanding
        (serve.frontend.PipelinedClient); the REQ/REP `run()` stays the
        reference-protocol default."""
        import zmq

        self.context = zmq.Context()
        self.socket = self.context.socket(zmq.ROUTER)
        self.socket.bind(f"tcp://*:{self.zmq_port}")
        print(f"Backend Renderer (pipelined x{depth}) on {self.zmq_port}")

        inflight: list[tuple[bytes, Any]] = []   # (ident, Future|bytes|None)
        while True:
            try:
                # Reply with the oldest frame when the pipeline is full, or
                # when nothing new is waiting and the oldest is done.
                if inflight and (len(inflight) >= depth
                                 or not self.socket.poll(0)):
                    ident, item = inflight.pop(0)
                    if item is None:
                        self.socket.send_multipart([ident, b"", b"ERROR"])
                    elif isinstance(item, bytes):      # JPEG-cache hit
                        self.socket.send_multipart([ident, b"", item])
                    else:                              # (future, message)
                        fut, message = item
                        jpeg = fut.result()
                        if self.pose_cache_enabled:
                            self._jpeg_key = message
                            self._jpeg_bytes = jpeg
                        self.socket.send_multipart([ident, b"", jpeg])
                    continue
                if self.socket.poll(100 if inflight else None) == 0:
                    continue
                ident, _empty, message = self.socket.recv_multipart()
                if (self.pose_cache_enabled and message == self._jpeg_key
                        and self._jpeg_bytes is not None):
                    self.cache_hits["jpeg"] += 1
                    inflight.append((ident, self._jpeg_bytes))
                    continue
                try:
                    pf = self.dispatch_request(json.loads(message))
                    pf.meta["message"] = message
                    inflight.append(
                        (ident, (self.finalize_async(pf), message)))
                except Exception:
                    traceback.print_exc()
                    inflight.append((ident, None))
            except KeyboardInterrupt:
                break
