"""Serving backend: request handling + Gram-trick heatmap equivalence."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from langsplatv2_tpu.models import gaussians as gm
from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork
from langsplatv2_tpu.serve.backend import BackendRenderer


@pytest.fixture()
def merged_model():
    n, L, K = 40, 3, 64
    rng = np.random.default_rng(0)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = np.stack([np.cos(ang), np.sin(ang), np.full(n, 5.0)], 1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    model = gm.create_from_pcd(pts, cols, 1.0, capacity=n)
    qw = rng.uniform(0, 1, (n, L * 4)).astype(np.float32)
    qw /= qw.sum(1, keepdims=True)
    qi = np.concatenate(
        [rng.integers(0, K, (n, 4)) + l * K for l in range(L)], 1
    ).astype(np.float32)
    return model.replace(
        quick_weights=jnp.asarray(qw), quick_indices=jnp.asarray(qi),
        codebooks=jnp.asarray(rng.normal(size=(L, K, 512)).astype(np.float32)))


class TestBackend:
    def test_rgb_request(self, merged_model):
        backend = BackendRenderer(
            merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
            max_entries=2 ** 12, tile_cap=256)
        c2w = np.eye(4)
        img = backend.render_request(
            {"c2w": c2w.tolist(), "width": 96, "height": 64,
             "fov_y": math.radians(60)})
        assert img.shape == (64, 96, 3)
        assert np.isfinite(img).all() and img.max() <= 1.0

    def test_approx_serving_modes(self, merged_model):
        """bf16 cell math + budget-capped binning through the server path:
        same heatmap within the approximation envelope."""
        import math as _m
        req = {"c2w": np.eye(4).tolist(), "width": 96, "height": 64,
               "fov_y": _m.radians(60), "prompt": "red car",
               "show_heatmap": True, "threshold": -10.0}
        ref = BackendRenderer(
            merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
            max_entries=2 ** 12, tile_cap=256).render_request(req)
        fast = BackendRenderer(
            merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
            max_entries=2 ** 12, tile_cap=256, bf16_cells=True,
            tile_budget=1e-6, tile_budget_cap=128).render_request(req)
        assert fast.shape == ref.shape and np.isfinite(fast).all()
        d = np.abs(ref - fast)
        assert d.mean() < 2e-2 and d.max() < 2e-1, (d.mean(), d.max())

    def test_dispatch_finalize_split(self, merged_model):
        """Double-buffering seam: N dispatched frames finalize to the same
        images as the synchronous render_request path."""
        backend = BackendRenderer(
            merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
            max_entries=2 ** 12, tile_cap=256)
        reqs = []
        for dx in (0.0, 0.1, 0.2):
            c2w = np.eye(4)
            c2w[0, 3] = dx
            reqs.append({"c2w": c2w.tolist(), "width": 96, "height": 64,
                         "fov_y": math.radians(60), "prompt": "red car",
                         "show_heatmap": True, "threshold": -10.0})
        pendings = [backend.dispatch_request(r) for r in reqs]
        piped = [backend.finalize_frame(p) for p in pendings]
        for r, img in zip(reqs, piped):
            np.testing.assert_allclose(backend.render_request(r), img,
                                       atol=1e-6)

    def test_device_compose_matches_host(self, merged_model):
        """compose="device" (in-jit normalization + analytic JET + blend +
        u8) tracks the host cv2 path within colormap LUT quantization."""
        req = {"c2w": np.eye(4).tolist(), "width": 96, "height": 64,
               "fov_y": math.radians(60), "prompt": "red car",
               "show_heatmap": True, "threshold": -10.0}
        kw = dict(clip_model=OpenCLIPNetwork(backend="hash"),
                  max_entries=2 ** 12, tile_cap=256)
        host = BackendRenderer(merged_model, **kw).render_request(req)
        dev = BackendRenderer(merged_model, compose="device",
                              **kw).render_request(req)
        assert dev.shape == host.shape
        d = np.abs(host - dev)
        assert d.mean() < 2e-2 and d.max() < 0.13, (d.mean(), d.max())
        # Non-heatmap requests are unaffected by the compose mode.
        req_rgb = {k: v for k, v in req.items() if k != "show_heatmap"}
        a = BackendRenderer(merged_model, **kw).render_request(req_rgb)
        b = BackendRenderer(merged_model, compose="device",
                            **kw).render_request(req_rgb)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_pipelined_zmq_loopback(self, merged_model):
        """ROUTER server + DEALER client with depth-2 in flight: every
        request gets a decodable JPEG reply, in order."""
        zmq = pytest.importorskip("zmq")
        cv2 = pytest.importorskip("cv2")
        import threading

        port = 15591
        backend = BackendRenderer(
            merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
            max_entries=2 ** 12, tile_cap=256, compose="device",
            zmq_port=port)
        t = threading.Thread(target=backend.run_pipelined,
                             kwargs={"depth": 2}, daemon=True)
        t.start()
        from langsplatv2_tpu.serve.frontend import PipelinedClient

        client = PipelinedClient(f"tcp://localhost:{port}", depth=2)
        replies = []
        for i in range(5):
            c2w = np.eye(4)
            c2w[0, 3] = 0.05 * i
            client.submit({"c2w": c2w.tolist(), "width": 96, "height": 64,
                           "fov_y": math.radians(60), "prompt": "red car",
                           "show_heatmap": True, "threshold": -10.0})
            r = client.collect()
            if r is not None:
                replies.append(r)
        replies.extend(client.drain())
        assert len(replies) == 5
        for r in replies:
            img = cv2.imdecode(np.frombuffer(r, np.uint8), cv2.IMREAD_COLOR)
            assert img is not None and img.shape == (64, 96, 3)

    def test_heatmap_request_matches_decode(self, merged_model):
        backend = BackendRenderer(
            merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
            max_entries=2 ** 12, tile_cap=256)
        c2w = np.eye(4)
        req = {"c2w": c2w.tolist(), "width": 96, "height": 64,
               "fov_y": math.radians(60), "prompt": "red car",
               "show_heatmap": True, "threshold": -10.0}
        img = backend.render_request(req)
        assert img.shape == (64, 96, 3)
        assert np.isfinite(img).all()

        # Gram similarity equals the decode-and-normalize reference path.
        from langsplatv2_tpu.eval.lerf import render_language_feature_map_quick
        settings, view, full, campos = backend._camera(
            np.asarray(c2w, np.float32), 96, 64, math.radians(60))
        lf = render_language_feature_map_quick(
            merged_model, settings, jnp.asarray(view), jnp.asarray(full),
            jnp.asarray(campos), jnp.asarray(backend.background))
        lf = np.asarray(lf).transpose(0, 2, 3, 1)
        text = np.asarray(backend.clip_model.encode_text(["red car"]))
        text = text / np.linalg.norm(text, axis=-1, keepdims=True)
        lf_sum = lf.sum(axis=0)
        lf_sum = lf_sum / (np.linalg.norm(lf_sum, axis=-1, keepdims=True) + 1e-10)
        sim_ref = lf_sum @ text[0]

        cb = merged_model.codebooks
        from langsplatv2_tpu.models.renderer import render
        out_q = render(settings, merged_model, jnp.asarray(view),
                       jnp.asarray(full), jnp.asarray(campos),
                       jnp.asarray(backend.background), quick_render=True)
        wm = out_q.language_feature_weight_map.reshape(3, 64, -1)
        phi = jnp.einsum("lkd,d->lk", cb, jnp.asarray(text[0]))
        gram = jnp.einsum("lkd,jmd->ljkm", cb, cb)
        cross = jnp.einsum("lkp,ljkm,jmp->ljp", wm, gram, wm)
        s = jnp.sqrt(jnp.maximum(
            jnp.diagonal(cross, axis1=0, axis2=1).T, 0.0)) + 1e-10
        num = jnp.sum(jnp.einsum("lkp,lk->lp", wm, phi) / s, axis=0)
        nrm2 = jnp.sum(cross / (s[:, None, :] * s[None, :, :]), axis=(0, 1))
        sim = np.asarray(num / (jnp.sqrt(jnp.maximum(nrm2, 0.0)) + 1e-10))
        np.testing.assert_allclose(sim.reshape(64, 96), sim_ref, atol=5e-5)

    def test_pose_cache_hit_matches_miss(self, merged_model):
        """Temporal coherence: a pose-unchanged request (new prompt /
        threshold) replays the cached blend output through the query tail
        only, and must match a fresh backend's full render."""
        kw = dict(clip_model=OpenCLIPNetwork(backend="hash"),
                  max_entries=2 ** 12, tile_cap=256)

        def req(prompt, thresh=-10.0, dx=0.0):
            c2w = np.eye(4)
            c2w[0, 3] = dx
            return {"c2w": c2w.tolist(), "width": 96, "height": 64,
                    "fov_y": math.radians(60), "prompt": prompt,
                    "show_heatmap": True, "threshold": thresh}

        cached = BackendRenderer(merged_model, **kw)
        img0 = cached.render_request(req("red car"))          # miss
        hit1 = cached.render_request(req("blue box"))         # pose hit
        hit2 = cached.render_request(req("blue box", 0.5))    # pose hit
        assert cached.cache_hits["pose"] == 2
        assert cached.cache_hits["miss"] == 1

        fresh = BackendRenderer(merged_model, **kw)
        np.testing.assert_allclose(
            hit1, fresh.render_request(req("blue box")), atol=1e-6)
        fresh2 = BackendRenderer(merged_model, **kw)
        np.testing.assert_allclose(
            hit2, fresh2.render_request(req("blue box", 0.5)), atol=1e-6)

        # Repeating the ORIGINAL prompt after the hits still matches.
        np.testing.assert_allclose(
            cached.render_request(req("red car")), img0, atol=1e-6)

        # A pose change invalidates: must re-render, not replay.
        moved = cached.render_request(req("blue box", dx=0.3))
        assert cached.cache_hits["miss"] == 2
        fresh3 = BackendRenderer(merged_model, **kw)
        np.testing.assert_allclose(
            moved, fresh3.render_request(req("blue box", dx=0.3)), atol=1e-6)

        # Cache off reproduces the same images.
        off = BackendRenderer(merged_model, pose_cache=False, **kw)
        np.testing.assert_allclose(
            off.render_request(req("blue box")), hit1, atol=1e-6)
        assert off.cache_hits["pose"] == 0


class TestTemporalServing:
    def test_temporal_reuse_matches_full_render(self, merged_model):
        """Temporal binning reuse through the server path: nearby-pose
        requests take the steady path and stay within the approximation
        envelope of a full re-binned render; the rebin/steady counters
        pin which path actually ran."""
        def req(dx, prompt=True):
            c2w = np.eye(4)
            c2w[0, 3] = dx
            return {"c2w": c2w.tolist(), "width": 96, "height": 64,
                    "fov_y": math.radians(60), "prompt": "red car",
                    "show_heatmap": prompt, "threshold": -10.0}

        tc = BackendRenderer(
            merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
            max_entries=2 ** 12, tile_cap=256,
            tile_budget=1e-6, tile_budget_cap=128,
            temporal_reuse_px=8.0, reuse_zref=2.0, pose_cache=False)
        full = BackendRenderer(
            merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
            max_entries=2 ** 12, tile_cap=256,
            tile_budget=1e-6, tile_budget_cap=128, pose_cache=False)

        img0 = tc.render_request(req(0.0))
        assert tc.cache_hits["rebin"] == 1
        np.testing.assert_allclose(img0, full.render_request(req(0.0)),
                                   atol=1e-5)

        # ~0.005 world units at z_ref 2 -> ~0.2 px: steady path.
        img1 = tc.render_request(req(0.005))
        assert tc.cache_hits["steady"] == 1
        d = np.abs(img1 - full.render_request(req(0.005)))
        assert d.mean() < 2e-2 and np.isfinite(img1).all(), d.mean()

        # A large jump must re-bin.
        tc.render_request(req(2.0))
        assert tc.cache_hits["rebin"] == 2

    def test_temporal_requires_capped_mode(self, merged_model):
        with pytest.raises(ValueError):
            BackendRenderer(
                merged_model, clip_model=OpenCLIPNetwork(backend="hash"),
                temporal_reuse_px=4.0)
