"""Benchmark: language-feature rendering FPS on the real TPU chip.

Headline metric matching the reference's claim (450+ FPS merged 3-level
quick render on an A100, README.md:1,50; BASELINE.md): frames/second of the
production language-query path — streaming Pallas rasterization of the
192-channel coefficient map (fast16 packed rows, bf16 blend) plus the
Gram-trick relevancy query for a prompt set (1 positive + 4 canonical
negatives), which produces the SAME per-pixel relevancy the reference's
decode-then-dot pipeline produces (eval_lerf.py:210-220) without ever
materializing the [3, 512, H, W] CLIP map. The full decode path (bf16
einsum lift + L2 normalize, the reference's literal formulation) is
reported as a secondary number.

Scene: synthetic LERF-scale (1M gaussians, 1080p). The entry budget is
tightened adaptively after a warm frame (serving systems compile a small
set of budgets the same way); overflow telemetry guards truncation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Component timings go to stderr for trend tracking. Timing forces a host
fetch per measurement (block_until_ready under-reports on this backend).
"""
import json
import math
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_FPS = 450.0  # reference title claim (A100)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wait_for_backend(max_wait=900.0, probe_timeout=180.0):
    """Block (bounded) until the JAX backend answers, or return None.

    The axon TPU tunnel drops for whole sessions; when it is down,
    jax.devices() either raises UNAVAILABLE or HANGS indefinitely — an
    in-process call has no timeout path, which is how BENCH_r03 recorded
    0.0 FPS. Probe in a short-lived subprocess under `timeout` semantics
    and retry until the window opens or the wait budget is spent.
    Returns the platform string ('axon'/'tpu'/'cpu') on success.
    """
    explicit = os.environ.get("JAX_PLATFORMS", "")
    if explicit and "cpu" in explicit.lower():
        return "cpu"  # flow-smoke runs: nothing to wait for
    deadline = time.time() + max_wait
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout)
            if r.returncode == 0 and r.stdout.strip():
                plat = r.stdout.strip().splitlines()[-1]
                log(f"backend '{plat}' up (probe {attempt}, "
                    f"{time.time() - t0:.0f}s)")
                return plat
            err = (r.stderr or "").strip().splitlines()
            log(f"backend probe {attempt} failed in {time.time() - t0:.0f}s:"
                f" {err[-1][:120] if err else 'no output'}")
        except subprocess.TimeoutExpired:
            log(f"backend probe {attempt} hung (>{probe_timeout:.0f}s); "
                "tunnel down")
        remaining = deadline - time.time()
        if remaining <= 0:
            log(f"backend never came up within {max_wait:.0f}s wait budget")
            return None
        pause = min(60.0, remaining)
        log(f"retrying in {pause:.0f}s ({remaining:.0f}s of wait budget "
            "left)")
        time.sleep(pause)


HBM_GBPS = 819.0          # v5e HBM bandwidth
MXU_BF16_TFLOPS = 394.0   # v5e bf16 peak


def measure_stages(view, projm, eps, scene_args, H, W, budget, live,
                   tanfovx, tanfovy):
    """Stage-prefix scan timings of the exact fast16 frame at (H, W),
    annotated with modeled HBM traffic -> achieved GB/s -> fraction of
    the 819 GB/s roofline (the blend also gets an MXU-utilization
    estimate). Mirrors scripts/profile_frame_stages.py, reduced to the
    stages that carry the time."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from langsplatv2_tpu.ops import (pallas_binning, pallas_blend,
                                     projection, rasterize_tiles)
    from langsplatv2_tpu.ops.rasterize import _pallas_supported

    interp = not _pallas_supported()

    (means_d, op_d, sc_d, rot_d, col_d, qw_d, qi_d, phi_d, gram_d) = \
        scene_args
    n = means_d.shape[0]
    gx, gy = -(-W // 16), -(-H // 16)
    num_tiles = gx * gy
    chunk = 256
    L, CB = 3, 64
    TOPK = qw_d.shape[1]
    NPOS_NEG = phi_d.shape[2]
    K = eps.shape[0]

    def pipeline(stage, view_i, means, scales, rots, ops, cols, qw, qi,
                 phi, gram):
        proj = projection.preprocess(
            means, scales, rots, None, None, cols, view_i, projm,
            jnp.zeros(3), tanfovx, tanfovy, W, H, 0, 1.0,
            opacities=ops[:, 0])
        if stage == "preprocess":
            return jnp.sum(proj.xy) + jnp.sum(proj.conic)
        rows = pallas_blend.pack_fast16_rows(
            proj.xy, proj.conic, ops[:, 0], proj.rgb, qw, qi)
        tile, depth, gauss, total = pallas_binning.expand_entries_pallas(
            proj, gx, gy, budget, opacities=ops[:, 0], exact_cull=True,
            interpret=interp)
        if stage == "expand":
            return jnp.sum(rows * rows) + jnp.sum(tile) + 1.0 * jnp.sum(gauss)
        keys = pallas_binning.pack_sort_keys(tile, depth, gauss, num_tiles)
        g_sorted, ts, tc, _ = pallas_binning.sorted_binning_from_keys(
            keys, num_tiles)
        if stage == "sort":
            return jnp.sum(g_sorted) * 1.0 + jnp.sum(tc) * 1.0
        gathered = rows[g_sorted]
        if stage == "gather":
            return jnp.sum(gathered * gathered)
        eg = pallas_blend.to_field_major(gathered, chunk)
        ef = jnp.zeros((1, eg.shape[1]), jnp.float32)
        tid = jnp.arange(num_tiles, dtype=jnp.int32)
        rgb_t, feat_t, t_t = pallas_blend.blend_tiles_pallas(
            eg, ef, ts, tc, tid, jnp.zeros(3), grid_x=gx, grid_y=gy,
            mode="quick", out_channels=L * CB, topk=TOPK, chunk=chunk,
            rowfmt="fast16", banded=True, interpret=interp)
        if stage == "blend":
            return jnp.sum(rgb_t[:, 0, 0]) + jnp.sum(feat_t[:, 0, 0])
        t, p, _ = feat_t.shape
        wm = feat_t.reshape(t * p, L, CB).astype(jnp.bfloat16)
        raw = jnp.einsum("qlk,lkp->lqp", wm, phi.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        wg = jnp.einsum("qlk,lkm->lqm", wm, gram.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        nrm2 = jnp.sum(wg * wm.transpose(1, 0, 2), axis=-1)
        sim = raw / (jnp.sqrt(jnp.maximum(nrm2, 0.0))[..., None] + 1e-10)
        return jnp.sum(rgb_t[:, 0, 0]) + jnp.sum(sim[:, 0, 0])

    def run(stage):
        @jax.jit
        def scanned(view, eps, *scene):
            def body(c, e):
                return c + pipeline(stage, view.at[3, 0].add(e),
                                    *scene), 0.0
            c, _ = lax.scan(body, 0.0, eps)
            return c

        t0 = time.time()
        _ = float(scanned(view, eps, *scene_args))
        compile_t = time.time() - t0
        t0 = time.time()
        _ = float(scanned(view, eps, *scene_args))
        dt = (time.time() - t0) / K * 1000
        log(f"stage prefix {stage:10s} compile {compile_t:5.1f}s "
            f"{dt:8.1f} ms")
        return dt

    order = ["preprocess", "expand", "sort", "gather", "blend", "query"]
    prefix = {s: run(s) for s in order}
    deltas, prev = {}, 0.0
    for s in order:
        deltas[s] = max(prefix[s] - prev, 0.0)
        prev = prefix[s]

    # Modeled HBM traffic per stage (bytes; see ROADMAP roofline): the
    # fraction-of-roofline column is what says "actually fast" vs "stalled".
    P = 256
    tp = num_tiles * P
    traffic = {
        "preprocess": n * 96,                    # params in + proj fields out
        "expand": n * 40 + budget * 24,          # rows pack + (t, d, g) out
        "sort": budget * 8 * 12,                 # XLA multi-pass 2-op u32
        "gather": live * 16 * 4 * 2,             # w16 rows read + write
        "blend": live * 16 * 4 + tp * (3 + L * CB + 1) * 4,
        "query": tp * L * CB * 2 + tp * L * NPOS_NEG * 4,
    }
    # Blend accumulate matmuls: [P, count] x [count, 192] per tile
    # => 2 * P * live * 192 FLOPs (bf16).
    blend_flops = 2.0 * P * live * (L * CB)
    out = {"load": {"H": H, "W": W, "budget": budget, "live": live},
           "stages": {}}
    for s in order:
        ms = deltas[s]
        gbps = traffic[s] / (ms * 1e-3) / 1e9 if ms > 0 else 0.0
        row = {"ms": round(ms, 2), "bytes_model": int(traffic[s]),
               "gbps": round(gbps, 1),
               "hbm_frac": round(gbps / HBM_GBPS, 4)}
        if s == "blend" and ms > 0:
            tf = blend_flops / (ms * 1e-3) / 1e12
            row["mxu_tflops"] = round(tf, 2)
            row["mxu_frac"] = round(tf / MXU_BF16_TFLOPS, 4)
        out["stages"][s] = row
    out["frame_ms_sum"] = round(sum(deltas.values()), 1)
    return out


def main():
    t_start = time.time()
    plat = wait_for_backend(
        max_wait=float(os.environ.get("LSV2_BENCH_WAIT", "900")))
    if plat is None:
        raise RuntimeError(
            "TPU backend unavailable after bounded wait "
            "(tunnel down; probes hung or errored — see stderr)")

    import jax
    import jax.numpy as jnp
    from langsplatv2_tpu.ops.rasterize import RasterizeSettings, rasterize

    log("devices:", jax.devices())

    # LERF-like scale: ~1M gaussians after 30k RGB iters; 1080p frame.
    # LSV2_BENCH_N / LSV2_BENCH_H / LSV2_BENCH_W: flow-smoke overrides
    # (CPU runs of the full bench path at toy scale); headline numbers are
    # only valid at the defaults.
    N = int(os.environ.get("LSV2_BENCH_N", 1_000_000))
    H = int(os.environ.get("LSV2_BENCH_H", 1080))
    W = int(os.environ.get("LSV2_BENCH_W", 1920))
    L, K, TOPK = 3, 64, 4
    NPOS, NNEG = 1, 4

    rng = np.random.default_rng(0)
    means = np.concatenate([
        rng.uniform(-4, 4, (N, 2)), rng.uniform(2.0, 12.0, (N, 1))
    ], axis=1).astype(np.float32)
    scales = rng.uniform(0.004, 0.04, (N, 3)).astype(np.float32)
    rotations = rng.normal(size=(N, 4)).astype(np.float32)
    opacities = rng.uniform(0.2, 0.95, (N, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    qw = rng.uniform(0, 1, (N, L * TOPK)).astype(np.float32)
    qw /= qw.sum(1, keepdims=True)
    qi = np.concatenate(
        [rng.integers(0, K, (N, TOPK)) + lvl * K for lvl in range(L)], axis=1
    ).astype(np.float32)
    codebooks = rng.normal(size=(L, K, 512)).astype(np.float32)

    fovy = math.radians(60)
    fovx = 2 * math.atan(math.tan(fovy / 2) * W / H)
    from langsplatv2_tpu.utils.camera_math import (
        get_world_to_view, get_projection_matrix)
    w2c = get_world_to_view(np.eye(3), np.zeros(3))
    view = jnp.asarray(w2c.T, jnp.float32)
    proj = jnp.asarray(w2c.T @ get_projection_matrix(0.01, 100, fovx, fovy).T,
                       jnp.float32)

    (means_d, op_d, sc_d, rot_d, col_d, qw_d, qi_d, cb_d) = jax.device_put((
        jnp.asarray(means), jnp.asarray(opacities), jnp.asarray(scales),
        jnp.asarray(rotations), jnp.asarray(colors), jnp.asarray(qw),
        jnp.asarray(qi), jnp.asarray(codebooks)))

    # Per-prompt-set constants (text encoded once, like the reference):
    # phi folds the codebooks into the phrase embeddings, gram normalizes.
    phrases = rng.normal(size=(NPOS + NNEG, 512)).astype(np.float32)
    phrases /= np.linalg.norm(phrases, axis=1, keepdims=True)
    phr_d = jax.device_put(jnp.asarray(phrases))
    phi_d = jnp.einsum("lkd,pd->lkp", cb_d, phr_d)            # [L, K, P+N]
    gram_d = jnp.einsum("lkd,lmd->lkm", cb_d, cb_d)           # [L, K, K]

    # Scene arrays are jit ARGUMENTS, not closures: closed-over device
    # arrays become inlined constants and blow up the remote compile
    # (~7 minutes measured vs ~1 with args).
    # Query route: UNFUSED (render weight-map tiles, then XLA bf16
    # einsums) is the measured default — the round-4 A/B put it 1-2.6%
    # ahead of the fused in-blend query on every load (1080p 9.08 vs
    # 8.89, 728p exact 16.94 vs 16.61, capped 728p 20.82 vs 20.29): the
    # fused epilogue competes with the blend for VPU/MXU cycles, while
    # the separate einsums run at high MXU efficiency and their extra
    # [T, P, 192] HBM round-trip is cheap (~1.4 GB at 96 GB/s achieved).
    # LSV2_FUSED_QUERY=1 flips back for A/B.
    UNFUSED_QUERY = os.environ.get("LSV2_FUSED_QUERY", "0") != "1"
    if not UNFUSED_QUERY:
        log("FUSED-query A/B enabled (LSV2_FUSED_QUERY=1)")
    # Unfused-query backend: Pallas one-pass query_map_tiles (default) vs
    # the XLA block-diag einsums (LSV2_XLA_QUERY=1, the round-4 path).
    XLA_QUERY = os.environ.get("LSV2_XLA_QUERY", "0") == "1"
    # bf16 operands = the MXU's native pass; CPU XLA (the flow smoke)
    # cannot execute bf16xbf16->f32 dots.
    MM_DT = (jnp.bfloat16 if jax.default_backend() != "cpu"
             else jnp.float32)

    def make_frame(settings):
        from langsplatv2_tpu.ops.rasterize import rasterize_quick_query

        @jax.jit
        def frame_query(view, proj, means_d, op_d, sc_d, rot_d, col_d,
                        qw_d, qi_d, phi_d, gram_d):
            """Production path: fast16 quick render with the Gram relevancy
            query FUSED into the blend kernel (the [T, P, 192] weight-map
            tiles never reach HBM — only [T, P, L*PQ] raw scores and
            [T, P, L] Gram norms do)."""
            if UNFUSED_QUERY:
                out = rasterize(
                    settings, means_d, op_d, view, proj,
                    jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                    scales=sc_d, rotations=rot_d, colors_precomp=col_d,
                    quick_weights=qw_d, quick_indices=qi_d,
                    quick_channels=L * K)
                rgb, total = out.rgb, out.total_entries
                live = (out.live_total if out.live_total is not None
                        else total)
                t, p, _ = out.feature_map.shape
                # Block-diagonal lifts: ONE [Q, L*K] x [L*K, L*(PQ+K)]-
                # shaped pair of matmuls instead of L batched einsums with
                # N=PQ(<=8) — the per-level form wastes >90% of each MXU
                # pass on N-padding (measured in the 728p query stage).
                if XLA_QUERY:
                    pq = phi_d.shape[2]
                    lk = L * K
                    phi_mat = jnp.zeros((lk, L * pq), MM_DT)
                    gram_mat = jnp.zeros((lk, lk), MM_DT)
                    for lvl in range(L):
                        phi_mat = phi_mat.at[
                            lvl * K:(lvl + 1) * K,
                            lvl * pq:(lvl + 1) * pq].set(
                                phi_d[lvl].astype(MM_DT))
                        gram_mat = gram_mat.at[
                            lvl * K:(lvl + 1) * K,
                            lvl * K:(lvl + 1) * K].set(
                                gram_d[lvl].astype(MM_DT))
                    wm = out.feature_map.reshape(t * p, lk).astype(MM_DT)
                    raw_t = jnp.einsum(
                        "qc,cd->qd", wm, phi_mat,
                        preferred_element_type=jnp.float32).reshape(t, p, -1)
                    wg = jnp.einsum(
                        "qc,cd->qd", wm, gram_mat,
                        preferred_element_type=jnp.float32)
                    nrm2_t = jnp.sum(
                        (wg * wm).reshape(t * p, L, K), axis=-1
                    ).reshape(t, p, L)
                else:
                    # Pallas one-pass query: the XLA einsums materialize
                    # the [Q, 192] f32 `wg` intermediate in HBM (~560 MB
                    # r+w at the 728p load — the query stage measured
                    # 6.9 ms at only 46.7 GB/s of USEFUL traffic);
                    # query_map_tiles keeps it in VMEM.
                    from langsplatv2_tpu.ops.pallas_query import \
                        query_map_tiles
                    raw_t, nrm2_t = query_map_tiles(
                        out.feature_map.astype(MM_DT), phi_d, gram_d,
                        interpret=jax.default_backend() == "cpu")
            else:
                rgb, raw_t, nrm2_t, final_t, radii, total, live = \
                    rasterize_quick_query(
                        settings, means_d, op_d, view, proj,
                        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                        scales=sc_d, rotations=rot_d, colors_precomp=col_d,
                        quick_weights=qw_d, quick_indices=qi_d,
                        phi=phi_d, gram=gram_d, quick_channels=L * K)
            t, p, _ = raw_t.shape
            raw = raw_t.reshape(t * p, L, NPOS + NNEG).transpose(1, 0, 2)
            nrm2 = nrm2_t.reshape(t * p, L).T                     # [L, Q]
            sim = raw / (jnp.sqrt(jnp.maximum(nrm2, 0.0))[..., None] + 1e-10)
            pos = sim[..., :NPOS]
            neg = sim[..., NPOS:]
            # Exact identity: softmax([p, n])[0] = sigmoid(10(p-n)) and the
            # min over negatives is the sigmoid against max(neg) — the
            # [L, Q, NPOS, NNEG, 2] broadcast stack never materializes.
            relev = jax.nn.sigmoid(
                10.0 * (pos - jnp.max(neg, axis=-1, keepdims=True)))
            # The user-facing heatmap image: [L*NPOS, H, W] assembly (tiny
            # channel count — unlike the 192-ch map this costs ~nothing).
            from langsplatv2_tpu.ops import rasterize_tiles
            heat = rasterize_tiles.tiles_to_image(
                relev.transpose(1, 0, 2).reshape(t, p, L * NPOS),
                settings.grid_x, settings.grid_y, H, W)
            return rgb, heat, total, live
        return frame_query

    settings0 = RasterizeSettings(
        image_height=H, image_width=W,
        tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2),
        sh_degree=0,
        max_entries=int(os.environ.get("LSV2_BENCH_BUDGET", 5_300_000)),
        impl="pallas",
        binning="sort", precision="bf16", assemble=False,
        # A/B knob for the bf16 VPU cell math (see profile_vpu_bf16.py);
        # flips the whole bench, including the headline scan.
        bf16_cells=bool(int(os.environ.get("LSV2_BF16_CELLS", "0"))))
    if settings0.bf16_cells:
        log("bf16 VPU cell math ENABLED (LSV2_BF16_CELLS=1)")

    scene_args = (means_d, op_d, sc_d, rot_d, col_d, qw_d, qi_d,
                  phi_d, gram_d)

    t0 = time.time()
    frame0 = make_frame(settings0)
    rgb, relev, tot, live = frame0(view, proj, *scene_args)
    _ = float(jnp.asarray(rgb[0, 0, 0]))
    tot, live = int(tot), int(live)
    log(f"compile+first frame: {time.time() - t0:.1f}s entries={tot} "
        f"live={live}")
    # Self-verifying probe (round-4 lesson: a silently saturated budget
    # measured a truncated frame as "faster"). Saturation is an ERROR.
    if tot >= settings0.max_entries:
        raise RuntimeError(
            f"probe budget saturated: entries {tot} >= budget "
            f"{settings0.max_entries}; raise LSV2_BENCH_BUDGET")
    log("rgb finite:", bool(jnp.isfinite(rgb).all()),
        "relevancy finite:", bool(jnp.isfinite(relev).all()))

    # Adaptive tight budgets: pay one recompile for an expand/sort sized to
    # the pre-cull total and a gather/blend sized to the post-cull LIVE
    # prefix (+7% headroom each, checked against overflow below).
    budget = min(-(-int(tot * 1.07) // 4096) * 4096,
                 settings0.max_entries)
    live_budget = min(-(-int(live * 1.07) // 4096) * 4096, budget)
    t0 = time.time()
    settings = settings0._replace(max_entries=budget,
                                  live_entries=live_budget)
    frame_tight = make_frame(settings)

    def frame_query(view, proj):
        return frame_tight(view, proj, *scene_args)

    rgb, relev, tot2, live2 = frame_query(view, proj)
    _ = float(jnp.asarray(rgb[0, 0, 0]))
    log(f"tight-budget recompile (total {budget}, live {live_budget}): "
        f"{time.time() - t0:.1f}s")
    if int(tot2) >= budget:
        raise RuntimeError(
            f"tight entry budget saturated ({int(tot2)} >= {budget}) - "
            "output would be truncated")
    if int(live2) > live_budget:
        raise RuntimeError(
            f"tight live budget saturated ({int(live2)} > {live_budget}) - "
            "far entries would be clamped")

    # Secondary: the reference's literal decode formulation — the quick
    # path of eval_lerf.py:210-218 renders the [192, H, W] weight map,
    # lifts it per level with one codebook einsum, and L2-normalizes to a
    # materialized [3, 512, H, W] CLIP feature map. Decoding from the
    # TILE layout (assemble=False) lets XLA fuse normalize + bf16 cast
    # into the matmul epilogue and the tile->image assembly into one
    # copy — no [C, H, W] 192-ch rewrite, no f32 [Q, L, 512] intermediate
    # (the old chunked transpose formulation measured 2.55 FPS at 1080p;
    # this is an output-bandwidth-bound op and should sit near the
    # weight-map frame rate).
    def make_decode_frame(dset, dH, dW):
        from langsplatv2_tpu.ops import rasterize_tiles

        mm_dt = MM_DT

        # The tile-row reshape below assumes the [T, P, C] tile layout;
        # assemble=True would return [C, H, W] and silently scramble it.
        assert not dset.assemble, "make_decode_frame requires tile layout"

        gx, gy = dset.grid_x, dset.grid_y

        @jax.jit
        def frame_decoded(view, proj, means_d, op_d, sc_d, rot_d, col_d,
                          qw_d, qi_d, cb):
            out = rasterize(
                dset, means_d, op_d, view, proj,
                jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
                scales=sc_d, rotations=rot_d, colors_precomp=col_d,
                quick_weights=qw_d, quick_indices=qi_d,
                quick_channels=L * K)
            # Stream the decode one tile-row at a time into a preallocated
            # bf16 image buffer (fori_loop carry -> in-place updates): at
            # 1080p the whole-frame [Q, L, 512] f32 intermediate is 12.7GB
            # and OOMs the 16GB HBM; per-row it is 190MB.
            ft = out.feature_map.reshape(gy, gx * 256, L, K)
            cbm = cb.astype(mm_dt)
            # Buffer sized EXACTLY [C, dH, dW]: a final crop of a
            # [C, gy*16, gx*16] buffer would copy the whole multi-GB map
            # (that copy is what OOM'd the first 1080p attempt). Row
            # writes clip to the image instead; the ragged last tile-row
            # is unrolled outside the loop for its static smaller shape.
            buf = jnp.zeros((L * CLIP_D, dH, dW), jnp.bfloat16)

            def rows_block(i0, nr):
                # nr STATIC tile-rows starting at dynamic row i0 ->
                # [C, nr*16, dW] bf16 (one [nr*gx*256, 64]@[64, 512]
                # batched matmul per level; nr=4 keeps the MXU fed and
                # cuts the loop-iteration count 4x vs per-row).
                wm = jax.lax.dynamic_slice_in_dim(
                    ft, i0, nr, 0).astype(mm_dt)     # [nr, gx*256, L, K]
                wm = wm.reshape(nr * gx * 256, L, K)
                feats = jnp.einsum(
                    "qlk,lkd->qld", wm, cbm,
                    preferred_element_type=jnp.float32)
                feats = feats * jax.lax.rsqrt(
                    jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-10)
                block = feats.astype(jnp.bfloat16).reshape(
                    nr, gx, 16, 16, L * CLIP_D)
                return block.transpose(4, 0, 2, 1, 3).reshape(
                    L * CLIP_D, nr * 16, gx * 16)[:, :, :dW]

            # RB=1 measured fastest on chip (12.68 FPS vs 10.64 at RB=2,
            # 7.96 at RB=4, profile_decode_rb.py): larger blocks make the
            # dynamic_update_slice strides worse, not the matmul better.
            RB = 1
            full_rows = dH // 16
            nb = full_rows // RB

            def body(b, buf):
                return jax.lax.dynamic_update_slice(
                    buf, rows_block(b * RB, RB), (0, b * RB * 16, 0))

            buf = jax.lax.fori_loop(0, nb, body, buf)
            done = nb * RB
            if full_rows - done:                     # static leftover rows
                buf = jax.lax.dynamic_update_slice(
                    buf, rows_block(done, full_rows - done),
                    (0, done * 16, 0))
            if dH % 16:                              # ragged last tile-row
                buf = jax.lax.dynamic_update_slice(
                    buf, rows_block(full_rows, 1)[:, :dH % 16, :],
                    (0, full_rows * 16, 0))
            return (out.rgb, buf.reshape(L, CLIP_D, dH, dW),
                    out.total_entries)
        return frame_decoded

    CLIP_D = cb_d.shape[-1]
    frame_decoded_impl = make_decode_frame(settings, H, W)

    def full_frame(view, proj):
        return frame_decoded_impl(view, proj, *scene_args[:7], cb_d)

    t0 = time.time()
    out = full_frame(view, proj)
    _ = float(jnp.asarray(out[0][0, 0, 0]))
    log(f"decode-path compile+first frame: {time.time() - t0:.1f}s")
    del out

    def fps_of(fn, n=10):
        out = None
        t0 = time.time()
        for _ in range(n):
            del out
            out = fn(view, proj)
        # Force one element of EVERY output (chained computations would
        # otherwise leave the last stage outside the timed window).
        for o in out:
            _ = float(jnp.asarray(o).ravel()[0])
        return n / (time.time() - t0)

    # LSV2_TRACE=<dir>: capture a jax.profiler trace of a few production
    # frames (the SURVEY §5 tracing facility; view with tensorboard or
    # xprof). Traced frames are excluded from the timed loops below.
    trace_dir = os.environ.get("LSV2_TRACE")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = frame_query(view, proj)
            for o in out:
                _ = float(jnp.asarray(o).ravel()[0])
        log(f"profiler trace written to {trace_dir}")

    fps_host = fps_of(frame_query)
    log(f"production path, host-dispatch loop: {fps_host:.2f} FPS "
        "(includes per-dispatch tunnel overhead)")
    fps_decode = fps_of(full_frame)
    log(f"full 512-d decode path: {fps_decode:.2f} FPS")

    # Device-side truth: K frames under ONE jit via lax.scan with per-frame
    # camera jitter (work is real, nothing leaves the device between
    # frames) — the dispatch/tunnel overhead of the loops above is excluded.
    KREP = 10
    jit_eps = jnp.asarray(
        np.linspace(0, 1e-6, KREP, dtype=np.float32))

    # Every on-device scan number is a median over >=3 repeated loops with
    # the min/max band recorded in the JSON: window-to-window chip variance
    # belongs in the artifact, not the commit message (round-4 VERDICT).
    BAND_LOOPS = max(3, int(os.environ.get("LSV2_BENCH_LOOPS", "3")))
    bands = {}

    def scan_band(name, run, krep=KREP, loops=BAND_LOOPS):
        vals = []
        for _ in range(loops):
            t0 = time.time()
            run()
            vals.append(krep / (time.time() - t0))
        vals.sort()
        med, mn, mx = vals[len(vals) // 2], vals[0], vals[-1]
        bands[name] = [round(mn, 2), round(med, 2), round(mx, 2)]
        return med, mn, mx

    @jax.jit
    def frames_scan(view, proj, eps, *scene):
        def body(carry, e):
            rgb, heat, tot, _live = frame_tight.__wrapped__(
                view.at[3, 0].add(e), proj, *scene)
            return carry + rgb[0, 0, 0] + heat[0, 0, 0], tot

        acc, tots = jax.lax.scan(body, 0.0, eps)
        return acc, tots

    t0 = time.time()
    acc, _ = frames_scan(view, proj, jit_eps, *scene_args)
    _ = float(acc)
    log(f"scan compile+first: {time.time() - t0:.1f}s")

    def _run_1080p():
        a, _ = frames_scan(view, proj, jit_eps, *scene_args)
        _ = float(a)

    fps, fps_mn, fps_mx = scan_band("fps_1080p", _run_1080p)
    log(f"production query path, on-device loop: {fps:.2f} FPS "
        f"[{fps_mn:.2f}..{fps_mx:.2f} over {BAND_LOOPS} loops]")

    # Secondary: reference-benchmark-equivalent LOAD. The 450+ FPS A100
    # claim is measured on trained LERF scenes at dataset resolution
    # (986x728 = 0.72MP, eval_lerf.py renders the scene cameras), not on
    # 1080p(2.07MP)/5M-entry frames — the headline above is a ~3x heavier
    # frame. Same scene, LERF-resolution camera: apples-to-apples per-chip
    # number against the title claim.
    lH = int(os.environ.get("LSV2_BENCH_LH", 728))
    lW = int(os.environ.get("LSV2_BENCH_LW", 986))
    lfovx = 2 * math.atan(math.tan(fovy / 2) * lW / lH)
    lproj = jnp.asarray(
        w2c.T @ get_projection_matrix(0.01, 100, lfovx, fovy).T, jnp.float32)
    # Probe budget generous enough that the adaptive tightening sees the
    # REAL total (round-4 found the old 2.6M probe budget saturated at
    # this load — entries==budget means far tiles were silently truncated
    # and the measured FPS was flattered).
    lprobe = int(os.environ.get("LSV2_BENCH_LBUDGET", 3_900_000))
    lset = settings0._replace(
        image_height=lH, image_width=lW, tanfovx=math.tan(lfovx / 2),
        max_entries=lprobe)
    frame_l0 = make_frame(lset)
    _, _, ltot, llive = frame_l0(view, lproj, *scene_args)
    ltot, llive = int(ltot), int(llive)
    if ltot >= lprobe:
        raise RuntimeError(
            f"lerf probe budget saturated (total {ltot} >= {lprobe}) - "
            "raise LSV2_BENCH_LBUDGET")
    lbudget = min(-(-int(ltot * 1.07) // 4096) * 4096, lprobe)
    llive_b = min(-(-int(llive * 1.07) // 4096) * 4096, lbudget)
    frame_lerf_settings = lset._replace(max_entries=lbudget,
                                        live_entries=llive_b)
    frame_lerf = make_frame(frame_lerf_settings)

    @jax.jit
    def frames_scan_lerf(view, proj, eps, *scene):
        def body(carry, e):
            rgb, heat, tot, _live = frame_lerf.__wrapped__(
                view.at[3, 0].add(e), proj, *scene)
            return carry + rgb[0, 0, 0] + heat[0, 0, 0], tot

        acc, tots = jax.lax.scan(body, 0.0, eps)
        return acc, tots

    t0 = time.time()
    acc, _ = frames_scan_lerf(view, lproj, jit_eps, *scene_args)
    _ = float(acc)
    log(f"lerf-load scan compile+first: {time.time() - t0:.1f}s "
        f"entries={ltot} live={llive}")
    def _run_lerf():
        a, _ = frames_scan_lerf(view, lproj, jit_eps, *scene_args)
        _ = float(a)

    fps_lerf, lmn, lmx = scan_band("reference_load_728p_fps", _run_lerf)
    log(f"reference-load (986x728) query path, on-device loop: "
        f"{fps_lerf:.2f} FPS [{lmn:.2f}..{lmx:.2f}]")

    # The reference's EXACT per-frame computation (render + codebook lift
    # + normalize, materialized [3, 512, H, W]) at the reference's own
    # eval load — the most literal apples-to-apples against the 450+ FPS
    # title claim.
    frame_lerf_decoded = make_decode_frame(frame_lerf_settings, lH, lW)

    @jax.jit
    def frames_scan_lerf_decoded(view, proj, eps, cb, *scene):
        def body(carry, e):
            rgb, fmap, tot = frame_lerf_decoded.__wrapped__(
                view.at[3, 0].add(e), proj, *scene, cb)
            return carry + rgb[0, 0, 0] + fmap[0, 0, 0, 0].astype(
                jnp.float32), tot

        acc, tots = jax.lax.scan(body, 0.0, eps)
        return acc, tots

    fps_lerf_decoded = 0.0
    try:
        t0 = time.time()
        acc, _ = frames_scan_lerf_decoded(view, lproj, jit_eps, cb_d,
                                          *scene_args[:7])
        _ = float(acc)
        log(f"lerf-load decode scan compile+first: {time.time() - t0:.1f}s")

        def _run_lerf_dec():
            a, _ = frames_scan_lerf_decoded(view, lproj, jit_eps, cb_d,
                                            *scene_args[:7])
            _ = float(a)

        fps_lerf_decoded, dmn, dmx = scan_band("decode_728p_fps",
                                               _run_lerf_dec)
        log(f"reference-load (986x728) full decode path, on-device loop: "
            f"{fps_lerf_decoded:.2f} FPS [{dmn:.2f}..{dmx:.2f}]")
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        log("lerf decode scan failed; continuing")

    # Per-stage attribution + roofline utilization (VERDICT round-3 #7):
    # stage-prefix lax.scan timings at the REFERENCE load (986x728), each
    # with modeled HBM traffic -> achieved GB/s -> fraction of the v5e's
    # 819 GB/s, plus MXU utilization for the blend. Skipped past the
    # deadline so a cold-compile day still lands the headline numbers.
    stages_block = None
    elapsed = time.time() - t_start
    deadline = float(os.environ.get("LSV2_BENCH_STAGE_DEADLINE", "1500"))
    if os.environ.get("LSV2_BENCH_STAGES", "1") == "0":
        pass
    elif elapsed > deadline:
        log(f"skipping stage attribution: {elapsed:.0f}s elapsed > "
            f"{deadline:.0f}s deadline (headline numbers landed first)")
    else:
        try:
            stages_block = measure_stages(
                view, lproj, jit_eps, scene_args,
                lH, lW, lbudget, int(llive), math.tan(lfovx / 2),
                math.tan(fovy / 2))
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
            log("stage attribution failed; continuing")

    # Opt-in approximate mode: budget-capped regular binning
    # (settings.tile_budget) — the sorted-row gather and blend become
    # dense [T, cap] fetches; quality bound by the per-sub-box
    # transmittance budget (see RasterizeSettings docstring). Secondary
    # number; the headline stays the exact path.
    fps_capped = 0.0
    fps_capped_lerf = 0.0
    try:
        # Defaults match the quality-validated capped config (budget 1e-6 /
        # cap 128): what the eval-metric pin validates (relevancy-mask IoU
        # vs exact >= 0.95, test_capped_relevancy_iou) and what
        # serve.backend uses when the opt-in mode is enabled (it ships
        # tile_budget=0.0, i.e. exact, by default; cap defaults to 128).
        tb = float(os.environ.get("LSV2_TILE_BUDGET", "1e-6"))
        tcap = int(os.environ.get("LSV2_TILE_CAP", "128"))
        tsub = int(os.environ.get("LSV2_TILE_SUBDIV", "2"))
        # Capped-mode exact-cull threshold (settings.cull_alpha): the
        # IoU-gated default for the approximate serving mode is decided by
        # the on-chip A/B (LSV2_CULL_ALPHA to override).
        tca = float(os.environ.get("LSV2_CULL_ALPHA", str(1.0 / 255.0)))
        frame_capped = make_frame(settings._replace(
            tile_budget=tb, tile_budget_cap=tcap,
            tile_budget_subdiv=tsub, cull_alpha=tca))

        @jax.jit
        def frames_scan_capped(view, proj, eps, *scene):
            def body(carry, e):
                rgb, heat, tot, _live = frame_capped.__wrapped__(
                    view.at[3, 0].add(e), proj, *scene)
                return carry + rgb[0, 0, 0] + heat[0, 0, 0], tot

            acc, tots = jax.lax.scan(body, 0.0, eps)
            return acc, tots

        t0 = time.time()
        _rgb_c, _heat_c, _tot_c, live_c = frame_capped(
            view, proj, *scene_args)
        _ = float(jnp.asarray(_rgb_c[0, 0, 0]))
        log(f"capped-mode compile+first: {time.time() - t0:.1f}s "
            f"kept={int(live_c)} (budget {tb:g}, cap {tcap})")
        t0 = time.time()
        acc, _ = frames_scan_capped(view, proj, jit_eps, *scene_args)
        _ = float(acc)
        log(f"capped scan compile+first: {time.time() - t0:.1f}s")

        def _run_capped():
            a, _ = frames_scan_capped(view, proj, jit_eps, *scene_args)
            _ = float(a)

        fps_capped, cmn, cmx = scan_band("capped_mode_fps", _run_capped)
        log(f"budget-capped (approx) query path, on-device loop: "
            f"{fps_capped:.2f} FPS [{cmn:.2f}..{cmx:.2f}]")

        # Capped at the REFERENCE load (986x728) — the validated serving
        # config at the resolution the 450 FPS title claim describes.
        frame_capped_l = make_frame(frame_lerf_settings._replace(
            tile_budget=tb, tile_budget_cap=tcap,
            tile_budget_subdiv=tsub))

        @jax.jit
        def frames_scan_capped_l(view, proj, eps, *scene):
            def body(carry, e):
                rgb, heat, tot, _live = frame_capped_l.__wrapped__(
                    view.at[3, 0].add(e), proj, *scene)
                return carry + rgb[0, 0, 0] + heat[0, 0, 0], tot

            acc, tots = jax.lax.scan(body, 0.0, eps)
            return acc, tots

        t0 = time.time()
        acc, _ = frames_scan_capped_l(view, lproj, jit_eps, *scene_args)
        _ = float(acc)
        log(f"capped 728p scan compile+first: {time.time() - t0:.1f}s")

        def _run_capped_l():
            a, _ = frames_scan_capped_l(view, lproj, jit_eps, *scene_args)
            _ = float(a)

        fps_capped_lerf, c7mn, c7mx = scan_band("capped_728p_fps",
                                                _run_capped_l)
        log(f"budget-capped (approx) 986x728 query path, on-device loop: "
            f"{fps_capped_lerf:.2f} FPS [{c7mn:.2f}..{c7mx:.2f}]")
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        log("capped-mode bench failed; continuing with exact numbers")

    # Temporal-coherence serving (round-5, ops/temporal.py): freeze the
    # budget-capped binning at a reference pose, then render steady frames
    # along a smooth camera path with ONLY the dense per-entry EWA + blend
    # + fused query — no expansion / sort / budget / slice / gather (the
    # measured majority of the capped frame). Reports the steady-frame
    # device rate, the rebin (bin-frame) rate, the effective rate at a
    # rebin-every-10 policy, and the error-vs-pose-delta curve that
    # justifies the serving threshold (relevancy max|err| + mask IoU vs a
    # fresh capped render at the same pose).
    fps_t_steady = fps_t_bin = fps_t_eff = 0.0
    temporal_err_curve = None
    elapsed = time.time() - t_start
    if os.environ.get("LSV2_BENCH_TEMPORAL", "1") == "0":
        pass
    elif elapsed > float(os.environ.get("LSV2_BENCH_SERVE_DEADLINE", "2700")):
        log(f"skipping temporal bench: {elapsed:.0f}s elapsed")
    else:
        try:
            from langsplatv2_tpu.ops import temporal as temporal_ops

            tb = float(os.environ.get("LSV2_TILE_BUDGET", "1e-6"))
            tcap = int(os.environ.get("LSV2_TILE_CAP", "128"))
            tsub = int(os.environ.get("LSV2_TILE_SUBDIV", "2"))
            tset = frame_lerf_settings._replace(
                tile_budget=tb, tile_budget_cap=tcap,
                tile_budget_subdiv=tsub)

            @jax.jit
            def bin_cache_fn(view, proj, means, op, sc, rot, col, qw, qi):
                cache, _ = temporal_ops.quick_bin_cache(
                    tset, means, op, view, proj, jnp.zeros(3, jnp.float32),
                    scales=sc, rotations=rot, colors_precomp=col,
                    quick_weights=qw, quick_indices=qi)
                return cache

            t0 = time.time()
            tc_cache = jax.block_until_ready(
                bin_cache_fn(view, lproj, *scene_args[:7]))
            log(f"temporal bin-frame compile+first: {time.time() - t0:.1f}s")

            # Smooth orbit: per-frame yaw of ~2 px at the 728p load.
            lf_px = 0.5 * lW / math.tan(lfovx / 2)

            def pose_at(theta):
                c, s = math.cos(theta), math.sin(theta)
                rot_w2c = np.asarray(w2c).copy()
                ry = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                              np.float32)
                rot_w2c[:3, :3] = ry @ rot_w2c[:3, :3]
                v = jnp.asarray(rot_w2c.T, jnp.float32)
                p = jnp.asarray(
                    rot_w2c.T @ get_projection_matrix(
                        0.01, 100, lfovx, fovy).T, jnp.float32)
                return v, p

            step = 2.0 / lf_px
            path = [pose_at(step * (i + 1)) for i in range(KREP)]
            views_t = jnp.stack([v for v, _ in path])
            projs_t = jnp.stack([p for _, p in path])

            @jax.jit
            def steady_scan(cache, views, projs, phi, gram):
                def body(carry, vp):
                    v, p = vp
                    rgb_t, raw, nrm2, _t = \
                        temporal_ops.rasterize_quick_steady(
                            tset, cache, v, p, jnp.zeros(3, jnp.float32),
                            quick_channels=L * K, topk=L * TOPK,
                            phi=phi, gram=gram)
                    return carry + rgb_t[0, 0, 0] + raw[0, 0, 0], 0.0

                acc, _ = jax.lax.scan(body, 0.0, (views, projs))
                return acc

            t0 = time.time()
            acc = steady_scan(tc_cache, views_t, projs_t, phi_d, gram_d)
            _ = float(acc)
            log(f"temporal steady scan compile+first: {time.time() - t0:.1f}s")

            def _run_steady():
                a = steady_scan(tc_cache, views_t, projs_t, phi_d, gram_d)
                _ = float(a)

            fps_t_steady, tmn, tmx = scan_band("temporal_steady_728p_fps",
                                               _run_steady)
            log(f"temporal steady frames (986x728, frozen binning): "
                f"{fps_t_steady:.2f} FPS [{tmn:.2f}..{tmx:.2f}]")

            # Bin-frame rate (host-dispatch; the binning pipeline dominates
            # so dispatch overhead is secondary here).
            NB = 5
            t0 = time.time()
            for i in range(NB):
                tc2 = bin_cache_fn(views_t[i], projs_t[i], *scene_args[:7])
            jax.block_until_ready(tc2)
            fps_t_bin = NB / (time.time() - t0)
            fps_t_eff = 10.0 / (9.0 / fps_t_steady + 1.0 / fps_t_bin)
            log(f"temporal rebin frames: {fps_t_bin:.2f} FPS; effective at "
                f"rebin-every-10: {fps_t_eff:.2f} FPS")

            # Error-vs-pose-delta: relevancy map of a steady frame at
            # delta px vs a FRESH capped render at the same pose.
            def relev_of(raw_t, nrm2_t):
                t, p, _ = raw_t.shape
                raw = np.asarray(raw_t).reshape(t * p, L, NPOS + NNEG)
                nrm = np.sqrt(np.maximum(
                    np.asarray(nrm2_t).reshape(t * p, L), 0.0))
                sim = raw / (nrm[..., None] + 1e-10)
                pos, neg = sim[..., :NPOS], sim[..., NPOS:]
                pair = np.stack([
                    np.broadcast_to(pos[..., None], pos.shape + (NNEG,)),
                    np.broadcast_to(neg[:, :, None, :],
                                    pos.shape + (NNEG,))], axis=-1)
                ex = np.exp(10.0 * (pair - pair.max(-1, keepdims=True)))
                return (ex[..., 0] / ex.sum(-1)).min(-1)

            from langsplatv2_tpu.ops.rasterize import rasterize_quick_query

            @jax.jit
            def steady_q(cache, v, p, phi, gram):
                return temporal_ops.rasterize_quick_steady(
                    tset, cache, v, p, jnp.zeros(3, jnp.float32),
                    quick_channels=L * K, topk=L * TOPK, phi=phi,
                    gram=gram)

            @jax.jit
            def fresh_q(v, p, means, op, sc, rot, col, qw, qi, phi, gram):
                return rasterize_quick_query(
                    tset, means, op, v, p, jnp.zeros(3, jnp.float32),
                    jnp.zeros(3, jnp.float32), scales=sc, rotations=rot,
                    colors_precomp=col, quick_weights=qw, quick_indices=qi,
                    phi=phi, gram=gram, quick_channels=L * K)

            temporal_err_curve = []
            for px in (1.0, 2.0, 4.0, 8.0, 16.0):
                v, p = pose_at(px / lf_px)
                _, raw_s, nrm_s, _ = steady_q(tc_cache, v, p, phi_d, gram_d)
                fq = fresh_q(v, p, *scene_args[:7], phi_d, gram_d)
                raw_f, nrm_f = fq[1], fq[2]
                r_s, r_f = relev_of(raw_s, nrm_s), relev_of(raw_f, nrm_f)
                m_s, m_f = r_s > 0.5, r_f > 0.5
                union = np.logical_or(m_s, m_f).sum()
                iou = (np.logical_and(m_s, m_f).sum() / union
                       if union else 1.0)
                d = np.abs(r_s - r_f)
                temporal_err_curve.append({
                    "px": px, "max_err": round(float(d.max()), 4),
                    "mean_err": round(float(d.mean()), 6),
                    "mask_iou": round(float(iou), 4)})
                log(f"temporal err @ {px:4.1f}px: max {d.max():.4f} "
                    f"mean {d.mean():.6f} IoU {iou:.4f}")
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
            log("temporal bench failed; continuing")

    # Serve-loop FPS (VERDICT round-3 #8): the real BackendRenderer
    # dispatch/finalize seam at the reference load — device-composited u8
    # heatmap frames + host JPEG encode, synchronous (REQ/REP semantics)
    # vs depth-2 double-buffered (run_pipelined semantics, frame N+1's
    # dispatch overlapping frame N's device compute + readback).
    serve_sync_fps = serve_pipe_fps = serve_static_fps = 0.0
    serve_worker_fps = serve_temporal_fps = 0.0
    elapsed = time.time() - t_start
    serve_deadline = float(os.environ.get("LSV2_BENCH_SERVE_DEADLINE",
                                          "2700"))
    if os.environ.get("LSV2_BENCH_SERVE", "1") == "0":
        pass
    elif elapsed > serve_deadline:
        log(f"skipping serve-loop bench: {elapsed:.0f}s elapsed > "
            f"{serve_deadline:.0f}s deadline")
    else:
        try:
            import cv2  # noqa: F401  (JPEG encode availability)
            from langsplatv2_tpu.models.gaussians import GaussianModel
            from langsplatv2_tpu.serve.backend import BackendRenderer
            from langsplatv2_tpu.eval.openclip import OpenCLIPNetwork

            C0 = 0.28209479177387814
            model = GaussianModel(
                xyz=means_d,
                features_dc=((col_d - 0.5) / C0)[:, None, :],
                features_rest=jnp.zeros((N, 0, 3), jnp.float32),
                scaling=jnp.log(sc_d),
                rotation=rot_d,
                opacity=jnp.log(op_d / (1.0 - op_d)),
                live=jnp.ones((N,), bool),
                quick_weights=qw_d, quick_indices=qi_d, codebooks=cb_d,
                active_sh_degree=0, max_sh_degree=0)
            backend = BackendRenderer(
                model, clip_model=OpenCLIPNetwork(backend="hash"),
                max_entries=lbudget, compose="device")
            c2w0 = np.linalg.inv(np.asarray(w2c))

            def req_at(i):
                c2w = c2w0.copy()
                c2w[0, 3] += 1e-6 * i
                return {"c2w": c2w.tolist(), "width": lW, "height": lH,
                        "fov_y": fovy, "prompt": "object",
                        "show_heatmap": True, "threshold": -10.0}

            t0 = time.time()
            img = backend.finalize_frame(
                backend.dispatch_request(req_at(0)), as_uint8=True)
            _ = backend._encode_jpeg(img)
            log(f"serve compile+first frame: {time.time() - t0:.1f}s")

            NS = 12
            t0 = time.time()
            for i in range(NS):
                img = backend.finalize_frame(
                    backend.dispatch_request(req_at(i + 1)), as_uint8=True)
                backend._encode_jpeg(img)
            serve_sync_fps = NS / (time.time() - t0)
            log(f"serve loop (synchronous, 986x728 heatmap+jpeg): "
                f"{serve_sync_fps:.2f} FPS")

            from collections import deque
            q = deque()
            t0 = time.time()
            for i in range(NS):
                q.append(backend.dispatch_request(req_at(100 + i)))
                if len(q) >= 2:
                    backend._encode_jpeg(backend.finalize_frame(
                        q.popleft(), as_uint8=True))
            while q:
                backend._encode_jpeg(backend.finalize_frame(
                    q.popleft(), as_uint8=True))
            serve_pipe_fps = NS / (time.time() - t0)
            log(f"serve loop (depth-2 pipelined, 986x728 heatmap+jpeg): "
                f"{serve_pipe_fps:.2f} FPS")

            # Finalize-worker overlap (round-5 VERDICT #3): readback +
            # JPEG encode run on a worker thread (both release the GIL),
            # so dispatch N+1 proceeds while frame N is fetched/encoded —
            # the run_pipelined serving loop's actual structure.
            q.clear()
            t0 = time.time()
            for i in range(NS):
                q.append(backend.finalize_async(
                    backend.dispatch_request(req_at(200 + i))))
                if len(q) >= 2:
                    q.popleft().result()
            while q:
                q.popleft().result()
            serve_worker_fps = NS / (time.time() - t0)
            log(f"serve loop (finalize-worker overlap): "
                f"{serve_worker_fps:.2f} FPS")

            # Temporal-reuse serving loop: smooth 1px/frame camera path
            # through a temporal backend (steady frames reuse the frozen
            # binning; rebin when the estimated motion exceeds 4px).
            try:
                tbackend = BackendRenderer(
                    model, clip_model=OpenCLIPNetwork(backend="hash"),
                    max_entries=lbudget, compose="device",
                    tile_budget=float(os.environ.get(
                        "LSV2_TILE_BUDGET", "1e-6")),
                    temporal_reuse_px=4.0, reuse_zref=2.0)
                lf_px2 = 0.5 * lW / math.tan(lfovx / 2)

                def treq_at(i):
                    th = 1.0 * i / lf_px2
                    c2w = c2w0.copy()
                    cth, sth = math.cos(th), math.sin(th)
                    ry = np.array([[cth, 0, sth], [0, 1, 0],
                                   [-sth, 0, cth]], np.float64)
                    c2w[:3, :3] = ry @ c2w[:3, :3]
                    return {"c2w": c2w.tolist(), "width": lW, "height": lH,
                            "fov_y": fovy, "prompt": "object",
                            "show_heatmap": True, "threshold": -10.0}

                img = tbackend.finalize_frame(
                    tbackend.dispatch_request(treq_at(0)), as_uint8=True)
                tbackend._encode_jpeg(img)
                # Warm the STEADY-frame jit too (sub-threshold 0.2px pose
                # delta): the pose-0 warmup above only compiles the rebin
                # path, and a compile inside the timed loop under-reports
                # the loop by ~4x (measured 0.48 vs ~2 FPS).
                tbackend.finalize_frame(
                    tbackend.dispatch_request(treq_at(0.2)), as_uint8=True)
                log(f"serve temporal compile done "
                    f"({tbackend.cache_hits})")
                q.clear()
                t0 = time.time()
                for i in range(NS):
                    q.append(tbackend.finalize_async(
                        tbackend.dispatch_request(treq_at(i + 1))))
                    if len(q) >= 2:
                        q.popleft().result()
                while q:
                    q.popleft().result()
                serve_temporal_fps = NS / (time.time() - t0)
                log(f"serve loop (temporal reuse, 1px/frame path): "
                    f"{serve_temporal_fps:.2f} FPS  "
                    f"cache {tbackend.cache_hits}")
            except Exception:
                import traceback
                traceback.print_exc(file=sys.stderr)
                log("temporal serve loop failed; continuing")

            # Temporal coherence (round-4): static pose, changing prompt —
            # the pose cache replays the cached blend output through the
            # query+compose tail only. This is the dominant real serving
            # pattern (the viser frontend repolls an unchanged camera at
            # 100 Hz while the user reads/types).
            prompts = ["object", "things", "stuff", "texture"]
            for p in prompts:            # warm per-prompt CLIP/phi caches
                r = req_at(0); r["prompt"] = p
                backend.finalize_frame(backend.dispatch_request(r))
            t0 = time.time()
            for i in range(NS):
                r = req_at(0)
                r["prompt"] = prompts[i % len(prompts)]
                img = backend.finalize_frame(
                    backend.dispatch_request(r), as_uint8=True)
                backend._encode_jpeg(img)
            serve_static_fps = NS / (time.time() - t0)
            log(f"serve loop (static pose, prompt changes, pose-cache): "
                f"{serve_static_fps:.2f} FPS  cache {backend.cache_hits}")
        except Exception:
            import traceback
            traceback.print_exc(file=sys.stderr)
            log("serve-loop bench failed; continuing")

    result = {
        "metric": "language_feature_render_fps_1080p",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "decode_path_fps": round(fps_decode, 2),
        "reference_load_728p_fps": round(fps_lerf, 2),
        "decode_728p_fps": round(fps_lerf_decoded, 2),
        "capped_mode_fps": round(fps_capped, 2),
        "capped_728p_fps": round(fps_capped_lerf, 2),
        "entries": tot,
        "serve_sync_fps": round(serve_sync_fps, 2),
        "serve_pipelined_fps": round(serve_pipe_fps, 2),
        "serve_static_pose_fps": round(serve_static_fps, 2),
        "serve_worker_fps": round(serve_worker_fps, 2),
        "serve_temporal_fps": round(serve_temporal_fps, 2),
        # Temporal-coherence serving (frozen [T, cap] binning, steady
        # frames = dense EWA + blend + fused query only).
        "temporal_steady_728p_fps": round(fps_t_steady, 2),
        "temporal_rebin_fps": round(fps_t_bin, 2),
        "temporal_eff_fps_rebin10": round(fps_t_eff, 2),
        "temporal_err_curve": temporal_err_curve,
        # [min, median, max] FPS over the repeated on-device loops —
        # the window-variance band, in the artifact itself.
        "bands": bands,
        "band_loops": BAND_LOOPS,
    }
    if stages_block is not None:
        result["stages_728p"] = stages_block
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit the JSON contract line
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "language_feature_render_fps_1080p",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": str(e)[:200],
        }))
