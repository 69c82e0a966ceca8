"""langsplatv2_tpu — a TPU-native language Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of LangSplatV2
(high-dimensional 3D language Gaussian splatting, arXiv 2507.07136):

- ``utils``    — SH evaluation, camera/projection math, losses, LR schedules,
                 sparse-coefficient (softmax top-k) codes.
- ``ops``      — the differentiable rasterizer: projection/preprocess, tile
                 binning via key sort, MXU-friendly per-tile blending, codebook
                 decode; Pallas kernels for the hot path.
- ``models``   — the Gaussian scene model as a pytree with static padded
                 capacity, densify/prune, checkpoint schema.
- ``scene``    — COLMAP/PLY/Blender IO, cameras, scene assembly.
- ``train``    — jitted training steps (RGB phase + language-feature phase),
                 config system, trainers.
- ``parallel`` — device-mesh sharding of tiles/Gaussians, multi-host.
- ``eval``     — OpenCLIP relevancy, LERF / 3D-OVS / Mip-NeRF360 benchmarks.
- ``serve``    — ZMQ render server + viser frontend.

Design notes (TPU-first, not a CUDA port):
The reference's CUDA rasterizer blends each pixel sequentially front-to-back.
Here the blend is reformulated: per tile, the blend-weight matrix
``W[p, j] = alpha_j(p) * T_j(p)`` is built in parallel on the VPU (the
transmittance cumulative product becomes ``exp(cumsum(log1p(-alpha)))``) and
the accumulation over RGB + K language-coefficient channels becomes a single
MXU matmul ``W @ features``. Binning replaces the GPU radix sort with
``lax.sort`` over packed (tile, depth) keys; backward replaces CUDA atomics
with deterministic segment-sums.
"""

__version__ = "0.1.0"

CLIP_DIM = 512  # CLIP ViT-B-16 feature dimension (reference preprocess.py:28-30)


def _honor_jax_platforms_env() -> None:
    """Make the JAX_PLATFORMS env var effective even under sitecustomize.

    This environment pre-imports jax at interpreter startup (axon TPU PJRT
    plugin registration), after which the JAX_PLATFORMS environment variable
    of a *subprocess* is silently ignored — `JAX_PLATFORMS=cpu python ...`
    still lands on the tunneled TPU. Backend initialization is lazy, so
    re-applying the env var to jax.config at package import (before any
    device is touched) restores the documented env-var contract. CLI tests
    rely on this to run their subprocesses on the host CPU instead of
    contending for the single real chip over the tunnel.
    """
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    # "axon" is this environment's baseline (exported for every process by
    # the kernel env), not a user override — re-applying it here would
    # clobber an explicit jax.config.update("jax_platforms", ...) made
    # before this package was imported (e.g. the test conftest forcing cpu).
    if not plat or plat == "axon":
        return
    try:
        import jax

        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except Exception:  # backend already initialized (too late) — leave it
        pass


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for every entry point.

    The reference pays zero compile cost; on TPU the cold jit of the
    rasterizer pipeline is tens of seconds — this makes it once per
    machine instead of once per process (bench/train/serve/eval all import
    this package). Opt out with LSV2_NO_COMPILE_CACHE=1; relocate with
    LSV2_COMPILE_CACHE_DIR. Measured caveat (ROADMAP): this dev
    environment's remote-compile axon backend writes entries but does not
    hit them — the cache pays off on standard TPU VMs and the CPU backend
    (including repeat test-suite runs), where XLA compiles locally.
    """
    import os

    if os.environ.get("LSV2_NO_COMPILE_CACHE"):
        return
    if (os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
            and os.environ.get("JAX_PLATFORMS", "").lower() != "cpu"):
        # Remote-compile environments build executables on a DIFFERENT
        # machine (observed: AOT CPU results carrying AMX/prefer-no-gather
        # features this host lacks — XLA warns of possible SIGILL), and the
        # TPU path never hits the cache there anyway (measured, ROADMAP).
        # Persisting those executables across processes is a correctness
        # risk, not a speedup — skip. Exception: a process PINNED to the
        # CPU backend (JAX_PLATFORMS=cpu — e.g. the test suite's CLI
        # subprocesses) compiles locally, where caching is safe and is
        # what keeps repeat suite runs fast.
        return
    try:
        import jax

        d = os.environ.get(
            "LSV2_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "langsplatv2_tpu", "xla"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # LSV2_CACHE_MIN_COMPILE: the test suite lowers this to ~0.2s so its
        # CLI SUBPROCESSES (tiny-scene compiles, mostly 0.5-2s each) hit the
        # cache on repeat runs; 2s is the right production default (entries
        # below that cost about as much to read as to recompile).
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(os.environ.get("LSV2_CACHE_MIN_COMPILE",
                                               "2.0")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unsupported jax version / read-only FS — run uncached
        pass


_honor_jax_platforms_env()
_enable_compilation_cache()
