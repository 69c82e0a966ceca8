"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Note: this environment pre-imports jax in sitecustomize (axon TPU plugin),
so setting JAX_PLATFORMS via os.environ is too late. Backend *initialization*
is still lazy, so jax.config.update + XLA_FLAGS set here (before any test
touches a device) reliably force an 8-device CPU platform. The suite must be
deterministic and must not occupy the TPU chip (bench.py owns it); run with
LSV2_TEST_PLATFORM=tpu to exercise hardware explicitly.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", os.environ.get("LSV2_TEST_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache for the suite: the big sharding/training
# parity tests are COMPILE-dominated (100-200s each on one CPU core), so a
# warm cache is what keeps repeat suite runs fast. The package-level guard
# (langsplatv2_tpu._enable_compilation_cache) skips caching when
# PALLAS_AXON_REMOTE_COMPILE is set because TPU executables there are built
# remotely; the suite forces the CPU backend, whose jits compile locally
# (verified: the whole suite compiles with the TPU tunnel down), so caching
# is safe here. Opt out with LSV2_NO_COMPILE_CACHE=1.
if (os.environ.get("LSV2_TEST_PLATFORM", "cpu") == "cpu"
        and not os.environ.get("LSV2_NO_COMPILE_CACHE")):
    _cache_dir = os.environ.get(
        "LSV2_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "langsplatv2_tpu", "xla-cpu-tests"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # 0.2s threshold: the suite (and its CLI SUBPROCESSES, which
        # inherit these env vars) compiles many 0.5-2s tiny-scene programs
        # that the 2s production default refuses to cache.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        os.environ.setdefault("LSV2_CACHE_MIN_COMPILE", "0.2")
        os.environ.setdefault("LSV2_COMPILE_CACHE_DIR", _cache_dir)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    if os.environ.get("LSV2_TEST_PLATFORM", "cpu") == "cpu":
        assert jax.devices()[0].platform == "cpu", jax.devices()
        assert len(jax.devices()) == 8, jax.devices()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)
