"""Test env: force CPU with 8 virtual devices (the standard TPU-less way to
exercise pjit/psum/mesh code paths) before jax initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pre-imports jax and forces jax_platforms="axon,cpu";
# override after import so tests run on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"

# Persistent compile cache across suite runs (the suite's wall clock is
# dominated by re-compiling the same tiny train/sample programs every run).
# Subprocess-driven tests inherit the env var and warm the same cache
# (the package honors it at import). Opt out: DMN_TEST_NO_CACHE=1.
# test_compile_cache.py re-points the cache but restores it (cache_reset).
if os.environ.get("DMN_TEST_NO_CACHE", "0") != "1":
    os.environ.setdefault("DMN_COMPILE_CACHE_DIR", "/tmp/dmn_test_xla_cache")
    from diffusion_model_nemo_tpu.utils.compile_cache import (  # noqa: E402
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache(
        os.environ["DMN_COMPILE_CACHE_DIR"], min_compile_time_secs=0.5
    )

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
