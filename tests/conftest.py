"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; real multi-chip TPU hardware is not
available in CI, so we force the host platform with 8 virtual devices
(mirrors how the reference tests everything single-GPU,
test/cuda/pagani/CMakeLists.txt, while we additionally cover sharding).

The axon TPU plugin self-registers in sitecustomize and pins
JAX_PLATFORMS=axon, so env vars alone don't switch platforms; overriding
jax_platforms through jax.config after import (but before first backend
use) does.
"""
import os

# No persistent compile cache under pytest: CPU compiles are cheap, and
# reading a disk-cached executable back has segfaulted inside
# jax compilation_cache.get_executable twice on this box (always at the
# same continuation test).  The cache exists for the TPU's expensive f64
# emulation compiles; the suite doesn't need it.
os.environ.setdefault("GPUINT_TPU_NO_COMPILE_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop all live jit executables after each test module.

    The full one-process suite deterministically segfaults inside
    XLA:CPU's backend_compile_and_load after ~215 accumulated
    compilations (4/4 runs, always the same next compile; the same test
    passes in isolation and the crash needs no disk cache).  Clearing
    the in-memory executable caches at module boundaries keeps the
    accumulated compiler state below the trigger; cross-module cache
    reuse is minimal (different functions/shapes), so the cost is
    seconds."""
    yield
    jax.clear_caches()
