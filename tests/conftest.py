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

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
