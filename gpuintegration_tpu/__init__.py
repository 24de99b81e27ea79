"""gpuintegration_tpu: TPU-native numerical-integration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Fermilab's
gpuintegration library (PAGANI adaptive cubature + mcubes/VEGAS Monte
Carlo), built TPU-first: batched rule evaluation as MXU matmuls, the
adaptive loop over fixed-shape padded region pools, deterministic
reductions instead of atomics, counter-based PRNG, and jax.sharding for
multi-chip scale-out.
"""
import os

import jax

# High-accuracy cubature (1e-6..1e-9 relative tolerances) requires f64
# accumulation; enable x64 unless the embedding application opts out.
if not os.environ.get("GPUINT_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# TPU f64 emulation makes some kernels expensive to compile (~10-100 s);
# persist compiled executables across processes so each (integrand, shape)
# pays that cost once per machine, not once per run.
if not os.environ.get("GPUINT_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "GPUINT_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/gpuintegration_tpu/jax"))
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpuintegration_tpu.types import IntegrationResult, Volume, unit_volume  # noqa: E402
from gpuintegration_tpu.integrand import make_integrand  # noqa: E402
from gpuintegration_tpu.pagani.workspace import Workspace  # noqa: E402
from gpuintegration_tpu.diff import (  # noqa: E402
    fixed_mesh_integral, frozen_grid_estimate, mesh_from_checkpoint,
    train_grid)

__all__ = [
    "IntegrationResult",
    "Volume",
    "unit_volume",
    "make_integrand",
    "Workspace",
    "fixed_mesh_integral",
    "frozen_grid_estimate",
    "mesh_from_checkpoint",
    "train_grid",
]

__version__ = "0.1.0"
