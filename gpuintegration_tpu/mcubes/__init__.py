"""m-CUBES / VEGAS Monte Carlo integration (public surface).

Mirrors the reference's cuda_mcubes namespace entry points
(reference: cuda/mcubes/vegasT.cuh:1023-1135 integrate/simple_integrate).
``vegas`` stays the submodule (full-control entry point lives at
``vegas.vegas``).
"""
from gpuintegration_tpu.mcubes import vegas  # noqa: F401  (submodule)
from gpuintegration_tpu.mcubes.vegas import (  # noqa: F401
    VegasState,
    integrate,
    simple_integrate,
)

__all__ = ["VegasState", "integrate", "simple_integrate", "vegas"]
