"""Suave-equivalent entry point: subregion-adaptive importance sampling.

The reference exposes CUBA's Suave through its CPU layer
(reference: cubacpp/cubacpp/suave.hh SuaveIntegrate).  Suave's algorithm
-- importance-sample each subregion with a separable VEGAS-style grid,
estimate + error per region, bisect the worst regions, repeat -- is
exactly the structure of this framework's VEGAS-assisted PAGANI hybrid
(pagani.vegas_assisted: per-region adaptive importance grids inside the
adaptive subdivision loop), so ``suave`` is a thin configuration of the
same machinery with Monte-Carlo-appropriate defaults.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from gpuintegration_tpu.pagani.workspace import Workspace
from gpuintegration_tpu.types import IntegrationResult, Volume


def suave(
    integrand: Callable,
    epsrel: float = 1e-3,
    epsabs: float = 1e-12,
    vol: Volume | None = None,
    *,
    ndim: int | None = None,
    nnew: int = 1280,
    passes: int = 4,
    max_iterations: int = 50,
    seed: int = 0,
    workspace: Workspace | None = None,
) -> IntegrationResult:
    """Subregion-adaptive MC integration (SuaveIntegrate analogue).

    ``nnew``: fresh samples per region per refinement pass (Suave's NNEW
    knob); split-dimension selection still uses the cubature rule's
    fourth-difference (a strictly better-informed choice than Suave's
    fluctuation split)."""
    from gpuintegration_tpu.integrand import make_integrand
    _, nd = make_integrand(integrand, ndim)
    ws = workspace or Workspace(nd)
    return ws.integrate(
        integrand, epsrel, epsabs, vol,
        vegas_assisted=True,
        vegas_passes=passes,
        vegas_samples_per_pass=max(nnew // passes, 64),
        max_iterations=max_iterations,
        seed=seed)
