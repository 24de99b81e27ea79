"""Device-mesh helpers.

The reference is single-process single-GPU (SURVEY.md section 2.7); its
scale-out axis on TPU is pure data parallelism over the PAGANI region pool
and the VEGAS sub-cube lattice.  One 1-D mesh axis ("r") suffices: rule
evaluation and sampling are embarrassingly parallel, and the only
collectives the algorithms need are all-reduces of estimate/errorest/
active-count and of the tiny VEGAS histogram (SURVEY.md section 5.8).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REGION_AXIS = "r"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (REGION_AXIS,))


def region_sharding(mesh: Mesh) -> NamedSharding:
    """Region/cube-axis sharding for (R,) per-region arrays."""
    return NamedSharding(mesh, P(REGION_AXIS))


def pool_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for dims-major (ndim, R) pool arrays: split the region
    (minor) axis."""
    return NamedSharding(mesh, P(None, REGION_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
