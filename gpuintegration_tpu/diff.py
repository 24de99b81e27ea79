"""Differentiable integration: ``jax.grad`` / ``jax.vmap`` over integrand
parameters.

Beyond-reference capability (the reference's harness answers "how does
the integral change with model parameters?" by re-running whole demo
executables over parameter grids, SURVEY.md section 2.6); here the
estimator itself is a JAX function of the parameters, so parameter
derivatives cost one backward pass and parameter scans are one ``vmap``.

Both entry points differentiate at a FROZEN discretization -- PAGANI's
region mesh or VEGAS's importance grid is data, not a function of the
parameters (the standard discretize-then-differentiate regime):

* ``fixed_mesh_integral``: the Genz-Malik rule estimate over a fixed
  region pool (a uniform mesh, or the adapted pool stashed by
  ``Workspace.make_checkpoint``).  The returned gradient is the EXACT
  derivative of the cubature estimator on that mesh; its fidelity to
  dI/dtheta is the same rule-convergence question as the estimate's.
* ``frozen_grid_estimate``: an unbiased importance-sampled MC estimate
  on a frozen VEGAS grid.  Sample positions depend on (grid, key) only,
  so E[d/dtheta f] = d/dtheta I exactly, with the variance reduction of
  the trained grid.

Adaptivity (which regions were refined / how the grid was trained) is
intentionally outside the differentiation path: region selection is
piecewise-constant in theta, so its "gradient" is zero almost
everywhere and differentiating through it would only add noise.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.pagani import region_pool
from gpuintegration_tpu.types import Volume


def mesh_from_checkpoint(ck) -> tuple[np.ndarray, np.ndarray]:
    """(lows, lengths) region-major (n, ndim), unit space, from a
    ``Workspace.make_checkpoint()`` snapshot -- the adapted mesh as data.

    The checkpoint holds the ACTIVE pool: regions the run already retired
    (compacted into the finished ledger) are not in it.  To capture a
    complete partition of the volume, adapt with tolerances out of reach
    (``epsrel=1e-12, epsabs=1e-200``) for a few ``max_iterations`` so no
    region retires -- then every leaf of the bisection tree is present
    and the frozen estimate integrates the WHOLE volume."""
    return np.asarray(ck.lows), np.asarray(ck.lengths)


def fixed_mesh_integral(
    integrand: Callable,
    ndim: int,
    regions: tuple | None = None,
    *,
    partitions_per_axis: int | None = None,
    vol: Volume | None = None,
    dtype=jnp.float64,
):
    """Build ``est_fn(theta) -> (estimate, errorest)`` over a fixed mesh.

    ``integrand``: ``f(x, theta)`` with ``x`` batched ``(..., ndim)`` and
    ``theta`` any pytree of arrays/scalars.  ``est_fn`` is traceable:
    compose with ``jax.jit`` / ``jax.grad`` / ``jax.vmap`` freely --
    ``jax.vmap(est_fn)(theta_batch)`` is a whole parameter scan in one
    dispatch, ``jax.grad(lambda t: est_fn(t)[0])`` the sensitivity.

    ``regions``: region-major ``(n, ndim)`` (lows, lengths) in UNIT space
    (e.g. ``mesh_from_checkpoint``); or pass ``partitions_per_axis`` for a
    uniform mesh.  The mesh is baked into the closure as dims-major
    device constants (region-major pools lane-pad on TPU; the transpose
    happens on host -- region_pool.py layout invariant).
    """
    dtype = jnp.dtype(dtype)
    if vol is None:
        vol = Volume(ndim=ndim)
    if (regions is None) == (partitions_per_axis is None):
        raise ValueError("pass exactly one of regions / partitions_per_axis")
    if regions is not None:
        lo_rm = np.asarray(regions[0], dtype)
        ln_rm = np.asarray(regions[1], dtype)
        if lo_rm.ndim != 2 or lo_rm.shape[1] != ndim:
            raise ValueError(
                f"regions must be region-major (n, {ndim}); "
                f"got {lo_rm.shape}")
        lows = jnp.asarray(lo_rm.T)       # host transpose: dims-major
        lengths = jnp.asarray(ln_rm.T)
    else:
        parts = int(partitions_per_axis)
        n = parts ** ndim
        lows, lengths, _ = region_pool.uniform_split(ndim, parts, n, dtype)
    tables = rule_eval.rule_tables(ndim, dtype.name)
    global_lo = jnp.asarray(vol.lows, dtype)
    global_range = jnp.asarray(vol.highs - vol.lows, dtype)

    def est_fn(theta):
        est, err, _ = rule_eval.apply_rule(
            lambda x: integrand(x, theta), tables, lows, lengths,
            global_lo, global_range)
        return jnp.sum(est), jnp.sum(err)

    return est_fn


def train_grid(
    integrand: Callable,
    ndim: int,
    *,
    theta=None,
    ncall: float = 1e6,
    adjust_iters: int = 10,
    vol: Volume | None = None,
    seed: int = 0,
    nbins: int | None = None,
    dtype=jnp.float64,
):
    """Run VEGAS grid adjustment at a pilot ``theta`` and return the
    trained ``xi`` edges ``(ndim, nbins+1)`` for ``frozen_grid_estimate``.
    Any monotone grid gives an unbiased frozen estimator; training at one
    theta only affects variance at nearby thetas."""
    from gpuintegration_tpu.mcubes import grid as vgrid
    from gpuintegration_tpu.mcubes.vegas import VegasState, vegas
    nbins = nbins or vgrid.NDMX
    st = VegasState(xi=vgrid.uniform_grid(ndim, nbins, jnp.dtype(dtype)))
    f = integrand if theta is None else (lambda x: integrand(x, theta))
    vegas(f, epsrel=0.0, epsabs=0.0, ncall=ncall, vol=vol, ndim=ndim,
          total_iters=adjust_iters, adjust_iters=adjust_iters,
          skip_iters=adjust_iters, seed=seed, dtype=dtype, nbins=nbins,
          state=st)
    return st.xi


def frozen_grid_estimate(
    integrand: Callable,
    xi,
    ndim: int,
    *,
    ncall: float = 1e6,
    vol: Volume | None = None,
    dtype=jnp.float64,
):
    """Build ``est_fn(theta, key) -> (estimate, errorest)``: an unbiased
    importance-sampled estimate on the FROZEN grid ``xi``, differentiable
    in ``theta``.

    Per sample and dimension a bin is drawn uniformly and a point placed
    uniformly inside it; the importance weight is ``nbins * bin_width``
    per dimension (the VEGAS map with uniform bin selection -- unbiased
    for any monotone grid).  Bin edges are fetched with the gather-free
    two-level one-hot lookup shared with the production sampler
    (mcubes.vegas._edge_lookup; coordinates are f32-granular there too).
    The same ``key`` gives the same samples, so finite differences of
    ``est_fn`` in ``theta`` use common random numbers and converge to the
    analytic gradient.
    """
    from gpuintegration_tpu.mcubes.vegas import _edge_lookup
    dtype = jnp.dtype(dtype)
    if vol is None:
        vol = Volume(ndim=ndim)
    xi32 = jnp.asarray(xi, jnp.float32)
    nbins = int(xi32.shape[1]) - 1
    n = int(ncall)
    jac = vol.jacobian
    regn_lo = jnp.asarray(vol.lows, dtype)
    dx = jnp.asarray(np.asarray(vol.highs) - np.asarray(vol.lows), dtype)

    def est_fn(theta, key):
        kb, ku = jax.random.split(jnp.asarray(key))
        ia = jax.random.randint(kb, (1, n, ndim), 1, nbins + 1,
                                dtype=jnp.int32)
        u = jax.random.uniform(ku, (1, n, ndim), jnp.float32)
        lo, hi = _edge_lookup(xi32, ia, nbins)         # (1, n, ndim) f32
        width = hi - lo
        x_unit = (lo + u * width).astype(dtype)
        x = regn_lo + x_unit[0] * dx                   # (n, ndim)
        w = jnp.prod(width.astype(dtype)[0] * nbins, axis=-1) * jac
        fx = integrand(x, theta) * w
        est = jnp.mean(fx)
        var = jnp.sum((fx - est) ** 2) / (n * (n - 1.0))
        return est, jnp.sqrt(var)

    return est_fn
