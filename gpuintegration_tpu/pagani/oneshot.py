"""One-shot rule application over a caller-supplied region set.

Re-expression of Cubature_rules::apply_cubature_integration_rules's public
overload (reference: cuda/pagani/quad/GPUquad/PaganiUtils.cuh:243-289):
apply the Genz-Malik rule once to every region and reduce -- the "forward
pass" used by the reference's profiling path (call_cubature_rules,
new_time_and_call.cuh:30-70) and by callers who manage their own
subdivision.

Also provides the per-evaluation capture of debug>=2 builds
(quad::Func_Evals, Func_Eval.cuh:8-64): points and integrand values for
every (region, rule-point) pair.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.types import IntegrationResult, Volume


def apply_cubature_rules(
    integrand: Callable,
    lows,
    lengths,
    vol: Volume | None = None,
    *,
    ndim: int | None = None,
    dtype=jnp.float64,
    compute_error: bool = True,
) -> tuple[IntegrationResult, jax.Array, jax.Array, jax.Array]:
    """Evaluate the rule on regions (unit-space lows/lengths) mapped onto
    ``vol``; returns (result, per_region_estimates, per_region_errors,
    split_dims).  result.errorest is +inf when compute_error=False
    (PaganiUtils.cuh:280-288 parity).

    Accepts regions as (n, ndim) [user convention] or dims-major
    (ndim, n) [internal pool convention]; disambiguated by matching
    ``ndim``."""
    lows = jnp.asarray(lows, dtype)
    lengths = jnp.asarray(lengths, dtype)
    if ndim is None:
        # Prefer the integrand's arity (unambiguous); a shape heuristic
        # like min(shape) silently mis-orients e.g. 3 regions in 5-D.
        from gpuintegration_tpu.integrand import _positional_arity
        arity = _positional_arity(integrand)
        if arity is not None and arity > 1:
            ndim = arity
        elif getattr(integrand, "ndim", None) is not None:
            ndim = int(integrand.ndim)
        elif lows.shape[0] == lows.shape[1]:
            raise ValueError("square region array: pass ndim explicitly")
        else:
            ndim = int(lows.shape[1])  # user convention: (n, ndim)
    if ndim not in lows.shape:
        raise ValueError(
            f"region array shape {tuple(lows.shape)} has no axis of "
            f"length ndim={ndim}")
    if lows.shape[0] != ndim:        # region-major input -> dims-major
        lows = lows.T
        lengths = lengths.T
    n = lows.shape[1]
    f, ndim = make_integrand(integrand, ndim)
    if vol is None:
        vol = Volume(ndim=ndim)
    tables = rule_eval.rule_tables(ndim, jnp.dtype(dtype).name)
    gl = jnp.asarray(vol.lows, dtype)
    gr = jnp.asarray(vol.highs - vol.lows, dtype)
    est, err, sdim = rule_eval.apply_rule(f, tables, lows, lengths, gl, gr)
    res = IntegrationResult(
        estimate=float(jnp.sum(est)),
        errorest=float(jnp.sum(err)) if compute_error else float("inf"),
        nregions=n,
        neval=n * tables.feval,
        status=-1,
    )
    return res, est, err, sdim


def classify_with_heuristic(
    heuristic_id: int,
    estimates,
    errorests,
    epsrel: float,
    epsabs: float = 1e-40,
    *,
    parent_estimates=None,
    parent_errorests=None,
    finished_estimate: float = 0.0,
    finished_errorest: float = 0.0,
    depth: int = 1,
    total_nregions: int | None = None,
    min_iter_reached: bool = True,
):
    """Phase-1 heuristic region classification over a one-shot evaluated
    pool: the caller runs ``apply_cubature_rules``, then this policy
    switch decides which regions terminate (the reference's
    quad::ApplyHeuristic placement -- Phases.cuh:71-155 classifies
    during phase 1, before the modern Workspace loop existed; the
    Workspace pipeline subsumes it with the two-level test + memory
    classifier).  Returns a boolean ``finished`` array.

    ``parent_*`` default to the regions' own values (a root pool has no
    parents -- same effect as the reference seeding parent arrays with
    the region's own result on the first pass)."""
    from gpuintegration_tpu.pagani.heuristics import apply_heuristic
    est = jnp.asarray(estimates)
    err = jnp.asarray(errorests)
    n = est.shape[0]
    leaves = jnp.sum(est) + finished_estimate
    queued_err = jnp.sum(err)
    par_res = est if parent_estimates is None else jnp.asarray(
        parent_estimates)
    par_err = err if parent_errorests is None else jnp.asarray(
        parent_errorests)
    return apply_heuristic(
        heuristic_id, leaves, finished_estimate, jnp.sum(est),
        finished_errorest, queued_err, n,
        total_nregions if total_nregions is not None else n,
        jnp.asarray(min_iter_reached), par_res, par_err,
        jnp.asarray(float(depth)), est, err, epsrel, epsabs)


@dataclasses.dataclass
class FuncEvals:
    """Per-evaluation record battery (reference: Func_Eval.cuh:8-64 +
    the CSV printers in PaganiUtils.cuh:130-241)."""

    points: np.ndarray       # (nregions, feval, ndim) evaluation points
    values: np.ndarray       # (nregions, feval) integrand values
    region_lows: np.ndarray  # (nregions, ndim) unit-space bounds
    region_lengths: np.ndarray

    def to_csv(self, outfile):
        nreg, feval, ndim = self.points.shape
        cols = ["reg", "fid"]
        cols += [f"dim{d}low" for d in range(ndim)]
        cols += [f"dim{d}high" for d in range(ndim)]
        cols += [f"dim{d}" for d in range(ndim)]
        cols += ["feval"]
        print(",".join(cols), file=outfile)
        for r in range(nreg):
            lo = self.region_lows[r]
            hi = lo + self.region_lengths[r]
            for p in range(feval):
                row = [str(r), str(p)]
                row += [f"{v:.17e}" for v in lo]
                row += [f"{v:.17e}" for v in hi]
                row += [f"{v:.17e}" for v in self.points[r, p]]
                row += [f"{self.values[r, p]:.17e}"]
                print(",".join(row), file=outfile)


def apply_cubature_rules_vector(
    integrand: Callable,
    lows,
    lengths,
    vol: Volume | None = None,
    *,
    ndim: int,
    ncomp: int,
    dtype=jnp.float64,
) -> tuple[np.ndarray, np.ndarray]:
    """Vector-valued rule application: ``integrand`` maps (..., ndim) to
    (..., ncomp) and all components are integrated in one sweep over the
    shared point set (the cubacpp integrand_traits array<double,N> /
    vector<double> capability, integrand_traits.hh:81-93 -- which the
    reference's GPU layer itself lacks).

    Returns (estimates (ncomp,), per-region estimates (R, ncomp))."""
    # delegate to the production vector rule path: dims-major pools,
    # component-major outputs, per-orbit segment-sum contraction (the
    # previous inline version materialized a region-major (R, P, ncomp)
    # small-minor-axis intermediate and contracted with a per-point f64
    # dot -- both banned by the pool-layout/contraction invariants)
    lows = np.asarray(lows, np.dtype(jnp.dtype(dtype).name))
    lengths = np.asarray(lengths, lows.dtype)
    if lows.shape[0] == ndim and lows.shape[1] != ndim:
        lows, lengths = lows.T, lengths.T    # accept dims-major pools
    if vol is None:
        vol = Volume(ndim=ndim)
    dt = jnp.dtype(dtype)
    tables = rule_eval.rule_tables(ndim, dt.name)
    gl = jnp.asarray(vol.lows, dt)
    gr = jnp.asarray(np.asarray(vol.highs) - np.asarray(vol.lows), dt)
    probe = jax.eval_shape(integrand,
                           jax.ShapeDtypeStruct((3, ndim), dt))
    if len(probe.shape) != 2 or probe.shape[-1] != ncomp:
        raise ValueError(f"integrand returns {probe.shape}, expected "
                         f"(..., {ncomp})")
    est, _, _ = rule_eval.apply_rule(
        integrand, tables, jnp.asarray(lows.T), jnp.asarray(lengths.T),
        gl, gr, ncomp=ncomp)                             # (ncomp, R)
    per_region = np.asarray(est).T                       # (R, ncomp)
    return per_region.sum(axis=0), per_region


def capture_func_evals(
    integrand: Callable,
    lows,
    lengths,
    vol: Volume | None = None,
    *,
    ndim: int | None = None,
    dtype=jnp.float64,
    max_regions: int = 1024,
) -> FuncEvals:
    """Record every evaluation point and value for a (small) region set --
    the debug>=2 path of the reference (PaganiUtils.cuh:304-334 caps at
    1024 regions too, :136)."""
    lows = np.asarray(lows, np.float64)
    lengths = np.asarray(lengths, np.float64)
    n, nd = lows.shape
    if n > max_regions:
        raise ValueError(f"capture limited to {max_regions} regions")
    if ndim is None:
        ndim = nd
    f, ndim = make_integrand(integrand, ndim)
    if vol is None:
        vol = Volume(ndim=ndim)
    tables = rule_eval.rule_tables(ndim, jnp.dtype(dtype).name)
    gl = np.asarray(vol.lows)
    gr = np.asarray(vol.highs - vol.lows)
    center = lows + 0.5 * lengths
    x = (gl + (center[:, None, :]
               - tables.gen[None, :tables.feval, :] * lengths[:, None, :])
         * gr)
    vals = np.asarray(f(jnp.asarray(x, dtype)))
    return FuncEvals(points=x, values=vals, region_lows=lows,
                     region_lengths=lengths)
