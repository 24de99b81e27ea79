"""Two-level error refinement and finished/active classification.

Vectorised re-expression of the RefineError kernel
(reference: cuda/pagani/quad/GPUquad/Phases.cuh:219-268, launched from
hybrid.cuh:11-45).  Each child's raw null-rule error is inflated by the
discrepancy between (self + sibling) and the parent estimate:

    diff = |(self + sibling - parent) / 4|
    err' = err * (1 + 2*diff/(self_err + sibl_err)) + diff

and a region is *finished* (inactive) when err' < max(epsrel*|est|, 1e-200).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def refine_error(
    estimates: jax.Array,      # (cap,) child integral estimates
    errorests: jax.Array,      # (cap,) child raw errors
    parent_estimates: jax.Array,  # (cap_parent >= cap//2,) compacted parents
    n: jax.Array,              # traced number of real children (= 2*parents)
    epsrel,
    relerr_classification: bool = True,
):
    """Returns (refined_errorests (cap,), active (cap,) float 0/1 masked to n).

    Child layout: left children in [0, n/2), right children in [n/2, n)
    with parent index = child index mod n/2 (Phases.cuh:239-243).
    """
    cap = estimates.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    half = n // 2
    in_right = ids >= half
    sibling = jnp.where(in_right, ids - half, ids + half)
    sibling = jnp.clip(sibling, 0, cap - 1)
    parent = jnp.where(in_right, ids - half, ids)
    parent = jnp.clip(parent, 0, parent_estimates.shape[0] - 1)

    self_err = errorests
    self_res = estimates
    sibl_err = errorests[sibling]
    sibl_res = estimates[sibling]
    par_res = parent_estimates[parent]

    diff = jnp.abs(0.25 * (sibl_res + self_res - par_res))
    err_sum = self_err + sibl_err
    inflated = jnp.where(
        err_sum > 0.0, self_err * (1.0 + 2.0 * diff / err_sum), self_err)
    refined = inflated + diff

    mask = ids < n
    refined = jnp.where(mask, refined, 0.0)

    if relerr_classification:
        max_err = jnp.maximum(epsrel * jnp.abs(self_res), 1e-200)
        finished = refined < max_err
    else:
        finished = jnp.zeros_like(refined, dtype=bool)
    active = jnp.where(mask & ~finished, 1.0, 0.0).astype(estimates.dtype)
    return refined, active


def first_iteration_active(estimates, errorests, n, epsrel,
                           relerr_classification: bool = True):
    """Active flags when no parents exist yet (iteration 0): the reference
    skips RefineError entirely and leaves all regions active
    (hybrid.cuh:26-28 returns early; active was pre-set to 1 in
    PaganiUtils.cuh:310-311)."""
    cap = estimates.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
    mask = ids < n
    return jnp.where(mask, 1.0, 0.0).astype(estimates.dtype)
