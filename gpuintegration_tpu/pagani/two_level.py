"""Two-level error refinement and finished/active classification.

Vectorised re-expression of the RefineError kernel
(reference: cuda/pagani/quad/GPUquad/Phases.cuh:219-268, launched from
hybrid.cuh:11-45).  Each child's raw null-rule error is inflated by the
discrepancy between (self + sibling) and the parent estimate:

    diff = |(self + sibling - parent) / 4|
    err' = err * (1 + 2*diff/(self_err + sibl_err)) + diff

and a region is *finished* (inactive) when err' < max(epsrel*|est|, 1e-200).

Optionally the finished test adds a volume-apportioned absolute term
``abs_per_vol * vol_region`` (beyond-reference).  The reference's purely
relative criterion can never retire a region whose estimate is ~0 -- on
oscillatory integrands the regions straddling zero crossings refine
forever and spread inflated errors across the whole pool (the 8D
f1_oscillatory certificate wall, docs/VALIDATION.md section 2b).  Retired
regions are disjoint and their unit-space volumes sum to <= 1, so the
error banked through this term is globally bounded by ``abs_per_vol``
-- callers budget it as a fraction of epsrel*|integral| (see
Workspace.integrate(finish_abs_per_vol=); the partitioned
continuation's dynamic slice targets set it automatically).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.pagani.region_pool import block_mask


def refine_error(
    estimates: jax.Array,      # (cap,) child integral estimates
    errorests: jax.Array,      # (cap,) child raw errors
    parent_estimates: jax.Array,  # (cap_parent >= cap//2,) compacted parents
    n: jax.Array,              # traced number of real children (= 2*parents)
    epsrel,
    relerr_classification: bool = True,
    volumes=None,              # (cap,) unit-space region volumes
    abs_per_vol=None,          # scalar: absolute error budget per unit volume
):
    """Returns (refined_errorests (cap,), active (cap,) float 0/1 masked to n).

    Child layout: BLOCKED at the static pool half (region_pool.split) --
    parent i's left child is slot i, its right child slot i + cap/2, so
    the sibling lookup is a static roll by cap/2 and the parent index is
    slot % (cap/2), a tile.  (The reference pairs at the traced region
    count instead, Phases.cuh:239-243, which would need dynamic gathers
    here -- those serialize on TPU.)
    """
    cap = estimates.shape[0]
    half = cap // 2

    def other_block(a):
        return jnp.concatenate([a[half:], a[:half]])

    self_err = errorests
    self_res = estimates
    sibl_err = other_block(errorests)
    sibl_res = other_block(estimates)
    par_res = jnp.tile(parent_estimates[:half], 2)

    diff = jnp.abs(0.25 * (sibl_res + self_res - par_res))
    err_sum = self_err + sibl_err
    inflated = jnp.where(
        err_sum > 0.0, self_err * (1.0 + 2.0 * diff / err_sum), self_err)
    refined = inflated + diff

    mask = block_mask(cap, n, blocked=True)
    refined = jnp.where(mask, refined, 0.0)

    if relerr_classification:
        # floor must be representable in the pool dtype: the reference's
        # 1e-200 literal (hybrid.cuh) underflows to 0 in f32, where a
        # zero-estimate region could then never finish
        floor = max(1e-200, float(np.finfo(estimates.dtype).tiny))
        max_err = jnp.maximum(epsrel * jnp.abs(self_res), floor)
        if abs_per_vol is not None:
            # volume-apportioned absolute retirement (module docstring).
            # Padded slots replicate region 0's volume (workspace pads by
            # broadcasting), so this CAN mark them finished -- harmless
            # only because `active` is gated on `mask` below; never bank
            # off `finished` alone.
            max_err = jnp.maximum(max_err, abs_per_vol * volumes)
        finished = refined < max_err
    else:
        finished = jnp.zeros_like(refined, dtype=bool)
    active = jnp.where(mask & ~finished, 1.0, 0.0).astype(estimates.dtype)
    return refined, active


def refine_error_vector(
    estimates: jax.Array,      # (ncomp, cap) child integral estimates
    errorests: jax.Array,      # (ncomp, cap) child raw errors
    parent_estimates: jax.Array,  # (ncomp, cap_parent >= cap//2)
    n: jax.Array,
    epsrel,
    relerr_classification: bool = True,
    volumes=None,              # (cap,) unit-space region volumes
    abs_per_vol=None,          # scalar: shared by all components
):
    """Vector-valued twin of ``refine_error``: the inflation runs per
    component (same formulas, component-major arrays), and a region is
    finished only when EVERY component's refined error meets its own
    tolerance (CUBA's all-components convergence semantics,
    cubacpp/integrand_traits.hh:81-93).  Returns (refined (ncomp, cap),
    active (cap,))."""
    cap = estimates.shape[1]
    half = cap // 2

    def other_block(a):
        return jnp.concatenate([a[:, half:], a[:, :half]], axis=1)

    self_err = errorests
    self_res = estimates
    sibl_err = other_block(errorests)
    sibl_res = other_block(estimates)
    par_res = jnp.tile(parent_estimates[:, :half], (1, 2))

    diff = jnp.abs(0.25 * (sibl_res + self_res - par_res))
    err_sum = self_err + sibl_err
    inflated = jnp.where(
        err_sum > 0.0, self_err * (1.0 + 2.0 * diff / err_sum), self_err)
    refined = inflated + diff

    mask = block_mask(cap, n, blocked=True)
    refined = jnp.where(mask[None, :], refined, 0.0)

    if relerr_classification:
        floor = max(1e-200, float(np.finfo(estimates.dtype).tiny))
        max_err = jnp.maximum(epsrel * jnp.abs(self_res), floor)
        if abs_per_vol is not None:
            max_err = jnp.maximum(max_err, (abs_per_vol * volumes)[None, :])
        finished = jnp.all(refined < max_err, axis=0)
    else:
        finished = jnp.zeros((cap,), bool)
    active = jnp.where(mask & ~finished, 1.0, 0.0).astype(estimates.dtype)
    return refined, active
