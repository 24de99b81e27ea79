"""Region-termination heuristic policies (legacy surface).

Re-expression of quad::ApplyHeuristic (reference:
cuda/pagani/quad/GPUquad/Phases.cuh:71-155), the pre-Workspace code
path's switch of region-termination policies (heuristicID 0-10).  The
modern pipeline classifies via the two-level relative-error test plus the
memory-pressure classifier; these policies are retained for parity and
for experimentation, as a vectorisable classifier over region batches.
"""
from __future__ import annotations

import jax.numpy as jnp


def apply_heuristic(
    heuristic_id: int,
    leaves_estimate,
    finished_estimate,
    queued_estimate,
    finished_errorest,
    queued_errorest,
    curr_iter_regions,
    total_nregions,
    min_iter_reached,
    par_res,
    par_err,
    depth,
    self_res,
    self_err,
    epsrel,
    epsabs,
):
    """Vectorised over per-region arrays (self_res/self_err/par_*);
    returns a boolean 'finished' verdict per region.

    Policy semantics follow Phases.cuh:110-153; ids 0/1 never finish a
    region on heuristic grounds, 2/4 finish error-dominated cheap regions,
    7 budget-caps, 8/9 are or/and small-contribution tests, 10 is the
    depth-scaled test."""
    global_err_target = jnp.abs(leaves_estimate) * epsrel
    remain_room = global_err_target - finished_errorest - queued_errorest

    err_bigger_case = (
        (self_err > jnp.abs(self_res))
        & (self_err / jnp.abs(self_res) >= 0.9 * par_err / jnp.abs(par_res))
        & (self_err < remain_room / curr_iter_regions))

    if heuristic_id in (0, 1):
        good = jnp.zeros_like(self_res, dtype=bool)
    elif heuristic_id == 2:
        good = err_bigger_case | (
            (self_res < (leaves_estimate * epsrel * depth) / total_nregions)
            & (self_err * curr_iter_regions < remain_room))
    elif heuristic_id == 4:
        good = err_bigger_case | (
            (jnp.abs(self_res)
             < (jnp.abs(leaves_estimate) * epsrel * depth) / total_nregions)
            & (self_err * curr_iter_regions < global_err_target))
    elif heuristic_id == 7:
        good = ((self_res * curr_iter_regions + queued_estimate
                 + finished_estimate < leaves_estimate)
                & (self_err * curr_iter_regions < global_err_target))
    elif heuristic_id == 8:
        good = ((self_res < leaves_estimate / total_nregions)
                | (self_err < epsrel * leaves_estimate / total_nregions))
    elif heuristic_id == 9:
        good = ((self_res < leaves_estimate / total_nregions)
                & (self_err < epsrel * leaves_estimate / total_nregions))
    elif heuristic_id == 10:
        good = ((jnp.abs(self_res) < 2 * leaves_estimate / 2.0 ** depth)
                & (self_err < 2 * leaves_estimate * epsrel / 2.0 ** depth))
    else:
        raise ValueError(f"unknown heuristic id {heuristic_id}")

    zero_done = (self_res == 0.0) & (self_err <= epsabs)
    return (good & min_iter_reached) | (zero_done & min_iter_reached)
