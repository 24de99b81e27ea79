"""Memory-pressure heuristic classifier.

Re-expression of Heuristic_classifier (reference:
cuda/pagani/quad/GPUquad/heuristic_classifier.cuh:147-452).  When the next
2x split would overflow the region-pool budget (the TPU analogue of the
reference's 16 GB device-memory model, heuristic_classifier.cuh:89-94), we
binary-search an error threshold such that

  * at most ``max_active_pct`` of regions stay active (fits the pool), and
  * the error of the regions forcibly finished stays within
    ``max_budget_pct`` of the remaining error budget,

relaxing both percentages up to 0.7 when the search fails, exactly like the
reference (heuristic_classifier.cuh:392-438).  Also implements the
estimate-convergence test via significant-digit comparison of the last
three iteration estimates (heuristic_classifier.cuh:170-216).
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ClassificationResult:
    pass_mem: bool = False
    pass_errorest_budget: bool = False
    threshold: float = 0.0
    active_flags: jax.Array | None = None
    num_active: int = 0
    finished_errorest: float = 0.0


@functools.partial(jax.jit, static_argnames=("k",))
def _ladder_probe(errorests, mask, k: int):
    """Evaluate a K-point geometric threshold ladder in ONE device call:
    for each candidate threshold, the active count and the error mass the
    threshold would keep active.  Replaces the reference's per-probe
    kernel+reduction round trips (heuristic_classifier.cuh:283-346) --
    each probe there costs a D2H sync (~30-60 ms on this runtime)."""
    big = jnp.asarray(jnp.inf, errorests.dtype)
    # dtype-aware floors: the old f64-calibrated literals (1e-300 floor,
    # 1e-12 separation) underflow/no-op in f32, collapsing the ladder.
    # lo spans POSITIVE errors only -- one exactly-zero valid error would
    # otherwise spread the rungs over ~300 irrelevant decades
    tiny = float(np.finfo(errorests.dtype).tiny)
    eps = float(np.finfo(errorests.dtype).eps)
    pos = mask & (errorests > 0)
    lo_raw = jnp.min(jnp.where(pos, errorests, big))
    lo = jnp.maximum(jnp.where(jnp.isfinite(lo_raw), lo_raw, tiny), tiny)
    hi = jnp.maximum(jnp.max(jnp.where(mask, errorests, -big)),
                     lo * (1 + 8 * eps))
    ts = jnp.exp(jnp.linspace(jnp.log(lo * (1 - 8 * eps)), jnp.log(hi), k))
    active_k = (errorests[None, :] > ts[:, None]) & mask[None, :]
    # counts/masses in f64: an f32 count is even-rounded above 2^24,
    # which would corrupt num_active and the hard pool bound
    counts = jnp.sum(active_k, axis=1).astype(jnp.float64)
    err_masked = jnp.where(mask, errorests, 0.0).astype(jnp.float64)
    kept = jnp.sum(jnp.where(active_k, err_masked[None, :], 0.0), axis=1)
    return jnp.stack([ts.astype(jnp.float64), counts, kept])  # (3, K)


@jax.jit
def _flags_for_threshold(errorests, mask, threshold):
    flags = jnp.where((errorests > threshold) & mask, 1.0, 0.0)
    return flags.astype(errorests.dtype)


@jax.jit
def _threshold_probe(errorests, mask, threshold):
    """One threshold probe: flags = (err > threshold) & mask, plus count.
    (reference: device_set_true_for_larger_than + reduction,
    heuristic_classifier.cuh:61-87, 283-303)."""
    flags = _flags_for_threshold(errorests, mask, threshold)
    return flags, jnp.sum(flags.astype(jnp.float64))


@jax.jit
def _budget_probe(errorests, flags):
    """Error mass of regions the threshold would finish: sum(err) over
    active-before but inactive-after regions = active_err - dot(flags, err)
    is computed by the caller; here just dot(flags, err)."""
    return jnp.sum(errorests * flags)


class HeuristicClassifier:
    """Stateful driver of the threshold search (host logic, device probes)."""

    def __init__(self, epsrel: float, epsabs: float,
                 max_pool_regions: int):
        self.epsrel = epsrel
        self.epsabs = epsabs
        self.max_pool_regions = max_pool_regions
        self.required_digits = math.ceil(math.log10(1.0 / epsrel)) \
            if epsrel > 0 else 15
        self._estimates = [0.0, 0.0, 0.0]
        self._iters_collected = 0
        self.min_iters_for_convergence = 1

    # -- estimate-convergence bookkeeping (heuristic_classifier.cuh:218-225)
    def store_estimate(self, estimate: float):
        self._estimates = [self._estimates[1], self._estimates[2],
                           float(estimate)]
        self._iters_collected += 1

    def sig_digits_same(self) -> bool:
        """Digit-string comparison of the last three estimates
        (heuristic_classifier.cuh:170-203)."""
        vals = [abs(v) for v in self._estimates]
        if any(not math.isfinite(v) for v in vals):
            return False  # NaN/inf estimates never count as converged
        strs = []
        for v in vals:
            while v != 0.0 and v < 1.0:
                v *= 10
            strs.append(f"{v:.15f}")
        min_len = min(len(s) for s in strs)
        current, last, second_to_last = strs[2], strs[1], strs[0]
        verdict = True
        sig = 0
        i = 0
        while (i < min(self.required_digits + 1, min_len)
               and sig < self.required_digits and verdict):
            verdict = (current[i] == last[i] == second_to_last[i])
            if verdict and current[i] != '.':
                sig += 1
            i += 1
        return verdict

    def estimate_converged(self) -> bool:
        if self._iters_collected - 1 < self.min_iters_for_convergence:
            return False
        return self.sig_digits_same()

    # -- memory model: pool capacity instead of raw bytes ------------------
    def split_fits(self, num_regions: int) -> bool:
        return 2 * num_regions <= self.max_pool_regions

    def classification_criteria_met(self, num_regions: int) -> bool:
        """(heuristic_classifier.cuh:348-360): classify when the split
        cannot fit, or when it is getting close (>10% of budget) and the
        estimate has converged."""
        ratio = (2.0 * num_regions) / self.max_pool_regions
        if ratio > 1.0:
            return True
        return ratio > 0.1 and self.estimate_converged()

    # -- the search (batched ladder; default) --------------------------------
    def classify_ladder(
        self,
        errorests: jax.Array,   # (cap,) refined two-level errors
        mask: jax.Array,        # (cap,) bool validity mask
        num_regions: int,
        iter_errorest: float,
        iter_finished_errorest: float,
        total_finished_errorest: float,
        k: int = 64,
    ) -> ClassificationResult:
        """Same decision procedure as ``classify`` but evaluated over a
        geometric threshold ladder in one device call + one D2H transfer
        (the bisection walks thresholds one sync at a time).  The
        percentage-relaxation schedule mirrors the reference
        (heuristic_classifier.cuh:425-437): error budget 0.25 -> 0.65 in
        0.1 steps first, then active share 0.5 -> 0.7."""
        table = np.asarray(_ladder_probe(errorests, mask, k))
        ts, counts, kept = table[0], table[1], table[2]
        # budget = max(epsrel*|est|, epsabs), matching accuracy_reached
        # (epsabs-dominated runs: the continuation's absolute slice targets)
        target_error = max(abs(self._estimates[2]) * self.epsrel, self.epsabs)
        error_budget = target_error - total_finished_errorest
        extra = iter_errorest - kept - iter_finished_errorest   # (K,)
        pct_active = counts / num_regions
        # HARD pool bound: the 2x split of the survivors must fit the
        # region budget.  (The reference's percentage relaxation can
        # overshoot its own 16 GB model, heuristic_classifier.cuh:425-437;
        # on TPU the pool budget is an HBM OOM wall, so it is enforced
        # outright on top of the reference's percentage schedule.)
        split_fits = 2.0 * counts <= self.max_pool_regions

        res = ClassificationResult()
        for active_pct in (0.5, 0.6, 0.7):
            for budget_pct in (0.25, 0.35, 0.45, 0.55, 0.65):
                ok = (pct_active <= active_pct) & split_fits & \
                     (extra <= budget_pct * error_budget) & (counts > 0)
                if ok.any():
                    # smallest qualifying threshold finishes the least error
                    i = int(np.argmax(ok))
                    res.pass_mem = True
                    res.pass_errorest_budget = True
                    res.threshold = float(ts[i])
                    res.num_active = int(counts[i])
                    res.finished_errorest = float(extra[i])
                    res.active_flags = _flags_for_threshold(
                        errorests, mask, jnp.asarray(ts[i]))
                    return res
        # no qualifying threshold: report the best-memory candidate
        res.pass_mem = bool((pct_active <= 0.7).any())
        res.pass_errorest_budget = False
        return res

    # -- the search (reference-style bisection; kept for parity) ------------
    def classify(
        self,
        errorests: jax.Array,   # (cap,) refined two-level errors
        mask: jax.Array,        # (cap,) bool validity mask
        num_regions: int,
        iter_errorest: float,
        iter_finished_errorest: float,
        total_finished_errorest: float,
    ) -> ClassificationResult:
        res = ClassificationResult()
        max_budget_pct = 0.25
        max_active_pct = 0.5   # (heuristic_classifier.cuh:156-157)

        masked = jnp.where(mask, errorests, jnp.nan)
        lo = float(jnp.nanmin(masked))
        hi = float(jnp.nanmax(masked))
        threshold = iter_errorest / num_regions
        rng_lo, rng_hi = lo, hi
        # budget = max(epsrel*|est|, epsabs), matching accuracy_reached
        # (epsabs-dominated runs: the continuation's absolute slice targets)
        target_error = max(abs(self._estimates[2]) * self.epsrel, self.epsabs)

        num_inc = num_dec = 0
        best_flags = None
        while True:
            # grow threshold until the active share fits the pool
            # (get_larger_threshold_results, heuristic_classifier.cuh:327-346)
            attempts = 0
            pass_mem = False
            while not pass_mem and attempts < 20:
                flags, n_act = _threshold_probe(errorests, mask, threshold)
                n_act = float(n_act)
                pct = n_act / num_regions
                # percentage criterion + the HARD pool bound (see
                # classify_ladder): the 2x split must fit the budget
                pass_mem = (pct <= max_active_pct
                            and 2.0 * n_act <= self.max_pool_regions)
                if not pass_mem:
                    rng_lo = threshold
                    threshold += abs(rng_hi - threshold) * 0.5
                attempts += 1
            num_inc += attempts

            if pass_mem:
                best_flags = flags
                res.num_active = int(n_act)
                # error-budget check (evaluate_error_budget,
                # heuristic_classifier.cuh:305-325)
                active_err = float(_budget_probe(errorests, flags))
                extra_f_err = (iter_errorest - active_err
                               - iter_finished_errorest)
                error_budget = target_error - total_finished_errorest
                pass_budget = extra_f_err <= max_budget_pct * error_budget
                res.finished_errorest = extra_f_err
                if pass_budget:
                    res.pass_mem = True
                    res.pass_errorest_budget = True
                    res.threshold = threshold
                    res.active_flags = flags
                    return res
                rng_hi = threshold
                threshold -= abs(threshold - rng_lo) * 0.5
                num_dec += 1

            exhausted = num_dec >= 20 or num_inc >= 20
            if exhausted and max_budget_pct < 0.7:
                max_budget_pct += 0.1
                num_inc = num_dec = 0
                rng_lo, rng_hi = lo, hi
                threshold = iter_errorest / num_regions
            elif exhausted and max_budget_pct >= 0.7 and max_active_pct <= 0.7:
                # restart the bisection per relaxation like the budget
                # branch (heuristic_classifier.cuh:425-437) -- a stale
                # collapsed [rng_lo, rng_hi] cannot reach the thresholds
                # the relaxed active share now admits
                max_active_pct += 0.1
                num_inc = num_dec = 0
                rng_lo, rng_hi = lo, hi
                threshold = iter_errorest / num_regions
            elif exhausted:
                break

        res.pass_mem = False
        res.pass_errorest_budget = False
        res.active_flags = best_flags
        return res
