"""PAGANI adaptive-cubature driver (the primary user-facing entry point).

TPU-native restructuring of Workspace<T, ndim>::integrate
(reference: cuda/pagani/quad/GPUquad/Workspace.cuh:148-358):

  for it < 700 while regions remain:
      rule application over the whole pool          (one fused jit stage)
      two-level error refinement + classification   (same stage)
      accuracy check                                (host, one scalar sync)
      finished-region accounting (dot products)     (same stage)
      error-budget-overflow rollback                (Workspace.cuh:121-146)
      memory-pressure heuristic classification      (classifier.py)
      prefix-sum compaction of active regions       (region_pool.compact)
      bisection split into the freed slots          (region_pool.split)

The pool lives in power-of-two bucket capacities; each bucket compiles one
fused iteration stage (rule eval + refinement + reductions), so XLA sees a
handful of static shapes over the whole run.  The per-iteration host syncs
(accuracy scalar, active count) mirror the reference's per-stage
cudaDeviceSynchronize + D2H scalar copies (Workspace.cuh:182-353,
Sub_region_filter.cuh:68-77).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.pagani import region_pool, two_level
from gpuintegration_tpu.pagani.classifier import HeuristicClassifier
from gpuintegration_tpu.types import IntegrationResult, Volume

MAX_ITERATIONS = 700  # (Workspace.cuh:182)


def _burst_evals() -> float:
    """Integrand evals allowed in ONE fused-burst dispatch.  The remote
    TPU worker crashes on single dispatches past ~2e10 evals (~300 s of
    device time; DESIGN.md 3b), so fused bursts exit at this ceiling and
    the host re-enters -- exactly the gate-crossing resume path, so the
    trajectory is unchanged.  Read per burst so tests can override via
    GPUINT_TPU_FUSED_EVALS_PER_DISPATCH."""
    return float(os.environ.get(
        "GPUINT_TPU_FUSED_EVALS_PER_DISPATCH", "5e9"))


def measure_eval_cost(integrand, ndim: int, *, dtype=jnp.float64,
                      probe_regions: int = 1 << 14,
                      margin: float = 2.0, trials: int = 3,
                      reps: int = 4) -> float:
    """Probe ``Workspace(eval_cost=...)`` for an integrand on the LIVE
    backend: wall time of a probe-pool rule sweep relative to a
    sum-of-coordinates baseline.

    Timing method: ``reps`` sweeps run INSIDE one jit with a carried
    data dependency (the bench.py discipline), so the per-dispatch
    floor is amortized 1/reps into BOTH measurements and the remote
    runtime cannot elide repeats -- no floor subtraction.  (The first
    probe design subtracted a separately-measured sync floor from
    single-dispatch times; on the remote runtime the baseline sweep
    itself sits near that floor, and the subtraction clamped to its
    1e-4 s epsilon once -- inflating a cost-60 interpolation integrand
    to cost-60079 and slicing its production run into uselessly-fine
    dispatches.)  ``trials`` outer repetitions keep the best.

    Returns ``max(1.0, margin * ratio)`` -- the x2 default safety
    margin is applied IN the probe because the consumer is the
    worker-crash dispatch ceiling (DESIGN.md 3b): an underestimate
    walks a deep run into the crash regime, while an overestimate only
    splits slabs finer (bit-identical results, mildly more dispatches).
    The probe pool is deliberately SMALL (16k regions): the integrand's
    cost is unknown before the probe, so the probe itself must stay far
    under the ceiling at any plausible cost.
    """
    import time as _time

    if margin < 1.0:
        raise ValueError("margin must be >= 1")
    f, ndim = make_integrand(integrand, ndim)
    ws = Workspace(ndim, dtype=dtype)
    cap = min(max(region_pool.next_pow2(probe_regions), 1024),
              ws.chunk_size)
    rng = np.random.default_rng(0)
    lows_np = rng.uniform(0.0, 0.5, (ndim, cap))
    global_lo = jnp.zeros((ndim,), ws.dtype)
    global_range = jnp.ones((ndim,), ws.dtype)
    lows = jnp.asarray(lows_np, ws.dtype)
    tables = rule_eval.rule_tables(ndim, ws.dtype.name)
    n_reps = max(reps, 1)

    def timed(fn) -> float:
        @jax.jit
        def loop(ln0):
            def body(i, carry):
                ln, acc = carry
                est, _, _ = rule_eval.apply_rule(
                    f if fn is None else fn, tables, lows, ln,
                    global_lo, global_range)
                s = jnp.sum(est)
                # carried dependency defeats elision/overlap
                return (ln * (1.0 + s * 1e-30), acc + s)
            return jax.lax.fori_loop(
                0, n_reps, body, (ln0, jnp.zeros((), ws.dtype)))

        ln0 = jnp.asarray(np.full((ndim, cap), 0.25), ws.dtype)
        jax.block_until_ready(loop(ln0))      # compile + executable load
        best = float("inf")
        for trial in range(max(trials, 1)):
            ln_t = ln0 * (1.0 + 1e-7 * (trial + 1))
            t0 = _time.perf_counter()
            jax.block_until_ready(loop(ln_t))
            best = min(best, (_time.perf_counter() - t0) / n_reps)
        return best

    def baseline(x):
        return jnp.sum(x, axis=-1)

    t_base = max(timed(baseline), 1e-6)
    t_f = timed(None)
    return max(1.0, margin * (t_f / t_base))


def default_partitions_per_axis(ndim: int) -> int:
    """(Workspace.cuh:379-386)."""
    if ndim < 5:
        return 4
    if ndim <= 10:
        return 2
    return 1


def accuracy_reached(epsrel, epsabs, estimate, errorest) -> bool:
    """(PaganiUtils.cuh:387-394)."""
    if abs(estimate) > 0 and errorest / abs(estimate) <= epsrel:
        return True
    return errorest <= epsabs


@functools.partial(jax.jit,
                   static_argnames=("f", "ndim", "dtype_name", "chunk_size",
                                    "blocked", "ncomp", "with_split_frac"))
def _eval_stage(f, ndim: int, dtype_name: str,
                lows, lengths, global_lo, global_range, chunk_size=None,
                n=None, blocked=False, ncomp=1, with_split_frac=False):
    """Rule application over one pool bucket, chunked inside the jit.

    The (chunk, feval) intermediate is bounded by ``chunk_size`` via an
    in-jit ``lax.map`` over chunks, so each bucket capacity is ONE device
    dispatch per iteration regardless of pool size.  (A host-side chunk
    loop reuses a single compiled kernel but pays per-dispatch runtime
    overhead times pool/chunk -- at a 16M-region bucket that is 2048
    dispatches per iteration, which dominates wall time on remote-dispatch
    runtimes.  The reference relaunches INTEGRATE_GPU_PHASE1 with a grid
    equal to the pool size instead, PaganiUtils.cuh:313-331.)"""
    tables = rule_eval.rule_tables(ndim, dtype_name)
    return rule_eval.apply_rule(
        f, tables, lows, lengths, global_lo, global_range,
        chunk_size=chunk_size, n=n, blocked=blocked, ncomp=ncomp,
        with_split_frac=with_split_frac)


def iteration_math(
    relerr_classification: bool,
    blocked: bool,        # pool layout: blocked halves (post-split) or [0,n)
    est, err, n,
    parent_estimates,
    use_refine,           # traced bool: parents valid?
    epsrel,
    lengths=None,         # (ndim, cap) -- only needed with abs_per_vol
    abs_per_vol=None,     # scalar: volume-apportioned retirement budget
):
    """The per-iteration post-processing pipeline: masking, two-level
    refinement, classification, and the iteration/finished reductions.
    Traced helper shared by the host loop (_post_stage) and the fused
    on-device loop (pagani.fused_loop) so their arithmetic is STRUCTURALLY
    identical -- the fused/host bit-equivalence tests rely on it.

    Returns (est, refined, active, iter_est, iter_err, finished_est,
    finished_err, n_active) with scalars in the pool dtype."""
    cap = est.shape[0]
    mask = region_pool.block_mask(cap, n, blocked)
    est = jnp.where(mask, est, 0.0)
    err = jnp.where(mask, err, 0.0)

    volumes = (jnp.prod(lengths, axis=0)
               if abs_per_vol is not None else None)
    refined, active_r = two_level.refine_error(
        est, err, parent_estimates, n, epsrel,
        relerr_classification=relerr_classification,
        volumes=volumes, abs_per_vol=abs_per_vol)
    all_active = jnp.where(mask, 1.0, 0.0).astype(est.dtype)
    refined = jnp.where(use_refine, refined, err)
    active = jnp.where(use_refine, active_r, all_active)

    iter_est = jnp.sum(est)
    iter_err = jnp.sum(refined)
    finished_est = iter_est - jnp.sum(active * est)
    finished_err = iter_err - jnp.sum(active * refined)
    # count in f64: an f32 sum of 0/1 flags is even-rounded above 2^24
    # regions, which would corrupt the pool-bound arithmetic downstream
    n_active = jnp.sum(active.astype(jnp.float64))
    return (est, refined, active, iter_est, iter_err, finished_est,
            finished_err, n_active)


@functools.partial(jax.jit,
                   static_argnames=("relerr_classification", "blocked"))
def _post_stage(
    relerr_classification: bool,
    blocked: bool,
    est, err, n,
    parent_estimates,
    use_refine,
    epsrel,
    lengths=None,
    abs_per_vol=None,
):
    """jit wrapper of iteration_math for the host loop: one stacked scalar
    vector -> a single D2H transfer per iteration (the reference pays one
    cudaDeviceSynchronize per stage instead, Workspace.cuh:182-353)."""
    (est, refined, active, iter_est, iter_err, finished_est,
     finished_err, n_active) = iteration_math(
        relerr_classification, blocked, est, err, n,
        parent_estimates, use_refine, epsrel,
        lengths=lengths, abs_per_vol=abs_per_vol)
    scalars = jnp.stack([iter_est, iter_err, finished_est, finished_err,
                         n_active])
    return est, refined, active, scalars


def iteration_math_vector(
    relerr_classification: bool,
    blocked: bool,
    est, err, n,            # est/err: (ncomp, cap) component-major
    parent_estimates,       # (ncomp, cap_parent)
    use_refine,
    epsrel,
    lengths=None,
    abs_per_vol=None,
):
    """Vector twin of ``iteration_math``: per-component masking,
    two-level refinement (all-components finished semantics) and the
    iteration/finished reductions.  Shared by the host vector loop
    (_post_stage_vector) and the fused vector phase
    (fused_loop.fused_adaptive_phase_vector) so their arithmetic is
    STRUCTURALLY identical (same discipline as the scalar pair).

    Returns (est, refined, active, iter_est, iter_err, finished_est,
    finished_err, n_active); the per-iteration sums are (ncomp,)."""
    cap = est.shape[1]
    mask = region_pool.block_mask(cap, n, blocked)
    est = jnp.where(mask[None], est, 0.0)
    err = jnp.where(mask[None], err, 0.0)
    volumes = (jnp.prod(lengths, axis=0)
               if abs_per_vol is not None else None)
    refined_r, active_r = two_level.refine_error_vector(
        est, err, parent_estimates, n, epsrel,
        relerr_classification=relerr_classification,
        volumes=volumes, abs_per_vol=abs_per_vol)
    all_active = jnp.where(mask, 1.0, 0.0).astype(est.dtype)
    refined = jnp.where(use_refine, refined_r, err)
    active = jnp.where(use_refine, active_r, all_active)
    iter_est = jnp.sum(est, axis=1)
    iter_err = jnp.sum(refined, axis=1)
    fin_est = iter_est - jnp.sum(active[None] * est, axis=1)
    fin_err = iter_err - jnp.sum(active[None] * refined, axis=1)
    n_active = jnp.sum(active.astype(jnp.float64))  # see iteration_math
    return (est, refined, active, iter_est, iter_err, fin_est, fin_err,
            n_active)


@functools.partial(jax.jit,
                   static_argnames=("relerr_classification", "blocked",
                                    "ncomp"))
def _post_stage_vector(
    relerr_classification: bool,
    blocked: bool,
    ncomp: int,
    est, err, n,            # est/err: (ncomp, cap) component-major
    parent_estimates,       # (ncomp, cap_parent)
    use_refine,
    epsrel,
    lengths=None,
    abs_per_vol=None,
):
    """jit wrapper of iteration_math_vector for the host loop, with the
    per-iteration sums concatenated into ONE scalar vector
    [iter_est(ncomp), iter_err(ncomp), fin_est(ncomp), fin_err(ncomp),
    n_active] for a single D2H sync."""
    (est, refined, active, iter_est, iter_err, fin_est, fin_err,
     n_active) = iteration_math_vector(
        relerr_classification, blocked, est, err, n,
        parent_estimates, use_refine, epsrel,
        lengths=lengths, abs_per_vol=abs_per_vol)
    scalars = jnp.concatenate(
        [iter_est, iter_err, fin_est, fin_err, n_active[None]])
    return est, refined, active, scalars


@jax.jit
def _max_over_components(refined):
    """Per-region worst-component error profile for the classifier."""
    return jnp.max(refined, axis=0)


@functools.partial(jax.jit, static_argnames=("blocked",))
def _all_active(active, n, blocked: bool):
    mask = region_pool.block_mask(active.shape[0], n, blocked)
    return jnp.where(mask, 1.0, 0.0).astype(active.dtype)


@jax.jit
def _dot(a, b):
    return jnp.sum(a * b)


class Workspace:
    """Adaptive multidimensional integrator (PAGANI).

    Parameters
    ----------
    ndim:            number of integration variables (>= 2).
    dtype:           accumulation dtype (default float64).
    max_pool_regions: region-pool budget -- the TPU analogue of the
                     reference's free-device-memory model
                     (heuristic_classifier.cuh:89-145).
    chunk_size:      regions per rule-evaluation dispatch; pools are padded
                     to multiples of this so the hot kernel compiles once.
    chunk_budget_bytes: activation budget used to derive the default chunk.
    eval_cost:       relative device cost of ONE integrand evaluation vs a
                     plain elementwise integrand (Genz-class ~= 1).  The
                     per-dispatch eval ceiling (``_burst_evals``, DESIGN.md
                     3b) is denominated in Genz-equivalent evals; expensive
                     integrands (table interpolation, special functions)
                     must declare their multiplier or a single full-bucket
                     rule sweep can exceed the remote worker's device-time
                     wall (observed: the 6D interp-table likelihood at a 2M
                     pool crashed the worker; ``measure_eval_cost`` probes
                     the multiplier on the live backend).  Values < 1 are
                     clamped to 1 for ceiling purposes -- the default
                     ceiling is already calibrated on cost-1 integrands.
    """

    def __init__(self, ndim: int, *, dtype=jnp.float64,
                 max_pool_regions: int | None = None,
                 pool_bytes_budget: int = 6 * 1024 ** 3,
                 chunk_size: int | None = None,
                 chunk_budget_bytes: int = 256 * 1024 * 1024,
                 mesh=None,
                 rule_backend: str = "xla",
                 eval_cost: float = 1.0):
        """``mesh``: optional jax.sharding.Mesh -- the region pool is
        sharded over its axis and every stage runs SPMD (rule evaluation
        is communication-free; reductions/compaction lower to
        collectives).  The reference has no multi-GPU mode at all
        (SURVEY.md section 2.7)."""
        self.ndim = ndim
        self.dtype = jnp.dtype(dtype)
        if max_pool_regions is None:
            # the reference's free-device-memory model
            # (heuristic_classifier.cuh:89-145) against a bytes budget:
            # the loop keeps ~10 region-sized f64 arrays live per dim slot
            # (pool + children + parents + per-region outputs)
            per_region = self.dtype.itemsize * (4 * ndim + 12)
            max_pool_regions = min(
                1 << (pool_bytes_budget // per_region).bit_length() - 1,
                16 * 1024 * 1024)
        self.max_pool_regions = max_pool_regions
        self.mesh = mesh
        if rule_backend not in ("xla", "pallas"):
            raise ValueError(f"rule_backend {rule_backend!r}")
        if rule_backend == "pallas" and self.dtype != jnp.float32:
            raise ValueError("the Pallas rule backend is f32-only "
                             "(Mosaic has no f64 on TPU); pass "
                             "dtype=jnp.float32")
        self.rule_backend = rule_backend
        self.eval_cost = float(eval_cost)
        self._feval = int(rule_eval.rule_tables(ndim, self.dtype.name).feval)
        self._f_axes = None  # original scalar-per-axis callable (pallas)
        if chunk_size is None:
            feval_p = rule_eval.rule_tables(ndim, self.dtype.name).feval_padded
            per_region = feval_p * self.dtype.itemsize * 4
            chunk_size = max(min(
                region_pool.next_pow2(chunk_budget_bytes // per_region) // 2,
                16384), 1024)
        # Pool capacities are powers of two; a non-power-of-two chunk would
        # fail the cap % chunk divisibility check in apply_rule and silently
        # fall back to ONE unchunked full-pool eval (unbounded (cap, feval)
        # intermediate).  Round up so chunking always engages.
        self.chunk_size = region_pool.next_pow2(chunk_size)

    def _eval_one(self, f, lows, lengths, global_lo, global_range,
                  chunk_size=None, n=None, blocked=False, ncomp=1,
                  with_split_frac=False):
        if self.rule_backend == "pallas":
            if ncomp != 1:
                raise ValueError("the Pallas rule backend is scalar-only")
            if with_split_frac:
                raise ValueError("crease_split needs rule_backend='xla'")
            from gpuintegration_tpu.ops.pallas_rule import pallas_apply_rule
            return pallas_apply_rule(
                self._f_axes, self.ndim, lows, lengths,
                global_lo, global_range,
                interpret=jax.default_backend() != "tpu")
        return _eval_stage(f, self.ndim, self.dtype.name, lows, lengths,
                           global_lo, global_range, chunk_size=chunk_size,
                           n=n, blocked=blocked, ncomp=ncomp,
                           with_split_frac=with_split_frac)

    def _cost_slabs(self, cap: int) -> int:
        """Number of separate device dispatches one full-bucket rule sweep
        must be split into so that each stays under the per-dispatch eval
        ceiling (``_burst_evals``) at this integrand's ``eval_cost``.
        Power of two, at most cap/chunk_size (the in-dispatch chunk is the
        finest dispatch grain), 1 for cost-1 pools of any proven size."""
        total = float(cap) * self._feval * max(self.eval_cost, 1.0)
        ceiling = _burst_evals()
        if total <= ceiling:
            return 1
        k = region_pool.next_pow2(int(math.ceil(total / ceiling)))
        return max(1, min(k, cap // self.chunk_size))

    def _eval_slabs(self, f, lows, lengths, global_lo, global_range,
                    n_host: int, blocked: bool, k: int, ncomp: int = 1,
                    with_split_frac: bool = False):
        """Cost-bounded bucket sweep: k contiguous region slabs, one
        device dispatch each, so no single dispatch exceeds the remote
        worker's device-time wall on expensive integrands (DESIGN.md 3b;
        a 2M-region interp-table sweep in ONE dispatch crashed the TPU
        worker).  Occupancy is host-known (``n_host`` is the Python-int
        region count), so empty slabs are skipped outright and boundary
        slabs keep the dynamic-trip path: within either static pool half
        the real slots are a prefix, so a slab's occupied slots are a
        prefix too and each slab evaluates with blocked=False semantics.
        Static power-of-two slab widths never straddle the half boundary
        and reuse one compiled kernel per bucket size."""
        cap = lows.shape[1]
        w = cap // k
        chunk = self.chunk_size if w > self.chunk_size else None
        half = cap // 2
        ests, errs, sdims, fracs = [], [], [], []
        for s in range(k):
            start = s * w
            if blocked:
                base = start if start < half else start - half
                ln = min(max(n_host // 2 - base, 0), w)
            else:
                ln = min(max(n_host - start, 0), w)
            if ln == 0:
                z = (jnp.zeros((w,), self.dtype) if ncomp == 1
                     else jnp.zeros((ncomp, w), self.dtype))
                ests.append(z)
                errs.append(z)
                sdims.append(jnp.zeros((w,), jnp.int32))
                fracs.append(jnp.full((w,), 0.5, self.dtype))
                continue
            res = self._eval_one(
                f, jax.lax.slice_in_dim(lows, start, start + w, axis=1),
                jax.lax.slice_in_dim(lengths, start, start + w, axis=1),
                global_lo, global_range, chunk_size=chunk,
                n=jnp.asarray(ln, jnp.int32), blocked=False, ncomp=ncomp,
                with_split_frac=with_split_frac)
            ests.append(res[0])
            errs.append(res[1])
            sdims.append(res[2])
            if with_split_frac:
                fracs.append(res[3])
        axis = 0 if ncomp == 1 else 1
        out = (jnp.concatenate(ests, axis=axis),
               jnp.concatenate(errs, axis=axis),
               jnp.concatenate(sdims, axis=0))
        if with_split_frac:
            out = out + (jnp.concatenate(fracs, axis=0),)
        return out

    def _eval_pool(self, f, lows, lengths, global_lo, global_range,
                   n=None, blocked=False, n_host=None, ncomp=1,
                   with_split_frac=False):
        """One device dispatch for the whole bucket; the (chunk, feval)
        intermediate is bounded by in-jit chunking, and with a traced
        region count ``n`` only the occupied chunks of the padded bucket
        are evaluated (dynamic trip count) -- eval work tracks the real
        population instead of the power-of-two capacity.  When the
        integrand's ``eval_cost`` puts a full-bucket sweep over the
        per-dispatch ceiling and the caller supplies the host-side region
        count ``n_host``, the sweep splits into cost-bounded slab
        dispatches instead (``_eval_slabs``)."""
        cap = lows.shape[1]
        chunk = self.chunk_size
        if cap <= chunk:
            return self._eval_one(f, lows, lengths, global_lo, global_range,
                                  ncomp=ncomp,
                                  with_split_frac=with_split_frac)
        if n_host is not None:
            k = self._cost_slabs(cap)
            if k > 1:
                return self._eval_slabs(f, lows, lengths, global_lo,
                                        global_range, int(n_host), blocked,
                                        k, ncomp=ncomp,
                                        with_split_frac=with_split_frac)
        return self._eval_one(f, lows, lengths, global_lo, global_range,
                              chunk_size=chunk, n=n, blocked=blocked,
                              ncomp=ncomp, with_split_frac=with_split_frac)

    def integrate(
        self,
        integrand: Callable,
        epsrel: float = 1e-3,
        epsabs: float = 1e-12,
        vol: Volume | None = None,
        *,
        partitions_per_axis: int | None = None,
        relerr_classification: bool = True,
        max_iterations: int = MAX_ITERATIONS,
        initial_regions: tuple | None = None,
        recorder=None,
        predict_split: bool = False,
        vegas_assisted: bool = False,
        vegas_passes: int = 10,
        vegas_samples_per_pass: int = 320,
        seed: int = 0,
        fused: bool = True,
        ledger: tuple | None = None,
        finish_epsrel_scale: float = 1.0,
        finish_abs_per_vol: float = 0.0,
        crease_split: bool = False,
        deadline: float | None = None,
    ) -> IntegrationResult:
        """Integrate ``integrand`` to the requested tolerances.

        ``deadline``: optional ``time.monotonic()`` timestamp -- the loop
        stops BETWEEN iterations once it passes (status 1, inflight sweep
        folded in like a max-iterations exit).  integrate_to_convergence
        threads its ``max_wall_s`` here so a single long round or
        continuation slice cannot overshoot the budget by its own
        duration (a 1e-6 physics slice once overran a 2400 s budget to
        2551 s when the deadline was only checked between slices).
        Granularity: one host iteration or one fused burst (bursts are
        already dispatch-bounded by the eval ceiling, DESIGN.md 3b).

        ``finish_epsrel_scale``: tighten per-region retirement (two-level
        finished classification, two_level.refine_error) and the
        classifier's drop budget to ``epsrel * scale`` while the GLOBAL
        accuracy test stays at ``epsrel``.  At the default 1.0 the
        per-region criterion matches the reference (hybrid.cuh:30-38) --
        but regions retired right at the bound can collectively bank up
        to ~1.0x the whole error budget, after which no continuation can
        certify the global tolerance (observed on the 8D Gaussian at
        epsrel=1e-6: banked error alone reached 1.03x the budget).  A
        scale of 0.25-0.5 reserves the remaining fraction of the budget
        for the still-active queue at the cost of more refinement work.

        ``finish_abs_per_vol``: additionally retire a region once its
        refined error is below ``finish_abs_per_vol * vol_region``
        (unit-space volume).  The purely relative criterion can never
        retire a region whose estimate is ~0, so on oscillatory
        integrands the zero-crossing regions refine forever
        (two_level.py module docstring).  Retired regions are disjoint
        and unit volumes sum to <= 1, so the error banked through this
        term is globally bounded by ``finish_abs_per_vol``; budget it as
        a fraction of ``epsrel * |integral|`` (the partitioned
        continuation does this automatically for its slices).  0 = off
        (reference semantics).

        ``fused``: run bursts of adaptive iterations fully on device
        (pagani.fused_loop) whenever the pool fits one bucket below the
        classification gate -- removes the ~65 ms/iteration host
        dispatch+sync floor that dominates small-pool runs.  The host
        loop below remains the reference semantics (and handles bucket
        growth, the classifier, recorders, predict_split, hybrid mode);
        set ``fused=False`` to force it for every iteration.

        ``recorder``: optional utils.recorder.IterationRecorder receiving one
        row per iteration (parity with the reference's cuda_pagani_iters.csv,
        Workspace.cuh:171-241).

        ``ledger``: optional (estimate, errorest, nregions, iters, neval)
        seed of the cumulative ledger -- resume semantics for the
        continuation driver (integrate_to_convergence): every internal
        decision (accuracy test, error-budget rollback, classifier
        budget) then sees the TRUE cumulative totals rather than this
        round's partial sums.  ``max_iterations`` buys a fresh budget on
        top of the seeded iteration count.

        ``crease_split``: crease-aware splitting for C0 integrands
        (|x - t| kinks -- the f5 certificate-wall mechanism,
        docs/VALIDATION.md 2b).  When the rule's collinear samples along
        the chosen bisection dimension show a confident kink between
        the inner sample pair, the region is split AT the estimated
        crease instead of the midpoint, making both children smooth and
        restoring the rule's full convergence order in one cut
        (rule_eval._split_fraction; regions with no confident kink
        split at the midpoint bit-identically).  Scalar XLA only: the
        Pallas rule backend is f32 scalar-per-axis by construction and
        vegas_assisted overwrites the stencil estimates; for VECTOR
        integrands the detector would need a per-component fraction
        reduced to one cut, and the jump/kink gates are
        measured-false-positive calibrated on SCALAR stencils
        (rule_eval.py) -- re-deriving those thresholds per component
        family is open work, so vector runs keep midpoint splits
        rather than ship uncalibrated gates.  Runs the host loop, the fused on-device
        phase (the cut-fraction vector is threaded through the fused
        carry) AND, since round 5, the mesh (the fraction rides
        sharded_compact_split's ``extra=`` payload -- the stencil and
        the split are shard-local, so nothing crosses chips);
        host/fused and mesh/single-chip equivalence tested in
        tests/test_crease_split.py.  Beyond-reference: the reference
        splits at midpoints only (Sub_region_splitter.cuh:56-87).

        ``predict_split``: the reference's split-prediction heuristic
        (Workspace.cuh:206-211, 244-248): suppress finished-region
        classification for the first 15 iterations (pool <= 15e6, nothing
        finished yet) so the pool grows by pure bisection, and snapshot the
        pool at iteration 15 into ``self.last_snapshot`` (the pytree
        analogue of Sub_regions::take_snapshot, Sub_regions.cuh:219-229).
        """
        import time as _time
        if not (0.0 < finish_epsrel_scale <= 1.0):
            raise ValueError("finish_epsrel_scale must be in (0, 1]")
        if finish_abs_per_vol < 0.0:
            raise ValueError("finish_abs_per_vol must be >= 0")
        eps_work = epsrel * finish_epsrel_scale
        ndim = self.ndim
        dtype = self.dtype
        dtype_name = dtype.name
        # no stale pool/error stash from a prior run on this workspace
        # (mesh/vector paths return before the single-chip pool setup)
        self.final_pool = None
        self.final_pool_errors = None
        f, f_ndim = make_integrand(integrand, ndim)
        if f_ndim != ndim:
            raise ValueError(f"integrand ndim {f_ndim} != workspace {ndim}")
        if self.rule_backend == "pallas":
            from gpuintegration_tpu.integrand import _positional_arity
            if _positional_arity(integrand) != ndim:
                raise ValueError(
                    "the Pallas backend needs a scalar-per-axis integrand "
                    "f(x0, ..., x{n-1}) (cubacpp convention)")
            self._f_axes = integrand
        if vol is None:
            vol = Volume(ndim=ndim)
        global_lo = jnp.asarray(vol.lows, dtype)
        global_range = jnp.asarray(vol.highs - vol.lows, dtype)

        from gpuintegration_tpu.integrand import deduce_ncomp
        ncomp = deduce_ncomp(f, ndim, dtype_name)
        if crease_split and (vegas_assisted or self.rule_backend != "xla"
                             or ncomp > 1):
            raise ValueError(
                "crease_split runs on the scalar XLA path (single-chip "
                "or mesh, round 5); vegas_assisted / pallas / vector "
                "runs keep midpoint splits (see the docstring note)")
        if ncomp > 1:
            if (vegas_assisted or predict_split
                    or self.rule_backend != "xla"):
                # Documented exclusions (not yet-unwritten code paths):
                # pallas -- the VMEM rule kernel is f32 scalar-per-axis
                # by construction (Mosaic 2-D column math,
                # ops/pallas_rule.py).  vegas_assisted / predict_split --
                # scalar per-region MC overwrite and scalar snapshot
                # heuristics (Phases.cuh:479-518, Workspace.cuh:206-211).
                # Vector runs get the host loop, the fused vector phase
                # (single-chip AND, round 5, on the mesh),
                # checkpoint/ledger resume, continuation slicing and
                # (round 4) the mesh host loop.
                raise ValueError(
                    "vector-valued integrands run on the XLA backend "
                    "(pallas, vegas_assisted and predict_split are "
                    "scalar-only; see the docstring note in "
                    "Workspace.integrate)")
            if ledger is not None:
                if np.ndim(ledger[0]) != 1:
                    raise ValueError(
                        "vector runs need a vector ledger: ((ncomp,) est, "
                        "(ncomp,) err, nregions, iters, neval)")
            if self.mesh is not None:
                return self._integrate_mesh(
                    f, epsrel, epsabs, global_lo, global_range,
                    partitions_per_axis, relerr_classification,
                    max_iterations, initial_regions, recorder, fused,
                    ledger, finish_scale=finish_epsrel_scale,
                    abs_per_vol=finish_abs_per_vol, deadline=deadline,
                    ncomp=ncomp)
            return self._integrate_vector(
                f, ncomp, epsrel, epsabs, global_lo, global_range,
                partitions_per_axis, relerr_classification,
                max_iterations, initial_regions, recorder,
                finish_scale=finish_epsrel_scale,
                abs_per_vol=finish_abs_per_vol,
                fused=fused, ledger=ledger, deadline=deadline)

        if self.mesh is not None:
            if vegas_assisted or predict_split:
                raise ValueError(
                    "mesh mode does not support vegas_assisted/"
                    "predict_split; run them single-chip")
            if self.rule_backend != "xla":
                raise ValueError("mesh mode requires rule_backend='xla'")
            return self._integrate_mesh(
                f, epsrel, epsabs, global_lo, global_range,
                partitions_per_axis, relerr_classification,
                max_iterations, initial_regions, recorder, fused, ledger,
                finish_scale=finish_epsrel_scale,
                abs_per_vol=finish_abs_per_vol, deadline=deadline,
                crease_split=crease_split)

        # -- initial pool (capacity floored at chunk_size so the hot rule
        # kernel compiles exactly once per run) -------------------------------
        min_cap = self.chunk_size
        if initial_regions is not None:
            # user-facing region-major (n, ndim); stored dims-major.
            # Transpose on HOST: transferring the (n, ndim) layout to TPU
            # lane-pads ndim -> 128 (16x for 8D -- a multi-million-region
            # resume OOMs on the transfer alone, the round-pool invariant
            # from docs/DESIGN.md).
            lows0 = jnp.asarray(np.asarray(initial_regions[0], dtype).T)
            lengths0 = jnp.asarray(np.asarray(initial_regions[1], dtype).T)
            n = int(lows0.shape[1])
            cap = max(region_pool.next_pow2(n), min_cap)
            pad = cap - n
            lows = jnp.concatenate(
                [lows0, jnp.broadcast_to(lows0[:, :1], (ndim, pad))], axis=1)
            lengths = jnp.concatenate(
                [lengths0, jnp.broadcast_to(lengths0[:, :1], (ndim, pad))],
                axis=1)
        else:
            parts = partitions_per_axis or default_partitions_per_axis(ndim)
            n = parts ** ndim
            cap = max(region_pool.next_pow2(n), min_cap)
            lows, lengths, n = region_pool.uniform_split(
                ndim, parts, cap, dtype)

        parent_est = jnp.zeros((max(cap // 2, 1),), dtype)
        use_refine = jnp.asarray(False)
        n_dev = jnp.asarray(n, jnp.int32)
        # retirement + classifier budgets run at eps_work; the global
        # accuracy test and the budget-overflow rollback keep the true
        # epsrel (see the finish_epsrel_scale docstring)
        eps_dev = jnp.asarray(eps_work, dtype)
        # None (not a traced 0) when off: keeps the traced pipeline
        # byte-identical to the reference semantics in the default path
        apv_dev = (jnp.asarray(finish_abs_per_vol, dtype)
                   if finish_abs_per_vol > 0.0 else None)

        classifier = HeuristicClassifier(eps_work, epsabs,
                                         self.max_pool_regions)
        feval = rule_eval.rule_tables(ndim, dtype_name).feval

        cum = IntegrationResult(status=1)
        result_nregions = 0
        if ledger is not None:
            (cum.estimate, cum.errorest, result_nregions, cum.iters,
             cum.neval) = ledger
            cum.nFinishedRegions = result_nregions
            max_iterations = max_iterations + cum.iters
        blocked = False   # pool layout: [0,n) contiguous until first split

        # classification gate: below 2n <= gate the classifier can never
        # trigger (classification_criteria_met needs 2n/max_pool > 0.1), so
        # whole iterations can run on device without its host-side string
        # arithmetic (pagani/fused_loop.py)
        fused_gate = int(0.1 * self.max_pool_regions)
        # the pallas backend fuses too: its f32 kernel replaces apply_rule
        # inside the while_loop body (fused_loop.eval_pool).  crease_split
        # threads its (cap,) cut-fraction vector through the fused carry
        # (with_split_frac), so crease runs get the on-device iteration
        # rate too (round-4 item; host/fused bit-equivalence tested in
        # tests/test_crease_split.py).
        fused_ok = (fused and self.mesh is None and recorder is None
                    and not vegas_assisted and not predict_split)
        inflight_est = inflight_err = 0.0
        exhausted = False

        it = cum.iters
        while True:
            if it >= max_iterations or (
                    deadline is not None
                    and _time.monotonic() >= deadline):
                exhausted = True
                break
            if n <= 0:
                break

            if fused_ok and blocked and 2 * n <= fused_gate:
                from gpuintegration_tpu.pagani import fused_loop
                chunk = self.chunk_size if cap > self.chunk_size else None
                fout = fused_loop.fused_adaptive_phase(
                        f, ndim, dtype_name, chunk, relerr_classification,
                        fused_gate, feval,
                        lows, lengths, n_dev, parent_est,
                        global_lo, global_range,
                        eps_dev,
                        jnp.asarray(epsrel, jnp.float64),
                        jnp.asarray(epsabs, jnp.float64),
                        jnp.asarray(cum.estimate, jnp.float64),
                        jnp.asarray(cum.errorest, jnp.float64),
                        jnp.asarray(float(result_nregions), jnp.float64),
                        jnp.asarray(cum.iters, jnp.int32),
                        jnp.asarray(float(cum.neval), jnp.float64),
                        jnp.asarray(classifier._estimates, jnp.float64),
                        jnp.asarray(max_iterations, jnp.int32),
                        apv_dev,
                        jnp.asarray(float(cum.neval) + _burst_evals()
                                    / max(self.eval_cost, 1.0),
                                    jnp.float64),
                        rule_backend=self.rule_backend,
                        f_axes=self._f_axes,
                        with_split_frac=crease_split,
                        interpret=jax.default_backend() != "tpu")
                if crease_split:
                    (lows, lengths, parent_est, sdim_f, frac_f,
                     packed_d) = fout
                else:
                    lows, lengths, parent_est, sdim_f, packed_d = fout
                    frac_f = None
                # ONE D2H sync for every scalar of the whole burst
                packed = np.asarray(packed_d)
                n = int(packed[0])
                n_dev = jnp.asarray(n, jnp.int32)
                fused_iters = int(packed[4]) - cum.iters
                status = int(packed[6])
                cum.estimate, cum.errorest = float(packed[1]), float(packed[2])
                result_nregions = int(packed[3])
                cum.nFinishedRegions = result_nregions  # incremented in
                # lockstep everywhere (finished == dropped-from-pool)
                cum.iters = int(packed[4])
                cum.neval = int(packed[5])
                classifier._estimates = [float(packed[13]),
                                         float(packed[14]),
                                         float(packed[15])]
                classifier._iters_collected += fused_iters
                inflight_est, inflight_err = float(packed[7]), float(packed[8])
                it = cum.iters
                if status == 1:
                    # bucket overflow: the fused phase already applied the
                    # sweep and handed back the n compacted survivors (full
                    # cap-sized arrays); split them into the 2*cap bucket
                    # -- no re-evaluation.  (Done BEFORE the budget check
                    # so a budget expiry on a growth iteration still exits
                    # with the split children, like the host loop.)
                    lows, lengths, _ = region_pool.split(
                        lows, lengths, sdim_f, n_dev, out_capacity=2 * cap,
                        frac=frac_f)
                    cap = 2 * cap
                    n = 2 * n
                    n_dev = jnp.asarray(n, jnp.int32)
                    use_refine = jnp.asarray(True)
                    blocked = True
                self.final_pool_errors = None  # fused exits carry no
                # per-region error stash (status-1 pools are post-split,
                # unevaluated); continuation falls back to pool order
                if status in (0, 2):
                    # pool unchanged and already swept: the resumable
                    # ledger excludes that sweep (prev_* from the carry)
                    self.final_pool = (lows, lengths, n, True)
                    self._ledger_excl_pool = (float(packed[9]),
                                              float(packed[10]),
                                              int(packed[11]),
                                              int(packed[12]),
                                              int(packed[16]))
                else:
                    # pool is post-split and NOT yet evaluated: the full
                    # current ledger already excludes it
                    self.final_pool = (lows, lengths, n, True)
                    self._ledger_excl_pool = (cum.estimate, cum.errorest,
                                              result_nregions, cum.iters,
                                              cum.neval)
                if status == 0:          # accuracy reached
                    cum.status = 0
                    cum.nregions = result_nregions + n
                    return cum
                if status == 2:          # every region finished
                    cum.nregions = result_nregions
                    return cum
                if it >= max_iterations:
                    exhausted = True
                    break
                if status == 1:
                    continue
                # gate crossing (status -1): one host iteration handles
                # the classifier, then the loop may re-enter fused

            t_iter = _time.perf_counter()
            effective_relerr = relerr_classification
            if (predict_split and n <= 15_000_000 and it < 15
                    and result_nregions == 0):
                effective_relerr = False  # (Workspace.cuh:206-211)
            eval_out = self._eval_pool(
                f, lows, lengths, global_lo, global_range,
                n=n_dev, blocked=blocked, n_host=n,
                with_split_frac=crease_split)
            if crease_split:
                est_raw, err_raw, sdim, sfrac = eval_out
            else:
                (est_raw, err_raw, sdim), sfrac = eval_out, None
            if vegas_assisted:
                # hybrid mode: keep the rule's bisection dimension but
                # overwrite estimates/errors with per-region adaptive MC
                # (reference: Sample.cuh:726-727, Phases.cuh:479-518)
                from gpuintegration_tpu.pagani.vegas_assisted import (
                    vegas_assisted_estimates)
                import jax.random as jrandom
                key = jrandom.fold_in(jrandom.PRNGKey(seed), it)
                est_raw, err_raw = vegas_assisted_estimates(
                    f, ndim, vegas_passes, vegas_samples_per_pass, 100,
                    dtype_name, key, lows, lengths,
                    global_lo, global_range)
            est, refined, active, scalars_d = _post_stage(
                effective_relerr, blocked, est_raw, err_raw, n_dev,
                parent_est, use_refine, eps_dev,
                lengths=None if apv_dev is None else lengths,
                abs_per_vol=apv_dev)
            if predict_split and result_nregions == 0 and it == 15:
                # pool snapshot (Workspace.cuh:244-248); carries the layout
                # flag -- blocked pools keep real slots in the first n/2 of
                # each static half, NOT [0, n) (region_pool.block_mask)
                self.last_snapshot = (lows, lengths, n, blocked)
            # live pool reference for checkpointing (utils.checkpoint),
            # plus this sweep's per-region (est, refined) -- the
            # partitioned continuation sorts survivors by refined error
            # (hottest-first slices) and uses the stored sums for its
            # early global convergence test
            self.final_pool = (lows, lengths, n, blocked)
            self.final_pool_errors = (est, refined)
            # cumulative ledger EXCLUDING this sweep: resuming from
            # final_pool re-evaluates the pool, so the resumable ledger must
            # not contain its latest contribution (see make_checkpoint)
            self._ledger_excl_pool = (cum.estimate, cum.errorest,
                                      result_nregions, cum.iters, cum.neval)
            # single D2H sync per iteration
            scalars = np.asarray(scalars_d)
            iter_est, iter_err, finished_est, finished_err = (
                float(scalars[0]), float(scalars[1]),
                float(scalars[2]), float(scalars[3]))
            n_active = int(scalars[4])
            cum.iters += 1
            cum.neval += n * feval
            if recorder is not None:
                recorder.record(
                    it=it, estimate=cum.estimate + iter_est,
                    errorest=cum.errorest + iter_err,
                    festimate=cum.estimate, ferrorest=cum.errorest,
                    nregions=n, fnregions=cum.nFinishedRegions,
                    time_ms=(_time.perf_counter() - t_iter) * 1e3)

            # -- accuracy termination (Workspace.cuh:251-262) ---------------
            if accuracy_reached(epsrel, epsabs,
                                abs(cum.estimate + iter_est),
                                cum.errorest + iter_err):
                cum.estimate += iter_est
                cum.errorest += iter_err
                cum.status = 0
                cum.nregions = result_nregions + n
                return cum

            classifier.store_estimate(cum.estimate + iter_est)

            # -- error-budget-overflow rollback (Workspace.cuh:121-146) -----
            # The budget is max(epsrel*|est|, epsabs) -- the same test
            # accuracy_reached applies.  The reference omits the epsabs
            # term (its demos are epsrel-driven); here epsabs-dominated
            # runs are real (the partitioned continuation hands inexact
            # slices a purely absolute share target with epsrel=0), and
            # an epsrel-only rollback would fire on ANY banked error,
            # un-retiring every region each iteration.
            leaves_est = cum.estimate + iter_est
            leaves_fin_err = cum.errorest + finished_err
            if leaves_fin_err > max(abs(leaves_est) * epsrel, epsabs):
                active = _all_active(active, n_dev, blocked)
                finished_est = 0.0
                finished_err = 0.0
                n_active = n

            # -- memory-pressure heuristic classify (Workspace.cuh:76-118) --
            must_terminate = False
            classification_necessary = not classifier.split_fits(n)
            if classifier.classification_criteria_met(n):
                hs = classifier.classify_ladder(
                    refined, region_pool.block_mask(cap, n_dev, blocked), n,
                    iter_err, finished_err, cum.errorest)
                success = hs.pass_mem and hs.pass_errorest_budget
                if success:
                    active = hs.active_flags
                    # ONE packed D2H for both banked sums (separate
                    # device-scalar reads cost ~30 ms sync each)
                    kept = np.asarray(
                        jnp.stack([_dot(active, est), _dot(active, refined)]))
                    finished_est = iter_est - float(kept[0])
                    # EXACT banked error: sum of refined error over every
                    # region the new flags drop.  The reference banks
                    # hs.finished_errorest = iter - kept - iter_finished
                    # instead (heuristic_classifier.cuh:317-324,
                    # Workspace.cuh:111-112), which double-subtracts
                    # relative-finished regions whose error sits above
                    # the threshold and silently drops the
                    # relative-finished error from its cumulative ledger
                    # -- observed here as a NEGATIVE total errorest.  The
                    # threshold DECISION (budget test) keeps the
                    # reference's formula; only the ledger is exact.
                    finished_err = iter_err - float(kept[1])
                    n_active = hs.num_active
                # Terminate only when classification is BOTH necessary and
                # failed (Workspace.cuh:76-118).  A failed ladder reports
                # num_active=0, which must not read as "all finished" --
                # the all-finished case (success with zero survivors) flows
                # into the n_active==0 exit below with correct accounting.
                must_terminate = not success and classification_necessary
            else:
                must_terminate = classification_necessary

            if must_terminate:
                cum.estimate += iter_est
                cum.errorest += iter_err
                cum.nregions = result_nregions + n
                return cum

            cum.estimate += finished_est
            cum.errorest += finished_err
            # active (still-in-flight) contribution of this iteration; added
            # on a max-iterations exit so the returned estimate reflects the
            # latest full sweep.  (The reference drops it at its 700-iter
            # exit, Workspace.cuh:354-357, returning only the finished part
            # -- deliberate deviation for usability; status stays 1.)
            inflight_est = iter_est - finished_est
            inflight_err = iter_err - finished_err

            # -- compaction + split ------------------------------------------
            result_nregions += n - n_active
            cum.nFinishedRegions += n - n_active
            if n_active == 0:
                cum.nregions = result_nregions
                return cum

            child_cap = max(region_pool.next_pow2(2 * n_active),
                            self.chunk_size)
            cres = region_pool.compact(
                active, lows, lengths, sdim, est, refined,
                out_capacity=child_cap // 2, extra=sfrac)
            (n_active_d, c_lows, c_lengths, c_sdim, parent_est,
             _parent_err) = cres[:6]
            c_frac = cres[6] if crease_split else None
            lows, lengths, n_children = region_pool.split(
                c_lows, c_lengths, c_sdim, n_active_d,
                out_capacity=child_cap, frac=c_frac)
            n = 2 * n_active
            n_dev = jnp.asarray(n, jnp.int32)
            cap = child_cap
            use_refine = jnp.asarray(True)
            blocked = True
            it += 1

        if exhausted and cum.iters > 0:
            # max_iterations exhausted: include the last sweep's active
            # contribution so the estimate is complete.  (The reference
            # drops it at its 700-iter exit, Workspace.cuh:354-357,
            # returning only the finished part -- deliberate deviation for
            # usability; status stays 1.)
            cum.estimate += inflight_est
            cum.errorest += inflight_err

        cum.nregions = result_nregions + n
        return cum

    def _integrate_vector(
        self, f, ncomp, epsrel, epsabs, global_lo, global_range,
        partitions_per_axis, relerr_classification, max_iterations,
        initial_regions, recorder, finish_scale=1.0, abs_per_vol=0.0,
        fused=True, ledger=None, deadline=None,
    ) -> IntegrationResult:
        """Adaptive loop for vector-valued integrands: f maps (..., ndim)
        -> (..., ncomp).  All components share one point set and one
        region tree; a region is finished only when EVERY component meets
        its tolerance, the bisection dimension takes the max fourth
        difference over components, and the run converges when every
        component's cumulative error passes (cubacpp all-components
        semantics, integrand_traits.hh:81-93).  The classifier and the
        error-budget rollback key on the WORST component.

        ``ledger``: optional ((ncomp,) est, (ncomp,) err, nregions,
        iters, neval) seed -- the vector resume semantics (the scalar
        ledger docs on integrate() apply per component).  ``fused``: run
        sub-gate bursts on device via
        fused_loop.fused_adaptive_phase_vector (same exit protocol as
        the scalar fused phase, iteration-equivalent by construction:
        both paths trace iteration_math_vector)."""
        import time as _time
        ndim, dtype, dtype_name = self.ndim, self.dtype, self.dtype.name
        eps_dev = jnp.asarray(epsrel * finish_scale, dtype)
        apv_dev = (jnp.asarray(abs_per_vol, dtype)
                   if abs_per_vol > 0.0 else None)

        min_cap = self.chunk_size
        if initial_regions is not None:
            # host-side transpose: see the dims-major transfer note in
            # integrate() -- a region-major device transfer lane-pads 16x
            lows0 = jnp.asarray(np.asarray(initial_regions[0], dtype).T)
            lengths0 = jnp.asarray(np.asarray(initial_regions[1], dtype).T)
            n = int(lows0.shape[1])
            cap = max(region_pool.next_pow2(n), min_cap)
            pad = cap - n
            lows = jnp.concatenate(
                [lows0, jnp.broadcast_to(lows0[:, :1], (ndim, pad))], axis=1)
            lengths = jnp.concatenate(
                [lengths0, jnp.broadcast_to(lengths0[:, :1], (ndim, pad))],
                axis=1)
        else:
            parts = partitions_per_axis or default_partitions_per_axis(ndim)
            n = parts ** ndim
            cap = max(region_pool.next_pow2(n), min_cap)
            lows, lengths, n = region_pool.uniform_split(
                ndim, parts, cap, dtype)

        parent_est = jnp.zeros((ncomp, max(cap // 2, 1)), dtype)
        use_refine = jnp.asarray(False)
        n_dev = jnp.asarray(n, jnp.int32)

        classifier = HeuristicClassifier(epsrel * finish_scale, epsabs,
                                         self.max_pool_regions)
        feval = rule_eval.rule_tables(ndim, dtype_name).feval

        cum = IntegrationResult(status=1)
        cum_est = np.zeros(ncomp)
        cum_err = np.zeros(ncomp)
        result_nregions = 0
        if ledger is not None:
            est_seed, err_seed, result_nregions, it_seed, nev_seed = ledger
            cum_est = np.asarray(est_seed, np.float64).copy()
            cum_err = np.asarray(err_seed, np.float64).copy()
            if cum_est.shape != (ncomp,) or cum_err.shape != (ncomp,):
                raise ValueError(
                    f"vector ledger est/err must have shape ({ncomp},)")
            cum.iters = int(it_seed)
            cum.neval = int(nev_seed)
            cum.nFinishedRegions = result_nregions
            max_iterations = max_iterations + cum.iters
        blocked = False
        inflight_est = np.zeros(ncomp)
        inflight_err = np.zeros(ncomp)
        exhausted = False

        def all_accuracy(ests, errs):
            return all(accuracy_reached(epsrel, epsabs, abs(e), r)
                       for e, r in zip(ests, errs))

        fused_gate = int(0.1 * self.max_pool_regions)
        fused_ok = fused and recorder is None

        it = cum.iters
        while True:
            if it >= max_iterations or (
                    deadline is not None
                    and _time.monotonic() >= deadline):
                exhausted = True
                break
            if n <= 0:
                break

            if fused_ok and blocked and 2 * n <= fused_gate:
                from gpuintegration_tpu.pagani import fused_loop
                chunk = self.chunk_size if cap > self.chunk_size else None
                lows, lengths, parent_est, sdim_f, packed_d = \
                    fused_loop.fused_adaptive_phase_vector(
                        f, ndim, ncomp, dtype_name, chunk,
                        relerr_classification, fused_gate, feval,
                        lows, lengths, n_dev, parent_est,
                        global_lo, global_range,
                        eps_dev,
                        jnp.asarray(epsrel, jnp.float64),
                        jnp.asarray(epsabs, jnp.float64),
                        jnp.asarray(cum_est, jnp.float64),
                        jnp.asarray(cum_err, jnp.float64),
                        jnp.asarray(float(result_nregions), jnp.float64),
                        jnp.asarray(cum.iters, jnp.int32),
                        jnp.asarray(float(cum.neval), jnp.float64),
                        jnp.asarray(classifier._estimates, jnp.float64),
                        jnp.asarray(max_iterations, jnp.int32),
                        apv_dev,
                        jnp.asarray(float(cum.neval) + _burst_evals()
                                    / max(self.eval_cost, 1.0),
                                    jnp.float64))
                packed = np.asarray(packed_d)   # ONE sync for the burst
                n = int(packed[0])
                n_dev = jnp.asarray(n, jnp.int32)
                fused_iters = int(packed[2]) - cum.iters
                result_nregions = int(packed[1])
                cum.nFinishedRegions = result_nregions
                cum.iters = int(packed[2])
                cum.neval = int(packed[3])
                status = int(packed[4])
                prev_nreg = int(packed[5])
                prev_iters = int(packed[6])
                prev_neval = int(packed[7])
                classifier._estimates = [float(packed[8]), float(packed[9]),
                                         float(packed[10])]
                classifier._iters_collected += fused_iters
                o = 11
                cum_est = packed[o:o + ncomp].copy(); o += ncomp
                cum_err = packed[o:o + ncomp].copy(); o += ncomp
                inflight_est = packed[o:o + ncomp].copy(); o += ncomp
                inflight_err = packed[o:o + ncomp].copy(); o += ncomp
                prev_est = packed[o:o + ncomp].copy(); o += ncomp
                prev_err = packed[o:o + ncomp].copy()
                it = cum.iters
                if status == 1:
                    # bucket overflow: split the compacted survivors into
                    # the doubled bucket (before the budget check, like
                    # the scalar fused path)
                    lows, lengths, _ = region_pool.split(
                        lows, lengths, sdim_f, n_dev, out_capacity=2 * cap)
                    cap = 2 * cap
                    n = 2 * n
                    n_dev = jnp.asarray(n, jnp.int32)
                    use_refine = jnp.asarray(True)
                    blocked = True
                self.final_pool_errors = None   # fused exits carry no
                # per-region stash (see the scalar fused path note)
                self.final_pool = (lows, lengths, n, True)
                if status in (0, 2):
                    self._ledger_excl_pool = (prev_est, prev_err,
                                              prev_nreg, prev_iters,
                                              prev_neval)
                else:
                    self._ledger_excl_pool = (cum_est.copy(),
                                              cum_err.copy(),
                                              result_nregions, cum.iters,
                                              cum.neval)
                if status == 0:          # all components converged
                    cum.status = 0
                    cum.nregions = result_nregions + n
                    break
                if status == 2:          # every region finished
                    cum.nregions = result_nregions
                    break
                if it >= max_iterations:
                    exhausted = True
                    break
                if status == 1:
                    continue
                # gate crossing (status -1): one host iteration handles
                # the classifier, then the loop may re-enter fused

            t_iter = _time.perf_counter()
            est_raw, err_raw, sdim = self._eval_pool(
                f, lows, lengths, global_lo, global_range,
                n=n_dev, blocked=blocked, n_host=n, ncomp=ncomp)
            est, refined, active, scalars_d = _post_stage_vector(
                relerr_classification, blocked, ncomp, est_raw, err_raw,
                n_dev, parent_est, use_refine, eps_dev,
                lengths=None if apv_dev is None else lengths,
                abs_per_vol=apv_dev)
            # live pool reference + this sweep's per-region component
            # arrays for checkpointing; the resumable ledger EXCLUDES
            # this sweep (same semantics as the scalar host loop)
            self.final_pool = (lows, lengths, n, blocked)
            self.final_pool_errors = (est, refined)
            self._ledger_excl_pool = (cum_est.copy(), cum_err.copy(),
                                      result_nregions, cum.iters,
                                      cum.neval)
            scalars = np.asarray(scalars_d)       # ONE sync per iteration
            iter_est = scalars[0:ncomp].astype(np.float64)
            iter_err = scalars[ncomp:2 * ncomp].astype(np.float64)
            finished_est = scalars[2 * ncomp:3 * ncomp].astype(np.float64)
            finished_err = scalars[3 * ncomp:4 * ncomp].astype(np.float64)
            n_active = int(scalars[4 * ncomp])
            cum.iters += 1
            cum.neval += n * feval
            if recorder is not None:
                recorder.record(
                    it=it, estimate=float(cum_est[0] + iter_est[0]),
                    errorest=float(cum_err[0] + iter_err[0]),
                    festimate=float(cum_est[0]), ferrorest=float(cum_err[0]),
                    nregions=n, fnregions=cum.nFinishedRegions,
                    time_ms=(_time.perf_counter() - t_iter) * 1e3)

            if all_accuracy(cum_est + iter_est, cum_err + iter_err):
                cum_est = cum_est + iter_est
                cum_err = cum_err + iter_err
                cum.status = 0
                cum.nregions = result_nregions + n
                break

            # worst component (max relative error) drives classification:
            # its estimate sets the ladder's error budget scale -- storing
            # component 0 would compute pass_errorest_budget at the wrong
            # magnitude when component scales differ
            w = int(np.argmax(
                (cum_err + iter_err) /
                np.maximum(np.abs(cum_est + iter_est), 1e-300)))
            classifier.store_estimate(float(cum_est[w] + iter_est[w]))

            # rollback when ANY component's finished error would overflow
            # its budget (worst-component generalisation of
            # Workspace.cuh:121-146).  The budget is
            # max(epsrel*|est|, epsabs), same as the scalar host loop and
            # the mesh loop: an epsrel-only budget would fire on ANY
            # banked error under an epsabs-driven run (epsrel=0),
            # un-retiring every region each iteration (commit b27074e).
            if any(ce + fe > max(abs(le) * epsrel, epsabs)
                   for ce, fe, le in zip(cum_err, finished_err,
                                         cum_est + iter_est)):
                active = _all_active(active, n_dev, blocked)
                finished_est = np.zeros(ncomp)
                finished_err = np.zeros(ncomp)
                n_active = n

            must_terminate = False
            classification_necessary = not classifier.split_fits(n)
            if classifier.classification_criteria_met(n):
                hs = classifier.classify_ladder(
                    _max_over_components(refined),
                    region_pool.block_mask(cap, n_dev, blocked), n,
                    float(iter_err[w]), float(finished_err[w]),
                    float(cum_err[w]))
                success = hs.pass_mem and hs.pass_errorest_budget
                if success:
                    kept = np.asarray(jnp.stack(
                        [_dot(hs.active_flags, est[c])
                         for c in range(ncomp)]
                        + [_dot(hs.active_flags, refined[c])
                           for c in range(ncomp)]))
                    cand_est = iter_est - kept[:ncomp]
                    cand_err = iter_err - kept[ncomp:]
                    # Per-component budget guard: the ladder's own
                    # budget test keys on the WORST component only, so a
                    # drop that passes there can bank another
                    # component's error past that component's whole
                    # certificate budget -- after which no continuation
                    # can ever certify it (the hopeless-bank exit
                    # downstream fires; observed: a 2-component run
                    # banked 3.3x component 0's budget while classifying
                    # on component 1).  Enforce what the scalar
                    # classifier guarantees by construction: every
                    # component's cumulative banked error stays inside
                    # its own max(eps_work*|est|, epsabs).
                    eps_work_v = epsrel * finish_scale
                    targets = np.maximum(
                        np.abs(cum_est + iter_est) * eps_work_v, epsabs)
                    if np.all(cum_err + cand_err <= targets):
                        active = hs.active_flags
                        finished_est = cand_est
                        finished_err = cand_err
                        n_active = hs.num_active
                    else:
                        success = False
                must_terminate = not success and classification_necessary
            else:
                must_terminate = classification_necessary

            if must_terminate:
                cum_est = cum_est + iter_est
                cum_err = cum_err + iter_err
                cum.nregions = result_nregions + n
                break

            cum_est = cum_est + finished_est
            cum_err = cum_err + finished_err
            inflight_est = iter_est - finished_est
            inflight_err = iter_err - finished_err

            result_nregions += n - n_active
            cum.nFinishedRegions += n - n_active
            if n_active == 0:
                cum.nregions = result_nregions
                break

            child_cap = max(region_pool.next_pow2(2 * n_active),
                            self.chunk_size)
            (n_active_d, c_lows, c_lengths, c_sdim, parent_est,
             _parent_err) = region_pool.compact(
                active, lows, lengths, sdim, est, refined,
                out_capacity=child_cap // 2)
            lows, lengths, _ = region_pool.split(
                c_lows, c_lengths, c_sdim, n_active_d,
                out_capacity=child_cap)
            n = 2 * n_active
            n_dev = jnp.asarray(n, jnp.int32)
            cap = child_cap
            use_refine = jnp.asarray(True)
            blocked = True
            it += 1

        if exhausted and cum.iters > 0:
            cum_est = cum_est + inflight_est
            cum_err = cum_err + inflight_err
            cum.nregions = result_nregions + n
        elif cum.nregions == 0:
            cum.nregions = result_nregions + (n if n > 0 else 0)
        cum.estimates = cum_est
        cum.errorests = cum_err
        cum.estimate = float(cum_est[0])
        cum.errorest = float(cum_err[0])
        return cum

    def _integrate_mesh(
        self, f, epsrel, epsabs, global_lo, global_range,
        partitions_per_axis, relerr_classification, max_iterations,
        initial_regions, recorder, fused, ledger=None, finish_scale=1.0,
        abs_per_vol=0.0, deadline=None, ncomp=1, crease_split=False,
    ) -> IntegrationResult:
        """Multi-chip adaptive loop: D independent shard-local sub-pools.

        ``ncomp`` > 1 (round 4): vector integrands run the same
        shard-local pipeline with component-major (ncomp, D*cap_s)
        estimates and "(ncomp,) replicated scalar carries" -- the
        psum'd concatenated iteration vector of
        sharded_post_stage_vector.  The classifier keys on the worst
        component with the per-component budget guard of the
        single-chip vector loop; the fused phase stays scalar-only
        (vector runs use the fused vector phase's mesh form since
        round 5), documented on Workspace.integrate.

        Each device owns a BLOCKED sub-pool of per-shard capacity
        ``cap_s`` with its OWN region count; eval, two-level refinement,
        compaction and split are shard-local inside shard_map (region
        data never crosses chips -- the reference has no multi-GPU mode
        at all, SURVEY.md section 2.7), and only the f64 iteration
        scalars are psum'd.  The fused adaptive phase, dynamic-trip
        chunking and the memory-pressure classifier all run exactly as
        in the single-chip loop; WITHIN a round shards do not rebalance,
        so a skewed refinement grows every shard's bucket when the
        hottest shard overflows (documented trade: zero region traffic
        vs possible idle lanes).  At CONTINUATION boundaries
        (integrate_to_convergence) the checkpointed survivors are
        re-dealt error-evenly across shards
        (_rebalance_checkpoint_for_mesh), so the skew resets every
        resume round.
        """
        import time as _time
        from gpuintegration_tpu.parallel import sharded as S
        from gpuintegration_tpu.parallel.mesh import (
            pool_sharding, region_sharding)

        mesh = self.mesh
        D = int(mesh.devices.size)
        ndim, dtype, dtype_name = self.ndim, self.dtype, self.dtype.name
        eps_dev = jnp.asarray(epsrel * finish_scale, dtype)
        apv_dev = (jnp.asarray(abs_per_vol, dtype)
                   if abs_per_vol > 0.0 else None)

        # ---- initial per-shard pools (host NumPy; initial pools are tiny)
        if initial_regions is not None:
            lo_np = np.asarray(initial_regions[0], dtype).T   # (ndim, n)
            ln_np = np.asarray(initial_regions[1], dtype).T
            n = int(lo_np.shape[1])
        else:
            parts = partitions_per_axis or default_partitions_per_axis(ndim)
            n = parts ** ndim
            lo_d, ln_d, _ = region_pool.uniform_split(ndim, parts, n, dtype)
            lo_np, ln_np = np.asarray(lo_d), np.asarray(ln_d)
        counts = [n // D + (1 if k < n % D else 0) for k in range(D)]
        cap_s = max(region_pool.next_pow2(max(counts)), self.chunk_size)
        glo = np.empty((ndim, D * cap_s), dtype)
        gln = np.empty((ndim, D * cap_s), dtype)
        start = 0
        for k, c in enumerate(counts):
            sl = slice(k * cap_s, k * cap_s + c)
            glo[:, sl] = lo_np[:, start:start + c]
            gln[:, sl] = ln_np[:, start:start + c]
            # padding replicates region 0 (finite bounds; masked out)
            glo[:, k * cap_s + c:(k + 1) * cap_s] = lo_np[:, :1]
            gln[:, k * cap_s + c:(k + 1) * cap_s] = ln_np[:, :1]
            start += c
        psh, vsh = pool_sharding(mesh), region_sharding(mesh)
        lows = jax.device_put(jnp.asarray(glo), psh)
        lengths = jax.device_put(jnp.asarray(gln), psh)
        ns = jax.device_put(jnp.asarray(counts, jnp.int32), vsh)
        vec = ncomp > 1
        parent_est = jax.device_put(
            jnp.zeros((D * cap_s,) if not vec else (ncomp, D * cap_s),
                      dtype), vsh if not vec else psh)
        use_refine = jnp.asarray(False)

        classifier = HeuristicClassifier(epsrel * finish_scale, epsabs,
                                         self.max_pool_regions)
        feval = rule_eval.rule_tables(ndim, dtype_name).feval
        cum = IntegrationResult(status=1)
        cum_est = np.zeros(ncomp)
        cum_err = np.zeros(ncomp)
        result_nregions = 0
        if ledger is not None:
            est_seed, err_seed, result_nregions, it_seed, nev_seed = ledger
            cum_est = np.atleast_1d(
                np.asarray(est_seed, np.float64)).copy()
            cum_err = np.atleast_1d(
                np.asarray(err_seed, np.float64)).copy()
            if cum_est.shape != (ncomp,):
                raise ValueError(
                    f"mesh ledger est/err must have shape ({ncomp},)")
            cum.iters = int(it_seed)
            cum.neval = int(nev_seed)
            cum.nFinishedRegions = result_nregions
            max_iterations = max_iterations + cum.iters
        cum.estimate, cum.errorest = float(cum_est[0]), float(cum_err[0])
        blocked = False
        fused_gate = int(0.1 * self.max_pool_regions)
        fused_ok = fused and recorder is None
        # scalar path keeps plain floats: an exhausted exit before the
        # first sweep folds these into cum.estimate, and a (1,) ndarray
        # there would turn the result's scalar fields into arrays
        inflight_est = np.zeros(ncomp) if vec else 0.0
        inflight_err = np.zeros(ncomp) if vec else 0.0
        exhausted = False

        def all_accuracy(ests, errs):
            return all(accuracy_reached(epsrel, epsabs, abs(e), r)
                       for e, r in zip(ests, errs))

        def _chunk(cs):
            return self.chunk_size if cs > self.chunk_size else None

        it = cum.iters
        while True:
            if it >= max_iterations or (
                    deadline is not None
                    and _time.monotonic() >= deadline):
                exhausted = True
                break
            if n <= 0:
                break

            if fused_ok and blocked and 2 * n <= fused_gate:
                from gpuintegration_tpu.pagani import fused_loop
                nev_cap = jnp.asarray(
                    float(cum.neval) + _burst_evals()
                    / max(self.eval_cost, 1.0), jnp.float64)
                if vec:
                    (lows, lengths, parent_est, sdim_f, ns, packed_d) = \
                        fused_loop.fused_adaptive_phase_vector(
                            f, ndim, ncomp, dtype_name, _chunk(cap_s),
                            relerr_classification, fused_gate, feval,
                            lows, lengths, ns, parent_est,
                            global_lo, global_range, eps_dev,
                            jnp.asarray(epsrel, jnp.float64),
                            jnp.asarray(epsabs, jnp.float64),
                            jnp.asarray(cum_est, jnp.float64),
                            jnp.asarray(cum_err, jnp.float64),
                            jnp.asarray(float(result_nregions),
                                        jnp.float64),
                            jnp.asarray(cum.iters, jnp.int32),
                            jnp.asarray(float(cum.neval), jnp.float64),
                            jnp.asarray(classifier._estimates,
                                        jnp.float64),
                            jnp.asarray(max_iterations, jnp.int32),
                            apv_dev, nev_cap, mesh=mesh)
                    frac_f = None
                    packed = np.asarray(packed_d)   # ONE sync per burst
                    n = int(packed[0])
                    fused_iters = int(packed[2]) - cum.iters
                    result_nregions = int(packed[1])
                    cum.nFinishedRegions = result_nregions
                    cum.iters = int(packed[2])
                    cum.neval = int(packed[3])
                    status = int(packed[4])
                    prev_nreg = int(packed[5])
                    prev_iters = int(packed[6])
                    prev_neval = int(packed[7])
                    classifier._estimates = [float(packed[8]),
                                             float(packed[9]),
                                             float(packed[10])]
                    o = 11
                    cum_est = packed[o:o + ncomp].copy(); o += ncomp
                    cum_err = packed[o:o + ncomp].copy(); o += ncomp
                    inflight_est = packed[o:o + ncomp].copy(); o += ncomp
                    inflight_err = packed[o:o + ncomp].copy(); o += ncomp
                    prev_est = packed[o:o + ncomp].copy(); o += ncomp
                    prev_err = packed[o:o + ncomp].copy()
                    cum.estimate = float(cum_est[0])
                    cum.errorest = float(cum_err[0])
                    ledger_excl = (
                        (prev_est, prev_err, prev_nreg, prev_iters,
                         prev_neval) if status in (0, 2) else
                        (cum_est.copy(), cum_err.copy(), result_nregions,
                         cum.iters, cum.neval))
                else:
                    fout = fused_loop.fused_adaptive_phase(
                            f, ndim, dtype_name, _chunk(cap_s),
                            relerr_classification, fused_gate, feval,
                            lows, lengths, ns, parent_est,
                            global_lo, global_range, eps_dev,
                            jnp.asarray(epsrel, jnp.float64),
                            jnp.asarray(epsabs, jnp.float64),
                            jnp.asarray(cum.estimate, jnp.float64),
                            jnp.asarray(cum.errorest, jnp.float64),
                            jnp.asarray(float(result_nregions),
                                        jnp.float64),
                            jnp.asarray(cum.iters, jnp.int32),
                            jnp.asarray(float(cum.neval), jnp.float64),
                            jnp.asarray(classifier._estimates,
                                        jnp.float64),
                            jnp.asarray(max_iterations, jnp.int32),
                            apv_dev, nev_cap, mesh=mesh,
                            with_split_frac=crease_split)
                    if crease_split:
                        (lows, lengths, parent_est, sdim_f, frac_f, ns,
                         packed_d) = fout
                    else:
                        (lows, lengths, parent_est, sdim_f, ns,
                         packed_d) = fout
                        frac_f = None
                    packed = np.asarray(packed_d)   # ONE sync per burst
                    n = int(packed[0])
                    fused_iters = int(packed[4]) - cum.iters
                    status = int(packed[6])
                    cum.estimate, cum.errorest = (float(packed[1]),
                                                  float(packed[2]))
                    result_nregions = int(packed[3])
                    cum.nFinishedRegions = result_nregions
                    cum.iters = int(packed[4])
                    cum.neval = int(packed[5])
                    classifier._estimates = [float(packed[13]),
                                             float(packed[14]),
                                             float(packed[15])]
                    inflight_est, inflight_err = (float(packed[7]),
                                                  float(packed[8]))
                    ledger_excl = (
                        (float(packed[9]), float(packed[10]),
                         int(packed[11]), int(packed[12]),
                         int(packed[16])) if status in (0, 2) else
                        (cum.estimate, cum.errorest, result_nregions,
                         cum.iters, cum.neval))
                classifier._iters_collected += fused_iters
                it = cum.iters
                if status == 1:
                    # bucket overflow: shard-local split of the compacted
                    # survivors into the doubled per-shard buckets
                    # (crease runs carry their compacted cut fractions)
                    ns, lows, lengths = S.sharded_split(
                        mesh, 2 * cap_s, lows, lengths, sdim_f, ns,
                        frac=frac_f)
                    cap_s *= 2
                    n *= 2
                    use_refine = jnp.asarray(True)
                    blocked = True
                self.final_pool = ("mesh", lows, lengths,
                                   np.asarray(ns), cap_s, True)
                self.final_pool_errors = None   # fused exits carry no
                # per-region stash (status-1 pools are post-split)
                self._ledger_excl_pool = ledger_excl
                if status in (0, 2):
                    cum.status = 0 if status == 0 else cum.status
                    cum.nregions = (result_nregions + n if status == 0
                                    else result_nregions)
                    if vec:
                        cum.estimates = cum_est.copy()
                        cum.errorests = cum_err.copy()
                    return cum
                if it >= max_iterations:
                    exhausted = True
                    break
                if status == 1:
                    continue
                # gate crossing (status -1): host iteration w/ classifier

            t_iter = _time.perf_counter()
            eval_out = S.sharded_eval_stage(
                f, ndim, dtype_name, mesh, lows, lengths,
                global_lo, global_range, ns=ns,
                chunk_size=_chunk(cap_s), blocked=blocked, ncomp=ncomp,
                with_split_frac=crease_split)
            if crease_split:
                est_raw, err_raw, sdim, sfrac = eval_out
            else:
                (est_raw, err_raw, sdim), sfrac = eval_out, None
            if vec:
                est, refined, active, mask_b, _ns_act, scalars_d = \
                    S.sharded_post_stage_vector(
                        relerr_classification, blocked, mesh, ncomp,
                        est_raw, err_raw, ns, parent_est, use_refine,
                        eps_dev,
                        lengths=None if apv_dev is None else lengths,
                        abs_per_vol=apv_dev)
            else:
                est, refined, active, mask_b, _ns_act, scalars_d = \
                    S.sharded_post_stage(
                        relerr_classification, blocked, mesh,
                        est_raw, err_raw, ns, parent_est, use_refine,
                        eps_dev,
                        lengths=None if apv_dev is None else lengths,
                        abs_per_vol=apv_dev)
            self.final_pool = ("mesh", lows, lengths, np.asarray(ns),
                               cap_s, blocked)
            # this sweep's per-region (est, refined) on the global layout
            # (same keep indexing as the pool): the continuation-boundary
            # shard rebalance sorts survivors on these
            self.final_pool_errors = (est, refined)
            self._ledger_excl_pool = (
                (cum_est.copy(), cum_err.copy(), result_nregions,
                 cum.iters, cum.neval) if vec else
                (cum.estimate, cum.errorest, result_nregions, cum.iters,
                 cum.neval))
            scalars = np.asarray(scalars_d)       # ONE sync per iteration
            if vec:
                iter_est = scalars[0:ncomp].astype(np.float64)
                iter_err = scalars[ncomp:2 * ncomp].astype(np.float64)
                finished_est = scalars[2 * ncomp:3 * ncomp].astype(
                    np.float64)
                finished_err = scalars[3 * ncomp:4 * ncomp].astype(
                    np.float64)
                n_active = int(scalars[4 * ncomp])
            else:
                iter_est, iter_err, finished_est, finished_err = (
                    float(scalars[0]), float(scalars[1]),
                    float(scalars[2]), float(scalars[3]))
                n_active = int(scalars[4])
            cum.iters += 1
            cum.neval += n * feval
            if recorder is not None:
                ce0 = float(cum_est[0]) if vec else cum.estimate
                cr0 = float(cum_err[0]) if vec else cum.errorest
                recorder.record(
                    it=it, estimate=ce0 + np.ravel(iter_est)[0],
                    errorest=cr0 + np.ravel(iter_err)[0],
                    festimate=ce0, ferrorest=cr0,
                    nregions=n, fnregions=cum.nFinishedRegions,
                    time_ms=(_time.perf_counter() - t_iter) * 1e3)

            if vec:
                converged_now = all_accuracy(cum_est + iter_est,
                                             cum_err + iter_err)
            else:
                converged_now = accuracy_reached(
                    epsrel, epsabs, abs(cum.estimate + iter_est),
                    cum.errorest + iter_err)
            if converged_now:
                if vec:
                    cum_est = cum_est + iter_est
                    cum_err = cum_err + iter_err
                else:
                    cum.estimate += iter_est
                    cum.errorest += iter_err
                cum.status = 0
                cum.nregions = result_nregions + n
                break

            if vec:
                # worst component drives classification (see the
                # single-chip vector loop's note)
                w = int(np.argmax(
                    (cum_err + iter_err) /
                    np.maximum(np.abs(cum_est + iter_est), 1e-300)))
                classifier.store_estimate(float(cum_est[w] + iter_est[w]))
                overflow = any(
                    ce + fe > max(abs(le) * epsrel, epsabs)
                    for ce, fe, le in zip(cum_err, finished_err,
                                          cum_est + iter_est))
            else:
                classifier.store_estimate(cum.estimate + iter_est)
                # error-budget-overflow rollback (Workspace.cuh:121-146);
                # budget includes the epsabs term (host loop's note)
                overflow = (cum.errorest + finished_err) > max(
                    abs(cum.estimate + iter_est) * epsrel, epsabs)
            if overflow:
                active = jnp.where(mask_b, 1.0, 0.0).astype(dtype)
                if vec:
                    finished_est = np.zeros(ncomp)
                    finished_err = np.zeros(ncomp)
                else:
                    finished_est = finished_err = 0.0
                n_active = n

            # memory-pressure heuristic classify (Workspace.cuh:76-118)
            must_terminate = False
            classification_necessary = not classifier.split_fits(n)
            if classifier.classification_criteria_met(n):
                if vec:
                    hs = classifier.classify_ladder(
                        _max_over_components(refined), mask_b, n,
                        float(iter_err[w]), float(finished_err[w]),
                        float(cum_err[w]))
                else:
                    hs = classifier.classify_ladder(
                        refined, mask_b, n, iter_err, finished_err,
                        cum.errorest)
                success = hs.pass_mem and hs.pass_errorest_budget
                if success and vec:
                    kept = np.asarray(jnp.stack(
                        [_dot(hs.active_flags, est[c])
                         for c in range(ncomp)]
                        + [_dot(hs.active_flags, refined[c])
                           for c in range(ncomp)]))
                    cand_est = iter_est - kept[:ncomp]
                    cand_err = iter_err - kept[ncomp:]
                    # per-component budget guard (single-chip vector
                    # loop's note: the ladder keys on the worst
                    # component only)
                    targets = np.maximum(
                        np.abs(cum_est + iter_est)
                        * (epsrel * finish_scale), epsabs)
                    if np.all(cum_err + cand_err <= targets):
                        active = hs.active_flags
                        finished_est = cand_est
                        finished_err = cand_err
                        n_active = hs.num_active
                    else:
                        success = False
                elif success:
                    active = hs.active_flags
                    kept = np.asarray(
                        jnp.stack([_dot(active, est),
                                   _dot(active, refined)]))
                    finished_est = iter_est - float(kept[0])
                    # exact banked error (see the single-chip loop's
                    # note: the reference's extra_f_errorest undercounts)
                    finished_err = iter_err - float(kept[1])
                    n_active = hs.num_active
                must_terminate = not success and classification_necessary
            else:
                must_terminate = classification_necessary

            if must_terminate:
                if vec:
                    cum_est = cum_est + iter_est
                    cum_err = cum_err + iter_err
                else:
                    cum.estimate += iter_est
                    cum.errorest += iter_err
                cum.nregions = result_nregions + n
                break

            if vec:
                cum_est = cum_est + finished_est
                cum_err = cum_err + finished_err
            else:
                cum.estimate += finished_est
                cum.errorest += finished_err
            inflight_est = iter_est - finished_est
            inflight_err = iter_err - finished_err

            result_nregions += n - n_active
            cum.nFinishedRegions += n - n_active
            if n_active == 0:
                n = 0      # epilogue computes nregions as result + n
                break

            # per-shard survivor counts pick the next per-shard bucket
            ns_act = np.asarray(
                jnp.sum(active.reshape(D, cap_s), axis=1)).astype(np.int64)
            child_cap_s = max(region_pool.next_pow2(2 * int(ns_act.max())),
                              self.chunk_size)
            ns, lows, lengths, parent_est, _perr = S.sharded_compact_split(
                mesh, child_cap_s, active, lows, lengths, sdim,
                est, refined, extra=sfrac)
            n = 2 * n_active
            cap_s = child_cap_s
            use_refine = jnp.asarray(True)
            blocked = True
            it += 1

        if exhausted and cum.iters > 0:
            if vec:
                cum_est = cum_est + inflight_est
                cum_err = cum_err + inflight_err
            else:
                cum.estimate += inflight_est
                cum.errorest += inflight_err
        cum.nregions = result_nregions + n
        if vec:
            cum.estimates = cum_est
            cum.errorests = cum_err
            cum.estimate = float(cum_est[0])
            cum.errorest = float(cum_err[0])
        return cum

    def _rebalance_checkpoint_for_mesh(self, ckpt):
        """Reorder a checkpoint's survivors so the mesh resume's
        contiguous per-shard slicing deals every shard an even hot/cold
        mix (SURVEY 2.7's optional cross-chip rebalance, realised at the
        continuation boundary -- the only point where regions may cross
        shards; inside a round compaction/split stay shard-local with
        zero region traffic).

        Survivors are sorted by stored refined error (hottest first; pool
        order when a fused exit left no stash) and dealt round-robin:
        resume block k receives sorted regions k, k+D, k+2D, ...  Block
        sizes exactly match _integrate_mesh's contiguous slicing
        (len(order[k::D]) == n//D + (1 if k < n%D else 0)), so shard k's
        bucket holds a stride-D sample of the error distribution instead
        of a spatial cluster -- a one-corner-hot pool no longer lands its
        whole hot set on one shard, which previously grew EVERY shard's
        bucket once that shard overflowed (the documented skew trade)."""
        if self.mesh is None or ckpt.lows.shape[0] == 0:
            return ckpt
        import dataclasses as _dc
        D = int(self.mesh.devices.size)
        n = ckpt.lows.shape[0]
        if ckpt.region_errorests is not None:
            err = np.asarray(ckpt.region_errorests)
            if err.ndim == 2:          # vector stash: worst component
                err = err.max(axis=1)
            order = np.argsort(-err)   # hottest first
        else:
            order = np.arange(n)
        dealt = np.concatenate([order[k::D] for k in range(D)])
        return _dc.replace(
            ckpt,
            lows=ckpt.lows[dealt], lengths=ckpt.lengths[dealt],
            region_estimates=(None if ckpt.region_estimates is None
                              else np.asarray(ckpt.region_estimates)[dealt]),
            region_errorests=(None if ckpt.region_errorests is None
                              else np.asarray(ckpt.region_errorests)[dealt]))

    def integrate_to_convergence(
        self,
        integrand: Callable,
        epsrel: float = 1e-3,
        epsabs: float = 1e-12,
        vol: Volume | None = None,
        *,
        max_rounds: int = 16,
        min_err_reduction: float = 0.99,
        max_wall_s: float | None = None,
        stage_timer=None,
        state_path: str | None = None,
        **kw,
    ) -> IntegrationResult:
        """``integrate`` + checkpoint-resume continuation.

        ``stage_timer``: optional utils.profiling.StageTimer; records
        wall time per continuation stage ("round1", "resume_roundN",
        "slices" aggregated) -- the per-stage breakdown the reference
        writes to cuda_pagani_time_breakdown.csv (Workspace.cuh:171-241),
        at round granularity.  bench.py uses it to separate adaptive
        work from tunnel noise in the flagship measurement.

        A single ``integrate`` round ends with status 1 when the pool hits
        the memory wall (classifier failure) or the iteration budget.
        Each continuation round checkpoints the surviving regions and
        resumes with the cumulative ledger seeded (``ledger=``), which (a)
        restarts the two-level inflation on the saved pool -- fresh
        parents deflate the inflated errors, (b) gives the classifier a
        fresh error budget measured against the TRUE cumulative estimate,
        and (c) grants a fresh iteration budget.  This is the mechanism
        that carries deep-tolerance runs (8D at 1e-5 and below) past the
        single-round pool wall; the reference has no analogue (its 700-
        iteration exit just returns unconverged, Workspace.cuh:354-357).

        When the surviving pool is too large to split even twice inside
        ``max_pool_regions`` (split-starved -- a whole-pool resume re-hits
        the wall immediately; observed on the 8D flagship: 8.7M survivors
        vs the 16M cap gave zero new iterations), the continuation
        switches to a PARTITIONED mode (_partitioned_continuation): the
        survivors are sorted by refined error and sliced hottest-first
        into sub-pools small enough to refine freely; each slice runs a
        fresh adaptive integration at the SAME (epsrel, epsabs) -- the
        per-region relative criterion drains it -- and stalling slices
        are re-partitioned.  Integral additivity makes the recombination
        exact, and the global convergence test (banked error + stored
        error of the untouched queue vs max(epsrel*|estimate|, epsabs))
        stops the process at the earliest honest moment, so cold tail
        slices are usually never touched.  This carries tolerances the
        single-pool memory model cannot certify.

        Stops on convergence, ``max_rounds``, ``max_wall_s`` seconds of
        wall clock (threaded into every round and slice as a per-
        iteration deadline, so a single long slice cannot overshoot the
        budget by its own duration -- a bound for unattended runs), an
        empty pool, or when a round fails to shrink the total error
        below ``min_err_reduction`` times the previous round's
        (no-progress guard).

        ``state_path``: disk-resumable continuation (round 5).  When the
        run ends unconverged (status 1) with surviving regions, the
        banked ledger + remaining slice queue are written there
        (utils.checkpoint.ContinuationState, atomic replace); a later
        call with the same ``state_path`` (file exists) skips round 1
        and resumes the queue exactly -- integral additivity makes the
        recombination identical to an uninterrupted run.  On
        certification the file is removed.  This is what lets a
        multi-hour certificate (physics at 1e-6) accumulate across
        processes instead of restarting from scratch.
        """
        import contextlib
        import os as _os
        import time as _time
        deadline = (_time.monotonic() + max_wall_s
                    if max_wall_s is not None else None)

        if state_path is not None:
            from gpuintegration_tpu.utils.checkpoint import (
                ContinuationState, PaganiCheckpoint)
            if _os.path.exists(PaganiCheckpoint._norm(state_path)):
                state = ContinuationState.load(state_path)
                if not (state.epsrel == epsrel and state.epsabs == epsabs):
                    raise ValueError(
                        f"state at {state_path} was built for "
                        f"(epsrel={state.epsrel:g}, epsabs={state.epsabs:g})"
                        f", not ({epsrel:g}, {epsabs:g})")
                kw.pop("initial_regions", None)
                kw.pop("ledger", None)
                return self._partitioned_continuation(
                    integrand, epsrel, epsabs, vol, None, None,
                    max_rounds, deadline,
                    min_err_reduction=min_err_reduction,
                    stage_timer=stage_timer, state_path=state_path,
                    resume_state=state, **kw)

        def _stage(name):
            return (stage_timer.stage(name) if stage_timer is not None
                    else contextlib.nullcontext())

        with _stage("round1"):
            res = self.integrate(integrand, epsrel, epsabs, vol,
                                 deadline=deadline, **kw)
        # round 1 consumed any user initial_regions/ledger seed; later
        # rounds (and continuation slices) supply their own -- leaving the
        # user's in kw would TypeError on resume, and a leftover ledger=
        # would be re-banked once per slice
        kw.pop("initial_regions", None)
        kw.pop("ledger", None)
        rounds = 1
        while (res.status == 1 and rounds < max_rounds
               and res.nregions > res.nFinishedRegions
               and (deadline is None or _time.monotonic() < deadline)):
            if getattr(self, "final_pool", None) is None:
                break  # no resumable pool (vector/mesh paths without one)
            ckpt = self.make_checkpoint()
            if ckpt.lows.shape[0] == 0:
                break
            if self.mesh is not None:
                # continuation boundary: deal survivors hot/cold-evenly
                # across shards (see _rebalance_checkpoint_for_mesh)
                ckpt = self._rebalance_checkpoint_for_mesh(ckpt)
            # the checkpoint is host NumPy; drop the final pool's device
            # buffers (2 x cap x ndim f64 -- 2 GB at the 16M 8D wall) so
            # the resumed round's bucket doesn't stack on top of them
            self.final_pool = None
            self.final_pool_errors = None
            if 4 * ckpt.lows.shape[0] > self.max_pool_regions:
                # vector pools slice too (round 4): worst-component slice
                # budgeting, per-component banking and certificate -- see
                # _partitioned_continuation's unified-array docs
                return self._partitioned_continuation(
                    integrand, epsrel, epsabs, vol, ckpt, res,
                    max_rounds - rounds, deadline,
                    min_err_reduction=min_err_reduction,
                    stage_timer=stage_timer, state_path=state_path, **kw)

            def worst_err(r):
                # progress guard on the WORST component for vector runs
                return (float(np.max(r.errorests))
                        if getattr(r, "errorests", None) is not None
                        else r.errorest)

            prev_err = worst_err(res)
            with _stage(f"resume_round{rounds + 1}"):
                res = self.integrate(
                    integrand, epsrel, epsabs, vol,
                    initial_regions=(ckpt.lows, ckpt.lengths),
                    ledger=ckpt.ledger, deadline=deadline, **kw)
            rounds += 1
            if res.status == 1 and worst_err(res) > min_err_reduction * prev_err:
                break   # no meaningful progress; stop burning evals
        if (state_path is not None and res.status == 1
                and getattr(self, "final_pool", None) is not None):
            # the run ended unconverged in the whole-pool phase (deadline
            # / max_rounds before split starvation): persist the survivors
            # as a fresh slice queue so a later process resumes here
            from gpuintegration_tpu.utils.checkpoint import (
                ContinuationState)
            ckpt = self.make_checkpoint()
            if ckpt.lows.shape[0]:
                self.final_pool = None
                self.final_pool_errors = None
                slice_cap = max(self.max_pool_regions // 16,
                                2 * self.chunk_size)

                def _A(x):
                    return np.atleast_1d(np.asarray(x, np.float64))

                tot_est = _A(res.estimates if getattr(res, "estimates",
                             None) is not None else res.estimate)
                tot_err = _A(res.errorests if getattr(res, "errorests",
                             None) is not None else res.errorest)
                work = self._make_slices(
                    ckpt.lows, ckpt.lengths,
                    ckpt.region_estimates, ckpt.region_errorests,
                    tot_est - _A(ckpt.estimate),
                    tot_err - _A(ckpt.errorest), slice_cap, 0)
                ContinuationState.from_queue(
                    work, _A(ckpt.estimate), _A(ckpt.errorest),
                    ckpt.iters, ckpt.neval, ckpt.nregions, ckpt.nregions,
                    np.ndim(ckpt.estimate) == 1, epsrel, epsabs,
                ).save(state_path)
        return res

    @staticmethod
    def _make_slices(lows, lengths, reg_est, reg_err,
                     tot_est, tot_err, cap, depth):
        """Cut survivors into slices of <= cap regions, COLDEST FIRST so
        ``work.pop()`` takes the hottest.  With per-region arrays the
        survivors are sorted by refined error and every slice carries its
        exact stored (est, err) sums; without them (fused/mesh exits have
        no per-region stash) the pool order is kept and the inflight
        totals are apportioned by region count -- they still sum to the
        true totals, which is all the global accounting needs.

        Vector stashes are (n, ncomp): the sort key is the WORST
        component per region and slice sums are (ncomp,) arrays (the
        all-components certificate downstream needs every component's
        stored share)."""
        n = lows.shape[0]
        if n == 0:
            return []
        if reg_err is not None:
            err_key = (reg_err if reg_err.ndim == 1
                       else reg_err.max(axis=1))
            order = np.argsort(err_key)            # ascending: hot at end
            lows, lengths = lows[order], lengths[order]
            reg_est, reg_err = reg_est[order], reg_err[order]

            def _sum(a, i):
                s = a[i:i + cap].sum(axis=0)
                return float(s) if np.ndim(s) == 0 else s
            return [(lows[i:i + cap], lengths[i:i + cap],
                     _sum(reg_est, i), _sum(reg_err, i), depth, True)
                    for i in range(0, n, cap)]
        # apportioned (inexact) slices: totals are right but the per-slice
        # shares are NOT -- flagged False so the global certificate never
        # fires off them (uniform shares understate a hot slice once cold
        # ones are drained, which could certify prematurely)
        return [(lows[i:i + cap], lengths[i:i + cap],
                 tot_est * min(cap, n - i) / n,
                 tot_err * min(cap, n - i) / n, depth, False)
                for i in range(0, n, cap)]

    def _partitioned_continuation(
        self, integrand, epsrel, epsabs, vol, ckpt, last_res,
        rounds_left, deadline=None, min_err_reduction=0.99,
        stage_timer=None, state_path=None, resume_state=None, **kw,
    ) -> IntegrationResult:
        """Divide-and-conquer continuation for split-starved pools.

        The checkpointed survivors are sorted by their two-level refined
        error and sliced into sub-pools of at most ``max_pool_regions/16``
        regions (four doublings of headroom each).  Slices are processed
        HOTTEST FIRST; each runs a fresh adaptive integration at the same
        (epsrel, epsabs) -- per-region relative finishing
        (two_level.refine_error) drains it, no artificial per-slice
        budget.  A slice that ends at its own wall banks its finished
        ledger and re-queues its survivors (again error-sorted) as long
        as it reduced its stored error; otherwise its result is accepted
        as-is (no-progress guard, bounded recursion).

        The recombination is exact by integral additivity.  Before every
        slice the GLOBAL test runs on banked totals plus the stored
        error of the untouched queue, so the loop stops at the earliest
        certifiable moment -- cold tail slices are typically never
        evaluated.  The returned status is that honest global test.
        """
        import contextlib
        import os as _os
        import sys as _sys
        import time as _time
        _log = _os.environ.get("GPUINT_TPU_CONTINUATION_LOG")

        def _stage(name):
            return (stage_timer.stage(name) if stage_timer is not None
                    else contextlib.nullcontext())

        # Unified scalar/vector arithmetic: everything runs on (ncomp,)
        # f64 arrays with ncomp=1 for scalar integrands.  Vector slices
        # drive their tolerances off the WORST component (max relative
        # error) while banking and certifying EVERY component -- the
        # all-components semantics of the vector loop itself
        # (cubacpp integrand_traits.hh:81-93).

        def A(x):
            return np.atleast_1d(np.asarray(x, np.float64))

        def rest(r):
            return A(r.estimates if getattr(r, "estimates", None)
                     is not None else r.estimate)

        def rerr(r):
            return A(r.errorests if getattr(r, "errorests", None)
                     is not None else r.errorest)

        slice_cap = max(self.max_pool_regions // 16, 2 * self.chunk_size)
        max_depth = 12
        if resume_state is not None:
            # disk resume (integrate_to_convergence(state_path=...)): the
            # banked ledger and the error-sorted queue pick up exactly
            # where the previous process's budget ended
            vec = resume_state.vec
            fin_est = resume_state.fin_est.copy()
            fin_err = resume_state.fin_err.copy()
            iters, neval = resume_state.iters, resume_state.neval
            nregions = resume_state.nregions
            nfinished = resume_state.nfinished
            work = resume_state.to_queue()
        else:
            vec = np.ndim(ckpt.estimate) == 1
            fin_est = A(ckpt.estimate).copy()
            fin_err = A(ckpt.errorest).copy()
            iters, neval = ckpt.iters, ckpt.neval
            nregions = nfinished = ckpt.nregions
            work = self._make_slices(
                ckpt.lows, ckpt.lengths,
                ckpt.region_estimates, ckpt.region_errorests,
                rest(last_res) - fin_est,
                rerr(last_res) - fin_err, slice_cap, 0)
        zero = np.zeros_like(fin_est)

        def _qsum(col):
            return sum((A(w[col]) for w in work), zero.copy())

        def _err_key(w):
            return float(np.max(A(w[3])))

        max_runs = max(64 * rounds_left, 4 * len(work))
        runs = 0
        status = 1
        while True:
            q_est = _qsum(2)
            q_err = _qsum(3)
            budget = np.maximum(epsrel * np.abs(fin_est + q_est), epsabs)
            if all(w[5] for w in work) and np.all(
                    fin_err + q_err <= budget):
                status = 0               # certified: banked + EXACT queue
                break
            if not work or runs >= max_runs or (
                    deadline is not None and _time.monotonic() >= deadline):
                break                    # honest non-convergence
            # Dynamic slice targets.  A slice naturally exits once its
            # error meets the caller's tolerances RELATIVE TO ITS OWN
            # SIGNED ESTIMATE and banks whatever it achieved.  On
            # oscillatory integrands the slice estimates dwarf the global
            # integral (cancellation), so every slice is already
            # "converged" on its first sweep and banks its stored error
            # untouched -- the banked sum then overshoots the global
            # budget with no slice ever refining (the 8D f1_oscillatory
            # 1e-4 wall: 16 slices banked 4.29e-9 vs the 3.44e-9 budget,
            # bit-identical under any finish_epsrel_scale).  When the
            # PROJECTED natural exits cannot meet the global budget,
            # re-apportion the remaining budget over the queue by
            # stored-error share and tighten this slice's tolerances to
            # its share; the volume-apportioned retirement term gives the
            # zero-crossing regions (which can never pass a relative
            # test) a sound way to finish inside the share.
            projected = fin_err + sum(
                (np.minimum(A(w[3]),
                            np.maximum(epsrel * np.abs(A(w[2])), epsabs))
                 for w in work), zero.copy())
            # Hopeless-banked-budget exit.  The banked error is immutable
            # but the BUDGET is not: refining slices moves the queue
            # estimate and with it epsrel*|fin_est + q_est|.  The stored
            # queue error bounds that motion, so the run is provably
            # uncertifiable only once the bank exceeds the best budget any
            # refinement could reach -- then stop without evaluating.
            best_budget = np.maximum(
                epsrel * (np.abs(fin_est + q_est) + q_err), epsabs)
            if np.any(fin_err > best_budget):
                break
            lows_i, lengths_i, s_est_w, s_err_w, depth, exact = work.pop()
            s_est_i, s_err_i = A(s_est_w), A(s_err_w)
            n_in = lows_i.shape[0]
            # worst component drives this slice's tolerances (scalar
            # integrate() targets); the certificate above stays
            # per-component
            wc = int(np.argmax(
                (fin_err + q_err)
                / np.maximum(np.abs(fin_est + q_est), 1e-300)))
            needed = budget[wc] - fin_err[wc]
            eps_rel_i, eps_abs_i, kw_i = epsrel, epsabs, kw
            if np.any(projected > budget) and needed > 0 \
                    and q_err[wc] > 0 and s_err_i[wc] > 0:
                share = 0.8 * (needed / q_err[wc]) * s_err_i[wc]
                vol_i = float(np.prod(lengths_i, axis=1).sum())
                # an apportioned (inexact) slice's stored estimate is a
                # uniform share, not its own: a relative tolerance derived
                # from it can overshoot the share arbitrarily, so inexact
                # slices get a purely absolute target (share + volume term)
                eps_rel_i = (
                    min(epsrel, share / max(abs(s_est_i[wc]), 1e-300))
                    if exact else 0.0)
                eps_abs_i = share
                kw_i = dict(kw)
                if vol_i > 0.0:
                    kw_i["finish_abs_per_vol"] = 0.5 * share / vol_i
            with _stage("slices"):
                r_i = self.integrate(
                    integrand, eps_rel_i, eps_abs_i, vol,
                    initial_regions=(lows_i, lengths_i),
                    deadline=deadline, **kw_i)
            runs += 1
            iters += r_i.iters
            neval += r_i.neval
            requeued = 0
            if r_i.status == 1 and depth < max_depth:
                ck_i = self.make_checkpoint()
                self.final_pool = None
                self.final_pool_errors = None
                surv = ck_i.lows.shape[0]
                new_err = A(ck_i.errorest) + (
                    A(ck_i.region_errorests.sum(axis=0))
                    if ck_i.region_errorests is not None
                    else rerr(r_i) - A(ck_i.errorest))
                if surv > 0 and np.max(new_err) < \
                        min_err_reduction * np.max(s_err_i):
                    # progress: bank the finished ledger, re-queue the
                    # survivors error-sorted (deeper level)
                    fin_est += A(ck_i.estimate)
                    fin_err += A(ck_i.errorest)
                    # ck_i.nregions = regions retired BEFORE the final
                    # sweep -- the view consistent with requeueing the
                    # whole final pool (r_i.nregions counts that pool
                    # post-split AND its last sweep's retirees, which the
                    # requeued slices will count again)
                    nregions += ck_i.nregions
                    nfinished += ck_i.nregions
                    sub = self._make_slices(
                        ck_i.lows, ck_i.lengths,
                        ck_i.region_estimates, ck_i.region_errorests,
                        rest(r_i) - A(ck_i.estimate),
                        rerr(r_i) - A(ck_i.errorest),
                        slice_cap, depth + 1)
                    work.extend(sub)
                    work.sort(key=_err_key)         # keep hottest at end
                    requeued = len(sub)
            if not requeued:
                fin_est += rest(r_i)
                fin_err += rerr(r_i)
                nregions += r_i.nregions
                nfinished += r_i.nFinishedRegions
            if _log:
                q_now = _qsum(3)
                print(f"[continuation] slice {runs}/{max_runs}: "
                      f"n_in={n_in} depth={depth} status={r_i.status} "
                      f"est={r_i.estimate:.6e} err={r_i.errorest:.3e} "
                      f"stored={s_err_i[wc]:.3e} requeued={requeued} "
                      f"queued={len(work)} banked_err={fin_err[wc]:.3e} "
                      f"total_err={float((fin_err + q_now)[wc]):.3e} "
                      f"budget={float(np.maximum(epsrel * np.abs(fin_est + _qsum(2)), epsabs)[wc]):.3e}",
                      file=_sys.stderr, flush=True)
        if state_path is not None:
            from gpuintegration_tpu.utils.checkpoint import (
                ContinuationState, PaganiCheckpoint)
            _p = PaganiCheckpoint._norm(state_path)
            if status == 0 or not work:
                # certified (or fully drained): the state is spent
                if _os.path.exists(_p):
                    _os.remove(_p)
            else:
                ContinuationState.from_queue(
                    work, fin_est, fin_err, iters, neval, nregions,
                    nfinished, vec, epsrel, epsabs).save(state_path)
        # fold the untouched queue's stored sums so the estimate is the
        # complete integral either way
        total_est = fin_est + _qsum(2)
        total_err = fin_err + _qsum(3)
        nregions += sum(w[0].shape[0] for w in work)
        res = IntegrationResult(
            estimate=float(total_est[0]), errorest=float(total_err[0]),
            status=status, iters=iters, neval=neval, nregions=nregions,
            nFinishedRegions=nfinished)
        if vec:
            res.estimates = total_est
            res.errorests = total_err
        return res

    def make_checkpoint(self):
        """Package the last run's live pool + ledger into a resumable
        checkpoint (utils.checkpoint.PaganiCheckpoint).

        The stored ledger EXCLUDES the final pool's own sweep (every exit
        path of integrate() folds that sweep into ``result``, and resuming
        re-evaluates the same pool -- storing ``result.estimate`` would
        double-count it).  Resume with
        ``integrate(..., initial_regions=(ckpt.lows, ckpt.lengths))`` and
        add ``ckpt.estimate``/``ckpt.errorest`` to the resumed result for
        the complete integral."""
        from gpuintegration_tpu.utils.checkpoint import PaganiCheckpoint
        if getattr(self, "final_pool", None) is None:
            raise ValueError(
                "no resumable pool: run integrate() first")
        est, err, nregions, iters, neval = self._ledger_excl_pool
        if isinstance(self.final_pool[0], str):  # ("mesh", ...) layout
            # per-shard blocked layout: shard k's real regions fill the
            # first ns[k]/2 slots of each static half of its cap_s bucket
            _, lows, lengths, ns, cap_s, blocked = self.final_pool
            lo_np, ln_np = np.asarray(lows), np.asarray(lengths)
            keep = []
            for k, nk in enumerate(np.asarray(ns).tolist()):
                base = k * cap_s
                if blocked:
                    half = cap_s // 2
                    keep.append(base + np.arange(nk // 2))
                    keep.append(base + half + np.arange(nk // 2))
                else:
                    keep.append(base + np.arange(nk))
            keep = np.concatenate(keep) if keep else np.zeros(0, np.int64)
            reg_est = reg_err = None
            if getattr(self, "final_pool_errors", None) is not None:
                e_d, r_d = self.final_pool_errors
                e_np, r_np = np.asarray(e_d), np.asarray(r_d)
                if e_np.ndim == 2:      # vector: (ncomp, D*cap_s) ->
                    reg_est = e_np[:, keep].T   # (n, ncomp) on host
                    reg_err = r_np[:, keep].T
                else:
                    reg_est, reg_err = e_np[keep], r_np[keep]
            return PaganiCheckpoint(
                lows=lo_np[:, keep].T, lengths=ln_np[:, keep].T,
                estimate=est, errorest=err, nregions=nregions, iters=iters,
                neval=neval, region_estimates=reg_est,
                region_errorests=reg_err)
        lows, lengths, n, blocked = self.final_pool
        lo_np, ln_np = np.asarray(lows), np.asarray(lengths)
        if blocked:
            # real regions fill the first n/2 slots of each static half
            half = lo_np.shape[1] // 2
            keep = np.concatenate(
                [np.arange(n // 2), half + np.arange(n // 2)])
            lo_np, ln_np = lo_np[:, keep], ln_np[:, keep]
        else:
            keep = np.arange(n)
            lo_np, ln_np = lo_np[:, :n], ln_np[:, :n]
        reg_est = reg_err = None
        if getattr(self, "final_pool_errors", None) is not None:
            # the saved pool's own sweep: per-region estimates + refined
            # errors in pool order (same keep indexing as lows/lengths).
            # Continuation slicing sorts on these.  Vector sweeps store
            # (n, ncomp) -- component-minor on HOST only (the device pool
            # stays dims/component-major per the lane-padding invariant).
            e_d, r_d = self.final_pool_errors
            e_np, r_np = np.asarray(e_d), np.asarray(r_d)
            if e_np.ndim == 2:          # vector: (ncomp, cap) -> (n, ncomp)
                reg_est, reg_err = e_np[:, keep].T, r_np[:, keep].T
            else:
                reg_est, reg_err = e_np[keep], r_np[keep]
        return PaganiCheckpoint(
            lows=lo_np.T, lengths=ln_np.T,
            estimate=est, errorest=err, nregions=nregions, iters=iters,
            neval=neval, region_estimates=reg_est, region_errorests=reg_err)
