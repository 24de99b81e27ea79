"""Suave: subregion-adaptive importance-sampling Monte Carlo.

Re-expression of the algorithm behind cubacpp's Suave binding
(reference: cubacpp/cubacpp/suave.hh -> CUBA's Suave; parameter surface
nnew/nmin/flatness).  Suave's defining traits, per the CUBA paper:

  1. VEGAS-style importance sampling with a grid PER SUBREGION that
     children inherit from their parent,
  2. sample REUSE: information from earlier samples keeps contributing
     to a region's estimate after subdivision,
  3. the split dimension minimizes the FLUCTUATION of the samples in the
     two prospective halves (flatness = the p-norm exponent emphasizing
     spiky components).

TPU-first redesign (NOT a port of CUBA's serial one-region-at-a-time
loop):

* the region pool is batched: every cycle samples ALL regions at once
  (nmin passes x nnew samples per region fused in one jit dispatch,
  reusing the per-region grid machinery of pagani.vegas_assisted), and
  every over-budget region splits in the same cycle -- the PAGANI-style
  batch adaptivity that keeps the MXU busy, vs CUBA's pick-worst-region
  scalar loop;
* sample reuse is carried as SUFFICIENT STATISTICS instead of stored
  points: each pass accumulates inverse-variance-weighted (estimate,
  weight) pairs per region, and a split seeds each child with the
  parent's accumulated information (estimates apportioned by the
  SIGNED measured per-half integrand mass with an even-split fallback
  under heavy cancellation, weight split evenly) -- old samples
  keep influencing child estimates without CUBA's O(samples) region
  memory;
* the fluctuation measure is the normalized p-norm of |w f| over each
  prospective half, computed from the current cycle's samples with
  p = min(flatness, 16) (ratios-to-max form, numerically safe where
  CUBA's raw p-norm with its default flatness=50 would overflow);
* per-region grids refine on device in f32 (vegas_assisted._refine_grids,
  scatter/gather/sort-free); children inherit the parent grid with the
  split dimension reset to uniform (re-refined within one cycle).

Pool surgery (split/bookkeeping) runs on host NumPy: Suave pools are
small (CUBA caps out around 10^3 subregions; ``max_regions`` here), so
the hot path is the batched sampling jit, not the surgery.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.pagani.vegas_assisted import _sample_regions_pass
from gpuintegration_tpu.types import IntegrationResult, Volume
from gpuintegration_tpu.utils.stats import chi2_prob

_HIGH = jax.lax.Precision.HIGHEST


@functools.partial(
    jax.jit,
    static_argnames=("f", "ndim", "passes", "nnew", "nbins", "dtype_name",
                     "p", "ncomp"))
def _suave_cycle(
    f,
    ndim: int,
    passes: int,          # nmin sampling passes fused into this dispatch
    nnew: int,            # samples per region per pass
    nbins: int,
    dtype_name: str,
    p: float,             # fluctuation norm exponent (capped flatness)
    key,
    lows, lengths,        # (ndim, cap) dims-major unit-space regions
    grids,                # (cap, ndim, nbins+1) f32 per-region grids
    n,                    # traced: real region count (first n slots)
    global_lo, global_range,
    ncomp: int = 1,
):
    """One Suave cycle over the whole (padded) pool.

    Returns (grids', I (ncomp, cap), var (ncomp, cap), flu (cap, ndim),
    mass_lo (ncomp, cap, ndim), mass (ncomp, cap), mass_abs
    (ncomp, cap)): the cycle's per-region importance-sampled estimate
    and variance-of-mean per component, the per-dimension fluctuation
    of the two prospective halves (split criterion: argmin; vector runs
    measure it on the worst per-sample |wf| over components, so a
    component spiky anywhere drives the split), and the SIGNED
    lower-half / total sampled integrand mass plus its absolute total
    per component (child seeding -- signed so sign-changing integrands
    seed with the right signs; the |.| total gates a cancellation
    fallback).  Padding slots produce finite junk masked by ``n`` in
    the host driver.  All components share one point set and one
    per-region grid (adapted on component 0 -- CUBA semantics).
    """
    dtype = jnp.dtype(dtype_name)
    cap = lows.shape[1]
    vol = jnp.prod(lengths, axis=0).astype(dtype)        # (cap,)

    def one_pass(i, carry):
        (grids, s_wf, s_wf2, s_cnt, s_flu_lo, s_flu_hi, s_mass_lo,
         s_mass_abs) = carry
        u, wf, grids = _sample_regions_pass(
            f, jax.random.fold_in(key, i), grids, lows, lengths,
            global_lo, global_range, nbins, nnew, dtype, ncomp=ncomp)
        if ncomp == 1:
            wf = wf[None]                                # (1, cap, nnew)
        awf_c = jnp.abs(wf)                              # (ncomp, cap, nnew)
        awf = jnp.max(awf_c, axis=0)                     # worst component

        s_wf = s_wf + jnp.sum(wf, axis=2)
        s_wf2 = s_wf2 + jnp.sum(wf * wf, axis=2)
        s_cnt = s_cnt + nnew

        # fluctuation stats per (region, dim, half): normalized p-norm of
        # |wf| over each prospective half (the flatness criterion); and
        # the SIGNED lower-half mass for child seeding
        fmax = jnp.maximum(jnp.max(awf, axis=1, keepdims=True), 1e-300)
        ratio_p = (awf / fmax) ** p                      # (cap, nnew)
        for d in range(ndim):
            in_lo = (u[..., d] < 0.5).astype(dtype)
            s_flu_lo = s_flu_lo.at[:, d].add(
                fmax[:, 0] * jnp.sum(ratio_p * in_lo, axis=1) ** (1.0 / p))
            s_flu_hi = s_flu_hi.at[:, d].add(
                fmax[:, 0] * jnp.sum(ratio_p * (1.0 - in_lo),
                                     axis=1) ** (1.0 / p))
            s_mass_lo = s_mass_lo.at[:, :, d].add(
                jnp.sum(wf * in_lo[None], axis=2))
        s_mass_abs = s_mass_abs + jnp.sum(awf_c, axis=2)
        return (grids, s_wf, s_wf2, s_cnt, s_flu_lo, s_flu_hi, s_mass_lo,
                s_mass_abs)

    z = jnp.zeros((ncomp, cap), dtype)
    zd = jnp.zeros((cap, ndim), dtype)
    zcd = jnp.zeros((ncomp, cap, ndim), dtype)
    (grids, s_wf, s_wf2, s_cnt, flu_lo, flu_hi, mass_lo, mass_abs) = \
        jax.lax.fori_loop(0, passes, one_pass,
                          (grids, z, z, 0, zd, zd, zcd, z))

    cnt = jnp.asarray(s_cnt, dtype)
    mean = s_wf / cnt
    var_mean = jnp.maximum(s_wf2 / cnt - mean * mean, 0.0) / jnp.maximum(
        cnt - 1.0, 1.0)
    I = vol[None] * mean
    var = (vol * vol)[None] * var_mean
    flu = flu_lo + flu_hi                                # (cap, ndim)
    return grids, I, var, flu, mass_lo, s_wf, mass_abs


def suave(
    integrand,
    epsrel: float = 1e-3,
    epsabs: float = 1e-12,
    vol: Volume | None = None,
    *,
    ndim: int | None = None,
    nnew: int = 2048,
    nmin: int = 2,
    flatness: float = 50.0,
    nbins: int = 64,
    max_regions: int = 1024,
    max_cycles: int = 64,
    seed: int = 0,
    dtype=jnp.float64,
) -> IntegrationResult:
    """Suave driver (cubacpp/suave.hh parameter surface).

    ``nnew``: fresh samples per region per pass; ``nmin``: passes per
    cycle (the reuse granularity -- every region keeps at least
    nmin*nnew samples' worth of information between subdivisions);
    ``flatness``: fluctuation-norm exponent (internally capped at 16 in
    ratios-to-max form; see module docstring).

    Each cycle: batch-sample every region, fold the cycle's estimates
    into the per-region inverse-variance accumulators (sample reuse),
    then split every region whose variance exceeds its fair share of the
    error budget, seeding children from the parent's accumulated
    information.  Stops on accuracy, ``max_regions`` exhaustion with no
    further progress, or ``max_cycles``.

    Vector-valued integrands (f -> (..., ncomp)) run end-to-end
    (round 4; cubacpp's Suave surface deduces them,
    integrand_traits.hh:81-93): every component shares one point set,
    one region tree and one per-region grid (adapted on component 0);
    accumulators, splits (any component over its fair share) and the
    all-components convergence test are per component; the result
    carries ``estimates``/``errorests``/``probs``.
    """
    from gpuintegration_tpu.integrand import deduce_ncomp
    f, ndim = make_integrand(integrand, ndim)
    if vol is None:
        vol = Volume(ndim=ndim)
    dtype = jnp.dtype(dtype)
    ncomp = deduce_ncomp(f, ndim, dtype.name)
    p = float(min(flatness, 16.0))
    gl = jnp.asarray(vol.lows, dtype)
    gr = jnp.asarray(vol.highs - vol.lows, dtype)

    # host-side pool (Suave pools are small; surgery is numpy).
    # Padding slots are FINITE unit boxes, not zero-length ones: a
    # zero-length box evaluates f exactly at the domain's lower corner
    # every pass, which explodes on boundary-singular integrands
    cap = 64
    lows = np.zeros((ndim, cap))
    lengths = np.ones((ndim, cap))           # slot 0 = root region
    n = 1
    grids = np.broadcast_to(
        np.linspace(0.0, 1.0, nbins + 1, dtype=np.float32),
        (cap, ndim, nbins + 1)).copy()
    wi = np.zeros((ncomp, cap))              # sum of wgt * estimate
    w = np.zeros((ncomp, cap))               # sum of wgt (inverse variance)

    res = IntegrationResult(status=1)
    base_key = jax.random.PRNGKey(seed)
    # inter-cycle consistency ledger: each cycle's fresh-sample total is
    # an independent unbiased estimate of the full integral, so the same
    # weighted chi-squared the VEGAS driver keeps across iterations
    # applies across cycles (feeds result.chi_sq / result.prob — the
    # cubacpp/CUBA ``prob`` surface); per component for vector runs.
    c_si = np.zeros(ncomp)
    c_swgt = np.zeros(ncomp)
    c_schi = np.zeros(ncomp)

    for cycle in range(max_cycles):
        key = jax.random.fold_in(base_key, cycle)
        (grids_d, I_d, var_d, flu_d, mass_lo_d, mass_d,
         mass_abs_d) = _suave_cycle(
            f, ndim, nmin, nnew, nbins, dtype.name, p, key,
            jnp.asarray(lows, dtype), jnp.asarray(lengths, dtype),
            jnp.asarray(grids), jnp.asarray(n, jnp.int32), gl, gr,
            ncomp=ncomp)
        grids = np.array(grids_d)    # writable copy (surgery below)
        I = np.asarray(I_d)[:, :n]               # (ncomp, n)
        var = np.maximum(np.asarray(var_d)[:, :n], 1e-300)
        flu = np.asarray(flu_d)[:n]
        mass_lo = np.asarray(mass_lo_d)[:, :n]   # SIGNED, (ncomp, n, ndim)
        mass = np.asarray(mass_d)[:, :n]         # SIGNED
        mass_abs = np.asarray(mass_abs_d)[:, :n]
        res.neval += nmin * nnew * cap           # every slot is evaluated
        res.iters += 1

        # fold the cycle into the per-region accumulators (sample reuse)
        wgt = 1.0 / var
        wi[:, :n] += wgt * I
        w[:, :n] += wgt
        t_c = np.sum(I, axis=1)              # this cycle's fresh estimate
        w_c = 1.0 / np.maximum(np.sum(var, axis=1), 1e-300)
        c_si += w_c * t_c
        c_swgt += w_c
        c_schi += w_c * t_c * t_c

        est_r = wi[:, :n] / w[:, :n]
        var_r = 1.0 / w[:, :n]
        total = np.sum(est_r, axis=1)        # (ncomp,)
        err = np.sqrt(np.sum(var_r, axis=1))
        tol = np.maximum(epsrel * np.abs(total), epsabs)
        if np.all(err <= tol):
            res.status = 0
            break

        # split every region where ANY component's variance exceeds
        # that component's fair share of its budget (batch adaptivity);
        # capacity-limited, worst share first
        share = var_r / (tol * tol)[:, None] * max(n, 1)  # (ncomp, n)
        worst = share.max(axis=0)
        over = np.flatnonzero(worst > 1.0)
        if over.size == 0:
            over = np.argsort(worst)[-max(n // 4, 1):]
        room = max_regions - n
        if room <= 0:
            break                            # pool exhausted
        if over.size > room:
            over = over[np.argsort(worst[over])[-room:]]

        if n + over.size > cap:              # grow the padded pool
            new_cap = 1 << int(n + over.size - 1).bit_length()
            new_cap = min(max(new_cap, cap), max_regions)
            pad = new_cap - cap
            if pad > 0:
                lows = np.pad(lows, ((0, 0), (0, pad)))
                lengths = np.pad(lengths, ((0, 0), (0, pad)))
                lengths[:, cap:] = 1.0       # finite padding boxes
                grids = np.pad(grids, ((0, pad), (0, 0), (0, 0)),
                               mode="edge")
                wi = np.pad(wi, ((0, 0), (0, pad)))
                w = np.pad(w, ((0, 0), (0, pad)))
                cap = new_cap

        for r in over:
            d = int(np.argmin(flu[r]))       # fluctuation-minimizing dim
            half = lengths[d, r] * 0.5
            c = n                            # new slot = upper child
            lows[:, c] = lows[:, r]
            lengths[:, c] = lengths[:, r]
            lows[d, c] = lows[d, r] + half
            lengths[d, c] = half
            lengths[d, r] = half             # r becomes the lower child
            grids[c] = grids[r]
            grids[r, d] = np.linspace(0.0, 1.0, nbins + 1)
            grids[c, d] = np.linspace(0.0, 1.0, nbins + 1)
            # seed children from the parent's accumulated information,
            # PER COMPONENT: estimates apportioned by the SIGNED
            # measured half mass (|.|-mass apportionment seeds the
            # wrong sign when the integrand changes sign inside the
            # region), weight halved.  Under heavy cancellation the
            # signed total is an unstable denominator -- fall back to
            # an even split
            for k in range(ncomp):
                e_par, w_par = wi[k, r] / w[k, r], w[k, r]
                if abs(mass[k, r]) > 0.1 * mass_abs[k, r]:
                    fl = float(np.clip(mass_lo[k, r, d] / mass[k, r],
                                       -1.0, 2.0))
                else:
                    fl = 0.5
                w[k, r] = w[k, c] = w_par * 0.5
                wi[k, r] = w[k, r] * e_par * fl
                wi[k, c] = w[k, c] * e_par * (1.0 - fl)
            n += 1

    est_r = wi[:, :n] / np.maximum(w[:, :n], 1e-300)
    est_c = np.sum(est_r, axis=1)
    err_c = np.sqrt(np.sum(1.0 / np.maximum(w[:, :n], 1e-300), axis=1))
    res.estimate = float(est_c[0])
    res.errorest = float(err_c[0])
    res.nregions = n
    if res.iters >= 2 and np.all(c_swgt > 0.0):
        chi2_total = np.maximum(c_schi - c_si * c_si / c_swgt, 0.0)
        chi2a = chi2_total / (res.iters - 0.9999)
        probs = np.array([chi2_prob(float(c), res.iters - 1)
                          for c in chi2_total])
        res.chi_sq = float(chi2a[0]) if ncomp == 1 else float(chi2a.max())
        res.prob = float(probs[0]) if ncomp == 1 else float(probs.max())
        if ncomp > 1:
            res.probs = probs
    if ncomp > 1:
        res.estimates = est_c
        res.errorests = err_c
    return res
