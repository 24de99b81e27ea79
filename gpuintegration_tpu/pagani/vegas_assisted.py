"""VEGAS-assisted region sampling (the PAGANI+VEGAS hybrid).

Re-expression of the reference's experimental hybrid kernel
(reference: cuda/pagani/quad/GPUquad/Sample.cuh:292-729
Vegas_assisted_SampleRegionBlock / Vegas_assisted_computePermutation;
exposed via VEGAS_ASSISTED_INTEGRATE_GPU_PHASE1, Phases.cuh:479-518;
demo cuda/pagani/demos/hybrid.cu): after the cubature rule picks the
bisection dimension, each region's estimate/error is *overwritten* by an
in-region mini-VEGAS Monte Carlo result -- a per-region importance grid
(100 bins/dim in shared memory there; a (R, ndim, nbins+1) array here)
adapted over a few passes.

TPU design notes: the per-region grids and their refinement run on device
in f32 (grid coordinates steer sampling only -- estimates accumulate in
the workspace dtype).  There are NO dynamic gathers, scatters, sorts or
searchsorted on region-sized arrays anywhere (the CLAUDE.md invariant;
they serialize or blow up compile time on TPU): bin-edge lookups and the
per-(region, dim) histogram are fused one-hot contractions (the
vegas._onehot_hist pattern), and the per-region grid rebin replaces
searchsorted with a compare-count and its gathers with one one-hot
matmul over stacked operands.  The reference's shared-memory atomics
(Sample.cuh:438-440) are likewise gone.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HIGH = jax.lax.Precision.HIGHEST


def _refine_grids(grids: jax.Array, hist: jax.Array) -> jax.Array:
    """Batched per-region grid refinement: 3-bin smoothing + log-damped
    rebin (the device-side rebin of Sample.cuh:299-326, 483-523),
    vectorised over (R, ndim) in f32, scatter/gather/sort-free."""
    nb = hist.shape[-1]
    # Inputs are per-region max-normalized f^2 sums in [0, spp]
    # (_sample_regions_pass divides |wf| by its per-region max before
    # squaring -- the scale-invariant analogue of vegas._HIST_CAP's
    # clamp, exact for these self-contained per-pass histograms), so
    # the 3-bin smooth and the dt/dts reductions stay finite in f32 at
    # any integrand magnitude (keep the guards in sync -- CLAUDE.md).
    left = jnp.concatenate([hist[..., :1], hist[..., :-1]], axis=-1)
    right = jnp.concatenate([hist[..., 1:], hist[..., -1:]], axis=-1)
    sm = (left + hist + right) / 3.0
    sm = sm.at[..., 0].set((hist[..., 0] + hist[..., 1]) / 2.0)
    sm = sm.at[..., -1].set((hist[..., -2] + hist[..., -1]) / 2.0)
    dt = jnp.sum(sm, axis=-1, keepdims=True)   # raw: gates keep-edges
    # NR's TINY floor (same fix as grid.smooth_and_refine): zero-mass
    # bins keep a small rebin weight or a narrow early peak collapses
    # every edge into its own bins -- the device path must match the
    # host refiner's behavior on the same histogram
    sm = jnp.maximum(sm, 1e-30)
    dts = jnp.sum(sm, axis=-1, keepdims=True)
    frac = sm / dts
    safe = jnp.clip(frac, 1e-30, 1.0)
    r = ((1.0 - frac) / (-jnp.log(safe))) ** 1.5

    cum = jnp.cumsum(r, axis=-1)                       # (R, ndim, nb)
    total = cum[..., -1:]
    targets = (jnp.arange(1, nb, dtype=grids.dtype)
               * (total / nb))                         # (R, ndim, nb-1)

    # searchsorted(left) == count of cum entries < target; the compare
    # fuses into the reduction (no (.., nb-1, nb) array resident)
    k = jnp.sum(
        (cum[..., None, :] < targets[..., :, None]).astype(jnp.int32),
        axis=-1)                                       # (R, ndim, nb-1)
    k = jnp.clip(k, 0, nb - 1)

    # one one-hot contraction gathers all four per-k operands at once:
    # stack [cum, r, grid[k], grid[k+1]] -> (R, ndim, nb, 4)
    vals = jnp.stack(
        [cum, r, grids[..., :nb], grids[..., 1:nb + 1]], axis=-1)
    ohk = (k[..., None]
           == jnp.arange(nb, dtype=jnp.int32)).astype(grids.dtype)
    picked = jnp.einsum('rdjb,rdbe->rdje', ohk, vals,
                        precision=_HIGH)               # (R, ndim, nb-1, 4)
    cum_k, r_k, xo, xn = (picked[..., 0], picked[..., 1],
                          picked[..., 2], picked[..., 3])
    dr = cum_k - targets
    rk = jnp.where(r_k > 0, r_k, 1.0)
    inner = xn - (xn - xo) * dr / rk                   # (R, ndim, nb-1)
    refined = jnp.concatenate(
        [jnp.zeros(inner.shape[:-1] + (1,), grids.dtype), inner,
         jnp.ones(inner.shape[:-1] + (1,), grids.dtype)], axis=-1)
    return jnp.where(dt > 0, refined, grids)



def _sample_regions_pass(f, pk, grids, lows, lengths, global_lo,
                         global_range, nbins: int, spp: int, dtype,
                         ncomp: int = 1):
    """One importance-sampled pass over EVERY region (traced helper
    shared by the vegas-assisted hybrid and Suave -- keeping the two
    bit-aligned): draw (bin, in-bin position) pairs, fetch bin edges with
    the gather-free one-hot batched matmul, evaluate the integrand, and
    refine each region's grid on this pass's f^2 histogram.

    Returns (u (R, spp, ndim) f32 unit-region coordinates, wf (R, spp)
    importance-weighted integrand values, grids' refined).  ``ncomp`` >
    1: f maps to (..., ncomp), wf comes back component-major
    (ncomp, R, spp) and the per-region grids adapt on component 0
    (CUBA's multi-component semantics, like mcubes.vegas)."""
    f32 = jnp.float32
    ndim, R = lows.shape
    jac = jnp.prod(global_range).astype(dtype)
    bins_ax = jnp.arange(nbins, dtype=jnp.int32)
    u_bin = jax.random.uniform(pk, (R, spp, ndim), f32)
    u_pos = jax.random.uniform(jax.random.fold_in(pk, 1),
                               (R, spp, ndim), f32)
    bins = jnp.clip((u_bin * nbins).astype(jnp.int32), 0, nbins - 1)

    # Bin-edge lookup per dim as a fused one-hot batched matmul against
    # the stacked (left-edge, width) table -- no gathers.
    u_planes, wprod = [], None
    for d in range(ndim):
        tbl = jnp.stack([grids[:, d, :nbins],
                         grids[:, d, 1:] - grids[:, d, :nbins]],
                        axis=-1)                   # (R, nb, 2)
        oh = (bins[..., d][..., None] == bins_ax).astype(f32)
        e = jnp.einsum('rsb,rbe->rse', oh, tbl,
                       precision=_HIGH)            # (R, spp, 2)
        lo_d, wid_d = e[..., 0], e[..., 1]
        u_planes.append(lo_d + u_pos[..., d] * wid_d)
        w_d = (wid_d * nbins).astype(dtype)
        wprod = w_d if wprod is None else wprod * w_d
    u = jnp.stack(u_planes, axis=-1)               # (R, spp, ndim)

    x = (global_lo
         + (lows.T[:, None, :] + u.astype(dtype) * lengths.T[:, None, :])
         * global_range)
    fx = f(x).astype(dtype) * jac                   # (R, spp[, ncomp])
    if ncomp == 1:
        wf = wprod * fx
        hist_wf = wf
    else:
        # component-major (a component-minor buffer lane-pads ncomp ->
        # 128 on TPU, the pool-layout invariant)
        wf = jnp.moveaxis(fx, -1, 0) * wprod[None]  # (ncomp, R, spp)
        hist_wf = wf[0]

    # per-(region, dim) f^2 histogram, scatter-free: one fused one-hot
    # contraction per dim (vegas._onehot_hist pattern; the previous
    # segment_sum version also overflowed its int32 segment ids at
    # R*ndim*nbins > 2^31)
    # RANGE CONTRACT (vegas._HIST_CAP note): raw f^2 of a huge-magnitude
    # integrand (f2-10D scale, |f|~1e22) casts to f32 inf, and inf * a
    # one-hot ZERO is NaN -- poisoning every bin of the dim.  The global
    # VEGAS histogram clamps (it must accumulate consistently across
    # chunks), but these per-region histograms are self-contained per
    # pass AND the rebin is scale-invariant (frac = sm/dts), so the
    # exact fix is normalization: divide |wf| by its per-region max
    # BEFORE squaring.  Samples land in [0, 1] -- no overflow, no
    # saturation, adaptation stays exact at any magnitude (a raw clamp
    # would flatten every bin of a huge integrand to the cap, degrading
    # its grids to uniform -- measured as a pool explosion on the 1e22
    # Gaussian).  The einsum's spp-sample sums are then <= spp.
    absf = jnp.abs(hist_wf)                         # (R, spp)
    scale = jnp.max(absf, axis=1, keepdims=True)
    f2n = (absf / jnp.maximum(scale, 1e-300)) if dtype == jnp.float64 \
        else (absf / jnp.maximum(scale, 1e-30))
    f2 = (f2n * f2n).astype(f32)                    # in [0, 1]
    hist = jnp.stack(
        [jnp.einsum('rs,rsb->rb', f2,
                    (bins[..., d][..., None] == bins_ax).astype(f32),
                    precision=_HIGH)
         for d in range(ndim)], axis=1)             # (R, ndim, nb)
    return u, wf, _refine_grids(grids, hist)


@functools.partial(
    jax.jit,
    static_argnames=("f", "ndim", "passes", "spp", "nbins", "dtype_name"))
def vegas_assisted_estimates(
    f,
    ndim: int,
    passes: int,
    spp: int,
    nbins: int,
    dtype_name: str,
    key,
    lows, lengths,          # (ndim, R) unit-space regions (dims-major)
    global_lo, global_range,
):
    """Per-region adaptive-importance MC estimates.

    Returns (estimate (R,), errorest (R,)) to overwrite the rule results
    (the reference overwrites r->avg/err, Sample.cuh:726-727).  The
    estimator is the standard importance-weighted mean with its standard
    error (statistically equivalent to the reference's fb/f2b bookkeeping,
    vegasT-style, without its 64-thread block constant folded in).
    """
    dtype = jnp.dtype(dtype_name)
    f32 = jnp.float32
    R = lows.shape[1]
    vol = jnp.prod(lengths, axis=0).astype(dtype)      # unit region volume

    grids0 = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, nbins + 1, dtype=f32),
        (R, ndim, nbins + 1))

    def one_pass(p, carry):
        grids, sum_wf, sum_wf2, count = carry
        _, wf, grids = _sample_regions_pass(
            f, jax.random.fold_in(key, p), grids, lows, lengths,
            global_lo, global_range, nbins, spp, dtype)
        return (grids, sum_wf + jnp.sum(wf, axis=1),
                sum_wf2 + jnp.sum(wf * wf, axis=1), count + spp)

    z = jnp.zeros((R,), dtype)
    grids, sum_wf, sum_wf2, count = jax.lax.fori_loop(
        0, passes, one_pass, (grids0, z, z, 0))

    n = jnp.asarray(count, dtype)
    mean = sum_wf / n
    var_mean = jnp.maximum(sum_wf2 / n - mean * mean, 0.0) / jnp.maximum(
        n - 1.0, 1.0)
    estimate = vol * mean
    errorest = vol * jnp.sqrt(var_mean)
    return estimate, errorest
