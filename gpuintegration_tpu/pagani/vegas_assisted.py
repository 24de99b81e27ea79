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
the workspace dtype), because f64 cumsum/gather emulation on TPU carries
pathological compile cost.  Bin histograms use deterministic segment-sums
instead of the reference's shared-memory atomics (Sample.cuh:438-440).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _refine_grids(grids: jax.Array, hist: jax.Array) -> jax.Array:
    """Batched per-region grid refinement: 3-bin smoothing + log-damped
    rebin (the device-side rebin of Sample.cuh:299-326, 483-523),
    vectorised over (R, ndim) in f32."""
    nb = hist.shape[-1]
    left = jnp.concatenate([hist[..., :1], hist[..., :-1]], axis=-1)
    right = jnp.concatenate([hist[..., 1:], hist[..., -1:]], axis=-1)
    sm = (left + hist + right) / 3.0
    sm = sm.at[..., 0].set((hist[..., 0] + hist[..., 1]) / 2.0)
    sm = sm.at[..., -1].set((hist[..., -2] + hist[..., -1]) / 2.0)
    dt = jnp.sum(sm, axis=-1, keepdims=True)
    frac = sm / jnp.where(dt > 0, dt, 1.0)
    safe = jnp.clip(frac, 1e-30, 1.0)
    r = jnp.where(frac > 0,
                  ((1.0 - frac) / (-jnp.log(safe))) ** 1.5, 0.0)

    cum = jnp.cumsum(r, axis=-1)                       # (R, ndim, nb)
    total = cum[..., -1:]
    targets = (jnp.arange(1, nb, dtype=grids.dtype)
               * (total / nb))                         # (R, ndim, nb-1)

    def row_rebin(row_cum, row_targets, row_grid, row_r):
        k = jnp.searchsorted(row_cum, row_targets, side="left",
                             method="sort")
        k = jnp.clip(k, 0, nb - 1)
        dr = row_cum[k] - row_targets
        xo = row_grid[k]
        xn = row_grid[k + 1]
        rk = jnp.where(row_r[k] > 0, row_r[k], 1.0)
        inner = xn - (xn - xo) * dr / rk
        return jnp.concatenate([jnp.zeros((1,), row_grid.dtype), inner,
                                jnp.ones((1,), row_grid.dtype)])

    rebin = jax.vmap(jax.vmap(row_rebin))
    refined = rebin(cum, targets, grids, r)
    return jnp.where(dt > 0, refined, grids)


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
    R = lows.shape[1]
    jac = jnp.prod(global_range).astype(dtype)
    vol = jnp.prod(lengths, axis=0).astype(dtype)      # unit region volume

    grids0 = jnp.broadcast_to(
        jnp.linspace(0.0, 1.0, nbins + 1, dtype=jnp.float32),
        (R, ndim, nbins + 1))

    def one_pass(p, carry):
        grids, sum_wf, sum_wf2, count = carry
        pk = jax.random.fold_in(key, p)
        u_bin = jax.random.uniform(pk, (R, spp, ndim), jnp.float32)
        pk2 = jax.random.fold_in(pk, 1)
        u_pos = jax.random.uniform(pk2, (R, spp, ndim), jnp.float32)

        bins = jnp.clip((u_bin * nbins).astype(jnp.int32), 0, nbins - 1)
        reg_ids = jnp.arange(R)[:, None, None]
        dim_ids = jnp.arange(ndim)[None, None, :]
        lo_edge = grids[reg_ids, dim_ids, bins]
        hi_edge = grids[reg_ids, dim_ids, bins + 1]
        width = hi_edge - lo_edge
        u = lo_edge + u_pos * width                     # region-unit coords
        w = jnp.prod((width * nbins).astype(dtype), axis=-1)  # (R, spp)

        x = (global_lo
             + (lows.T[:, None, :] + u.astype(dtype) * lengths.T[:, None, :])
             * global_range)
        fx = f(x).astype(dtype) * jac                   # (R, spp)
        wf = w * fx

        sum_wf = sum_wf + jnp.sum(wf, axis=1)
        sum_wf2 = sum_wf2 + jnp.sum(wf * wf, axis=1)
        count = count + spp

        # per-(region, dim) f^2 histogram -> grid refinement
        f2 = (wf * wf).astype(jnp.float32)
        seg = (reg_ids * ndim + dim_ids) * nbins + bins  # (R, spp, ndim)
        contrib = jnp.broadcast_to(f2[..., None], seg.shape)
        hist = jax.ops.segment_sum(
            contrib.reshape(-1), seg.reshape(-1),
            num_segments=R * ndim * nbins).reshape(R, ndim, nbins)
        grids = _refine_grids(grids, hist)
        return grids, sum_wf, sum_wf2, count

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
