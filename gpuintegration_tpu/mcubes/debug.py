"""mcubes debug/observability: per-iteration data capture.

Re-expression of the reference's IterDataLogger<DEBUG, NDIM>
(reference: cuda/mcubes/util/verbose_utils.cuh:7-181), which captures bin
bounds, random numbers, function evaluations and iteration results into
managed memory and dumps five CSVs (pmcubes_{bin_bounds,random_nums,
funcevals,intevals,iters}.csv).

The TPU design records the same information without device round-trips
for the big items: the grid and histogram are tiny and copied per
iteration anyway; sample-level captures (points, values, randoms) are
supported for small ncall by re-running one iteration with a capturing
variant -- capture is an observability tool, not a production path.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class VegasIterationRecord:
    it: int
    ti: float                 # raw iteration estimate
    tsi: float                # scaled variance
    tgral: float              # running weighted estimate
    sd: float                 # running error
    chi2a: float
    xi: np.ndarray            # (ndim, nbins+1) grid after refinement
    d: np.ndarray | None      # (ndim, nbins) histogram (adjust phase only)


class VegasDebugLogger:
    """Collects VegasIterationRecord per iteration; CSV dumpers mirror the
    reference's file set."""

    def __init__(self):
        self.records: list[VegasIterationRecord] = []

    def record(self, **kw):
        self.records.append(VegasIterationRecord(**kw))

    # -- CSV dumpers (reference file-name parity) ---------------------------
    def dump_iters(self, outfile):
        print("iter,estimate,errorest,chi_sq,iter_estimate,iter_variance",
              file=outfile)
        for r in self.records:
            print(f"{r.it},{r.tgral:.15e},{r.sd:.15e},{r.chi2a:.5f},"
                  f"{r.ti:.15e},{r.tsi:.15e}", file=outfile)

    def dump_bin_bounds(self, outfile):
        print("iter,dim,bin,right_edge", file=outfile)
        for r in self.records:
            ndim, nb1 = r.xi.shape
            for dim in range(ndim):
                for b in range(nb1):
                    print(f"{r.it},{dim},{b},{r.xi[dim, b]:.17e}",
                          file=outfile)

    def dump_bin_contributions(self, outfile):
        print("iter,dim,bin,f2_mass", file=outfile)
        for r in self.records:
            if r.d is None:
                continue
            ndim, nb = r.d.shape
            for dim in range(ndim):
                for b in range(nb):
                    print(f"{r.it},{dim},{b},{r.d[dim, b]:.10e}",
                          file=outfile)


def capture_samples(f, ndim, ng, npg, nbins, xi, regn_lo, dx, xjac,
                    ncubes, seed=0, it=1, max_samples=100_000):
    """Sample-level capture (points, weights, values, cube ids) of one
    VEGAS iteration -- the funcevals/random_nums CSVs of the reference.
    Limited to runs that fit one chunk; returns a dict of numpy arrays.

    Reproduces iteration ``it``'s actual sampling stream and arithmetic
    (vegas._vegas_iteration): key = fold_in(fold_in(PRNGKey(seed), it), 0)
    -- the per-iteration then per-chunk folds, single chunk -- and the
    f32 sampling machinery, so captured points/values match what the
    integration evaluated, not a lookalike stream."""
    total = ncubes * npg
    if total > max_samples:
        raise ValueError(f"capture limited to {max_samples} samples, "
                         f"got {total}")
    f32 = jnp.float32
    dtype = jnp.float64
    it_key = jax.random.fold_in(jax.random.PRNGKey(seed), it)
    ck = jax.random.fold_in(it_key, 0)      # chunk 0 (single-chunk run)
    cube_ids = jnp.arange(ncubes, dtype=jnp.int64)
    from gpuintegration_tpu.mcubes.vegas import _decode_cube
    kg = _decode_cube(cube_ids, ng, ndim)
    ran = jax.random.uniform(ck, (ncubes, npg, ndim), f32)
    xi32 = xi.astype(f32)
    xnd32 = jnp.asarray(float(nbins), f32)
    dxg32 = xnd32 / ng
    xn = (kg[:, None, :].astype(f32) - ran) * dxg32 + 1.0
    ia = jnp.clip(xn.astype(jnp.int32), 1, nbins)
    dim_ids = jnp.arange(ndim)
    edge_hi = xi32[dim_ids, ia]
    edge_lo = xi32[dim_ids, ia - 1]
    xo = edge_hi - edge_lo
    rc = edge_lo + (xn - ia.astype(f32)) * xo
    x = regn_lo + rc.astype(dtype) * dx
    wgt = xjac * jnp.prod((xo * xnd32).astype(dtype), axis=-1)
    fx = f(x).astype(dtype) * wgt
    return {
        "points": np.asarray(x),
        "weights": np.asarray(wgt),
        "values": np.asarray(fx),
        "bins": np.asarray(ia),
        "randoms": np.asarray(ran),
        "cube_ids": np.asarray(cube_ids),
    }
