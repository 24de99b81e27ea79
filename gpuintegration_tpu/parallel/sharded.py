"""Multi-chip execution of PAGANI and VEGAS over a jax.sharding.Mesh.

The reference has no distributed backend at all (grep-verified: no
MPI/NCCL/Gloo anywhere; SURVEY.md section 5.8); cross-chip scale-out is a
new capability of this framework.  Mapping:

* PAGANI: the region pool is sharded along the mesh axis; rule evaluation
  is local to each shard (zero communication), and the iteration/finished
  reductions become psums.  Compaction is performed shard-locally inside
  ``shard_map`` so no region data ever crosses chips; only the per-shard
  active counts are all-gathered.
* VEGAS: each device owns a contiguous range of sub-cubes
  (cube_offset = axis_index * cubes_per_shard); ti/tsi and the
  (ndim, NDMX) histogram are psum'd -- the histogram is ~40 KB, so the
  collective cost is trivial against ICI bandwidth.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gpuintegration_tpu.mcubes import vegas as V
from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.parallel.mesh import REGION_AXIS


# ---------------------------------------------------------------------------
# PAGANI: sharded rule evaluation + reductions

@functools.partial(
    jax.jit,
    static_argnames=("f", "ndim", "dtype_name", "mesh"))
def sharded_eval_stage(f, ndim, dtype_name, mesh,
                       lows, lengths, global_lo, global_range):
    """Rule application with the region axis sharded over the mesh.

    Each shard evaluates its own regions -- the multi-chip analogue of the
    reference's grid of one block per region (PaganiUtils.cuh:313-331),
    with chips in place of SMs.  Outputs stay region-sharded.
    """
    tables = rule_eval.rule_tables(ndim, dtype_name)

    def local_eval(lo, ln, gl, gr):
        return rule_eval.apply_rule(f, tables, lo, ln, gl, gr)

    spec_pool = P(None, REGION_AXIS)   # dims-major (ndim, R) pools
    spec_vec = P(REGION_AXIS)
    fn = shard_map(
        local_eval, mesh=mesh,
        in_specs=(spec_pool, spec_pool, P(None), P(None)),
        out_specs=(spec_vec, spec_vec, spec_vec),
    )
    return fn(lows, lengths, global_lo, global_range)


@functools.partial(jax.jit, static_argnames=("mesh",))
def sharded_reductions(mesh, est, refined, active):
    """Global estimate/error/finished reductions over a sharded pool."""
    spec = P(REGION_AXIS)

    def local(e, r, a):
        s = jnp.stack([
            jnp.sum(e), jnp.sum(r),
            jnp.sum(a * e), jnp.sum(a * r), jnp.sum(a)])
        return jax.lax.psum(s, REGION_AXIS)

    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=P())
    return fn(est, refined, active)


# ---------------------------------------------------------------------------
# VEGAS: cube-range-per-device iteration

@functools.partial(
    jax.jit,
    static_argnames=("f", "ndim", "ng", "npg", "chunk_cubes",
                     "num_chunks_per_dev", "nbins", "accumulate_hist",
                     "dtype_name", "mesh", "eval_dtype_name"))
def sharded_vegas_iteration(
    f, ndim, ng, npg, chunk_cubes, num_chunks_per_dev, nbins,
    accumulate_hist, dtype_name, mesh,
    key, xi, regn_lo, dx, xjac, ncubes,
    *,
    eval_dtype_name=None,
):
    """One VEGAS iteration with the sub-cube lattice split across the mesh.

    Device i owns cubes [i * cubes_per_shard, (i+1) * cubes_per_shard); the
    scalar accumulators and the adaptation histogram are all-reduced --
    replacing the reference's atomicAdd(result_dev) global accumulation
    (vegasT.cuh:483-484) with psums over ICI.
    """
    cubes_per_shard = chunk_cubes * num_chunks_per_dev

    def local(key, xi, regn_lo, dx, xjac, ncubes):
        dev = jax.lax.axis_index(REGION_AXIS)
        offset = (dev.astype(jnp.int64) * cubes_per_shard)
        dev_key = jax.random.fold_in(key, dev)
        ti, tsi, d = V._vegas_iteration.__wrapped__(
            f, ndim, ng, npg, chunk_cubes, num_chunks_per_dev, nbins,
            accumulate_hist, dtype_name,
            dev_key, xi, regn_lo, dx, xjac, ncubes, offset,
            eval_dtype_name=eval_dtype_name)
        ti = jax.lax.psum(ti, REGION_AXIS)
        tsi = jax.lax.psum(tsi, REGION_AXIS)
        d = jax.lax.psum(d, REGION_AXIS)
        return ti, tsi, d

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None), P(None, None), P(None), P(None), P(), P()),
        out_specs=(P(), P(), P(None, None)),
        check_vma=False,
    )
    return fn(key, xi, regn_lo, dx, xjac, ncubes)


def vegas_sharded(
    integrand, epsrel=1e-3, epsabs=1e-12, ncall=1e6, vol=None, *,
    mesh: Mesh, ndim=None, total_iters=15, adjust_iters=15, skip_iters=5,
    seed=0, dtype=jnp.float64, nbins=None, eval_dtype=None,
):
    """Multi-chip m-CUBES driver: same control flow as mcubes.vegas.vegas
    but with each iteration's sampling spread over the mesh.

    NOTE on reproducibility: the per-device key is folded with the device
    index, so results depend on mesh size (like the reference's dependence
    on chunk/block geometry) but are deterministic for a fixed
    (seed, mesh) -- the property the reference's reseed-per-cube
    Custom_generator design aims at (vegas_utils.cuh:24-49).
    """
    import math
    import numpy as np
    from gpuintegration_tpu.integrand import make_integrand
    from gpuintegration_tpu.mcubes import grid as vgrid
    from gpuintegration_tpu.types import IntegrationResult, Volume

    f, ndim = make_integrand(integrand, ndim)
    if vol is None:
        vol = Volume(ndim=ndim)
    dtype = jnp.dtype(dtype)
    ed_name = jnp.dtype(eval_dtype).name if eval_dtype is not None else None
    nbins = nbins or vgrid.NDMX

    ng, ncubes = V.compute_ncubes(ncall, ndim)
    npg = V.samples_per_cube(ncall, ncubes)
    calls = float(npg) * float(ncubes)
    dv2g = (calls * (1.0 / ng) ** ndim) ** 2 / npg / npg / (npg - 1.0)
    xjac = (1.0 / calls) * vol.jacobian

    n_dev = int(mesh.devices.size)
    cubes_per_shard = -(-ncubes // n_dev)
    chunk = min(cubes_per_shard, 1 << 18)
    num_chunks_per_dev = -(-cubes_per_shard // chunk)

    regn_lo = jnp.asarray(vol.lows, dtype)
    dx = jnp.asarray(vol.highs - vol.lows, dtype)
    xjac_d = jnp.asarray(xjac, dtype)
    ncubes_d = jnp.asarray(ncubes, jnp.int64)
    xi = vgrid.uniform_grid(ndim, nbins, dtype)

    base_key = jax.random.PRNGKey(seed)
    res = IntegrationResult(status=1)
    si = swgt = schi = 0.0
    tgral = sd = chi2a = 0.0

    it = 1
    while it <= total_iters and res.status == 1:
        adjusting = it <= adjust_iters
        key = jax.random.fold_in(base_key, it)
        ti_d, tsi_d, d = sharded_vegas_iteration(
            f, ndim, ng, npg, chunk, num_chunks_per_dev, nbins, adjusting,
            dtype.name, mesh, key, xi, regn_lo, dx, xjac_d, ncubes_d,
            eval_dtype_name=ed_name)
        if adjusting:
            xi = jnp.asarray(vgrid.smooth_and_refine(xi, d), dtype)
        out = np.asarray(jnp.stack([ti_d, tsi_d]))
        ti, tsi = float(out[0]), float(out[1]) * dv2g
        res.neval += int(calls)
        if it > skip_iters:
            wgt = 1.0 / tsi
            si += wgt * ti
            schi += wgt * ti * ti
            swgt += wgt
            tgral = si / swgt
            chi2a = max((schi - si * tgral) / (it - 0.9999), 0.0)
            sd = math.sqrt(1.0 / swgt)
            res.status = V.get_status(tgral, sd, it, epsrel, epsabs)
        res.iters += 1
        it += 1

    res.estimate, res.errorest, res.chi_sq = tgral, sd, chi2a
    return res
