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
# VEGAS: multi-chip is a mesh= parameter of the ONE driver (mcubes.vegas)

def vegas_sharded(
    integrand, epsrel=1e-3, epsabs=1e-12, ncall=1e6, vol=None, *,
    mesh: Mesh, ndim=None, total_iters=15, adjust_iters=15, skip_iters=5,
    seed=0, dtype=jnp.float64, nbins=None, eval_dtype=None, **kw,
):
    """Multi-chip m-CUBES: thin alias of ``mcubes.vegas(..., mesh=mesh)``.

    The mesh path is the SAME driver as single-chip -- fused frozen phase,
    refine='device', poly importance, debug logger all run SPMD (the
    round-1 fork that re-implemented the control flow without them is
    gone).  PRNG streams key on GLOBAL chunk ids, so a mesh run draws the
    same samples as a single-chip run with the same chunk decomposition --
    the reproducibility property the reference's reseed-per-cube
    Custom_generator targets (vegas_utils.cuh:24-49).
    """
    from gpuintegration_tpu.mcubes import grid as vgrid
    return V.vegas(
        integrand, epsrel, epsabs, ncall, vol, ndim=ndim,
        total_iters=total_iters, adjust_iters=adjust_iters,
        skip_iters=skip_iters, seed=seed, dtype=dtype,
        nbins=nbins or vgrid.NDMX, eval_dtype=eval_dtype, mesh=mesh, **kw)
