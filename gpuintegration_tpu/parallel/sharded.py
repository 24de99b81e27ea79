"""Multi-chip execution of PAGANI and VEGAS over a jax.sharding.Mesh.

The reference has no distributed backend at all (grep-verified: no
MPI/NCCL/Gloo anywhere; SURVEY.md section 5.8); cross-chip scale-out is a
new capability of this framework.  Mapping:

* PAGANI: the region pool is sharded along the mesh axis; rule evaluation
  is local to each shard (zero communication), and the iteration/finished
  reductions become psums.  Compaction is performed shard-locally inside
  ``shard_map`` so no region data ever crosses chips; only the per-shard
  active counts are all-gathered.
* VEGAS: multi-chip is a ``mesh=`` parameter of the ONE driver
  (mcubes.vegas); each device owns a contiguous range of sample CHUNKS
  and PRNG streams key on the GLOBAL chunk id, so a mesh run draws the
  same samples as a single-chip run with the same chunk decomposition.
  ti/tsi and the (ndim, NDMX) histogram are psum'd -- the histogram is
  ~40 KB, so the collective cost is trivial against ICI bandwidth.
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
# PAGANI: shard-local pipeline stages.  Each device owns an independent
# BLOCKED sub-pool (its own region count, its own static-half layout);
# eval/refine/compact/split never move region data across chips -- only
# the f64 iteration scalars are psum'd.

_POOL = P(None, REGION_AXIS)   # dims-major (ndim, D*cap_s) pools
_VEC = P(REGION_AXIS)


@functools.partial(
    jax.jit,
    static_argnames=("f", "ndim", "dtype_name", "mesh", "chunk_size",
                     "blocked", "ncomp", "with_split_frac"))
def sharded_eval_stage(f, ndim, dtype_name, mesh,
                       lows, lengths, global_lo, global_range,
                       ns=None, chunk_size=None, blocked=False, ncomp=1,
                       with_split_frac=False):
    """Rule application with the region axis sharded over the mesh.

    Each shard evaluates its own regions -- the multi-chip analogue of the
    reference's grid of one block per region (PaganiUtils.cuh:313-331),
    with chips in place of SMs.  Outputs stay region-sharded.

    ``ns``: optional (D,) per-shard region counts -- enables the
    dynamic-trip chunked path per shard (only occupied chunks evaluated)
    with the per-shard ``blocked`` layout; ``None`` sweeps the full
    (padded) shard.

    ``ncomp`` > 1: vector integrands -- est/err come back component-major
    (ncomp, D*cap_s) with the REGION axis sharded (component axis
    replicated like the pools' dims axis).

    ``with_split_frac`` (round 5): crease/jump-aware splitting on the
    mesh -- the per-region cut fractions (rule_eval._split_fraction, a
    purely shard-local stencil computation) come back as a fourth
    region-sharded output for sharded_compact_split's ``extra=``.
    """
    tables = rule_eval.rule_tables(ndim, dtype_name)
    est_spec = _VEC if ncomp == 1 else _POOL
    out_specs = (est_spec, est_spec, _VEC)
    if with_split_frac:
        out_specs += (_VEC,)

    if ns is None:
        def local_eval(lo, ln, gl, gr):
            return rule_eval.apply_rule(
                f, tables, lo, ln, gl, gr, chunk_size=chunk_size,
                ncomp=ncomp, with_split_frac=with_split_frac)
        in_specs = (_POOL, _POOL, P(None), P(None))
        args = (lows, lengths, global_lo, global_range)
    else:
        def local_eval(lo, ln, gl, gr, ns_l):
            return rule_eval.apply_rule(
                f, tables, lo, ln, gl, gr, chunk_size=chunk_size,
                n=ns_l[0], blocked=blocked, ncomp=ncomp,
                with_split_frac=with_split_frac)
        in_specs = (_POOL, _POOL, P(None), P(None), _VEC)
        args = (lows, lengths, global_lo, global_range, ns)

    fn = shard_map(
        local_eval, mesh=mesh, in_specs=in_specs,
        out_specs=out_specs, check_vma=False,
    )
    return fn(*args)


@functools.partial(jax.jit, static_argnames=("mesh",))
def sharded_reductions(mesh, est, refined, active):
    """Global estimate/error/finished reductions over a sharded pool."""
    def local(e, r, a):
        s = jnp.stack([
            jnp.sum(e), jnp.sum(r),
            jnp.sum(a * e), jnp.sum(a * r), jnp.sum(a)])
        return jax.lax.psum(s, REGION_AXIS)

    fn = shard_map(local, mesh=mesh, in_specs=(_VEC, _VEC, _VEC),
                   out_specs=P())
    return fn(est, refined, active)


@functools.partial(
    jax.jit,
    static_argnames=("relerr_classification", "blocked", "mesh"))
def sharded_post_stage(relerr_classification, blocked, mesh,
                       est, err, ns, parent_est, use_refine, epsrel,
                       lengths=None, abs_per_vol=None):
    """Per-shard twin of workspace._post_stage: masking, two-level
    refinement and classification run shard-locally through the SAME
    traced pipeline (workspace.iteration_math); the five iteration
    scalars are psum'd into replicated f64 globals.  Also returns the
    per-shard validity mask (the classifier and the rollback need it).

    ``lengths``/``abs_per_vol``: optional volume-apportioned retirement
    (two_level.refine_error) -- volumes are shard-local products, so the
    criterion adds zero cross-chip traffic."""
    from gpuintegration_tpu.pagani.workspace import iteration_math
    from gpuintegration_tpu.pagani import region_pool

    def local(e, r, ns_l, par, ur, eps, *rest):
        cap_s = e.shape[0]
        n_loc = ns_l[0]
        ln_l, apv = rest if rest else (None, None)
        (e2, refined, active, i_est, i_err, f_est, f_err,
         n_act) = iteration_math(
            relerr_classification, blocked, e, r, n_loc, par, ur, eps,
            lengths=ln_l, abs_per_vol=apv)
        s = jnp.stack([i_est, i_err, f_est, f_err, n_act]).astype(
            jnp.float64)
        s = jax.lax.psum(s, REGION_AXIS)
        mask = region_pool.block_mask(cap_s, n_loc, blocked)
        return e2, refined, active, mask, n_act[None].astype(jnp.int32), s

    in_specs = (_VEC, _VEC, _VEC, _VEC, P(), P())
    args = (est, err, ns, parent_est, use_refine, epsrel)
    if abs_per_vol is not None:
        in_specs += (_POOL, P())
        args += (lengths, abs_per_vol)
    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=(_VEC, _VEC, _VEC, _VEC, _VEC, P()),
        check_vma=False)
    return fn(*args)


@functools.partial(
    jax.jit,
    static_argnames=("relerr_classification", "blocked", "mesh", "ncomp"))
def sharded_post_stage_vector(relerr_classification, blocked, mesh, ncomp,
                              est, err, ns, parent_est, use_refine, epsrel,
                              lengths=None, abs_per_vol=None):
    """Vector twin of ``sharded_post_stage``: the per-shard pipeline is
    workspace.iteration_math_vector (the SAME traced code as the
    single-chip vector loop) on component-major (ncomp, cap_s) shards,
    and the concatenated scalar vector [iter_est(ncomp), iter_err(ncomp),
    fin_est(ncomp), fin_err(ncomp), n_active] is psum'd into replicated
    f64 globals -- the "(ncomp,) replicated scalar carries" the round-3
    exclusion documented as missing."""
    from gpuintegration_tpu.pagani.workspace import iteration_math_vector
    from gpuintegration_tpu.pagani import region_pool

    def local(e, r, ns_l, par, ur, eps, *rest):
        cap_s = e.shape[1]
        n_loc = ns_l[0]
        ln_l, apv = rest if rest else (None, None)
        (e2, refined, active, i_est, i_err, f_est, f_err,
         n_act) = iteration_math_vector(
            relerr_classification, blocked, e, r, n_loc, par, ur, eps,
            lengths=ln_l, abs_per_vol=apv)
        s = jnp.concatenate(
            [i_est, i_err, f_est, f_err, n_act[None]]).astype(jnp.float64)
        s = jax.lax.psum(s, REGION_AXIS)
        mask = region_pool.block_mask(cap_s, n_loc, blocked)
        return e2, refined, active, mask, n_act[None].astype(jnp.int32), s

    in_specs = (_POOL, _POOL, _VEC, _POOL, P(), P())
    args = (est, err, ns, parent_est, use_refine, epsrel)
    if abs_per_vol is not None:
        in_specs += (_POOL, P())
        args += (lengths, abs_per_vol)
    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=(_POOL, _POOL, _VEC, _VEC, _VEC, P()),
        check_vma=False)
    return fn(*args)


@functools.partial(jax.jit, static_argnames=("out_capacity", "mesh"))
def sharded_compact_split(mesh, out_capacity,
                          active, lows, lengths, sdim, est, refined,
                          extra=None):
    """Shard-local compaction + bisection split: each device stream-
    compacts ITS surviving regions (the bitwise shift passes never leave
    the shard -- no cross-chip permute) and splits them into its own
    blocked sub-bucket of per-shard capacity ``out_capacity``.

    Returns (ns_children (D,), child_lows, child_lengths, parent_est,
    parent_err) with pools/vectors region-sharded.  Vector runs pass
    component-major (ncomp, D*cap_s) est/refined; the compaction's shift
    passes treat the component axis exactly like the pools' dims axis
    (replicated), and the parents come back component-major.

    ``extra`` (round 5): per-region cut fractions for crease/jump-aware
    splitting -- compacted alongside the pool (the shift passes are
    payload-agnostic) and consumed by the shard-local split's ``frac=``,
    exactly like the single-chip host loop.  Beyond-reference either
    way: the reference splits at midpoints only
    (Sub_region_splitter.cuh:56-87) and has no multi-GPU mode.
    """
    from gpuintegration_tpu.pagani import region_pool

    pe_spec = _POOL if est.ndim == 2 else _VEC

    if extra is None:
        def local(a, lo, ln, sd, e, r):
            # compaction is gated by the active MASK alone; per-shard
            # counts are derived, not consumed
            n_act, c_lo, c_ln, c_sd, par, perr = region_pool.compact(
                a, lo, ln, sd, e, r, out_capacity=out_capacity // 2)
            lo2, ln2, _ = region_pool.split(
                c_lo, c_ln, c_sd, n_act, out_capacity=out_capacity)
            return ((2 * n_act)[None].astype(jnp.int32), lo2, ln2, par,
                    perr)
        in_specs = (_VEC, _POOL, _POOL, _VEC, pe_spec, pe_spec)
        args = (active, lows, lengths, sdim, est, refined)
    else:
        def local(a, lo, ln, sd, e, r, fr):
            n_act, c_lo, c_ln, c_sd, par, perr, c_fr = region_pool.compact(
                a, lo, ln, sd, e, r, out_capacity=out_capacity // 2,
                extra=fr)
            lo2, ln2, _ = region_pool.split(
                c_lo, c_ln, c_sd, n_act, out_capacity=out_capacity,
                frac=c_fr)
            return ((2 * n_act)[None].astype(jnp.int32), lo2, ln2, par,
                    perr)
        in_specs = (_VEC, _POOL, _POOL, _VEC, pe_spec, pe_spec, _VEC)
        args = (active, lows, lengths, sdim, est, refined, extra)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=(_VEC, _POOL, _POOL, pe_spec, pe_spec),
        check_vma=False)
    return fn(*args)


@functools.partial(jax.jit, static_argnames=("out_capacity", "mesh"))
def sharded_split(mesh, out_capacity, lows, lengths, sdim, ns, frac=None):
    """Shard-local split of already-compacted survivors into a doubled
    per-shard bucket (the fused phase's bucket-overflow exit hands back
    compacted survivors; this grows them without re-evaluation).
    ``frac``: their compacted cut fractions (crease/jump runs)."""
    from gpuintegration_tpu.pagani import region_pool

    if frac is None:
        def local(lo, ln, sd, ns_l):
            lo2, ln2, _ = region_pool.split(
                lo, ln, sd, ns_l[0], out_capacity=out_capacity)
            return (2 * ns_l[0])[None].astype(jnp.int32), lo2, ln2
        in_specs = (_POOL, _POOL, _VEC, _VEC)
        args = (lows, lengths, sdim, ns)
    else:
        def local(lo, ln, sd, ns_l, fr):
            lo2, ln2, _ = region_pool.split(
                lo, ln, sd, ns_l[0], out_capacity=out_capacity, frac=fr)
            return (2 * ns_l[0])[None].astype(jnp.int32), lo2, ln2
        in_specs = (_POOL, _POOL, _VEC, _VEC, _VEC)
        args = (lows, lengths, sdim, ns, frac)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=(_VEC, _POOL, _POOL),
        check_vma=False)
    return fn(*args)


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
