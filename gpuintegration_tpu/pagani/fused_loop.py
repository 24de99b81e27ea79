"""Fused on-device adaptive phase: many PAGANI iterations per dispatch.

The host-orchestrated loop (pagani/workspace.py) pays a floor of ~65 ms
per iteration on the axon runtime (one dispatch + one scalar D2H sync --
docs/DESIGN.md section 1), which dominates wall time whenever the pool is
small: a 5-D run converging in 20 iterations spends ~1.3 s on floors for
~100 ms of device work.  (The reference pays this floor 8-12x over per
iteration as kernel launches + cudaDeviceSynchronize, Workspace.cuh:182-353.)

This module runs WHOLE adaptive iterations inside one ``lax.while_loop``
dispatch -- eval, two-level refinement, accuracy test, error-budget
rollback, finished accounting, compaction and split -- for as long as the
pool stays within one static bucket capacity and below the
memory-pressure classification gate.  It exits back to the host when:

  * accuracy is reached (status 0),
  * every region finished (status 2),
  * the next split would overflow the bucket (status 1): the sweep IS
    applied and the compacted survivors are returned -- the host splits
    them into the doubled bucket without re-evaluating anything,
  * the pool crossed the classification gate or the iteration budget ran
    out (status -1): the host runs its (string-arithmetic, host-only)
    classifier iteration and may re-enter a fused phase.

The per-region pipeline is the SAME traced code as the host loop
(workspace.iteration_math), and the ledger accumulates in f64 exactly as
the host's Python-float arithmetic does (iteration sums are reduced in
the pool dtype, then widened -- widening is exact), so fused and host
trajectories agree to reassociation-level roundoff for f64 pools and
bit-for-bit in the per-region pipeline.

The VEGAS analogue is mcubes.vegas._frozen_phase.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.pagani import region_pool


@functools.partial(jax.jit, static_argnames=(
    "f", "ndim", "dtype_name", "chunk_size", "relerr_classification",
    "gate", "feval", "mesh", "rule_backend", "f_axes", "interpret",
    "with_split_frac"))
def fused_adaptive_phase(
    f,
    ndim: int,
    dtype_name: str,
    chunk_size,               # static int or None (single-shot eval)
    relerr_classification: bool,
    gate: int,                # exit (without eval) once 2*n > gate
    feval: int,               # rule points per region (neval accounting)
    lows, lengths,            # (ndim, cap) BLOCKED pool (post-split layout)
    n,                        # int32: region count (mesh: (D,) per-shard)
    parent_est,               # (cap//2,) compacted parent estimates
    global_lo, global_range,  # (ndim,)
    epsrel_pool,              # pool-dtype epsrel (two-level classification)
    epsrel, epsabs,           # f64 ledger tolerances
    cum_est, cum_err,         # f64 scalars: cumulative finished ledger
    result_nregions,          # f64 scalar (exact integer < 2^53)
    iters_done,               # int32: iterations completed so far
    neval,                    # f64 scalar
    est_hist,                 # (3,) f64: last three cumulative estimates
    max_iters,                # int32: total iteration budget
    abs_per_vol=None,         # pool-dtype scalar: volume-apportioned
                              # retirement budget (two_level.refine_error)
    neval_cap=None,           # f64 scalar: exit the burst (status -1) once
                              # neval reaches this -- the single-dispatch
                              # device-time ceiling (DESIGN.md 3b: the
                              # remote worker crashes past ~2e10 evals in
                              # one dispatch); None = unbounded
    *,
    mesh=None,
    rule_backend: str = "xla",
    f_axes=None,              # scalar-per-axis integrand (pallas backend)
    interpret: bool = False,  # pallas interpret mode (non-TPU backends)
    with_split_frac: bool = False,  # crease-aware splitting: thread the
                              # per-region cut fraction through the carry
                              # (rule_eval._split_fraction; XLA backend
                              # only -- the stencil is shard-local, so
                              # the mesh form works too, round 5).  Adds
                              # a return slot after sdim with the
                              # compacted fraction vector so a grow
                              # exit's split stays crease-aware.
):
    """Returns (lows, lengths, parent_est, sdim, packed) -- plus a
    per-shard count vector ``ns`` before ``packed`` in mesh mode -- where
    ``packed`` is ONE f64 vector (a single D2H sync on the host -- every
    separate scalar transfer costs ~30 ms on this runtime) laid out as

      [n, cum_est, cum_err, result_nregions, iters_done, neval, status,
       last_inflight_est, last_inflight_err,
       prev_est, prev_err, prev_nregions, prev_iters,
       est_hist[0], est_hist[1], est_hist[2], prev_neval]

    Every iteration processed is APPLIED to the ledger.  status:
      0  converged;
      2  all regions finished;
      1  bucket overflow: the next split needs 2*cap.  The pool output
         holds the COMPACTED survivors (up to cap of them) in slot order
         (n = their count; ``sdim`` their bisection dims; ``parent_est``
         their estimates) -- the host splits them straight into the 2*cap
         bucket, so no sweep is ever evaluated twice;
     -1  stopped by the cond (2*n > classification gate, the iteration
         budget ran out, or ``neval_cap`` -- the per-dispatch eval
         ceiling -- was reached; the host resumes identically in every
         case: the pool is post-split and unevaluated).
    prev_* is the ledger EXCLUDING the last applied sweep (the checkpoint
    semantics of workspace._ledger_excl_pool); last_inflight_* is that
    sweep's still-active contribution (the host's max-iterations exit).
    Counters are exact in f64 (< 2^53).

    ``mesh``: run the whole phase SPMD.  Each device owns an independent
    BLOCKED sub-pool of the sharded (ndim, D*cap_s) bucket with its own
    region count (``n`` is the (D,) per-shard count vector; ``cap`` below
    is the PER-SHARD capacity); eval, refinement, compaction and split
    are shard-local (zero cross-chip region traffic -- the static-roll
    compaction never leaves the shard), and only the f64 iteration
    scalars are psum'd.  The ledger, accuracy test, rollback and every
    exit decision are computed from the psum'd globals identically on all
    devices, so the replicated carry stays consistent; a bucket-overflow
    exit fires when ANY shard's split would overflow its local capacity
    (shards do not rebalance, like the reference's static block
    assignment, PaganiUtils.cuh:313-331).
    """
    from gpuintegration_tpu.pagani.workspace import iteration_math
    dtype = jnp.dtype(dtype_name)
    f64 = jnp.float64
    tables = rule_eval.rule_tables(ndim, dtype_name)
    zero = jnp.zeros((), f64)

    if with_split_frac and rule_backend != "xla":
        raise ValueError("with_split_frac (crease_split) runs on the XLA "
                         "rule backend only")

    if rule_backend == "pallas":
        # the f32 VMEM-fused kernel drives the whole loop body (VERDICT
        # round-1 item: the fastest kernel must serve the fastest loop).
        # No chunk/dynamic-trip glue: the Pallas grid tiles the bucket in
        # VMEM-bounded blocks, so the (C, feval) intermediate never
        # materializes; padded slots zero out via vol = prod(lengths).
        from gpuintegration_tpu.ops.pallas_rule import pallas_apply_rule

        def eval_pool(lo_c, ln_c, n_loc, global_lo, global_range):
            return pallas_apply_rule(f_axes, ndim, lo_c, ln_c,
                                     global_lo, global_range,
                                     interpret=interpret)
    else:
        def eval_pool(lo_c, ln_c, n_loc, global_lo, global_range):
            return rule_eval.apply_rule(
                f, tables, lo_c, ln_c, global_lo, global_range,
                chunk_size=chunk_size, n=n_loc, blocked=True,
                with_split_frac=with_split_frac)

    if mesh is not None:
        from gpuintegration_tpu.parallel.mesh import REGION_AXIS
        ps = functools.partial(jax.lax.psum, axis_name=REGION_AXIS)
    else:
        ps = lambda x: x  # noqa: E731 - single-chip: psum is identity

    def run(lows, lengths, n_loc0, n_glob0, parent_est,
            global_lo, global_range, epsrel_pool, epsrel, epsabs,
            cum_est, cum_err, result_nregions, iters_done, neval,
            est_hist, max_iters, abs_per_vol, neval_cap):
        cap = lows.shape[1]           # per-shard capacity in mesh mode
        # parent slot is carried at FULL capacity (a grow exit returns up
        # to cap compacted parents); refine_error only reads [:cap//2]
        if parent_est.shape[0] < cap:
            parent_est = jnp.pad(parent_est, (0, cap - parent_est.shape[0]))

        def cond(carry):
            n_g, iters_c, nev_c, status_c = (carry[3], carry[8],
                                             carry[9], carry[11])
            return ((status_c == -1)
                    & (2 * n_g <= gate)
                    & (iters_c < max_iters)
                    & (nev_c < neval_cap))

        def body(carry):
            (lo_c, ln_c, n_loc, n_glob, par_c, cum_e, cum_r, res_nreg,
             iters_c, nev, hist, _status, _lie, _lir,
             _pe, _pr, _pn, _pi, _pv, *_tail) = carry

            ev = eval_pool(lo_c, ln_c, n_loc, global_lo, global_range)
            if with_split_frac:
                est_raw, err_raw, sdim, sfrac = ev
            else:
                (est_raw, err_raw, sdim), sfrac = ev, None
            # SAME traced pipeline as the host's _post_stage
            (est, refined, active, iter_est_d, iter_err_d, fin_est_d,
             fin_err_d, n_active_d) = iteration_math(
                relerr_classification, True, est_raw, err_raw, n_loc,
                par_c, jnp.asarray(True), epsrel_pool,
                lengths=None if abs_per_vol is None else ln_c,
                abs_per_vol=abs_per_vol)
            # ledger arithmetic in f64, exactly like the host's Python
            # floats (widening the dtype-reduced sums is exact); mesh:
            # psum the f64 partials -> replicated globals
            iter_est = ps(iter_est_d.astype(f64))
            iter_err = ps(iter_err_d.astype(f64))
            fin_est = ps(fin_est_d.astype(f64))
            fin_err = ps(fin_err_d.astype(f64))

            tot_est = cum_e + iter_est
            tot_err = cum_r + iter_err
            # accuracy_reached (PaganiUtils.cuh:387-394)
            done = jnp.where(
                jnp.abs(tot_est) > 0,
                (tot_err / jnp.abs(tot_est) <= epsrel) | (tot_err <= epsabs),
                tot_err <= epsabs)

            # error-budget-overflow rollback (Workspace.cuh:121-146) --
            # a GLOBAL decision applied to every shard's flags; the budget
            # includes the epsabs term (host-loop equivalence: epsabs-
            # dominated runs would otherwise roll back on any banked error)
            overflow = (cum_r + fin_err) > jnp.maximum(
                jnp.abs(tot_est) * epsrel, epsabs)
            mask = region_pool.block_mask(cap, n_loc, True)
            all_act = jnp.where(mask, 1.0, 0.0).astype(est.dtype)
            active = jnp.where(overflow, all_act, active)
            fin_est = jnp.where(overflow, zero, fin_est)
            fin_err = jnp.where(overflow, zero, fin_err)

            n_active_loc = jnp.where(overflow, n_loc,
                                     n_active_d.astype(jnp.int32))
            n_active_glob = ps(n_active_loc)
            all_fin = (~done) & (n_active_glob == 0)
            # grow when ANY shard's split would overflow its local bucket
            grow_any = ps((2 * n_active_loc > cap).astype(jnp.int32)) > 0
            grow = (~done) & (~all_fin) & grow_any

            # compaction at FULL capacity (a grow exit can have up to cap
            # survivors -- compacting into cap//2 would truncate them);
            # the in-place split for the normal branch uses the first
            # half, which is safe there (go implies n_active <= cap/2)
            cres = region_pool.compact(
                active, lo_c, ln_c, sdim, est, refined, out_capacity=cap,
                extra=sfrac)
            n_act_d, c_lo, c_ln, c_sd, par_new = cres[:5]
            c_fr = cres[6] if with_split_frac else None
            lo2, ln2, _ = region_pool.split(
                c_lo[:, :cap // 2], c_ln[:, :cap // 2], c_sd[:cap // 2],
                n_act_d, out_capacity=cap,
                frac=None if c_fr is None else c_fr[:cap // 2])

            # Every branch APPLIES the iteration:
            #   done     -> accuracy: fold the WHOLE sweep into the ledger
            #   all_fin  -> everything finished this sweep
            #   grow     -> ledger the finished part, output the COMPACTED
            #               survivors (host splits into the 2*cap bucket)
            #   go       -> normal: compact + split in place
            add_est = jnp.where(done, iter_est, fin_est)
            add_err = jnp.where(done, iter_err, fin_err)
            drop = jnp.where(done, 0.0,
                             jnp.where(all_fin, n_glob.astype(f64),
                                       (n_glob - n_active_glob).astype(f64)))

            keep = done | all_fin
            lo_out = jnp.where(keep, lo_c, jnp.where(grow, c_lo, lo2))
            ln_out = jnp.where(keep, ln_c, jnp.where(grow, c_ln, ln2))
            par_out = jnp.where(keep, par_c, par_new)     # (cap,); refine
            sd_out = c_sd                                 # slices [:cap//2]
            n_out_loc = jnp.where(keep, n_loc,
                                  jnp.where(grow, n_active_loc,
                                            2 * n_active_loc))
            n_out_glob = jnp.where(keep, n_glob,
                                   jnp.where(grow, n_active_glob,
                                             2 * n_active_glob))
            status = jnp.where(
                done, 0,
                jnp.where(all_fin, 2,
                          jnp.where(grow, 1, -1))).astype(jnp.int32)

            hist_out = jnp.where(~done,
                                 jnp.concatenate([hist[1:], tot_est[None]]),
                                 hist)
            out = (lo_out, ln_out, n_out_loc, n_out_glob, par_out,
                   cum_e + add_est, cum_r + add_err, res_nreg + drop,
                   iters_c + 1, nev + n_glob.astype(f64) * feval,
                   hist_out, status,
                   iter_est - fin_est, iter_err - fin_err,
                   cum_e, cum_r, res_nreg, iters_c, nev, sd_out)
            if with_split_frac:
                # compacted cut fractions travel like sd_out: a grow
                # exit's host split reads them (slices [:n])
                out = out + (c_fr,)
            return out

        carry0 = (lows, lengths, n_loc0, n_glob0, parent_est,
                  cum_est, cum_err, result_nregions,
                  iters_done, neval, est_hist, jnp.asarray(-1, jnp.int32),
                  zero, zero,
                  cum_est, cum_err, result_nregions, iters_done, neval,
                  jnp.zeros((cap,), jnp.int32))
        if with_split_frac:
            carry0 = carry0 + (jnp.full((cap,), 0.5, dtype),)
        (lo_f, ln_f, nl_f, ng_f, par_f, ce_f, cr_f, rn_f, it_f, nev_f,
         hist_f, st_f, lie_f, lir_f, pe_f, pr_f, pn_f, pi_f, pv_f,
         sd_f, *tail_f) = jax.lax.while_loop(cond, body, carry0)
        packed = jnp.stack([
            ng_f.astype(f64), ce_f, cr_f, rn_f,
            it_f.astype(f64), nev_f, st_f.astype(f64),
            lie_f, lir_f,
            pe_f, pr_f, pn_f, pi_f.astype(f64),
            hist_f[0], hist_f[1], hist_f[2], pv_f])
        if with_split_frac:
            return lo_f, ln_f, par_f, sd_f, tail_f[0], nl_f, packed
        return lo_f, ln_f, par_f, sd_f, nl_f, packed

    cap_nev = (jnp.asarray(jnp.inf, f64) if neval_cap is None
               else jnp.asarray(neval_cap, f64))
    scalars = (global_lo, global_range, epsrel_pool, epsrel, epsabs,
               cum_est, cum_err, result_nregions, iters_done, neval,
               est_hist, max_iters, abs_per_vol, cap_nev)
    if mesh is None:
        out = run(lows, lengths, n, n, parent_est, *scalars)
        if with_split_frac:
            lo_f, ln_f, par_f, sd_f, fr_f, _nl, packed = out
            return lo_f, ln_f, par_f, sd_f, fr_f, packed
        lo_f, ln_f, par_f, sd_f, _nl, packed = out
        return lo_f, ln_f, par_f, sd_f, packed

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from gpuintegration_tpu.parallel.mesh import REGION_AXIS
    R = REGION_AXIS

    if with_split_frac:
        def local(lo, ln, ns, par, *rest):
            n_loc = ns[0]
            n_glob = jax.lax.psum(n_loc, R)
            lo_f, ln_f, par_f, sd_f, fr_f, nl_f, packed = run(
                lo, ln, n_loc, n_glob, par, *rest)
            return lo_f, ln_f, par_f, sd_f, fr_f, nl_f[None], packed
        out_specs = (P(None, R), P(None, R), P(R), P(R), P(R), P(R), P())
    else:
        def local(lo, ln, ns, par, *rest):
            n_loc = ns[0]
            n_glob = jax.lax.psum(n_loc, R)
            lo_f, ln_f, par_f, sd_f, nl_f, packed = run(
                lo, ln, n_loc, n_glob, par, *rest)
            return lo_f, ln_f, par_f, sd_f, nl_f[None], packed
        out_specs = (P(None, R), P(None, R), P(R), P(R), P(R), P())

    pool_s, vec_s, rep = P(None, R), P(R), P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(pool_s, pool_s, vec_s, vec_s) + (rep,) * len(scalars),
        out_specs=out_specs,
        check_vma=False)
    # returns (lows, lengths, parent_est, sdim[, frac], ns, packed):
    # pools/parents/sdim/frac keep the region-axis sharding, ns is the
    # (D,) per-shard count
    return fn(lows, lengths, n, parent_est, *scalars)


@functools.partial(jax.jit, static_argnames=(
    "f", "ndim", "ncomp", "dtype_name", "chunk_size",
    "relerr_classification", "gate", "feval", "mesh"))
def fused_adaptive_phase_vector(
    f,
    ndim: int,
    ncomp: int,
    dtype_name: str,
    chunk_size,               # static int or None (single-shot eval)
    relerr_classification: bool,
    gate: int,
    feval: int,
    lows, lengths,            # (ndim, cap) BLOCKED pool (post-split layout)
    n,                        # int32: region count (mesh: (D,) per-shard)
    parent_est,               # (ncomp, cap//2) compacted parent estimates
    global_lo, global_range,
    epsrel_pool,              # pool-dtype epsrel (two-level classification)
    epsrel, epsabs,           # f64 ledger tolerances
    cum_est, cum_err,         # (ncomp,) f64 cumulative finished ledger
    result_nregions,          # f64 scalar
    iters_done,               # int32
    neval,                    # f64 scalar
    est_hist,                 # (3,) f64: worst-component cumulative ests
    max_iters,                # int32
    abs_per_vol=None,
    neval_cap=None,
    *,
    mesh=None,
):
    """Vector twin of ``fused_adaptive_phase`` (XLA backend only -- the
    Pallas exclusion is documented on Workspace.integrate).  Same exit
    protocol; the per-region pipeline is workspace.iteration_math_vector
    (the SAME traced code as the host vector loop), the accuracy test is
    all-components, the error-budget rollback fires when ANY component's
    banked error overflows max(epsrel*|est|, epsabs), and the estimate
    history tracks the WORST component (max relative error) for the host
    classifier.

    ``mesh`` (round 5): run the phase SPMD exactly like the scalar
    phase's mesh form -- shard-local eval/refine/compact/split on each
    device's BLOCKED sub-pool, (ncomp,) f64 iteration partials psum'd
    into replicated globals that drive every ledger/exit decision
    identically on all devices; a grow exit fires when ANY shard's split
    would overflow its local bucket.  Returns the per-shard count vector
    ``ns`` before ``packed`` in mesh mode.

    Returns (lows, lengths, parent_est, sdim[, ns], packed) with
    ``packed`` ONE f64 vector:

      [n, result_nregions, iters_done, neval, status,
       prev_nregions, prev_iters, prev_neval, est_hist(3),
       cum_est(ncomp), cum_err(ncomp),
       last_inflight_est(ncomp), last_inflight_err(ncomp),
       prev_est(ncomp), prev_err(ncomp)]
    """
    from gpuintegration_tpu.pagani.workspace import iteration_math_vector
    f64 = jnp.float64
    tables = rule_eval.rule_tables(ndim, dtype_name)
    zero_v = jnp.zeros((ncomp,), f64)
    cap_nev = (jnp.asarray(jnp.inf, f64) if neval_cap is None
               else jnp.asarray(neval_cap, f64))

    if mesh is not None:
        from gpuintegration_tpu.parallel.mesh import REGION_AXIS
        ps = functools.partial(jax.lax.psum, axis_name=REGION_AXIS)
    else:
        ps = lambda x: x  # noqa: E731 - single-chip: psum is identity

    def run(lows, lengths, n_loc0, n_glob0, parent_est,
            global_lo, global_range, epsrel_pool, epsrel, epsabs,
            cum_est, cum_err, result_nregions, iters_done, neval,
            est_hist, max_iters, abs_per_vol, cap_nev):
        cap = lows.shape[1]       # per-shard capacity in mesh mode
        if parent_est.shape[1] < cap:
            parent_est = jnp.pad(
                parent_est, ((0, 0), (0, cap - parent_est.shape[1])))

        def eval_pool(lo_c, ln_c, n_loc):
            return rule_eval.apply_rule(
                f, tables, lo_c, ln_c, global_lo, global_range,
                chunk_size=chunk_size, n=n_loc, blocked=True, ncomp=ncomp)

        def cond(carry):
            n_g, iters_c, nev_c, status_c = (carry[3], carry[8],
                                             carry[9], carry[11])
            return ((status_c == -1)
                    & (2 * n_g <= gate)
                    & (iters_c < max_iters)
                    & (nev_c < cap_nev))

        def body(carry):
            (lo_c, ln_c, n_loc, n_glob, par_c, cum_e, cum_r, res_nreg,
             iters_c, nev, hist, _status, _lie, _lir,
             _pe, _pr, _pn, _pi, _pv, _sd) = carry

            est_raw, err_raw, sdim = eval_pool(lo_c, ln_c, n_loc)
            (est, refined, active, iter_est_d, iter_err_d, fin_est_d,
             fin_err_d, n_active_d) = iteration_math_vector(
                relerr_classification, True, est_raw, err_raw, n_loc,
                par_c, jnp.asarray(True), epsrel_pool,
                lengths=None if abs_per_vol is None else ln_c,
                abs_per_vol=abs_per_vol)
            # (ncomp,) f64 partials -> psum'd replicated globals (mesh)
            iter_est = ps(iter_est_d.astype(f64))
            iter_err = ps(iter_err_d.astype(f64))
            fin_est = ps(fin_est_d.astype(f64))
            fin_err = ps(fin_err_d.astype(f64))

            tot_est = cum_e + iter_est
            tot_err = cum_r + iter_err
            # all-components accuracy (host all_accuracy)
            comp_ok = jnp.where(
                jnp.abs(tot_est) > 0,
                (tot_err / jnp.abs(tot_est) <= epsrel)
                | (tot_err <= epsabs),
                tot_err <= epsabs)
            done = jnp.all(comp_ok)

            # any-component rollback (worst-component generalisation of
            # Workspace.cuh:121-146, budget max(epsrel*|est|, epsabs)) --
            # a GLOBAL decision applied to every shard's flags
            overflow = jnp.any(
                (cum_r + fin_err) > jnp.maximum(
                    jnp.abs(tot_est) * epsrel, epsabs))
            mask = region_pool.block_mask(cap, n_loc, True)
            all_act = jnp.where(mask, 1.0, 0.0).astype(est.dtype)
            active = jnp.where(overflow, all_act, active)
            fin_est = jnp.where(overflow, zero_v, fin_est)
            fin_err = jnp.where(overflow, zero_v, fin_err)
            n_active_loc = jnp.where(overflow, n_loc,
                                     n_active_d.astype(jnp.int32))
            n_active_glob = ps(n_active_loc)

            all_fin = (~done) & (n_active_glob == 0)
            # grow when ANY shard's split would overflow its local bucket
            grow_any = ps((2 * n_active_loc > cap).astype(jnp.int32)) > 0
            grow = (~done) & (~all_fin) & grow_any

            n_act_d, c_lo, c_ln, c_sd, par_new, _ = region_pool.compact(
                active, lo_c, ln_c, sdim, est, refined, out_capacity=cap)
            lo2, ln2, _ = region_pool.split(
                c_lo[:, :cap // 2], c_ln[:, :cap // 2], c_sd[:cap // 2],
                n_act_d, out_capacity=cap)

            add_est = jnp.where(done, iter_est, fin_est)
            add_err = jnp.where(done, iter_err, fin_err)
            drop = jnp.where(
                done, 0.0,
                jnp.where(all_fin, n_glob.astype(f64),
                          (n_glob - n_active_glob).astype(f64)))

            keep = done | all_fin
            lo_out = jnp.where(keep, lo_c, jnp.where(grow, c_lo, lo2))
            ln_out = jnp.where(keep, ln_c, jnp.where(grow, c_ln, ln2))
            par_out = jnp.where(keep, par_c, par_new)
            n_out_loc = jnp.where(keep, n_loc,
                                  jnp.where(grow, n_active_loc,
                                            2 * n_active_loc))
            n_out_glob = jnp.where(keep, n_glob,
                                   jnp.where(grow, n_active_glob,
                                             2 * n_active_glob))
            status = jnp.where(
                done, 0,
                jnp.where(all_fin, 2,
                          jnp.where(grow, 1, -1))).astype(jnp.int32)

            # worst component drives the classifier's estimate history
            w = jnp.argmax(tot_err / jnp.maximum(jnp.abs(tot_est), 1e-300))
            hist_out = jnp.where(
                ~done, jnp.concatenate([hist[1:], tot_est[w][None]]), hist)
            return (lo_out, ln_out, n_out_loc, n_out_glob, par_out,
                    cum_e + add_est, cum_r + add_err, res_nreg + drop,
                    iters_c + 1, nev + n_glob.astype(f64) * feval,
                    hist_out, status,
                    iter_est - fin_est, iter_err - fin_err,
                    cum_e, cum_r, res_nreg, iters_c, nev, c_sd)

        carry0 = (lows, lengths, n_loc0, n_glob0, parent_est,
                  cum_est, cum_err, result_nregions,
                  iters_done, neval, est_hist, jnp.asarray(-1, jnp.int32),
                  zero_v, zero_v,
                  cum_est, cum_err, result_nregions, iters_done, neval,
                  jnp.zeros((cap,), jnp.int32))
        (lo_f, ln_f, nl_f, ng_f, par_f, ce_f, cr_f, rn_f, it_f, nev_f,
         hist_f, st_f, lie_f, lir_f, pe_f, pr_f, pn_f, pi_f, pv_f,
         sd_f) = jax.lax.while_loop(cond, body, carry0)
        packed = jnp.concatenate([
            jnp.stack([ng_f.astype(f64), rn_f, it_f.astype(f64), nev_f,
                       st_f.astype(f64), pn_f, pi_f.astype(f64), pv_f]),
            hist_f, ce_f, cr_f, lie_f, lir_f, pe_f, pr_f])
        return lo_f, ln_f, par_f, sd_f, nl_f, packed

    scalars = (global_lo, global_range, epsrel_pool, epsrel, epsabs,
               cum_est, cum_err, result_nregions, iters_done, neval,
               est_hist, max_iters, abs_per_vol, cap_nev)
    if mesh is None:
        lo_f, ln_f, par_f, sd_f, _nl, packed = run(
            lows, lengths, n, n, parent_est, *scalars)
        return lo_f, ln_f, par_f, sd_f, packed

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from gpuintegration_tpu.parallel.mesh import REGION_AXIS
    R = REGION_AXIS

    def local(lo, ln, ns, par, *rest):
        n_loc = ns[0]
        n_glob = jax.lax.psum(n_loc, R)
        lo_f, ln_f, par_f, sd_f, nl_f, packed = run(
            lo, ln, n_loc, n_glob, par, *rest)
        return lo_f, ln_f, par_f, sd_f, nl_f[None], packed

    pool_s, vec_s, rep = P(None, R), P(R), P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(pool_s, pool_s, vec_s, pool_s) + (rep,) * len(scalars),
        out_specs=(pool_s, pool_s, pool_s, vec_s, vec_s, rep),
        check_vma=False)
    # (lows, lengths, parent_est, sdim, ns, packed): pools + the (ncomp,
    # D*cap_s) parents keep the region-axis sharding on their last axis
    return fn(lows, lengths, n, parent_est, *scalars)
