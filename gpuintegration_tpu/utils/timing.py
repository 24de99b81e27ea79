"""Demo/benchmark harnesses with the reference's CSV output schemas.

Re-expression of the reference's harness layer
(reference: cuda/pagani/demos/new_time_and_call.cuh:129-245
clean_time_and_call -- CSV row per run:
id, ndim, use_custom, true_value, epsrel, epsabs, estimate, errorest,
nregions, nFinishedRegions, iters, status, time;
cuda/mcubes/demos/demo_utils.cuh:50-100 mcubes_time_and_call;
new_time_and_call.cuh:30-70 call_cubature_rules throughput probe).
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from gpuintegration_tpu.integrand import make_integrand
from gpuintegration_tpu.mcubes import vegas as vegas_mod
from gpuintegration_tpu.ops import rule_eval
from gpuintegration_tpu.pagani import region_pool
from gpuintegration_tpu.pagani.workspace import Workspace
from gpuintegration_tpu.types import Volume

PAGANI_CSV_HEADER = ("id,ndim,backend,true_value,epsrel,epsabs,estimate,"
                     "errorest,nregions,nFinishedRegions,iters,status,time_ms")
MCUBES_CSV_HEADER = ("id,ndim,backend,true_value,epsrel,epsabs,estimate,"
                     "errorest,chi_sq,iters,status,time_ms")


def clean_time_and_call(
    id: str,
    integrand: Callable,
    epsrel: float,
    true_value: float,
    outfile=None,
    *,
    ndim: int | None = None,
    vol: Volume | None = None,
    epsabs: float = 1e-40,
    runs_per_epsrel: int = 10,
    relerr_classification: bool = True,
    workspace: Workspace | None = None,
    continuation: bool = False,
    max_wall_s: float | None = None,
    **integrate_kw,
) -> bool:
    """Repeated adaptive runs at one tolerance; CSV row per run.

    ``continuation=True`` drives ``Workspace.integrate_to_convergence``
    (checkpoint-resume rounds past the pool wall) instead of a single
    ``integrate`` -- the mechanism deep-tolerance ladders (8D at 1e-5
    and below) need; the reference's single-run harness has no analogue.
    ``max_wall_s`` bounds each continuation run (unattended ladders).

    Returns True if any run converged (status 0) -- same contract as the
    reference harness (new_time_and_call.cuh:170-173).  Extra keyword
    arguments (e.g. ``finish_epsrel_scale`` for deep rungs) are forwarded
    to the drive function."""
    _, nd = make_integrand(integrand, ndim)
    ws = workspace or Workspace(nd)
    drive = ws.integrate_to_convergence if continuation else ws.integrate
    extra = dict(integrate_kw)
    if continuation:
        extra["max_wall_s"] = max_wall_s
    good = False
    for i in range(runs_per_epsrel):
        t0 = time.perf_counter()
        res = drive(integrand, epsrel, epsabs, vol,
                    relerr_classification=relerr_classification, **extra)
        dt_ms = (time.perf_counter() - t0) * 1e3
        if res.status == 0:
            good = True
        row = (f"{id},{nd},xla,{true_value:.15e},{epsrel:.15e},"
               f"{epsabs:.15e},{res.estimate:.15e},{res.errorest:.15e},"
               f"{res.nregions},{res.nFinishedRegions},{res.iters},"
               f"{res.status},{dt_ms}")
        if outfile is not None:
            print(row, file=outfile, flush=True)  # rung results survive
            # an interrupted unattended ladder
    return good


def epsrel_ladder(
    id: str,
    integrand: Callable,
    true_value: float,
    outfile=None,
    *,
    start: float = 1e-3,
    floor: float = 1e-9,
    ndim: int | None = None,
    runs_per_epsrel: int = 2,
    **kw,
) -> float | None:
    """Tighten epsrel by 5x until failure or the floor; returns the last
    tolerance achieved, or None when even the first rung failed (the
    reference demos' epsrel ladder pattern, e.g.
    cuda/pagani/demos/new_interface_Genz3_3D.cu)."""
    epsrel = start
    achieved = None          # no rung achieved yet (never report inf)
    while epsrel >= floor:
        good = clean_time_and_call(
            id, integrand, epsrel, true_value, outfile, ndim=ndim,
            runs_per_epsrel=runs_per_epsrel, **kw)
        if not good:
            break
        achieved = epsrel
        epsrel /= 5.0
    return achieved


def mcubes_time_and_call(
    id: str,
    integrand: Callable,
    epsrel: float,
    true_value: float,
    outfile=None,
    *,
    ndim: int | None = None,
    ncall: float = 1e6,
    vol: Volume | None = None,
    epsabs: float = 1e-40,
    total_iters: int = 15,
    adjust_iters: int = 15,
    skip_iters: int = 5,
    runs: int = 1,
    seed: int = 0,
    **vegas_kw,
) -> bool:
    """VEGAS harness with CSV rows (demo_utils.cuh:50-100 schema).
    Extra keyword args (importance=, eval_dtype=, ...) pass through to
    mcubes.vegas.integrate."""
    _, nd = make_integrand(integrand, ndim)
    vegas_kw = {k: v for k, v in vegas_kw.items() if v is not None}
    good = False
    for i in range(runs):
        t0 = time.perf_counter()
        res = vegas_mod.integrate(
            integrand, epsrel, epsabs, ncall, vol, total_iters=total_iters,
            adjust_iters=adjust_iters, skip_iters=skip_iters,
            seed=seed + i, ndim=ndim, **vegas_kw)
        dt_ms = (time.perf_counter() - t0) * 1e3
        if res.status == 0:
            good = True
        row = (f"{id},{nd},xla,{true_value:.15e},{epsrel:.15e},"
               f"{epsabs:.15e},{res.estimate:.15e},{res.errorest:.15e},"
               f"{res.chi_sq:.5f},{res.iters},{res.status},{dt_ms}")
        if outfile is not None:
            print(row, file=outfile, flush=True)  # survive interrupts
    return good


def call_cubature_rules(
    integrand: Callable,
    ndim: int,
    *,
    splits_per_dim: Sequence[int] = range(5, 16),
    max_regions: int = 35_000_000,
    repeats: int = 11,
    chunk: int = 8192,
    dtype: str = "float64",
    backend: str = "xla",
    outfile=None,
):
    """Pure rule-kernel throughput probe: sweep initial uniform splits and
    time rule application over the resulting pools
    (reference: new_time_and_call.cuh:30-70 -- splits 5..15, <= 35e6
    regions, 11 repeats).  Returns list of dicts with evals/sec.
    ``backend='pallas'`` times the f32 VMEM-fused Mosaic kernel instead
    of the XLA rule path (needs a scalar-per-axis integrand).

    The ``repeats`` passes run INSIDE one jit with a carried data
    dependency between passes (the bench.py methodology) -- the axon
    runtime elides repeated identical top-level dispatches, so a host-side
    repeat loop would time dispatch overhead, not the kernel (CLAUDE.md)."""
    if backend == "pallas":
        from gpuintegration_tpu.ops.pallas_rule import pallas_apply_rule
        if dtype != "float32":
            raise ValueError("the Pallas rule backend is f32-only")

        def eval_rule(f_axes, tables, lo_c, lengths, gl, gr, chunk_size,
                      n=None):
            return pallas_apply_rule(f_axes, ndim, lo_c, lengths, gl, gr)
    else:
        def eval_rule(f_axes, tables, lo_c, lengths, gl, gr, chunk_size,
                      n=None):
            return rule_eval.apply_rule(
                f_axes, tables, lo_c, lengths, gl, gr,
                chunk_size=chunk_size, n=n)
    f, _ = make_integrand(integrand, ndim)
    if backend == "pallas":
        f = integrand   # scalar-per-axis callable goes to Mosaic directly
    tables = rule_eval.rule_tables(ndim, dtype)
    feval = tables.feval
    dt = jnp.dtype(dtype)
    gl = jnp.zeros(ndim, dt)
    gr = jnp.ones(ndim, dt)
    results = []
    for s in splits_per_dim:
        n_regions = s ** ndim
        if n_regions > max_regions:
            continue
        # minimal padding (next pow2, floored at the Pallas tile of 128):
        # flooring at the chunk size inflated unchunked pools up to 65x
        # while the rate credited only real regions -- rows across the
        # chunked/unchunked boundary were not comparable
        cap = max(region_pool.next_pow2(n_regions), 128)
        lows, lengths, _ = region_pool.uniform_split(ndim, s, cap, dt)
        chunk_size = chunk if cap > chunk else None

        # dynamic-trip n: chunked sweeps skip all-padding chunks, so the
        # measured work tracks the s^ndim REAL regions (the reference's
        # probe has no padding at all, new_time_and_call.cuh:30-70)
        n_dev = (jnp.asarray(n_regions, jnp.int32)
                 if (chunk_size and backend != "pallas") else None)

        @jax.jit
        def loop(lo0, lengths=lengths, chunk_size=chunk_size, n_dev=n_dev):
            def body(i, carry):
                lo_c, acc = carry
                est, _, _ = eval_rule(f, tables, lo_c, lengths, gl, gr,
                                      chunk_size, n=n_dev)
                total = jnp.sum(est)
                # carried dependency defeats launch memoisation/overlap
                return (lo_c + total * 1e-30, acc + total)
            return jax.lax.fori_loop(0, repeats, body,
                                     (lo0, jnp.zeros((), dt)))

        jax.block_until_ready(loop(lows))  # compile + warm
        best = float("inf")
        for i in range(3):
            lo_i = lows + i * jnp.asarray(1e-30, dt)  # distinct dispatches
            t0 = time.perf_counter()
            jax.block_until_ready(loop(lo_i))
            best = min(best, (time.perf_counter() - t0) / repeats)
        # throughput counts REAL regions: padded-slot evaluations are
        # this design's overhead, not useful work (the old accounting
        # reported the padded capacity as 'regions' -- 65x off at 3D
        # splits=5 -- and inflated rates up to 1.25x vs the reference's
        # unpadded probe)
        evals = n_regions * feval
        rec = {"splits_per_dim": s, "regions": n_regions,
               "padded_capacity": cap, "feval": feval,
               "best_s": best, "evals_per_sec": evals / best}
        results.append(rec)
        if outfile is not None:
            print(f"{s},{n_regions},{cap},{feval},{best},{evals / best}",
                  file=outfile, flush=True)
    return results
