"""Command-line demo/profile driver.

One CLI replaces the reference's ~90 single-integrand executables
(reference: cuda/{pagani,mcubes}/{demos,profile}/*.cu): pick the
integrand, dimension, algorithm, and tolerance from arguments.

Examples:
  python -m gpuintegration_tpu.cli pagani --integrand f4_gaussian --ndim 8 \
      --epsrel 1e-6
  python -m gpuintegration_tpu.cli mcubes --integrand gauss9d --ncall 1e8
  python -m gpuintegration_tpu.cli suave --integrand f2_product_peak --ndim 5
  python -m gpuintegration_tpu.cli ladder --integrand f2_product_peak --ndim 6
  python -m gpuintegration_tpu.cli profile --integrand f1_oscillatory --ndim 8
"""
from __future__ import annotations

import argparse
import sys

from gpuintegration_tpu.models import genz, misc
from gpuintegration_tpu.types import Volume
from gpuintegration_tpu.utils import timing


def _resolve_integrand(name: str, ndim: int):
    """Returns (integrand, ndim, true_value, volume-or-None)."""
    factories = {
        "f1_oscillatory": genz.f1_oscillatory,
        "f2_product_peak": genz.f2_product_peak,
        "f3_corner_peak": genz.f3_corner_peak,
        "f4_gaussian": genz.f4_gaussian,
        "f5_c0": genz.f5_c0_continuous,
        "f6_discontinuous": genz.f6_discontinuous,
        "g_function": misc.g_function,
        "sin_sum": misc.sin_sum,
        "addition": misc.addition,
        "oscillatory": misc.oscillatory,
    }
    fixed_dim = {
        "abs_cos_sum_5d": lambda: (misc.abs_cos_sum_5d(), None),
        "genz_1abs_5d": lambda: (misc.abs_cos_sum_5d(normalized=True), None),
        "cos_sum_plus1_5d": lambda: (misc.cos_sum_plus1_5d(), None),
        "fun6": lambda: (misc.fun6(), None),
        "xyz": lambda: (misc.xyz(), None),
        "diagonal_ridge_2d": lambda: misc.diagonal_ridge_2d(),
        "gauss9d": lambda: misc.gauss9d(),
    }
    if name in fixed_dim:
        g, vol = fixed_dim[name]()
        return g, g.ndim, g.true_value, vol
    if name.startswith("box_"):
        # box_<s> e.g. box_5
        s = float(name.split("_")[1])
        b = misc.box_integral(ndim, s)
        return b, ndim, b.true_value, None
    if name not in factories:
        raise SystemExit(
            f"unknown integrand {name!r}; choices: "
            f"{sorted(factories) + sorted(fixed_dim) + ['box_<s>']}")
    g = factories[name](ndim)
    return g, g.ndim, g.true_value, None


def main(argv=None):
    p = argparse.ArgumentParser(prog="gpuintegration_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--integrand", default="f4_gaussian")
    common.add_argument("--ndim", type=int, default=5)
    common.add_argument("--epsrel", type=float, default=1e-3)
    common.add_argument("--epsabs", type=float, default=1e-40)
    common.add_argument("--runs", type=int, default=1)

    sp = sub.add_parser("pagani", parents=[common],
                        help="adaptive cubature (clean_time_and_call analogue)")
    sp.add_argument("--continuation", action="store_true",
                    help="drive integrate_to_convergence (checkpoint-"
                         "resume + partitioned continuation past the "
                         "pool wall -- deep-tolerance runs)")
    sp.add_argument("--max-wall-s", type=float, default=None,
                    help="wall-clock bound per continuation run")
    sp.add_argument("--finish-scale", type=float, default=1.0,
                    help="retire regions at epsrel*SCALE while certifying "
                         "at epsrel (reserves error-budget headroom for "
                         "deep rungs; see Workspace.integrate)")
    sp.add_argument("--finish-abs-per-vol", type=float, default=0.0,
                    help="also retire a region once its error is below "
                         "VALUE*vol_region (volume-apportioned absolute "
                         "term -- gives zero-crossing regions of "
                         "oscillatory integrands a sound exit; banked "
                         "total is bounded by VALUE)")
    sp.add_argument("--crease-split", action="store_true",
                    help="crease/jump-aware splitting: locate off-grid "
                         "C0 kinks and step discontinuities from the "
                         "rule's collinear samples and cut next to them "
                         "with a sound margin (jumps also split normal "
                         "to the surface; DESIGN.md 3a-ii/iii)")
    sp = sub.add_parser("mcubes", parents=[common],
                        help="VEGAS Monte Carlo (mcubes_time_and_call analogue)")
    sp.add_argument("--ncall", type=float, default=1e6)
    sp.add_argument("--iters", type=int, default=15)
    sp.add_argument("--adjust-iters", type=int, default=15)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--importance", choices=["auto", "grid", "poly"],
                    default="auto", help="importance map: auto picks the "
                    "TPU-native polynomial inverse-CDF (~2x the grid "
                    "path's throughput) unless --refine device needs the "
                    "grid; grid = reference-parity table lookup")
    sp.add_argument("--refine", choices=["host", "device"], default="host",
                    help="grid refinement: exact-f64 host NumPy (reference "
                    "parity) or fused on-device f32 (one dispatch for the "
                    "whole adjustment phase)")
    sp.add_argument("--eval-dtype", choices=["float32", "float64"],
                    default=None, help="integrand evaluation dtype "
                    "(accumulators stay f64; float32 skips TPU f64 "
                    "emulation in the integrand)")
    sp = sub.add_parser("suave", parents=[common],
                        help="Suave subregion-adaptive importance MC "
                             "(cubacpp suave.hh analogue)")
    sp.add_argument("--nnew", type=int, default=2048,
                    help="fresh samples per region per pass")
    sp.add_argument("--nmin", type=int, default=2,
                    help="sampling passes per cycle (reuse granularity)")
    sp.add_argument("--flatness", type=float, default=50.0,
                    help="fluctuation-norm exponent (capped at 16)")
    sp.add_argument("--max-regions", type=int, default=1024)
    sp.add_argument("--seed", type=int, default=0)
    sp = sub.add_parser("ladder", parents=[common],
                        help="tighten epsrel until failure")
    sp.add_argument("--floor", type=float, default=1e-9)
    sp = sub.add_parser(
        "scan", help="vmapped parameter scan (+ optional d/dtheta) on a "
                     "frozen mesh -- one batched dispatch per scan "
                     "(diff.fixed_mesh_integral; the reference re-runs "
                     "demo executables per parameter)")
    sp.add_argument("--integrand", default="f4_gaussian",
                    choices=["f4_gaussian", "f2_product_peak", "f5_c0"])
    sp.add_argument("--ndim", type=int, default=5)
    sp.add_argument("--values", default="1:9:17",
                    help="theta grid lo:hi:count (the family's 'a')")
    sp.add_argument("--partitions", type=int, default=4,
                    help="uniform mesh partitions per axis")
    sp.add_argument("--grad", action="store_true",
                    help="also print dI/da per row")

    # profile is a pure throughput probe: no tolerances, no --runs (its
    # repeat knob is --repeats) -- inheriting them silently ignored them
    sp = sub.add_parser("profile",
                        help="rule-kernel throughput sweep "
                             "(call_cubature_rules analogue)")
    sp.add_argument("--integrand", default="f4_gaussian")
    sp.add_argument("--ndim", type=int, default=5)
    sp.add_argument("--splits", default="5:16")
    sp.add_argument("--repeats", type=int, default=11)

    args = p.parse_args(argv)
    g, ndim, truth, vol = _resolve_integrand(args.integrand, args.ndim)

    if args.cmd == "pagani":
        print(timing.PAGANI_CSV_HEADER)
        extra = {}
        if args.finish_scale != 1.0:
            extra["finish_epsrel_scale"] = args.finish_scale
        if args.finish_abs_per_vol != 0.0:
            # pass negatives through so Workspace.integrate's validation
            # rejects them loudly instead of silently disabling the feature
            extra["finish_abs_per_vol"] = args.finish_abs_per_vol
        if args.crease_split:
            extra["crease_split"] = True
        good = timing.clean_time_and_call(
            args.integrand, g, args.epsrel, truth, sys.stdout,
            ndim=ndim, vol=vol, epsabs=args.epsabs,
            runs_per_epsrel=args.runs, continuation=args.continuation,
            max_wall_s=args.max_wall_s, **extra)
        return 0 if good else 1
    if args.cmd == "mcubes":
        print(timing.MCUBES_CSV_HEADER)
        good = timing.mcubes_time_and_call(
            args.integrand, g, args.epsrel, truth, sys.stdout,
            ndim=ndim, ncall=args.ncall, vol=vol, epsabs=args.epsabs,
            total_iters=args.iters, adjust_iters=args.adjust_iters,
            runs=args.runs, seed=args.seed,
            importance=(None if args.importance == "auto"
                        else args.importance),
            eval_dtype=args.eval_dtype, refine=args.refine)
        return 0 if good else 1
    if args.cmd == "suave":
        import time as _time
        from gpuintegration_tpu.pagani.suave import suave
        print("id,ndim,true_value,epsrel,epsabs,estimate,errorest,"
              "nregions,neval,iters,status,time_ms")
        good = False
        for i in range(args.runs):
            t0 = _time.perf_counter()
            r = suave(g, epsrel=args.epsrel, epsabs=args.epsabs, vol=vol,
                      ndim=ndim, nnew=args.nnew, nmin=args.nmin,
                      flatness=args.flatness, max_regions=args.max_regions,
                      seed=args.seed + i)
            ms = (_time.perf_counter() - t0) * 1e3
            good = good or r.status == 0
            print(f"{args.integrand},{ndim},{truth:.15e},"
                  f"{args.epsrel:.3e},{args.epsabs:.3e},"
                  f"{r.estimate:.15e},{r.errorest:.15e},{r.nregions},"
                  f"{r.neval},{r.iters},{r.status},{ms:.1f}", flush=True)
        return 0 if good else 1
    if args.cmd == "ladder":
        print(timing.PAGANI_CSV_HEADER)
        achieved = timing.epsrel_ladder(
            args.integrand, g, truth, sys.stdout, start=args.epsrel,
            floor=args.floor, ndim=ndim, runs_per_epsrel=args.runs,
            vol=vol, epsabs=args.epsabs)
        if achieved is None:
            print("# achieved epsrel: none (first rung failed)")
            return 1
        print(f"# achieved epsrel: {achieved}")
        return 0
    if args.cmd == "scan":
        import jax
        import jax.numpy as jnp
        from gpuintegration_tpu.diff import fixed_mesh_integral
        fams = {
            "f4_gaussian": lambda x, a: jnp.exp(
                -(a * a) * jnp.sum((x - 0.5) ** 2, axis=-1)),
            "f2_product_peak": lambda x, a: 1.0 / jnp.prod(
                1.0 / (a * a) + (x - 0.5) ** 2, axis=-1),
            "f5_c0": lambda x, a: jnp.exp(
                -a * jnp.sum(jnp.abs(x - 0.5), axis=-1)),
        }
        lo_s, hi_s, cnt_s = args.values.split(":")
        thetas = jnp.linspace(float(lo_s), float(hi_s), int(cnt_s))
        est_fn = fixed_mesh_integral(fams[args.integrand], args.ndim,
                                     partitions_per_axis=args.partitions)
        ests, errs = jax.vmap(est_fn)(thetas)    # whole scan: ONE dispatch
        grads = (jax.vmap(jax.grad(lambda a: est_fn(a)[0]))(thetas)
                 if args.grad else None)
        print("a,estimate,errorest" + (",dI_da" if args.grad else ""))
        for i in range(len(thetas)):
            row = (f"{float(thetas[i]):.6g},{float(ests[i]):.17e},"
                   f"{float(errs[i]):.3e}")
            if grads is not None:
                row += f",{float(grads[i]):.10e}"
            print(row, flush=True)
        return 0
    if args.cmd == "profile":
        lo, hi = (int(t) for t in args.splits.split(":"))
        print("splits_per_dim,regions,padded_capacity,feval,best_s,"
              "evals_per_sec")
        timing.call_cubature_rules(
            g, ndim, splits_per_dim=range(lo, hi), repeats=args.repeats,
            outfile=sys.stdout)
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
