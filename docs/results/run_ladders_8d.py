"""8D (and 10D) deep-tolerance epsrel ladders on real TPU hardware.

The reference's ladder apparatus runs 8D Genz members down to epsrel
1e-9 (reference: cuda/pagani/demos/new_time_and_call.cuh:129-245); a
single PAGANI run cannot certify deep tolerances at 8D inside the
16M-region pool budget, so every rung here drives
``Workspace.integrate_to_convergence`` -- checkpoint-resume continuation
rounds that restart the two-level error inflation on the surviving pool.
The ladder floor therefore characterizes where 8D f64 honestly walls
(no-progress guard) rather than where a single pool fills up.

Usage:  python docs/results/run_ladders_8d.py [case ...]
With case names (e.g. ``f5_c0_8d f6_discontinuous_8d``) only those cases
run and rows are APPENDED to the CSV; with no arguments every case runs
and the CSV is rewritten.  Runtime: tens of minutes per case (deep rungs
run multiple continuation rounds of ~1e10 evals each).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("GPUINT_TPU_CONTINUATION_LOG", "1")

from gpuintegration_tpu import Workspace               # noqa: E402
from gpuintegration_tpu.models import genz             # noqa: E402
from gpuintegration_tpu.utils import timing            # noqa: E402


def main(out_path=None, only=()):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "pagani_ladders_8d.csv")
    cases = [
        ("f4_gaussian_8d", genz.f4_gaussian(8), 8, 1e-9),
        ("f3_corner_peak_8d", genz.f3_corner_peak(8), 8, 1e-9),
        ("f2_product_peak_8d", genz.f2_product_peak(8), 8, 1e-9),
        ("f1_oscillatory_8d", genz.f1_oscillatory(8), 8, 1e-9),
        # F5 is C0 at the peak (|x-b| kink through the domain interior):
        # the Genz-Malik rule's smoothness assumption fails on kink-
        # crossing regions, so the floor characterizes honest non-smooth
        # behavior, not a budget artifact.  F6 is discontinuous -- the
        # hardest case for deterministic cubature (reference runs it
        # through mcubes, c_zero_funcs.cu / discontinuous.cu).
        ("f5_c0_8d", genz.f5_c0_continuous(8), 8, 1e-9),
        ("f6_discontinuous_8d", genz.f6_discontinuous(8), 8, 1e-9),
        ("f4_gaussian_10d", genz.f4_gaussian(10, a=5.0), 10, 1e-9),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]
        missing = set(only) - {c[0] for c in cases}
        if missing:
            raise SystemExit(f"unknown case(s): {sorted(missing)}")
    # decade rungs with a hard per-case wall budget: an 8D rung is a full
    # wall + partitioned-continuation run (~12 min at 1e-3), so the
    # reference's /5 ladder protocol (new_time_and_call.cuh) is
    # compressed to /10 steps and each case stops -- honestly, recorded
    # as its floor -- when its budget is spent.
    case_budget_s = 2400.0
    mode = "a" if only else "w"
    need_header = mode == "w" or not os.path.exists(out_path) \
        or os.path.getsize(out_path) == 0
    with open(out_path, mode) as fh:
        if need_header:
            print(timing.PAGANI_CSV_HEADER, file=fh, flush=True)
        for name, g, ndim, floor in cases:
            ws = Workspace(ndim)
            # integer rung exponents: repeated `epsrel /= 10` drifts
            # (1.0000000000000002e-06 > 1e-6 defeats the `scaled` gate at
            # exactly the rung that needs it)
            exp, achieved = 3, float("inf")
            floor_exp = round(-math.log10(floor))
            t_case = time.time()
            while exp <= floor_exp:
                epsrel = float(f"1e-{exp}")
                left = case_budget_s - (time.time() - t_case)
                if left <= 60.0:
                    print(f"# {name}: case budget spent", file=sys.stderr,
                          flush=True)
                    break
                t0 = time.time()
                # rungs at/below 1e-6: retire regions at 0.4*epsrel so
                # the banked finished-error mass cannot consume the whole
                # certificate budget (retirement marginality,
                # docs/DESIGN.md section 3a); shallower rungs don't need
                # the extra refinement work.  (The dynamic slice targets
                # for cancelling integrands are built into the
                # continuation and need no knob.)
                scaled = exp >= 6
                extra = {"finish_epsrel_scale": 0.4} if scaled else {}
                good = timing.clean_time_and_call(
                    name, g, epsrel, g.true_value, fh, ndim=ndim,
                    runs_per_epsrel=1, workspace=ws, continuation=True,
                    max_wall_s=min(900.0, left), **extra)
                print(f"# {name} eps={epsrel:.3e} good={good} "
                      f"wall={time.time() - t0:.0f}s",
                      file=sys.stderr, flush=True)
                if not good and not scaled:
                    # retry the rung once with tighter retirement before
                    # declaring the floor -- the f1 1e-5 rung needs it
                    # (marginality sits at the main-phase bank there)
                    left = case_budget_s - (time.time() - t_case)
                    if left > 60.0:
                        print(f"# {name} eps={epsrel:.3e} retry s=0.4",
                              file=sys.stderr, flush=True)
                        good = timing.clean_time_and_call(
                            name, g, epsrel, g.true_value, fh, ndim=ndim,
                            runs_per_epsrel=1, workspace=ws,
                            continuation=True,
                            max_wall_s=min(900.0, left),
                            finish_epsrel_scale=0.4)
                if not good:
                    break
                achieved = epsrel
                exp += 1
            print(f"# {name}: achieved epsrel {achieved}", file=fh,
                  flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(only=tuple(sys.argv[1:]))
