"""8D Genz suite through mcubes VEGAS: epsrel ladder on real TPU.

The reference runs its mcubes demo battery (Gaussian / SinSum / c-zero /
discontinuous executables, reference: cuda/mcubes/demos/*.cu, protocol
mcubes_time_and_call in demo_utils.cuh:50-100) at epsrels from 1e-3,
ncall O(1e8-2e9), 15 iterations with 10 adapting.  This mirrors that
battery over the full 8D Genz suite, decade rungs while the run
certifies (status 0 AND the ESTIMATE is within epsrel of the closed
form -- a statistical method can report a lucky small error, so the
honest gate checks both), hard per-case wall budget.

Usage:  python docs/results/run_mcubes_ladder_8d.py [case ...]
Appends to mcubes_ladders_8d.csv with case args, rewrites otherwise.
Runtime: ~15-30 min cold.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gpuintegration_tpu.models import genz              # noqa: E402
from gpuintegration_tpu.utils import timing             # noqa: E402


def main(out_path=None, only=()):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "mcubes_ladders_8d.csv")
    cases = [
        ("f1_oscillatory_8d", genz.f1_oscillatory(8)),
        ("f2_product_peak_8d", genz.f2_product_peak(8)),
        ("f3_corner_peak_8d", genz.f3_corner_peak(8)),
        ("f4_gaussian_8d", genz.f4_gaussian(8)),
        ("f5_c0_8d", genz.f5_c0_continuous(8)),
        ("f6_discontinuous_8d", genz.f6_discontinuous(8)),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]
        missing = set(only) - {c[0] for c in cases}
        if missing:
            raise SystemExit(f"unknown case(s): {sorted(missing)}")
    case_budget_s = 420.0
    mode = "a" if only else "w"
    need_header = mode == "w" or not os.path.exists(out_path) \
        or os.path.getsize(out_path) == 0
    with open(out_path, mode) as fh:
        if need_header:
            print(timing.MCUBES_CSV_HEADER, file=fh, flush=True)
        for name, g in cases:
            exp, achieved = 3, float("inf")
            t_case = time.time()
            while exp <= 9:
                epsrel = float(f"1e-{exp}")
                if case_budget_s - (time.time() - t_case) <= 30.0:
                    print(f"# {name}: case budget spent", file=sys.stderr,
                          flush=True)
                    break
                t0 = time.time()
                # deeper rungs need more samples per iteration: MC error
                # scales 1/sqrt(n), so each decade of epsrel costs ~100x
                # calls -- cap at 1e9/iter (the validated 9D regime)
                ncall = min(1e8 * 100.0 ** (exp - 3), 1e9)
                good = timing.mcubes_time_and_call(
                    name, g, epsrel, g.true_value, fh, ndim=8,
                    ncall=ncall, total_iters=15, adjust_iters=10,
                    skip_iters=5, runs=1, seed=11 + exp)
                # statistical honesty: the reported certificate must also
                # be TRUE to the closed form within the rung
                est = None
                if good:
                    with open(out_path) as rf:
                        last = [l for l in rf if l.startswith(name)][-1]
                    est = float(last.split(",")[6])
                    good = (abs(est - g.true_value)
                            <= epsrel * abs(g.true_value))
                print(f"# {name} eps={epsrel:.0e} ncall={ncall:.0e} "
                      f"good={good} wall={time.time() - t0:.0f}s",
                      file=sys.stderr, flush=True)
                if not good:
                    break
                achieved = epsrel
                exp += 1
            print(f"# {name}: achieved epsrel {achieved}", file=fh,
                  flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(only=tuple(sys.argv[1:]))
