"""10D mcubes VEGAS ladders: completing the hybrid-thesis pairing
(round 4, VERDICT r3 #9).

At 8D the PAGANI+mcubes pairing splits the suite: MC owns the peaked
f2 (1e-5 vs PAGANI's 1e-4) and holds the only statistical handle on
the discontinuous f6 (docs/VALIDATION.md 2c).  This runs the same
truth-gated decade protocol (status 0 AND the estimate true to the
closed form within the rung -- a statistical method can land lucky)
at 10D for f2 and f5, the members MC owns at 8D, so every 10D member
has a certification path from one of the two methods -- the
reference's own PAGANI+mcubes thesis (cuda/pagani/demos/hybrid.cu,
mcubes demos protocol demo_utils.cuh:50-100) at the dimension that
stresses it.  f1/f6 10D rows are included for the honest-floor record
(both are walls for PAGANI at 10D).

Usage:  python docs/results/run_mcubes_ladder_10d.py [case ...]
Appends to mcubes_ladders_10d.csv with case args, rewrites otherwise.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gpuintegration_tpu.models import genz              # noqa: E402
from gpuintegration_tpu.utils import timing             # noqa: E402


def main(out_path=None, only=()):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "mcubes_ladders_10d.csv")
    cases = [
        ("f2_product_peak_10d", genz.f2_product_peak(10)),
        ("f5_c0_10d", genz.f5_c0_continuous(10)),
        ("f1_oscillatory_10d", genz.f1_oscillatory(10)),
        ("f6_discontinuous_10d", genz.f6_discontinuous(10)),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]
        missing = set(only) - {c[0] for c in cases}
        if missing:
            raise SystemExit(f"unknown case(s): {sorted(missing)}")
    case_budget_s = 480.0
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
                # MC error ~ 1/sqrt(n): each decade costs ~100x calls,
                # capped at 1e9/iteration (the validated 9D regime)
                ncall = min(1e8 * 100.0 ** (exp - 3), 1e9)
                good = timing.mcubes_time_and_call(
                    name, g, epsrel, g.true_value, fh, ndim=10,
                    ncall=ncall, total_iters=15, adjust_iters=10,
                    skip_iters=5, runs=1, seed=23 + exp)
                # truth gate (docs/VALIDATION.md 2c)
                if good:
                    with open(out_path) as rf:
                        last = [ln for ln in rf
                                if ln.startswith(name)][-1]
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
