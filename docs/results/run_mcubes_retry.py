"""Retry near-miss mcubes rungs with the heavier demo protocol.

The 15-iteration ladder (run_mcubes_ladder_8d.py) left three rungs
where the ESTIMATE was already true to the target but the reported
errorest sat just above the gate -- an iteration-count artifact, not a
method wall (the reference's demos run long schedules for exactly this
reason, cuda/mcubes/demos/demo_utils.cuh:50-100 loops to 100
iterations).  This retries those cases at 40 total / 20 adapting
iterations and, where a rung certifies, continues up the ladder under
the same honesty gate (status 0 AND estimate true within epsrel).

Usage:  python docs/results/run_mcubes_retry.py
Appends to mcubes_ladders_8d.csv (comment rows mark the protocol).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gpuintegration_tpu.models import genz              # noqa: E402
from gpuintegration_tpu.utils import timing             # noqa: E402


def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "mcubes_ladders_8d.csv")
    # (case, integrand, first exponent to retry)
    cases = [
        ("f3_corner_peak_8d", genz.f3_corner_peak(8), 3),
        ("f4_gaussian_8d", genz.f4_gaussian(8), 3),
        ("f6_discontinuous_8d", genz.f6_discontinuous(8), 4),
    ]
    case_budget_s = 700.0
    with open(out_path, "a") as fh:
        print("# retry protocol: total_iters=40 adjust_iters=20", file=fh,
              flush=True)
        for name, g, exp0 in cases:
            exp, achieved = exp0, None
            t_case = time.time()
            while exp <= 9:
                epsrel = float(f"1e-{exp}")
                if case_budget_s - (time.time() - t_case) <= 60.0:
                    print(f"# {name}: retry budget spent", file=sys.stderr,
                          flush=True)
                    break
                t0 = time.time()
                ncall = min(1e8 * 100.0 ** (exp - 3), 1e9)
                good = timing.mcubes_time_and_call(
                    name, g, epsrel, g.true_value, fh, ndim=8,
                    ncall=ncall, total_iters=40, adjust_iters=20,
                    skip_iters=5, runs=1, seed=211 + exp)
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
            print(f"# {name}: retry(40it) achieved epsrel "
                  f"{achieved if achieved is not None else 'none'}",
                  file=fh, flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
