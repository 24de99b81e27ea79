"""Retry near-miss mcubes rungs with the heavier demo protocols.

The 15-iteration ladder (run_mcubes_ladder_8d.py) left rungs where the
ESTIMATE was already true to the target but the reported errorest sat
above the gate.  Two escalations, mirroring the reference:

1. 40 total / 20 adapting iterations (its demos loop long schedules,
   cuda/mcubes/demos/demo_utils.cuh:50-100), continuing up the ladder
   under the same honesty gate (status 0 AND estimate true within
   epsrel) while a rung certifies.
2. For first-rung misses, AdjustParams-parity ncall escalation to 1e9
   (vegas_utils.cuh:272-296: ncall x10 per retry).

Outcome (2026-08-19, recorded in mcubes_ladders_8d.csv): all retries
MISS honestly -- f6's 15-iteration near-truth 1e-4 estimate was seed
luck (the 40-iteration run lands 2.6e-4 off), and f3/f4's errorest stays
above the gate at both 1e8 and 1e9 calls (narrow-peak adaptation limit).
The VEGAS floors in docs/VALIDATION.md section 2c reflect this; PAGANI
owns those cases.  These 1e9x40 runs are also what exposed the remote
runtime's single-dispatch ceiling (DESIGN.md section 3b).

Usage:  python docs/results/run_mcubes_retry.py
Appends to mcubes_ladders_8d.csv (comment rows mark the protocol).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gpuintegration_tpu.models import genz              # noqa: E402
from gpuintegration_tpu.utils import timing             # noqa: E402


def _run_rung(name, g, epsrel, ncall, fh, out_path, seed):
    good = timing.mcubes_time_and_call(
        name, g, epsrel, g.true_value, fh, ndim=8,
        ncall=ncall, total_iters=40, adjust_iters=20,
        skip_iters=5, runs=1, seed=seed)
    if good:
        with open(out_path) as rf:
            last = [ln for ln in rf if ln.startswith(name)][-1]
        est = float(last.split(",")[6])
        good = abs(est - g.true_value) <= epsrel * abs(g.true_value)
    return good


def main(out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "mcubes_ladders_8d.csv")
    # (case, integrand, first exponent to retry)
    cases = [
        ("f3_corner_peak_8d", genz.f3_corner_peak(8), 3),
        ("f4_gaussian_8d", genz.f4_gaussian(8), 3),
        ("f6_discontinuous_8d", genz.f6_discontinuous(8), 4),
    ]
    case_budget_s = 2000.0
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
                good = _run_rung(name, g, epsrel, ncall, fh, out_path,
                                 seed=211 + exp)
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
        # AdjustParams-parity ncall escalation for the first-rung misses
        print("# escalation protocol (AdjustParams parity, ncall x10 -> "
              "1e9): total_iters=40 adjust_iters=20", file=fh, flush=True)
        for name, g, exp0 in cases:
            if exp0 != 3:
                continue
            t0 = time.time()
            good = _run_rung(name, g, 1e-3, 1e9, fh, out_path, seed=331)
            print(f"# {name} eps=1e-03 ncall=1e+09 good={good} "
                  f"wall={time.time() - t0:.0f}s", file=sys.stderr,
                  flush=True)
            print(f"# {name}: escalated(1e9) 1e-3 rung good={good}",
                  file=fh, flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
