"""f1 10D through the VEGAS escalation driver + variance anatomy.

VERDICT r4 #8: f1_oscillatory is the only 10D Genz member with no
certification path from either method -- the standard 15-iteration
protocol landed est 2.44e-5 against truth -1.551e-6
(mcubes_ladders_10d.csv) and the PAGANI epsabs run is status 1.  This
script (a) points the reference-parity escalation driver
(mcubes.simple_integrate -- vegas_utils.cuh:272-296's AdjustParams up
to the 8e9-call / 100-iteration caps) at it, truth-gated, and (b)
measures the variance anatomy: from the run's own (sd, neval) the
1/sqrt(n) law gives the calls required for the target -- if that
exceeds the escalation cap by orders of magnitude, the wall is
STATISTICAL and quantified, not a driver limitation.

The anatomy in one line: f1 10D integrates cos(2pi + sum x_i/2) whose
magnitude is O(1) while the integral is -1.55e-6 (cancellation ~6e5x),
so the absolute MC error floor sd ~ sqrt(Var f / n) must fall below
epsrel * 1.55e-6 -- a variance-reduction problem importance sampling
cannot help with (the optimal |f|-proportional map still samples the
cancelling signs).

Usage: python docs/results/run_f1_10d_escalation.py [epsrel]
Appends rows to mcubes_ladders_10d.csv (backend id xla-escalated).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np                                      # noqa: E402

from gpuintegration_tpu.mcubes import vegas as V        # noqa: E402
from gpuintegration_tpu.models import genz              # noqa: E402
from gpuintegration_tpu.utils import timing             # noqa: E402


def main(epsrel=1e-3, out_path=None):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "mcubes_ladders_10d.csv")
    g = genz.f1_oscillatory(10)
    truth = g.true_value
    t0 = time.time()
    res = V.simple_integrate(
        g, epsrel=epsrel, epsabs=1e-40, ncall=1e9,
        total_iters=15, adjust_iters=10, skip_iters=5, seed=29)
    wall = time.time() - t0
    true_ok = abs(res.estimate - truth) <= epsrel * abs(truth)
    # 1/sqrt(n) anatomy from the final run's own statistics
    sd, n = float(res.errorest), max(int(res.neval), 1)
    target_sd = epsrel * abs(truth)
    n_needed = n * (sd / target_sd) ** 2 if target_sd > 0 else math.inf
    cap = 8e9 * 100        # the escalation driver's call*iters ceiling
    need_header = not os.path.exists(out_path) \
        or os.path.getsize(out_path) == 0
    with open(out_path, "a") as fh:
        if need_header:
            print(timing.MCUBES_CSV_HEADER, file=fh, flush=True)
        print(f"f1_oscillatory_10d,10,xla-escalated,{truth:.15e},"
              f"{epsrel:.15e},1e-40,{res.estimate:.15e},"
              f"{res.errorest:.15e},{res.chi_sq:.5f},{res.iters},"
              f"{res.status},{wall * 1e3}", file=fh, flush=True)
        print(f"# f1 10D escalation anatomy: neval={n:.3e} sd={sd:.3e} "
              f"target_sd={target_sd:.3e} -> n_needed~{n_needed:.3e} "
              f"({n_needed / cap:.1e}x the 8e9x100 escalation cap); "
              f"truth_gate={true_ok} status={res.status}",
              file=fh, flush=True)
    print(f"est={res.estimate:.6e} truth={truth:.6e} sd={sd:.3e} "
          f"status={res.status} iters={res.iters} neval={n:.3e} "
          f"wall={wall:.0f}s")
    print(f"n_needed ~ {n_needed:.3e} calls "
          f"({n_needed / cap:.2e}x the escalation cap) -> "
          f"{'CERTIFIED' if res.status == 0 and true_ok else 'measured statistical wall'}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(epsrel=float(sys.argv[1]) if len(sys.argv) > 1 else 1e-3)
