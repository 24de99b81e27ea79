"""f1 10D VEGAS statistical wall: analytic law + hardware measurement.

VERDICT r4 #8 asks for either a certified f1 10D rung from the VEGAS
escalation driver or a measured statistical wall.  The escalation
driver itself (run_f1_10d_escalation.py: simple_integrate, reference
AdjustParams parity up to 8e9 calls / 100 iterations,
vegas_utils.cuh:272-296) crashed the axon TPU worker at an escalated
rung on 2026-08-21 -- an escalated iteration runs ncall evals as ONE
dispatch, and >=2e9-eval f64 dispatches sit at the runtime's measured
kill ceiling (DESIGN.md 3b; the frozen phase is sliced for exactly
this reason, the adjust phase is not because grid refinement needs a
host round trip each iteration).  So the wall is quantified the
rigorous way instead:

Analytic law (exact, no fit): f = cos(sum_i i*x_i) on [0,1]^10.
  E f    = Re prod_i (e^{i a_i} - 1)/(i a_i)      = -1.5514e-6 (truth)
  E f^2  = 1/2 + 1/2 Re prod_i (e^{2 i a_i} - 1)/(2 i a_i) ~ 1/2
  => plain-MC sd = sqrt(~0.5 / n).
For ANY importance density p (separable or not), Cauchy-Schwarz gives
  Var_p(f/p) = E[f^2/p] - I^2 >= (E|f|)^2 - I^2,
and E|f| = E|cos(theta)| with theta = sum i*x_i mod 2pi near-uniform
at 10D, so E|f| ~ 2/pi and the OPTIMAL importance map still leaves
sd >= sqrt(0.405/n).  Reaching sd = epsrel*|I| = 1.55e-9 therefore
needs n >= 1.7e17 calls -- 2e5x the 8e9x100 escalation ceiling.  The
wall is sign cancellation (|I| is 4.6e5x smaller than E|f|), which
importance sampling PROVABLY cannot remove; it is not a driver or
iteration-count artifact.

Hardware check: a dispatch-safe deep run (ncall 1e9 x 30 iterations,
3e10 total evals -- escalation-class statistical power delivered in
1e9-eval dispatches) must land sd within a small factor of
sqrt(0.5/n_eff) and an estimate within ~3 sd of zero; that validates
the law's constant on the real sampler, the same way the f5 law was
validated by one dedicated run.

Usage: python docs/results/run_f1_10d_wall.py
Appends a row (backend id xla-deep) + anatomy comment to
mcubes_ladders_10d.csv.
"""
import cmath
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np                                      # noqa: E402

from gpuintegration_tpu.mcubes import vegas as V        # noqa: E402
from gpuintegration_tpu.models import genz              # noqa: E402
from gpuintegration_tpu.utils import timing             # noqa: E402


def analytic_moments(ndim=10):
    a = np.arange(1, ndim + 1, dtype=np.float64)
    ef = np.prod([(cmath.exp(1j * ai) - 1) / (1j * ai) for ai in a]).real
    ef2 = 0.5 + 0.5 * np.prod(
        [(cmath.exp(2j * ai) - 1) / (2j * ai) for ai in a]).real
    return ef, ef2


def main(out_path=None, epsrel=1e-3):
    out_path = out_path or os.path.join(
        os.path.dirname(__file__), "mcubes_ladders_10d.csv")
    g = genz.f1_oscillatory(10)
    truth = g.true_value
    ef, ef2 = analytic_moments(10)
    var = ef2 - ef * ef                        # ~0.5
    var_floor = (2.0 / math.pi) ** 2 - ef * ef  # optimal-importance bound
    target_sd = epsrel * abs(truth)
    n_plain = var / target_sd ** 2
    n_floor = var_floor / target_sd ** 2
    cap = 8e9 * 100

    ncall, iters, skip = 1e9, 30, 5
    t0 = time.time()
    res = V.integrate(g, epsrel=epsrel, epsabs=1e-40, ncall=ncall,
                      total_iters=iters, adjust_iters=15,
                      skip_iters=skip, seed=31)
    wall = time.time() - t0
    n_eff = ncall * (iters - skip)             # post-skip accumulated
    sd_pred = math.sqrt(var / n_eff)
    sd_ratio = res.errorest / sd_pred
    within = abs(res.estimate) <= 3.0 * res.errorest

    need_header = not os.path.exists(out_path) \
        or os.path.getsize(out_path) == 0
    with open(out_path, "a") as fh:
        if need_header:
            print(timing.MCUBES_CSV_HEADER, file=fh, flush=True)
        print(f"f1_oscillatory_10d,10,xla-deep,{truth:.15e},"
              f"{epsrel:.15e},1e-40,{res.estimate:.15e},"
              f"{res.errorest:.15e},{res.chi_sq:.5f},{res.iters},"
              f"{res.status},{wall * 1e3}", file=fh, flush=True)
        print(f"# f1 10D statistical wall (analytic, exact): Var f = "
              f"{var:.4f}, optimal-importance floor {var_floor:.4f}; "
              f"target sd {target_sd:.3e} needs n >= {n_floor:.2e} "
              f"calls = {n_floor / cap:.1e}x the 8e9x100 escalation "
              f"cap (plain-MC {n_plain:.2e}).  Hardware check at "
              f"n_eff={n_eff:.1e}: sd={res.errorest:.3e} vs predicted "
              f"sqrt(Var/n)={sd_pred:.3e} (ratio {sd_ratio:.2f}); "
              f"est within 3sd of 0: {within}.  The 8e9-rung "
              f"simple_integrate crashed the TPU worker (single "
              f"multi-1e9-eval dispatch, DESIGN 3b ceiling) -- wall "
              f"quantified analytically + validated at escalation-"
              f"class power in dispatch-safe 1e9-eval slices.",
              file=fh, flush=True)
    print(f"est={res.estimate:.6e} sd={res.errorest:.3e} "
          f"pred={sd_pred:.3e} ratio={sd_ratio:.2f} wall={wall:.0f}s")
    print(f"n_needed >= {n_floor:.2e} ({n_floor / cap:.1e}x cap); "
          f"within_3sd_of_zero={within}")
    print(f"wrote {out_path}")
    return res


if __name__ == "__main__":
    main()
