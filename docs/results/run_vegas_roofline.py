"""f64 VEGAS sampling roofline breakdown (VERDICT r02 item 3).

Times the 6D Gaussian poly path at fixed ncall across sampler modes so
the f64 throughput story is measured, not guessed:

  xla_f64      -- the r02 default (Threefry + XLA map + f64 integrand)
  xla_f32eval  -- same machinery, f32 integrand eval (isolates emulation)
  hybrid_f64   -- Pallas point-gen + XLA f64 integrand (the new default)
  hybrid_unit  -- hybrid with a unit integrand (point-gen + accumulate
                  ceiling: what the machinery alone allows)
  pallas_f32   -- fully-fused f32 kernel (the absolute sampler ceiling)

Writes docs/results/vegas_roofline.csv: mode, samples_per_sec, rel_err.
Run on the real TPU: python docs/results/run_vegas_roofline.py
"""
import csv
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", ".."))

import jax.numpy as jnp  # noqa: E402

from gpuintegration_tpu.mcubes.vegas import vegas  # noqa: E402

NDIM = 6
NCALL = 1e7
TRUTH = (math.sqrt(math.pi / 25.0) * math.erf(2.5)) ** NDIM


def g6(x0, x1, x2, x3, x4, x5):
    s = 0.0
    for x in (x0, x1, x2, x3, x4, x5):
        s = s + (x - 0.5) ** 2
    return jnp.exp(-25.0 * s)


def unit6(x0, x1, x2, x3, x4, x5):
    return 1.0 + 0.0 * x0


def run(name, f, truth, **kw):
    kw.setdefault("importance", "poly")
    base = dict(epsrel=0.0, epsabs=0.0, ncall=NCALL, ndim=NDIM,
                total_iters=4, adjust_iters=2, skip_iters=0)
    base.update(kw)
    vegas(f, seed=1, **base)                      # compile + warm
    t0 = time.perf_counter()
    r = vegas(f, seed=2, **base)
    dt = time.perf_counter() - t0
    rate = r.neval / dt
    rel = (abs(r.estimate - truth) / truth) if truth else float("nan")
    print(f"{name:14s} {rate:12.4g} samples/s  rel_err={rel:.3e}")
    return dict(mode=name, samples_per_sec=rate, rel_err=rel,
                neval=r.neval, seconds=dt)


def main():
    rows = [
        run("xla_f64", g6, TRUTH, sampler="xla"),
        run("xla_f32eval", g6, TRUTH, sampler="xla",
            eval_dtype=jnp.float32),
        run("hybrid_f64", g6, TRUTH, sampler="hybrid"),
        run("hybrid_unit", unit6, 1.0, sampler="hybrid"),
        run("pallas_f32", g6, TRUTH, sampler="pallas",
            eval_dtype=jnp.float32),
        # scale rows: the 1e7 config above is dispatch/adjust-bound
        # (hybrid_unit ~ hybrid_f64 proves the integrand is free);
        # production ncall amortizes the fixed per-iteration costs
        run("hybrid_f64_1e8", g6, TRUTH, sampler="hybrid", ncall=1e8),
        run("hybrid_f64_1e9", g6, TRUTH, sampler="hybrid", ncall=1e9),
        run("hybrid_frozen_1e8", g6, TRUTH, sampler="hybrid", ncall=1e8,
            adjust_iters=0),
        run("xla_f64_1e8", g6, TRUTH, sampler="xla", ncall=1e8),
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "vegas_roofline.csv")
    with open(out, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print("wrote", out)


if __name__ == "__main__":
    main()
