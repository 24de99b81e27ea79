"""Benchmark driver: PAGANI rule-kernel throughput on the 8D Genz suite.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

North-star metric (BASELINE.json): integrand evals/sec/chip for the
batched Genz-Malik rule kernel at 8D -- the analogue of the reference's
``call_cubature_rules`` throughput probe
(reference: cuda/pagani/demos/new_time_and_call.cuh:30-70, which sweeps
splits_per_dim and measures regions x FEVAL / kernel-time), plus
time-to-tolerance context from a full adaptive run.

vs_baseline is measured against the BASELINE.json target of 1e9
evals/sec/chip (the reference's V100-class kernels reach O(1e9) evals/sec
on cheap integrands; papers arXiv:2104.06494 / 2202.01753).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gpuintegration_tpu import Workspace  # noqa: E402
from gpuintegration_tpu.integrand import make_integrand  # noqa: E402
from gpuintegration_tpu.models import genz  # noqa: E402
from gpuintegration_tpu.ops import rule_eval  # noqa: E402
from gpuintegration_tpu.pagani import region_pool, workspace as W  # noqa: E402

BASELINE_EVALS_PER_SEC = 1.0e9


def bench_rule_kernel(ndim=8, n_regions=1 << 16, chunk=1 << 13, repeats=11,
                      dtype="float64"):
    """Pure rule-kernel throughput: regions x FEVAL / wall-time."""
    g = genz.f1_oscillatory(ndim)
    f, _ = make_integrand(g, ndim)
    feval = rule_eval.rule_tables(ndim, dtype).feval

    lows, lengths, n = region_pool.uniform_split(
        ndim, 4, max(n_regions, 4 ** ndim), jnp.dtype(dtype))
    n_regions = lows.shape[0]
    gl = jnp.zeros(ndim, jnp.dtype(dtype))
    gr = jnp.ones(ndim, jnp.dtype(dtype))

    def one_pass():
        outs = []
        for i in range(n_regions // chunk):
            sl = slice(i * chunk, (i + 1) * chunk)
            outs.append(W._eval_stage(f, ndim, dtype, lows[sl], lengths[sl],
                                      gl, gr))
        return outs

    jax.block_until_ready(one_pass())  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(one_pass())
        times.append(time.perf_counter() - t0)
    best = min(times)
    evals = n_regions * feval
    return evals / best, evals, best


def bench_time_to_tolerance(ndim=8, epsrel=1e-6):
    """Full adaptive PAGANI run on the 8D Genz gaussian, warm-cache timing."""
    g = genz.f4_gaussian(ndim)
    ws = Workspace(ndim)
    res = ws.integrate(g, epsrel=epsrel, epsabs=1e-40)  # warm/compiles
    t0 = time.perf_counter()
    res = ws.integrate(g, epsrel=epsrel, epsabs=1e-40)
    dt = time.perf_counter() - t0
    rel = abs(res.estimate - g.true_value) / abs(g.true_value)
    return dt, res, rel


def main():
    throughput, evals, best = bench_rule_kernel()
    ttt, res, rel_err = bench_time_to_tolerance()
    out = {
        "metric": "integrand evals/sec/chip (PAGANI 8D Genz rule kernel)",
        "value": throughput,
        "unit": "evals/s",
        "vs_baseline": throughput / BASELINE_EVALS_PER_SEC,
        "detail": {
            "kernel_evals_per_pass": evals,
            "kernel_best_pass_s": best,
            "time_to_1e-6_8d_gaussian_s": ttt,
            "achieved_rel_err": rel_err,
            "converged": res.status == 0,
            "nregions": res.nregions,
            "neval": res.neval,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
