"""1-D deterministic adaptive quadrature (Gauss-Kronrod 15/7).

The reference vendors a GSL binding for 1-D integrals
(reference: cubacpp/cubacpp/gsl.hh, 421 LoC wrapping QAG); this is the
framework's native equivalent: batched GK15 rule evaluation over an
interval pool with worst-first bisection, run as jitted stages like
PAGANI (fixed-shape pool, masked).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.types import IntegrationResult

# Gauss-Kronrod 15-point nodes/weights on [-1, 1] (symmetric; classic
# QUADPACK/GSL constants).  7-point Gauss weights embed for the error.
_XGK = np.array([
    0.991455371120813, 0.949107912342759, 0.864864423359769,
    0.741531185599394, 0.586087235467691, 0.405845151377397,
    0.207784955007898, 0.0])
_WGK = np.array([
    0.022935322010529, 0.063092092629979, 0.104790010322250,
    0.140653259715525, 0.169004726639267, 0.190350578064785,
    0.204432940075298, 0.209482141084728])
_WG = np.array([
    0.129484966168870, 0.279705391489277, 0.381830050505119,
    0.417959183673469])


@functools.lru_cache(maxsize=None)
def _gk15_tables():
    nodes = np.concatenate([-_XGK[:-1], _XGK[::-1]])          # 15 ascending
    wk = np.concatenate([_WGK[:-1], _WGK[::-1]])
    wg15 = np.zeros(15)
    # Gauss-7 points are the odd-indexed Kronrod points
    wg15[1:14:2] = np.concatenate([_WG[:-1], _WG[::-1]])
    return nodes, wk, wg15


def _eval_pool(f, lows, lengths):
    nodes, wk, wg = _gk15_tables()
    mid = lows + 0.5 * lengths
    half = 0.5 * lengths
    x = mid[:, None] + half[:, None] * nodes[None, :]         # (C, 15)
    vals = f(x)                                               # batched 1-D
    gk = half * jnp.sum(vals * wk[None, :], axis=1)
    g7 = half * jnp.sum(vals * wg[None, :], axis=1)
    # QUADPACK-style error scaling around the interval mean
    mean = gk / lengths
    resasc = half * jnp.sum(jnp.abs(vals - mean[:, None]) * wk[None, :],
                            axis=1)
    raw = jnp.abs(gk - g7)
    err = jnp.where(
        (resasc > 0) & (raw > 0),
        resasc * jnp.minimum(1.0, (200.0 * raw / resasc) ** 1.5),
        raw)
    return gk, err


def integrate1d(
    integrand,
    a: float,
    b: float,
    epsrel: float = 1e-8,
    epsabs: float = 1e-12,
    max_intervals: int = 1 << 16,
) -> IntegrationResult:
    """Adaptive GK15 on [a, b].

    Batched strategy: every round bisects ALL current intervals (pool
    doubles).  Compared with GSL QAG's one-worst-interval-at-a-time heap,
    this wastes some evaluations on already-converged intervals but turns
    every step into one vectorised rule application -- the same trade the
    PAGANI pipeline makes."""
    # 1-D convention: the integrand maps coordinate arrays elementwise
    # (any shape), like the reference's 1-D GSL/vegas1D integrands.
    f = integrand

    lows = jnp.asarray([float(a)])
    lengths = jnp.asarray([float(b) - float(a)])
    neval = 0
    total_est = total_err = float("nan")
    while True:
        est, err = _eval_pool(f, lows, lengths)
        n = lows.shape[0]
        neval += n * 15
        total_est = float(jnp.sum(est))
        total_err = float(jnp.sum(err))
        if total_err <= max(epsrel * abs(total_est), epsabs):
            return IntegrationResult(estimate=total_est, errorest=total_err,
                                     nregions=n, neval=neval, status=0)
        if 2 * n > max_intervals:
            break
        half = lengths * 0.5
        lows = jnp.concatenate([lows, lows + half])
        lengths = jnp.concatenate([half, half])
    return IntegrationResult(estimate=total_est, errorest=total_err,
                             nregions=lows.shape[0], neval=neval, status=1)
