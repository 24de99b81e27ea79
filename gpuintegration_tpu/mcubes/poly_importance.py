"""Polynomial inverse-CDF importance sampling (gather-free VEGAS).

A TPU-first redesign of the VEGAS sampling map.  The reference (and our
``importance='grid'`` path) evaluates the per-dimension importance map by
table lookup into the bin-edge grid (Setup_Integrand_Eval,
vegasT.cuh:188-235) -- two gathers per (sample, dimension).  TPUs have no
gather hardware; measured gather throughput (~1e9 lookups/s) caps VEGAS
at a few million samples/s.

Instead, represent the map as a polynomial:

    q_d(s)  ~ sqrt(G_d'(s))      least-squares Chebyshev-basis fit
    P_d(s)  = int_0^s q_d^2 / int_0^1 q_d^2

``P_d`` is monotone by construction (derivative q^2 >= 0), P(0)=0,
P(1)=1.  Sampling x = P(s) for stratified-uniform s with weight P'(s) is
*exactly* unbiased for ANY such P -- the polynomial only approximates the
grid's variance-optimal shape, never the answer.  Evaluation is a Horner
chain on the VPU: ~30 FMAs per (sample, dim) instead of two gathers,
restoring VEGAS to compute-bound throughput.

The adaptation loop is unchanged: the f^2 histogram is still accumulated
in s-bins and refined with the standard smoothing+rebin; each iteration
re-fits the polynomial from the refined grid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_DEGREE = 14


def fit_importance_poly(xi: np.ndarray, degree: int = DEFAULT_DEGREE):
    """Fit per-dimension polynomials to the grid's importance map.

    xi: (ndim, nbins+1) bin right-edges with xi[:,0]=0.
    Returns (p_cheb (ndim, 2*degree+2), dp_cheb (ndim, 2*degree+1)):
    CHEBYSHEV-series coefficients (lowest order first, domain [0,1]) of
    the normalised map P and its derivative P'.  The Chebyshev basis is
    kept end-to-end -- converting the squared/integrated series to the
    power basis is catastrophically ill-conditioned beyond ~degree 15 and
    destroys f32 Horner evaluation.
    """
    xi = np.asarray(xi, np.float64)
    ndim, nbp1 = xi.shape
    nbins = nbp1 - 1
    widths = np.diff(xi, axis=1)                 # (ndim, nbins)
    s_mid = (np.arange(nbins) + 0.5) / nbins

    C = np.polynomial.chebyshev
    p_list, dp_list = [], []
    for d in range(ndim):
        # G'(s) = width * nbins; fit sqrt to compress dynamic range
        gprime = np.maximum(widths[d] * nbins, 1e-30)
        q = np.sqrt(gprime)
        cheb = C.Chebyshev.fit(s_mid, q, degree, domain=[0.0, 1.0])
        q2 = cheb * cheb                         # P' (unnormalised), Cheb
        P = q2.integ()                           # antiderivative, Cheb
        p0 = P(0.0)
        norm = P(1.0) - p0
        p_coef = P.coef / norm
        p_coef[0] -= p0 / norm                   # P(0) = 0 exactly-ish
        q2_coef = q2.coef / norm
        p_list.append(p_coef)
        dp_list.append(q2_coef)
    return np.stack(p_list), np.stack(dp_list)


def clenshaw(coeff_row, k: int, t):
    """Clenshaw evaluation of a Chebyshev series c_0..c_{k-1} at t in
    [-1,1]; coeff_row a (k,) array (device values -- the loop is static
    over k, so per-iteration coefficient updates never retrace)."""
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for i in range(k - 1, 0, -1):
        b1, b2 = coeff_row[i] + 2.0 * t * b1 - b2, b1
    return coeff_row[0] + t * b1 - b2


def eval_map_and_weight(p_coeffs, dp_coeffs, s):
    """Vectorised per-dim map evaluation.

    p_coeffs: (ndim, kp), dp_coeffs: (ndim, kd) Chebyshev-series arrays
    on domain [0,1] (device inputs); s: (..., ndim) in [0,1].
    Returns (coords (...,ndim), weight (...)) with weight = prod_d P_d'.
    """
    ndim, kp = p_coeffs.shape
    kd = dp_coeffs.shape[1]
    coords = []
    wgt = None
    for d in range(ndim):
        t = 2.0 * s[..., d] - 1.0                # domain [0,1] -> [-1,1]
        coords.append(clenshaw(p_coeffs[d], kp, t))
        w = clenshaw(dp_coeffs[d], kd, t)
        wgt = w if wgt is None else wgt * w
    return jnp.stack(coords, axis=-1), wgt


def fit_quality(xi: np.ndarray, p_coeffs, dp_coeffs) -> float:
    """Max deviation of the fitted map from the grid map at bin edges --
    a diagnostic, not a correctness gate (any monotone P is unbiased)."""
    xi = np.asarray(xi, np.float64)
    ndim, nbp1 = xi.shape
    s = np.linspace(0, 1, nbp1)
    t = 2.0 * s - 1.0
    worst = 0.0
    for d in range(ndim):
        fitted = np.polynomial.chebyshev.chebval(t, p_coeffs[d])
        worst = max(worst, float(np.max(np.abs(fitted - xi[d]))))
    return worst
