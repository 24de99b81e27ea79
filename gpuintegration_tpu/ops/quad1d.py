"""1-D deterministic quadrature: the GSL surface, TPU-first.

The reference vendors a GSL binding for 1-D integrals
(reference: cubacpp/cubacpp/gsl.hh, 421 LoC) exposing QNG (non-adaptive
Gauss-Kronrod cascade), QAG (adaptive GK with rule keys 1..6 -> GK15..61),
CQUAD (doubly adaptive), and QAWF/QAWO (Fourier integrals).  This module
is the framework's native equivalent of that whole surface:

* **Rule tables are computed, not transcribed**: Gauss-Kronrod pairs for
  every key come from Laurie's algorithm (D. P. Laurie, "Calculation of
  Gauss-Kronrod quadrature rules", Math. Comp. 66 (1997)) on the Legendre
  Jacobi matrix; Clenshaw-Curtis weights from the Chebyshev moment
  system.  Correctness is pinned by degree-of-exactness tests (Gauss-n
  exact to 2n-1, Kronrod-(2n+1) to 3n+1, CC-n to n) plus a match against
  the classic GK15 constants.
* **Adaptivity is batched**: instead of GSL's one-worst-interval-at-a-
  time heap, every round retires converged intervals to a finished
  ledger and bisects the worst half of the surviving pool in one
  vectorised rule application (the same batch trade the PAGANI pipeline
  makes, minus the old version's exponential split-everything waste).
* **QAWF is a batch of cycle integrals** accelerated by the Wynn epsilon
  algorithm -- all half-cycles of the oscillatory tail evaluate in one
  dispatch.

Tables are cached as NumPy and converted at the use site (never build
jnp arrays inside lru_cached builders -- tracer poisoning).
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.types import IntegrationResult

# classic GK15 constants (QUADPACK/GSL) -- retained solely as a
# validation pin for the computed tables (tests/test_quad1d_heuristics.py)
_XGK15 = np.array([
    0.991455371120813, 0.949107912342759, 0.864864423359769,
    0.741531185599394, 0.586087235467691, 0.405845151377397,
    0.207784955007898, 0.0])
_WGK15 = np.array([
    0.022935322010529, 0.063092092629979, 0.104790010322250,
    0.140653259715525, 0.169004726639267, 0.190350578064785,
    0.204432940075298, 0.209482141084728])

# QAG rule keys (gsl.hh:209 `int key = 1`): key k -> Gauss order n of the
# embedded pair, Kronrod size 2n+1 (GSL: GK15, 21, 31, 41, 51, 61)
KEY_TO_GAUSS_N = {1: 7, 2: 10, 3: 15, 4: 20, 5: 25, 6: 30}


# ---------------------------------------------------------------------------
# rule construction (host NumPy, cached)
# ---------------------------------------------------------------------------

def _legendre_recurrence(m: int):
    """First m recurrence coefficients (a_k, b_k) of the Legendre weight
    on [-1, 1]: a_k = 0, b_0 = 2, b_k = k^2 / (4k^2 - 1)."""
    a = np.zeros(m)
    b = np.zeros(m)
    b[0] = 2.0
    k = np.arange(1, m, dtype=np.float64)
    b[1:] = k * k / (4.0 * k * k - 1.0)
    return a, b


def _r_kronrod(n: int, a0, b0):
    """Laurie's algorithm: recurrence coefficients of the degree-(2n+1)
    Kronrod extension of the n-point Gauss rule for the measure with
    coefficients (a0, b0).  Returns (a, b) of length 2n+1."""
    a = np.zeros(2 * n + 1)
    b = np.zeros(2 * n + 1)
    k0 = (3 * n) // 2 + 1
    k1 = int(math.ceil(3 * n / 2)) + 1
    a[:k0] = a0[:k0]
    b[:k1] = b0[:k1]
    s = np.zeros(n // 2 + 2)
    t = np.zeros(n // 2 + 2)
    t[1] = b[n + 1]
    for m in range(n - 1):
        u = 0.0
        for k in range((m + 1) // 2, -1, -1):
            l = m - k
            u += (a[k + n + 1] - a[l]) * t[k + 1] + b[k + n + 1] * s[k] \
                - b[l] * s[k + 1]
            s[k + 1] = u
        s, t = t, s
    for j in range(n // 2, -1, -1):
        s[j + 1] = s[j]
    for m in range(n - 1, 2 * n - 2):
        u = 0.0
        j = 0
        for k in range(m + 1 - n, (m - 1) // 2 + 1):
            l = m - k
            j = n - 1 - l
            u += -(a[k + n + 1] - a[l]) * t[j + 1] - b[k + n + 1] * s[j + 1] \
                + b[l] * s[j + 2]
            s[j + 1] = u
        if m % 2 == 0:
            k = m // 2
            a[k + n + 1] = a[k] + (s[j + 1] - b[k + n + 1] * s[j + 2]) / t[j + 2]
        else:
            k = (m + 1) // 2
            b[k + n + 1] = s[j + 1] / s[j + 2]
        s, t = t, s
    a[2 * n] = a[n - 1] - b[2 * n] * s[1] / t[1]
    return a, b


def _gauss_from_recurrence(a, b):
    """Golub-Welsch: nodes/weights from a Jacobi matrix."""
    m = len(a)
    J = np.diag(a)
    off = np.sqrt(b[1:m])
    J += np.diag(off, 1) + np.diag(off, -1)
    vals, vecs = np.linalg.eigh(J)
    return vals, b[0] * vecs[0] ** 2


@functools.lru_cache(maxsize=None)
def gk_pair(n: int):
    """(nodes, kronrod_weights, embedded_gauss_weights) of the
    (2n+1)-point Gauss-Kronrod pair on [-1, 1], ascending nodes.  The
    Gauss weight vector is zero at the Kronrod-only points (the Gauss
    nodes are the odd-indexed Kronrod points)."""
    a0, b0 = _legendre_recurrence(2 * n + 1)
    ak, bk = _r_kronrod(n, a0, b0)
    xk, wk = _gauss_from_recurrence(ak, bk)
    xg, wg = _gauss_from_recurrence(*_legendre_recurrence(n))
    wg_full = np.zeros(2 * n + 1)
    # Gauss nodes interleave: position 1, 3, 5, ... in the Kronrod grid
    for xi, wi in zip(xg, wg):
        j = int(np.argmin(np.abs(xk - xi)))
        wg_full[j] = wi
    return xk, wk, wg_full


@functools.lru_cache(maxsize=None)
def cc_rule(m: int):
    """(nodes, weights) of the (m+1)-point Clenshaw-Curtis rule on
    [-1, 1] (m even): nodes cos(pi*j/m), weights from the Chebyshev
    moment system  sum_j w_j T_k(x_j) = int_-1^1 T_k  (k even: 2/(1-k^2),
    odd: 0).  Nested: the (m/2+1)-point rule's nodes are every other
    node, which gives an embedded error estimate for free."""
    j = np.arange(m + 1)
    x = np.cos(np.pi * j / m)
    k = np.arange(m + 1)
    T = np.cos(np.pi * np.outer(k, j) / m)          # T_k(x_j)
    with np.errstate(divide="ignore"):              # k=1 hits 1/(1-k^2)
        mom = np.where(k % 2 == 0, 2.0 / (1.0 - k.astype(float) ** 2), 0.0)
    w = np.linalg.lstsq(T, mom, rcond=None)[0]
    return x[::-1].copy(), w[::-1].copy()           # ascending


# ---------------------------------------------------------------------------
# batched rule application
# ---------------------------------------------------------------------------

def _eval_gk(f, lows, lengths, n_gauss: int):
    """Batched GK(2n+1) over (C,) intervals: returns (est, err, neval/iv).

    QUADPACK error model: |GK - G| rescaled by the interval's variation
    resasc with the (200 r)^{3/2} damping (dqk15.f semantics)."""
    xk, wk, wg = gk_pair(n_gauss)
    nodes = jnp.asarray(xk)
    wk_j = jnp.asarray(wk)
    wg_j = jnp.asarray(wg)
    mid = lows + 0.5 * lengths
    half = 0.5 * lengths
    x = mid[:, None] + half[:, None] * nodes[None, :]
    vals = f(x)
    gk = half * jnp.sum(vals * wk_j[None, :], axis=1)
    g = half * jnp.sum(vals * wg_j[None, :], axis=1)
    mean = gk / jnp.where(lengths == 0.0, 1.0, lengths)
    resasc = half * jnp.sum(jnp.abs(vals - mean[:, None]) * wk_j[None, :],
                            axis=1)
    raw = jnp.abs(gk - g)
    err = jnp.where(
        (resasc > 0) & (raw > 0),
        resasc * jnp.minimum(1.0, (200.0 * raw / resasc) ** 1.5),
        raw)
    # QUADPACK roundoff floor (dqk15.f): the reported error can never
    # fall below what f64 arithmetic on |f| can deliver -- without it a
    # large-magnitude cancelling integrand claims noise-level accuracy
    resabs = half * jnp.sum(jnp.abs(vals) * wk_j[None, :], axis=1)
    epmach = float(np.finfo(np.float64).eps)
    err = jnp.maximum(err, 50.0 * epmach * resabs)
    return gk, err


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


# ---------------------------------------------------------------------------
# QNG -- non-adaptive cascade (gsl_integration_qng analogue)
# ---------------------------------------------------------------------------

def qng(integrand, a: float, b: float, epsrel: float = 1e-8,
        epsabs: float = 1e-12) -> IntegrationResult:
    """Non-adaptive quadrature: successively higher-order GK rules
    (keys 1..6, i.e. 15..61 points) on the whole interval until the
    embedded error converges; status 1 if even GK61 fails.  Re-expression
    of QNG's fixed 10/21/43/87 cascade (gsl.hh:172-198) with this
    module's computed rule family."""
    lows = jnp.asarray([float(a)])
    lengths = jnp.asarray([float(b) - float(a)])
    neval = 0
    est = err = float("nan")
    for key in sorted(KEY_TO_GAUSS_N):
        n = KEY_TO_GAUSS_N[key]
        e, r = _eval_gk(integrand, lows, lengths, n)
        neval += 2 * n + 1
        est, err = float(e[0]), float(r[0])
        if err <= max(epsrel * abs(est), epsabs):
            return IntegrationResult(estimate=est, errorest=err,
                                     nregions=1, neval=neval, status=0)
    return IntegrationResult(estimate=est, errorest=err,
                             nregions=1, neval=neval, status=1)


# ---------------------------------------------------------------------------
# QAG -- batched adaptive (gsl_integration_qag analogue)
# ---------------------------------------------------------------------------

def integrate1d(
    integrand,
    a: float,
    b: float,
    epsrel: float = 1e-8,
    epsabs: float = 1e-12,
    max_intervals: int = 1 << 16,
    key: int = 1,
) -> IntegrationResult:
    """Adaptive Gauss-Kronrod on [a, b] with rule selection
    (``key`` 1..6 -> GK15..61, gsl.hh:209).

    Batched adaptivity: each round evaluates the freshly bisected
    children in one vectorised rule application (survivors keep their
    computed results), retires intervals whose error is below their
    length-proportional share of the tolerance into a finished ledger,
    and bisects the worst half (by error) of the remainder.
    Work therefore concentrates where the error lives -- on a locally
    singular integrand the pool stays O(depth), not O(2^depth)."""
    if key not in KEY_TO_GAUSS_N:
        raise ValueError(f"key must be 1..6, got {key!r}")
    # survivors carry their already-computed (e, r) across rounds; only
    # freshly bisected children are evaluated (the rule is deterministic,
    # so this is exactly the re-evaluating loop minus the redundant work:
    # ~1/3 of each round's integrand evaluations).  One loop serves both
    # this whole-interval entry and QAWO's half-period partition.
    return _qag_pool(integrand, np.array([float(a), float(b)]),
                     epsrel, epsabs, max_intervals, KEY_TO_GAUSS_N[key])


qag = integrate1d


# ---------------------------------------------------------------------------
# CQUAD -- doubly adaptive Clenshaw-Curtis (gsl_integration_cquad analogue)
# ---------------------------------------------------------------------------

_CQUAD_DEGREES = (8, 16, 32, 64)


def cquad(integrand, a: float, b: float, epsrel: float = 1e-8,
          epsabs: float = 1e-12, max_intervals: int = 4096,
          ) -> IntegrationResult:
    """Doubly adaptive quadrature (CQUAD semantics, gsl.hh:230-253):
    each interval carries a Clenshaw-Curtis degree; on a failed error
    test the interval first ESCALATES its degree (8 -> 16 -> 32 -> 64
    points+1), and only splits once the top degree still fails.  The
    embedded error is |CC_m - CC_{m/2}| (CC nodes nest).  Intervals at
    the same degree evaluate as one batch per round."""
    f = integrand
    span = float(b) - float(a)
    nmax = _CQUAD_DEGREES[-1]
    lows = np.array([float(a)])
    lengths = np.array([span])
    level = np.array([0])               # index into _CQUAD_DEGREES
    # CC nodes NEST: x_m[j] = x_{2m}[2j], so an interval's values live on
    # the (nmax+1)-point master grid at stride nmax/m and an escalation
    # only evaluates the m/2 NEW (odd-stride) nodes -- re-evaluating all
    # m+1 cost ~2x the necessary integrand work per escalation
    vcache = np.full((1, nmax + 1), np.nan)
    fresh = np.array([True])            # no cached values yet
    fin_est = fin_err = 0.0
    neval = 0
    nregions = 1
    status = 1
    est = err = float("nan")
    for _round in range(256):
        ests = np.zeros(len(lows))
        errs = np.zeros(len(lows))
        for li, m in enumerate(_CQUAD_DEGREES):
            sel_mask = level == li
            if not sel_mask.any():
                continue
            x_cc, w_cc = cc_rule(m)
            # embedded rule: every other node of the m-rule is the m/2-rule
            _, w_half = cc_rule(m // 2)
            w_emb = np.zeros(m + 1)
            w_emb[::2] = w_half
            stride = nmax // m
            pos = np.arange(0, nmax + 1, stride)
            sel = np.flatnonzero(sel_mask)
            fresh_sel = sel[fresh[sel]]
            esc_sel = sel[~fresh[sel]]
            if fresh_sel.size:
                mid = lows[fresh_sel, None] + 0.5 * lengths[fresh_sel, None]
                half = 0.5 * lengths[fresh_sel, None]
                vals = np.asarray(f(jnp.asarray(mid + half * x_cc[None, :])))
                vcache[np.ix_(fresh_sel, pos)] = vals
                neval += fresh_sel.size * (m + 1)
            if esc_sel.size:
                new_nodes = x_cc[1::2]          # odd-indexed: not cached
                mid = lows[esc_sel, None] + 0.5 * lengths[esc_sel, None]
                half = 0.5 * lengths[esc_sel, None]
                vals_new = np.asarray(
                    f(jnp.asarray(mid + half * new_nodes[None, :])))
                vcache[np.ix_(esc_sel, pos[1::2])] = vals_new
                neval += esc_sel.size * (m // 2)
            vals_all = vcache[np.ix_(sel, pos)]
            half1 = 0.5 * lengths[sel]
            hi = half1 * (vals_all @ w_cc)
            lo = half1 * (vals_all @ w_emb)
            ests[sel] = hi
            errs[sel] = np.abs(hi - lo)
        fresh[:] = False                 # everything evaluated is cached
        est = fin_est + float(ests.sum())
        err = fin_err + float(errs.sum())
        tol = max(epsrel * abs(est), epsabs)
        if err <= tol:
            status = 0
            break
        share = tol * lengths / abs(span)
        done = errs <= share
        fin_est += float(ests[done].sum())
        fin_err += float(errs[done].sum())
        lows, lengths, level, errs, vcache, fresh = (
            z[~done] for z in (lows, lengths, level, errs, vcache, fresh))
        if len(lows) == 0:
            break
        can_escalate = level < len(_CQUAD_DEGREES) - 1
        level = np.where(can_escalate, level + 1, level)
        split = ~can_escalate
        k = int(split.sum())
        if k:
            if nregions + k > max_intervals:
                break
            half = lengths[split] * 0.5
            lows = np.concatenate([lows[~split], lows[split],
                                   lows[split] + half])
            lengths = np.concatenate([lengths[~split], half, half])
            # children restart at the base degree (their halves are
            # smoother) with empty caches; escalating survivors keep
            # their bumped level and cached values
            level = np.concatenate([level[~split],
                                    np.zeros(2 * k, dtype=int)])
            vcache = np.concatenate(
                [vcache[~split], np.full((2 * k, nmax + 1), np.nan)])
            fresh = np.concatenate([fresh[~split], np.ones(2 * k, bool)])
            nregions += k
    return IntegrationResult(estimate=est, errorest=err,
                             nregions=nregions, neval=neval, status=status)


# ---------------------------------------------------------------------------
# QAWO / QAWF -- Fourier integrals (gsl.hh:355-420 analogues)
# ---------------------------------------------------------------------------

def qawo(integrand, a: float, b: float, omega: float, sin_or_cos: str = "sin",
         epsrel: float = 1e-8, epsabs: float = 1e-12,
         max_intervals: int = 1 << 16) -> IntegrationResult:
    """Oscillatory-weight integral int_a^b f(x) sin/cos(omega x) dx.

    Re-expression of QAWO: the oscillatory factor folds into the
    integrand and the adaptive GK61 pool starts pre-subdivided at the
    half-period scale, so every initial interval sees at most one
    extremum of the weight (QUADPACK reaches the same resolution through
    Chebyshev moments; here the batched pool makes brute subdivision the
    cheaper TPU answer)."""
    if sin_or_cos not in ("sin", "cos"):
        raise ValueError("sin_or_cos must be 'sin' or 'cos'")
    w = jnp.sin if sin_or_cos == "sin" else jnp.cos
    g = lambda x: integrand(x) * w(omega * x)
    span = float(b) - float(a)
    n0 = int(min(max(1, math.ceil(abs(omega) * span / math.pi)), 4096))
    edges = np.linspace(float(a), float(b), n0 + 1)
    # seed the adaptive pool with the half-period partition
    res = _qag_pool(g, edges, epsrel, epsabs, max_intervals, n_gauss=30)
    return res


def _qag_pool(f, edges, epsrel, epsabs, max_intervals, n_gauss):
    """integrate1d's adaptive loop over an arbitrary initial partition.
    Survivors carry their (e, r) across rounds; only fresh children are
    evaluated (see integrate1d)."""
    span = float(edges[-1] - edges[0])
    pts = 2 * n_gauss + 1
    lows = np.zeros(0)
    lengths = np.zeros(0)
    e = np.zeros(0)
    r = np.zeros(0)
    new_lo = edges[:-1].astype(float)
    new_ln = np.diff(edges).astype(float)
    fin_est = fin_err = 0.0
    neval = 0
    nregions = len(new_lo)
    status = 1
    est = err = float("nan")
    while True:
        m = len(new_lo)
        cap = _next_pow2(m)
        pl = np.concatenate([new_lo, np.full(cap - m, new_lo[0])])
        ln = np.concatenate([new_ln, np.zeros(cap - m)])
        e_d, r_d = _eval_gk(f, jnp.asarray(pl), jnp.asarray(ln), n_gauss)
        neval += m * pts
        lows = np.concatenate([lows, new_lo])
        lengths = np.concatenate([lengths, new_ln])
        e = np.concatenate([e, np.asarray(e_d)[:m]])
        r = np.concatenate([r, np.asarray(r_d)[:m]])
        est = fin_est + float(e.sum())
        err = fin_err + float(r.sum())
        tol = max(epsrel * abs(est), epsabs)
        if err <= tol:
            status = 0
            break
        share = tol * lengths / abs(span)
        done = r <= share
        fin_est += float(e[done].sum())
        fin_err += float(r[done].sum())
        lows, lengths, e, r = (z[~done] for z in (lows, lengths, e, r))
        if len(lows) == 0:
            break
        k = max(1, len(lows) // 2)
        if nregions + k > max_intervals:
            break
        order = np.argsort(-r)
        split, keep = order[:k], order[k:]
        half = lengths[split] * 0.5
        new_lo = np.concatenate([lows[split], lows[split] + half])
        new_ln = np.concatenate([half, half])
        lows, lengths, e, r = (z[keep] for z in (lows, lengths, e, r))
        nregions += k
    return IntegrationResult(estimate=est, errorest=err,
                             nregions=nregions, neval=neval, status=status)


def _wynn_epsilon(s):
    """Wynn's epsilon algorithm: accelerated limit of the partial-sum
    sequence ``s`` plus a crude error estimate (QUADPACK dqelg's role in
    QAWF's cycle summation).  Table recurrence
    e_{k+1}(i) = e_{k-1}(i+1) + 1/(e_k(i+1) - e_k(i)); estimates live in
    the even columns."""
    lo = [0.0] * (len(s) + 1)        # e_{-1} row
    hi = [float(x) for x in s]       # e_0 row = partial sums
    best = hi[-1]
    err = abs(hi[-1] - hi[-2]) if len(hi) > 1 else float("inf")
    col = 0
    while len(hi) > 1:
        col += 1
        nxt = []
        for i in range(len(hi) - 1):
            d = hi[i + 1] - hi[i]
            nxt.append(float("inf") if d == 0.0 else lo[i + 1] + 1.0 / d)
        lo, hi = hi, nxt
        if col % 2 == 0 and hi and math.isfinite(hi[-1]):
            err = abs(hi[-1] - best)
            best = hi[-1]
    return best, err


def qawf(integrand, a: float, omega: float, sin_or_cos: str = "sin",
         epsabs: float = 1e-10, max_cycles: int = 64,
         ) -> IntegrationResult:
    """Fourier integral int_a^inf f(x) sin/cos(omega x) dx (QAWF,
    gsl.hh:355-420: absolute-error only, like GSL).

    TPU-first design: ALL half-cycle integrals
    C_k = int over [a + k pi/w, a + (k+1) pi/w] of f w  evaluate in ONE
    batched GK61 dispatch (the alternating series makes each cycle
    smooth), then the partial-sum sequence is accelerated with the Wynn
    epsilon algorithm -- QUADPACK's own convergence mechanism for this
    integral class, batched instead of cycle-at-a-time."""
    if omega == 0.0:
        raise ValueError("omega must be nonzero for a Fourier integral")
    if sin_or_cos not in ("sin", "cos"):
        raise ValueError("sin_or_cos must be 'sin' or 'cos'")
    w = jnp.sin if sin_or_cos == "sin" else jnp.cos
    g = lambda x: integrand(x) * w(omega * x)
    period = math.pi / abs(omega)
    batch = 16
    sums = []
    total = 0.0
    quad_err = 0.0
    neval = 0
    k0 = 0
    while k0 < max_cycles:
        nb = min(batch, max_cycles - k0)
        lows = jnp.asarray(float(a) + (k0 + np.arange(nb)) * period)
        lengths = jnp.full(nb, period)
        e_d, r_d = _eval_gk(g, lows, jnp.asarray(lengths), 30)
        e = np.asarray(e_d)
        r = np.asarray(r_d)
        neval += nb * 61
        # per-cycle error budget: with up to max_cycles cycles summed
        # into quad_err, a per-cycle trigger at a FIXED fraction of
        # epsabs would let quad_err alone exceed epsabs (64 cycles x
        # 0.05 = 3.2x), making the certificate unreachable by
        # construction
        cycle_tol = 0.25 * epsabs / max_cycles
        for i in range(nb):
            ci, ri = float(e[i]), float(r[i])
            if ri > cycle_tol:
                # rough cycle (feature inside the half-period): integrate
                # it ADAPTIVELY like QUADPACK's per-cycle QAGS -- one
                # non-adaptive GK61 with its error thrown away reported
                # errorest 1e-17 against a true error of 8e-3 on a peaked
                # cycle (review repro)
                lo_i = float(a) + (k0 + i) * period
                sub = _qag_pool(g, np.array([lo_i, lo_i + period]),
                                0.0, max(0.5 * cycle_tol, 1e-300),
                                1 << 12, 30)
                ci, ri = sub.estimate, sub.errorest
                neval += sub.neval
            quad_err += ri
            total += ci
            sums.append(total)
        if len(sums) >= 6:
            best, err = _wynn_epsilon(sums)
            err = err + quad_err      # series residual + quadrature error
            if math.isfinite(best) and err <= epsabs:
                return IntegrationResult(
                    estimate=best, errorest=err, nregions=len(sums),
                    neval=neval, status=0)
        k0 += nb
    best, err = _wynn_epsilon(sums)
    err = err + quad_err
    return IntegrationResult(estimate=best, errorest=err,
                             nregions=len(sums), neval=neval,
                             status=0 if err <= epsabs else 1)
