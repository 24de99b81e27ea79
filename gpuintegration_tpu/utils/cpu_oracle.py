"""ctypes binding to the native CPU reference integrators.

The framework's cubacpp analogue (reference: cubacpp/cubacpp/cuhre.hh,
vegas.hh): an independent C++ implementation of CUHRE-style adaptive
cubature and NR-style VEGAS used as the correctness oracle for the TPU
path (the role CUBA's llCuhre/llVegas play for the reference) and as the C
ABI entry point (test_integration_from_c.c analogue).

The shared library is built on demand from native/cpu_quad.cpp with g++;
the build is cached next to the source.
"""
from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import Callable, Sequence

import numpy as np

from gpuintegration_tpu.types import IntegrationResult
from gpuintegration_tpu.utils.stats import chi2_prob

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SRC = os.path.join(_NATIVE_DIR, "cpu_quad.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libcpu_quad.so")

_INTEGRAND_T = ctypes.CFUNCTYPE(
    ctypes.c_double, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ctypes.c_void_p)

_lib = None


def _build():
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.quad_cuhre.restype = ctypes.c_int
    lib.quad_cuhre.argtypes = [
        _INTEGRAND_T, ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int)]
    lib.quad_vegas.restype = ctypes.c_int
    lib.quad_vegas.argtypes = [
        _INTEGRAND_T, ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_ulonglong,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong)]
    lib.quad_suave.restype = ctypes.c_int
    lib.quad_suave.argtypes = [
        _INTEGRAND_T, ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double, ctypes.c_longlong, ctypes.c_int,
        ctypes.c_double, ctypes.c_longlong, ctypes.c_ulonglong,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong)]
    lib.quad_rule_feval.restype = ctypes.c_int
    lib.quad_rule_feval.argtypes = [ctypes.c_int]
    _lib = lib
    return lib


def _wrap(f: Callable) -> _INTEGRAND_T:
    def trampoline(x_ptr, ndim, _ud):
        x = np.ctypeslib.as_array(x_ptr, shape=(ndim,))
        return float(f(x))

    return _INTEGRAND_T(trampoline)


def _c_doubles(vals: Sequence[float]):
    arr = np.ascontiguousarray(vals, dtype=np.float64)
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), arr


def cuhre_cpu(f: Callable, ndim: int, lows=None, highs=None,
              epsrel: float = 1e-3, epsabs: float = 1e-12,
              max_evals: int = 50_000_000) -> IntegrationResult:
    """CPU adaptive cubature oracle.  ``f`` maps a (ndim,) numpy vector to
    a float (point-wise, not batched)."""
    lib = load_library()
    if lows is None:
        lows = np.zeros(ndim)
        highs = np.ones(ndim)
    lo_p, lo_keep = _c_doubles(lows)
    hi_p, hi_keep = _c_doubles(highs)
    est = ctypes.c_double()
    err = ctypes.c_double()
    nreg = ctypes.c_longlong()
    status = ctypes.c_int()
    cb = _wrap(f)
    rc = lib.quad_cuhre(cb, None, ndim, lo_p, hi_p, epsrel, epsabs,
                        max_evals, ctypes.byref(est), ctypes.byref(err),
                        ctypes.byref(nreg), ctypes.byref(status))
    if rc != 0:
        raise RuntimeError(f"quad_cuhre failed with rc={rc}")
    return IntegrationResult(estimate=est.value, errorest=err.value,
                             nregions=int(nreg.value), status=status.value)


def vegas_cpu(f: Callable, ndim: int, lows=None, highs=None,
              epsrel: float = 1e-3, epsabs: float = 1e-12,
              ncall: float = 1e5, total_iters: int = 15,
              adjust_iters: int = 15, skip_iters: int = 5,
              seed: int = 0) -> IntegrationResult:
    """CPU VEGAS oracle."""
    lib = load_library()
    if lows is None:
        lows = np.zeros(ndim)
        highs = np.ones(ndim)
    lo_p, lo_keep = _c_doubles(lows)
    hi_p, hi_keep = _c_doubles(highs)
    est = ctypes.c_double()
    err = ctypes.c_double()
    chi2 = ctypes.c_double()
    status = ctypes.c_int()
    neval = ctypes.c_longlong()
    iters = ctypes.c_longlong()
    cb = _wrap(f)
    rc = lib.quad_vegas(cb, None, ndim, lo_p, hi_p, epsrel, epsabs, ncall,
                        total_iters, adjust_iters, skip_iters, seed,
                        ctypes.byref(est), ctypes.byref(err),
                        ctypes.byref(chi2), ctypes.byref(status),
                        ctypes.byref(neval), ctypes.byref(iters))
    if rc != 0:
        raise RuntimeError(f"quad_vegas failed with rc={rc}")
    res = IntegrationResult(estimate=est.value, errorest=err.value,
                            chi_sq=chi2.value, status=status.value)
    res.neval = int(neval.value)
    # iteration count is exported by quad_vegas itself (out_iters) so
    # the Python layer never re-derives the native ng/npg sizing.  The
    # stored chi2 is per-dof with the (acc - 0.9999) divisor
    # (cpu_quad.cpp:529), so the total is recovered with the same
    # factor; dof = acc - 1 is only the CDF's degrees of freedom.
    res.iters = int(iters.value)
    acc = max(res.iters - skip_iters, 0)
    res.prob = chi2_prob(res.chi_sq * max(acc - 0.9999, 0.0), acc - 1)
    return res


def suave_cpu(f: Callable, ndim: int, lows=None, highs=None,
              epsrel: float = 1e-3, epsabs: float = 1e-12,
              nnew: int = 2048, nmin: int = 2, flatness: float = 50.0,
              max_regions: int = 1024, seed: int = 0) -> IntegrationResult:
    """CPU Suave oracle (the cubacpp/suave.hh parameter surface):
    subregion-adaptive importance MC with grid inheritance, sample reuse
    and fluctuation-based splitting — the serial independent twin of
    ``gpuintegration_tpu.pagani.suave.suave``."""
    lib = load_library()
    if lows is None:
        lows = np.zeros(ndim)
        highs = np.ones(ndim)
    lo_p, lo_keep = _c_doubles(lows)
    hi_p, hi_keep = _c_doubles(highs)
    est = ctypes.c_double()
    err = ctypes.c_double()
    status = ctypes.c_int()
    neval = ctypes.c_longlong()
    nreg = ctypes.c_longlong()
    cb = _wrap(f)
    rc = lib.quad_suave(cb, None, ndim, lo_p, hi_p, epsrel, epsabs,
                        nnew, nmin, flatness, max_regions, seed,
                        ctypes.byref(est), ctypes.byref(err),
                        ctypes.byref(status), ctypes.byref(neval),
                        ctypes.byref(nreg))
    if rc != 0:
        raise RuntimeError(f"quad_suave failed with rc={rc}")
    res = IntegrationResult(estimate=est.value, errorest=err.value,
                            nregions=int(nreg.value), status=status.value)
    res.neval = int(neval.value)
    return res


def rule_feval(ndim: int) -> int:
    return int(load_library().quad_rule_feval(ndim))
