"""Integrand protocol and adapters.

The reference accepts C++ functors with one double argument per dimension,
deducing ndim at compile time (reference: cubacpp/cubacpp/arity.hh:36-75,
integrand_traits.hh:81-93; device dispatch via gpu::apply,
common/cuda/cudaApply.cuh:7-25).  The TPU-native analogue:

* canonical form: a *batched* JAX-traceable callable ``f(x)`` mapping an
  array of shape (..., ndim) to (...).
* ergonomic forms accepted by ``make_integrand``:
    - scalar-per-axis functions ``f(x0, ..., x{n-1})`` (cubacpp style);
      arity gives ndim automatically,
    - single-argument functions; ndim must be supplied,
    - objects with ``__call__`` (stateful integrands; state is captured as
      a closure over device arrays -- the pytree analogue of
      quad::cuda_copy_to_managed, common/cuda/cudaMemoryUtil.h:345-353).
"""
from __future__ import annotations

import inspect
import weakref
from typing import Callable

import jax

# Wrapper memo so repeated integrate() calls with the same user callable
# reuse the same batched closure -- keeping jax.jit caches warm across runs
# (a fresh closure per call would recompile the hot rule kernel every run).
_WRAPPER_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _positional_arity(f: Callable) -> int | None:
    """Count REQUIRED positional parameters; None when not
    introspectable/variadic.  Parameters with defaults are configuration
    (e.g. ``lambda x, sigma=0.1: ...``), not integration axes -- counting
    them would feed a coordinate into the knob and integrate the wrong
    function."""
    try:
        target = f if inspect.isfunction(f) or inspect.ismethod(f) else f.__call__
        sig = inspect.signature(target)
    except (TypeError, ValueError):
        return None
    count = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            if p.default is inspect.Parameter.empty:
                count += 1
        elif p.kind == p.VAR_POSITIONAL:
            return None
    return count


def make_integrand(f: Callable, ndim: int | None = None) -> tuple[Callable, int]:
    """Normalise ``f`` to batched form; return (batched_f, ndim).

    Deduces ndim from positional arity when possible (cubacpp
    arity.hh:36-75 parity); scalar-per-axis callables are wrapped to accept
    (..., ndim) arrays by unstacking the trailing axis.
    """
    if ndim is None and not (hasattr(f, "ndim")
                             or (_positional_arity(f) or 0) > 1):
        # single-argument integrand with no ndim attribute: the documented
        # error must fire regardless of cache state (a cached entry from an
        # earlier explicit-ndim call would otherwise silently substitute a
        # stale dimension)
        raise ValueError(
            "cannot deduce ndim from a single-argument integrand; "
            "pass ndim explicitly")
    try:
        cached = _WRAPPER_CACHE.get(f)
    except TypeError:  # unhashable/weakref-unsupported callables
        cached = None
    if cached is not None:
        got_f, got_ndim = cached
        if ndim is None or ndim == got_ndim:
            return got_f, got_ndim

    out = _make_integrand_uncached(f, ndim)
    try:
        _WRAPPER_CACHE[f] = out
    except TypeError:
        pass
    return out


def deduce_ncomp(batched_f: Callable, ndim: int, dtype="float64") -> int:
    """Number of components the (batched) integrand returns per point:
    1 for (...,) scalars, N for (..., N) vectors -- the runtime analogue
    of cubacpp's compile-time return-type deduction
    (cubacpp/integrand_traits.hh:81-93).  Uses jax.eval_shape, so the
    integrand is traced once but never compiled or executed."""
    import jax.numpy as jnp
    probe = jax.ShapeDtypeStruct((3, ndim), jnp.dtype(dtype))
    out = jax.eval_shape(batched_f, probe)
    shape = out.shape
    if shape == (3,):
        return 1
    if len(shape) == 2 and shape[0] == 3:
        return int(shape[1])
    raise ValueError(
        f"integrand maps (3, {ndim}) -> {shape}; expected (3,) for a "
        f"scalar integrand or (3, ncomp) for a vector-valued one")


def _broadcast_scalar(out, x):
    """Constant-returning integrands (``lambda x, y: 0.0``) produce a
    rank-0 value under trace; broadcast it to the batch shape so the rule
    contraction sees the documented (...,) form.  Free in XLA.

    A rank-0 *tracer*, by contrast, is almost always an accidental
    whole-batch reduction (``jnp.sum(x**2)`` missing ``axis=-1``);
    broadcasting it would integrate a garbage per-chunk constant with
    status 0, so reject it loudly instead.  True constants -- Python
    numbers or concrete arrays, including closure-captured device state --
    are never tracers of the integration batch."""
    import jax.numpy as jnp
    if jnp.ndim(out) != 0:
        return out
    if isinstance(out, jax.core.Tracer):
        raise ValueError(
            "integrand returned a rank-0 value that DEPENDS on the "
            "integration points -- this reduces over the batch axis too "
            "(did you mean axis=-1 in a sum/prod?). Expected one value "
            "per point, shape (...,) for the (..., ndim) input batch.")
    return jnp.broadcast_to(out, x.shape[:-1])


def _make_integrand_uncached(f, ndim):
    if ndim is None and hasattr(f, "ndim"):
        ndim = int(f.ndim)  # e.g. models.genz.GenzIntegrand carries its ndim
    arity = _positional_arity(f)
    if arity is not None and arity > 1:
        if ndim is not None and ndim != arity:
            raise ValueError(
                f"integrand takes {arity} positional args but ndim={ndim}")
        n = arity

        def batched(x):
            return _broadcast_scalar(f(*[x[..., d] for d in range(n)]), x)

        return batched, n

    if ndim is None:
        raise ValueError(
            "cannot deduce ndim from a single-argument integrand; "
            "pass ndim explicitly")

    def batched1(x):
        return _broadcast_scalar(f(x), x)

    return batched1, ndim
