"""Pallas VMEM bin-resolve: interpret-mode parity with the XLA grid path.

On real TPU the compiled kernel is bit-identical to interpret mode; these
tests run the interpreter on CPU and check (a) the kernel's rc/xo/ia are
bitwise-equal to the XLA branch's arithmetic (exact one-hot selections +
identical FP ops), and (b) a forced-pallas end-to-end vegas() run matches
the XLA-path run to well inside MC noise (only the importance-weight
product reassociates between the two branches).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuintegration_tpu.mcubes import vegas as V
from gpuintegration_tpu.mcubes.pallas_lookup import (
    bin_resolve_pallas, edge_lookup_pallas, hist_pallas)


def _random_grid(ndim, nbins, seed=0):
    """A VEGAS-like grid: xi[d] monotone in [0, 1] with xi[d, 0] = 0."""
    rng = np.random.default_rng(seed)
    w = rng.random((ndim, nbins)).astype(np.float64) + 0.05
    xi = np.concatenate(
        [np.zeros((ndim, 1)), np.cumsum(w, axis=1)], axis=1)
    xi /= xi[:, -1:]
    return jnp.asarray(xi, jnp.float32)


@pytest.mark.parametrize("ndim,nbins", [(3, 500), (6, 500), (2, 37)])
def test_edge_lookup_interpret_bitwise(ndim, nbins):
    xi32 = _random_grid(ndim, nbins, seed=ndim)
    rng = np.random.default_rng(1)
    C, npg = 7, 33
    ia = jnp.asarray(rng.integers(1, nbins + 1, (C, npg, ndim)), jnp.int32)
    lo_ref, hi_ref = V._edge_lookup(xi32, ia, nbins)
    lo_k, hi_k = edge_lookup_pallas(xi32, ia, nbins, interpret=True)
    np.testing.assert_array_equal(np.asarray(lo_k), np.asarray(lo_ref))
    np.testing.assert_array_equal(np.asarray(hi_k), np.asarray(hi_ref))


@pytest.mark.parametrize("with_ia", [False, True])
@pytest.mark.parametrize("ndim,nbins", [(4, 500), (1, 11)])
def test_bin_resolve_interpret_bitwise(ndim, nbins, with_ia):
    f32 = jnp.float32
    xi32 = _random_grid(ndim, nbins, seed=10 + ndim)
    rng = np.random.default_rng(2)
    n = 1234                       # deliberately not a multiple of _BN
    xn_np = (1.0 + rng.random((ndim, n)) * nbins).astype(np.float32)
    xn_t = jnp.asarray(xn_np)

    # XLA-branch arithmetic, op-for-op (vegas chunk_body fallback)
    xn = jnp.moveaxis(xn_t, 0, -1)[None]                # (1, n, ndim)
    ia = jnp.clip(xn.astype(jnp.int32), 1, nbins)
    edge_lo, edge_hi = V._edge_lookup(xi32, ia, nbins)
    xo_ref = edge_hi - edge_lo
    rc_ref = edge_lo + (xn - ia.astype(f32)) * xo_ref

    rc, xo, ids = bin_resolve_pallas(xi32, xn_t, nbins, with_ia=with_ia,
                                     interpret=True)
    np.testing.assert_array_equal(
        np.asarray(xo), np.moveaxis(np.asarray(xo_ref)[0], -1, 0))
    # rc = el + (xn - ia) * xo: whether the final mul-add fuses to an FMA
    # differs between the layouts, so rc agrees to <= 2 ulp, not bitwise.
    np.testing.assert_array_max_ulp(
        np.asarray(rc), np.moveaxis(np.asarray(rc_ref)[0], -1, 0), maxulp=2)
    if with_ia:
        np.testing.assert_array_equal(
            np.asarray(ids), np.moveaxis(np.asarray(ia)[0], -1, 0))
    else:
        assert ids is None


@pytest.mark.parametrize("layout", ["dims_major", "cube_major"])
@pytest.mark.parametrize("ndim,nbins", [(3, 500), (2, 37), (6, 128)])
def test_hist_interpret_matches_xla(ndim, nbins, layout):
    """The VMEM histogram reproduces the XLA one-hot contraction.  Not
    bitwise (per-block partial sums vs one long f32 dot), but the f2
    values are O(1) randoms so the f32 sums agree to a few ulp."""
    rng = np.random.default_rng(3 + ndim)
    C, npg = 11, 37                # C*npg = 407, not a multiple of _HBN
    ia_np = rng.integers(0, nbins, (C, npg, ndim)).astype(np.int32)
    f2_np = rng.random((C, npg)).astype(np.float32)
    ref = np.asarray(V._onehot_hist(
        jnp.asarray(ia_np), jnp.asarray(f2_np), nbins))
    if layout == "dims_major":
        ia = jnp.asarray(np.moveaxis(ia_np, -1, 0).reshape(ndim, -1))
        f2 = jnp.asarray(f2_np.reshape(-1))
    else:
        ia, f2 = jnp.asarray(ia_np), jnp.asarray(f2_np)
    out = np.asarray(hist_pallas(ia, f2, nbins, interpret=True))
    assert out.shape == (ndim, nbins)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=0.0)
    # total mass is exactly preserved modulo f32 reassociation
    np.testing.assert_allclose(out.sum(axis=1), ref.sum(axis=1), rtol=1e-6)


def test_vegas_forced_pallas_hist_matches_xla(monkeypatch):
    """End-to-end: a forced-pallas-hist adjustment run stays within MC-noise
    agreement of the XLA-hist run (the histogram only steers adaptation)."""
    def f(x):
        return jnp.exp(-jnp.sum((x - 0.5) ** 2, axis=-1) * 8.0)

    kw = dict(ncall=2e4, ndim=3, total_iters=4, adjust_iters=4,
              seed=11, epsrel=1e-9)
    monkeypatch.delenv("GPUINT_TPU_FORCE_PALLAS_HIST", raising=False)
    r_xla = V.vegas(f, **kw)
    jax.clear_caches()
    monkeypatch.setenv("GPUINT_TPU_FORCE_PALLAS_HIST", "1")
    r_pal = V.vegas(f, **kw)
    jax.clear_caches()

    assert r_pal.neval == r_xla.neval
    # the f32 hist differs by reassociation only; the rebinned grid and
    # hence the estimates track to well inside the MC error
    np.testing.assert_allclose(r_pal.estimate, r_xla.estimate, rtol=1e-5)
    np.testing.assert_allclose(r_pal.errorest, r_xla.errorest, rtol=1e-3)


def test_vegas_forced_pallas_matches_xla(monkeypatch):
    """End-to-end: the forced-pallas grid path reproduces the XLA path to
    ulp-accumulation level (identical sample coordinates and histogram
    ids; only the weight-product association differs between branches)."""
    def f(x):
        return jnp.exp(-jnp.sum((x - 0.5) ** 2, axis=-1) * 8.0)

    kw = dict(ncall=2e4, ndim=3, total_iters=4, adjust_iters=2,
              seed=7, epsrel=1e-9)
    monkeypatch.delenv("GPUINT_TPU_FORCE_PALLAS_LOOKUP", raising=False)
    r_xla = V.vegas(f, **kw)
    # the gate is read at trace time: drop cached traces before toggling
    jax.clear_caches()
    monkeypatch.setenv("GPUINT_TPU_FORCE_PALLAS_LOOKUP", "1")
    r_pal = V.vegas(f, **kw)
    jax.clear_caches()

    assert r_pal.nregions == r_xla.nregions
    assert r_pal.neval == r_xla.neval
    np.testing.assert_allclose(r_pal.estimate, r_xla.estimate, rtol=5e-6)
    np.testing.assert_allclose(r_pal.errorest, r_xla.errorest, rtol=5e-4)
