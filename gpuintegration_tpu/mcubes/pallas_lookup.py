"""Pallas VMEM-resident bin-edge lookup for the VEGAS grid path.

The XLA two-level lookup (mcubes.vegas._edge_lookup) is exact and
gather-free, but its per-dim one-hot operands and (N, 64) row blocks
round-trip HBM — measured as THE remaining grid-path ceiling (~50M
samples/s at 6D; the arithmetic itself is ~1k flops/sample, far from any
compute limit).  This kernel runs the identical two-level selection with
every intermediate in VMEM, so HBM traffic drops to the i32 bin indices
in and the two f32 edges out (72 B/sample at 6D).

Numerics vs the XLA branch (tested in tests/test_pallas_lookup.py):
the edge/xo/ia outputs are bitwise-equal — both levels are exact
selections (the level-1 matmul is one-hot rows against the table at
HIGHEST precision, x*1.0 products, zero padding; the level-2 reduce
adds exactly one non-zero f32 per lane).  rc = el + (xn - ia) * xo
agrees to <= 2 ulp (FMA fusion of the final multiply-add differs
between layouts), and downstream the dims-major weight product
reassociates vs the XLA axis reduce — both far inside MC noise.  The
frozen phase and the host loop trace through the same gate
(vegas._use_pallas_lookup), so their bit-equivalence is preserved.

Reference analogue: the xi[] shared-memory reads inside
Setup_Integrand_Eval (cuda/mcubes/vegasT.cuh:188-235); on TPU "shared
memory" = VMEM and the per-lane gather becomes a two-level one-hot
(dynamic gathers serialize on TPU, docs/DESIGN.md §3).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Single source of truth for the f32 adaptation-histogram saturation cap
# (the RANGE CONTRACT in mcubes.vegas aliases this; keeping one literal
# prevents the Pallas and XLA paths from silently desynchronizing).
HIST_CAP = 3.0e37

_L = 32          # level-2 fan-out (lane group)
_BN = 4096       # samples per program (lane-axis block; swept 512..16k on
                 # v5e -- 284..306M samples/s, plateau at 4096)


def _build_tables(xi32, nbins: int):
    """(ndim, 2L, H) f32: per dim, column h holds table row h — rows
    0..L-1 are LEFT edges xi[ia-1], rows L..2L-1 are RIGHT edges xi[ia],
    split as ia = h*L + l (same packing as vegas._edge_lookup's T,
    transposed for the level-1 matmul)."""
    H = -(-(nbins + 1) // _L)
    pad = H * _L - (nbins + 1)
    left = jnp.concatenate([xi32[:, :1], xi32[:, :-1]], axis=1)
    padc = ((0, 0), (0, pad))
    lo_rows = jnp.pad(left, padc).reshape(-1, H, _L)    # (ndim, H, L)
    hi_rows = jnp.pad(xi32, padc).reshape(-1, H, _L)
    t = jnp.concatenate([lo_rows, hi_rows], axis=2)     # (ndim, H, 2L)
    return jnp.swapaxes(t, 1, 2), H                     # (ndim, 2L, H)


def _make_kernel(ndim: int, H: int):
    def kernel(ia_ref, tt_ref, lo_ref, hi_ref):
        for d in range(ndim):
            ia = ia_ref[d, :][None, :]                      # (1, BN) i32
            hi_idx = ia // _L
            lo_idx = ia - hi_idx * _L
            b_hi = jnp.equal(
                jax.lax.broadcasted_iota(jnp.int32, (H, _BN), 0),
                hi_idx).astype(jnp.float32)                 # (H, BN)
            # level 1: fetch table row pair [left|right] per sample.
            # HIGHEST: exact f32 one-hot selection (bf16 default would
            # truncate the table values).
            rows = jnp.dot(tt_ref[d], b_hi,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (2L, BN)
            b_lo = jnp.equal(
                jax.lax.broadcasted_iota(jnp.int32, (_L, _BN), 0),
                lo_idx).astype(jnp.float32)                 # (L, BN)
            lo_ref[d, :] = jnp.sum(rows[:_L] * b_lo, axis=0)
            hi_ref[d, :] = jnp.sum(rows[_L:] * b_lo, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("nbins", "interpret"))
def edge_lookup_pallas(xi32, ia, nbins: int, *, interpret: bool = False):
    """(edge_lo, edge_hi) = xi[d, ia-1], xi[d, ia], VMEM-resident.

    xi32: (ndim, nbins+1) f32;  ia: (C, npg, ndim) i32 in [1, nbins].
    Returns two (C, npg, ndim) f32 arrays, bitwise-equal to
    vegas._edge_lookup.
    """
    ndim = xi32.shape[0]
    C, npg = ia.shape[0], ia.shape[1]
    n = C * npg
    n_pad = -(-n // _BN) * _BN
    ia_t = jnp.moveaxis(ia, -1, 0).reshape(ndim, n).astype(jnp.int32)
    ia_t = jnp.pad(ia_t, ((0, 0), (0, n_pad - n)))      # pad hits row 0: fine
    tt, H = _build_tables(xi32, nbins)

    ia_spec = pl.BlockSpec((ndim, _BN), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    tt_spec = pl.BlockSpec((ndim, 2 * _L, H), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    # x64 mode breaks Mosaic lowering (pallas_rule.py precedent)
    with jax.enable_x64(False):
        lo_t, hi_t = pl.pallas_call(
            _make_kernel(ndim, H),
            grid=(n_pad // _BN,),
            in_specs=[ia_spec, tt_spec],
            out_specs=(ia_spec, ia_spec),
            out_shape=(jax.ShapeDtypeStruct((ndim, n_pad), jnp.float32),) * 2,
            interpret=interpret,
        )(ia_t, tt)

    def back(a):
        return jnp.moveaxis(a[:, :n].reshape(ndim, C, npg), 0, -1)

    return back(lo_t), back(hi_t)


def _make_resolve_kernel(ndim: int, H: int, nbins: int, with_ia: bool):
    def kernel(xn_ref, tt_ref, rc_ref, xo_ref, *maybe_ia):
        for d in range(ndim):
            xn = xn_ref[d, :][None, :]                      # (1, BN) f32
            ia = jnp.clip(xn.astype(jnp.int32), 1, nbins)
            hi_idx = ia // _L
            lo_idx = ia - hi_idx * _L
            b_hi = jnp.equal(
                jax.lax.broadcasted_iota(jnp.int32, (H, _BN), 0),
                hi_idx).astype(jnp.float32)
            rows = jnp.dot(tt_ref[d], b_hi,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (2L, BN)
            b_lo = jnp.equal(
                jax.lax.broadcasted_iota(jnp.int32, (_L, _BN), 0),
                lo_idx).astype(jnp.float32)
            el = jnp.sum(rows[:_L] * b_lo, axis=0)[None, :]  # (1, BN)
            eh = jnp.sum(rows[_L:] * b_lo, axis=0)[None, :]
            xo = eh - el
            rc = el + (xn - ia.astype(jnp.float32)) * xo
            rc_ref[d, :] = rc[0, :]
            xo_ref[d, :] = xo[0, :]
            if with_ia:
                maybe_ia[0][d, :] = ia[0, :]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("nbins", "with_ia", "interpret"))
def bin_resolve_pallas(xi32, xn_t, nbins: int, *, with_ia: bool = False,
                       interpret: bool = False):
    """Fused stratified-point bin resolve, dims-major and VMEM-resident:
    xn -> (rc, xo[, ia]).

    xn_t: (ndim, N) f32, the per-sample grid coordinate in [1, nbins+1)
    (Setup_Integrand_Eval's xn, vegasT.cuh:205).  Returns rc (position in
    grid space after the importance map), xo (bin width) and, when
    ``with_ia``, the i32 bin index -- each (ndim, N), computed with the
    exact arithmetic of the XLA path (vegas.py chunk_body): truncation to
    ia, two-level one-hot edge selection, rc = lo + (xn - ia) * xo, so
    results are bitwise-equal to the fallback.

    Fusing the resolve keeps ia / one-hots / edge rows in VMEM; HBM
    traffic is xn in + rc/xo out (36 B/sample at 6D vs ~0.3 KB/sample of
    one-hot spill on the XLA path).
    """
    ndim, n = xn_t.shape
    n_pad = -(-n // _BN) * _BN
    # padding resolves garbage at bin 1: harmless, sliced away
    xn_p = jnp.pad(xn_t.astype(jnp.float32), ((0, 0), (0, n_pad - n)),
                   constant_values=1.0)
    tt, H = _build_tables(xi32, nbins)

    row_spec = pl.BlockSpec((ndim, _BN), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tt_spec = pl.BlockSpec((ndim, 2 * _L, H), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct((ndim, n_pad), jnp.float32)] * 2
    if with_ia:
        shapes.append(jax.ShapeDtypeStruct((ndim, n_pad), jnp.int32))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            _make_resolve_kernel(ndim, H, nbins, with_ia),
            grid=(n_pad // _BN,),
            in_specs=[row_spec, tt_spec],
            out_specs=tuple(row_spec for _ in shapes),
            out_shape=tuple(shapes),
            interpret=interpret,
        )(xn_p, tt)
    rc, xo = outs[0][:, :n], outs[1][:, :n]
    return rc, xo, (outs[2][:, :n] if with_ia else None)


# ---------------------------------------------------------------------------
# f^2 adaptation histogram (the atomicAdd d[] replacement, vegasT.cuh:309-313)

_HBN = 2048      # samples per program for the histogram kernel
_BC = 128        # bin chunk = one lane row of the accumulator


def _make_hist_kernel(ndim: int, n_bc: int):
    def kernel(ia_ref, f2_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        f2 = f2_ref[0, :][None, :]                       # (1, HBN) f32
        for d in range(ndim):
            ia = ia_ref[d, :][None, :]                   # (1, HBN) i32
            for h in range(n_bc):
                bins = jax.lax.broadcasted_iota(
                    jnp.int32, (_BC, _HBN), 0) + h * _BC
                m = jnp.where(ia == bins, f2, 0.0)       # (BC, HBN)
                out_ref[d * n_bc + h, :] = (
                    out_ref[d * n_bc + h, :] + jnp.sum(m, axis=1))

    return kernel


@functools.partial(jax.jit, static_argnames=("nbins", "interpret"))
def hist_pallas(ia, f2, nbins: int, *, interpret: bool = False):
    """(ndim, nbins) f32 histogram of f2 over per-dim bin ids, VMEM-resident.

    ia: (C, npg, ndim) or dims-major (ndim, N) int32 bin ids in
    [0, nbins); f2: (C, npg) or (N,) values (flattened sample order
    matches the dims-major columns, n = cube * npg + sample).  Same
    contraction as vegas._onehot_hist, but the one-hot mask lives only
    in VMEM as (128-bin, HBN-sample) compare chunks accumulated into a
    resident (ndim*ceil(nbins/128), 128) block across the sample grid --
    the XLA path materializes a (N, nbins) f32 one-hot in HBM (~2 kB per
    sample at 500 bins), measured as ~7 ns/sample of the grid-adjustment
    iteration time.  Reduction order differs from the XLA dot (per-block
    partials vs one long contraction): the histogram is f32 and only
    steers grid adaptation, so either is fine -- but the host loop and
    the fused adjustment phase must trace through the SAME gate
    (vegas._use_pallas_hist) to stay bit-equivalent per backend.
    """
    if ia.ndim == 3:                                     # (C, npg, ndim)
        ia_t = jnp.moveaxis(ia, -1, 0).reshape(ia.shape[-1], -1)
    else:                                                # (ndim, N)
        ia_t = ia
    ndim, n = ia_t.shape
    n_bc = -(-nbins // _BC)
    n_pad = -(-n // _HBN) * _HBN
    ia_t = jnp.pad(ia_t.astype(jnp.int32), ((0, 0), (0, n_pad - n)))
    # padding lands in bin 0 with weight 0: contributes nothing.
    # Clamp huge-magnitude samples to the f32-safe cap (vegas._HIST_CAP
    # note: f2 10D per-sample f^2 ~1e44 casts to f32 inf and poisons
    # the accumulator); the histogram only steers adaptation.
    f2_t = jnp.pad(jnp.minimum(f2.astype(jnp.float32), HIST_CAP)
                   .reshape(1, -1), ((0, 0), (0, n_pad - n)))

    with jax.enable_x64(False):
        out = pl.pallas_call(
            _make_hist_kernel(ndim, n_bc),
            grid=(n_pad // _HBN,),
            in_specs=[
                pl.BlockSpec((ndim, _HBN), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _HBN), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ndim * n_bc, _BC), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ndim * n_bc, _BC), jnp.float32),
            interpret=interpret,
        )(ia_t, f2_t)
    return out.reshape(ndim, n_bc * _BC)[:, :nbins]
