"""Fixed-shape padded region pool and its pipeline stages.

The reference grows/shrinks raw device arrays every iteration
(reference: cuda/pagani/quad/GPUquad/Sub_regions.cuh:38-258,
Sub_region_filter.cuh:49-151, Sub_region_splitter.cuh:48-88).  On TPU all
shapes must be static, so the pool lives in power-of-two "bucket"
capacities with the first ``n`` slots holding real regions and the rest
padding; every stage is a jitted function of static capacity and a traced
region count.

Pool memory layout is DIMS-MAJOR: coordinates are (ndim, R) with the huge
region axis minor.  TPU tiles rank-2 arrays as (8 sublanes, 128 lanes); a
region-major (R, ndim<=~16) array pads its minor axis 16x (measured: an
8M-region f64 pool ballooned to 16 GB of HLO temps through the x64
rewriter's f32 halves).  Dims-major is also the reference's own layout
(dLeftCoord[dim * size + i], Sub_regions.cuh:131).

Layout contract (load-bearing for the two-level error estimate): a pool of
capacity ``cap`` produced by ``split`` is BLOCKED at the STATIC half --
the left children of the (compacted, out_capacity = cap/2) parents occupy
slots [0, cap/2) and the right children [cap/2, cap), with real children
filling [0, n/2) of each block.  A child's sibling is therefore at a
static offset of cap/2 (a roll, two slices) and its parent index is
``slot % (cap/2)`` (a tile) -- no dynamic gathers, which serialize on TPU
(~1 s per 8M-element f64 gather/scatter measured vs ~10 ms for the static
relayouts).  This is the reference's own [0, m)/[m, 2m) layout
(Sub_region_splitter.cuh:25-44) except the block boundary is the static
pool half rather than the traced region count, which is what makes every
lookup static.  Validity masks come from ``block_mask``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def uniform_split(ndim: int, partitions_per_axis: int, capacity: int,
                  dtype=jnp.float64):
    """Initial uniform n-ary partition of the unit cube.

    Region ``i`` gets per-dim interval id ``(i // div**dim) % div``
    (reference: Sub_regions.cuh:11-36 create_uniform_split).  Padding slots
    (>= div**ndim) replicate region 0 so padded evaluations stay finite;
    they are masked out by the region count downstream.

    Returns (lows (ndim, capacity), lengths (ndim, capacity), n_regions).
    """
    div = partitions_per_axis
    n_regions = div ** ndim
    if capacity < n_regions:
        raise ValueError(f"capacity {capacity} < {n_regions} initial regions")
    length = 1.0 / div
    idx = jax.lax.broadcasted_iota(jnp.int32, (ndim, capacity), 1)
    dim = jax.lax.broadcasted_iota(jnp.int32, (ndim, capacity), 0)
    idx = jnp.where(idx < n_regions, idx, 0)  # padding replicates region 0
    strides = (div ** dim.astype(jnp.int64)).astype(jnp.int64)
    interval_id = (idx.astype(jnp.int64) // strides) % div
    lows = interval_id.astype(dtype) * jnp.asarray(length, dtype)
    lengths = jnp.full((ndim, capacity), length, dtype=dtype)
    return lows, lengths, n_regions


def region_mask(capacity: int, n: jax.Array) -> jax.Array:
    """Boolean mask of the first ``n`` (traced) slots of a capacity-sized axis."""
    ids = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    return ids < n


def block_mask(capacity: int, n: jax.Array, blocked: bool) -> jax.Array:
    """Validity mask of a pool holding ``n`` real regions.

    ``blocked=False``: a contiguous pool (initial uniform split or
    user-supplied regions) -- real slots are [0, n).
    ``blocked=True``: a pool produced by ``split`` -- real slots are the
    first n/2 of each static half (see the module layout contract).
    """
    if not blocked:
        return region_mask(capacity, n)
    half = capacity // 2
    ids = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    return (ids % half) < (n // 2)


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def compact(
    active: jax.Array,      # (cap,) 0/1 flags (already masked to idx < n)
    lows: jax.Array,        # (ndim, cap)
    lengths: jax.Array,     # (ndim, cap)
    split_dim: jax.Array,   # (cap,) int32
    estimates: jax.Array,   # (cap,)
    errorests: jax.Array,   # (cap,)
    *,
    out_capacity: int,
    extra: jax.Array | None = None,  # optional (cap,) payload row
                                     # (e.g. crease split fractions)
):
    """Stream-compact active regions to the front of a new pool.

    Replaces the reference's thrust exclusive_scan + alignRegions gather
    (reference: Sub_region_filter.cuh:8-47, 61-138) with BITWISE SHIFT
    compaction: each active element must move left by its deficit
    d_i = slot_i - rank_i (rank = exclusive cumsum of the active flags; d
    is non-decreasing across actives), and the move is executed one
    deficit bit at a time -- pass b shifts every element whose remaining
    deficit has bit b set left by 2^b.  Monotone deficits make the passes
    collision-free (validated exhaustively on random masks).  Every pass
    is a static roll + select over the payload arrays: no sort (variadic
    f64 sort takes MINUTES of XLA-TPU compile time even at 64k elements),
    no scatter/gather (~1 s per 8M f64 array -- they serialize).  Passes
    whose bit no element needs are skipped with lax.cond, so an all-active
    pool (the entire growth phase) costs one cumsum + log2(cap) scalar
    predicates.  The surviving regions' estimates become the next
    iteration's parents (alignRegions:39-40).

    Returns (n_active, new_lows, new_lengths, new_split_dim,
             parent_estimates, parent_errorests).  Tail slots beyond
    n_active hold leftover (inactive/duplicate) regions with finite real
    bounds, so padded evaluations stay finite; downstream masking is by
    region count.
    """
    ndim, cap = lows.shape
    v = active > 0
    flags = v.astype(jnp.int32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
    rank = jnp.cumsum(flags) - flags
    deficit = jnp.where(v, ids - rank, 0)
    # clamp: a count above out_capacity means the caller under-sized the
    # output pool; the slice below would drop real regions while the
    # count claimed otherwise (count-says-8/pool-holds-4 silent data
    # loss).  Correct callers always satisfy n_active <= out_capacity
    n_active = jnp.minimum(jnp.sum(flags), out_capacity)

    # estimates/errorests may be (cap,) scalars or (ncomp, cap) vector-
    # integrand components (comp-major; see rule_eval._eval_chunk_vector)
    est_rows = estimates if estimates.ndim == 2 else estimates[None]
    err_rows = errorests if errorests.ndim == 2 else errorests[None]
    ncomp = est_rows.shape[0]

    payload = ([lows[d] for d in range(ndim)]
               + [lengths[d] for d in range(ndim)]
               + [split_dim]
               + [est_rows[c] for c in range(ncomp)]
               + [err_rows[c] for c in range(ncomp)]
               + ([extra] if extra is not None else []))

    nbits = max(cap - 1, 1).bit_length()
    for b in range(nbits):
        s = 1 << b
        move = v & (((deficit >> b) & 1) == 1)
        in_range = ids < (cap - s)
        inc = jnp.roll(move, -s) & in_range

        def apply_pass(args):
            v_, d_, pay = args
            stay = v_ & ~move
            new_v = stay | inc
            new_d = jnp.where(inc, jnp.roll(d_, -s) - s, d_)
            new_pay = [jnp.where(inc, jnp.roll(p, -s), p) for p in pay]
            return new_v, new_d, new_pay

        v, deficit, payload = jax.lax.cond(
            jnp.any(move), apply_pass, lambda args: args,
            (v, deficit, payload))

    def fit(row):
        if out_capacity <= cap:
            return row[:out_capacity]
        return jnp.pad(row, (0, out_capacity - cap), mode="edge")

    new_lows = jnp.stack([fit(payload[d]) for d in range(ndim)])
    new_lengths = jnp.stack([fit(payload[ndim + d]) for d in range(ndim)])
    new_split = fit(payload[2 * ndim])
    pe = [fit(payload[2 * ndim + 1 + c]) for c in range(ncomp)]
    pr = [fit(payload[2 * ndim + 1 + ncomp + c]) for c in range(ncomp)]
    if estimates.ndim == 2:
        parent_est, parent_err = jnp.stack(pe), jnp.stack(pr)
    else:
        parent_est, parent_err = pe[0], pr[0]
    base = (n_active, new_lows, new_lengths, new_split, parent_est,
            parent_err)
    if extra is not None:
        return base + (fit(payload[2 * ndim + 1 + 2 * ncomp]),)
    return base


@functools.partial(jax.jit, static_argnames=("out_capacity",))
def split(
    lows: jax.Array,       # (ndim, cap) compacted active regions
    lengths: jax.Array,    # (ndim, cap)
    split_dim: jax.Array,  # (cap,) int32
    n: jax.Array,          # traced number of real regions
    *,
    out_capacity: int,
    frac: jax.Array | None = None,   # (cap,) split fraction, default 0.5
):
    """Bisect each region along its chosen dimension.

    The whole (compacted, padding included) input pool's left children
    land in slots [0, cap) and the right children in [cap, 2*cap): a pure
    rank-2 concatenate -- no gather, no small-minor-axis intermediate (an
    interleaved (ndim, cap, 2) layout gets 64x lane padding from the TPU's
    (8, 128) tiling).  Real children occupy the first n of each block.
    Padding-slot children have finite real bounds so later evaluations
    stay finite; downstream masking is block_mask(2*cap, 2*n, True).

    ``frac``: optional per-region cut point as a fraction of the chosen
    dimension's length (crease-aware splitting,
    rule_eval._split_fraction).  frac=0.5 is bit-identical to the
    midpoint path (0.5*len and len-0.5*len are the same float), so
    callers may pass a fraction vector that is mostly 0.5.

    Returns (child_lows, child_lengths, n_children).
    """
    ndim, cap = lows.shape
    dim_ids = jax.lax.broadcasted_iota(jnp.int32, (ndim, cap), 0)
    sel = dim_ids == split_dim[None, :]
    if frac is None:
        cut = lengths * 0.5
        rest = cut
    else:
        cut = lengths * frac[None, :].astype(lengths.dtype)
        rest = lengths - cut
    left_len = jnp.where(sel, cut, lengths)
    right_len = jnp.where(sel, rest, lengths)
    right_lows = jnp.where(sel, lows + cut, lows)

    lo2 = jnp.concatenate([lows, right_lows], axis=1)
    ln2 = jnp.concatenate([left_len, right_len], axis=1)
    if out_capacity != 2 * cap:
        raise ValueError(
            f"split: out_capacity {out_capacity} != 2*cap {2 * cap}; the "
            "blocked child layout requires the output to be exactly twice "
            "the (compacted) input pool -- compact to out_capacity//2 first")
    return lo2, ln2, 2 * n
