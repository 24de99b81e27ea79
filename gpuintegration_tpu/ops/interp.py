"""Device-callable interpolators for stateful integrands.

Re-expression of the reference's managed-memory interpolators
(reference: common/cuda/Interp1D.cuh:17-251, Interp2D.cuh:16-60+,
Interp3D.cuh), used by the physics integrands in its tests (cosmology HMF
model, test/cuda/pagani/model.cu + data/HMF_t.dump).

Design: each interpolator is a pytree (registered dataclass) whose leaves
are device arrays -- the JAX analogue of shallow-copying functor state to
the GPU (cudaMemoryUtil.h:345-353).  Evaluation is traceable and batched;
closures over an interpolator are valid integrands anywhere in the
framework.  Semantics parity:

* clamped evaluation at the domain edges (Interp1D.cuh do_clamp/clamp),
* binary-search index location on arbitrary monotone knot grids
  (IndexRange search -> jnp.searchsorted),
* (bi/tri)linear interpolation on the cell.

Serialisation: ``to_text``/``from_text`` read and write the reference's
hexfloat dump format (str_to_doubles.hh:9-20: whitespace-separated C99
hexfloats, first number = count) so existing data files interchange.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _parse_doubles(text: str) -> np.ndarray:
    """Parse whitespace-separated (hex)float doubles
    (reference: common/cuda/str_to_doubles.hh:9-20)."""
    return np.array([float.fromhex(t) if ("x" in t or "X" in t)
                     else float(t) for t in text.split()], dtype=np.float64)


def _format_doubles(vals: np.ndarray) -> str:
    return " ".join(float(v).hex() for v in np.asarray(vals).ravel())


def _parse_lines(text: str, n_lines: int, what: str) -> list:
    """Split a reference-format dump into exactly ``n_lines`` non-empty
    lines of hexfloat doubles (the reference reads one std::getline per
    array: Interp1D.cuh:226-233, Interp2D.cuh:172-182)."""
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if len(lines) != n_lines:
        raise ValueError(
            f"{what} dump needs {n_lines} non-empty lines "
            f"(got {len(lines)})")
    return [_parse_doubles(ln) for ln in lines]


def _ascending(knots, payloads, axis=0):
    """Normalise a knot axis to ascending order at construction time
    (searchsorted assumes ascending; a descending grid silently
    extrapolated through the wrong cell).  Descending grids are flipped
    with their payloads along ``axis``; non-monotone grids rejected."""
    kn = np.asarray(knots)
    d = np.diff(kn)
    if (d > 0).all():
        return knots, tuple(payloads)
    if (d < 0).all():
        return (knots[::-1],
                tuple(jnp.flip(p, axis=axis) for p in payloads))
    raise ValueError("knot grid must be strictly monotone")


def _locate(knots: jax.Array, x: jax.Array) -> jax.Array:
    """Index i such that knots[i] <= x < knots[i+1], clamped to a valid
    cell; equivalent to the reference's shrinking IndexRange binary search
    (Interp1D.cuh:55-120)."""
    idx = jnp.searchsorted(knots, x, side="right") - 1
    return jnp.clip(idx, 0, knots.shape[0] - 2)


# Knot-count ceilings under which the dense hat-basis contraction (a
# (K, batch) matmul against the table) is used instead of searchsorted +
# dynamic gathers.  On the TPU runtime, eval-batch-sized dynamic gathers
# serialize (~1 s per 8M-element f64 gather) and the searchsorted/gather
# integrand path has crashed the axon worker outright; a K-wide dense
# contraction rides the MXU instead.  Above these ceilings the per-point
# flop cost of the dense form outgrows the cell cost and the TWO-LEVEL
# lookup path takes over (round 5, _TWOLEVEL_MAX below) -- still
# gather-free; the legacy search+gather eval() survives only past
# _TWOLEVEL_MAX.
_DENSE_MAX_1D = 4096
_DENSE_MAX_2D = 16384     # nx * ny cells
_DENSE_MAX_3D = 65536     # nx * ny * nz cells

# Ceiling for the two-level lookup path that serves tables ABOVE the
# dense ceilings (round 5).  Flattened tables up to this many entries
# evaluate via hierarchical one-hot cell location + one-hot row fetches
# (the vegas._edge_lookup / pallas_lookup mold): no searchsorted, no
# dynamic gathers anywhere -- the gather path serialized (~1 s per
# 8M-element f64 gather) and crashed the axon worker at rule-eval batch
# sizes.  Cost scales as O(K/_PF_L) MXU-contraction per point, so the
# practical sweet spot is <= ~2^19 entries (a 512x512 Interp2D measures
# ~a few hundred Genz-equivalents per eval on TPU -- probe with
# workspace.measure_eval_cost and pass eval_cost=); beyond _TWOLEVEL_MAX
# the per-point one-hot row grows past useful chunk sizes and the
# legacy search+gather eval() remains (documented hazard).
_TWOLEVEL_MAX = 1 << 21
_PF_L = 128            # fine-level fan-out (one MXU lane tile)

# Per-chunk f32/f64 element budget for dense-path temporaries.  Rule-eval
# batches reach tens of millions of points; an unchunked (table_axis,
# batch) temp at that size OOMs HBM (a 33M-point batch against a 64x32
# table compiled to a 16 GB temp once lane padding hit the minor 32-wide
# axis).  Chunking with lax.map bounds every temp to ~tens of MB while
# keeping each slab a full MXU matmul.
_DENSE_CHUNK_ELEMS = 16 * 1024 * 1024

# Contraction dtypes for the dense path, keyed by the interpolator's
# static ``precision`` field.  "f64" (default) keeps the historical
# bit-exact behaviour.  "f32" is the mixed-precision fast path for
# table-driven integrands: the hat weights and the table matmul run in
# f32 (TPU-native; the f64 forms are ~5x-emulated) at
# Precision.HIGHEST so the MXU does exact f32 rather than truncating
# to bf16, and the result widens back to f64 at the call boundary.
# Interpolation error becomes ~1e-7 relative (f32 eps on O(1) hat
# weights and table values) -- below the intrinsic accuracy of
# measured physics tables, and far below deep-run tolerances down to
# 1e-6 (equivalence vs the f64 path is pinned in
# tests/test_interp.py::TestPrecisionF32).  Rule accumulation
# downstream stays f64 regardless: only the table lookup narrows.
_PRECISIONS = ("f64", "f32")


def _contract_dtype(precision: str):
    if precision not in _PRECISIONS:
        raise ValueError(
            f"precision must be one of {_PRECISIONS}, got {precision!r}")
    return jnp.float64 if precision == "f64" else jnp.float32


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul at HIGHEST precision: exact in f64 (unchanged semantics)
    and exact-f32 on the MXU in the mixed-precision path (default
    precision would truncate f32 operands to bf16 on TPU)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _hat_weights_t(knots: jax.Array, x: jax.Array, dt=None) -> jax.Array:
    """Partition-of-unity linear hat weights, DIMS-MAJOR: shape ``(K, N)``
    for flat ``x`` of shape ``(N,)``.

    ``sum_k w_k(x) * z_k`` equals clamped piecewise-linear interpolation
    of ``(knots, z)`` for x inside [knots[0], knots[-1]] (callers clamp
    first).  Exactly two weights are nonzero per point; at a knot the
    weight is exactly 1 so knot values reproduce bitwise.  Dense form of
    the reference's search-then-lerp (Interp1D.cuh:55-120), chosen so
    interpolated integrands lower to matmuls rather than per-point
    gathers on TPU.  The knot axis is MAJOR (sublane) so the wide batch
    axis rides the 128-lane minor dimension unpadded — a (N, 32)-shaped
    layout pads 4x on TPU and has OOMed at rule-eval batch sizes.

    ``dt``: optional narrower dtype for the divide/min/clip stage of the
    mixed-precision path.  The x-knot SUBTRACTIONS always run in the
    input dtype (f64) and only the differences narrow — narrowing x
    itself first loses the cell-relative position to cancellation at
    large grid offsets (eps_f32*|x|/cell_width reached 1e-5-scale weight
    error on measured tables), while narrowed differences keep the
    weight accurate to ~f32 eps of the weight itself."""
    lo = jnp.concatenate([knots[:1] - 1.0, knots[:-1]])   # knots[k-1]
    hi = jnp.concatenate([knots[1:], knots[-1:] + 1.0])   # knots[k+1]
    xk = x[None, :]
    num_r = xk - lo[:, None]
    num_f = hi[:, None] - xk
    den_r = knots - lo
    den_f = hi - knots
    if dt is not None:
        num_r, num_f = num_r.astype(dt), num_f.astype(dt)
        den_r, den_f = den_r.astype(dt), den_f.astype(dt)
    rising = num_r / den_r[:, None]
    falling = num_f / den_f[:, None]
    return jnp.clip(jnp.minimum(rising, falling), 0.0, 1.0)


def _f32_chunks(v: jax.Array, exact: bool) -> list:
    """Split an f64 array into f32 chunks whose f64 sum reconstructs it
    EXACTLY (53 mantissa bits <= 3 x 24): selection by one-hot matmul is
    linear, so fetching each chunk exactly (one-hot rows at HIGHEST make
    every f32 product exact) and summing in f64 fetches the exact f64
    value -- the trick that keeps the two-level path gather-free while
    fetching table values exactly (pinned bitwise in
    tests/test_interp.py::TestTwoLevelLookup).  ``exact=False`` (the
    precision='f32' fast path) keeps a single f32(v) chunk."""
    c1 = v.astype(jnp.float32)
    if not exact:
        return [c1]
    r1 = v - c1.astype(jnp.float64)
    c2 = r1.astype(jnp.float32)
    c3 = (r1 - c2.astype(jnp.float64)).astype(jnp.float32)
    return [c1, c2, c3]


def _pair_rows(vals: jax.Array, exact: bool):
    """Precompute the (H, 2 * L * nchunks) row table for _pair_fetch:
    row h holds [vals[h*L + j] | vals[h*L + j + 1]] per chunk, with the
    last entry's right neighbour repeating vals[-1] (so cell K-1 -- a
    clamped query exactly at the top knot -- lerps to the edge value)."""
    K = vals.shape[0]
    L = _PF_L
    H = -(-K // L)
    pad = H * L - K
    right_src = jnp.concatenate([vals[1:], vals[-1:]])
    parts = []
    for src in (vals, right_src):
        for c in _f32_chunks(src, exact):
            parts.append(jnp.pad(c, (0, pad)).reshape(H, L))
    return jnp.concatenate(parts, axis=1), H   # (H, 2*L*nc)


def _pair_fetch(rows_T, H, idx, exact, out_dtype):
    """(vals[idx], vals[idx+1]) for flat int32 ``idx`` without gathers:
    one (N, H) one-hot matmul fetches the L-wide row pair, one L-wide
    one-hot dot on the VPU picks the entry (vegas._edge_lookup mold,
    vegasT.cuh:188-235 analogue).  Exact f64 values via _f32_chunks
    when ``exact`` (every product/sum is exact); single-chunk f32
    otherwise."""
    f32 = jnp.float32
    L = _PF_L
    nc = 3 if exact else 1
    hi = idx // L
    lo = idx - hi * L
    oh_hi = (hi[:, None] == jnp.arange(H, dtype=jnp.int32)).astype(f32)
    rows = _mm(oh_hi, rows_T)                    # (N, 2*L*nc)
    oh_lo = (lo[:, None] == jnp.arange(L, dtype=jnp.int32)).astype(f32)
    out = []
    for side in range(2):
        acc = jnp.zeros(idx.shape, out_dtype)
        for c in range(nc):
            col = (side * nc + c) * L
            acc = acc + jnp.sum(
                rows[:, col:col + L] * oh_lo, axis=1).astype(out_dtype)
        out.append(acc)
    return out[0], out[1]


def _cell_locate_dense(knots: jax.Array, x: jax.Array) -> jax.Array:
    """searchsorted-equivalent cell index (knots[i] <= x < knots[i+1],
    clipped to [0, K-2]) with NO gathers and no (K, N) blowup: a direct
    count against the (H,) block starts, an exact-f64 one-hot fetch of
    the block's L knots, and a count within the row.  Equals _locate
    bitwise for clamped x (counts and fetches are exact; pinned in
    tests)."""
    K = knots.shape[0]
    if K <= 4096:
        i = jnp.sum((knots[:, None] <= x[None, :]).astype(jnp.int32),
                    axis=0) - 1
        return jnp.clip(i, 0, K - 2)
    L = _PF_L
    H = -(-K // L)
    starts = knots[::L]                          # (H,)
    hi = jnp.clip(jnp.sum(
        (starts[:, None] <= x[None, :]).astype(jnp.int32), axis=0) - 1,
        0, H - 1)
    # fetch the block's knots exactly.  Pad with the TOP knot (finite --
    # an inf pad would 0*inf-NaN the one-hot matmul): for x < knots[-1]
    # pads are never counted <= x, and for x == knots[-1] the overcount
    # lands past K-2 where the final clip restores _locate's answer.
    pad = H * L - K
    kp = jnp.pad(knots, (0, pad), mode="edge")
    parts = [c.reshape(H, L) for c in _f32_chunks(kp, True)]
    oh_hi = (hi[:, None] == jnp.arange(H, dtype=jnp.int32)).astype(
        jnp.float32)
    rows = _mm(oh_hi, jnp.concatenate(parts, axis=1))   # (N, 3L)
    rowk = (rows[:, :L].astype(jnp.float64)
            + rows[:, L:2 * L].astype(jnp.float64)
            + rows[:, 2 * L:].astype(jnp.float64))      # exact f64
    lo = jnp.clip(jnp.sum(
        (rowk <= x[:, None]).astype(jnp.int32), axis=1) - 1, 0, L - 1)
    return jnp.clip(hi * L + lo, 0, K - 2)


def _chunked_flat_eval(kernel, arrays, per_point_elems):
    """Run ``kernel(tuple_of_flat_chunks) -> flat_chunk`` over the
    flattened, broadcast-together ``arrays``, slab by slab, so dense-path
    temporaries stay within ``_DENSE_CHUNK_ELEMS`` elements.

    Static-shape discipline: the chunk count and padding are computed
    from static shapes at trace time; the loop is a ``lax.map`` (one
    compiled body reused across slabs).  Small batches take the direct
    single-call path with no padding."""
    shape = jnp.broadcast_shapes(*(a.shape for a in arrays))
    flat = [jnp.broadcast_to(a, shape).reshape(-1) for a in arrays]
    n = flat[0].shape[0] if shape else 1
    chunk = max(512, _DENSE_CHUNK_ELEMS // max(per_point_elems, 1))
    if n <= chunk:
        return kernel(tuple(f for f in flat)).reshape(shape)
    nslabs = -(-n // chunk)
    pad = nslabs * chunk - n
    slabs = [jnp.pad(f, (0, pad), mode="edge").reshape(nslabs, chunk)
             for f in flat]
    out = jax.lax.map(kernel, tuple(slabs))
    return out.reshape(-1)[:n].reshape(shape)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Interp1D:
    """Clamped linear interpolation through (xs, zs).

    ``precision="f32"`` opts the dense contraction into the
    mixed-precision fast path (see _PRECISIONS); storage and the public
    call signature stay f64."""

    xs: jax.Array
    zs: jax.Array
    precision: str = "f64"

    def __init__(self, xs, zs, *, precision: str = "f64"):
        xs = jnp.asarray(xs, jnp.float64)
        zs = jnp.asarray(zs, jnp.float64)
        if xs.ndim != 1 or xs.shape != zs.shape:
            raise ValueError("Interp1D needs equal-length 1-D xs/zs")
        _contract_dtype(precision)
        xs, (zs,) = _ascending(xs, (zs,))
        self.xs = xs
        self.zs = zs
        self.precision = precision

    def with_precision(self, precision: str) -> "Interp1D":
        """Same table, different dense-contraction precision (static
        pytree aux, so jit specializes per choice)."""
        _contract_dtype(precision)
        obj = type(self).__new__(type(self))
        obj.xs, obj.zs = self.xs, self.zs
        obj.precision = precision
        return obj

    def min_x(self):
        return self.xs[0]

    def max_x(self):
        return self.xs[-1]

    def clamp(self, x):
        return jnp.clip(x, self.xs[0], self.xs[-1])

    def eval(self, x):
        i = _locate(self.xs, x)
        x0 = self.xs[i]
        x1 = self.xs[i + 1]
        y0 = self.zs[i]
        y1 = self.zs[i + 1]
        t = (x - x0) / (x1 - x0)
        return y0 + t * (y1 - y0)

    def __call__(self, x):
        """Clamped evaluation (the reference's operator() clamps out-of-
        range queries to the edge values, Interp1D.cuh clamp/do_clamp).

        Small tables evaluate gather-free via the dense hat contraction
        (see _hat_weights_t); larger tables (up to _TWOLEVEL_MAX knots)
        via the gather-free two-level lookup: exact cells + fetches,
        values matching eval() to FMA-contraction roundoff."""
        xc = self.clamp(jnp.asarray(x, jnp.float64))
        nk = self.xs.shape[0]
        if nk <= _DENSE_MAX_1D:
            dt = _contract_dtype(self.precision)

            def kern(args):
                (xf,) = args
                w = _hat_weights_t(self.xs, xf, dt)
                return _mm(self.zs.astype(dt), w)
            out = _chunked_flat_eval(kern, (xc,), nk)
            return out.astype(jnp.float64)
        if nk <= _TWOLEVEL_MAX:
            # beyond-dense-ceiling tables: gather-free two-level lookup
            # -- exact cells/fetches, the same lerp arithmetic as eval()
            # (agrees to FMA-contraction roundoff, ~1 ulp of each term,
            # since XLA may fuse the two programs' multiply-adds
            # differently); precision='f32' narrows the
            # VALUE fetch only (knots stay exact, so the cell and t are
            # f64 -- the dense path's narrow-differences discipline)
            exact = self.precision == "f64"
            vdt = jnp.float64 if exact else jnp.float32
            kT, Hk = _pair_rows(self.xs, True)
            zT, Hz = _pair_rows(self.zs, exact)

            def kern(args):
                (xf,) = args
                i = _cell_locate_dense(self.xs, xf)
                x0, x1 = _pair_fetch(kT, Hk, i, True, jnp.float64)
                y0, y1 = _pair_fetch(zT, Hz, i, exact, vdt)
                t = (xf - x0) / (x1 - x0)
                if not exact:
                    t = t.astype(jnp.float32)
                return (y0 + t * (y1 - y0)).astype(jnp.float64)
            return _chunked_flat_eval(
                kern, (xc,), 4 * Hk + 4 * Hz + 16 * _PF_L)
        return self.eval(xc)

    # -- hexfloat (de)serialisation parity ---------------------------------
    @classmethod
    def from_text(cls, text: str) -> "Interp1D":
        """Reference stream format: one line of hexfloat xs, one line of
        zs (Interp1D.cuh:226-233 reads one std::getline per array through
        str_to_doubles).  A single-line dump is read as this package's
        legacy round-1 format (count, xs..., count, zs...)."""
        lines = [ln for ln in text.splitlines() if ln.strip()]
        if len(lines) == 1:
            vals = _parse_doubles(text)
            n = int(vals[0])
            xs = vals[1:1 + n]
            m = int(vals[1 + n])
            zs = vals[2 + n:2 + n + m]
            if m != n:
                raise ValueError("xs/zs length mismatch in Interp1D dump")
            return cls(xs, zs)
        xs, zs = _parse_lines(text, 2, "Interp1D")
        if xs.shape != zs.shape:
            raise ValueError("xs/zs length mismatch in Interp1D dump")
        return cls(xs, zs)

    def to_text(self) -> str:
        """Reference dump format: xs line, zs line (hexfloats)."""
        return (f"{_format_doubles(np.asarray(self.xs))}\n"
                f"{_format_doubles(np.asarray(self.zs))}\n")

    def tree_flatten(self):
        return (self.xs, self.zs), self.precision

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        obj.xs, obj.zs = leaves
        obj.precision = aux if aux is not None else "f64"
        return obj


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Interp2D:
    """Bilinear interpolation on a rectilinear (xs, ys) grid.

    zs has shape (len(ys), len(xs)) -- row-major over ys like the
    reference's interpT table (Interp2D.cuh ctor)."""

    xs: jax.Array
    ys: jax.Array
    zs: jax.Array
    precision: str = "f64"

    def __init__(self, xs, ys, zs, *, precision: str = "f64"):
        xs = jnp.asarray(xs, jnp.float64)
        ys = jnp.asarray(ys, jnp.float64)
        zs = jnp.asarray(zs, jnp.float64)
        if zs.shape != (ys.shape[0], xs.shape[0]):
            raise ValueError(f"zs shape {zs.shape} != (len(ys), len(xs))")
        _contract_dtype(precision)
        xs, (zs,) = _ascending(xs, (zs,), axis=1)
        ys, (zs,) = _ascending(ys, (zs,), axis=0)
        self.xs, self.ys, self.zs = xs, ys, zs
        self.precision = precision

    def with_precision(self, precision: str) -> "Interp2D":
        """Same table, different dense-contraction precision."""
        _contract_dtype(precision)
        obj = type(self).__new__(type(self))
        obj.xs, obj.ys, obj.zs = self.xs, self.ys, self.zs
        obj.precision = precision
        return obj

    def clamp(self, x, y):
        return (jnp.clip(x, self.xs[0], self.xs[-1]),
                jnp.clip(y, self.ys[0], self.ys[-1]))

    def eval(self, x, y):
        i = _locate(self.xs, x)
        j = _locate(self.ys, y)
        x0, x1 = self.xs[i], self.xs[i + 1]
        y0, y1 = self.ys[j], self.ys[j + 1]
        q00 = self.zs[j, i]
        q01 = self.zs[j, i + 1]
        q10 = self.zs[j + 1, i]
        q11 = self.zs[j + 1, i + 1]
        tx = (x - x0) / (x1 - x0)
        ty = (y - y0) / (y1 - y0)
        top = q00 + tx * (q01 - q00)
        bot = q10 + tx * (q11 - q10)
        return top + ty * (bot - top)

    def __call__(self, x, y):
        x = jnp.asarray(x, jnp.float64)
        y = jnp.asarray(y, jnp.float64)
        xc, yc = self.clamp(x, y)
        nx, ny = self.xs.shape[0], self.ys.shape[0]
        if nx * ny <= _DENSE_MAX_2D:
            dt = _contract_dtype(self.precision)

            def kern(args):
                xf, yf = args
                wx = _hat_weights_t(self.xs, xf, dt)  # (nx, N)
                wy = _hat_weights_t(self.ys, yf, dt)  # (ny, N)
                t = _mm(self.zs.astype(dt), wx)       # (ny, N)
                return jnp.sum(t * wy, axis=0)        # (N,)
            out = _chunked_flat_eval(kern, (xc, yc), nx + 2 * ny)
            return out.astype(jnp.float64)
        if nx * ny <= _TWOLEVEL_MAX:
            # beyond-ceiling tables (e.g. 512x512): gather-free
            # two-level lookup -- exact cells/fetches, values matching
            # eval() to FMA roundoff; f32 narrows the corner fetch only
            exact = self.precision == "f64"
            vdt = jnp.float64 if exact else jnp.float32
            xT, Hx = _pair_rows(self.xs, True)
            yT, Hy = _pair_rows(self.ys, True)
            zT, Hz = _pair_rows(self.zs.reshape(-1), exact)

            def kern(args):
                xf, yf = args
                i = _cell_locate_dense(self.xs, xf)
                j = _cell_locate_dense(self.ys, yf)
                x0, x1 = _pair_fetch(xT, Hx, i, True, jnp.float64)
                y0, y1 = _pair_fetch(yT, Hy, j, True, jnp.float64)
                base = j * nx + i
                q00, q01 = _pair_fetch(zT, Hz, base, exact, vdt)
                q10, q11 = _pair_fetch(zT, Hz, base + nx, exact, vdt)
                tx = (xf - x0) / (x1 - x0)
                ty = (yf - y0) / (y1 - y0)
                if not exact:
                    tx, ty = (tx.astype(jnp.float32),
                              ty.astype(jnp.float32))
                top = q00 + tx * (q01 - q00)
                bot = q10 + tx * (q11 - q10)
                return (top + ty * (bot - top)).astype(jnp.float64)
            return _chunked_flat_eval(
                kern, (xc, yc),
                4 * (Hx + Hy) + 8 * Hz + 16 * _PF_L)
        return self.eval(xc, yc)

    # -- hexfloat (de)serialisation parity ---------------------------------
    @classmethod
    def from_text(cls, text: str) -> "Interp2D":
        """Reference stream format: xs line (cols), ys line (rows), table
        line of rows*cols values, x-fastest (Interp2D.cuh:172-190 reads
        three std::getline's; interpT is indexed row*cols + col).  This
        is the format of the reference's data/HMF_t.dump."""
        xs, ys, zs = _parse_lines(text, 3, "Interp2D")
        nx, ny = xs.shape[0], ys.shape[0]
        if zs.shape[0] != nx * ny:
            raise ValueError(
                f"Interp2D table length {zs.shape[0]} != "
                f"len(xs)*len(ys) = {nx * ny}")
        return cls(xs, ys, zs.reshape(ny, nx))

    def to_text(self) -> str:
        """Reference dump format: xs line, ys line, table line."""
        return (f"{_format_doubles(np.asarray(self.xs))}\n"
                f"{_format_doubles(np.asarray(self.ys))}\n"
                f"{_format_doubles(np.asarray(self.zs))}\n")

    def tree_flatten(self):
        return (self.xs, self.ys, self.zs), self.precision

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        obj.xs, obj.ys, obj.zs = leaves
        obj.precision = aux if aux is not None else "f64"
        return obj


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Interp3D:
    """Trilinear interpolation on a rectilinear (xs, ys, zs) grid;
    vals has shape (len(zs), len(ys), len(xs))."""

    xs: jax.Array
    ys: jax.Array
    zs: jax.Array
    vals: jax.Array
    precision: str = "f64"

    def __init__(self, xs, ys, zs, vals, *, precision: str = "f64"):
        xs = jnp.asarray(xs, jnp.float64)
        ys = jnp.asarray(ys, jnp.float64)
        zs = jnp.asarray(zs, jnp.float64)
        vals = jnp.asarray(vals, jnp.float64)
        if vals.shape != (zs.shape[0], ys.shape[0], xs.shape[0]):
            raise ValueError(
                f"vals shape {vals.shape} != (len(zs), len(ys), len(xs))")
        _contract_dtype(precision)
        xs, (vals,) = _ascending(xs, (vals,), axis=2)
        ys, (vals,) = _ascending(ys, (vals,), axis=1)
        zs, (vals,) = _ascending(zs, (vals,), axis=0)
        self.xs, self.ys, self.zs, self.vals = xs, ys, zs, vals
        self.precision = precision

    def with_precision(self, precision: str) -> "Interp3D":
        """Same table, different dense-contraction precision."""
        _contract_dtype(precision)
        obj = type(self).__new__(type(self))
        obj.xs, obj.ys, obj.zs, obj.vals = (
            self.xs, self.ys, self.zs, self.vals)
        obj.precision = precision
        return obj

    def __call__(self, x, y, z):
        x = jnp.clip(jnp.asarray(x, jnp.float64), self.xs[0], self.xs[-1])
        y = jnp.clip(jnp.asarray(y, jnp.float64), self.ys[0], self.ys[-1])
        z = jnp.clip(jnp.asarray(z, jnp.float64), self.zs[0], self.zs[-1])
        nx, ny, nz = (self.xs.shape[0], self.ys.shape[0], self.zs.shape[0])
        if nx * ny * nz <= _DENSE_MAX_3D:
            dt = _contract_dtype(self.precision)

            def kern(args):
                xf, yf, zf = args
                wx = _hat_weights_t(self.xs, xf, dt)
                wy = _hat_weights_t(self.ys, yf, dt)
                wz = _hat_weights_t(self.zs, zf, dt)
                # (nz*ny, nx) @ (nx, N): one MXU matmul over the x axis
                t = _mm(self.vals.astype(dt).reshape(nz * ny, nx),
                        wx).reshape(nz, ny, -1)
                t = jnp.sum(t * wy[None, :, :], axis=1)   # (nz, N)
                return jnp.sum(t * wz, axis=0)            # (N,)
            out = _chunked_flat_eval(
                kern, (x, y, z), nx + ny + nz + 2 * nz * ny)
            return out.astype(jnp.float64)
        if nx * ny * nz <= _TWOLEVEL_MAX:
            # beyond-ceiling tables: gather-free two-level lookup --
            # exact cells/fetches, eval()'s lerp order (agrees to FMA
            # roundoff); f32 narrows the 8 corner-value fetches only
            exact = self.precision == "f64"
            vdt = jnp.float64 if exact else jnp.float32
            xT, Hx = _pair_rows(self.xs, True)
            yT, Hy = _pair_rows(self.ys, True)
            zT, Hz = _pair_rows(self.zs, True)
            vT, Hv = _pair_rows(self.vals.reshape(-1), exact)

            def kern(args):
                xf, yf, zf = args
                i = _cell_locate_dense(self.xs, xf)
                j = _cell_locate_dense(self.ys, yf)
                k = _cell_locate_dense(self.zs, zf)
                x0, x1 = _pair_fetch(xT, Hx, i, True, jnp.float64)
                y0, y1 = _pair_fetch(yT, Hy, j, True, jnp.float64)
                z0, z1 = _pair_fetch(zT, Hz, k, True, jnp.float64)
                base = (k * ny + j) * nx + i
                v000, v001 = _pair_fetch(vT, Hv, base, exact, vdt)
                v010, v011 = _pair_fetch(vT, Hv, base + nx, exact, vdt)
                v100, v101 = _pair_fetch(vT, Hv, base + nx * ny, exact,
                                         vdt)
                v110, v111 = _pair_fetch(vT, Hv, base + nx * ny + nx,
                                         exact, vdt)
                tx = (xf - x0) / (x1 - x0)
                ty = (yf - y0) / (y1 - y0)
                tz = (zf - z0) / (z1 - z0)
                if not exact:
                    tx, ty, tz = (tx.astype(jnp.float32),
                                  ty.astype(jnp.float32),
                                  tz.astype(jnp.float32))

                def lerp(a, b, t):
                    return a + t * (b - a)

                c00 = lerp(v000, v001, tx)
                c01 = lerp(v010, v011, tx)
                c10 = lerp(v100, v101, tx)
                c11 = lerp(v110, v111, tx)
                c0 = lerp(c00, c01, ty)
                c1 = lerp(c10, c11, ty)
                return lerp(c0, c1, tz).astype(jnp.float64)
            return _chunked_flat_eval(
                kern, (x, y, z),
                4 * (Hx + Hy + Hz) + 16 * Hv + 16 * _PF_L)
        return self.eval(x, y, z)

    def eval(self, x, y, z):
        i = _locate(self.xs, x)
        j = _locate(self.ys, y)
        k = _locate(self.zs, z)
        tx = (x - self.xs[i]) / (self.xs[i + 1] - self.xs[i])
        ty = (y - self.ys[j]) / (self.ys[j + 1] - self.ys[j])
        tz = (z - self.zs[k]) / (self.zs[k + 1] - self.zs[k])

        def lerp(a, b, t):
            return a + t * (b - a)

        c00 = lerp(self.vals[k, j, i], self.vals[k, j, i + 1], tx)
        c01 = lerp(self.vals[k, j + 1, i], self.vals[k, j + 1, i + 1], tx)
        c10 = lerp(self.vals[k + 1, j, i], self.vals[k + 1, j, i + 1], tx)
        c11 = lerp(self.vals[k + 1, j + 1, i],
                   self.vals[k + 1, j + 1, i + 1], tx)
        c0 = lerp(c00, c01, ty)
        c1 = lerp(c10, c11, ty)
        return lerp(c0, c1, tz)

    # -- hexfloat (de)serialisation parity ---------------------------------
    @classmethod
    def from_text(cls, text: str) -> "Interp3D":
        """Four hexfloat lines: xs, ys, zs, vals (x-fastest ordering,
        matching the reference's interpT index x + nx*y + nx*ny*z,
        Interp3D.cuh:199-204 -- the natural extension of the 2D stream
        format; the reference's Interp3D has the same str_to_doubles
        machinery but no committed operator>>)."""
        xs, ys, zs, vals = _parse_lines(text, 4, "Interp3D")
        nx, ny, nz = xs.shape[0], ys.shape[0], zs.shape[0]
        if vals.shape[0] != nx * ny * nz:
            raise ValueError(
                f"Interp3D table length {vals.shape[0]} != "
                f"len(xs)*len(ys)*len(zs) = {nx * ny * nz}")
        return cls(xs, ys, zs, vals.reshape(nz, ny, nx))

    def to_text(self) -> str:
        return (f"{_format_doubles(np.asarray(self.xs))}\n"
                f"{_format_doubles(np.asarray(self.ys))}\n"
                f"{_format_doubles(np.asarray(self.zs))}\n"
                f"{_format_doubles(np.asarray(self.vals))}\n")

    def tree_flatten(self):
        return (self.xs, self.ys, self.zs, self.vals), self.precision

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        obj.xs, obj.ys, obj.zs, obj.vals = leaves
        obj.precision = aux if aux is not None else "f64"
        return obj
