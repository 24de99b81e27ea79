"""Checkpoint / resume of integrator state.

The reference has only lightweight in-memory snapshots
(Sub_regions::take_snapshot/load_snapshot, Sub_regions.cuh:219-239; the
VEGAS grid lives on the host each iteration, vegasT.cuh:834-838;
interpolators serialise via hexfloat dumps).  Here the whole integrator
state is a pytree, so checkpointing is trivially complete:

* PaganiCheckpoint: the padded region pool + cumulative ledger -- resume
  feeds the pool back into Workspace.integrate(initial_regions=...).
* VegasState (mcubes.vegas): the importance grid + iteration-weighted
  accumulators -- pass ``state=`` to continue sampling.

Serialisation is plain ``numpy.savez`` (no framework dependency); orbax
works on the same pytrees for multi-host setups.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gpuintegration_tpu.mcubes.vegas import VegasState


@dataclasses.dataclass
class PaganiCheckpoint:
    """Resumable PAGANI state: active region pool + cumulative ledger.

    Vector-valued runs store ``estimate``/``errorest`` as (ncomp,)
    arrays (and ``region_*`` as (n, ncomp)); everything round-trips
    through the same savez fields."""

    lows: np.ndarray          # (n, ndim) active regions, unit space
    lengths: np.ndarray       # (n, ndim)
    estimate: float | np.ndarray  # cumulative ledger EXCLUDING the saved
    errorest: float | np.ndarray  # pool's own sweep (resume re-evaluates
                              #   it: total = ckpt.estimate +
                              #   resumed.estimate)
    nregions: int
    iters: int
    neval: int = 0
    # the saved pool's own sweep, per region (pool order): estimates and
    # two-level refined errors.  Optional -- absent for fused/mesh exits;
    # the partitioned continuation uses them for hottest-first slicing
    # and its early global convergence test.
    region_estimates: np.ndarray | None = None
    region_errorests: np.ndarray | None = None

    @property
    def ledger(self) -> tuple:
        """Seed for Workspace.integrate(ledger=...): resume with the true
        cumulative totals driving every internal decision."""
        return (self.estimate, self.errorest, self.nregions, self.iters,
                self.neval)

    @staticmethod
    def _norm(path: str) -> str:
        # np.savez appends .npz on save but np.load does NOT on load --
        # normalise here so save('/x/ck') / load('/x/ck') round-trips
        return path if str(path).endswith(".npz") else str(path) + ".npz"

    def save(self, path: str):
        path = self._norm(path)
        extra = {}
        if self.region_errorests is not None:
            extra = dict(region_estimates=self.region_estimates,
                         region_errorests=self.region_errorests)
        np.savez(path, lows=self.lows, lengths=self.lengths,
                 estimate=self.estimate, errorest=self.errorest,
                 nregions=self.nregions, iters=self.iters, neval=self.neval,
                 **extra)

    @classmethod
    def load(cls, path: str) -> "PaganiCheckpoint":
        z = np.load(cls._norm(path))

        def scal(v):
            a = np.asarray(v)
            return a if a.ndim else float(a)   # vector ledgers: (ncomp,)

        return cls(lows=z["lows"], lengths=z["lengths"],
                   estimate=scal(z["estimate"]),
                   errorest=scal(z["errorest"]),
                   nregions=int(z["nregions"]), iters=int(z["iters"]),
                   neval=int(z["neval"]) if "neval" in z else 0,
                   region_estimates=(z["region_estimates"]
                                     if "region_estimates" in z else None),
                   region_errorests=(z["region_errorests"]
                                     if "region_errorests" in z else None))


@dataclasses.dataclass
class ContinuationState:
    """Disk-resumable state of Workspace's partitioned continuation.

    A deep-tolerance run (the 6D physics model at 1e-6, 8D Genz at 1e-7)
    spends hours in ``_partitioned_continuation``'s slice queue; this
    packages the banked ledger plus the remaining (error-sorted) work
    queue so the run can stop at a wall-clock budget and resume in a
    later process exactly where it left off -- integral additivity makes
    the recombination exact, so a resumed run certifies the identical
    global test it would have reached in one sitting.  The reference has
    no analogue (its 700-iteration exit just returns unconverged,
    Workspace.cuh:354-357); pass ``state_path=`` to
    ``Workspace.integrate_to_convergence``.

    The queue is stored flattened: region blocks concatenated with
    per-slice counts, plus per-slice stored (est, err) sums -- always
    (nw, ncomp) with ncomp=1 for scalar runs -- depth and exactness
    flags (inexact slices carry apportioned totals the global
    certificate must never fire off).
    """

    fin_est: np.ndarray       # (ncomp,) banked ledger (f64)
    fin_err: np.ndarray       # (ncomp,)
    iters: int
    neval: int
    nregions: int
    nfinished: int
    vec: bool                 # vector-integrand run (result gains
                              #   estimates/errorests arrays)
    epsrel: float             # tolerances the state was built under --
    epsabs: float             #   resume sanity-checks these
    work_lows: np.ndarray     # (sum n_i, ndim) concatenated slice blocks
    work_lengths: np.ndarray  # (sum n_i, ndim)
    work_counts: np.ndarray   # (nw,) regions per slice, queue order
                              #   (COLDEST FIRST -- work.pop() takes the
                              #   hottest, matching the live queue)
    work_est: np.ndarray      # (nw, ncomp) stored slice estimate sums
    work_err: np.ndarray      # (nw, ncomp)
    work_depth: np.ndarray    # (nw,) int
    work_exact: np.ndarray    # (nw,) bool

    @classmethod
    def from_queue(cls, work: list, fin_est, fin_err, iters, neval,
                   nregions, nfinished, vec, epsrel, epsabs
                   ) -> "ContinuationState":
        """Package the live queue (list of (lows, lengths, s_est, s_err,
        depth, exact), queue order preserved)."""
        ncomp = np.atleast_1d(np.asarray(fin_est)).shape[0]
        ndim = (work[0][0].shape[1] if work else 0)
        def cat(i):
            return (np.concatenate([np.asarray(w[i]) for w in work])
                    if work else np.zeros((0, ndim)))
        return cls(
            fin_est=np.atleast_1d(np.asarray(fin_est, np.float64)).copy(),
            fin_err=np.atleast_1d(np.asarray(fin_err, np.float64)).copy(),
            iters=int(iters), neval=int(neval), nregions=int(nregions),
            nfinished=int(nfinished), vec=bool(vec),
            epsrel=float(epsrel), epsabs=float(epsabs),
            work_lows=cat(0), work_lengths=cat(1),
            work_counts=np.array([w[0].shape[0] for w in work], np.int64),
            work_est=np.array([np.atleast_1d(np.asarray(w[2], np.float64))
                               for w in work],
                              np.float64).reshape(len(work), ncomp),
            work_err=np.array([np.atleast_1d(np.asarray(w[3], np.float64))
                               for w in work],
                              np.float64).reshape(len(work), ncomp),
            work_depth=np.array([w[4] for w in work], np.int64),
            work_exact=np.array([w[5] for w in work], bool))

    def to_queue(self) -> list:
        """Rebuild the live work-queue list (queue order preserved)."""
        out, off = [], 0
        for i, n in enumerate(self.work_counts.tolist()):
            lo = self.work_lows[off:off + n]
            ln = self.work_lengths[off:off + n]
            est, err = self.work_est[i], self.work_err[i]
            if not self.vec:
                est, err = float(est[0]), float(err[0])
            out.append((lo, ln, est, err, int(self.work_depth[i]),
                        bool(self.work_exact[i])))
            off += n
        return out

    def save(self, path: str):
        path = PaganiCheckpoint._norm(path)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:   # atomic: a mid-write crash must
            np.savez(fh, **dataclasses.asdict(self))   # not corrupt the
        import os
        os.replace(tmp, path)                          # resumable state

    @classmethod
    def load(cls, path: str) -> "ContinuationState":
        z = np.load(PaganiCheckpoint._norm(path))
        kw = {f.name: z[f.name] for f in dataclasses.fields(cls)}
        for k in ("iters", "neval", "nregions", "nfinished"):
            kw[k] = int(kw[k])
        kw["vec"] = bool(kw["vec"])
        kw["epsrel"], kw["epsabs"] = float(kw["epsrel"]), float(kw["epsabs"])
        return cls(**kw)


def save_vegas_state(state: VegasState, path: str):
    path = PaganiCheckpoint._norm(path)
    np.savez(path, xi=np.asarray(state.xi), si=state.si, swgt=state.swgt,
             schi=state.schi, it0=getattr(state, "it0", 0),
             n_acc=getattr(state, "n_acc", 0))


def load_vegas_state(path: str) -> VegasState:
    z = np.load(PaganiCheckpoint._norm(path))

    def scal(v):
        # vector-integrand states carry (ncomp,) accumulators
        a = np.asarray(v)
        return a if a.ndim else float(a)

    return VegasState(xi=jnp.asarray(z["xi"]), si=scal(z["si"]),
                      swgt=scal(z["swgt"]), schi=scal(z["schi"]),
                      it0=int(z["it0"]) if "it0" in z else 0,
                      n_acc=int(z["n_acc"]) if "n_acc" in z else 0)
