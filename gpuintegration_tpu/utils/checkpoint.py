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
