"""CSV/structured iteration recorders.

TPU analogue of the reference's Recorder<debug, append> CSV sink
(reference: common/cuda/cudaDebugUtil.h:18-37) and the iteration ledgers it
writes (cuda_pagani_iters.csv: Workspace.cuh:171-241;
cuda_pagani_time_breakdown.csv: Workspace.cuh:199-351).
"""
from __future__ import annotations

import io
import sys
from typing import IO


class IterationRecorder:
    """Collects one row per adaptive iteration; optionally streams CSV."""

    COLUMNS = ("it", "estimate", "errorest", "festimate", "ferrorest",
               "nregions", "fnregions", "time_ms")

    def __init__(self, sink: IO | str | None = None, echo: bool = False):
        self.rows: list[dict] = []
        self.echo = echo
        self._own = False
        if isinstance(sink, str):
            self._fh = open(sink, "w")
            self._own = True
        else:
            self._fh = sink
        if self._fh is not None:
            print(",".join(self.COLUMNS), file=self._fh)

    def record(self, **kw):
        self.rows.append(kw)
        line = ",".join(str(kw.get(c, "")) for c in self.COLUMNS)
        if self._fh is not None:
            print(line, file=self._fh)
        if self.echo:
            print(line, file=sys.stderr)

    def close(self):
        if self._own and self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def dump_regions_csv(lows, lengths, n: int, outfile: IO,
                     blocked: bool = False):
    """Dump a region pool's population to CSV, one row per real region:
    ``id, low_0..low_{d-1}, length_0..length_{d-1}``.

    The TPU analogue of the reference's Snapshot region dumper
    (reference: cuda/pagani/quad/quad.h:78-152), for offline analysis of
    how the adaptive subdivision distributed regions.  ``blocked`` selects
    the post-split block layout (real regions fill the first n/2 slots of
    each static pool half -- region_pool.block_mask).

    To dump a Workspace's live pool, prefer ``ws.make_checkpoint()`` and
    dump ``ck.lows``/``ck.lengths`` -- it handles BOTH pool layouts
    (single-chip ``(lows, lengths, n, blocked)`` and the mesh runs'
    per-shard ``("mesh", ...)`` 6-tuple, whose keep indexing differs).
    """
    import numpy as np
    lo = np.asarray(lows)
    ln = np.asarray(lengths)
    ndim, cap = lo.shape
    if blocked:
        half = cap // 2
        keep = np.concatenate([np.arange(n // 2), half + np.arange(n // 2)])
    else:
        keep = np.arange(n)
    cols = ([f"low_{d}" for d in range(ndim)]
            + [f"length_{d}" for d in range(ndim)])
    print("id," + ",".join(cols), file=outfile)
    for j, i in enumerate(keep):
        vals = [f"{lo[d, i]:.17e}" for d in range(ndim)]
        vals += [f"{ln[d, i]:.17e}" for d in range(ndim)]
        print(f"{j}," + ",".join(vals), file=outfile)
