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
