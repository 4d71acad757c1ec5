"""Host-CPU parallelism plumbing.

Tile-parallel encode/decode (reference parity: the ThreadPool over
TileProcessors, CodeStreamCompress.cpp:615 / CodeStreamDecompress.cpp:511)
runs tiles on Python threads; the heavy work happens inside native calls
that release the GIL. To avoid OpenMP oversubscription, each tile worker
declares how many OMP threads its native calls may use via this
thread-local (omp_set_num_threads is per-calling-thread in libgomp)."""

from __future__ import annotations

import os
import threading

_TLS = threading.local()


def set_tile_threads(n: int) -> None:
    _TLS.n = int(n)


def tile_threads() -> int:
    """0 = let OpenMP use its default team size."""
    return getattr(_TLS, "n", 0)


def host_threads(param: int = 0) -> int:
    if param > 0:
        return param
    return len(os.sched_getaffinity(0)) if hasattr(os, "sched_getaffinity") else (os.cpu_count() or 1)
