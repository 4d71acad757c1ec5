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


def tune_malloc() -> bool:
    """Keep large allocations in the glibc arena instead of per-call mmap.

    The codec allocates multi-ten-MB planes every frame (MCT outputs, DWT
    packings, T1 batches); glibc serves >128 KiB requests with fresh mmap
    and munmaps them on free, so every frame re-pays soft page faults at
    ~3 GB/s — measured 30-60 ms/frame at 4K, the bulk of the float
    transform stages' gap to the copy roofline. Raising M_MMAP_THRESHOLD
    (and M_TRIM_THRESHOLD, so the grown brk heap is kept) makes the arena
    reuse those blocks. Costs peak-RSS retention; opt out with
    GROK_TPU_MALLOC_REUSE=0.
    """
    if os.environ.get("GROK_TPU_MALLOC_REUSE", "1") == "0":
        return False
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        ok = libc.mallopt(M_MMAP_THRESHOLD, 1 << 29)
        ok &= libc.mallopt(M_TRIM_THRESHOLD, 1 << 29)
        return bool(ok)
    except Exception:
        return False
