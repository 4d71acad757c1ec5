"""Host-native pipeline kernels (native/pipeline.cpp) with numpy fallback.

The numpy formulations in ops/dwt.py and tile/tile_processor.py stay the
bit-exact reference (and the jax/device path); these bindings are the fast
host mirror, validated sample-exact against them in tests/test_dwt.py.
"""

from __future__ import annotations

import numpy as np

from ..core.cpu import tile_threads

def _nthreads(n: int) -> int:
    """0 means 'unset': resolve via the per-tile thread-local cap."""
    return n if n > 0 else tile_threads()



def get_lib():
    from ..t1.native import get_lib as _gl

    return _gl()


def available() -> bool:
    return get_lib() is not None


def _dwt_geometry(arr, rect, num_levels):
    """Shared guard: "empty" = nothing to do (return arr unchanged),
    "bad" = defer to the numpy path's typed validation, else "ok"."""
    if rect.x1 <= rect.x0 or rect.y1 <= rect.y0:
        return "empty"  # empty canvas rect (corrupt geometry)
    if not (0 <= num_levels <= 38) or rect.height > arr.shape[0] or (
            rect.width > arr.shape[1]):
        return "bad"
    return "ok"


def dwt_forward(arr: np.ndarray, rect, num_levels: int, irreversible: bool,
                num_threads: int = 0) -> np.ndarray | None:
    """In-place multi-level forward DWT; returns arr or None if unsupported."""
    lib = get_lib()
    if lib is None or arr.ndim != 2 or not arr.flags.c_contiguous:
        return None
    g = _dwt_geometry(arr, rect, num_levels)
    if g != "ok":
        return arr if g == "empty" else None
    if irreversible:
        if arr.dtype != np.float32:
            return None
        fn = lib.dwt97_forward
    else:
        if arr.dtype != np.int32:
            return None
        fn = lib.dwt53_forward
    fn(arr, arr.shape[1], rect.x0, rect.y0, rect.x1, rect.y1,
       num_levels, _nthreads(num_threads))
    return arr


def dwt_inverse(arr: np.ndarray, rect, num_levels: int, irreversible: bool,
                num_threads: int = 0) -> np.ndarray | None:
    lib = get_lib()
    if lib is None or arr.ndim != 2 or not arr.flags.c_contiguous:
        return None
    g = _dwt_geometry(arr, rect, num_levels)
    if g != "ok":
        return arr if g == "empty" else None
    if irreversible:
        if arr.dtype != np.float32:
            return None
        fn = lib.dwt97_inverse
    else:
        if arr.dtype != np.int32:
            return None
        fn = lib.dwt53_inverse
    fn(arr, arr.shape[1], rect.x0, rect.y0, rect.x1, rect.y1,
       num_levels, _nthreads(num_threads))
    return arr


def _band_arrays(bands):
    oys = np.array([b[0] for b in bands], dtype=np.int32)
    oxs = np.array([b[1] for b in bands], dtype=np.int32)
    hs = np.array([b[2] for b in bands], dtype=np.int32)
    ws = np.array([b[3] for b in bands], dtype=np.int32)
    steps = np.array([b[4] for b in bands], dtype=np.float32)
    return oys, oxs, hs, ws, steps


def quant_bands(src: np.ndarray, bands, roi_shift: int = 0,
                num_threads: int = 0) -> np.ndarray | None:
    """Deadzone quantization of a packed float32 array into int32.

    bands: list of (oy, ox, h, w, step)."""
    lib = get_lib()
    if lib is None or src.dtype != np.float32 or not src.flags.c_contiguous:
        return None
    out = np.zeros(src.shape, dtype=np.int32)
    oys, oxs, hs, ws, steps = _band_arrays(bands)
    lib.quant_bands(src, out, src.shape[1], len(bands), oys, oxs, hs, ws,
                    steps, roi_shift, _nthreads(num_threads))
    return out


def dequant_bands(src: np.ndarray, bands, num_threads: int = 0):
    """Mid-point dequantization int32 -> float32 over packed bands."""
    lib = get_lib()
    if lib is None or src.dtype != np.int32 or not src.flags.c_contiguous:
        return None
    oys, oxs, hs, ws, steps = _band_arrays(bands)
    # the Mallat bands tile the packed array exactly on full decodes, so
    # every element is written and the zero-fill (calloc + a page-fault
    # sweep over ~100 MB at 4K) can be skipped
    covered = int((hs.astype(np.int64) * ws.astype(np.int64)).sum())
    alloc = np.empty if covered == src.size else np.zeros
    out = alloc(src.shape, dtype=np.float32)
    lib.dequant_bands(src, out, src.shape[1], len(bands), oys, oxs, hs, ws,
                      steps, _nthreads(num_threads))
    return out


def roi_unshift(arr: np.ndarray, shift: int, num_threads: int = 0):
    lib = get_lib()
    if lib is None or arr.dtype != np.int32 or not arr.flags.c_contiguous:
        return None
    lib.roi_unshift(arr.reshape(-1), arr.size, shift, _nthreads(num_threads))
    return arr


def finish_irrev(arr: np.ndarray, off: float, lo: int, hi: int,
                 num_threads: int = 0, in_place: bool = False):
    """clip(floor(a + float32(0.5 + off)), lo, hi) -> int32.

    With in_place, the float32 buffer is reused as the int32 output (same
    element size; the kernel is read-then-write per element)."""
    lib = get_lib()
    if lib is None or arr.dtype != np.float32 or not arr.flags.c_contiguous:
        return None
    out = arr.view(np.int32) if in_place else np.empty(arr.shape, dtype=np.int32)
    lib.finish_irrev(arr.reshape(-1), out.reshape(-1), arr.size,
                     np.float32(0.5 + off), lo, hi, _nthreads(num_threads))
    return out


def finish_rev(arr: np.ndarray, add: int, lo: int, hi: int,
               num_threads: int = 0, in_place: bool = False):
    """clip(a + add, lo, hi) int32."""
    lib = get_lib()
    if lib is None or arr.dtype != np.int32 or not arr.flags.c_contiguous:
        return None
    out = arr if in_place else np.empty(arr.shape, dtype=np.int32)
    lib.finish_rev(arr.reshape(-1), out.reshape(-1), arr.size, add, lo, hi,
                   num_threads)
    return out
