"""Chunk-allocated sparse coefficient canvas for windowed decode.

Capability parity with the reference's SparseCanvas (tile/SparseCanvas.h:132)
+ TileComponentWindowBuffer: a region decode of a large tile must not
allocate the whole tile's coefficient plane — only the chunks touched by
the needed codeblocks/band supports are materialized. Reads outside any
written chunk return zeros, which is exactly the contract of
ops/dwt.inverse_window (unneeded coefficients may be zero).
"""

from __future__ import annotations

import numpy as np

_CHUNK = 64


class SparseCanvas:
    """2-D chunked plane with numpy-slice read access.

    Supports the access patterns ops/dwt.inverse_window uses on a plain
    ndarray: ``canvas[..., y0:y1, x0:x1]`` (materializes a dense array)
    plus ``.shape``/``.dtype``; writes go through ``write``/``apply``.
    """

    def __init__(self, shape, dtype):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self._chunks: dict[tuple[int, int], np.ndarray] = {}

    # ------------------------------------------------------------- write
    def write(self, y0: int, x0: int, block: np.ndarray) -> None:
        h, w = block.shape
        if h == 0 or w == 0:
            return
        cy0, cy1 = y0 // _CHUNK, (y0 + h - 1) // _CHUNK
        cx0, cx1 = x0 // _CHUNK, (x0 + w - 1) // _CHUNK
        for cy in range(cy0, cy1 + 1):
            for cx in range(cx0, cx1 + 1):
                ch = self._chunks.get((cy, cx))
                if ch is None:
                    ch = np.zeros((_CHUNK, _CHUNK), dtype=self.dtype)
                    self._chunks[(cy, cx)] = ch
                oy, ox = cy * _CHUNK, cx * _CHUNK
                sy0 = max(y0, oy)
                sx0 = max(x0, ox)
                sy1 = min(y0 + h, oy + _CHUNK)
                sx1 = min(x0 + w, ox + _CHUNK)
                ch[sy0 - oy : sy1 - oy, sx0 - ox : sx1 - ox] = \
                    block[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0]

    def apply(self, y0: int, y1: int, x0: int, x1: int, fn) -> None:
        """In-place transform of the written samples inside a rect
        (dequantization / ROI unshift on band supports)."""
        cy0, cy1 = y0 // _CHUNK, max(y0, y1 - 1) // _CHUNK
        cx0, cx1 = x0 // _CHUNK, max(x0, x1 - 1) // _CHUNK
        for (cy, cx), ch in self._chunks.items():
            if not (cy0 <= cy <= cy1 and cx0 <= cx <= cx1):
                continue
            oy, ox = cy * _CHUNK, cx * _CHUNK
            sy0, sx0 = max(y0, oy), max(x0, ox)
            sy1 = min(y1, oy + _CHUNK)
            sx1 = min(x1, ox + _CHUNK)
            if sy0 >= sy1 or sx0 >= sx1:
                continue
            view = ch[sy0 - oy : sy1 - oy, sx0 - ox : sx1 - ox]
            view[:] = fn(view)

    def astype_canvas(self, dtype) -> "SparseCanvas":
        out = SparseCanvas(self.shape, dtype)
        for key, ch in self._chunks.items():
            out._chunks[key] = ch.astype(dtype)
        return out

    # -------------------------------------------------------------- read
    def read(self, y0: int, y1: int, x0: int, x1: int) -> np.ndarray:
        h, w = max(y1 - y0, 0), max(x1 - x0, 0)
        out = np.zeros((h, w), dtype=self.dtype)
        if h == 0 or w == 0:
            return out
        cy0, cy1 = y0 // _CHUNK, (y1 - 1) // _CHUNK
        cx0, cx1 = x0 // _CHUNK, (x1 - 1) // _CHUNK
        for cy in range(cy0, cy1 + 1):
            for cx in range(cx0, cx1 + 1):
                ch = self._chunks.get((cy, cx))
                if ch is None:
                    continue
                oy, ox = cy * _CHUNK, cx * _CHUNK
                sy0, sx0 = max(y0, oy), max(x0, ox)
                sy1 = min(y1, oy + _CHUNK)
                sx1 = min(x1, ox + _CHUNK)
                out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = \
                    ch[sy0 - oy : sy1 - oy, sx0 - ox : sx1 - ox]
        return out

    def __getitem__(self, key):
        # accept the ndarray-style patterns inverse_window emits:
        # canvas[..., ysl, xsl] or canvas[ysl, xsl]
        if isinstance(key, tuple):
            parts = [k for k in key if k is not Ellipsis]
        else:
            parts = [key]
        if len(parts) != 2 or not all(isinstance(k, slice) for k in parts):
            raise TypeError("SparseCanvas supports [.., ysl, xsl] slicing only")
        ys, xs = parts
        y0, y1, _ = ys.indices(self.shape[-2])
        x0, x1, _ = xs.indices(self.shape[-1])
        return self.read(y0, y1, x0, x1)

    @property
    def nbytes_allocated(self) -> int:
        return sum(ch.nbytes for ch in self._chunks.values())
