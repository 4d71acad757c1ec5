"""Decoded-tile cache (parity: cache/TileCache.{h,cpp}, strategy NONE/ALL).

Caches per-tile decoded component arrays so repeated window/tile reads skip
T2+T1+DWT entirely (grk_decompress_tile re-read semantics,
CodeStreamDecompress.cpp:418-420).
"""

from __future__ import annotations

import enum


class TileCacheStrategy(enum.IntEnum):
    NONE = 0
    ALL = 1


class TileCache:
    def __init__(self, strategy: TileCacheStrategy = TileCacheStrategy.NONE):
        self.strategy = strategy
        self._tiles: dict[int, list] = {}

    def get(self, tile_index: int):
        return self._tiles.get(tile_index)

    def put(self, tile_index: int, comp_arrays) -> None:
        if self.strategy == TileCacheStrategy.ALL:
            self._tiles[tile_index] = comp_arrays

    def clear(self) -> None:
        self._tiles.clear()
