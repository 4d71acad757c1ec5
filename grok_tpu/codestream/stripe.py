"""Strip-streaming encoder: feed image rows incrementally, hold only one
tile row in memory.

Capability parity with the reference's strip-based IImageFormat encode
interface (image_format/IImageFormat.h:29): a gigapixel image never needs a
whole-frame buffer — rows are pushed as they are produced (camera scanline,
network chunk, ...), each completed tile row is transformed/entropy-coded
and flushed to the output stream, and the TLM index is patched on close
when the output is seekable.
"""

from __future__ import annotations

import numpy as np

from ..core.image import Component, Image
from ..core.params import CompressParams
from ..core.stream import OutputStream
from . import markers as mk
from .compress import (build_siz, build_tcp, encode_tile_to_blob,
                       write_main_header)


class StripCompressor:
    """Incremental row-fed encoder.

    Usage::

        sc = StripCompressor(out_path, width, height, num_comps, prec, params)
        for strip in strips:            # [rows, width, comps] int arrays
            sc.push(strip)
        stream_len = sc.close()
    """

    def __init__(self, dst, width: int, height: int, num_comps: int = 1,
                 prec: int = 8, params: CompressParams | None = None,
                 signed: bool = False, async_io: bool = False):
        self.params = params or CompressParams()
        self.params.validate()
        if self.params.tile_size is None:
            raise ValueError("strip encoding requires tiling (tile_size)")
        # a header-only Image carries the geometry; pixel data stays outside
        img = Image(0, 0, width, height)
        for _ in range(num_comps):
            img.components.append(
                Component(dx=1, dy=1, prec=prec, signed=signed)
            )
        img.x1, img.y1 = width, height
        self.image = img
        self.siz = build_siz(img, self.params)
        self.tcp = build_tcp(img, self.params)
        self.width, self.height, self.ncomp = width, height, num_comps

        # async_io: queued background writes (io_uring-analogue) so tile
        # row N+1 entropy-codes while row N hits the disk
        if async_io:
            from ..core.stream import AsyncWriter

            self.out = AsyncWriter(dst)
        else:
            self.out = OutputStream(dst)
        header, tlm_offset = write_main_header(
            self.siz, self.tcp, self.params, img
        )
        self._tlm_offset = tlm_offset if self.out.seekable else None
        self.out.write(bytes(header))

        self._buf = np.zeros((0, width, num_comps), dtype=np.int32)
        self._buf_y0 = 0
        self._rows_seen = 0
        self._next_tile = 0
        self._tile_part_lengths: list[tuple[int, int]] = []
        self._closed = False

    # ------------------------------------------------------------------ API
    def push(self, strip: np.ndarray) -> None:
        """Append [rows, width] or [rows, width, comps] samples."""
        if strip.ndim == 2:
            strip = strip[:, :, None]
        assert strip.shape[1] == self.width and strip.shape[2] == self.ncomp
        self._buf = np.concatenate(
            [self._buf, strip.astype(np.int32)], axis=0
        )
        self._rows_seen += strip.shape[0]
        self._flush_complete_tile_rows()

    def close(self) -> int:
        assert self._rows_seen == self.height, (
            f"pushed {self._rows_seen} rows of {self.height}"
        )
        self._flush_complete_tile_rows(final=True)
        self.out.write(mk._u16(mk.EOC))
        if self._tlm_offset is not None:
            tlm = mk.write_tlm(
                self._tile_part_lengths,
                st=1 if self.siz.num_tiles <= 255 else 2,
            )
            self.out.patch(self._tlm_offset, tlm)
        end = self.out.tell()
        # flush/close the sink (AsyncWriter: join the writer thread and
        # surface any deferred I/O error; file: flush to disk)
        self.out.close()
        self._closed = True
        return end

    # ------------------------------------------------------------- internal
    def _flush_complete_tile_rows(self, final: bool = False) -> None:
        """Encode every tile whose rows have arrived. Tiles within a
        completed row encode on a host thread pool (same overlap as the
        one-shot tile-parallel path; output is appended in tile order so
        the stream stays byte-identical)."""
        ntx = self.siz.num_tiles_x
        while self._next_tile < self.siz.num_tiles:
            # find how many consecutive tiles are ready
            ready: list[int] = []
            ti = self._next_tile
            while ti < self.siz.num_tiles:
                tb = self.siz.tile_bounds(ti)
                if self._rows_seen < tb.y1 and not final:
                    break
                ready.append(ti)
                ti += 1
            if not ready:
                return

            def extract(ti2):
                tb2 = self.siz.tile_bounds(ti2)
                return [
                    np.ascontiguousarray(
                        self._buf[tb2.y0 - self._buf_y0 : tb2.y1 - self._buf_y0,
                                  tb2.x0 : tb2.x1, c]
                    )
                    for c in range(self.ncomp)
                ]

            def enc_one(ti2):
                return encode_tile_to_blob(
                    self.siz, self.tcp, self.params, ti2, extract(ti2)
                )

            if len(ready) > 1:
                from concurrent.futures import ThreadPoolExecutor

                from ..core.cpu import host_threads, set_tile_threads

                nw = min(host_threads(self.params.num_threads), len(ready), 8)
                per_tile = max(1, host_threads(self.params.num_threads) // nw)

                def work(ti2):
                    set_tile_threads(per_tile)
                    return enc_one(ti2)

                with ThreadPoolExecutor(max_workers=nw) as ex:
                    results = list(ex.map(work, ready))
            else:
                results = [enc_one(ready[0])]
            for blob, part_lens, _plm in results:
                self.out.write(blob)
                self._tile_part_lengths.extend(part_lens)
            self._next_tile = ready[-1] + 1
            # release rows of every fully-finished tile row
            last_tb = self.siz.tile_bounds(self._next_tile - 1)
            if self._next_tile % ntx == 0:
                self._buf = self._buf[last_tb.y1 - self._buf_y0 :]
                self._buf_y0 = last_tb.y1
