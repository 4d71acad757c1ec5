"""Whole-image codestream decoder (parity target:
codestream/CodeStreamDecompress.cpp — readHeader/decompress/decompressTile
and the marker state machine).

Host-side: marker parsing and tile-part assembly are serial byte work; the
per-tile decode fans out to the batched T1/DWT pipeline. TLM gives O(1)
seeks to tiles; decoded tiles can be cached for repeated window reads.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..cache.length_cache import StreamIndex, index_by_scan, index_from_tlm
from ..cache.tile_cache import TileCache, TileCacheStrategy
from ..core.errors import CodestreamError, InvalidMarkerError
from ..core.image import Component, Image
from ..core.params import ColorSpace, DecompressParams
from ..core.rect import Rect, ceil_div, ceil_div_pow2
from ..tile.tile_processor import TileProcessor
from . import markers as mk
from .structs import HeaderInfo, Tcp


@dataclass
class TilePartData:
    tile_index: int
    tp_index: int
    data: memoryview


@dataclass
class ParsedStream:
    header: HeaderInfo
    tile_tcps: dict[int, Tcp] = field(default_factory=dict)
    tile_parts: dict[int, list[TilePartData]] = field(default_factory=dict)
    tile_plt: dict[int, list[int]] = field(default_factory=dict)


class Decoder:
    """Random-access decoder (parity: grk_decompress_* codec object)."""

    def __init__(self, data, params: DecompressParams | None = None):
        """``data``: bytes/memoryview, a file path (mmap-backed, zero copy),
        a file object, or any object with a ``.view`` attribute (see
        core/stream.py for the stream abstraction)."""
        from ..core.stream import open_source

        self._source = open_source(data)
        self.data = self._source.view
        self.params = params or DecompressParams()
        self.jp2_info = None
        from .jp2 import is_jp2, unwrap_jp2

        try:
            head = bytes(self.data[:12])
        except (TypeError, IndexError):
            head = b""
        if is_jp2(head):
            # JP2 container: locate the jp2c codestream box (zero-copy view)
            self.jp2_info = unwrap_jp2(self.data)
            self.data = self.jp2_info.codestream
        self.header, self.first_sot = mk.parse_main_header(self.data)
        self.index: StreamIndex | None = None
        if self.header.has_tlm:
            self.index = index_from_tlm(self.data, self.header, self.first_sot)
        if self.index is None:
            self.index = index_by_scan(self.data, self.first_sot,
                                       self.header.siz.num_tiles)
        self._tcps: dict[int, Tcp] = {}
        self._plt: dict[int, list[int]] = {}
        self.cache = TileCache(
            TileCacheStrategy.ALL if self.params.tile_cache_all else TileCacheStrategy.NONE
        )
        self._ppm_chunks: list[bytes] | None = None
        self._tp_seq: dict[tuple[int, int], int] | None = None
        if self.header.ppm_segments:
            blob = b"".join(p for _, p in sorted(self.header.ppm_segments))
            chunks = []
            pos = 0
            while pos + 4 <= len(blob):
                n = int.from_bytes(blob[pos : pos + 4], "big")
                pos += 4
                chunks.append(blob[pos : pos + n])
                pos += n
            self._ppm_chunks = chunks
            # global tile-part order assigns PPM groups
            all_spans = sorted(
                (s for spans in self.index.spans.values() for s in spans),
                key=lambda s: s.sot_offset,
            )
            self._tp_seq = {
                (s.tile_index, s.tp_index): i for i, s in enumerate(all_spans)
            }

    # -------------------------------------------------------------- headers
    def _parse_tile_headers(self, tile_index: int):
        """Parse this tile's tile-part headers; returns (tcp, body bytes)."""
        siz = self.header.siz
        spans = self.index.spans.get(tile_index, [])
        tcp = self._tcps.get(tile_index)
        if tcp is None:
            tcp = self.header.default_tcp.copy()
        bodies = []
        plt: list[int] = []
        ppt: list[tuple[int, bytes]] = []
        packed: list[bytes] = []
        for span in sorted(spans, key=lambda s: s.tp_index):
            if self._ppm_chunks is not None and self._tp_seq is not None:
                seq = self._tp_seq.get((span.tile_index, span.tp_index))
                if seq is not None and seq < len(self._ppm_chunks):
                    packed.append(self._ppm_chunks[seq])
            c = mk.Cursor(self.data, span.sot_offset)
            if c.u16() != mk.SOT:
                raise InvalidMarkerError("bad tile-part offset")
            c.u16()
            mk.read_sot(c)
            while True:
                m2 = c.u16()
                if m2 == mk.SOD:
                    break
                if m2 < 0xFF00:
                    raise InvalidMarkerError("bad marker in tile-part header")
                ln = c.u16()
                sub = mk.Cursor(c.data, c.pos, c.pos + ln - 2)
                if m2 == mk.COD:
                    mk.read_cod(sub, tcp, siz.num_comps)
                elif m2 == mk.COC:
                    mk.read_coc(sub, tcp, siz.num_comps)
                elif m2 == mk.QCD:
                    mk.read_qcd(sub, tcp)
                elif m2 == mk.QCC:
                    mk.read_qcc(sub, tcp, siz.num_comps)
                elif m2 == mk.POC:
                    mk.read_poc(sub, tcp, siz.num_comps)
                elif m2 == mk.RGN:
                    mk.read_rgn(sub, tcp, siz.num_comps)
                elif m2 == mk.PLT:
                    plt.extend(mk.read_plt(sub))
                elif m2 == mk.PPT:
                    zppt = sub.u8()
                    ppt.append((zppt, sub.take(sub.remaining())))
                c.pos += ln - 2
            bodies.append(self.data[c.pos : span.body_end])
        self._tcps[tile_index] = tcp
        if plt:
            self._plt[tile_index] = plt
        if ppt:
            packed = [p for _, p in sorted(ppt)]
        packed_blob = b"".join(packed) if packed else None
        if len(bodies) == 1:
            return tcp, bodies[0], packed_blob
        return tcp, memoryview(b"".join(bytes(b) for b in bodies)), packed_blob

    # ---------------------------------------------------------------- tiles
    def decompress_tile(self, tile_index: int, window: Rect | None = None):
        """Decode one tile; with ``window``, only the sub-tile region is
        entropy-decoded/reconstructed and (arrays, rects) is returned."""
        if window is None:
            cached = self.cache.get(tile_index)
            if cached is not None:
                return cached
        siz = self.header.siz
        if tile_index >= siz.num_tiles:
            raise CodestreamError("tile index out of range")
        if tile_index not in self.index.spans:
            if window is None:
                # missing tile: fill directly with the value the empty
                # pipeline would produce (inverse DC shift of all-zero
                # coefficients) — running the full TileProcessor per empty
                # tile lets a corrupt SIZ with a ~64k-tile grid decode-bomb
                # the walk (observed via the mutation fuzzer)
                out = self._missing_tile_arrays(tile_index)
            else:
                tp = TileProcessor(siz, self.header.default_tcp.copy(),
                                   tile_index)
                out = tp.decompress(memoryview(b""), self.params.max_layers,
                                    self.params.reduce, window=window)
        else:
            # corrupt-tile tolerance (parity: m_corrupt_packet /
            # DecodeUnknownMarkerAtEndOfTileException handling): a broken
            # tile decodes to zeros instead of failing the whole image
            from ..core.errors import GrokTpuError
            from ..core import logging as log

            try:
                tcp, body, packed = self._parse_tile_headers(tile_index)
                tp = TileProcessor(siz, tcp, tile_index)
                out = tp.decompress(body, self.params.max_layers,
                                    self.params.reduce, packed_headers=packed,
                                    window=window,
                                    plt=self._plt.get(tile_index))
                self.last_t2_skipped = getattr(tp, "last_t2_skipped", 0)
            except (GrokTpuError, ValueError, IndexError, OverflowError) as e:
                log.warn("tile %d failed to decode (%s); zero-filled",
                         tile_index, e)
                tp = TileProcessor(siz, self.header.default_tcp.copy(),
                                   tile_index)
                out = tp.decompress(memoryview(b""), self.params.max_layers,
                                    self.params.reduce, window=window)
        if window is None:
            self.cache.put(tile_index, out)
        return out

    def _missing_value(self, ci: int) -> int:
        sc = self.header.siz.comps[ci]
        return 0 if sc.signed else 1 << (sc.prec - 1)

    def _missing_tile_arrays(self, tile_index: int):
        """Per-component arrays for a tile with no tile-part data."""
        siz = self.header.siz
        r = self.params.reduce
        tb = siz.tile_bounds(tile_index)
        out = []
        for ci, sc in enumerate(siz.comps):
            x0 = ceil_div_pow2(ceil_div(tb.x0, sc.dx), r)
            y0 = ceil_div_pow2(ceil_div(tb.y0, sc.dy), r)
            x1 = ceil_div_pow2(ceil_div(tb.x1, sc.dx), r)
            y1 = ceil_div_pow2(ceil_div(tb.y1, sc.dy), r)
            out.append(np.full((max(0, y1 - y0), max(0, x1 - x0)),
                               self._missing_value(ci), dtype=np.int32))
        return out

    # ---------------------------------------------------------------- image
    def _make_image(self, region: Rect | None = None) -> Image:
        siz = self.header.siz
        r = self.params.reduce
        area = Rect(siz.x0, siz.y0, siz.x1, siz.y1)
        if region is not None:
            area = area.intersect(region)
            if area.empty():
                raise CodestreamError("window outside image")
        img = Image(
            x0=ceil_div_pow2(area.x0, r),
            y0=ceil_div_pow2(area.y0, r),
            x1=ceil_div_pow2(area.x1, r),
            y1=ceil_div_pow2(area.y1, r),
            color_space=ColorSpace.UNKNOWN,
        )
        for sc in siz.comps:
            img.components.append(
                Component(dx=sc.dx, dy=sc.dy, prec=sc.prec, signed=sc.signed)
            )
        cap = self.params.max_pixels
        if cap is not None:
            img.finalize()
            total = sum(c.w * c.h for c in img.components)
            if total > cap:
                raise CodestreamError(
                    f"decode output {total} samples exceeds max_pixels={cap}")
        img.alloc()
        return img

    def decompress(self, tile_arrays_fn=None) -> Image:
        """Decode the whole stream (or the params-selected subset).

        ``tile_arrays_fn(ti)`` may supply pre-reconstructed per-component
        arrays for a tile (the distributed mesh decode hook, mirroring
        compress()'s tile_coeff_fn); tiles it returns None for take the
        normal host path."""
        siz = self.header.siz
        window = None
        if self.params.window is not None:
            window = Rect(*self.params.window)
        if self.params.tile_index is not None:
            tiles = [self.params.tile_index]
            window = window or siz.tile_bounds(self.params.tile_index)
        else:
            tiles = [
                ti
                for ti in range(siz.num_tiles)
                if window is None or not siz.tile_bounds(ti).intersect(window).empty()
            ]
        img = self._make_image(window)
        # data-less tiles contribute only their fill value; pre-fill the
        # canvas once and skip them (a corrupt SIZ can otherwise demand a
        # ~64k-empty-tile walk — the decode-bomb family)
        if any(ti not in self.index.spans for ti in tiles):
            for ci, c in enumerate(img.components):
                mv = self._missing_value(ci)
                if mv:
                    c.data.fill(mv)
            tiles = [ti for ti in tiles if ti in self.index.spans]
        if window is None and len(tiles) > 1:
            # tile-parallel decode on host threads (reference parity:
            # decompressTiles thread pool); native calls release the GIL,
            # and each worker caps its OpenMP team so tiles*omp ~= ncores
            from concurrent.futures import ThreadPoolExecutor

            from ..core.cpu import host_threads, set_tile_threads

            nw = min(host_threads(self.params.num_threads), len(tiles), 8)
            per_tile = max(1, host_threads(self.params.num_threads) // nw)

            def work(ti):
                if tile_arrays_fn is not None:
                    pre = tile_arrays_fn(ti)
                    if pre is not None:
                        return pre
                set_tile_threads(per_tile)
                return self.decompress_tile(ti)

            with ThreadPoolExecutor(max_workers=nw) as ex:
                results = list(ex.map(work, tiles))
            for ti, arrays in zip(tiles, results):
                self._paste_tile(img, ti, arrays)
        else:
            for ti in tiles:
                if window is not None:
                    arrays, rects = self.decompress_tile(ti, window)
                    self._paste_window(img, arrays, rects)
                else:
                    arrays = None
                    if tile_arrays_fn is not None:
                        arrays = tile_arrays_fn(ti)
                    if arrays is None:
                        arrays = self.decompress_tile(ti)
                    self._paste_tile(img, ti, arrays)
        if self.jp2_info is not None:
            from .jp2 import apply_palette

            info = self.jp2_info
            if getattr(info, "palette", None):
                img = apply_palette(img, info)
            if info.color_space is not None:
                img.color_space = info.color_space
            if getattr(info, "icc_profile", None):
                img.icc_profile = info.icc_profile
            if getattr(info, "capture_resolution", None):
                img.capture_resolution = info.capture_resolution
            if getattr(info, "display_resolution", None):
                img.display_resolution = info.display_resolution
            if getattr(info, "xml", None):
                img.xml = (info.xml[0] if len(info.xml) == 1
                           else b"".join(info.xml))
            if getattr(info, "uuid", None):
                from .jp2 import EXIF_UUID

                img.uuid_boxes = list(info.uuid)
                for uid, payload in info.uuid:
                    if uid == EXIF_UUID:
                        img.exif = (payload[6:]
                                    if payload.startswith(b"Exif\x00\x00")
                                    else payload)
                        break
        return img

    def _paste_window(self, img: Image, comp_arrays, rects) -> None:
        """Paste windowed tile arrays (rects: reduced comp coords)."""
        for ci, c in enumerate(img.components):
            a = comp_arrays[ci]
            r = rects[ci]
            x0 = r.x0 - c.x0
            y0 = r.y0 - c.y0
            sy0 = max(0, -y0)
            sx0 = max(0, -x0)
            dy0 = max(0, y0)
            dx0 = max(0, x0)
            h = min(a.shape[0] - sy0, c.h - dy0)
            w = min(a.shape[1] - sx0, c.w - dx0)
            if h > 0 and w > 0:
                c.data[dy0 : dy0 + h, dx0 : dx0 + w] = a[sy0 : sy0 + h, sx0 : sx0 + w]

    def _paste_tile(self, img: Image, tile_index: int, comp_arrays) -> None:
        siz = self.header.siz
        r = self.params.reduce
        tb = siz.tile_bounds(tile_index)
        for ci, c in enumerate(img.components):
            sc = siz.comps[ci]
            # tile-component rect at the reduced resolution
            tcx0 = ceil_div_pow2(ceil_div(tb.x0, sc.dx), r)
            tcy0 = ceil_div_pow2(ceil_div(tb.y0, sc.dy), r)
            a = comp_arrays[ci]
            # intersect with the image component's region
            x0 = tcx0 - c.x0
            y0 = tcy0 - c.y0
            sy0 = max(0, -y0)
            sx0 = max(0, -x0)
            dy0 = max(0, y0)
            dx0 = max(0, x0)
            h = min(a.shape[0] - sy0, c.h - dy0)
            w = min(a.shape[1] - sx0, c.w - dx0)
            if h <= 0 or w <= 0:
                continue
            if (
                getattr(self, "_move_tiles", False)
                and (sy0, sx0, dy0, dx0) == (0, 0, 0, 0)
                and a.shape == (c.h, c.w)
                and a.dtype == c.data.dtype
                and a.flags.c_contiguous
            ):
                # single tile covers the component: adopt the decoded plane
                # instead of copying ~100 MB on a 4K frame (safe only in
                # the one-shot decompress() path; see Decoder._move_tiles)
                c.data = a
                continue
            c.data[dy0 : dy0 + h, dx0 : dx0 + w] = a[sy0 : sy0 + h, sx0 : sx0 + w]


# -------------------------------------------------------- functional API
def decompress(data, params: DecompressParams | None = None) -> Image:
    """Decode a raw .j2k codestream (bytes, file path, file object or
    stream source) into an Image."""
    dec = Decoder(data, params)
    # one-shot decode: the tile cache dies with this call, so decoded tile
    # planes can be moved (not copied) into the Image when they cover a
    # whole component
    dec._move_tiles = True
    return dec.decompress()


def parse_codestream(data: bytes | memoryview) -> ParsedStream:
    """Parse main header and collect tile-part byte ranges (no T1 work)."""
    dec = Decoder(data)
    ps = ParsedStream(header=dec.header)
    for ti, spans in dec.index.spans.items():
        tcp, body, _packed = dec._parse_tile_headers(ti)
        ps.tile_tcps[ti] = tcp
        ps.tile_parts[ti] = [
            TilePartData(ti, s.tp_index, dec.data[s.body_start : s.body_end])
            for s in spans
        ]
        if ti in dec._plt:
            ps.tile_plt[ti] = dec._plt[ti]
    return ps
