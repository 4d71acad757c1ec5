"""Whole-image codestream decoder (parity target:
codestream/CodeStreamDecompress.cpp — readHeader/decompress/decompressTile
and the marker state machine).

Host-side: marker parsing and tile-part assembly are serial byte work; the
per-tile decode fans out to the batched T1/DWT pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core.errors import CodestreamError, InvalidMarkerError
from ..core.image import Component, Image
from ..core.params import ColorSpace, DecompressParams
from ..core.rect import ceil_div
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


def parse_codestream(data: bytes | memoryview) -> ParsedStream:
    """Parse main header and collect tile-part byte ranges (no T1 work)."""
    data = memoryview(data)
    header, pos = mk.parse_main_header(data)
    ps = ParsedStream(header=header)
    siz = header.siz

    c = mk.Cursor(data, pos)
    while True:
        if c.remaining() < 2:
            break  # tolerate missing EOC like the reference
        m = c.u16()
        if m == mk.EOC:
            break
        if m != mk.SOT:
            raise InvalidMarkerError(f"expected SOT, got {mk.marker_name(m)}")
        lsot = c.u16()
        if lsot != 10:
            raise CodestreamError("bad Lsot")
        sot_start = c.pos - 4
        tile_index, psot, tp_index, _num_tps = mk.read_sot(c)
        if tile_index >= siz.num_tiles:
            raise CodestreamError(f"SOT: tile index {tile_index} out of range")
        # tile-part header markers until SOD
        tcp = ps.tile_tcps.get(tile_index)
        if tcp is None:
            tcp = header.default_tcp.copy()
            ps.tile_tcps[tile_index] = tcp
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
            # PLT/PPT/COM: skipped (PLT fast paths handled by caches later)
            c.pos += ln - 2
        body_start = c.pos
        if psot == 0:
            body_end = len(data) - 2 if data[-2:] == b"\xff\xd9" else len(data)
        else:
            body_end = sot_start + psot
        if body_end > len(data):
            body_end = len(data)  # truncated stream tolerance
        ps.tile_parts.setdefault(tile_index, []).append(
            TilePartData(tile_index, tp_index, data[body_start:body_end])
        )
        c.pos = body_end
    return ps


def decompress(
    data: bytes | memoryview, params: DecompressParams | None = None
) -> Image:
    """Decode a raw .j2k codestream into an Image."""
    params = params or DecompressParams()
    ps = parse_codestream(data)
    siz = ps.header.siz

    img = Image(
        x0=siz.x0,
        y0=siz.y0,
        x1=siz.x1,
        y1=siz.y1,
        color_space=ColorSpace.UNKNOWN,
    )
    for sc in siz.comps:
        img.components.append(
            Component(dx=sc.dx, dy=sc.dy, prec=sc.prec, signed=sc.signed)
        )
    img.alloc()

    tiles = (
        [params.tile_index]
        if params.tile_index is not None
        else list(range(siz.num_tiles))
    )
    for ti in tiles:
        parts = ps.tile_parts.get(ti, [])
        if not parts:
            continue
        parts.sort(key=lambda p: p.tp_index)
        body = memoryview(b"".join(bytes(p.data) for p in parts))
        tcp = ps.tile_tcps.get(ti, ps.header.default_tcp)
        tp = TileProcessor(siz, tcp, ti)
        comp_arrays = tp.decompress(body, max_layers=params.max_layers)
        _paste_tile(img, siz, ti, comp_arrays)
    return img


def _paste_tile(img: Image, siz, tile_index: int, comp_arrays) -> None:
    tb = siz.tile_bounds(tile_index)
    for ci, c in enumerate(img.components):
        x0 = ceil_div(tb.x0, c.dx) - c.x0
        y0 = ceil_div(tb.y0, c.dy) - c.y0
        a = comp_arrays[ci]
        c.data[y0 : y0 + a.shape[0], x0 : x0 + a.shape[1]] = a
