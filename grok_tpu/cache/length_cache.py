"""TLM / PLT length caches for O(1) random access.

Parity targets: cache/LengthCache.{h,cpp} (CodeStreamInfo/TilePartInfo, TLM
skipTo) and cache/PacketLengthMarkers.{h,cpp} (PLT read/write) — the
machinery behind the reference's headline fast random-access decode
(README.md:14, CodeStreamDecompress.cpp:977-993).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..codestream import markers as mk
from ..core.errors import CodestreamError


@dataclass
class TilePartSpan:
    tile_index: int
    tp_index: int
    sot_offset: int  # offset of the SOT marker
    body_start: int  # offset of first byte after SOD
    body_end: int


@dataclass
class StreamIndex:
    """Byte-level index of a codestream: where every tile part lives."""

    first_sot: int
    spans: dict[int, list[TilePartSpan]] = field(default_factory=dict)
    from_tlm: bool = False


def index_from_tlm(data: memoryview, header, first_sot: int) -> StreamIndex | None:
    """Build the tile-part index directly from TLM entries: O(#tileparts),
    no stream scanning (the reference's skipTo fast path)."""
    if not header.tlm:
        return None
    idx = StreamIndex(first_sot=first_sot, from_tlm=True)
    pos = first_sot
    for (tile_index, psot) in header.tlm:
        if pos + 12 > len(data):
            return None  # TLM inconsistent with stream length
        # SOT is 12 bytes; tile-part header may contain more markers, so
        # locate SOD by scanning only this tile part's marker headers.
        c = mk.Cursor(data, pos)
        m = c.u16()
        if m != mk.SOT:
            return None
        c.u16()  # Lsot
        t_i, p_sot, tp_i, _ = mk.read_sot(c)
        if t_i != tile_index or (psot and p_sot and psot != p_sot):
            # trust the in-stream SOT
            psot = p_sot
        while True:
            m2 = c.u16()
            if m2 == mk.SOD:
                break
            if m2 < 0xFF00:
                return None
            ln = c.u16()
            c.pos += ln - 2
        span = TilePartSpan(t_i, tp_i, pos, c.pos, pos + psot)
        idx.spans.setdefault(t_i, []).append(span)
        pos += psot
    return idx


def _valid_sot_at(data: memoryview, pos: int, num_tiles: int | None) -> bool:
    """Plausibility check for an SOT marker segment at ``pos``."""
    if pos + 12 > len(data):
        return False
    c = mk.Cursor(data, pos)
    if c.u16() != mk.SOT or c.u16() != 10:
        return False
    t_i, psot, tp_i, tn = mk.read_sot(c)
    if num_tiles is not None and t_i >= num_tiles:
        return False
    return (psot == 0 or psot >= 14) and (tn == 0 or tp_i < tn)


_RESYNC_FWD_WINDOW = 8 << 20  # bound the forward scan (anti-O(n^2) on
#                               adversarial streams with many lying Psots)


def _resync_sot(data: memoryview, body_start: int, end: int,
                num_tiles: int | None) -> int | None:
    """Find the real start of the next tile part when Psot lied.

    The reference encoder overcounts Psot on some tiles (observed: +12 on
    the right-edge tile of HT+PLT 16-bit tiled streams — its own decoder
    tolerates this by resynchronising), so ``end`` may point inside the
    next tile-part's header or short of it. Search a small window before
    ``end`` first (overcount; nearest candidate to ``end`` wins), then
    forward (undercount, window-bounded), validating each 0xFF90
    candidate so packet-data bytes can't false-trigger."""
    lo = max(body_start, end - 64)
    b = bytes(data[lo:min(len(data), end)])
    for rel in range(len(b) - 2, -1, -1):  # nearest-to-end candidate wins
        if b[rel] == 0xFF and b[rel + 1] == 0x90 and _valid_sot_at(
                data, lo + rel, num_tiles):
            return lo + rel
    pos = end
    hi = min(len(data), end + _RESYNC_FWD_WINDOW)
    while pos + 2 <= hi:
        nxt = bytes(data[pos:min(hi, pos + 65536)]).find(b"\xff\x90")
        if nxt < 0:
            pos += 65536 - 1
            continue
        if _valid_sot_at(data, pos + nxt, num_tiles):
            return pos + nxt
        pos += nxt + 2
    return None


def index_by_scan(data: memoryview, first_sot: int,
                  num_tiles: int | None = None) -> StreamIndex:
    """Fallback: scan SOT markers sequentially (skipToTile equivalent)."""
    idx = StreamIndex(first_sot=first_sot)
    c = mk.Cursor(data, first_sot)
    while c.remaining() >= 2:
        m = c.u16()
        if m == mk.EOC:
            break
        if m != mk.SOT:
            raise CodestreamError("expected SOT while indexing")
        c.u16()
        t_i, psot, tp_i, _ = mk.read_sot(c)
        sot_off = c.pos - 12
        while True:
            m2 = c.u16()
            if m2 == mk.SOD:
                break
            ln = c.u16()
            c.pos += ln - 2
        end = sot_off + psot if psot else len(data)
        end = min(end, len(data))
        if end + 2 <= len(data):
            nm = (data[end] << 8) | data[end + 1]
            if nm not in (mk.SOT, mk.EOC):
                fixed = _resync_sot(data, c.pos, end, num_tiles)
                if fixed is None:
                    end = len(data)
                elif fixed >= c.pos:  # empty body (fixed == c.pos) is
                    end = fixed       # valid; never truncate the header
        idx.spans.setdefault(t_i, []).append(
            TilePartSpan(t_i, tp_i, sot_off, c.pos, end)
        )
        c.pos = end
    return idx


class PacketLengthCache:
    """Collects per-packet lengths at encode (PLT write) and replays them at
    decode (packet skipping without header parsing)."""

    def __init__(self) -> None:
        self.lengths: list[int] = []

    def push(self, n: int) -> None:
        self.lengths.append(n)

    def to_plt_segments(self, max_seg: int = 65000) -> list[bytes]:
        """One or more PLT marker segments covering all packet lengths."""
        out = []
        cur: list[int] = []
        cur_bytes = 0
        z = 0
        for ln in self.lengths:
            nb = max(1, (ln.bit_length() + 6) // 7)
            if cur_bytes + nb > max_seg:
                out.append(mk.write_plt(cur, z))
                z += 1
                cur = []
                cur_bytes = 0
            cur.append(ln)
            cur_bytes += nb
        if cur or not out:
            out.append(mk.write_plt(cur, z))
        return out
