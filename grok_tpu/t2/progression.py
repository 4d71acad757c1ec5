"""Packet progression iterators — the 5 standard orders (T.800 B.12).

Parity target: t2/PacketIter.cpp (next_lrcp/rlcp/rpcl/pcrl/cprl) and
t2/PacketManager.cpp. Position-based orders are realized by enumerating
every (comp, res, precinct) with its projected canvas anchor and sorting —
equivalent to the standard's nested coordinate loops, friendlier to
precomputation (and to feeding a device pipeline with a static schedule).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..core.params import ProgressionOrder
from ..codestream.structs import Siz, Tcp
from ..tile.geometry import TileCompGeom


@dataclass(frozen=True)
class PacketIndex:
    layer: int
    comp: int
    res: int
    prec: int  # precinct index within (comp, res)


def _precinct_anchors(siz: Siz, geoms: list[TileCompGeom], tile_rect=None):
    """Yield (comp, res, prec_idx, canvas_x, canvas_y) for every precinct.

    Position-based orders visit each direction's FIRST precinct at the
    tile origin ONLY when the projected resolution origin is not aligned
    to the projected precinct grid — T.800 B.12.1.3's "y == ty0" special
    case, the reference's `(try0 << shift) % (1 << (ppy + shift))` test
    (t2/PacketIter.cpp next_cprl/pcrl/rpcl). When it IS aligned, the
    first precinct sorts at its true (>= tile origin) grid position; all
    later precincts always sit at their projected grid positions."""
    out = []
    for c, g in enumerate(geoms):
        dx, dy = siz.comps[c].dx, siz.comps[c].dy
        nl = g.num_resolutions - 1
        for res in g.resolutions:
            shift = nl - res.r
            if res.rect.empty() or res.num_precincts == 0:
                continue
            px0 = (res.rect.x0 >> res.ppx) << res.ppx
            py0 = (res.rect.y0 >> res.ppy) << res.ppy
            x_aligned = ((res.rect.x0 << shift) %
                         (1 << (res.ppx + shift))) == 0
            y_aligned = ((res.rect.y0 << shift) %
                         (1 << (res.ppy + shift))) == 0
            for pj in range(res.prc_grid_h):
                for pi in range(res.prc_grid_w):
                    p = pj * res.prc_grid_w + pi
                    cx = ((px0 + (pi << res.ppx)) << shift) * dx
                    cy = ((py0 + (pj << res.ppy)) << shift) * dy
                    if pi == 0:
                        if x_aligned:
                            cx = (res.rect.x0 << shift) * dx
                        else:
                            cx = (tile_rect.x0 if tile_rect is not None
                                  else min(cx, (res.rect.x0 << shift) * dx))
                    if pj == 0:
                        if y_aligned:
                            cy = (res.rect.y0 << shift) * dy
                        else:
                            cy = (tile_rect.y0 if tile_rect is not None
                                  else min(cy, (res.rect.y0 << shift) * dy))
                    out.append((c, res.r, p, cx, cy))
    return out


def _segment_order(
    order: ProgressionOrder,
    geoms: list[TileCompGeom],
    anchors,
    layer_end: int,
    res_range: tuple[int, int],
    comp_range: tuple[int, int],
) -> list[PacketIndex]:
    """Packets of one progression segment, in the given order and bounds."""
    r0, r1 = res_range
    c0, c1 = comp_range
    out: list[PacketIndex] = []
    sel = [
        a for a in anchors if r0 <= a[1] < r1 and c0 <= a[0] < c1
    ]

    if order == ProgressionOrder.LRCP:
        for l in range(layer_end):
            for r in range(r0, r1):
                for c in range(c0, min(c1, len(geoms))):
                    g = geoms[c]
                    if r >= g.num_resolutions:
                        continue
                    for p in range(g.resolutions[r].num_precincts):
                        out.append(PacketIndex(l, c, r, p))
    elif order == ProgressionOrder.RLCP:
        for r in range(r0, r1):
            for l in range(layer_end):
                for c in range(c0, min(c1, len(geoms))):
                    g = geoms[c]
                    if r >= g.num_resolutions:
                        continue
                    for p in range(g.resolutions[r].num_precincts):
                        out.append(PacketIndex(l, c, r, p))
    elif order == ProgressionOrder.RPCL:
        for (c, r, p, x, y) in sorted(sel, key=lambda t: (t[1], t[4], t[3], t[0])):
            for l in range(layer_end):
                out.append(PacketIndex(l, c, r, p))
    elif order == ProgressionOrder.PCRL:
        for (c, r, p, x, y) in sorted(sel, key=lambda t: (t[4], t[3], t[0], t[1])):
            for l in range(layer_end):
                out.append(PacketIndex(l, c, r, p))
    elif order == ProgressionOrder.CPRL:
        for (c, r, p, x, y) in sorted(sel, key=lambda t: (t[0], t[4], t[3], t[1])):
            for l in range(layer_end):
                out.append(PacketIndex(l, c, r, p))
    else:
        raise ValueError(f"unknown progression {order}")
    return out


def packet_order(
    siz: Siz, tcp: Tcp, geoms: list[TileCompGeom], tile_rect=None
) -> list[PacketIndex]:
    """Full packet sequence for one tile, honoring POC progression changes
    (T.800 B.12: each POC segment emits its bounded packet set in its own
    order, skipping packets already emitted by earlier segments)."""
    anchors = _precinct_anchors(siz, geoms, tile_rect)
    max_res = max(g.num_resolutions for g in geoms)

    if not tcp.pocs:
        return _segment_order(
            tcp.progression, geoms, anchors, tcp.num_layers,
            (0, max_res), (0, len(geoms)),
        )

    out: list[PacketIndex] = []
    seen: set[PacketIndex] = set()
    for poc in tcp.pocs:
        seg = _segment_order(
            poc.order, geoms, anchors,
            min(poc.layer_end, tcp.num_layers),
            (poc.res_start, min(poc.res_end, max_res)),
            (poc.comp_start, min(poc.comp_end, len(geoms))),
        )
        for pk in seg:
            if pk not in seen:
                seen.add(pk)
                out.append(pk)
    # safety net: any packet not covered by the POC segments goes last in
    # the tile's base order (lenient; conforming streams cover everything)
    base = _segment_order(
        tcp.progression, geoms, anchors, tcp.num_layers,
        (0, max_res), (0, len(geoms)),
    )
    for pk in base:
        if pk not in seen:
            seen.add(pk)
            out.append(pk)
    return out
