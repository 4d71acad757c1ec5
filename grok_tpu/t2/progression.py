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


def _precinct_anchors(siz: Siz, geoms: list[TileCompGeom]):
    """Yield (comp, res, prec_idx, canvas_x, canvas_y) for every precinct."""
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
            for pj in range(res.prc_grid_h):
                for pi in range(res.prc_grid_w):
                    p = pj * res.prc_grid_w + pi
                    # anchor = canvas coords of the precinct's top-left,
                    # clipped to the resolution rect
                    rx = max(px0 + (pi << res.ppx), res.rect.x0)
                    ry = max(py0 + (pj << res.ppy), res.rect.y0)
                    out.append((c, res.r, p, (rx << shift) * dx, (ry << shift) * dy))
    return out


def packet_order(
    siz: Siz, tcp: Tcp, geoms: list[TileCompGeom]
) -> list[PacketIndex]:
    """Full packet sequence for one tile in the tile's progression order."""
    order = tcp.progression
    layers = tcp.num_layers
    anchors = _precinct_anchors(siz, geoms)
    out: list[PacketIndex] = []

    if order == ProgressionOrder.LRCP:
        max_res = max(g.num_resolutions for g in geoms)
        for l in range(layers):
            for r in range(max_res):
                for c, g in enumerate(geoms):
                    if r >= g.num_resolutions:
                        continue
                    for p in range(g.resolutions[r].num_precincts):
                        out.append(PacketIndex(l, c, r, p))
    elif order == ProgressionOrder.RLCP:
        max_res = max(g.num_resolutions for g in geoms)
        for r in range(max_res):
            for l in range(layers):
                for c, g in enumerate(geoms):
                    if r >= g.num_resolutions:
                        continue
                    for p in range(g.resolutions[r].num_precincts):
                        out.append(PacketIndex(l, c, r, p))
    elif order == ProgressionOrder.RPCL:
        for (c, r, p, x, y) in sorted(anchors, key=lambda t: (t[1], t[4], t[3], t[0])):
            for l in range(layers):
                out.append(PacketIndex(l, c, r, p))
    elif order == ProgressionOrder.PCRL:
        for (c, r, p, x, y) in sorted(anchors, key=lambda t: (t[4], t[3], t[0], t[1])):
            for l in range(layers):
                out.append(PacketIndex(l, c, r, p))
    elif order == ProgressionOrder.CPRL:
        for (c, r, p, x, y) in sorted(anchors, key=lambda t: (t[0], t[4], t[3], t[1])):
            for l in range(layers):
                out.append(PacketIndex(l, c, r, p))
    else:
        raise ValueError(f"unknown progression {order}")
    return out
