"""Flattening glue for the native T2 packet codec (native/t2_codec.cpp).

Builds the flat precinct/packet descriptor arrays once per tile and runs
whole-tile packet emission/parsing in a single native call. The Python
packet codec in t2/packets.py stays the bit-exact reference and fallback.
"""

from __future__ import annotations

import numpy as np

from ..core.errors import CorruptPacketError
from .progression import packet_order


def get_lib():
    from ..t1.native import get_lib as _gl

    lib = _gl()
    return lib if lib is not None and hasattr(lib, "t2_encode_packets") else None


class FlatTileT2:
    """Flattened per-tile T2 geometry shared by encode and decode."""

    def __init__(self, siz, tcp, geoms, tile_rect):
        self.prc_keys: list[tuple[int, int, int, int]] = []
        key_idx: dict[tuple[int, int, int, int], int] = {}
        prc_numbps, prc_gw, prc_gh = [], [], []
        cb_off = [0]
        cb_cx, cb_cy, cb_style = [], [], []
        self.entry_of: dict[tuple[int, int, int, int], int] = {}
        for c in range(siz.num_comps):
            sty = tcp.tccps[c].cblk_style & 0x7F
            for res in geoms[c].resolutions:
                for bi, band in enumerate(res.bands):
                    for pi, prc in enumerate(band.precincts):
                        key = (c, res.r, bi, pi)
                        key_idx[key] = len(self.prc_keys)
                        self.prc_keys.append(key)
                        prc_numbps.append(band.num_bps)
                        prc_gw.append(prc.cblk_grid_w)
                        prc_gh.append(prc.cblk_grid_h)
                        self.entry_of[key] = cb_off[-1]
                        for cg in prc.cblks:
                            cb_cx.append(cg.cx)
                            cb_cy.append(cg.cy)
                            cb_style.append(sty)
                        cb_off.append(cb_off[-1] + len(prc.cblks))
        # per-entry geometry for flat T1 batch assembly / scatter
        e_comp, e_res, e_orient, e_h, e_w, e_py, e_px = [], [], [], [], [], [], []
        e_band = []
        self.band_keys: list[tuple[int, int, int]] = []
        for c in range(siz.num_comps):
            g = geoms[c]
            for res in g.resolutions:
                for bi, band in enumerate(res.bands):
                    self.band_keys.append((c, res.r, bi))
                    band_id = len(self.band_keys) - 1
                    if band.orient == 0:
                        oy = ox = 0
                    else:
                        prev = g.resolutions[res.r - 1].rect
                        oy = prev.height if band.orient in (2, 3) else 0
                        ox = prev.width if band.orient in (1, 3) else 0
                    for prc in band.precincts:
                        for cg in prc.cblks:
                            e_band.append(band_id)
                            e_comp.append(c)
                            e_res.append(res.r)
                            e_orient.append(band.orient)
                            e_h.append(cg.rect.height)
                            e_w.append(cg.rect.width)
                            if cg.rect.empty():
                                e_py.append(0)
                                e_px.append(0)
                            else:
                                e_py.append(cg.rect.y0 - band.rect.y0 + oy)
                                e_px.append(cg.rect.x0 - band.rect.x0 + ox)
        self.e_comp = np.asarray(e_comp, dtype=np.int32)
        self.e_res = np.asarray(e_res, dtype=np.int32)
        self.e_orient = np.asarray(e_orient, dtype=np.int32)
        self.e_h = np.asarray(e_h, dtype=np.int32)
        self.e_w = np.asarray(e_w, dtype=np.int32)
        self.e_py = np.asarray(e_py, dtype=np.int32)
        self.e_px = np.asarray(e_px, dtype=np.int32)
        self.e_band = np.asarray(e_band, dtype=np.int32)
        self.prc_numbps = np.asarray(prc_numbps, dtype=np.int32)
        self.prc_gw = np.asarray(prc_gw, dtype=np.int32)
        self.prc_gh = np.asarray(prc_gh, dtype=np.int32)
        self.prc_cb_off = np.asarray(cb_off, dtype=np.int32)
        self.cb_cx = np.asarray(cb_cx, dtype=np.int32)
        self.cb_cy = np.asarray(cb_cy, dtype=np.int32)
        self.cb_style = np.asarray(cb_style, dtype=np.int32)
        # packet sequence
        pkt_layer, pkt_off, pkt_ids = [], [0], []
        self.order = list(packet_order(siz, tcp, geoms, tile_rect))
        for pk in self.order:
            pkt_layer.append(pk.layer)
            nb = len(geoms[pk.comp].resolutions[pk.res].bands)
            for bi in range(nb):
                pkt_ids.append(key_idx[(pk.comp, pk.res, bi, pk.prec)])
            pkt_off.append(len(pkt_ids))
        self.pkt_layer = np.asarray(pkt_layer, dtype=np.int32)
        self.pkt_prc_off = np.asarray(pkt_off, dtype=np.int32)
        self.pkt_prc_ids = np.asarray(pkt_ids, dtype=np.int32)


def encode_packets(lib, flat: FlatTileT2, refs, t1res, cum_passes,
                   num_layers, use_sop, use_eph, ppt, simulate=False):
    """Emit all packets natively; returns (body, pkt_lens, headers|None).

    With ``simulate``, nothing is materialized: the return value is the
    exact total byte count (reference parity: T2Compress.cpp
    compressPacketsSimulate)."""
    if refs is None:
        # flat encode path: entry e IS global codeblock e (same iteration order)
        ncb = len(flat.cb_cx)
        cb_global = np.arange(ncb, dtype=np.int32)
    else:
        ncb = len(refs)
        cb_global = np.full(len(flat.cb_cx), -1, dtype=np.int32)
        for i, ref in enumerate(refs):
            e = flat.entry_of[(ref.comp, ref.res, ref.band_i, ref.prec)] + ref.cblk_i
            cb_global[e] = i
    if t1res.raw_data is not None:
        data, data_off = t1res.raw_data
        data = np.ascontiguousarray(data)  # no-op when already contiguous
    else:
        data = np.ascontiguousarray(t1res.data)
        data_off = 0
    pass_rates = np.ascontiguousarray(t1res.pass_rates, dtype=np.int64)
    cum = np.ascontiguousarray(cum_passes, dtype=np.int64)
    numbps = np.ascontiguousarray(t1res.numbps, dtype=np.int32)
    npasses = np.ascontiguousarray(t1res.npasses, dtype=np.int32)
    # per-global style: take from the entry mapping to it (same component)
    g_style = np.zeros(ncb, dtype=np.int32)
    g_style[cb_global[cb_global >= 0]] = flat.cb_style[cb_global >= 0]

    npk = len(flat.pkt_layer)
    out_cap = int(t1res.lengths.sum()) + npk * 64 + len(flat.cb_cx) * 24 + 4096
    if simulate:
        out_cap = 16
    hdr_cap = out_cap if ppt else 16
    for _ in range(3):
        out = np.empty(out_cap, dtype=np.uint8)
        hdr = np.empty(hdr_cap, dtype=np.uint8)
        pkt_lens = np.zeros(npk, dtype=np.int64)
        hdr_lens = np.zeros(npk, dtype=np.int64)
        total = np.zeros(1, dtype=np.int64)
        total_h = np.zeros(1, dtype=np.int64)
        rc = lib.t2_encode_packets(
            npk, flat.pkt_layer, flat.pkt_prc_off, flat.pkt_prc_ids,
            len(flat.prc_keys), flat.prc_numbps, flat.prc_gw, flat.prc_gh,
            flat.prc_cb_off, cb_global, flat.cb_cx, flat.cb_cy,
            ncb, data, data.shape[1] if data.ndim == 2 else 0, data_off,
            pass_rates, pass_rates.shape[1], numbps, npasses, g_style,
            cum, num_layers,
            int(use_sop), int(use_eph), int(ppt), 0, int(simulate),
            out, out_cap, pkt_lens, hdr, hdr_cap, hdr_lens,
            total, total_h,
        )
        if rc == -3:
            from ..core.errors import GrokTpuError

            raise GrokTpuError(
                "T2 encode: non-monotone pass rates (T1 estimate repair "
                "missing)")
        if rc == 0:
            if simulate:
                return int(total[0]) + int(total_h[0])
            body = out[: total[0]].tobytes()
            headers = None
            if ppt:
                headers = []
                off = 0
                for i in range(npk):
                    headers.append(hdr[off : off + hdr_lens[i]].tobytes())
                    off += int(hdr_lens[i])
            return body, [int(x) for x in pkt_lens], headers
        out_cap *= 4
        hdr_cap *= 4
    raise MemoryError("T2 encode buffer sizing failed")


def decode_packets(lib, flat: FlatTileT2, body, max_layers, use_sop, use_eph,
                   packed_headers, plt_lens=None, pkt_skip=None):
    """Parse all packets natively.

    Returns (entry_numbps, contributions, body_arr, n_skipped) where
    contributions is a tuple of (entry, npasses, nbytes, offset) arrays in
    stream order.

    ``pkt_skip`` marks unwanted packets (dropped resolution, precinct
    outside the decode window, truncated layer). The mask must be
    *precinct-monotone*: once a precinct's packet is skipped, every later
    packet of that precinct must be skipped too (true by construction for
    reduce/window/layer truncation) — a skipped packet's tag-tree state is
    never replayed. With ``plt_lens`` covering all packets (PLT marker
    lengths, cache/PacketLengthMarkers skipTo parity) skipped packets are
    jumped by their recorded byte length without parsing their headers;
    without PLT they are still header-parsed (to keep stream position and
    the PPT bit stream aligned) but contribute nothing."""
    body_arr = np.frombuffer(body, dtype=np.uint8) if len(body) else np.zeros(1, dtype=np.uint8)
    body_arr = np.ascontiguousarray(body_arr)
    use_ppt = packed_headers is not None
    if use_ppt:
        hdrs = np.frombuffer(packed_headers, dtype=np.uint8)
        hdrs = np.ascontiguousarray(hdrs) if len(hdrs) else np.zeros(1, dtype=np.uint8)
        hdr_len = len(packed_headers)
    else:
        hdrs = body_arr
        hdr_len = 0
    total_entries = int(flat.prc_cb_off[-1])
    npk = len(flat.pkt_layer)
    has_plt = 0
    if plt_lens is not None and not use_ppt and len(plt_lens) >= npk:
        plt_arr = np.ascontiguousarray(plt_lens[:npk], dtype=np.int64)
        has_plt = 1
    else:
        plt_arr = np.zeros(1, dtype=np.int64)
    if pkt_skip is not None:
        skip_arr = np.ascontiguousarray(pkt_skip, dtype=np.int32)
    else:
        skip_arr = np.zeros(npk, dtype=np.int32)
    n_skipped = np.zeros(1, dtype=np.int64)
    max_contrib = max(total_entries * max(len(flat.pkt_layer) // max(total_entries, 1) + 2, 4), 1024)
    for _ in range(4):
        out_entry = np.zeros(max_contrib, dtype=np.int32)
        out_np = np.zeros(max_contrib, dtype=np.int32)
        out_nb = np.zeros(max_contrib, dtype=np.int64)
        out_off = np.zeros(max_contrib, dtype=np.int64)
        n_contrib = np.zeros(1, dtype=np.int64)
        entry_numbps = np.zeros(total_entries, dtype=np.int32)
        end_pos = np.zeros(1, dtype=np.int64)
        rc = lib.t2_decode_packets(
            body_arr, len(body),
            len(flat.pkt_layer), flat.pkt_layer, flat.pkt_prc_off,
            flat.pkt_prc_ids, int(max_layers or 0),
            len(flat.prc_keys), flat.prc_numbps, flat.prc_gw, flat.prc_gh,
            flat.prc_cb_off, flat.cb_cx, flat.cb_cy, flat.cb_style,
            int(use_sop), int(use_eph),
            hdrs, hdr_len, int(use_ppt),
            has_plt, plt_arr, skip_arr, n_skipped,
            out_entry, out_np, out_nb, out_off, max_contrib, n_contrib,
            entry_numbps, end_pos,
        )
        if rc == 3:
            # the PLT lies about the packet spans (the reference encoder
            # writes inconsistent PLTs on POC / multi-tile-part streams):
            # reparse with headers only (unwanted packets parsed-and-dropped)
            from ..core import logging as log

            log.warn("PLT lengths disagree with packet headers at byte %d;"
                     " ignoring the PLT index", int(end_pos[0]))
            return decode_packets(lib, flat, body, max_layers, use_sop,
                                  use_eph, packed_headers,
                                  pkt_skip=pkt_skip)
        if rc == 0 or rc == 1:
            n = int(n_contrib[0])
            ent = out_entry[:n]
            np_c = out_np[:n]
            nb = out_nb[:n]
            off = out_off[:n]
            if rc == 1:
                # corrupt packet: keep every contribution parsed before the
                # error whose body bytes are actually present (reference
                # parity: T2Decompress m_corrupt_packet tolerance decodes
                # the intact prefix and leaves the rest zero)
                ok = (off >= 0) & (off + nb <= len(body))
                if not bool(ok.all()):
                    ent, np_c, nb, off = ent[ok], np_c[ok], nb[ok], off[ok]
                from ..core import logging as log

                log.warn(
                    "corrupt packet at byte %d: keeping %d intact "
                    "contributions", int(end_pos[0]), len(ent),
                )
            return entry_numbps, (ent, np_c, nb, off), body_arr, int(n_skipped[0])
        max_contrib *= 4
    raise MemoryError("T2 decode contribution buffer sizing failed")
