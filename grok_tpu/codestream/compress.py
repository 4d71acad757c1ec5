"""Whole-image codestream encoder (parity target:
codestream/CodeStreamCompress.cpp — initCompress/compress/endCompress and the
marker writers).

Host-side orchestration: builds the main header, runs per-tile
TileProcessors (each of which drives batched device work), assembles tile
parts in index order, and fixes up TLM.
"""

from __future__ import annotations

import numpy as np

from ..core.errors import ParameterError
from ..core.image import Image
from ..core.params import CompressParams, QuantStyle
from ..core.rect import ceil_div
from ..tile.tile_processor import TileProcessor
from . import markers as mk
from .quantizer import compute_signalled_quant
from .structs import Siz, SizComponent, Tcp, TccpStyle


def build_siz(image: Image, params: CompressParams) -> Siz:
    siz = Siz()
    siz.rsiz = params.profile
    siz.x0, siz.y0 = image.x0, image.y0
    siz.x1, siz.y1 = image.x1, image.y1
    if params.tile_size is None:
        # conventional single-tile anchoring: grid origin (0,0), tile spans
        # the full canvas (what the reference and other decoders expect for
        # images with a nonzero canvas offset)
        siz.tile_x0, siz.tile_y0 = 0, 0
        siz.tile_w = image.x1
        siz.tile_h = image.y1
    else:
        siz.tile_x0, siz.tile_y0 = params.tile_offset
        siz.tile_w, siz.tile_h = params.tile_size
    for c in image.components:
        siz.comps.append(SizComponent(dx=c.dx, dy=c.dy, prec=c.prec, signed=c.signed))
    if siz.num_tiles > 65535:
        raise ParameterError(
            f"tile grid {siz.num_tiles_x}x{siz.num_tiles_y} exceeds the "
            "65535-tile limit (T.800: SOT's Isot is 16-bit)")
    return siz


def build_tcp(image: Image, params: CompressParams) -> Tcp:
    tcp = Tcp()
    tcp.csty = 0
    if params.use_sop:
        tcp.csty |= 0x02
    if params.use_eph:
        tcp.csty |= 0x04
    tcp.progression = params.progression
    tcp.num_layers = params.num_layers
    cs = image.components
    equal = len(cs) >= 3 and all(
        (c.dx, c.dy) == (cs[0].dx, cs[0].dy) for c in cs[:3]
    )
    if params.mct_matrix is not None:
        tcp.mct = 2  # Part-2 array-based MCT
        tcp.mct_dec_matrix = np.linalg.inv(
            np.asarray(params.mct_matrix, dtype=np.float64)
        )
        tcp.mct_offsets = [
            float(1 << (image.components[c].prec - 1))
            if not image.components[c].signed else 0.0
            for c in range(image.num_comps)
        ]
        tcp._mct_enc_matrix = np.asarray(params.mct_matrix, dtype=np.float64)
    else:
        tcp.mct = 1 if params.resolved_mct(image.num_comps, equal) else 0
    tcp.pocs = list(params.progression_changes)
    qs = params.quant_style
    if qs is None:
        qs = QuantStyle.NO_QUANT if not params.irreversible else QuantStyle.SCALAR_EXPOUNDED
    cblk_style = params.cblk_style | (0x40 if params.ht else 0)
    for c in range(image.num_comps):
        t = TccpStyle(
            num_resolutions=params.num_resolutions,
            cblk_w_exp=params.cblk_width.bit_length() - 1,
            cblk_h_exp=params.cblk_height.bit_length() - 1,
            cblk_style=cblk_style,
            irreversible=params.irreversible,
            quant_style=qs,
            guard_bits=params.guard_bits,
        )
        if params.precinct_sizes is not None:
            t.precinct_exps = list(params.precinct_sizes)
        prec = image.components[c].prec
        if tcp.mct == 1 and not params.irreversible and c in (1, 2):
            prec += 1  # RCT expands the chroma range by one bit
        if params.roi_comp == c and params.roi_shift > 0:
            t.roi_shift = params.roi_shift  # Mb grows by the shift (E.1.1)
        compute_signalled_quant(t, prec)
        tcp.tccps.append(t)
    return tcp


def write_main_header(siz, tcp, params, image) -> tuple[bytearray, int | None]:
    """Main header SOC..TLM-placeholder (shared by the one-shot and strip
    encoders). Returns (bytes, tlm_placeholder_offset_or_None)."""
    out = bytearray()
    out += mk._u16(mk.SOC)
    out += mk.write_siz(siz)
    if params.ht:
        # CAP: Pcap bit for Part 15, Ccap15 = MAGB encoding (T.814 A.3)
        magb = max(
            max(t.step_exps) + t.guard_bits - 1 for t in tcp.tccps
        )
        if magb <= 8:
            bp = 0
        elif magb < 28:
            bp = magb - 8
        elif magb < 48:
            bp = 13 + (magb >> 2)
        else:
            bp = 31
        ccap15 = bp | (0x20 if params.irreversible else 0)
        ccap15 &= 0xFFDF  # HTONLY signalling matches the reference encoder
        out += mk.write_cap(0x00020000, [ccap15])
    out += mk.write_cod(tcp)
    out += mk.write_qcd(tcp)
    base = tcp.tccps[0]
    for c in range(1, siz.num_comps):
        t = tcp.tccps[c]
        if t.step_exps != base.step_exps or t.step_mants != base.step_mants:
            out += mk.write_qcc(tcp, c, siz.num_comps)
    if params.mct_matrix is not None:
        out += mk.write_mct_markers(
            np.linalg.inv(np.asarray(params.mct_matrix, dtype=np.float64)),
            [1 << (image.components[c].prec - 1)
             if not image.components[c].signed else 0
             for c in range(siz.num_comps)],
        )
    if tcp.pocs:
        out += mk.write_poc(tcp, siz.num_comps)
    if params.roi_comp >= 0 and params.roi_shift > 0:
        out += mk.write_rgn(params.roi_comp, params.roi_shift, siz.num_comps)
    if params.comment:
        out += mk.write_com(params.comment.encode())

    tlm_offset = None
    num_tiles = siz.num_tiles
    if params.write_tlm:
        tlm_offset = len(out)
        # ST=1 if <=255 tiles else 2; SP=1 -> 32-bit lengths
        st = 1 if num_tiles <= 255 else 2
        entry = st + 4
        out += mk.segment(mk.TLM, bytes(2 + entry * num_tiles))  # placeholder
    return out, tlm_offset



def compress(image: Image, params: CompressParams | None = None,
             tile_coeff_fn=None, entropy_workers: int | None = None,
             entropy_threads: int | None = None) -> bytes:
    """Encode an Image to a raw .j2k codestream.

    ``tile_coeff_fn(tile_index)`` may supply pre-transformed packed
    coefficient arrays (the distributed mesh path); returning None falls
    back to the local per-tile transform. ``entropy_workers`` /
    ``entropy_threads`` pin the tile pool width and per-worker native
    team size (defaults: all cores, split across workers)."""
    params = params or CompressParams()
    params.validate()
    image.finalize()
    if params.mct_matrix is not None:
        # Part-2 array MCT: irreversible float path, Rsiz extension bits
        params.irreversible = True
    if params.profile:
        from .profile import apply_profile

        apply_profile(params, image)
    siz = build_siz(image, params)
    tcp = build_tcp(image, params)

    # validate resolution count against smallest tile-component
    for ti in range(siz.num_tiles):
        tb = siz.tile_bounds(ti)
        if tb.empty():
            raise ParameterError(f"tile {ti} empty")

    if params.ht:
        siz.rsiz |= 0x4000  # JPH capability flag in Rsiz
    if params.mct_matrix is not None:
        siz.rsiz |= 0x8100  # PART2 | EXTENSION_MCT (grok.h:151,158)

    out, tlm_offset = write_main_header(siz, tcp, params, image)
    num_tiles = siz.num_tiles

    tile_part_lengths: list[tuple[int, int]] = []
    tiles_blob = bytearray()
    plm_parts: list[list[int]] = []  # per tile-part packet lengths (PLM)

    ppm_groups: list[list[bytes]] | None = (
        [[] for _ in range(num_tiles)] if params.write_ppm else None)

    def enc_one(ti):
        coeffs = tile_coeff_fn(ti) if tile_coeff_fn is not None else None
        comp_arrays = None if coeffs is not None else _extract_tile(image, siz, ti)
        return encode_tile_to_blob(
            siz, tcp, params, ti, comp_arrays, coeffs,
            ppm_out=None if ppm_groups is None else ppm_groups[ti])

    if num_tiles > 1:
        # tile-parallel encode on host threads (reference parity: one
        # TileProcessor per tile on the pool, output serialized in tile
        # order — CodeStreamCompress.cpp:615); each worker caps its OMP
        # team so tiles*omp ~= ncores. The pool also covers the
        # distributed path (tile_coeff_fn set): there the workers run
        # only entropy + T2 on the mesh-transformed coefficients — the
        # per-tile T1 fan-out the reference gets from
        # T1CompressScheduler.cpp:31-145.
        from concurrent.futures import ThreadPoolExecutor

        from ..core.cpu import host_threads, set_tile_threads

        nw = min(host_threads(params.num_threads), num_tiles, 8)
        if entropy_workers is not None:
            nw = max(1, min(entropy_workers, num_tiles))
        per_tile = entropy_threads or max(
            1, host_threads(params.num_threads) // nw)

        def work(ti):
            set_tile_threads(per_tile)
            return enc_one(ti)

        with ThreadPoolExecutor(max_workers=nw) as ex:
            results = list(ex.map(work, range(num_tiles)))
    else:
        results = [enc_one(ti) for ti in range(num_tiles)]
    for blob, part_lens, plens_list in results:
        tiles_blob += blob
        tile_part_lengths.extend(part_lens)
        plm_parts.extend(plens_list)

    if params.write_tlm and tlm_offset is not None:
        tlm = mk.write_tlm(
            tile_part_lengths, st=1 if num_tiles <= 255 else 2
        )
        out[tlm_offset : tlm_offset + len(tlm)] = tlm
    if params.write_plm:
        out += mk.write_plm(plm_parts)
    if ppm_groups is not None:
        # main-header packed packet headers: Nppm(u32) + group bytes per
        # tile-part, in global tile-part order, chunked into <=65000-byte
        # PPM segments with running Zppm
        payload = b"".join(
            len(g).to_bytes(4, "big") + g
            for groups in ppm_groups for g in groups)
        z = 0
        pos = 0
        while pos < len(payload) or z == 0:
            chunk = payload[pos:pos + 65000]
            out += mk.segment(mk.PPM, bytes([z]) + chunk)
            pos += len(chunk)
            z += 1
    out += tiles_blob
    out += mk._u16(mk.EOC)
    return bytes(out)


def _extract_tile(image: Image, siz: Siz, tile_index: int) -> list[np.ndarray]:
    tb = siz.tile_bounds(tile_index)
    arrays = []
    for c in image.components:
        x0 = ceil_div(tb.x0, c.dx) - c.x0
        y0 = ceil_div(tb.y0, c.dy) - c.y0
        x1 = ceil_div(tb.x1, c.dx) - c.x0
        y1 = ceil_div(tb.y1, c.dy) - c.y0
        arrays.append(c.data[y0:y1, x0:x1])
    return arrays

def encode_tile_to_blob(siz, tcp, params, ti, comp_arrays=None, coeffs=None,
                        ppm_out: list | None = None):
    """Encode one tile into its SOT..body blob (shared by the one-shot,
    distributed and strip-streaming encoders).

    Returns (blob, [(tile, psot), ...], [per-part packet lengths, ...]).
    With ``ppm_out`` (a list; the write_ppm path) the packed packet
    headers are NOT written as PPT segments: one bytes group per
    tile-part is appended to ppm_out instead, for the caller to fold
    into main-header PPM segments (T.800 A.7.4)."""
    tp = TileProcessor(siz, tcp, ti, enc_params=params)
    want_packed = params.write_ppt or ppm_out is not None
    hdrs: list[bytes] | None = [] if want_packed else None
    if coeffs is not None:
        body, pkt_lens = tp.compress_from_coeffs(coeffs, packed_headers=hdrs)
    else:
        body, pkt_lens = tp.compress(comp_arrays, packed_headers=hdrs)
    ppt_bytes = b""
    if hdrs is not None and ppm_out is None:
        blob2 = b"".join(hdrs)
        z = 0
        pos2 = 0
        while pos2 < len(blob2) or z == 0:
            chunk = blob2[pos2 : pos2 + 65000]
            ppt_bytes += mk.segment(mk.PPT, bytes([z]) + chunk)
            pos2 += len(chunk)
            z += 1
    plt_bytes = b""
    if params.write_plt:
        from ..cache.length_cache import PacketLengthCache

        plc = PacketLengthCache()
        for ln in pkt_lens:
            plc.push(ln)
        plt_bytes = b"".join(plc.to_plt_segments())

    # split the tile into tile-parts at divider boundaries
    # (parity: CodeStreamCompress.cpp getNumTileParts, divider 'C'/'R'/'L')
    if params.tp_divider:
        counts = tp.packet_part_counts(params.tp_divider)
    else:
        counts = [len(pkt_lens)]
    parts: list[tuple[int, int, list[int]]] = []
    idx = 0
    off = 0
    for cnt in counts:
        ln = int(sum(pkt_lens[idx : idx + cnt]))
        parts.append((off, ln, pkt_lens[idx : idx + cnt]))
        off += ln
        idx += cnt
    assert off == len(body), "tile-part split must cover the body"
    if ppm_out is not None:
        # one packed-header group per tile-part, aligned with the global
        # tile-part order the decoder replays (decompress.py _tp_seq)
        idx2 = 0
        for _, _, plens in parts:
            ppm_out.append(b"".join(hdrs[idx2:idx2 + len(plens)]))
            idx2 += len(plens)
    ntp = len(parts)
    out = bytearray()
    part_lens = []
    plens_list = []
    for tpi, (boff, blen, plens) in enumerate(parts):
        extra = (ppt_bytes + plt_bytes) if tpi == 0 else b""
        psot = 12 + len(extra) + 2 + blen
        out += mk.write_sot(ti, psot, tpi, ntp)
        out += extra
        out += mk._u16(mk.SOD)
        out += body[boff : boff + blen]
        part_lens.append((ti, psot))
        plens_list.append(plens)
    return bytes(out), part_lens, plens_list


class TileEncoder:
    """Per-tile push encoder (parity: grk_compress_tile,
    CodeStreamCompress.cpp compressTile / SURVEY §3.5): the caller supplies
    each tile's component data explicitly — tiles may arrive in any order,
    the codestream is emitted in tile-index order on close().

    Usage::

        te = TileEncoder(out, image_geometry, params)
        te.compress_tile(3, comp_arrays_3)
        te.compress_tile(0, comp_arrays_0)
        ...
        te.close()
    """

    def __init__(self, dst, image: Image, params: CompressParams | None = None):
        from ..core.stream import OutputStream

        self.params = params or CompressParams()
        self.params.validate()
        if self.params.profile:
            from .profile import apply_profile

            apply_profile(self.params, image)
        self.image = image
        self.siz = build_siz(image, self.params)
        self.tcp = build_tcp(image, self.params)
        self.out = OutputStream(dst)
        header, tlm_offset = write_main_header(
            self.siz, self.tcp, self.params, image
        )
        self._tlm_offset = tlm_offset if self.out.seekable else None
        self.out.write(bytes(header))
        self._blobs: dict[int, bytes] = {}
        self._parts: dict[int, list] = {}
        self._closed = False

    def compress_tile(self, tile_index: int, comp_arrays) -> int:
        """Encode one tile; returns its compressed byte count. Tiles may be
        pushed out of order; each index at most once."""
        if self._closed:
            raise RuntimeError("TileEncoder already closed")
        if tile_index in self._blobs:
            raise ValueError(f"tile {tile_index} already compressed")
        if not 0 <= tile_index < self.siz.num_tiles:
            raise ValueError("tile index out of range")
        blob, part_lens, _plm = encode_tile_to_blob(
            self.siz, self.tcp, self.params, tile_index, comp_arrays
        )
        self._blobs[tile_index] = bytes(blob)
        self._parts[tile_index] = part_lens
        return len(blob)

    def close(self) -> int:
        """Write all tiles in index order + EOC; patch TLM. Returns the
        final stream length."""
        missing = [t for t in range(self.siz.num_tiles) if t not in self._blobs]
        if missing:
            raise ValueError(f"tiles never compressed: {missing[:8]}")
        part_lens_all = []
        for ti in range(self.siz.num_tiles):
            self.out.write(self._blobs[ti])
            part_lens_all.extend(self._parts[ti])
        self.out.write(mk._u16(mk.EOC))
        if self._tlm_offset is not None:
            tlm = mk.write_tlm(
                part_lens_all, st=1 if self.siz.num_tiles <= 255 else 2
            )
            self.out.patch(self._tlm_offset, tlm)
        end = self.out.tell()
        self.out.close()
        self._closed = True
        return end
