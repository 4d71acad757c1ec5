"""JP2 container (boxes) read/write — ITU-T T.800 Annex I.

Parity target: codestream/FileFormat{,Compress,Decompress}.{h,cpp} (jp2h,
ihdr, colr, pclr/cmap/cdef, res, xml, uuid box codecs), re-derived from the
standard.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from ..core.errors import CodestreamError
from ..core.image import Image
from ..core.params import ColorSpace

JP2_SIGNATURE = b"\x00\x00\x00\x0cjP  \r\n\x87\n"

# enumerated color spaces (T.800 I.5.3.3)
_ENUM_CS = {16: ColorSpace.SRGB, 17: ColorSpace.GRAY, 18: ColorSpace.SYCC,
            12: ColorSpace.CMYK, 14: ColorSpace.CIELAB}
_CS_ENUM = {v: k for k, v in _ENUM_CS.items()}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


@dataclass
class Jp2Info:
    codestream: bytes = b""
    color_space: ColorSpace = ColorSpace.UNKNOWN
    icc_profile: bytes | None = None
    xml: list[bytes] = field(default_factory=list)
    uuid: list[tuple[bytes, bytes]] = field(default_factory=list)
    palette: tuple | None = None  # (table [N, C], bit depths, cmap entries)
    channel_defs: list[tuple[int, int, int]] | None = None
    capture_resolution: tuple[float, float] | None = None
    display_resolution: tuple[float, float] | None = None


# the widely used EXIF-in-JP2 uuid ("JpgTiffExif->JP2", same convention
# ExifTool and the reference's exif transfer consume)
EXIF_UUID = b"JpgTiffExif->JP2"


def wrap_jp2(codestream: bytes, image: Image) -> bytes:
    """Wrap a raw codestream in a JP2 container."""
    out = bytearray(JP2_SIGNATURE)
    out += _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")

    nc = image.num_comps
    h = image.y1 - image.y0
    w = image.x1 - image.x0
    precs = [c.prec for c in image.components]
    signs = [c.signed for c in image.components]
    same = all(p == precs[0] and s == signs[0] for p, s in zip(precs, signs))
    bpc = (precs[0] - 1) | (0x80 if signs[0] else 0) if same else 0xFF
    ihdr = struct.pack(">IIHBBBB", h, w, nc, bpc, 7, 0, 0)
    jp2h = _box(b"ihdr", ihdr)
    if not same:
        jp2h += _box(b"bpcc", bytes((p - 1) | (0x80 if s else 0) for p, s in zip(precs, signs)))
    cs = image.color_space
    if cs == ColorSpace.UNKNOWN:
        # colr describes the POST-palette channels: a 1-component palettized
        # image with a 3-column table is sRGB, not grayscale
        ncol = len(image.palette[1]) if getattr(image, "palette", None) else nc
        cs = ColorSpace.GRAY if ncol == 1 else ColorSpace.SRGB
    if image.icc_profile:
        jp2h += _box(b"colr", struct.pack(">BBB", 2, 0, 0) + image.icc_profile)
    else:
        jp2h += _box(b"colr", struct.pack(">BBBI", 1, 0, 0, _CS_ENUM.get(cs, 17)))
    if getattr(image, "palette", None):
        jp2h += palette_boxes(image.palette)
    if getattr(image, "channel_defs", None):
        cdef = struct.pack(">H", len(image.channel_defs))
        for (cn, typ, asoc) in image.channel_defs:
            cdef += struct.pack(">HHH", cn, typ, asoc)
        jp2h += _box(b"cdef", cdef)
    if image.capture_resolution or getattr(image, "display_resolution", None):
        res = b""
        if image.capture_resolution:
            res += _box(b"resc", _res_payload(*image.capture_resolution))
        if getattr(image, "display_resolution", None):
            res += _box(b"resd", _res_payload(*image.display_resolution))
        jp2h += _box(b"res ", res)
    out += _box(b"jp2h", jp2h)
    if image.xml:
        out += _box(b"xml ", image.xml)
    if getattr(image, "exif", None):
        payload = image.exif
        if not payload.startswith(b"Exif\x00\x00"):
            payload = b"Exif\x00\x00" + payload
        out += _box(b"uuid", EXIF_UUID + payload)
    for (uid, payload) in getattr(image, "uuid_boxes", None) or []:
        out += _box(b"uuid", uid + payload)
    out += _box(b"jp2c", codestream)
    return bytes(out)


def palette_boxes(palette: tuple) -> bytes:
    """Serialize pclr + cmap boxes (T.800 I.5.3.4/I.5.3.5; reference:
    FileFormatCompress.cpp write_palette_clr / write_component_mapping)."""
    table, depths, cmap = palette
    ne = len(table)
    npc = len(depths)
    pclr = struct.pack(">HB", ne, npc)
    pclr += bytes((d - 1) & 0x7F for d in depths)  # Bi: unsigned, depth-1
    for row in table:
        for j, d in enumerate(depths):
            nb = (d + 7) // 8
            pclr += int(row[j]).to_bytes(nb, "big")
    out = _box(b"pclr", pclr)
    cmap_payload = b"".join(
        struct.pack(">HBB", c, m, p) for (c, m, p) in cmap)
    return out + _box(b"cmap", cmap_payload)


def _res_payload(vr: float, hr: float) -> bytes:
    def ratio(x):
        d = 1
        while x != int(x) and d < 1 << 12:
            x *= 10
            d *= 10
        n = int(x)
        e = 0
        while n > 0xFFFF:
            n //= 10
            e += 1
        return n, d, e

    vn, vd, ve = ratio(vr)
    hn, hd, he = ratio(hr)
    return struct.pack(">HHHHbb", vn, vd, hn, hd, ve, he)


def is_jp2(data: bytes | memoryview) -> bool:
    return bytes(data[:12]) == JP2_SIGNATURE


def unwrap_jp2(data: bytes | memoryview) -> Jp2Info:
    """Parse a JP2 container; returns the codestream + color metadata."""
    data = memoryview(data)
    if not is_jp2(data):
        raise CodestreamError("not a JP2 file")
    info = Jp2Info()
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        btype = bytes(data[pos + 4 : pos + 8])
        hdr = 8
        if ln == 1:
            if pos + 16 > n:
                raise CodestreamError("JP2: truncated XLBox header")
            (ln,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif ln == 0:
            ln = n - pos
        if ln < hdr or pos + ln > n:
            raise CodestreamError("JP2: box length out of bounds")
        payload = data[pos + hdr : pos + ln]
        try:
            if btype == b"jp2c":
                info.codestream = bytes(payload)
            elif btype == b"jp2h":
                _parse_jp2h(payload, info)
            elif btype == b"xml ":
                info.xml.append(bytes(payload))
            elif btype == b"uuid":
                info.uuid.append((bytes(payload[:16]), bytes(payload[16:])))
        except (struct.error, IndexError, ValueError) as e:
            raise CodestreamError(f"JP2: malformed {btype!r} box: {e}") from e
        pos += ln
    if not info.codestream:
        raise CodestreamError("JP2: no codestream box")
    return info


def _parse_jp2h(data: memoryview, info: Jp2Info) -> None:
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        btype = bytes(data[pos + 4 : pos + 8])
        if ln == 0:
            ln = n - pos
        if ln < 8 or pos + ln > n:
            raise CodestreamError("JP2: jp2h sub-box length out of bounds")
        payload = data[pos + 8 : pos + ln]
        if btype == b"colr":
            if len(payload) < 3:
                raise CodestreamError("JP2: colr box too short")
            meth = payload[0]
            if meth == 1:
                (cs,) = struct.unpack(">I", payload[3:7])
                info.color_space = _ENUM_CS.get(cs, ColorSpace.UNKNOWN)
            elif meth == 2:
                info.icc_profile = bytes(payload[3:])
        elif btype == b"res ":
            rp = 0
            while rp + 8 <= len(payload):
                (rln,) = struct.unpack(">I", payload[rp : rp + 4])
                rtyp = bytes(payload[rp + 4 : rp + 8])
                if rln < 8 or rp + rln > len(payload):
                    break
                body = payload[rp + 8 : rp + rln]
                if len(body) >= 10:
                    vn, vd, hn, hd, ve, he = struct.unpack(">HHHHbb", body[:10])
                    val = (vn / max(vd, 1) * 10.0 ** ve,
                           hn / max(hd, 1) * 10.0 ** he)
                    if rtyp == b"resc":
                        info.capture_resolution = val
                    elif rtyp == b"resd":
                        info.display_resolution = val
                rp += rln
        elif btype == b"pclr":
            ne, npc = struct.unpack(">HB", payload[:3])
            depths = [(payload[3 + i] & 0x7F) + 1 for i in range(npc)]
            p = 3 + npc
            table = []
            for _ in range(ne):
                row = []
                for d in depths:
                    nb = (d + 7) // 8
                    v = int.from_bytes(payload[p : p + nb], "big")
                    row.append(v)
                    p += nb
                table.append(row)
            info.palette = (table, depths, None)
        elif btype == b"cmap":
            entries = []
            for i in range(0, len(payload), 4):
                cmp_, mtyp, pcol = struct.unpack(">HBB", payload[i : i + 4])
                entries.append((cmp_, mtyp, pcol))
            if info.palette:
                info.palette = (info.palette[0], info.palette[1], entries)
            else:
                info.palette = (None, None, entries)
        elif btype == b"cdef":
            (cnt,) = struct.unpack(">H", payload[:2])
            defs = []
            for i in range(cnt):
                defs.append(struct.unpack(">HHH", payload[2 + 6 * i : 8 + 6 * i]))
            info.channel_defs = defs
        pos += ln


def apply_palette(image: Image, info: Jp2Info) -> Image:
    """Expand a palettized image using pclr/cmap (decode post-process)."""
    import numpy as np

    if not info.palette or info.palette[0] is None or not info.palette[2]:
        return image
    table, depths, cmap = info.palette
    tbl = np.asarray(table, dtype=np.int32)  # [entries, pal_comps]
    out = Image(image.x0, image.y0, image.x1, image.y1, color_space=info.color_space)
    from ..core.image import Component

    for (cmp_i, mtyp, pcol) in cmap:
        src = image.components[cmp_i]
        if mtyp == 1:  # palette mapping
            idx = np.clip(src.data, 0, tbl.shape[0] - 1)
            data = tbl[idx, pcol]
            prec = depths[pcol]
        else:
            data = src.data
            prec = src.prec
        out.components.append(
            Component(dx=src.dx, dy=src.dy, prec=prec, signed=False, data=data)
        )
    out.finalize()
    return out
