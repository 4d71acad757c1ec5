"""Native strip-based TIFF codec (no PIL).

Parity target: the reference's hand-rolled strip codec
(/root/reference/src/bin/image_format/TIFFFormat.cpp:1-1755 and the strip
interface IImageFormat.h:27-31). Covers the codec-workflow envelope —
classic TIFF, either byte order, uncompressed strips, 8/16-bit samples,
1/3/4 samples per pixel, chunky (PlanarConfig=1) AND planar
(PlanarConfig=2) layouts — with a streaming strip reader that feeds
StripCompressor without materializing gigapixel planes. Anything outside
that envelope (compression, packed sub-byte depths, tiles) raises
TiffUnsupported so io/formats.py can fall back to PIL for read.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

import numpy as np


class TiffUnsupported(ValueError):
    """Feature outside the native envelope (caller may fall back to PIL)."""


# tag ids (TIFF 6.0)
T_WIDTH, T_HEIGHT = 256, 257
T_BPS, T_COMPRESSION, T_PHOTOMETRIC = 258, 259, 262
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_SAMPLEFORMAT = 284, 339
T_ICC = 34675

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 16: "Q", 17: "q"}


@dataclass
class TiffInfo:
    width: int
    height: int
    spp: int
    bps: int
    planar: int  # 1 chunky, 2 planar
    photometric: int
    rows_per_strip: int
    strip_offsets: list
    strip_counts: list
    big_endian: bool
    signed: bool = False
    icc: bytes | None = None
    extra: dict = field(default_factory=dict)


def _read_ifd(f, base, bo):
    f.seek(base)
    (n,) = struct.unpack(bo + "H", f.read(2))
    tags = {}
    for _ in range(n):
        tag, typ, cnt = struct.unpack(bo + "HHI", f.read(8))
        raw = f.read(4)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            data = raw[:size]
        else:
            (off,) = struct.unpack(bo + "I", raw)
            pos = f.tell()
            f.seek(off)
            data = f.read(size)
            f.seek(pos)
        fmt = _TYPE_FMT.get(typ)
        if fmt:
            vals = list(struct.unpack(bo + fmt * cnt, data))
        else:
            vals = [data]
        tags[tag] = vals
    (nxt,) = struct.unpack(bo + "I", f.read(4))
    return tags, nxt


def read_info(path: str) -> TiffInfo:
    with open(path, "rb") as f:
        hdr = f.read(8)
        if len(hdr) < 8 or hdr[:2] not in (b"II", b"MM"):
            raise TiffUnsupported("not a TIFF")
        big = hdr[:2] == b"MM"
        bo = ">" if big else "<"
        magic, off0 = struct.unpack(bo + "HI", hdr[2:8])
        if magic == 43:
            raise TiffUnsupported("BigTIFF not in the native envelope")
        if magic != 42:
            raise TiffUnsupported("bad TIFF magic")
        tags, _ = _read_ifd(f, off0, bo)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffUnsupported(f"missing tag {tag}")
            return default
        return int(v[0])

    comp = one(T_COMPRESSION, 1)
    if comp != 1:
        raise TiffUnsupported(f"compression {comp}")
    if 322 in tags or 323 in tags:
        raise TiffUnsupported("tiled TIFF")
    spp = one(T_SPP, 1)
    bps_list = tags.get(T_BPS, [8])
    bps = int(bps_list[0])
    if any(int(b) != bps for b in bps_list):
        raise TiffUnsupported("heterogeneous BitsPerSample")
    if bps not in (8, 16):
        raise TiffUnsupported(f"{bps}-bit samples (packed depths ride PIL)")
    sf = tags.get(T_SAMPLEFORMAT, [1])
    if any(int(s) not in (1, 2) for s in sf):
        raise TiffUnsupported("non-integer SampleFormat")
    height = one(T_HEIGHT)
    info = TiffInfo(
        width=one(T_WIDTH),
        height=height,
        spp=spp,
        bps=bps,
        planar=one(T_PLANAR, 1),
        photometric=one(T_PHOTOMETRIC, 1),
        rows_per_strip=min(one(T_ROWS_PER_STRIP, height) or height, height),
        strip_offsets=[int(v) for v in tags.get(T_STRIP_OFFSETS, [])],
        strip_counts=[int(v) for v in tags.get(T_STRIP_COUNTS, [])],
        big_endian=big,
        signed=int(sf[0]) == 2,
        icc=bytes(tags[T_ICC][0]) if T_ICC in tags and
        isinstance(tags[T_ICC][0], (bytes, bytearray)) else None,
    )
    if not info.strip_offsets:
        raise TiffUnsupported("no strip offsets")
    return info


def _strip_dtype(info: TiffInfo):
    base = "u" if not info.signed else "i"
    if info.bps == 8:
        return np.dtype(f"{base}1")
    return np.dtype(f"{'>' if info.big_endian else '<'}{base}2")


def iter_strips(path: str, info: TiffInfo | None = None):
    """Yield [rows, width, spp] int32 chunks in row order (chunky view).

    For planar files the per-plane strips are gathered per row band, so
    the consumer always sees interleaved chunks — the shape
    StripCompressor.push takes. This is the streaming path: one strip
    band is resident at a time.
    """
    info = info or read_info(path)
    dt = _strip_dtype(info)
    rps = info.rows_per_strip
    nbands = (info.height + rps - 1) // rps
    with open(path, "rb") as f:
        def read_strip(idx, rows):
            f.seek(info.strip_offsets[idx])
            want = rows * info.width * (info.bps // 8) * (
                1 if info.planar == 2 else info.spp)
            raw = f.read(min(info.strip_counts[idx], want))
            if len(raw) < want:  # tolerate short final strips: pad zero
                raw = raw + b"\0" * (want - len(raw))
            return np.frombuffer(raw, dtype=dt)

        for b in range(nbands):
            rows = min(rps, info.height - b * rps)
            if info.planar == 2:
                planes = []
                for s in range(info.spp):
                    idx = s * nbands + b
                    if idx >= len(info.strip_offsets):
                        raise TiffUnsupported("planar strip table short")
                    planes.append(
                        read_strip(idx, rows).reshape(rows, info.width))
                chunk = np.stack(planes, axis=-1)
            else:
                chunk = read_strip(b, rows).reshape(
                    rows, info.width, info.spp)
            chunk = chunk.astype(np.int32)
            if info.photometric == 0:  # WhiteIsZero: invert to MinIsBlack
                chunk = ((1 << info.bps) - 1) - chunk
            yield chunk


def read(path: str):
    """Whole-image read -> (array [h, w, spp] int32, TiffInfo)."""
    info = read_info(path)
    out = np.empty((info.height, info.width, info.spp), dtype=np.int32)
    y = 0
    for chunk in iter_strips(path, info):
        out[y:y + chunk.shape[0]] = chunk
        y += chunk.shape[0]
    return out, info


def write(path: str, arr: np.ndarray, bps: int | None = None,
          planar: int = 1, big_endian: bool = False,
          rows_per_strip: int | None = None, icc: bytes | None = None,
          signed: bool = False) -> None:
    """Strip-based uncompressed TIFF write; arr [h, w] or [h, w, spp]."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    if bps is None:
        bps = 16 if int(arr.max(initial=0)) > 255 or signed else 8
    if bps not in (8, 16):
        raise TiffUnsupported(f"{bps}-bit write")
    bo = ">" if big_endian else "<"
    base = "i" if signed else "u"
    dt = np.dtype(f"{bo}{base}{bps // 8}") if bps == 16 else np.dtype(
        f"{base}1")
    if rows_per_strip is None:
        # ~1 MiB strips (the reference uses library-default strip sizing)
        rows_per_strip = max(1, (1 << 20) // max(w * spp * (bps // 8), 1))
    rows_per_strip = min(rows_per_strip, h)
    nbands = (h + rows_per_strip - 1) // rows_per_strip
    nstrips = nbands * (spp if planar == 2 else 1)

    photometric = 2 if spp >= 3 else 1
    tags = [
        (T_WIDTH, 4, 1, [w]),
        (T_HEIGHT, 4, 1, [h]),
        (T_BPS, 3, spp, [bps] * spp),
        (T_COMPRESSION, 3, 1, [1]),
        (T_PHOTOMETRIC, 3, 1, [photometric]),
        (T_STRIP_OFFSETS, 4, nstrips, None),   # patched below
        (T_SPP, 3, 1, [spp]),
        (T_ROWS_PER_STRIP, 4, 1, [rows_per_strip]),
        (T_STRIP_COUNTS, 4, nstrips, None),    # patched below
        (T_PLANAR, 3, 1, [planar]),
        (T_SAMPLEFORMAT, 3, spp, [2 if signed else 1] * spp),
    ]
    if icc:
        tags.append((T_ICC, 7, len(icc), [bytes(icc)]))
    tags.sort(key=lambda t: t[0])

    # layout: header(8) | IFD | out-of-line tag data | strips
    ifd_off = 8
    ifd_size = 2 + len(tags) * 12 + 4
    data_off = ifd_off + ifd_size

    # assign out-of-line blocks
    blobs = []
    entries = []
    offsets_slot = counts_slot = None
    for tag, typ, cnt, vals in tags:
        size = _TYPE_SIZE[typ] * cnt
        if vals is None:  # offsets/counts patched after sizing
            slot = (tag, typ, cnt, data_off if size > 4 else None)
            if size > 4:
                blobs.append(b"\0" * size)
                if tag == T_STRIP_OFFSETS:
                    offsets_slot = (len(blobs) - 1, data_off)
                else:
                    counts_slot = (len(blobs) - 1, data_off)
                data_off += size
            else:
                if tag == T_STRIP_OFFSETS:
                    offsets_slot = (None, None)
                else:
                    counts_slot = (None, None)
            entries.append(slot)
            continue
        if typ == 7:
            payload = vals[0]
        else:
            payload = struct.pack(bo + _TYPE_FMT[typ] * cnt, *vals)
        if size <= 4:
            entries.append((tag, typ, cnt, payload.ljust(4, b"\0")))
        else:
            entries.append((tag, typ, cnt, data_off))
            blobs.append(payload)
            data_off += size

    strips_off = data_off
    # compute strip offsets/counts
    offs, cnts = [], []
    cur = strips_off
    planes = range(spp) if planar == 2 else [None]
    for p in planes:
        for b in range(nbands):
            rows = min(rows_per_strip, h - b * rows_per_strip)
            sz = rows * w * (bps // 8) * (1 if planar == 2 else spp)
            offs.append(cur)
            cnts.append(sz)
            cur += sz

    def pack_list(vals):
        return struct.pack(bo + "I" * len(vals), *vals)

    if offsets_slot[0] is not None:
        blobs[offsets_slot[0]] = pack_list(offs)
    if counts_slot[0] is not None:
        blobs[counts_slot[0]] = pack_list(cnts)

    with open(path, "wb") as f:
        f.write((b"MM" if big_endian else b"II")
                + struct.pack(bo + "HI", 42, ifd_off))
        f.write(struct.pack(bo + "H", len(entries)))
        for tag, typ, cnt, val in entries:
            f.write(struct.pack(bo + "HHI", tag, typ, cnt))
            if isinstance(val, bytes):
                f.write(val)
            elif val is None:  # inline offsets/counts (single strip)
                v = offs if tag == T_STRIP_OFFSETS else cnts
                f.write(pack_list(v).ljust(4, b"\0"))
            else:
                f.write(struct.pack(bo + "I", val))
        f.write(struct.pack(bo + "I", 0))  # no next IFD
        for blob in blobs:
            f.write(blob)
        # strip payloads
        for p in planes:
            for b in range(nbands):
                y0 = b * rows_per_strip
                rows = min(rows_per_strip, h - y0)
                band = arr[y0:y0 + rows]
                if p is not None:
                    band = band[:, :, p]
                f.write(np.ascontiguousarray(band, dtype=dt).tobytes())
