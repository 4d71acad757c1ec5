"""Raster image file I/O (parity target: src/bin/image_format/ — TIFF, PNG,
BMP, JPEG, PNM/PAM, PGX, RAW codecs).

PIL covers PNG/TIFF/BMP/JPEG; PNM 16-bit, PGX and RAW have native
implementations here (PIL's PNM support is 8-bit-oriented and PGX is a
JPEG 2000 test-suite format PIL doesn't know).
"""

from __future__ import annotations

import os
import re

import numpy as np

from ..core.image import Image
from ..core.params import ColorSpace


# ------------------------------------------------------------------- PGX
def read_pgx(path: str) -> Image:
    with open(path, "rb") as f:
        hdr = f.readline().decode()
        m = re.match(r"PG\s+(ML|LM)\s*([+-]?)\s*(\d+)\s+(\d+)\s+(\d+)", hdr)
        if not m:
            raise ValueError("bad PGX header")
        be = m.group(1) == "ML"
        signed = m.group(2) == "-"
        depth = int(m.group(3))
        w, h = int(m.group(4)), int(m.group(5))
        nb = 1 if depth <= 8 else (2 if depth <= 16 else 4)
        kind = ("i" if signed else "u") + str(nb)
        arr = np.frombuffer(f.read(), dtype=np.dtype((">" if be else "<") + kind),
                            count=h * w).reshape(h, w)
    img = Image.from_array(arr.astype(np.int32), prec=depth, signed=signed,
                           color_space=ColorSpace.GRAY)
    return img


def write_pgx(path: str, image: Image, comp: int = 0) -> None:
    c = image.components[comp]
    with open(path, "wb") as f:
        sign = "-" if c.signed else "+"
        f.write(f"PG ML {sign} {c.prec} {c.w} {c.h}\n".encode())
        nb = 1 if c.prec <= 8 else (2 if c.prec <= 16 else 4)
        kind = ("i" if c.signed else "u") + str(nb)
        f.write(np.ascontiguousarray(c.data, dtype=np.dtype(">" + kind)).tobytes())


# ------------------------------------------------------------------- PNM
def read_pnm(path: str) -> Image:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] not in (b"P5", b"P6"):
        from PIL import Image as PImage

        arr = np.asarray(PImage.open(path)).astype(np.int32)
        return Image.from_array(arr)
    # parse header tokens (skip comments)
    tokens = []
    pos = 2
    while len(tokens) < 3:
        m = re.match(rb"\s*(#[^\n]*\n|\s)*(\d+)", data[pos:])
        if not m:
            raise ValueError("bad PNM header")
        tokens.append(int(m.group(2)))
        pos += m.end()
    w, h, maxval = tokens
    pos += 1  # single whitespace after maxval
    nc = 3 if data[:2] == b"P6" else 1
    prec = maxval.bit_length()
    dt = ">u2" if maxval > 255 else "u1"
    arr = np.frombuffer(data, dtype=dt, count=h * w * nc, offset=pos)
    arr = arr.reshape(h, w, nc).astype(np.int32)
    return Image.from_array(arr, prec=prec)


def write_pnm(path: str, image: Image) -> None:
    arr = image.to_array()
    h, w, nc = arr.shape
    prec = image.components[0].prec
    maxval = (1 << prec) - 1
    magic = b"P6" if nc == 3 else b"P5"
    if nc not in (1, 3):
        raise ValueError("PNM supports 1 or 3 components; use split output")
    with open(path, "wb") as f:
        f.write(magic + b"\n%d %d\n%d\n" % (w, h, maxval))
        dt = ">u2" if maxval > 255 else "u1"
        f.write(np.ascontiguousarray(arr.squeeze(-1) if nc == 1 else arr, dtype=dt).tobytes())


# ------------------------------------------------------------------- RAW
def read_raw(path: str, w: int, h: int, nc: int, prec: int, signed: bool,
             big_endian: bool = True) -> Image:
    """Raw sample dump, PLANAR component order (one full w x h plane per
    component, the reference RAWFormat.cpp convention; .raw = big endian,
    .rawl = little)."""
    nb = 1 if prec <= 8 else (2 if prec <= 16 else 4)
    kind = ("i" if signed else "u") + str(nb)
    dt = np.dtype((">" if big_endian else "<") + kind)
    arr = np.fromfile(path, dtype=dt, count=h * w * nc).reshape(nc, h, w)
    arr = np.moveaxis(arr, 0, -1)
    return Image.from_array(arr.astype(np.int32), prec=prec, signed=signed)


def write_raw(path: str, image: Image, big_endian: bool = True) -> None:
    """Planar component order (reference RAWFormat.cpp convention)."""
    prec = image.components[0].prec
    signed = image.components[0].signed
    nb = 1 if prec <= 8 else (2 if prec <= 16 else 4)
    kind = ("i" if signed else "u") + str(nb)
    dt = np.dtype((">" if big_endian else "<") + kind)
    with open(path, "wb") as f:
        for c in image.components:
            f.write(c.data.astype(dt).tobytes())


# -------------------------------------------------------------- dispatch
def load_image(path: str, **raw_kw) -> Image:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pgx":
        return read_pgx(path)
    if ext in (".pgm", ".ppm", ".pnm", ".pam"):
        return read_pnm(path)
    if ext in (".raw", ".rawl"):
        return read_raw(path, big_endian=(ext == ".raw"), **raw_kw)
    if ext in (".tif", ".tiff"):
        # native strip codec first (8/16-bit, chunky+planar, either
        # endianness — the Cinema/IMF workflow envelope PIL does not
        # guarantee); compressed/packed/tiled variants fall back to PIL
        from . import tiff as _tiff

        try:
            arr, info = _tiff.read(path)
            img = Image.from_array(
                arr.astype(np.int32), prec=info.bps)
            if info.signed:
                for c in img.components:
                    c.signed = True
            if info.icc:
                img.icc_profile = info.icc
            return img
        except _tiff.TiffUnsupported:
            pass
    from PIL import Image as PImage

    pil = PImage.open(path)
    if pil.mode == "P":
        # keep_palette: carry the palette through as a 1-component index
        # image + pclr/cmap metadata instead of expanding to RGB (the
        # reference keeps TIFF palettes this way, TIFFFormat.cpp:1201-1211)
        if raw_kw.get("keep_palette") and "transparency" not in pil.info:
            idx = np.asarray(pil).astype(np.int32)
            pal = pil.getpalette()
            table = np.asarray(pal, dtype=np.int32).reshape(-1, 3)
            table = table[: int(idx.max()) + 1] if len(table) else table
            # minimal index precision: smaller codestream, and the
            # reference decoder rejects prec > num_entries
            prec = max(1, int(len(table) - 1).bit_length())
            img = Image.from_array(idx, prec=prec)
            img.palette = (table, [8, 8, 8], [(0, 1, 0), (0, 1, 1), (0, 1, 2)])
            from ..core.params import ColorSpace

            img.color_space = ColorSpace.SRGB
            return img
        pil = pil.convert("RGB")
    arr = np.asarray(pil)
    if arr.ndim == 3 and arr.shape[2] == 4:
        pass  # keep alpha as 4th component
    prec = 16 if arr.dtype == np.uint16 else 8
    img = Image.from_array(arr.astype(np.int32), prec=prec)
    icc = pil.info.get("icc_profile")
    if icc:
        img.icc_profile = icc
    exif = pil.info.get("exif")
    if not exif:
        try:
            ex = pil.getexif()
            exif = ex.tobytes() if len(ex) else None
        except Exception:
            exif = None
    if exif:
        img.exif = bytes(exif)
    return img


def save_image(path: str, image: Image, **save_kw) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pgx":
        base = os.path.splitext(path)[0]
        if image.num_comps == 1:
            write_pgx(path, image, 0)
        else:
            for i in range(image.num_comps):
                write_pgx(f"{base}_{i}.pgx", image, i)
        return
    if ext in (".pgm", ".ppm", ".pnm"):
        write_pnm(path, image)
        return
    if ext in (".raw", ".rawl"):
        write_raw(path, image, big_endian=(ext == ".raw"))
        return
    arr = image.to_array()
    prec = image.components[0].prec
    if ext in (".tif", ".tiff"):
        # native strip writer: the only path that covers 16-bit
        # multi-component (and planar) output
        from . import tiff as _tiff

        _tiff.write(path, arr, bps=16 if prec > 8 else 8,
                    icc=getattr(image, "icc_profile", None),
                    signed=bool(image.components[0].signed), **save_kw)
        return
    from PIL import Image as PImage

    if prec <= 8:
        arr8 = arr.astype(np.uint8)
        pil = PImage.fromarray(arr8.squeeze(-1) if arr8.shape[2] == 1 else arr8)
    else:
        if arr.shape[2] != 1:
            raise ValueError(f"16-bit multi-component {ext} output unsupported; use .tif")
        pil = PImage.fromarray(arr[:, :, 0].astype(np.uint16), mode="I;16")
    pil.save(path, **save_kw)
