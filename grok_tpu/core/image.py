"""Image container (capability parity with GrkImage, util/GrkImage.h).

Planar per-component storage as numpy arrays on host; device code receives
jnp views per tile. Components may have distinct precision, signedness and
subsampling, as the standard allows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .params import ColorSpace
from .rect import Rect, ceil_div


@dataclass
class Component:
    dx: int = 1  # horizontal subsampling on the reference grid
    dy: int = 1
    prec: int = 8  # 1..16 bits (reference supports 1-16)
    signed: bool = False
    data: np.ndarray | None = None  # int32 [h, w] in component coords

    # component region on the reference grid (set by Image.finalize)
    x0: int = 0
    y0: int = 0
    w: int = 0
    h: int = 0


@dataclass
class Image:
    """An image on the JPEG 2000 reference grid.

    ``(x0, y0, x1, y1)`` is the image area; components sample it at
    (dx, dy) strides.
    """

    x0: int = 0
    y0: int = 0
    x1: int = 0
    y1: int = 0
    components: list[Component] = field(default_factory=list)
    color_space: ColorSpace = ColorSpace.UNKNOWN
    icc_profile: bytes | None = None
    xml: bytes | None = None
    capture_resolution: tuple[float, float] | None = None
    channel_defs: list | None = None  # (channel, type, association)
    uuid_boxes: list | None = None  # [(16-byte uuid, payload)]
    # palettized image: (table int32 [entries, pal_comps], per-column bit
    # depths, cmap entries [(codestream comp, mapping type, pal column)]).
    # When set, the codestream carries index components and JP2 wrapping
    # writes pclr/cmap (reference: FileFormatCompress.cpp write_palette_clr)
    palette: tuple | None = None
    display_resolution: tuple[float, float] | None = None
    exif: bytes | None = None  # raw EXIF payload (JpgTiffExif->JP2 uuid box)

    @property
    def num_comps(self) -> int:
        return len(self.components)

    @property
    def bounds(self) -> Rect:
        return Rect(self.x0, self.y0, self.x1, self.y1)

    def finalize(self) -> None:
        """Compute per-component regions from the image area (T.800 B.2)."""
        for c in self.components:
            c.x0 = ceil_div(self.x0, c.dx)
            c.y0 = ceil_div(self.y0, c.dy)
            c.w = ceil_div(self.x1, c.dx) - c.x0
            c.h = ceil_div(self.y1, c.dy) - c.y0

    def alloc(self) -> None:
        self.finalize()
        for c in self.components:
            if c.data is None:
                c.data = np.zeros((c.h, c.w), dtype=np.int32)

    @staticmethod
    def from_array(
        arr: np.ndarray,
        prec: int | None = None,
        signed: bool = False,
        color_space: ColorSpace | None = None,
    ) -> "Image":
        """Build an Image from an [H, W] or [H, W, C] array at origin 0."""
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, nc = arr.shape
        if prec is None:
            if arr.dtype.itemsize == 1:
                prec = 8
            elif arr.dtype == np.uint16:
                prec = 16
            else:
                # infer the smallest precision covering the data range
                hi = int(arr.max(initial=0))
                lo = int(arr.min(initial=0))
                if signed or lo < 0:
                    signed = True
                    prec = max(hi.bit_length(), (-lo - 1).bit_length() if lo < 0 else 0) + 1
                else:
                    prec = max(hi.bit_length(), 1)
        if color_space is None:
            color_space = ColorSpace.GRAY if nc == 1 else ColorSpace.SRGB
        img = Image(0, 0, w, h, color_space=color_space)
        for i in range(nc):
            img.components.append(
                Component(prec=prec, signed=signed, data=np.ascontiguousarray(arr[:, :, i], dtype=np.int32))
            )
        img.finalize()
        return img

    def to_array(self) -> np.ndarray:
        """Interleave components into [H, W, C] (requires equal sampling)."""
        c0 = self.components[0]
        for c in self.components:
            if (c.w, c.h) != (c0.w, c0.h):
                raise ValueError("to_array requires equally-sampled components")
        out = np.stack([c.data for c in self.components], axis=-1)
        return out

    def clip_to_precision(self) -> None:
        for c in self.components:
            if c.signed:
                lo, hi = -(1 << (c.prec - 1)), (1 << (c.prec - 1)) - 1
            else:
                lo, hi = 0, (1 << c.prec) - 1
            np.clip(c.data, lo, hi, out=c.data)
