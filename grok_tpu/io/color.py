"""Post-decode color conversions (parity target: src/bin/common/color.cpp —
sYCC/eYCC/CMYK -> RGB, chroma upsampling, ICC application hooks)."""

from __future__ import annotations

import numpy as np

from ..core.image import Component, Image
from ..core.params import ColorSpace


def upsample_components(image: Image) -> Image:
    """Replicate-subsampled components up to full resolution (Grok's
    upsample path for subsampled imagery)."""
    out = Image(image.x0, image.y0, image.x1, image.y1,
                color_space=image.color_space, icc_profile=image.icc_profile)
    for c in image.components:
        if c.dx == 1 and c.dy == 1:
            out.components.append(Component(dx=1, dy=1, prec=c.prec,
                                            signed=c.signed, data=c.data))
            continue
        up = np.repeat(np.repeat(c.data, c.dy, axis=0), c.dx, axis=1)
        h = image.y1 - image.y0
        w = image.x1 - image.x0
        up = up[:h, :w]
        if up.shape != (h, w):  # pad edge if replication fell short
            pad = np.zeros((h, w), dtype=up.dtype)
            pad[: up.shape[0], : up.shape[1]] = up
            pad[up.shape[0]:, :] = pad[up.shape[0] - 1 : up.shape[0], :]
            pad[:, up.shape[1]:] = pad[:, up.shape[1] - 1 : up.shape[1]]
            up = pad
        out.components.append(Component(dx=1, dy=1, prec=c.prec,
                                        signed=c.signed, data=up))
    out.finalize()
    return out


def sycc_to_rgb(image: Image) -> Image:
    """sYCC -> sRGB (T.800 sYCC; chroma replicated first if subsampled)."""
    if image.num_comps < 3:
        return image
    if any(c.dx != 1 or c.dy != 1 for c in image.components[:3]):
        image = upsample_components(image)
    y = image.components[0].data.astype(np.float64)
    prec = image.components[0].prec
    off = 1 << (prec - 1)
    cb = image.components[1].data.astype(np.float64) - off
    cr = image.components[2].data.astype(np.float64) - off
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    hi = (1 << prec) - 1
    out = Image(image.x0, image.y0, image.x1, image.y1, color_space=ColorSpace.SRGB,
                icc_profile=image.icc_profile)
    for chan in (r, g, b):
        out.components.append(
            Component(dx=1, dy=1, prec=prec,
                      data=np.clip(np.round(chan), 0, hi).astype(np.int32))
        )
    for extra in image.components[3:]:
        out.components.append(extra)
    out.finalize()
    return out


def cmyk_to_rgb(image: Image) -> Image:
    if image.num_comps < 4:
        return image
    prec = image.components[0].prec
    hi = float((1 << prec) - 1)
    c, m, y, k = (comp.data.astype(np.float64) / hi for comp in image.components[:4])
    r = hi * (1 - c) * (1 - k)
    g = hi * (1 - m) * (1 - k)
    b = hi * (1 - y) * (1 - k)
    out = Image(image.x0, image.y0, image.x1, image.y1, color_space=ColorSpace.SRGB)
    for chan in (r, g, b):
        out.components.append(
            Component(dx=1, dy=1, prec=prec,
                      data=np.clip(np.round(chan), 0, hi).astype(np.int32))
        )
    out.finalize()
    return out


def force_rgb(image: Image) -> Image:
    """Best-effort conversion to equally-sampled RGB (app convenience)."""
    cs = image.color_space
    if cs == ColorSpace.SYCC or (
        cs == ColorSpace.UNKNOWN
        and image.num_comps == 3
        and any(c.dx > 1 or c.dy > 1 for c in image.components)
    ):
        return sycc_to_rgb(image)
    if cs == ColorSpace.CMYK:
        return cmyk_to_rgb(image)
    if any(c.dx != 1 or c.dy != 1 for c in image.components):
        return upsample_components(image)
    if image.num_comps == 1:
        c0 = image.components[0]
        out = Image(image.x0, image.y0, image.x1, image.y1, color_space=ColorSpace.SRGB)
        for _ in range(3):
            out.components.append(
                Component(dx=c0.dx, dy=c0.dy, prec=c0.prec, data=c0.data)
            )
        out.finalize()
        return out
    return image
