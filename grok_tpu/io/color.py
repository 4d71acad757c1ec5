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


def esycc_to_rgb(image: Image) -> Image:
    """e-sYCC -> sRGB (IEC 61966-2-4 extended-gamut YCC; parity:
    common/color.cpp color_esycc_to_rgb). Chroma carries sign (or a
    2^(prec-1) offset when unsigned); output clamps to the sRGB range."""
    if image.num_comps < 3:
        return image
    if any(c.dx != 1 or c.dy != 1 for c in image.components[:3]):
        image = upsample_components(image)
    prec = image.components[0].prec
    y = image.components[0].data.astype(np.float64)
    def chroma(c):
        a = c.data.astype(np.float64)
        return a if c.signed else a - (1 << (c.prec - 1))
    cb = chroma(image.components[1])
    cr = chroma(image.components[2])
    r = y - 0.0000368 * cb + 1.40199 * cr
    g = y - 0.344125 * cb - 0.714128 * cr
    b = y + 1.77204 * cb - 0.0000220 * cr
    hi = (1 << prec) - 1
    out = Image(image.x0, image.y0, image.x1, image.y1,
                color_space=ColorSpace.SRGB, icc_profile=image.icc_profile)
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
    if cs == ColorSpace.EYCC:
        return esycc_to_rgb(image)
    if cs == ColorSpace.CMYK:
        return cmyk_to_rgb(image)
    if cs == ColorSpace.CIELAB:
        return cielab_to_rgb(image)
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


# ------------------------------------------------------------------ CIELab
def cielab_to_rgb(image, lab_params=None):
    """Decode-side CIELab -> sRGB conversion (T.801 M.2; behavior parity
    with the reference's color_cielab_to_rgb, computed colorimetrically
    instead of through lcms).

    lab_params: optional (RL, OL, RA, OA, RB, OB, illuminant) from an
    extended colr box; defaults use the standard Lab encoding ranges."""
    import numpy as np

    comps = image.components
    if len(comps) < 3:
        return image
    pL, pa, pb = (comps[i].prec for i in range(3))
    if lab_params is None:
        r_L, o_L = 100.0, 0.0
        r_a, o_a = 170.0, float(1 << (pa - 1))
        r_b, o_b = 200.0, 0.75 * float(1 << (pb - 1))
    else:
        r_L, o_L, r_a, o_a, r_b, o_b = (float(v) for v in lab_params[:6])

    def scale(code, prec, r, o):
        mn = -(r * o) / ((1 << prec) - 1)
        mx = mn + r
        return mn + code.astype(np.float64) * (mx - mn) / ((1 << prec) - 1)

    L = scale(comps[0].data, pL, r_L, o_L)
    a = scale(comps[1].data, pa, r_a, o_a)
    b = scale(comps[2].data, pb, r_b, o_b)

    # Lab -> XYZ (D50 white, CIE standard)
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        d = 6.0 / 29.0
        return np.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))

    Xn, Yn, Zn = 0.9642, 1.0, 0.8249  # D50
    X = Xn * finv(fx)
    Y = Yn * finv(fy)
    Z = Zn * finv(fz)

    # Bradford D50 -> D65, then linear sRGB
    m = np.array(
        [[3.1338561, -1.6168667, -0.4906146],
         [-0.9787684, 1.9161415, 0.0334540],
         [0.0719453, -0.2289914, 1.4052427]]
    )
    rl = m[0, 0] * X + m[0, 1] * Y + m[0, 2] * Z
    gl = m[1, 0] * X + m[1, 1] * Y + m[1, 2] * Z
    bl = m[2, 0] * X + m[2, 1] * Y + m[2, 2] * Z

    def gamma(u):
        u = np.clip(u, 0.0, 1.0)
        return np.where(u <= 0.0031308, 12.92 * u, 1.055 * u ** (1 / 2.4) - 0.055)

    prec = pL
    mx = (1 << prec) - 1
    out_planes = [
        np.clip(np.round(gamma(v) * mx), 0, mx).astype(np.int32)
        for v in (rl, gl, bl)
    ]
    from ..core.image import Component, Image as _Image
    from ..core.params import ColorSpace

    out = _Image(image.x0, image.y0, image.x1, image.y1,
                 color_space=ColorSpace.SRGB)
    for pdat in out_planes:
        out.components.append(
            Component(dx=comps[0].dx, dy=comps[0].dy, prec=prec,
                      signed=False, data=pdat)
        )
    out.finalize()
    return out


def apply_icc_transform(image, icc_profile: bytes):
    """Apply an embedded ICC profile -> sRGB via lcms (PIL.ImageCms)."""
    import io as _io

    import numpy as np
    from PIL import Image as PILImage, ImageCms

    comps = image.components
    if len(comps) < 3 or any(c.prec > 8 for c in comps[:3]):
        return image  # 8-bit RGB path only (parity with the CLI behavior)
    arr = np.stack([c.data for c in comps[:3]], axis=-1).astype(np.uint8)
    pil = PILImage.fromarray(arr, "RGB")
    try:
        src = ImageCms.ImageCmsProfile(_io.BytesIO(icc_profile))
        dst = ImageCms.createProfile("sRGB")
        pil = ImageCms.profileToProfile(pil, src, dst)
    except Exception:
        return image
    res = np.asarray(pil).astype(np.int32)
    for i in range(3):
        comps[i].data = res[:, :, i]
    return image
