"""Quantization parameter derivation (T.800 Annex E).

Parity target: codestream/Quantizer.{h,cpp} (setBandStepSizeAndBps, SQcd
marshalling) — re-derived from the standard.

Reversible (5/3): exponent-only signalling, eps_b = P + gain_b where P is the
component's bit depth (incl. the +1 RCT expansion for chroma) and gain_b the
subband log2 gain.  Mb = G + eps_b - 1 (eq. E-2).

Irreversible (9/7): default step sizes Delta_b = 2^gain_b / norm_b where
norm_b is the synthesis-basis L2 norm (the classic near-lossless default),
signalled as 11-bit mantissa + 5-bit exponent with
Delta_b = 2^(R_b - eps_b) * (1 + mu_b / 2^11), R_b = P + gain_b.
"""

from __future__ import annotations

import math

from ..core.params import QuantStyle
from .structs import TccpStyle
from ..tile.geometry import BAND_GAIN, BAND_HH, BAND_HL, BAND_LH, BAND_LL, TileCompGeom

# Synthesis-basis L2 norms per (orient, level), computed once numerically.
_DWT97_NORMS: dict[int, list[float]] | None = None
_DWT53_NORMS: dict[int, list[float]] | None = None


def _compute_dwt_norms(irreversible: bool, max_levels: int = 33) -> dict[int, list[float]]:
    """Per-band synthesis L2 norms for levels 1..max, via the separable
    structure: norm(HL, l) = nL(l) * nH(l) etc., where nL/nH come from
    upsample-and-filter chains of the synthesis filters."""
    import numpy as np

    if irreversible:
        # 9/7 synthesis lowpass / highpass impulse responses
        lo = np.array([
            -0.091271763114250, -0.057543526228500, 0.591271763114250,
            1.115087052457000, 0.591271763114250, -0.057543526228500,
            -0.091271763114250,
        ])
        hi = np.array([
            0.026748757410810, 0.016864118442875, -0.078223266528990,
            -0.266864118442875, 0.602949018236360, -0.266864118442875,
            -0.078223266528990, 0.016864118442875, 0.026748757410810,
        ])
    else:
        lo = np.array([0.5, 1.0, 0.5])
        hi = np.array([-0.125, -0.25, 0.75, -0.25, -0.125])

    def upsample(x):
        y = np.zeros(2 * len(x) - 1)
        y[::2] = x
        return y

    n_l, n_h = [], []
    cur = np.array([1.0])
    exact = min(max_levels, 12)  # filter length doubles per level; beyond
    for _ in range(exact):       # this the norms grow by exactly ~2x/level
        wave_l = np.convolve(upsample(cur) if len(cur) > 1 else cur, lo)
        wave_h = np.convolve(upsample(cur) if len(cur) > 1 else cur, hi)
        n_l.append(float(np.sqrt((wave_l ** 2).sum())))
        n_h.append(float(np.sqrt((wave_h ** 2).sum())))
        cur = wave_l
    for _ in range(exact, max_levels):
        n_l.append(n_l[-1] * (n_l[-1] / n_l[-2]))
        n_h.append(n_h[-1] * (n_l[-2] / n_l[-3]))

    return {
        BAND_LL: [a * a for a in n_l],
        BAND_HL: [a * b for a, b in zip(n_l, n_h)],
        BAND_LH: [b * a for a, b in zip(n_l, n_h)],
        BAND_HH: [b * b for b in n_h],
    }


def band_norm(irreversible: bool, orient: int, level: int) -> float:
    global _DWT97_NORMS, _DWT53_NORMS
    if irreversible:
        if _DWT97_NORMS is None:
            _DWT97_NORMS = _compute_dwt_norms(True)
        norms = _DWT97_NORMS
    else:
        if _DWT53_NORMS is None:
            _DWT53_NORMS = _compute_dwt_norms(False)
        norms = _DWT53_NORMS
    if level <= 0:
        return 1.0
    return norms[orient][min(level, len(norms[orient])) - 1]


def _encode_stepsize(stepsize: float, num_bps: int) -> tuple[int, int]:
    """(exp, mant) with delta = 2^(num_bps - exp) * (1 + mant/2048)."""
    if stepsize <= 0:
        return 0, 0
    p = int(math.floor(math.log2(stepsize)))
    frac = stepsize / (2.0 ** p)
    mant = int(math.floor((frac - 1.0) * 2048.0 + 0.5))
    if mant >= 2048:
        mant = 0
        p += 1
    exp = max(0, min(31, num_bps - p))
    return exp, mant


def _band_order(num_resolutions: int):
    """(orient, level, res) in SQcd band order: LL then HL,LH,HH per res."""
    nl = num_resolutions - 1
    out = [(BAND_LL, nl, 0)]
    for r in range(1, num_resolutions):
        lvl = nl - r + 1
        out += [(BAND_HL, lvl, r), (BAND_LH, lvl, r), (BAND_HH, lvl, r)]
    return out


def compute_signalled_quant(tccp: TccpStyle, prec: int, step_scale: float = 1.0) -> None:
    """Fill tccp.step_exps/step_mants for encoding (geometry-free).

    ``prec`` must include any MCT range expansion for this component.
    ``step_scale`` multiplies the default irreversible step (coarser > 1)."""
    exps: list[int] = []
    mants: list[int] = []
    for orient, level, _r in _band_order(tccp.num_resolutions):
        gain = BAND_GAIN[orient]
        if tccp.quant_style == QuantStyle.NO_QUANT:
            exps.append(max(0, prec + gain))
            mants.append(0)
        else:
            norm = band_norm(True, orient, level)
            step = step_scale * (1 << gain) / norm
            e, m = _encode_stepsize(step, prec + gain)
            exps.append(e)
            mants.append(m)
    if tccp.quant_style == QuantStyle.SCALAR_DERIVED:
        exps, mants = exps[:1], mants[:1]
    tccp.step_exps = exps
    tccp.step_mants = mants


def apply_band_quant(geom: TileCompGeom, tccp: TccpStyle, prec: int) -> None:
    """Fill band.step/num_bps/exp/mant from the signalled SQcd values.

    Used identically by encoder and decoder so Mb and steps always agree
    with the codestream."""
    nl = tccp.num_resolutions - 1
    for res in geom.resolutions:
        for band in res.bands:
            gain = BAND_GAIN[band.orient]
            bidx = 0 if band.orient == BAND_LL else 3 * (res.r - 1) + band.orient
            if tccp.quant_style == QuantStyle.SCALAR_DERIVED:
                exp0 = tccp.step_exps[0]
                mant = tccp.step_mants[0]
                nb = band.level
                exp = exp0 - (nl - nb) if band.orient != BAND_LL else exp0
            else:
                i = min(bidx, len(tccp.step_exps) - 1)
                exp = tccp.step_exps[i]
                mant = tccp.step_mants[i]
            band.exp = exp
            band.mant = mant
            # Mb includes the ROI upshift (T.800 E.1: Mb = G + eps - 1 + s)
            band.num_bps = tccp.guard_bits + exp - 1 + tccp.roi_shift
            if tccp.quant_style == QuantStyle.NO_QUANT:
                band.step = 1.0
            else:
                band.step = (2.0 ** ((prec + gain) - exp)) * (1.0 + mant / 2048.0)
