"""Quantization parameter derivation (T.800 Annex E).

Parity target: codestream/Quantizer.{h,cpp} (setBandStepSizeAndBps, SQcd
marshalling) — re-derived from the standard.

Reversible (5/3): exponent-only signalling, eps_b = P + gain_b where P is the
component's bit depth (incl. the +1 RCT expansion for chroma) and gain_b the
subband log2 gain.  Mb = G + eps_b - 1 (eq. E-2).

Irreversible (9/7): default step sizes proportional to 1/L2-gain of the
synthesis basis per band, signalled as 11-bit mantissa + 5-bit exponent with
delta_b = 2^(R_b - eps_b) * (1 + mu_b / 2^11), R_b = P + gain_b.
"""

from __future__ import annotations

import math

from ..core.params import QuantStyle
from .structs import TccpStyle
from ..tile.geometry import BAND_GAIN, BAND_LL, TileCompGeom

# L2 norms of the synthesis basis vectors for the 9/7 filter per
# (orientation, level), used to derive default irreversible step sizes.
# These are the standard Mallat-basis norms (same quantities the reference
# tabulates in point_transform/mct.cpp get_norms_irrev and OpenJPEG's
# dwt_norms_real); computed analytically once here.
_DWT97_NORMS: dict[int, list[float]] | None = None
_DWT53_NORMS: dict[int, list[float]] | None = None


def _compute_dwt_norms(irreversible: bool, max_levels: int = 33) -> dict[int, list[float]]:
    """Numerically compute per-band synthesis L2 norms for levels 1..max.

    Uses the separable structure: norm(LL,l) = nL(l)^2, norm(HL,l) =
    nL(l)*nH(l), etc., where nL/nH are 1-D synthesis norms obtained by
    upsampling-and-filtering an impulse l times.
    """
    import numpy as np

    if irreversible:
        # 9/7 synthesis filters (analysis lowpass h0, highpass h1 reversed)
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

    n_l = []
    n_h = []
    cur_lo = np.array([1.0])
    for _ in range(max_levels):
        # synthesis of one coefficient at this level: upsample previous
        # lowpass chain and convolve
        wave_l = np.convolve(_upsample(cur_lo), lo)
        wave_h = np.convolve(_upsample(cur_lo), hi)
        n_l.append(float(np.sqrt(np.sum(wave_l * wave_l))))
        n_h.append(float(np.sqrt(np.sum(wave_h * wave_h))))
        cur_lo = wave_l
    # norms[orient][level-1]
    from ..tile.geometry import BAND_HL, BAND_LH, BAND_HH

    return {
        BAND_LL: [n_l[i] * n_l[i] for i in range(max_levels)],
        BAND_HL: [n_l[i] * n_h[i] for i in range(max_levels)],
        BAND_LH: [n_h[i] * n_l[i] for i in range(max_levels)],
        BAND_HH: [n_h[i] * n_h[i] for i in range(max_levels)],
    }


def _upsample(x):
    import numpy as np

    if len(x) == 1 and x[0] == 1.0:
        return x
    y = np.zeros(2 * len(x) - 1)
    y[::2] = x
    return y


def band_norm(irreversible: bool, orient: int, level: int) -> float:
    """Synthesis L2 norm for (orient, level); level >= 1, LL may be level 0."""
    global _DWT97_NORMS, _DWT53_NORMS
    if irreversible:
        if _DWT97_NORMS is None:
            _DWT97_NORMS = _compute_dwt_norms(True)
        norms = _DWT97_NORMS
    else:
        if _DWT53_NORMS is None:
            _DWT53_NORMS = _compute_dwt_norms(False)
        norms = _DWT53_NORMS
    if level == 0:
        return 1.0
    return norms[orient][level - 1]


def _encode_stepsize(stepsize: float, num_bps: int) -> tuple[int, int]:
    """Convert a float step to (exp, mant): delta = 2^(num_bps-exp)*(1+mant/2048)."""
    if stepsize <= 0:
        return 0, 0
    p = int(math.floor(math.log2(stepsize)))
    frac = stepsize / (2.0 ** p)  # in [1, 2)
    mant = int(math.floor((frac - 1.0) * 2048.0 + 0.5))
    if mant >= 2048:
        mant = 0
        p += 1
    exp = num_bps - p
    exp = max(0, min(31, exp))
    return exp, mant


def setup_band_quant_encode(
    geom: TileCompGeom,
    tccp: TccpStyle,
    prec: int,
    base_step: float = 1.0 / 8192.0,
) -> None:
    """Fill band.step/num_bps/exp/mant and tccp.step_exps/mants for encode.

    ``prec`` must already include any MCT range expansion for this component.
    """
    nl = tccp.num_resolutions - 1
    exps: list[int] = []
    mants: list[int] = []
    for res in geom.resolutions:
        for band in res.bands:
            gain = BAND_GAIN[band.orient]
            level = band.level if band.orient != BAND_LL else nl
            if tccp.quant_style == QuantStyle.NO_QUANT:
                exp = max(0, prec + gain)
                mant = 0
                band.step = 1.0
            else:
                rb = prec + gain
                norm = band_norm(True, band.orient, level if nl > 0 else 0)
                step = base_step * (1 << rb) / norm
                exp, mant = _encode_stepsize(step, rb)
                band.step = (2.0 ** (rb - exp)) * (1.0 + mant / 2048.0)
            band.exp = exp
            band.mant = mant
            band.num_bps = tccp.guard_bits + exp - 1
            exps.append(exp)
            mants.append(mant)
    if tccp.quant_style == QuantStyle.SCALAR_DERIVED:
        exps = exps[:1]
        mants = mants[:1]
    tccp.step_exps = exps
    tccp.step_mants = mants


def setup_band_quant_decode(geom: TileCompGeom, tccp: TccpStyle, prec: int) -> None:
    """Fill band.step/num_bps from the signalled SQcd/SQcc values."""
    nl = tccp.num_resolutions - 1
    for res in geom.resolutions:
        for band in res.bands:
            gain = BAND_GAIN[band.orient]
            if band.orient == BAND_LL:
                bidx = 0
            else:
                bidx = 3 * (res.r - 1) + band.orient
            if tccp.quant_style == QuantStyle.SCALAR_DERIVED:
                # derived: eps_b = eps_0 - NL + n_b (T.800 eq. E-5)
                exp0 = tccp.step_exps[0]
                mant = tccp.step_mants[0]
                nb = band.level if band.orient != BAND_LL else nl
                exp = exp0 - (nl - nb) if band.orient != BAND_LL else exp0
            else:
                i = min(bidx, len(tccp.step_exps) - 1)
                exp = tccp.step_exps[i]
                mant = tccp.step_mants[i]
            band.exp = exp
            band.mant = mant
            band.num_bps = tccp.guard_bits + exp - 1
            if tccp.quant_style == QuantStyle.NO_QUANT:
                band.step = 1.0
            else:
                rb = prec + gain
                band.step = (2.0 ** (rb - exp)) * (1.0 + mant / 2048.0)
