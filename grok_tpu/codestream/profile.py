"""Cinema / IMF / Broadcast profile setup and validation.

Parity target: codestream/Profile.{h,cpp} — DCI Cinema 2K/4K, IMF and
Broadcast constraint forcing + rate caps (grok.h:259-292 constants).
"""

from __future__ import annotations

from ..core import logging as log
from ..core.errors import ParameterError
from ..core.params import (
    PROFILE_BC_MULTI,
    PROFILE_BC_MULTI_R,
    PROFILE_BC_SINGLE,
    CINEMA_24_COMP,
    CINEMA_24_CS,
    CINEMA_48_COMP,
    CINEMA_48_CS,
    CompressParams,
    ProgressionChange,
    ProgressionOrder,
    PROFILE_CINEMA_2K,
    PROFILE_CINEMA_4K,
    PROFILE_IMF_2K,
    PROFILE_IMF_2K_R,
    PROFILE_IMF_4K,
    PROFILE_IMF_4K_R,
    PROFILE_IMF_8K,
    PROFILE_IMF_8K_R,
)

# IMF main-level max sample rates (MSamples/s), grok.h:259-269
IMF_MSAMPLES = [65, 130, 195, 260, 520, 1200, 2400, 4800, 9600, 19200, 26000]
# IMF sub-level max bitrates (Mbit/s), grok.h:275-283
IMF_MBITS = [0, 200, 400, 800, 1600, 3200, 6400, 12800, 25600, 51200]

_CINEMA = (PROFILE_CINEMA_2K, PROFILE_CINEMA_4K)
_IMF = (PROFILE_IMF_2K, PROFILE_IMF_4K, PROFILE_IMF_8K,
        PROFILE_IMF_2K_R, PROFILE_IMF_4K_R, PROFILE_IMF_8K_R)
_BROADCAST = (PROFILE_BC_SINGLE, PROFILE_BC_MULTI, PROFILE_BC_MULTI_R)


def apply_profile(params: CompressParams, image) -> None:
    """Force profile-mandated parameters + rate caps (in place)."""
    if params.profile in _CINEMA:
        _apply_cinema(params, image)
    elif params.profile in _IMF:
        _apply_imf(params, image)
    elif (params.profile & 0x0F00) in _BROADCAST:
        _apply_broadcast(params, image)


def _apply_cinema(params: CompressParams, image) -> None:
    is4k = params.profile == PROFILE_CINEMA_4K
    w = image.x1 - image.x0
    h = image.y1 - image.y0
    if is4k and (w > 4096 or h > 2160):
        raise ParameterError("Cinema 4K image exceeds 4096x2160")
    if not is4k and (w > 2048 or h > 1080):
        raise ParameterError("Cinema 2K image exceeds 2048x1080")
    if image.num_comps != 3:
        raise ParameterError("Cinema profiles require 3 components (XYZ)")

    params.irreversible = True
    params.progression = ProgressionOrder.CPRL
    params.num_resolutions = min(params.num_resolutions, 7 if is4k else 6)
    if is4k:
        params.num_resolutions = max(params.num_resolutions, 2)
    params.cblk_width = params.cblk_height = 32
    params.cblk_style = 0
    # DCI precincts (Profile.cpp set_cinema_parameters): 256 from the highest
    # resolution down to res 1, halving below res_spec => res 0 gets 128.
    # Our precinct_sizes are lowest-res-first exponents.
    params.precinct_sizes = [(7, 7)] + [(8, 8)] * (params.num_resolutions - 1)
    params.use_sop = False
    params.use_eph = True
    params.tile_size = None  # single tile
    params.write_tlm = True
    params.tp_divider = "C"  # one tile-part per component (DCI)
    if is4k:
        # 4K DCI: two POC segments (res 0..NL-1 at 2K extraction, then the
        # top resolution) and 2 guard bits (Profile.cpp initialise_4K_poc).
        nr = params.num_resolutions
        params.progression_changes = [
            ProgressionChange(0, 0, 1, nr - 1, 3, ProgressionOrder.CPRL),
            ProgressionChange(nr - 1, 0, 1, nr, 3, ProgressionOrder.CPRL),
        ]
        params.guard_bits = 2
    else:
        params.progression_changes = []
        params.guard_bits = 1

    fps = params.framerate or 24
    cap = CINEMA_24_CS if fps <= 24 else CINEMA_48_CS
    comp_cap = CINEMA_24_COMP if fps <= 24 else CINEMA_48_COMP
    total_bytes = sum((c.w * c.h * c.prec + 7) // 8 for c in image.components)
    # reserve room for main/tile header markers outside the packet budget
    ratio = max(total_bytes / (cap - 1024), 1.0)
    params.num_layers = 1
    params.layer_rates = [ratio]
    log.info("cinema profile: capped to %d bytes/frame (ratio %.1f)", cap, ratio)
    params._cinema_comp_cap = comp_cap  # advisory (per-component packet cap)


def _imf_max_nl(params: CompressParams, image) -> int:
    """Max decomposition levels per IMF profile (Profile.cpp get_imf_max_NL)."""
    xtsiz = image.x1  # single tile forced; tile width == image extent
    fixed = {PROFILE_IMF_2K: 5, PROFILE_IMF_4K: 6, PROFILE_IMF_8K: 7}
    if params.profile in fixed:
        return fixed[params.profile]
    caps = {PROFILE_IMF_2K_R: 5, PROFILE_IMF_4K_R: 6, PROFILE_IMF_8K_R: 7}
    cap = caps[params.profile]
    for nl in range(cap, 3, -1):
        if xtsiz >= (1 << (nl + 6)):  # 2048 -> NL 5, 1024 -> NL 4, ...
            return nl
    return 4 if xtsiz >= 1024 else -1


def _apply_imf(params: CompressParams, image) -> None:
    reversible = params.profile in (PROFILE_IMF_2K_R, PROFILE_IMF_4K_R, PROFILE_IMF_8K_R)
    params.irreversible = not reversible
    params.cblk_width = params.cblk_height = 32
    params.progression = ProgressionOrder.CPRL
    params.tile_size = None
    params.tp_divider = "C"  # one tile-part per component (IMF)
    limits = {PROFILE_IMF_2K: 2048, PROFILE_IMF_2K_R: 2048,
              PROFILE_IMF_4K: 4096, PROFILE_IMF_4K_R: 4096,
              PROFILE_IMF_8K: 8192, PROFILE_IMF_8K_R: 8192}
    w = image.x1 - image.x0
    if w > limits[params.profile]:
        raise ParameterError(f"IMF image width {w} exceeds profile limit")
    max_nl = _imf_max_nl(params, image)
    if max_nl >= 0:
        params.num_resolutions = min(params.num_resolutions, max_nl + 1)
    # IMF-mandated precincts (Profile.cpp set_imf_parameters): 256 for every
    # resolution above the lowest, 128 for the NLLL band (lowest-res-first).
    if params.num_resolutions == 1:
        params.precinct_sizes = [(7, 7)]
    else:
        params.precinct_sizes = [(7, 7)] + [(8, 8)] * (params.num_resolutions - 1)
    if params.framerate and params.layer_rates is None and not reversible:
        # cap by sub-level 5 (3200 Mbit/s) by default when lossy
        cap_bits = IMF_MBITS[5] * 1_000_000 / params.framerate
        total_bits = sum(c.w * c.h * c.prec for c in image.components)
        params.num_layers = 1
        params.layer_rates = [max(total_bits / cap_bits, 1.0)]


def _apply_broadcast(params: CompressParams, image) -> None:
    """Broadcast contribution profiles (15444-1 AMD3; Profile.cpp
    set_broadcast_parameters): CPRL, one tile-part per component, no ROI,
    irreversible unless MULTI_R, IMF-style precincts."""
    prof = params.profile & 0x0F00
    mainlevel = params.profile & 0x000F
    if mainlevel > 11:
        raise ParameterError("Broadcast mainlevel must be <= 11")
    params.progression = ProgressionOrder.CPRL
    params.tp_divider = "C"
    params.roi_comp = -1
    params.roi_shift = 0
    if prof != PROFILE_BC_MULTI_R:
        params.irreversible = True
    if prof == PROFILE_BC_SINGLE:
        params.tile_size = None
    if params.num_resolutions == 1:
        params.precinct_sizes = [(7, 7)]
    else:
        params.precinct_sizes = [(7, 7)] + [(8, 8)] * (params.num_resolutions - 1)


def validate_cinema_stream(stream: bytes, params: CompressParams) -> bool:
    fps = params.framerate or 24
    cap = CINEMA_24_CS if fps <= 24 else CINEMA_48_CS
    ok = len(stream) <= cap
    if not ok:
        log.warn("cinema frame %d bytes exceeds cap %d", len(stream), cap)
    return ok
