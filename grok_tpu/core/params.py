"""Coding-parameter dataclasses.

Capability parity with the reference's public parameter structs
(``grk_cparameters`` grok.h:466-590, ``grk_dparameters`` grok.h:716-757,
``grk_decompress_params`` grok.h:782-830) re-expressed as idiomatic Python
dataclasses. Field names follow the JPEG 2000 standard's vocabulary rather
than the C struct's.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from .errors import ParameterError


class ProgressionOrder(enum.IntEnum):
    """The 5 standard progression orders (T.800 A.6.1)."""

    LRCP = 0
    RLCP = 1
    RPCL = 2
    PCRL = 3
    CPRL = 4


class ColorSpace(enum.IntEnum):
    UNKNOWN = 0
    SRGB = 1
    GRAY = 2
    SYCC = 3
    EYCC = 4
    CMYK = 5
    CIELAB = 6


# Codeblock style flags (SPcod byte, T.800 Table A-19).
CBLK_BYPASS = 0x01  # selective arithmetic coding bypass (lazy)
CBLK_RESET = 0x02  # reset context probabilities on pass boundaries
CBLK_TERMALL = 0x04  # terminate on every pass
CBLK_VSC = 0x08  # vertically stripe-causal context formation
CBLK_PTERM = 0x10  # predictable termination
CBLK_SEGSYM = 0x20  # segmentation symbols in cleanup passes
# T.814 (HTJ2K) extension flags, signalled via CAP marker in real streams:
CBLK_HT = 0x40  # HT block coder (FBCOT)
CBLK_HT_MIXED = 0x80  # mixed HT / Part-1 codeblocks

# Coding style (Scod) flags, T.800 Table A-13.
CSTY_PRECINCTS = 0x01  # user-defined precinct sizes
CSTY_SOP = 0x02  # SOP marker segments
CSTY_EPH = 0x04  # EPH markers

# rsiz / profile values (T.800 A.5.2 + Part-2 amendments).
PROFILE_NONE = 0x0000
PROFILE_0 = 0x0001
PROFILE_1 = 0x0002
PROFILE_CINEMA_2K = 0x0003
PROFILE_CINEMA_4K = 0x0004
PROFILE_CINEMA_S2K = 0x0005
PROFILE_CINEMA_S4K = 0x0006
PROFILE_CINEMA_LTS = 0x0007
PROFILE_BC_SINGLE = 0x0100
PROFILE_BC_MULTI = 0x0200
PROFILE_BC_MULTI_R = 0x0300
PROFILE_IMF_2K = 0x0400
PROFILE_IMF_4K = 0x0500
PROFILE_IMF_8K = 0x0600
PROFILE_IMF_2K_R = 0x0700
PROFILE_IMF_4K_R = 0x0800
PROFILE_IMF_8K_R = 0x0900
# Part-15 (HTJ2K) capability bit in Rsiz:
RSIZ_CAP = 0x4000  # extended capabilities -> see CAP marker

# DCI rate caps (bytes/frame) mandated by the Cinema profiles
# (reference: src/lib/jp2/grok.h:289-292).
CINEMA_24_CS = 1_302_083
CINEMA_48_CS = 651_041
CINEMA_24_COMP = 1_041_666
CINEMA_48_COMP = 520_833


class QuantStyle(enum.IntEnum):
    """Sqcd style (T.800 Table A-28)."""

    NO_QUANT = 0  # reversible, exponents only
    SCALAR_DERIVED = 1  # one step size, derived per band
    SCALAR_EXPOUNDED = 2  # explicit step size per band


@dataclass
class ProgressionChange:
    """One POC progression bound (T.800 A.6.6)."""

    res_start: int
    comp_start: int
    layer_end: int
    res_end: int
    comp_end: int
    order: ProgressionOrder


@dataclass
class CompressParams:
    """Encoder configuration (parity target: grk_cparameters)."""

    # --- canvas / tiling ---
    tile_size: tuple[int, int] | None = None  # (w, h); None = single tile
    tile_offset: tuple[int, int] = (0, 0)
    image_offset: tuple[int, int] = (0, 0)

    # --- transform ---
    num_resolutions: int = 6  # = decomposition levels + 1
    irreversible: bool = False  # False: 5/3 + RCT, True: 9/7 + ICT
    mct: int | None = None  # None: auto (on iff 3+ comps), 0: off, 1: on
    custom_mct: object | None = None  # optional (matrix, offsets) for Part-2 MCT

    # --- codeblocks / precincts ---
    cblk_width: int = 64  # power of two, 4..1024, w*h <= 4096
    cblk_height: int = 64
    cblk_style: int = 0  # CBLK_* flags
    # HTJ2K: encode 3-pass HT sets (cleanup @ plane 1 + SigProp/MagRef)
    ht_refine: bool = False
    # split each tile into tile-parts at component ('C'), resolution ('R')
    # or layer ('L') boundaries (reference newTilePartProgressionDivider)
    tp_divider: str | None = None
    write_plm: bool = False  # packet-length index in the main header
    # Part-2 array-based MCT: [N,N] ENCODING matrix (decoded side applies
    # its inverse, signalled via MCT/MCC/MCO markers); forces irreversible
    mct_matrix: object | None = None
    precinct_sizes: list[tuple[int, int]] | None = None  # per-res (PPx, PPy) widths

    # --- layers / rate control ---
    num_layers: int = 1
    layer_rates: list[float] | None = None  # compression ratios, e.g. [20, 10, 5]
    layer_psnrs: list[float] | None = None  # fixed-quality targets (dB)

    # --- progression ---
    progression: ProgressionOrder = ProgressionOrder.LRCP
    progression_changes: list[ProgressionChange] = field(default_factory=list)

    # --- quantization ---
    quant_style: QuantStyle | None = None  # None = auto from irreversible
    base_step: float = 1.0 / 8192.0  # irreversible base quant step when explicit
    guard_bits: int = 2
    roi_comp: int = -1
    roi_shift: int = 0

    # --- markers / stream features ---
    use_sop: bool = False
    use_eph: bool = False
    write_tlm: bool = False
    write_plt: bool = False
    write_ppt: bool = False  # packed packet headers in tile-part headers
    write_ppm: bool = False  # packed packet headers in the MAIN header (PPM)
    comment: str | None = "grok_tpu"
    profile: int = PROFILE_NONE
    framerate: int = 0  # for cinema caps

    # --- HTJ2K ---
    ht: bool = False  # use the HT (FBCOT) block coder

    # --- misc ---
    num_threads: int = 0  # 0 = auto; host-side pool for T2/IO
    # PCRD threshold search: 0 = bisection with exact T2 simulation over all
    # code passes (reference pcrdBisectSimple); 1 = feasible truncation
    # points on the convex hull only (pcrdBisectFeasible) — cheaper, within
    # ~0.1 dB
    rc_algorithm: int = 0

    def resolved_mct(self, num_comps: int, equal_sampling: bool = True) -> bool:
        if not equal_sampling:
            return False  # MCT requires identically-sampled first 3 comps
        if self.mct is None:
            return num_comps >= 3
        return bool(self.mct)

    def validate(self) -> None:
        if not (1 <= self.num_resolutions <= 33):
            raise ParameterError(f"num_resolutions {self.num_resolutions} out of [1,33]")
        for d, name in ((self.cblk_width, "cblk_width"), (self.cblk_height, "cblk_height")):
            if d < 4 or d > 1024 or d & (d - 1):
                raise ParameterError(f"{name}={d} must be a power of two in [4,1024]")
        if self.cblk_width * self.cblk_height > 4096:
            raise ParameterError("codeblock area must be <= 4096")
        if self.num_layers < 1 or self.num_layers > 65535:
            raise ParameterError("num_layers out of range")
        if self.layer_rates is not None and len(self.layer_rates) != self.num_layers:
            raise ParameterError("layer_rates length != num_layers")
        if self.layer_psnrs is not None and len(self.layer_psnrs) != self.num_layers:
            raise ParameterError("layer_psnrs length != num_layers")
        if self.precinct_sizes is not None:
            for (px, py) in self.precinct_sizes:
                if px < 1 or py < 1 or (1 << px) < 1 or px > 15 or py > 15:
                    raise ParameterError("precinct exponents must be in [1,15]")


@dataclass
class DecompressParams:
    """Decoder configuration (parity target: grk_dparameters /
    grk_decompress_params)."""

    reduce: int = 0  # discard this many highest resolution levels
    max_layers: int = 0  # 0 = all quality layers
    window: tuple[int, int, int, int] | None = None  # (x0, y0, x1, y1) canvas coords
    tile_index: int | None = None  # decode a single tile
    force_rgb: bool = False
    upsample: bool = False
    io_buffer_mb: int = 64
    tile_cache_all: bool = False  # cache decoded tiles for re-reads
    num_threads: int = 0  # 0 = auto; host tile-parallel decode pool
    # refuse decodes whose output exceeds this many samples (summed over
    # components, after reduce) — a decompression-bomb guard for untrusted
    # inputs; None = unlimited (default: trust the stream)
    max_pixels: int | None = None
