"""Parsed codestream state: SIZ geometry, coding styles, quantization.

Parity targets: codestream/CodingParams.{h,cpp} (TileCodingParams /
TileComponentCodingParams) and the SIZ/COD/QCD marker payloads, re-expressed
as dataclasses.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from ..core.params import ProgressionOrder, ProgressionChange, QuantStyle
from ..core.rect import Rect, ceil_div


@dataclass
class SizComponent:
    dx: int = 1
    dy: int = 1
    prec: int = 8
    signed: bool = False


@dataclass
class Siz:
    """Canvas geometry from the SIZ marker (T.800 A.5.1)."""

    rsiz: int = 0
    x1: int = 0  # Xsiz
    y1: int = 0  # Ysiz
    x0: int = 0  # XOsiz
    y0: int = 0  # YOsiz
    tile_w: int = 0  # XTsiz
    tile_h: int = 0  # YTsiz
    tile_x0: int = 0  # XTOsiz
    tile_y0: int = 0  # YTOsiz
    comps: list[SizComponent] = field(default_factory=list)

    @property
    def num_comps(self) -> int:
        return len(self.comps)

    @property
    def num_tiles_x(self) -> int:
        return ceil_div(self.x1 - self.tile_x0, self.tile_w)

    @property
    def num_tiles_y(self) -> int:
        return ceil_div(self.y1 - self.tile_y0, self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.num_tiles_x * self.num_tiles_y

    def tile_bounds(self, tile_index: int) -> Rect:
        """Tile rect on the reference grid, clipped to the image area
        (T.800 B.3 eq. B-7/B-8)."""
        p = tile_index % self.num_tiles_x
        q = tile_index // self.num_tiles_x
        return Rect(
            max(self.tile_x0 + p * self.tile_w, self.x0),
            max(self.tile_y0 + q * self.tile_h, self.y0),
            min(self.tile_x0 + (p + 1) * self.tile_w, self.x1),
            min(self.tile_y0 + (q + 1) * self.tile_h, self.y1),
        )


@dataclass
class TccpStyle:
    """Per-component coding style (COD SPcod / COC SPcoc)."""

    num_resolutions: int = 6
    cblk_w_exp: int = 6  # log2 codeblock width
    cblk_h_exp: int = 6
    cblk_style: int = 0
    irreversible: bool = False  # transform: 0 = 9/7, 1 = 5/3 in the stream
    precinct_exps: list[tuple[int, int]] | None = None  # per-res (PPx, PPy); None = 15,15
    # quantization (QCD/QCC)
    quant_style: QuantStyle = QuantStyle.NO_QUANT
    guard_bits: int = 2
    step_exps: list[int] = field(default_factory=list)  # per band
    step_mants: list[int] = field(default_factory=list)
    # ROI (RGN)
    roi_shift: int = 0

    def precinct_exp(self, res: int) -> tuple[int, int]:
        if self.precinct_exps is None:
            return (15, 15)
        # If fewer entries than resolutions, reuse the last one (lenient).
        i = min(res, len(self.precinct_exps) - 1)
        return self.precinct_exps[i]

    def copy(self) -> "TccpStyle":
        c = replace(self)
        c.precinct_exps = None if self.precinct_exps is None else list(self.precinct_exps)
        c.step_exps = list(self.step_exps)
        c.step_mants = list(self.step_mants)
        return c


@dataclass
class Tcp:
    """Per-tile coding parameters (COD Scod/SGcod + per-component styles)."""

    csty: int = 0  # CSTY_* flags
    progression: ProgressionOrder = ProgressionOrder.LRCP
    num_layers: int = 1
    mct: int = 0  # 0: none, 1: standard RCT/ICT, 2: custom matrix
    tccps: list[TccpStyle] = field(default_factory=list)
    pocs: list[ProgressionChange] = field(default_factory=list)
    mct_dec_matrix: object | None = None  # Part-2 decoding matrix [N,N]
    mct_offsets: object | None = None  # Part-2 per-component offsets
    # custom MCT (Part 2) data, if any
    mct_matrix: list[float] | None = None

    def copy(self) -> "Tcp":
        c = replace(self)
        c.tccps = [t.copy() for t in self.tccps]
        c.pocs = list(self.pocs)
        c.mct_dec_matrix = self.mct_dec_matrix
        c.mct_offsets = self.mct_offsets
        return c


@dataclass
class HeaderInfo:
    """Everything parsed from the main header (parity: grk_header_info)."""

    siz: Siz = field(default_factory=Siz)
    default_tcp: Tcp = field(default_factory=Tcp)
    comments: list[bytes] = field(default_factory=list)
    cap: tuple[int, list[int]] | None = None  # (Pcap, [Ccap...])
    # TLM: tile-part lengths keyed in write order
    tlm: list[tuple[int, int]] | None = None  # (tile_index, length)
    ppm: bytes | None = None
    ppm_segments: list[tuple[int, bytes]] = field(default_factory=list)
    has_tlm: bool = False
