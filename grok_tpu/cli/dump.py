"""grok-tpu-dump — codestream structure dump (parity target:
src/bin/jp2/grk_dump.cpp + grk_dump_codec)."""

from __future__ import annotations

import argparse
import sys

from ..codestream.decompress import Decoder
from ..codestream.jp2 import is_jp2, unwrap_jp2
from ..core.params import QuantStyle


def _dump_tccp(t, label: str, out) -> None:
    """Per-component coding params — the same facts grk_dump's
    'comp N { ... }' block reports (grk_dump.cpp / grk_dump_codec)."""
    csty = 1 if t.precinct_exps is not None else 0
    nb = 3 * (t.num_resolutions - 1) + 1
    exps = list(t.step_exps) or [0] * nb
    mants = list(t.step_mants) or [0] * len(exps)
    steps = " ".join(f"({m},{e})" for m, e in zip(mants, exps))
    prcs = " ".join(
        "({},{})".format(*t.precinct_exp(r)) for r in range(t.num_resolutions))
    print(f"    {label} csty={csty} numresolutions={t.num_resolutions} "
          f"cblkw=2^{t.cblk_w_exp} cblkh=2^{t.cblk_h_exp} "
          f"cblksty=0x{t.cblk_style:02X} qmfbid={0 if t.irreversible else 1}",
          file=out)
    print(f"      precincts (w,h)={prcs}", file=out)
    print(f"      qntsty={int(t.quant_style)} ({QuantStyle(t.quant_style).name})"
          f" numgbits={t.guard_bits}", file=out)
    print(f"      stepsizes (m,e)={steps}", file=out)
    print(f"      roishift={t.roi_shift}", file=out)
    print("    }", file=out)


def _dump_tcp(tcp, out, indent="  ") -> None:
    print(f"{indent}csty=0x{getattr(tcp, 'csty', 0):02X} "
          f"prg={int(tcp.progression)} ({tcp.progression.name}) "
          f"numlayers={tcp.num_layers} mct={tcp.mct}", file=out)
    for ci, t in enumerate(tcp.tccps):
        _dump_tccp(t, f"comp {ci} {{", out)
    for poc in getattr(tcp, "pocs", []):
        print(f"{indent}poc: {poc}", file=out)


def dump(data: bytes, out=sys.stdout, tiles: bool = False) -> None:
    if is_jp2(data):
        info = unwrap_jp2(data)
        print("JP2 container:", file=out)
        print(f"  color space: {info.color_space.name}", file=out)
        if info.icc_profile:
            print(f"  ICC profile: {len(info.icc_profile)} bytes", file=out)
        for x in info.xml:
            print(f"  XML box: {len(x)} bytes", file=out)
        data = info.codestream
    dec = Decoder(data)
    siz = dec.header.siz
    tcp = dec.header.default_tcp
    print("Codestream:", file=out)
    print(f"  Rsiz: 0x{siz.rsiz:04X}" + ("  (HTJ2K)" if siz.rsiz & 0x4000 else ""), file=out)
    print(f"  image: [{siz.x0},{siz.y0}) - [{siz.x1},{siz.y1})", file=out)
    print(f"  tiles: {siz.num_tiles_x} x {siz.num_tiles_y} of {siz.tile_w}x{siz.tile_h}"
          f" @ ({siz.tile_x0},{siz.tile_y0})", file=out)
    print(f"  components: {siz.num_comps}", file=out)
    for i, c in enumerate(siz.comps):
        print(f"    [{i}] prec={c.prec} signed={c.signed} dx={c.dx} dy={c.dy}", file=out)
    print("  default tile {", file=out)
    _dump_tcp(tcp, out, indent="    ")
    print("  }", file=out)
    t = tcp.tccps[0]
    print(f"  transform: {'9/7 irreversible' if t.irreversible else '5/3 reversible'}",
          file=out)
    if dec.header.cap:
        pcap, ccaps = dec.header.cap
        print(f"  CAP: Pcap=0x{pcap:08X} Ccap={['0x%04X' % c for c in ccaps]}", file=out)
    if dec.header.comments:
        for cm in dec.header.comments:
            print(f"  comment: {cm.decode('latin-1')!r}", file=out)
    print(f"  TLM index: {'yes' if dec.header.has_tlm else 'no'}", file=out)
    # marker index of the main header (reference: 'Codestream index from
    # main header' — type/pos/len triplets)
    print("  Marker list: {", file=out)
    for (mtype, pos, ln) in _main_marker_index(data):
        print(f"    type=0x{mtype:04x}, pos={pos}, len={ln}", file=out)
    print("  }", file=out)
    for ti in sorted(dec.index.spans):
        spans = dec.index.spans[ti]
        total = sum(s.body_end - s.sot_offset for s in spans)
        parts = " ".join(
            f"[{pi}] start={s.sot_offset} end={s.body_end}"
            for pi, s in enumerate(spans))
        print(f"  tile {ti}: {len(spans)} part(s), {total} bytes: {parts}",
              file=out)
        if tiles:
            # per-tile coding params (tile headers can override the
            # defaults via COD/COC/QCD/QCC in the tile-part header)
            ttcp = dec._parse_tile_headers(ti)[0]
            print(f"  tile {ti} coding {{", file=out)
            _dump_tcp(ttcp, out, indent="    ")
            print("  }", file=out)


def _main_marker_index(data) -> list[tuple[int, int, int]]:
    """(type, pos, len) for every main-header marker, SOC..first SOT."""
    idx = [(0xFF4F, 0, 2)]
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        m = (data[pos] << 8) | data[pos + 1]
        if m == 0xFF90 or m == 0xFF93 or m == 0xFFD9:
            break
        ln = (data[pos + 2] << 8) | data[pos + 3]
        idx.append((m, pos, ln + 2))
        pos += 2 + ln
    return idx


def dump_markers(data: bytes, out=sys.stdout) -> None:
    """Marker-by-marker listing with offsets/lengths (reference -v
    parity: grk_dump prints the raw marker structure)."""
    if is_jp2(data):
        data = unwrap_jp2(data).codestream
    names = {
        0xFF4F: "SOC", 0xFF51: "SIZ", 0xFF52: "COD", 0xFF53: "COC",
        0xFF5C: "QCD", 0xFF5D: "QCC", 0xFF5E: "RGN", 0xFF5F: "POC",
        0xFF55: "TLM", 0xFF57: "PLM", 0xFF58: "PLT", 0xFF60: "PPM",
        0xFF61: "PPT", 0xFF63: "CRG", 0xFF64: "COM", 0xFF90: "SOT",
        0xFF93: "SOD", 0xFFD9: "EOC", 0xFF91: "SOP", 0xFF92: "EPH",
        0xFF50: "CAP", 0xFF74: "MCT", 0xFF75: "MCC", 0xFF77: "MCO",
    }
    pos = 0
    n = len(data)
    psot_end = None
    while pos + 2 <= n:
        m = (data[pos] << 8) | data[pos + 1]
        nm = names.get(m, f"0x{m:04X}")
        if m in (0xFF4F, 0xFFD9, 0xFF93):
            print(f"  {pos:#010x}  {nm}", file=out)
            pos += 2
            if m == 0xFF93:  # SOD: skip to the end of this tile part
                pos = psot_end if psot_end else n
            if m == 0xFFD9:
                break
            continue
        if pos + 4 > n:
            break
        ln = (data[pos + 2] << 8) | data[pos + 3]
        print(f"  {pos:#010x}  {nm}  L={ln}", file=out)
        if m == 0xFF90 and ln >= 10:  # SOT: record Psot for SOD skip
            isot = (data[pos + 4] << 8) | data[pos + 5]
            psot = int.from_bytes(data[pos + 6 : pos + 10], "big")
            psot_end = pos + (psot if psot else n - pos)
            print(f"              tile={isot} Psot={psot}", file=out)
        pos += 2 + ln


def _cli_guard(argv=None) -> int:
    p = argparse.ArgumentParser(prog="grok-tpu-dump")
    p.add_argument("-i", "--in_file", required=True)
    p.add_argument("-v", "--verbose", action="store_true",
                   help="also list every marker segment with offsets")
    p.add_argument("-t", "--tiles", action="store_true",
                   help="dump per-tile coding params (tile header overrides)")
    args = p.parse_args(argv)
    with open(args.in_file, "rb") as f:
        data = f.read()
    dump(data, tiles=args.tiles)
    if args.verbose:
        print("Markers:")
        dump_markers(data)
    return 0


def main(argv=None) -> int:
    from ..core.errors import GrokTpuError

    try:
        return _cli_guard(argv)
    except GrokTpuError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    except OSError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
