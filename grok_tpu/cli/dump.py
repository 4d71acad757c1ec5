"""grok-tpu-dump — codestream structure dump (parity target:
src/bin/jp2/grk_dump.cpp + grk_dump_codec)."""

from __future__ import annotations

import argparse
import sys

from ..codestream.decompress import Decoder
from ..codestream.jp2 import is_jp2, unwrap_jp2
from ..core.params import QuantStyle


def dump(data: bytes, out=sys.stdout) -> None:
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
    t = tcp.tccps[0]
    print(f"  progression: {tcp.progression.name}  layers: {tcp.num_layers}"
          f"  MCT: {tcp.mct}", file=out)
    print(f"  resolutions: {t.num_resolutions}  codeblock: "
          f"{1 << t.cblk_w_exp}x{1 << t.cblk_h_exp}  style: 0x{t.cblk_style:02X}"
          + ("  (HT)" if t.cblk_style & 0x40 else ""), file=out)
    print(f"  transform: {'9/7 irreversible' if t.irreversible else '5/3 reversible'}",
          file=out)
    print(f"  quant: {QuantStyle(t.quant_style).name} guard_bits={t.guard_bits}", file=out)
    if t.precinct_exps:
        print(f"  precincts: {[(1 << px, 1 << py) for (px, py) in t.precinct_exps]}",
              file=out)
    if dec.header.cap:
        pcap, ccaps = dec.header.cap
        print(f"  CAP: Pcap=0x{pcap:08X} Ccap={['0x%04X' % c for c in ccaps]}", file=out)
    if dec.header.comments:
        for cm in dec.header.comments:
            print(f"  comment: {cm.decode('latin-1')!r}", file=out)
    print(f"  TLM index: {'yes' if dec.header.has_tlm else 'no'}", file=out)
    for ti in sorted(dec.index.spans):
        spans = dec.index.spans[ti]
        total = sum(s.body_end - s.sot_offset for s in spans)
        print(f"  tile {ti}: {len(spans)} part(s), {total} bytes", file=out)


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
    args = p.parse_args(argv)
    with open(args.in_file, "rb") as f:
        data = f.read()
    dump(data)
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
