"""grok-tpu-decompress — CLI decoder (parity target: src/bin/jp2/grk_decompress)."""

from __future__ import annotations

import argparse
import sys
import time

from ..core.params import DecompressParams
from ..codestream.decompress import decompress
from ..codestream.jp2 import apply_palette, is_jp2, unwrap_jp2
from ..io.formats import save_image


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="grok-tpu-decompress",
        description="TPU-native JPEG 2000 / HTJ2K decoder",
    )
    p.add_argument("-i", "--in_file", required=True)
    p.add_argument("-o", "--out_file", required=True)
    p.add_argument("-r", "--reduce", type=int, default=0,
                   help="discard this many highest resolution levels")
    p.add_argument("-l", "--layers", type=int, default=0, help="max quality layers")
    p.add_argument("-t", "--tile", type=int, default=None, help="decode a single tile")
    p.add_argument("-d", "--region", help="decode window x0,y0,x1,y1")
    p.add_argument("--force_rgb", action="store_true",
                   help="convert to RGB (sYCC/CMYK/gray)")
    p.add_argument("--upsample", action="store_true",
                   help="replicate subsampled components to full resolution")
    p.add_argument("-H", "--num_threads", type=int, default=0)
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def _cli_guard(argv=None) -> int:
    args = build_parser().parse_args(argv)
    with open(args.in_file, "rb") as f:
        data = f.read()
    jp2_info = None
    if is_jp2(data):
        jp2_info = unwrap_jp2(data)
        data = jp2_info.codestream
    params = DecompressParams(
        reduce=args.reduce,
        max_layers=args.layers,
        tile_index=args.tile,
    )
    if args.region:
        params.window = tuple(int(v) for v in args.region.split(","))
    t0 = time.perf_counter()
    img = decompress(data, params)
    dt = time.perf_counter() - t0
    if jp2_info is not None:
        img.color_space = jp2_info.color_space
        img.icc_profile = jp2_info.icc_profile
        img = apply_palette(img, jp2_info)
    if args.force_rgb or args.upsample:
        from ..io.color import force_rgb, upsample_components

        img = force_rgb(img) if args.force_rgb else upsample_components(img)
    save_image(args.out_file, img)
    if args.verbose:
        mp = sum(c.w * c.h for c in img.components) / 1e6
        print(f"{args.in_file}: decoded {mp:.2f} MP in {dt*1000:.1f} ms ({mp/dt:.2f} MP/s)")
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
