"""Image comparison test utility (reference parity: tests/compare_images.cpp
— per-component PEAK/MSE with region subsetting, the helper the ISO 15444-4
conformance loops drive with Table C.1 tolerances).

Compares two images component by component and checks each component's
peak absolute error and mean squared error against allowed ceilings.
Exit code 0 = within tolerance, 1 = exceeded (or geometry mismatch).

Usage:
    python tools/compare_images.py -b base.pgx -t test.pgx \
        [--peak P0,P1,...] [--mse M0,M1,...] [-d x0,y0,x1,y1] [-q]

- `--peak` / `--mse`: per-component ceilings; a single value applies to all
  components; omitted => exact match required (peak 0).
- `-d x0,y0,x1,y1`: compare only the window (base image coordinates).
- `.j2k/.jp2` inputs are decoded with grok_tpu; raster formats go through
  `grok_tpu.io.formats.load_image` (PGX compares a single plane, like the
  reference's per-plane _0.pgx convention when given an explicit plane file).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from grok_tpu.io.formats import load_image  # noqa: E402


def _load(path: str):
    if path.lower().endswith((".j2k", ".j2c", ".jp2", ".jph")):
        import grok_tpu as gk

        with open(path, "rb") as f:
            return gk.decompress(f.read())
    return load_image(path)


def _planes(img) -> list[np.ndarray]:
    return [np.asarray(c.data, dtype=np.int64) for c in img.components]


def _parse_list(s: str, n: int, name: str) -> list[float]:
    vals = [float(v) for v in s.split(",")]
    if len(vals) == 1:
        vals = vals * n
    if len(vals) != n:
        raise SystemExit(f"{name}: expected 1 or {n} values, got {len(vals)}")
    return vals


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-b", "--base", required=True, help="reference image")
    ap.add_argument("-t", "--test", required=True, help="image under test")
    ap.add_argument("--peak", help="per-component max |err| ceilings")
    ap.add_argument("--mse", help="per-component MSE ceilings")
    ap.add_argument("-d", "--region", help="x0,y0,x1,y1 window to compare")
    ap.add_argument("-q", "--quiet", action="store_true")
    a = ap.parse_args(argv)

    base = _planes(_load(a.base))
    test = _planes(_load(a.test))
    if len(base) != len(test):
        print(f"component count differs: {len(base)} vs {len(test)}")
        return 1

    nc = len(base)
    peaks = _parse_list(a.peak, nc, "--peak") if a.peak else [0.0] * nc
    mses = _parse_list(a.mse, nc, "--mse") if a.mse else [float("inf")] * nc

    region = None
    if a.region:
        x0, y0, x1, y1 = (int(v) for v in a.region.split(","))
        region = (x0, y0, x1, y1)

    ok = True
    for ci, (pb, pt) in enumerate(zip(base, test)):
        if region:
            x0, y0, x1, y1 = region
            pb = pb[y0:y1, x0:x1]
            pt = pt[y0:y1, x0:x1]
        if pb.shape != pt.shape:
            print(f"comp {ci}: shape differs {pb.shape} vs {pt.shape}")
            ok = False
            continue
        err = pt - pb
        peak = float(np.abs(err).max()) if err.size else 0.0
        mse = float(np.mean(err.astype(np.float64) ** 2)) if err.size else 0.0
        bad = peak > peaks[ci] or mse > mses[ci]
        ok &= not bad
        if not a.quiet or bad:
            lim = (f" (limits peak<={peaks[ci]:g}"
                   + (f", mse<={mses[ci]:g})" if np.isfinite(mses[ci]) else ")"))
            print(f"comp {ci}: peak={peak:g} mse={mse:.6g}"
                  f"{lim} {'FAIL' if bad else 'ok'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
