"""Image comparison test utility (reference parity: tests/compare_images.cpp
— per-component PEAK/MSE with region subsetting, the helper the ISO 15444-4
conformance loops drive with Table C.1 tolerances).

Compares two images component by component and checks each component's
peak absolute error and mean squared error against allowed ceilings.
Exit code 0 = within tolerance, 1 = exceeded (or geometry mismatch).

Usage:
    python tools/compare_images.py -b base.pgx -t test.pgx \
        [--peak P0,P1,...] [--mse M0,M1,...] [-R x0,y0,x1,y1] [-q]

- `--peak` / `--mse`: per-component ceilings; a single value applies to all
  components; omitted => exact match required (peak 0).
- `-R x0,y0,x1,y1`: region-decode comparison, matching the reference tool's
  semantics: the window subsets the BASE image only, and the test image must
  already be exactly window-sized (the output of a region decode). The flag
  letter matches the reference CLI (`compare_images.cpp` uses -R for the
  region; its -d is the NonRegression exact-match switch, available here too).
- `-d`: NonRegression mode — exact match required regardless of --peak/--mse.
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


def _meta(img) -> list[tuple[int, bool] | None]:
    """(prec, signed) per component when the loader provides them."""
    out = []
    for c in img.components:
        prec = getattr(c, "prec", None)
        sgnd = getattr(c, "signed", None)
        out.append((prec, bool(sgnd)) if prec is not None else None)
    return out


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
    ap.add_argument("-R", "--region",
                    help="x0,y0,x1,y1 base-image window; test must be "
                         "exactly window-sized (region-decode output)")
    ap.add_argument("-d", "--non-regression", action="store_true",
                    help="NonRegression mode: exact match required "
                         "(reference compare_images -d)")
    ap.add_argument("-q", "--quiet", action="store_true")
    a = ap.parse_args(argv)

    base_img, test_img = _load(a.base), _load(a.test)
    base, test = _planes(base_img), _planes(test_img)
    if len(base) != len(test):
        print(f"component count differs: {len(base)} vs {len(test)}")
        return 1

    nc = len(base)
    if a.non_regression:
        peaks, mses = [0.0] * nc, [float("inf")] * nc
    else:
        peaks = _parse_list(a.peak, nc, "--peak") if a.peak else [0.0] * nc
        mses = _parse_list(a.mse, nc, "--mse") if a.mse else [float("inf")] * nc

    region = None
    if a.region:
        x0, y0, x1, y1 = (int(v) for v in a.region.split(","))
        if x1 <= x0 or y1 <= y0:
            print(f"empty/inverted region {x0},{y0},{x1},{y1}")
            return 1
        region = (x0, y0, x1, y1)

    ok = True
    for ci, (pb, pt) in enumerate(zip(base, test)):
        bm, tm = _meta(base_img)[ci], _meta(test_img)[ci]
        if bm is not None and tm is not None and bm != tm:
            print(f"comp {ci}: precision/signedness differs "
                  f"{bm[0]}{'S' if bm[1] else 'U'} vs {tm[0]}{'S' if tm[1] else 'U'}")
            ok = False
            continue
        if region:
            x0, y0, x1, y1 = region
            if x1 > pb.shape[1] or y1 > pb.shape[0]:
                print(f"comp {ci}: region {region} outside base {pb.shape}")
                ok = False
                continue
            pb = pb[y0:y1, x0:x1]
        if pb.shape != pt.shape:
            print(f"comp {ci}: shape differs {pb.shape} vs {pt.shape}")
            ok = False
            continue
        if pb.size == 0:
            print(f"comp {ci}: empty comparison")
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
