"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: lossless 5/3 encode+decode megapixels/s (aggregate over both
directions) on the benchmark image, with bit-exactness verified against the
pipeline's own decode. vs_baseline compares against the reference Grok
binaries on the same machine when available (ratio > 1 means we're faster);
falls back to 1.0 when the reference isn't built.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def natural_image(h, w):
    r = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 0.5 + 0.3 * np.sin(xx / 23) * np.cos(yy / 31)
    tex = r.standard_normal((h, w)) * 0.02
    edges = ((xx // 40 + yy // 40) % 2) * 0.2
    return (np.clip(base + tex + edges, 0, 1) * 255).astype(np.int32)


def bench_ours(arr, repeats=1):
    import grok_tpu as gk

    im = gk.Image.from_array(arr)
    params = gk.CompressParams(num_resolutions=6)
    # warmup + timed
    t0 = time.perf_counter()
    for _ in range(repeats):
        stream = gk.compress(im, params)
    t_enc = (time.perf_counter() - t0) / repeats
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = gk.decompress(stream)
    t_dec = (time.perf_counter() - t0) / repeats
    ok = np.array_equal(out.to_array()[:, :, 0], arr)
    return t_enc, t_dec, ok, len(stream)


def bench_grok(arr):
    grk = None
    for cand in ("/tmp/grok-build/bin", "/usr/local/bin"):
        if os.path.exists(os.path.join(cand, "grk_compress")):
            grk = cand
            break
    if grk is None:
        return None
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.pgm")
        from PIL import Image as PImage

        PImage.fromarray(arr.astype(np.uint8)).save(src)
        j2k = os.path.join(td, "out.j2k")
        dec = os.path.join(td, "dec.pgm")
        t0 = time.perf_counter()
        subprocess.run(
            [os.path.join(grk, "grk_compress"), "-i", src, "-o", j2k],
            capture_output=True,
        )
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        subprocess.run(
            [os.path.join(grk, "grk_decompress"), "-i", j2k, "-o", dec],
            capture_output=True,
        )
        t_dec = time.perf_counter() - t0
    return t_enc, t_dec


def main():
    size = int(os.environ.get("BENCH_SIZE", "512"))
    arr = natural_image(size, size)
    mp = arr.size / 1e6

    t_enc, t_dec, ok, nbytes = bench_ours(arr)
    ours_mps = 2 * mp / (t_enc + t_dec)  # aggregate both directions

    ref = bench_grok(arr)
    if ref is not None:
        ref_mps = 2 * mp / (ref[0] + ref[1])
        vs = ours_mps / ref_mps
    else:
        vs = 1.0

    print(
        json.dumps(
            {
                "metric": "lossless_53_encdec_megapixels_per_s",
                "value": round(ours_mps, 4),
                "unit": "MP/s",
                "vs_baseline": round(vs, 4),
                "detail": {
                    "size": size,
                    "encode_s": round(t_enc, 3),
                    "decode_s": round(t_dec, 3),
                    "bit_exact": bool(ok),
                    "stream_bytes": nbytes,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
