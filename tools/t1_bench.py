#!/usr/bin/env python3
"""T1 (Part-1 EBCOT) microbenchmark on captured real-pipeline inputs.

Encodes a photo-statistics 4K frame through the actual codec, captures the
batched codeblock arrays at the t1.native boundary, then times the native
entry points directly (default 1 thread — the per-core number the dual-chain
work targets — and the all-core number).

Usage: python tools/t1_bench.py [--size 3840x2160] [--reps 5] [--threads 1,0]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench as benchmod  # photo_image
from grok_tpu.t1 import native


def capture(size, nc):
    h, w = size
    img = benchmod.photo_image(h, w, nc)
    enc_calls = []
    dec_calls = []
    orig_enc = native.encode_cblks
    orig_dec = native.decode_cblks

    def enc_wrap(coeffs, heights, widths, orients, num_threads=0,
                 styles=None, want_dist=True, _lib=None):
        enc_calls.append(dict(
            coeffs=np.ascontiguousarray(coeffs, dtype=np.int32),
            heights=np.asarray(heights), widths=np.asarray(widths),
            orients=np.asarray(orients), styles=styles,
            want_dist=want_dist))
        return orig_enc(coeffs, heights, widths, orients, num_threads,
                        styles, want_dist, _lib)

    def dec_wrap(data, lengths, numbps, npasses, heights, widths, orients,
                 block_h, block_w, num_threads=0, styles=None,
                 seg_lengths=None, _lib=None):
        dec_calls.append(dict(
            data=np.ascontiguousarray(data, dtype=np.uint8),
            lengths=np.asarray(lengths), numbps=np.asarray(numbps),
            npasses=np.asarray(npasses), heights=np.asarray(heights),
            widths=np.asarray(widths), orients=np.asarray(orients),
            block_h=block_h, block_w=block_w, styles=styles,
            seg_lengths=seg_lengths))
        return orig_dec(data, lengths, numbps, npasses, heights, widths,
                        orients, block_h, block_w, num_threads, styles,
                        seg_lengths, _lib)

    native.encode_cblks = enc_wrap
    native.decode_cblks = dec_wrap
    try:
        import grok_tpu as gk
        im = gk.Image.from_array(img)
        stream = gk.compress(im, gk.CompressParams(num_resolutions=6))
        out = gk.decompress(stream)
        assert np.array_equal(out.to_array(), img)
    finally:
        native.encode_cblks = orig_enc
        native.decode_cblks = orig_dec
    return enc_calls, dec_calls


def time_reps(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="3840x2160")
    ap.add_argument("--nc", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--threads", default="1,0")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))
    mp = h * w * args.nc / 1e6

    enc_calls, dec_calls = capture((h, w), args.nc)
    nblocks = sum(c["coeffs"].shape[0] for c in enc_calls)
    lib = native.get_lib()
    assert lib is not None
    out = {"size": args.size, "nc": args.nc, "mp": round(mp, 2),
           "blocks": int(nblocks), "reps": args.reps, "results": {}}

    for nt in (int(t) for t in args.threads.split(",")):
        def run_enc():
            for c in enc_calls:
                native.encode_cblks(c["coeffs"], c["heights"], c["widths"],
                                    c["orients"], num_threads=nt,
                                    styles=c["styles"],
                                    want_dist=c["want_dist"])

        def run_dec():
            for c in dec_calls:
                native.decode_cblks(c["data"], c["lengths"], c["numbps"],
                                    c["npasses"], c["heights"], c["widths"],
                                    c["orients"], c["block_h"], c["block_w"],
                                    num_threads=nt, styles=c["styles"],
                                    seg_lengths=c["seg_lengths"])

        enc_min, enc_med = time_reps(run_enc, args.reps)
        dec_min, dec_med = time_reps(run_dec, args.reps)
        out["results"][f"threads_{nt}"] = {
            "enc_mps_min": round(mp / enc_min, 3),
            "enc_mps_med": round(mp / enc_med, 3),
            "dec_mps_min": round(mp / dec_min, 3),
            "dec_mps_med": round(mp / dec_med, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
