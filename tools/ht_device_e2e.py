#!/usr/bin/env python
"""End-to-end device HT decode (and encode) at production shape on the
attached TPU -> HT_DEVICE_E2E.json.

Round-4 closure of "device HT decode in the tile pipeline": a full 4K
HTJ2K codestream (not a block-level harness) is decoded with
GROK_TPU_T1=ht-device, so every cleanup segment rides
ht_jax_dec.decode_cleanup_batch on the real chip inside the normal tile
pipeline; the output must equal the host decoder's sample-for-sample,
and the artifact records the device-flagged host-fallback count. The
encode leg does the same through ht_jax.encode_cblks and requires a
byte-identical stream. Parity target:
/root/reference/src/lib/jp2/t1/t1_ht/coding/ojph_block_decoder.cpp.

Usage: python tools/ht_device_e2e.py [--h 2160 --w 3840]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import grok_tpu as gk  # noqa: E402
from grok_tpu.t1 import ht_jax_dec  # noqa: E402


def natural_image(h, w, nc=3):
    rng = np.random.default_rng(12345)
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((h, w, nc), dtype=np.uint8)
    for c in range(nc):
        base = (
            96 + 60 * np.sin(2 * np.pi * (xx / (97 + 31 * c)))
            + 50 * np.sin(2 * np.pi * (yy / (61 + 17 * c)))
            + 18 * ((xx // 32 + yy // 32) % 2)
        )
        noise = rng.normal(0, 9, size=(h, w))
        out[..., c] = np.clip(base + noise, 0, 255).astype(np.uint8)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=2160)
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "HT_DEVICE_E2E.json"))
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    arr = natural_image(args.h, args.w)
    im = gk.Image.from_array(arr)
    params = gk.CompressParams(num_resolutions=6, ht=True, write_tlm=True)
    mp = args.h * args.w * 3 / 1e6

    prev = os.environ.pop("GROK_TPU_T1", None)
    try:
        t0 = time.perf_counter()
        host_enc = gk.compress(im, params)
        host_enc_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        host_img = gk.decompress(host_enc)
        host_dec_s = time.perf_counter() - t0

        os.environ["GROK_TPU_T1"] = "ht-device"
        # encode leg: device cleanup encoder inside the tile pipeline
        gk.compress(im, params)  # warm/compile
        t0 = time.perf_counter()
        dev_enc = gk.compress(im, params)
        dev_enc_s = time.perf_counter() - t0
        enc_identical = dev_enc == host_enc

        # decode leg: device cleanup decoder inside the tile pipeline
        ht_jax_dec.reset_stats()
        gk.decompress(host_enc)  # warm/compile
        warm_stats = dict(ht_jax_dec.STATS)
        ht_jax_dec.reset_stats()
        t0 = time.perf_counter()
        dev_img = gk.decompress(host_enc)
        dev_dec_s = time.perf_counter() - t0
        stats = dict(ht_jax_dec.STATS)
        dec_identical = all(
            np.array_equal(a.data, b.data)
            for a, b in zip(dev_img.components, host_img.components))
        assert stats["blocks"] > 0, "device decoder never ran"
    finally:
        if prev is None:
            os.environ.pop("GROK_TPU_T1", None)
        else:
            os.environ["GROK_TPU_T1"] = prev

    result = {
        "device": str(dev),
        "image": f"{args.w}x{args.h}x3",
        "config": "ht lossless (cleanup-only), 6 res, RCT, 64x64 cblks",
        "encode": {
            "stream_byte_identical": bool(enc_identical),
            "host_s": round(host_enc_s, 2),
            "device_path_s": round(dev_enc_s, 2),
            "note": "wall includes axon-tunnel transfers; see "
                    "DEVICE_BENCH.json for device-resident stage times",
        },
        "decode": {
            "sample_identical": bool(dec_identical),
            "host_s": round(host_dec_s, 2),
            "device_path_s": round(dev_dec_s, 2),
            "device_blocks": stats["blocks"],
            "host_fallback_blocks": stats["host_fallbacks"],
            "device_calls": stats["calls"],
            "warm_run_stats": warm_stats,
        },
        "samples_mp": round(mp, 2),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(result, indent=2))
    ok = enc_identical and dec_identical
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
