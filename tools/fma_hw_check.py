#!/usr/bin/env python
"""Device (TPU) 9/7 byte-identity check.

Encodes and decodes several irreversible configs (gray, RGB ICT, Part-2
custom MCT) on both the host numpy pipeline and the device XLA program
and requires byte/sample equality. Measured result on the attached v5e:
BYTE-IDENTICAL on every config — the TPU VPU rounds f32 multiply-then-
add exactly like the host's two-rounding sequence (no FMA contraction on
the elementwise float path), so the lossy chain carries the same
bit-exactness guarantee as the reversible one and rides the device by
default in the distributed flows (parallel/distributed.py).

The CPU simulation backend does NOT carry this guarantee: XLA:CPU's
LLVM codegen contracts mul+add into FMAs, drifting +-1 ulp on a few
thousand samples per megapixel (of which ~1 crosses an integer rounding
boundary). `lax.optimization_barrier` around the products cannot stop
it — barriers are stripped from the compiled HLO before emission on
both backends (measured: `.compile().as_text().count("opt-barrier")
== 0`), which is why the fix is a platform contract, not a code change.

Usage: python tools/fma_hw_check.py  (needs the TPU tunnel; ~minutes,
transfer-bound on axon). Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import grok_tpu as gk


def natural_image(h, w, nc=1, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((h, w, nc), dtype=np.uint8)
    for c in range(nc):
        base = (
            96 + 60 * np.sin(2 * np.pi * (xx / (97 + 31 * c)))
            + 50 * np.sin(2 * np.pi * (yy / (61 + 17 * c)))
        )
        out[..., c] = np.clip(
            base + rng.normal(0, 22, size=(h, w)), 0, 255).astype(np.uint8)
    return out if nc > 1 else out[..., 0]


def run_case(name, arr, params):
    im = gk.Image.from_array(arr)
    prev = os.environ.pop("GROK_TPU_DEVICE", None)
    try:
        t0 = time.perf_counter()
        host_enc = gk.compress(im, params)
        t_host = time.perf_counter() - t0
        host_dec = gk.decompress(host_enc).to_array()
        # host decode of the device stream closes the 4th leg below
        os.environ["GROK_TPU_DEVICE"] = "jax"
        t0 = time.perf_counter()
        dev_enc = gk.compress(im, params)
        t_dev = time.perf_counter() - t0
        # device decoder on BOTH streams: host-encoded (cross) and
        # device-encoded (pure device roundtrip) — so a diverging encoder
        # can't mask an untested device-decode path
        dev_dec = gk.decompress(host_enc).to_array()
        dev_dec_own = gk.decompress(dev_enc).to_array()
        os.environ.pop("GROK_TPU_DEVICE", None)
        host_dec_dev = gk.decompress(dev_enc).to_array()
    finally:
        if prev is None:
            os.environ.pop("GROK_TPU_DEVICE", None)
        else:
            os.environ["GROK_TPU_DEVICE"] = prev

    enc_ok = host_enc == dev_enc
    dec_ok = (np.array_equal(host_dec, dev_dec)
              and np.array_equal(host_dec_dev, dev_dec_own))
    if not dec_ok:
        diff = np.abs(host_dec.astype(int) - dev_dec.astype(int))
        diff2 = np.abs(host_dec_dev.astype(int) - dev_dec_own.astype(int))
        detail = (f" max|d|={max(diff.max(), diff2.max())}"
                  f" n={np.count_nonzero(diff) + np.count_nonzero(diff2)}")
    else:
        detail = ""
    print(f"{name}: enc {'BYTE-IDENTICAL' if enc_ok else 'MISMATCH'}, "
          f"dec {'SAMPLE-IDENTICAL' if dec_ok else 'MISMATCH' + detail} "
          f"(host {t_host:.1f}s, device {t_dev:.1f}s)", flush=True)
    return enc_ok and dec_ok


def main():
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    if dev.platform == "cpu":
        print("WARNING: running on CPU, not the TPU", flush=True)

    ok = True
    # random-ish natural content stresses rounding boundaries
    ok &= run_case(
        "9/7 gray 3res", natural_image(192, 256),
        gk.CompressParams(num_resolutions=3, irreversible=True))
    ok &= run_case(
        "9/7 RGB ICT 5res", natural_image(256, 384, 3),
        gk.CompressParams(num_resolutions=5, irreversible=True))
    M = [[0.6, 0.3, 0.1], [-0.3, 0.5, -0.2], [0.1, -0.4, 0.5]]
    ok &= run_case(
        "9/7 custom MCT", natural_image(160, 224, 3, seed=11),
        gk.CompressParams(num_resolutions=3, irreversible=True,
                          mct_matrix=M))
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
