#!/usr/bin/env python
"""Re-validate the device (TPU) HT cleanup coder on real hardware.

Drives ht_jax.encode_cleanup_batch and ht_jax_dec.decode_cleanup_batch on
the attached chip (no CPU forcing) across content classes and checks
byte/bit-identity against the scalar host oracle (t1/ht.py), the same way
tools/pallas_hw_check.py re-drives the Mosaic Part-1 kernel.

Usage: python tools/ht_device_hw_check.py [--n 64] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def batches(rng, n, quick=False):
    cases = [
        ("dense-small", rng.integers(-40, 41, size=(n, 64, 64))),
        ("sparse-1bit", (rng.random((n, 64, 64)) < 0.04).astype(np.int64)
         * rng.choice([-1, 1], size=(n, 64, 64))),
        ("heavy-tail", (rng.standard_t(2, size=(n, 64, 64)) * 60)
         .astype(np.int64)),
    ]
    if not quick:
        cases += [
            ("stuffing", np.full((n, 64, 64), -((1 << 20) - 1),
                                 dtype=np.int64)),
            ("wide-mag", rng.integers(-(1 << 22), 1 << 22,
                                      size=(n, 64, 64))),
        ]
    return [(name, c.astype(np.int64)) for name, c in cases]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    from grok_tpu.t1 import ht, ht_jax, ht_jax_dec

    dev = jax.devices()[0]
    print(f"device: {dev}")
    rng = np.random.default_rng(99)
    n = args.n
    hs = np.full(n, 64, np.int64)
    ws = np.full(n, 64, np.int64)
    hs[1], ws[1] = 33, 47
    hs[2], ws[2] = 64, 5
    bad = 0
    for name, coeffs in batches(rng, n, args.quick):
        for i in range(n):
            coeffs[i, hs[i]:, :] = 0
            coeffs[i, :, ws[i]:] = 0
        t0 = time.perf_counter()
        segs = ht_jax.encode_cleanup_batch(coeffs.astype(np.int32), hs, ws)
        t_enc = time.perf_counter() - t0
        enc_bad = 0
        for i in range(n):
            hi, wi = int(hs[i]), int(ws[i])
            blk = coeffs[i, :hi, :wi]
            ref = (ht.encode_cleanup(coeffs[i], hi, wi)
                   if np.abs(blk).max(initial=0) else b"")
            enc_bad += segs[i] != ref
        L = max(max(len(s) for s in segs), 2)
        data = np.zeros((n, L), np.uint8)
        lens = np.zeros(n, np.int64)
        for i, s in enumerate(segs):
            data[i, : len(s)] = np.frombuffer(s, np.uint8)
            lens[i] = len(s)
        t0 = time.perf_counter()
        out = ht_jax_dec.decode_cleanup_batch(data, lens, hs, ws, 64, 64)
        t_dec = time.perf_counter() - t0
        dec_bad = 0
        for i in range(n):
            ref = np.zeros((64, 64), np.int64)
            if lens[i] >= 2:
                ref[: hs[i], : ws[i]] = ht.decode_cleanup(
                    segs[i], int(hs[i]), int(ws[i]))
            dec_bad += not np.array_equal(out[i], ref)
        bad += enc_bad + dec_bad
        print(f"{name:12s} enc {enc_bad}/{n} bad ({t_enc:.1f}s), "
              f"dec {dec_bad}/{n} bad ({t_dec:.1f}s)")
    print("RESULT:", "FAIL" if bad else "PASS (bit-identical on hardware)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
