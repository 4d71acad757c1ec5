#!/usr/bin/env python
"""Stage ablation profile of the device HT cleanup encoder.

Times _encode_device variants with individual stages stubbed out (MEL
scan -> zeros, MagSgn pack -> zeros, VLC pack -> zeros, quad math only)
on the attached TPU, at the production 4K batch shape, using the same
queued-dispatch differencing discipline as tools/device_bench.py.
The deltas attribute the 189 ms (DEVICE_BENCH r04) to stages.

Usage: python tools/ht_device_profile.py [--n 6321]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6321)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from grok_tpu.t1 import ht_jax

    rng = np.random.default_rng(7)
    n, bh, bw = args.n, 64, 64
    # natural-ish magnitudes: geometric decay, ~photo work factor
    mag = rng.geometric(0.25, size=(n, bh, bw)).astype(np.int32) - 1
    sgn = rng.integers(0, 2, size=(n, bh, bw)).astype(np.int32)
    coeffs = np.where(sgn > 0, -mag, mag).astype(np.int32)
    heights = np.full(n, bh, dtype=np.int32)
    widths = np.full(n, bw, dtype=np.int32)
    mmax = int(np.ceil(np.log2(mag.max() + 1)))

    qh, qw = bh // 2, bw // 2
    n_pairs = qh * (qw // 2)
    ms_bits = bh * bw * mmax + 64
    vlc_bits = 4 + 30 * n_pairs + 32
    mel_bits = 6 * (3 * n_pairs + 1) + 32
    caps = {
        "ms_words": (ms_bits + 31) // 32 + 1,
        "vlc_words": (vlc_bits + 31) // 32 + 1,
        "mel_words": (mel_bits + 31) // 32 + 1,
    }

    cdev = jax.device_put(jnp.asarray(coeffs))
    hdev = jax.device_put(jnp.asarray(heights))
    wdev = jax.device_put(jnp.asarray(widths))

    def digest(out):
        return (out["ms"][0].sum(dtype=jnp.uint32)
                ^ out["mel"][0].sum(dtype=jnp.uint32)
                ^ out["vlc"][0].sum(dtype=jnp.uint32))

    variants = {}

    def full(c, h, w):
        return digest(ht_jax._encode_device(c, h, w, bh, bw, caps))
    variants["full"] = full

    # ablations: monkeypatch the building blocks
    orig_pack = ht_jax._pack_bits

    def make_variant(skip_mel=False, skip_ms=False, skip_vlc=False):
        def run(c, h, w):
            calls = {"i": 0}

            def pack_stub(vals, lens, cap_words, dense=None):
                calls["i"] += 1
                i = calls["i"]
                # order in _encode_device: ms, vlc, mel
                if (i == 1 and skip_ms) or (i == 2 and skip_vlc) or (
                        i == 3 and skip_mel):
                    nlanes = vals.shape[0]
                    return (jnp.zeros((nlanes, cap_words), jnp.uint32),
                            jnp.sum(lens, axis=1)[:, 0]
                            if lens.ndim == 3 else jnp.sum(lens, axis=1))
                return orig_pack(vals, lens, cap_words, dense=dense)

            ht_jax._pack_bits = pack_stub
            try:
                out = ht_jax._encode_device(c, h, w, bh, bw, caps)
            finally:
                ht_jax._pack_bits = orig_pack
            return digest(out)
        return run

    variants["no_ms_pack"] = make_variant(skip_ms=True)
    variants["no_vlc_pack"] = make_variant(skip_vlc=True)
    variants["no_mel_pack"] = make_variant(skip_mel=True)

    # mel scan ablation: replace lax.scan with zeros of matching shape
    import jax.lax as lax
    orig_scan = lax.scan

    def no_mel(c, h, w):
        def scan_stub(f, init, xs, **kw):
            evv, evb = xs
            steps = evv.shape[0]
            nl = evv.shape[2]
            return init, (jnp.zeros((steps, 3, nl), jnp.uint32),
                          jnp.zeros((steps, 3, nl), jnp.int32))
        lax.scan = scan_stub
        try:
            out = ht_jax._encode_device(c, h, w, bh, bw, caps)
        finally:
            lax.scan = orig_scan
        return digest(out)
    variants["no_mel_scan"] = no_mel

    results = {}
    for name, fn in variants.items():
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        v = jf(cdev, hdev, wdev)
        float(v)  # sync
        compile_s = time.perf_counter() - t0

        def loop(k):
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = jf(cdev, hdev, wdev)
            float(r)
            return time.perf_counter() - t0
        k = 4
        t_k = min(loop(k) for _ in range(2))
        t_2k = min(loop(2 * k) for _ in range(2))
        ms = (t_2k - t_k) / k * 1000
        results[name] = round(ms, 2)
        print(name, round(ms, 2), "ms  (compile", round(compile_s, 1), "s)",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
