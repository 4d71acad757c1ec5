#!/usr/bin/env python
"""Continuous decode fuzz harness (the analogue of the reference's fuzzers/
directory): mutate valid corpus streams and feed garbage, asserting the
decoder only ever fails with typed codec errors.

Usage: python tools/fuzz_decode.py [--seconds N] [--seed S]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import grok_tpu as gk
from grok_tpu.core.errors import GrokTpuError

ALLOWED = (GrokTpuError, ValueError, IndexError, OverflowError, MemoryError)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()
    seed = args.seed if args.seed is not None else int(time.time())
    rng = np.random.default_rng(seed)
    corpus = [
        open(f, "rb").read()
        for f in glob.glob(
            os.path.join(os.path.dirname(__file__), "..", "tests", "corpus",
                         "streams", "*.j2k")
        )
    ]
    print(f"fuzz: {len(corpus)} seeds, {args.seconds}s, rng seed {seed}")
    t0 = time.time()
    n = 0
    while time.time() - t0 < args.seconds:
        base = bytearray(corpus[int(rng.integers(0, len(corpus)))])
        mode = int(rng.integers(0, 4))
        if mode == 0:  # byte flips
            for _ in range(int(rng.integers(1, 12))):
                base[int(rng.integers(0, len(base)))] = int(rng.integers(0, 256))
        elif mode == 1:  # truncation
            base = base[: int(rng.integers(1, len(base)))]
        elif mode == 2:  # splice two streams
            other = corpus[int(rng.integers(0, len(corpus)))]
            cut = int(rng.integers(0, min(len(base), len(other))))
            base = bytearray(base[:cut]) + bytearray(other[cut:])
        else:  # random block insert
            pos = int(rng.integers(0, len(base)))
            blob = rng.integers(0, 256, int(rng.integers(1, 64)),
                                dtype=np.uint8).tobytes()
            base = base[:pos] + bytearray(blob) + base[pos:]
        try:
            # bound honest-but-huge outputs (a corrupt SIZ can demand a
            # multi-GB canvas, stalling the harness on linear fill work)
            gk.decompress(bytes(base),
                          gk.DecompressParams(max_pixels=1 << 26))
        except ALLOWED:
            pass
        except Exception as e:  # noqa: BLE001 — the whole point
            path = f"/tmp/fuzz_crash_{seed}_{n}.j2k"
            open(path, "wb").write(bytes(base))
            print(f"CRASH: {type(e).__name__}: {e} (repro saved: {path})")
            return 1
        n += 1
    print(f"fuzz: {n} cases, no crashes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
