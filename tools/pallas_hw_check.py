"""On-TPU validation of the Pallas T1 encoder at production codeblock shapes.

Compiles the Mosaic kernel for the given (h, w) on the attached TPU, encodes a
random batch, and asserts streams/rates/distortions are bit-identical to the
numpy reference coder. Usage:

    python tools/pallas_hw_check.py [h w n [style]]

Not a pytest: cold compiles take minutes at 64x64 and need the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GROK_TPU_PALLAS_INTERPRET", "0")

import numpy as np

from grok_tpu.t1 import ebcot_np, ebcot_pallas


def check(h, w, n, style, seed=0, spread=2500):
    rng = np.random.default_rng(seed)
    coeffs = rng.integers(-spread, spread, size=(n, h, w)).astype(np.int64)
    # mixed geometry: a few lanes shorter/narrower, one empty
    heights = np.full(n, h, dtype=np.int64)
    widths = np.full(n, w, dtype=np.int64)
    orients = rng.integers(0, 4, size=n).astype(np.int64)
    if n >= 4:
        heights[1] = max(1, h - 3)
        widths[2] = max(1, w - 5)
        coeffs[3] = 0
    styles = None
    if style:
        styles = np.full(n, style, dtype=np.int64)

    t0 = time.time()
    got = ebcot_pallas.encode_cblks(coeffs, heights, widths, orients, styles=styles)
    t_cold = time.time() - t0
    t0 = time.time()
    got2 = ebcot_pallas.encode_cblks(coeffs, heights, widths, orients, styles=styles)
    t_warm = time.time() - t0

    ref = ebcot_np.encode_cblks(coeffs, heights, widths, orients, styles=styles)
    assert np.array_equal(ref.lengths, got.lengths), "lengths mismatch"
    for i in range(n):
        ln = int(ref.lengths[i])
        assert bytes(ref.data[i, :ln]) == bytes(got.data[i, :ln]), f"lane {i}"
    assert np.array_equal(ref.pass_rates, got.pass_rates)
    assert np.array_equal(ref.pass_dist, got.pass_dist)
    assert np.array_equal(got.lengths, got2.lengths)
    mps = n * h * w / 1e6 / t_warm
    print(
        f"OK {h}x{w} n={n} style=0x{style:02x}: bit-identical to numpy "
        f"(cold {t_cold:.1f}s, warm {t_warm:.3f}s = {mps:.2f} MP/s)",
        flush=True,
    )


if __name__ == "__main__":
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    a = sys.argv[1:]
    h, w, n = (int(a[0]), int(a[1]), int(a[2])) if len(a) >= 3 else (64, 64, 128)
    style = int(a[3], 0) if len(a) >= 4 else 0
    check(h, w, n, style)
