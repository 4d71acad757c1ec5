"""Tier-1 batched coder roundtrip tests across block shapes and amplitudes."""

import numpy as np
import pytest

from grok_tpu.t1.ebcot_np import decode_cblks, encode_cblks


def _roundtrip(coeffs, heights, widths, orients):
    n, h, w = coeffs.shape
    res = encode_cblks(coeffs, heights, widths, orients)
    dec, _ = decode_cblks(
        res.data, res.lengths, res.numbps, res.npasses,
        heights, widths, orients, h, w,
    )
    for i in range(n):
        a = coeffs[i, : heights[i], : widths[i]]
        b = dec[i, : heights[i], : widths[i]]
        assert np.array_equal(a, b), f"block {i}"


def test_mixed_sizes(rng):
    N, H, W = 8, 32, 32
    coeffs = (
        rng.standard_normal((N, H, W)) * rng.choice([0.5, 4, 40], size=(N, 1, 1))
    ).astype(np.int64)
    coeffs[3] = 0
    heights = np.array([32, 32, 17, 32, 9, 32, 5, 32])
    widths = np.array([32, 32, 32, 21, 13, 32, 32, 7])
    orients = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    _roundtrip(coeffs, heights, widths, orients)


def test_short_blocks(rng):
    N, H, W = 6, 16, 16
    coeffs = (rng.standard_normal((N, H, W)) * 30).astype(np.int64)
    heights = np.array([1, 2, 3, 16, 1, 5])
    widths = np.array([16, 16, 16, 16, 3, 16])
    orients = np.array([0, 1, 2, 3, 0, 1])
    _roundtrip(coeffs, heights, widths, orients)


def test_large_amplitude(rng):
    N, H, W = 4, 16, 16
    coeffs = rng.integers(-(2**20), 2**20, size=(N, H, W)).astype(np.int64)
    heights = np.full(N, H)
    widths = np.full(N, W)
    orients = np.arange(N) % 4
    _roundtrip(coeffs, heights, widths, orients)


def test_sparse(rng):
    N, H, W = 4, 32, 32
    coeffs = np.zeros((N, H, W), dtype=np.int64)
    for i in range(N):
        idx = rng.integers(0, H * W, size=5)
        coeffs[i].flat[idx] = rng.integers(-100, 100, size=5)
    heights = np.full(N, H)
    widths = np.full(N, W)
    orients = np.arange(N) % 4
    _roundtrip(coeffs, heights, widths, orients)


def test_jax_encoder_matches_numpy(rng):
    """Device lockstep coder must produce bit-identical MQ streams."""
    from grok_tpu.t1 import ebcot_jax

    N, H, W = 4, 8, 8
    coeffs = (rng.standard_normal((N, H, W)) * 20).astype(np.int64)
    hs = np.array([8, 5, 8, 3])
    ws = np.array([8, 8, 6, 8])
    ors = np.array([0, 1, 2, 3])
    r_np = encode_cblks(coeffs, hs, ws, ors)
    r_jx = ebcot_jax.encode_cblks(coeffs, hs, ws, ors)
    for i in range(N):
        ln, lj = int(r_np.lengths[i]), int(r_jx.lengths[i])
        assert ln == lj
        assert np.array_equal(r_np.data[i, :ln], r_jx.data[i, :lj])
