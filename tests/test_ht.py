"""HTJ2K block coder + codec tests."""

import numpy as np
import pytest

import grok_tpu as gk
from grok_tpu.t1.ht import decode_cleanup, encode_cleanup
from tests.conftest import natural_image


def test_ht_block_roundtrip_fuzz(rng):
    for trial in range(25):
        h = int(rng.integers(1, 65))
        w = int(rng.integers(1, 65))
        scale = rng.choice([0.5, 3, 30, 1000, 100000])
        c = (rng.standard_normal((h, w)) * scale).astype(np.int64)
        if trial % 7 == 0:
            c[:] = 0
        seg = encode_cleanup(c, h, w)
        d = decode_cleanup(seg, h, w)
        assert np.array_equal(c, d), (h, w, scale)


def test_ht_native_matches_python(rng):
    from grok_tpu.t1 import native

    if not native.available():
        pytest.skip("no native backend")
    N, H, W = 12, 32, 32
    coeffs = (rng.standard_normal((N, H, W)) * 200).astype(np.int64)
    hs = rng.integers(1, H + 1, N)
    ws = rng.integers(1, W + 1, N)
    ors = rng.integers(0, 4, N)
    r = native.ht_encode_cblks(coeffs, hs, ws, ors)
    for i in range(N):
        hi, wi = int(hs[i]), int(ws[i])
        blk = coeffs[i, :hi, :wi]
        if np.abs(blk).max(initial=0) == 0:
            continue
        assert bytes(r.data[i, : r.lengths[i]]) == encode_cleanup(blk, hi, wi)
    dec, _ = native.ht_decode_cblks(
        r.data, r.lengths, r.numbps, r.npasses, hs, ws, ors, H, W
    )
    for i in range(N):
        assert np.array_equal(
            coeffs[i, : hs[i], : ws[i]], dec[i, : hs[i], : ws[i]]
        )


def test_ht_codec_lossless():
    arr = natural_image(256, 256)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=5, ht=True))
    out = gk.decompress(stream).to_array()[:, :, 0]
    assert np.array_equal(out, arr)
    # CAP marker must be present and Rsiz must carry the JPH flag
    ps = gk.parse_codestream(stream)
    assert ps.header.cap is not None
    assert ps.header.siz.rsiz & 0x4000


def test_ht_codec_16bit_rgb():
    arr = natural_image(128, 128, nc=3, prec=12)
    im = gk.Image.from_array(arr, prec=12)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=4, ht=True))
    out = gk.decompress(stream).to_array()
    assert np.array_equal(out, arr)


def test_ht_lossy():
    arr = natural_image(128, 128)
    im = gk.Image.from_array(arr)
    stream = gk.compress(
        im, gk.CompressParams(num_resolutions=4, ht=True, irreversible=True)
    )
    out = gk.decompress(stream).to_array()[:, :, 0]
    mse = np.mean((out.astype(np.float64) - arr) ** 2)
    assert 10 * np.log10(255**2 / mse) > 42


# ---------------------------------------------------------------- refinement
def test_ht_refinement_block_roundtrip(rng):
    """3-pass HT sets (cleanup @ plane 1 + SigProp/MagRef) are exact."""
    from grok_tpu.t1 import ht

    for _ in range(10):
        h = int(rng.integers(1, 24))
        w = int(rng.integers(1, 24))
        blk = rng.integers(-200, 200, (h, w)).astype(np.int64)
        blk[rng.random((h, w)) < 0.5] = 0
        s1, s2 = ht.encode_refinement(blk, h, w)
        dec = ht.decode_refinement(s1, s2, h, w, 3)
        assert np.array_equal(dec, blk)


def test_ht_refinement_truncation_centers(rng):
    """Cleanup-only decode of a 3-pass stream lands on the bin centers."""
    from grok_tpu.t1 import ht

    blk = rng.integers(-100, 100, (12, 12)).astype(np.int64)
    blk[np.abs(blk) < 4] = 0
    s1, s2 = ht.encode_refinement(blk, 12, 12)
    dec1 = ht.decode_refinement(s1, b"", 12, 12, 1)
    mag = np.abs(blk)
    exp = np.where(mag >> 1 > 0, ((mag >> 1) << 1) | 1, 0)
    exp = np.where(blk < 0, -exp, exp)
    assert np.array_equal(dec1, exp)


def test_ht_refine_end_to_end(rng):
    """ht_refine codestreams survive the full codec losslessly.

    (The reference cannot decode multi-pass HT at all — its T1HT.cpp:174
    passes lengths2=0 into the block decoder — so interop is one-way by
    construction; the pass semantics mirror its own decoder algorithm.)"""
    import grok_tpu as gk
    from tests.conftest import natural_image

    for shape in [(96, 128, 3), (57, 101, 1)]:
        arr = natural_image(*shape[:2]) if len(shape) == 2 or shape[2] == 1 \
            else natural_image(*shape)
        im = gk.Image.from_array(arr)
        p = gk.CompressParams(num_resolutions=3, ht=True, ht_refine=True)
        stream = gk.compress(im, p)
        out = gk.decompress(stream)
        ref = arr if arr.ndim == 3 else arr
        assert np.array_equal(out.to_array().squeeze(), ref.squeeze())
