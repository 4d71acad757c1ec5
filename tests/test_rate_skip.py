"""Rate-control plane skip (GROK_TPU_RATE_SKIP=1).

The plane-limited encode must (a) produce pass data/rates/dists that are
bit-identical to the full encode's prefix, and (b) through the PCRD
safety check (tile_processor._plane_skip_unsafe + deepen loop), produce a
byte-identical codestream to the full encode for rate-targeted configs.
"""
import os

import numpy as np
import pytest

import grok_tpu as gk
from grok_tpu.t1 import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native T1 unavailable")


def test_limited_encode_is_full_prefix():
    rng = np.random.default_rng(5)
    n, bh, bw = 24, 32, 32
    coeffs = (rng.normal(0, 300, (n, bh, bw))).astype(np.int32)
    coeffs[0] = 0  # empty block
    h = np.full(n, bh, dtype=np.int64)
    w = np.full(n, bw, dtype=np.int64)
    o = rng.integers(0, 4, n).astype(np.int64)
    full = native.encode_cblks(coeffs, h, w, o)
    for k in (2, 4, 7):
        lim = native.encode_cblks(
            coeffs, h, w, o, plane_limits=np.full(n, k, dtype=np.int32))
        assert np.array_equal(lim.numbps, full.numbps)
        exp_np = np.where(
            full.numbps > 0,
            3 * np.minimum(full.numbps, k) - 2, 0)
        assert np.array_equal(lim.npasses, exp_np)
        for b in range(n):
            npass = int(lim.npasses[b])
            if npass == 0:
                continue
            # coded pass rates match the full encode, except entries the
            # limited encode clamped down to its own (earlier) final
            # length — those cuts are always flagged unsafe by the PCRD
            # check (R_ceil - R_cut = 0), so they never reach emission
            lr = lim.pass_rates[b, : npass - 1]
            fr = full.pass_rates[b, : npass - 1]
            clamped = lr == lim.lengths[b]
            assert np.array_equal(lr[~clamped], fr[~clamped]), b
            assert (fr[clamped] >= lr[clamped]).all(), b
            assert np.allclose(lim.pass_dist[b, :npass],
                               full.pass_dist[b, :npass]), b
            # every truncation prefix at an UNCLAMPED safe rate equals
            # the full stream's (the conservative safe-rate property);
            # clamped rates include flush-touched tail bytes and are
            # barred from emission by the PCRD safety check
            for p in range(npass - 1):
                r = int(lim.pass_rates[b, p])
                if clamped[p]:
                    continue
                assert bytes(lim.data[b, :r]) == bytes(full.data[b, :r]), (
                    b, p)


@pytest.mark.parametrize("rate", [8, 24])
def test_skip_stream_byte_identical(monkeypatch, rate):
    rng = np.random.default_rng(9)
    base = rng.integers(0, 200, (128, 1), dtype=np.int32)
    img = (base + rng.integers(0, 56, (128, 160), dtype=np.int32)).astype(
        np.uint8)
    im = gk.Image.from_array(img.astype(np.int32))
    params = gk.CompressParams(num_resolutions=4, irreversible=True,
                               num_layers=1, layer_rates=[rate])
    monkeypatch.setenv("GROK_TPU_RATE_SKIP", "0")
    s_full = gk.compress(im, params)
    monkeypatch.setenv("GROK_TPU_RATE_SKIP", "1")
    s_skip = gk.compress(im, params)
    assert s_skip == s_full
