"""Decoder robustness: corrupt/truncated streams must fail gracefully
(typed errors or zero-filled tiles), never crash (parity: the reference's
fuzzer + graceful-rejection blacklist strategy, SURVEY §4.2/§4.5)."""

import numpy as np
import pytest

import grok_tpu as gk
from grok_tpu.core.errors import GrokTpuError
from tests.conftest import natural_image


def _try_decode(data):
    try:
        img = gk.decompress(data)
        assert img.components[0].data is not None
    except (GrokTpuError, ValueError, IndexError, OverflowError):
        pass  # typed, graceful


@pytest.mark.parametrize("ht", [False, True])
def test_truncation_sweep(ht, rng):
    arr = natural_image(96, 96)
    im = gk.Image.from_array(arr)
    stream = gk.compress(im, gk.CompressParams(num_resolutions=3, ht=ht))
    for frac in (0.02, 0.1, 0.3, 0.6, 0.9, 0.99):
        _try_decode(stream[: int(len(stream) * frac)])


@pytest.mark.parametrize("ht", [False, True])
def test_byte_corruption_fuzz(ht, rng):
    arr = natural_image(96, 96)
    im = gk.Image.from_array(arr)
    stream = bytearray(
        gk.compress(im, gk.CompressParams(num_resolutions=3, ht=ht,
                                          num_layers=2, layer_rates=[16, 1]))
    )
    for _ in range(40):
        mutated = bytearray(stream)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] = int(rng.integers(0, 256))
        _try_decode(bytes(mutated))


def test_garbage_input(rng):
    _try_decode(b"")
    _try_decode(b"\x00" * 100)
    _try_decode(bytes(rng.integers(0, 256, 4096, dtype=np.uint8)))
    _try_decode(b"\xff\x4f\xff\x51" + b"\x00" * 50)


def test_missing_tile_fills_dc_midgray():
    """Tiles without tile-part data fill with the inverse-DC-shift value
    (what an empty pipeline produces), via the fast no-pipeline path."""
    from grok_tpu.codestream.decompress import Decoder

    arr = np.random.default_rng(0).integers(0, 256, (96, 160)).astype(np.int32)
    im = gk.Image.from_array(arr, prec=8)
    s = gk.compress(im, gk.CompressParams(tile_size=(64, 64),
                                          num_resolutions=3))
    dec = Decoder(s)
    spans = dec.index.spans
    last_ti = max(spans)
    cut = min(sp.sot_offset for sp in spans[last_ti])
    trunc = s[:cut] + b"\xff\xd9"
    img = gk.decompress(trunc)
    tb = dec.header.siz.tile_bounds(last_ti)
    region = img.components[0].data[tb.y0:tb.y1, tb.x0:tb.x1]
    assert set(np.unique(region).tolist()) == {128}
    # present tiles still decode exactly
    t0 = dec.header.siz.tile_bounds(0)
    assert np.array_equal(
        img.components[0].data[t0.y0:t0.y1, t0.x0:t0.x1],
        arr[t0.y0:t0.y1, t0.x0:t0.x1])
    # direct random access to a missing tile uses the fill path too
    d2 = Decoder(trunc)
    assert set(np.unique(d2.decompress_tile(last_ti)[0]).tolist()) == {128}


def test_max_pixels_guard():
    arr = np.zeros((64, 64), np.int32)
    s = gk.compress(gk.Image.from_array(arr, prec=8), gk.CompressParams())
    out = gk.decompress(s, gk.DecompressParams(max_pixels=64 * 64))
    assert out.components[0].data.shape == (64, 64)
    with pytest.raises(GrokTpuError):
        gk.decompress(s, gk.DecompressParams(max_pixels=64 * 64 - 1))
