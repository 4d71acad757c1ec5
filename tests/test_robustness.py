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
