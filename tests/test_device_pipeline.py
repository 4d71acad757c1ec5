"""Device-resident transform chain (GROK_TPU_DEVICE=jax): the jitted
DC/MCT/DWT/(de)quant XLA program must match the host pipeline — bit-exact
for the reversible path everywhere; the irreversible float chain is
bit-exact ON TPU (hardware-verified by tools/fma_hw_check.py) and within
±1 LSB on this CPU-simulated run (XLA:CPU's LLVM codegen contracts
mul+add into FMAs; see ops/jax_pipeline.py)."""

import os

import numpy as np
import pytest

import grok_tpu as gk
from tests.conftest import natural_image


@pytest.fixture
def device_env():
    os.environ["GROK_TPU_DEVICE"] = "jax"
    yield
    os.environ.pop("GROK_TPU_DEVICE", None)


def _host_then_device(im, params, stream):
    os.environ.pop("GROK_TPU_DEVICE", None)
    host_enc = gk.compress(im, params)
    host_dec = gk.decompress(stream).to_array()
    os.environ["GROK_TPU_DEVICE"] = "jax"
    dev_enc = gk.compress(im, params)
    dev_dec = gk.decompress(stream).to_array()
    os.environ.pop("GROK_TPU_DEVICE", None)
    return host_enc, dev_enc, host_dec, dev_dec


def test_device_lossless_bit_exact():
    arr = natural_image(96, 128)
    im = gk.Image.from_array(arr)
    p = gk.CompressParams(num_resolutions=3)
    stream = gk.compress(im, p)
    host_enc, dev_enc, host_dec, dev_dec = _host_then_device(im, p, stream)
    assert host_enc == dev_enc
    assert np.array_equal(host_dec, dev_dec)
    assert np.array_equal(dev_dec.squeeze(), arr)


def test_device_rgb_mct_roundtrip():
    arr = natural_image(80, 96, 3)
    im = gk.Image.from_array(arr)
    p = gk.CompressParams(num_resolutions=3)
    stream = gk.compress(im, p)
    host_enc, dev_enc, host_dec, dev_dec = _host_then_device(im, p, stream)
    assert host_enc == dev_enc
    assert np.array_equal(host_dec, dev_dec)


def test_device_custom_mct():
    """Part-2 custom-MCT must ride the device transform chain too (the
    [N,N] component matmul is MXU-native): device encode/decode of an
    mct=2 stream matches the host path within the CPU backend's ±1 LSB
    float class (bit-exact on TPU — tools/fma_hw_check.py)."""
    arr = natural_image(80, 96, 3)
    M = [[0.6, 0.3, 0.1], [-0.3, 0.5, -0.2], [0.1, -0.4, 0.5]]
    im = gk.Image.from_array(arr)
    p = gk.CompressParams(num_resolutions=3, mct_matrix=M, irreversible=True)
    stream = gk.compress(im, p)
    host_enc, dev_enc, host_dec, dev_dec = _host_then_device(im, p, stream)
    assert np.abs(host_dec.astype(int) - dev_dec.astype(int)).max() <= 1
    # device-encoded stream must decode (on host) as faithfully as the
    # host-encoded one — guards against the matrix silently not being
    # applied on the device (signalled mct=2 would then garble decode)
    host_err = np.abs(gk.decompress(host_enc).to_array().astype(int)
                      - arr.astype(int)).max()
    dev_err = np.abs(gk.decompress(dev_enc).to_array().astype(int)
                     - arr.astype(int)).max()
    assert dev_err <= host_err + 1


def test_device_irreversible_host_equiv():
    """±1 LSB on this CPU run; bit-exact on TPU (fma_hw_check)."""
    arr = natural_image(80, 96, 3)
    im = gk.Image.from_array(arr)
    p = gk.CompressParams(num_resolutions=3, irreversible=True)
    stream = gk.compress(im, p)
    host_enc, dev_enc, host_dec, dev_dec = _host_then_device(im, p, stream)
    assert np.abs(host_dec.astype(int) - dev_dec.astype(int)).max() <= 1
    # device stream must decode as faithfully as the host stream
    host_err = np.abs(gk.decompress(host_enc).to_array().astype(int)
                      - arr.astype(int)).max()
    dev_err = np.abs(gk.decompress(dev_enc).to_array().astype(int)
                     - arr.astype(int)).max()
    assert dev_err <= host_err + 1
