"""Pallas T1 encoder: symbol-stream kernel + host MQ packer parity.

Runs the kernel in Pallas interpret mode (CPU) on small blocks and checks
bit-identical streams/rates/distortions against the numpy reference coder.
The compiled-on-TPU path is exercised separately (docs/DEVICE.md)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from grok_tpu.t1 import ebcot_np, ebcot_pallas  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("GROK_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("GROK_TPU_PALLAS_PASSES", raising=False)


def _check(coeffs, heights, widths, orients, styles=None):
    ref = ebcot_np.encode_cblks(coeffs, heights, widths, orients, styles=styles)
    got = ebcot_pallas.encode_cblks(coeffs, heights, widths, orients,
                                    styles=styles)
    assert np.array_equal(ref.lengths, got.lengths)
    for i in range(coeffs.shape[0]):
        ln = int(ref.lengths[i])
        assert bytes(ref.data[i, :ln]) == bytes(got.data[i, :ln]), f"lane {i}"
    assert np.array_equal(ref.pass_rates, got.pass_rates)
    assert np.array_equal(ref.pass_dist, got.pass_dist)


def test_default_styles_mixed_geometry():
    rng = np.random.default_rng(11)
    coeffs = rng.integers(-15, 15, size=(3, 8, 6)).astype(np.int64)
    coeffs[2, 4:, :] = 0  # plus a lane with fewer planes
    _check(
        coeffs,
        heights=np.array([8, 5, 8]),
        widths=np.array([6, 6, 4]),
        orients=np.array([0, 1, 3]),
    )


def test_all_style_bits():
    rng = np.random.default_rng(12)
    coeffs = rng.integers(-200, 200, size=(2, 8, 4)).astype(np.int64)
    _check(
        coeffs,
        heights=np.array([8, 7]),
        widths=np.array([4, 4]),
        orients=np.array([2, 3]),
        styles=np.array([0x3F, 0x3F], dtype=np.int64),
    )


def test_vsc_segsym():
    rng = np.random.default_rng(13)
    coeffs = rng.integers(-40, 40, size=(2, 12, 4)).astype(np.int64)
    _check(
        coeffs,
        heights=np.array([12, 10]),
        widths=np.array([4, 3]),
        orients=np.array([1, 0]),
        styles=np.array([0x08 | 0x20, 0x08 | 0x20], dtype=np.int64),
    )
